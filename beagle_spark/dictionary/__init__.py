from .optimizer import dry_run, optimize
from .readers import read_csv, read_edn, read_json, read_dictionary_df
from .validator import valid_dictionary, validate_dictionary

__all__ = [
    "optimize",
    "dry_run",
    "read_csv",
    "read_json",
    "read_edn",
    "read_dictionary_df",
    "validate_dictionary",
    "valid_dictionary",
]
