from . import dedup, multimodal, rollup, similarity, skew, textstats  # noqa: F401
