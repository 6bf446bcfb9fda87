from . import dedup, multimodal, similarity, textstats  # noqa: F401
