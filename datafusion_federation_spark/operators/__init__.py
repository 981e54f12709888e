from . import dedup, multimodal, similarity, skew, text  # noqa: F401
