from . import bucketing, dedup, multimodal, similarity, skew, text  # noqa: F401
