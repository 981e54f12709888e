from . import bucketing, dedup, multimodal, pipeline, similarity, skew, text  # noqa: F401
