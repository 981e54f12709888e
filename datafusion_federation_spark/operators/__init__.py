from . import (bucketing, curation, dedup, multimodal, pipeline,  # noqa: F401
               similarity, skew, text)
