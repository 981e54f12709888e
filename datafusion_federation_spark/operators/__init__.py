from . import (bucketing, curation, dedup, graph, incremental,  # noqa: F401
               multimodal, pipeline, sampling, similarity, sketches, skew,
               temporal, text)
