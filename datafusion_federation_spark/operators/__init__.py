from . import (bucketing, curation, dedup, graph, multimodal,  # noqa: F401
               pipeline, sampling, similarity, sketches, skew, temporal,
               text)
