"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata (north-star extension).

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
transforms, partitioning — while the actual codec work is stubbed behind
clearly-marked NotImplementedError / deterministic fakes, because no
image/audio libraries ship in this container. Swapping the stub for
PIL/librosa is a one-function change; batch shapes and schemas hold.

Scale notes: decode/feature-extract runs in mapInPandas so each Arrow batch
crosses the Python boundary once; binary payloads never shuffle unless the
caller asks (metadata-only projections drop the payload column *before*
any wide transform).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema attached to every decoded media column
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),        # px (image/video)
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),     # audio/video
    T.StructField("codec", T.StringType()),
])


def attach_binary_payload(df: DataFrame, src_col: str,
                          out_col: str = "payload") -> DataFrame:
    """Treat an existing column's bytes as the opaque media payload
    (test fixture path: text -> utf-8 bytes; production: read real bytes
    via spark.read.format('binaryFile'))."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "utf-8"))


def real_decode(payload: bytes) -> dict:
    """The genuine decode step — requires PIL/ffmpeg, absent here.

    Sandbox probe (r5): none of PIL / cv2 / imageio / av / soundfile /
    librosa / libmagic import in this environment, so the decode stays
    an honest stub; the Spark-side plumbing (Arrow batching via
    mapInPandas, schema, partitioning) is real and oracle-tested (d13).
    Wiring a real decoder is a one-function swap behind this seam."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg which are not installed; "
        "use fake_decode_meta for deterministic testing")


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake decode: derives plausible metadata purely from
    the byte length so oracles can reproduce it in SQL."""
    n = len(payload)
    return {
        "media_type": "image",
        "n_bytes": n,
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "duration_ms": None,
        "codec": "fake/v1",
    }


def extract_media_meta(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "doc_id",
                       use_fake: bool = True) -> DataFrame:
    """mapInPandas media decode -> (id, meta struct fields). Arrow batches
    in, Arrow batches out; one Python crossing per batch."""
    decode = fake_decode_meta if use_fake else real_decode
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(MEDIA_META_SCHEMA))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode(b) for b in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return (df.select(id_col, payload_col)
              .mapInPandas(_batches, schema=out_schema))


def feature_extract_stub(df: DataFrame, payload_col: str = "payload",
                         id_col: str = "doc_id",
                         dim: int = 16) -> DataFrame:
    """Media -> embedding plumbing: mapInPandas emitting a fixed-dim
    float vector per payload (real impl: a vision/audio encoder per Arrow
    batch). The fake is a deterministic byte-statistic projection so
    downstream similarity-search operators can be tested end to end on
    the produced array<float> column."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for b in pdf[payload_col]:
                n = len(b)
                embs.append([float((n * (i + 3) + (b[i % n] if n else 0))
                                   % 97) / 97.0 for i in range(dim)])
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "embedding": embs})

    return (df.select(id_col, payload_col)
              .mapInPandas(_batches, schema=out_schema))


def frame_sample_stub(df: DataFrame, payload_col: str = "payload",
                      every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes deterministic fake frame
    offsets (real impl would emit decoded frames). Shows the
    one-row-to-many-frames shape with payload kept out of the shuffle."""
    n_frames = (F.octet_length(F.col(payload_col)) % 10) + 1
    return (df.withColumn("frame_idx",
                          F.explode(F.sequence(F.lit(0), n_frames - 1)))
              .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
              .drop(payload_col))


def resize_stub(df: DataFrame, payload_col: str = "payload",
                width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing: passes payload through mapInPandas with the
    target shape recorded (real impl: PIL resize per Arrow batch)."""
    out_schema = T.StructType(df.select(payload_col).schema.fields + [
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
    ])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[payload_col]].copy()
            out["target_w"] = width
            out["target_h"] = height
            yield out

    return df.select(payload_col).mapInPandas(_batches, schema=out_schema)
