"""Composed training-data preparation pipeline.

The individual operators (quality scoring, exact dedup, MinHash near-dedup,
token counting, language ID) compose into the standard corpus-preparation
flow; this module wires them into one declarative DataFrame pipeline —
a single Catalyst plan per stage boundary, no driver-side loops.

Stage order matters at 100 TB:
1. quality filter FIRST (cheap per-row expressions, drops the junk before
   anything shuffles),
2. exact dedup (hash groupBy — cheapest dedup, biggest volume win),
3. MinHash near-dedup (bucketed LSH; runs on the already-reduced corpus),
4. enrichment (language, token counts) on the survivors only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text


@dataclass
class CorpusPrepConfig:
    min_quality: float = 0.5
    near_dup_threshold: float = 0.85
    minhash_hashes: int = 32
    minhash_bands: int = 8
    text_col: str = "text"
    id_col: str = "doc_id"


def prepare_training_corpus(df: DataFrame,
                            config: Optional[CorpusPrepConfig] = None
                            ) -> DataFrame:
    """Quality-filter -> exact-dedup -> near-dedup -> enrich. Returns the
    surviving documents with quality, lang_pred, n_tokens columns."""
    cfg = config or CorpusPrepConfig()
    tcol, idc = cfg.text_col, cfg.id_col

    # 1. quality gate (pure row-local expressions, pushes into the scan)
    scored = text.quality_score(df, tcol, out_col="quality")
    kept = scored.filter(F.col("quality") >= cfg.min_quality)

    # 2. exact dedup (min-id per md5 digest; payload never shuffles)
    kept = dedup.exact_dedup(kept, [tcol], idc)

    # 3. near-dedup: drop the higher id of every near-duplicate pair
    pairs = dedup.minhash_dedup_pairs(
        kept, tcol, idc, num_hashes=cfg.minhash_hashes,
        bands=cfg.minhash_bands, threshold=cfg.near_dup_threshold)
    losers = pairs.select(F.col("id_b").alias(idc)).distinct()
    kept = kept.join(losers, on=idc, how="left_anti")

    # 4. enrichment on survivors only
    kept = text.language_id(kept, tcol, out_col="lang_pred")
    kept = kept.withColumn(
        "n_tokens", text.whitespace_token_count(F.col(tcol)))
    return kept


def corpus_report(before: DataFrame, after: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """One-row funnel report: input/output doc counts + retention."""
    n_in = before.select(id_col).count()
    n_out = after.select(id_col).count()
    spark = before.sparkSession
    return spark.createDataFrame(
        [(n_in, n_out, round(n_out / max(n_in, 1), 4))],
        "n_input long, n_output long, retention double")


def prepare_and_split(df: DataFrame,
                      config: Optional[CorpusPrepConfig] = None,
                      splits: Optional[dict] = None,
                      sample_frac: Optional[float] = None) -> DataFrame:
    """The full corpus flow ending in deterministic splits: optional
    hash-sample -> prepare_training_corpus -> train/val/test `split`
    column. Sampling runs FIRST (a narrow filter — at 100 TB a 10%
    ablation run should read 10% of the data through every later
    shuffle, not sample at the end); the split column lands LAST so
    leakage across splits is impossible for exact/near duplicates —
    dedup already collapsed them to one survivor with one assignment."""
    from . import sampling
    cfg = config or CorpusPrepConfig()
    if sample_frac is not None:
        df = sampling.hash_sample(df, cfg.id_col, sample_frac)
    out = prepare_training_corpus(df, cfg)
    if splits is None:
        splits = {"test": 0.05, "val": 0.05, "train": 0.9}
    return sampling.assign_splits(out, cfg.id_col, splits)
