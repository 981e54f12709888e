"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, document chunking, repetition scrubbing, and
sequence packing.

Beyond the reference's surface (BASELINE.json north star) — these are the
ops a 100 TB pretraining pipeline runs between dedup and the shard writer:

- decontamination: n-gram overlap between the train corpus and a (small)
  eval/benchmark set. The eval side is distinct-gram-reduced then
  BROADCAST into the train-side gram stream, so the only shuffle is the
  per-doc overlap count — the 100 TB train text itself never moves.
- chunking: fixed-size overlapping windows via sequence()+explode +
  substring — pure codegen, narrow (no shuffle at all).
- repetition stats: the Gopher-style "fraction of duplicate n-grams"
  quality signal, one map-side gram explode + per-doc aggregate.
- unit dedup: first-occurrence line/paragraph dedup within a document,
  reassembled in original order — groupBy (id, unit) then windowless
  re-concat via sort_array of (pos, unit) structs; per-doc data only.
- sequence packing: greedy next-fit packing of docs into token-budget
  training sequences. Inherently sequential PER BUCKET, so the corpus is
  hash-bucketed and each bucket packs independently inside one
  applyInPandas group — O(N/B) per task, no global order, no driver
  loop. Bucket count scales with the cluster; packing quality is
  per-bucket next-fit, which is the standard trade at scale.

All hot paths are built-in pyspark.sql.functions; only the per-bucket
packing scan (a cumulative reset, inexpressible in window algebra) drops
to an Arrow-batched applyInPandas.
"""

from __future__ import annotations

from typing import Optional

# module-level so PySpark's pandas type-hint resolution can see `pd`
import pandas as pd  # noqa: F401
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _word_grams(text_col: str, n: int, distinct: bool = True):
    """Word n-grams of a text column as an array<string> (distinct set
    semantics by default; positional duplicates kept for counting when
    distinct=False).

    Built-in-only: split -> transform(sequence) -> slice -> concat_ws.
    Docs shorter than n grams yield an empty array (not null).
    """
    ws = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.size(ws) - F.lit(n))
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(ws, i + F.lit(1), n)))
    out = F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>"))
    return F.array_distinct(out) if distinct else out


def decontaminate(train: DataFrame, eval_set: DataFrame, text_col: str,
                  id_col: str, n: int = 8) -> DataFrame:
    """Benchmark decontamination: per-train-doc count of distinct word
    n-grams that also appear in the eval/benchmark set.

    Returns (id_col, n_hits) for contaminated docs only (n_hits >= 1);
    join anti-style against this to drop them.

    Scale: the eval set is a benchmark — thousands of docs, not
    terabytes — so its distinct grams are broadcast; the train side
    explodes grams map-side and the only shuffle is the (id, count)
    aggregate. n=13 is the common pretraining choice; default 8 here
    because the synthetic fixture docs average ~54 words.
    """
    ev = (eval_set
          .select(F.explode(_word_grams(text_col, n)).alias("gram"))
          .distinct())
    tr = train.select(F.col(id_col),
                      F.explode(_word_grams(text_col, n)).alias("gram"))
    return (tr.join(F.broadcast(ev), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    chunk_chars: int = 120,
                    overlap: int = 24) -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (stride = chunk_chars - overlap). Returns one row per chunk:
    (id_col, chunk_idx, chunk_text).

    Scale: narrow op — sequence()+explode+substring inside whole-stage
    codegen, no shuffle; the natural pre-tokenization step for context-
    window-bounded training. The final (short) chunk is kept.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    # guard empty docs: sequence(0, -1) would DESCEND and emit two
    # spurious rows; an empty document has zero chunks
    last = F.floor((F.length(F.col(text_col)) - F.lit(1)) /
                   F.lit(stride)).cast("int")
    idx = F.explode(F.when(F.length(F.col(text_col)) >= 1,
                           F.sequence(F.lit(0), last))
                    .otherwise(F.array().cast("array<int>")))
    out = df.select(F.col(id_col), idx.alias("chunk_idx"),
                    F.col(text_col))
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.expr(f"substring({text_col}, chunk_idx * {stride} + 1, "
               f"{chunk_chars})").alias("chunk_text"))


def repetition_stats(df: DataFrame, text_col: str, id_col: str,
                     n: int = 3) -> DataFrame:
    """Gopher-style repetition quality signal: per-doc fraction of word
    n-gram occurrences that are duplicates of an earlier occurrence.

    Returns (id_col, n_grams, n_distinct, dup_frac) for every doc with at
    least one n-gram. dup_frac = 1 - n_distinct/n_grams, rounded to 6
    places (cross-engine double stability).

    Scale (r13 optimization round, guide §2.4 — remove shuffles
    outright): both stats are PER-DOC, so they are row-local
    expressions — no gram explode, no shuffle, no two-phase
    countDistinct aggregate at all. n_grams is arithmetic on the word
    count (size(ws) - n + 1); n_distinct is size(array_distinct(grams))
    computed in one codegen pass. The gram array is referenced exactly
    once, so Catalyst's shared-subexpression re-evaluation trap (memory
    note; verify-skill gotcha) does not apply. Plan shrinks from
    explode + Exchange + partial/final aggregate to a single Project
    (d30 bench before/after in OPTIMIZATION_r13.md; oracle hash
    unchanged at both SFs).
    """
    ws = F.split(F.col(text_col), " ")
    n_grams = (F.size(ws) - F.lit(n) + F.lit(1)).cast("long")
    n_distinct = F.size(F.array_distinct(
        _word_grams(text_col, n, distinct=False))).cast("long")
    return (df.select(F.col(id_col), n_grams.alias("n_grams"),
                      n_distinct.alias("n_distinct"))
            .filter(F.col("n_grams") >= 1)
            .withColumn(
                "dup_frac",
                F.round(F.lit(1.0) - F.col("n_distinct") /
                        F.col("n_grams"), 6)))


def dedup_units(df: DataFrame, text_col: str, id_col: str,
                delimiter: str = "\n") -> DataFrame:
    """First-occurrence unit (line/paragraph) dedup within each document,
    reassembled in original order — the C4-style "dedup repeated lines"
    cleanup. Returns (id_col, clean_text, n_units, n_kept).

    Scale: per-doc only. posexplode -> min(pos) per (id, unit) ->
    sort_array over collected (pos, unit) structs -> re-concat. The only
    shuffle is keyed on the doc id; no cross-doc state.
    """
    # F.split takes a Java REGEX while array_join reassembles with the
    # LITERAL delimiter: escape regex metachars so a '.' or '|' unit
    # delimiter splits literally instead of matching any char (review
    # r5 — the mismatch silently emptied every document). re.escape
    # only escapes regex-special ASCII (3.7+), which is Java-compatible
    import re
    pattern = re.escape(delimiter)
    units = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pattern))
        .alias("pos", "unit"))
    firsts = (units.groupBy(id_col, "unit")
              .agg(F.min("pos").alias("pos"),
                   F.count(F.lit(1)).alias("n_occ")))
    return (firsts.groupBy(id_col)
            .agg(F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(
                            F.struct("pos", "unit"))),
                        lambda s: s["unit"]),
                    delimiter).alias("clean_text"),
                 F.sum("n_occ").cast("bigint").alias("n_units"),
                 F.count(F.lit(1)).cast("bigint").alias("n_kept")))


_PACK_SCHEMA = T.StructType([
    T.StructField("bucket", T.LongType()),
    T.StructField("seq_id", T.LongType()),
    T.StructField("n_docs", T.LongType()),
    T.StructField("total_tokens", T.LongType()),
])


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   budget: int, bucket_expr: Optional[F.Column] = None,
                   n_buckets: int = 32) -> DataFrame:
    """Greedy next-fit sequence packing: within each bucket, walk docs in
    id order and start a new sequence whenever adding the next doc would
    exceed the token budget. Returns one row per packed sequence:
    (bucket, seq_id, n_docs, total_tokens).

    A doc larger than the budget gets a sequence of its own (packing
    never splits docs — split upstream with chunk_documents if needed).

    Scale: the cumulative-reset scan is inherently sequential, so it is
    sharded: bucket = pmod(id, n_buckets) by default (deterministic,
    layout-invariant), one Arrow-batched applyInPandas group per bucket.
    Each task is O(bucket size); n_buckets scales with the cluster. The
    same-bucket constraint costs a bounded amount of padding vs global
    next-fit — the standard trade for a shuffle-parallel packer.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    bucket = (bucket_expr if bucket_expr is not None
              else F.pmod(F.col(id_col), F.lit(n_buckets)))
    rows = df.select(bucket.cast("long").alias("bucket"),
                     F.col(id_col).alias("_id"),
                     F.col(token_col).cast("long").alias("_tok"))

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if pdf["_tok"].isna().any():
            raise ValueError(
                "pack_sequences: token_col contains NULL token counts "
                "— fill or filter them upstream")
        pdf = pdf.sort_values("_id")
        seqs, acc, seq = [], 0, -1
        for tok in pdf["_tok"]:
            if seq < 0 or acc + tok > budget:
                seq += 1
                acc = int(tok)
                seqs.append([seq, 1, int(tok)])
            else:
                acc += int(tok)
                seqs[-1][1] += 1
                seqs[-1][2] += int(tok)
        b = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            [(b, s, nd, tt) for s, nd, tt in seqs],
            columns=["bucket", "seq_id", "n_docs", "total_tokens"])

    return rows.groupBy("bucket").applyInPandas(_pack, _PACK_SCHEMA)


def remove_duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                           n: int = 8, min_docs: int = 2) -> DataFrame:
    """Exact duplicate-SPAN removal (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    substring dedup, word-granular): every n-gram window that appears
    verbatim in >= ``min_docs`` DISTINCT documents marks its n token
    positions, and marked tokens are dropped from the rebuilt text —
    removing the shared boilerplate/quotation itself, not the whole
    document (decontaminate/dedup_units drop documents; repetition_
    stats only scores — this is the operator that EDITS).

    Within-document repeats alone do not trigger removal (min_docs
    counts distinct documents), so a poem's chorus survives unless
    other documents carry it too.

    Plan (r13 optimization round, guide §2.1/§2.4): exploded grams ->
    global df count per gram (map-side combined; the corpus-wide
    shuffle, keyed on the gram) -> semi-join back -> ONE groupBy
    collecting each doc's duplicated-gram START positions into an
    array -> left-join that small frame back to the documents -> the
    whole excision is then ROW-LOCAL: covered positions are
    flatten(transform(starts, s -> sequence(s, s+n-1))) and the kept
    positions are array_except(sequence(0, len-1), covered) —
    order-preserving and hash-set backed, O(tokens + starts*n) per
    row. This replaces the old tail (position explode -> DISTINCT ->
    token anti-join -> collect_list/array_sort reassembly), cutting
    the exchanges from 14 to 10 and the sort of every surviving token.
    100 TB: everything keys on gram hashes or doc id; the
    duplicated-gram set is the natural candidate for a bloom-filter
    prune (operators/sketches) when it is small relative to the
    corpus. Before/after plans in plans/r13/d83_span_dedup_*.txt.

    Returns (id, n_tokens, n_removed, new_text) — one row per input
    document, new_text '' when everything was duplicated away.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    from .dedup import _fan_out, array_grams
    # fan the narrow scan out BEFORE the ~n-x explodes (the
    # shingle_table rationale), and materialize the exploded gram
    # frame ONCE: it feeds both the df-count and the flagged-start
    # join (the k>=2-reference rule on an expensive-lineage frame).
    # Measured sf0.1 warm: 6.4s plain -> 2.5-3.2s with both.
    df = _fan_out(df)
    raw = F.split(F.col(text_col), " ")
    # grams come from the SAME raw split as the token positions
    # (array_grams — review r7: word_grams NORMALIZES text, so its
    # gram indices misaligned with raw positions and case-folded
    # matches were not verbatim). Gram j (0-based) covers positions
    # j..j+n-1; documents shorter than n contribute one PARTIAL gram
    # (the slice floor), so two identical short docs remove each other
    # entirely (verbatim-duplicate semantics).
    grams = df.select(
        F.col(id_col),
        F.posexplode(array_grams(raw, n)).alias("_i", "_g")) \
        .localCheckpoint(eager=False)
    gram_df = (grams.groupBy("_g")
               .agg(F.countDistinct(id_col).alias("_df"))
               .filter(F.col("_df") >= min_docs)
               .select("_g"))
    # ONE exchange gathers each doc's duplicated-gram start positions
    # into an array; docs with no duplicated gram have no row here
    starts = (grams.join(gram_df, "_g")
              .groupBy(id_col)
              .agg(F.collect_set("_i").alias("_starts")))
    # a NULL-text document KEEPS its row (n_tokens NULL, like the SQL
    # oracle's LEFT JOIN; explicit when() so the result does not
    # depend on ANSI's size(NULL) behavior — review r7)
    base = df.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(),
               F.lit(None).cast("long"))
         .otherwise(F.size(raw).cast("long")).alias("n_tokens"),
        raw.alias("_ws"))
    j = base.join(starts, id_col, "left")
    # covered positions may run past the last token (partial tail
    # grams) — harmless: array_except only keeps members of the first
    # array. array_except preserves first-array order, so kept
    # positions stay ascending and the rebuild is position-ordered.
    covered = F.flatten(F.transform(
        F.col("_starts"),
        lambda s: F.sequence(s, s + F.lit(n - 1))))
    kept_pos = F.when(
        F.col("_starts").isNull(),
        F.sequence(F.lit(0), F.col("n_tokens").cast("int") - 1)
    ).otherwise(
        F.array_except(
            F.sequence(F.lit(0), F.col("n_tokens").cast("int") - 1),
            covered))
    return (j.select(
        F.col(id_col), F.col("n_tokens"),
        kept_pos.alias("_kp"),
        F.col("_ws"))
        .select(
            F.col(id_col), F.col("n_tokens"),
            F.when(F.col("n_tokens").isNull(), F.lit(None).cast("long"))
             .otherwise((F.col("n_tokens") - F.size("_kp"))
                        .cast("long")).alias("n_removed"),
            F.when(F.col("n_tokens").isNull(), F.lit(""))
             .otherwise(F.array_join(
                 F.transform(F.col("_kp"),
                             lambda p: F.element_at(F.col("_ws"),
                                                    p + F.lit(1))),
                 " ")).alias("new_text")))
