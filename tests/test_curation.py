"""Corpus-curation operators (operators/curation.py): decontamination,
chunking, repetition stats, unit dedup, sequence packing.

Pinned properties: exact overlap counts on known fixtures, chunk boundary
arithmetic (incl. the final short chunk), first-occurrence order in unit
dedup, next-fit packing semantics (incl. oversize docs), and partition-
layout invariance of the packer (buckets are keyed on ids, not layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_federation_spark.operators import curation
from tests.conftest import TESTDATA


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a b c d e f", "train"),
        (2, "a b c d e f g h", "train"),      # shares 6-gram with doc 1
        (3, "x y z w v u", "train"),
        (4, "a b c d e f q r", "eval"),       # eval doc overlapping 1+2
        (5, "m n o p q r", "eval"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "split"])


def test_decontaminate_exact_hits(spark, corpus):
    train = corpus.filter(F.col("split") == "train")
    ev = corpus.filter(F.col("split") == "eval")
    got = {r["doc_id"]: r["n_hits"]
           for r in curation.decontaminate(train, ev, "text", "doc_id",
                                           n=6).collect()}
    # docs 1 and 2 share 'a b c d e f' with eval doc 4; doc 2 also has
    # 'b c d e f g' / 'c d e f g h' which eval lacks -> still 1 hit each
    assert got == {1: 1, 2: 1}


def test_decontaminate_short_docs_no_grams(spark):
    train = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    ev = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    # n=6 grams don't exist on 2-word docs: no rows, no crash (and no
    # descending-sequence blowup from size-n < 0)
    assert curation.decontaminate(train, ev, "text", "doc_id",
                                  n=6).count() == 0


def test_chunk_boundaries(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(25))
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    out = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in curation.chunk_documents(df, "text", "doc_id",
                                          chunk_chars=10,
                                          overlap=2).collect())
    # stride 8: starts at 0, 8, 16, 24 (last start 24 <= 25)
    assert out == [(0, text[0:10]), (1, text[8:18]), (2, text[16:25]),
                   (3, text[24:25])]


def test_chunk_overlap_validation(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        curation.chunk_documents(df, "text", "doc_id",
                                 chunk_chars=5, overlap=5)


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"),   # 7 trigrams, 3 distinct
         (2, "p q r s t")],          # 3 trigrams, all distinct
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["dup_frac"])
           for r in curation.repetition_stats(df, "text", "doc_id",
                                              n=3).collect()}
    assert got[1] == (7, 3, round(1 - 3 / 7, 6))
    assert got[2] == (3, 3, 0.0)


def test_dedup_units_first_occurrence_order(spark):
    df = spark.createDataFrame(
        [(1, "keep\ndup\nkeep2\ndup\nkeep3"),
         (2, "only\nlines")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"], r["n_units"], r["n_kept"])
           for r in curation.dedup_units(df, "text", "doc_id",
                                         "\n").collect()}
    assert got[1] == ("keep\ndup\nkeep2\nkeep3", 5, 4)
    assert got[2] == ("only\nlines", 2, 2)


def _pack(spark, rows, budget, n_buckets=1):
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = curation.pack_sequences(df, "doc_id", "n_tokens",
                                  budget=budget, n_buckets=n_buckets)
    return sorted(tuple(r) for r in out.collect())


def test_pack_next_fit_semantics(spark):
    # budget 10, one bucket, id order: 4+5 fit (9); +3 overflows -> new
    # seq [3, 6]; 12 is oversize -> its own seq; 2 follows alone
    rows = [(1, 4), (2, 5), (3, 3), (4, 6), (5, 12), (6, 2)]
    assert _pack(spark, rows, 10) == [
        (0, 0, 2, 9), (0, 1, 2, 9), (0, 2, 1, 12), (0, 3, 1, 2)]


def test_pack_budget_validation(spark):
    df = spark.createDataFrame([(1, 3)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError):
        curation.pack_sequences(df, "doc_id", "n_tokens", budget=0)


def test_pack_layout_invariant(spark):
    rows = [(i, (i * 7) % 23 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    a = curation.pack_sequences(df, "doc_id", "n_tokens",
                                budget=64, n_buckets=8)
    b = curation.pack_sequences(df.repartition(13), "doc_id", "n_tokens",
                                budget=64, n_buckets=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


# ---------------------------------------------------------------------------
# invariant properties on pseudo-random corpora (fixed seeds)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [3, 17, 91])
def test_pack_invariants(spark, seed):
    """(a) every doc lands in exactly one sequence; (b) no sequence
    exceeds the budget unless it holds a single oversize doc; (c) seq
    ids are contiguous from 0 within each bucket."""
    import random
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 40)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = curation.pack_sequences(df, "doc_id", "n_tokens",
                                  budget=25, n_buckets=7).collect()
    assert sum(r["n_docs"] for r in out) == 300
    for r in out:
        assert r["total_tokens"] <= 25 or r["n_docs"] == 1
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["seq_id"])
    for b, seqs in by_bucket.items():
        assert sorted(seqs) == list(range(len(seqs)))


def test_chunk_reassembly_roundtrip(spark):
    """Stripping the overlap prefix from every chunk after the first and
    concatenating in chunk order reconstructs the document exactly."""
    docs = (spark.read.parquet(f"{TESTDATA}/documents.parquet")
            .limit(20).collect())
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs], ["doc_id", "text"])
    chunks = {}
    for r in curation.chunk_documents(df, "text", "doc_id",
                                      chunk_chars=50,
                                      overlap=10).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"]
    for r in docs:
        parts = chunks[r["doc_id"]]
        text = "".join(
            parts[i] if i == 0 else parts[i][10:]
            for i in sorted(parts))
        assert text == r["text"]


def test_decontaminate_self_flags_everything(spark):
    """Decontaminating a corpus against itself flags every doc that has
    at least one n-gram (train != eval rows excluded by id)."""
    docs = (spark.read.parquet(f"{TESTDATA}/documents.parquet")
            .select("doc_id", "text").limit(40))
    hit = curation.decontaminate(docs, docs, "text", "doc_id", n=5)
    n_grammable = docs.filter(
        F.size(F.split("text", " ")) >= 5).count()
    assert hit.count() == n_grammable


def test_chunk_empty_doc_yields_no_chunks(spark):
    """Empty text must produce ZERO chunks (regression: sequence(0,-1)
    descends and emitted two spurious empty rows)."""
    df = spark.createDataFrame([(1, ""), (2, "ab")], ["doc_id", "text"])
    out = sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"])
                 for r in curation.chunk_documents(
                     df, "text", "doc_id", chunk_chars=10,
                     overlap=2).collect())
    assert out == [(2, 0, "ab")]


def test_dedup_units_regex_metachar_delimiter(spark):
    """A '.' delimiter must split literally, not as match-any-char
    (regression: F.split regex vs array_join literal mismatch)."""
    df = spark.createDataFrame([(1, "one.two.one.three")],
                               ["doc_id", "text"])
    got = curation.dedup_units(df, "text", "doc_id", ".").collect()[0]
    assert got["clean_text"] == "one.two.three"
    assert (got["n_units"], got["n_kept"]) == (4, 3)


def test_pack_null_tokens_clear_error(spark):
    df = spark.createDataFrame([(1, 3), (2, None)],
                               "doc_id long, n_tokens long")
    import pytest as _pt
    with _pt.raises(Exception, match="NULL token counts"):
        curation.pack_sequences(df, "doc_id", "n_tokens",
                                budget=10, n_buckets=1).collect()


# ---------------------------------------------------------------------------
# duplicate-span removal (r7)
# ---------------------------------------------------------------------------

def _span_reference(docs, n, min_docs):
    toks = {d: t.split(" ") for d, t in docs}
    grams = {}
    for d, ts in toks.items():
        for i in range(max(len(ts) - n + 1, 1)):
            grams.setdefault(" ".join(ts[i:i + n]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = {}
    for d, ts in toks.items():
        cov = set()
        for i in range(max(len(ts) - n + 1, 1)):
            if " ".join(ts[i:i + n]) in dup:
                cov.update(range(i, i + n))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_span_removal_matches_reference(spark):
    from datafusion_federation_spark.operators.curation import (
        remove_duplicate_spans)
    docs = [
        (1, "the quick brown fox jumps over the lazy dog end one"),
        (2, "start two the quick brown fox jumps over the lazy dog x"),
        (3, "completely different content with no shared spans here"),
        (4, "short doc"), (5, "short doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.new_text)
           for r in remove_duplicate_spans(df, "text", "doc_id",
                                           n=8).collect()}
    assert got == _span_reference(docs, 8, 2)
    # the shared 9-token span is excised from BOTH carriers, the
    # identical short docs vanish entirely, the clean doc is untouched
    assert got[1][2] == "end one" and got[3][1] == 0
    assert got[4] == (2, 2, "") and got[5] == (2, 2, "")


def test_span_removal_within_doc_repeat_survives(spark):
    """min_docs counts DISTINCT documents: a chorus repeated inside
    one document is not 'duplicated training data' by itself."""
    from datafusion_federation_spark.operators.curation import (
        remove_duplicate_spans)
    chorus = "la di da we sing the same eight words"
    docs = [(1, f"{chorus} bridge {chorus}"),
            (2, "totally unrelated second document text body here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n_removed
           for r in remove_duplicate_spans(df, "text", "doc_id",
                                           n=8).collect()}
    assert got == {1: 0, 2: 0}


def test_span_removal_validation(spark):
    import pytest as _pytest
    from datafusion_federation_spark.operators.curation import (
        remove_duplicate_spans)
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="n must"):
        remove_duplicate_spans(df, "text", "doc_id", n=1)
    with _pytest.raises(ValueError, match="min_docs"):
        remove_duplicate_spans(df, "text", "doc_id", min_docs=1)


def test_span_removal_is_verbatim_and_null_safe(spark):
    """review r7 pins: (1) gram matching is VERBATIM — case-variant
    spans are NOT duplicates (word_grams normalized; array_grams over
    the raw split must not); (2) a NULL-text document keeps its row
    with NULL n_tokens, like the SQL oracle's LEFT JOIN."""
    from datafusion_federation_spark.operators.curation import (
        remove_duplicate_spans)
    docs = [
        (1, "The quick brown fox jumps over the lazy dog tail A"),
        (2, "the quick brown fox jumps over the lazy dog other B"),
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.new_text)
           for r in remove_duplicate_spans(df, "text", "doc_id",
                                           n=8).collect()}
    want = _span_reference([d for d in docs if d[1] is not None], 8, 2)
    assert got[1] == want[1] and got[2] == want[2]
    # only ONE raw-verbatim shared 8-gram window ('quick ... dog' —
    # the shifted window differs on 'The' vs 'the'): its 8 tokens go,
    # and the case-variant leading token SURVIVES in doc 1 (a
    # normalizing matcher would have removed it too)
    assert got[1][1] == 8 and got[1][2].startswith("The ")
    assert got[3] == (None, None, "")
