"""Text-analysis operators for training-data pipelines (north-star
extension): token counting, quality scoring, language ID, fingerprinting.

Everything here is built-in pyspark.sql.functions — regex, split, array
ops — so the hot path is JVM-side codegen; no Python UDFs. Each function
returns Column expressions usable inside any projection, keeping them
composable with filters that Catalyst pushes into the scan.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small + deterministic; real pipelines would plug fastText.
STOPWORDS: Dict[str, Sequence[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "con"],
    "zh": ["的", "了", "是", "在", "我", "有", "他", "这", "不"],
}

#: whitespace tokenizer + a BPE-ish fallback regex (runs of letters, runs
#: of digits, or single non-space symbols — a cheap proxy for subword
#: token counts)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def whitespace_token_count(col) -> F.Column:
    """Number of whitespace-separated tokens (empty text -> 0)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(col) -> F.Column:
    """Count of BPE-ish regex tokens — letter runs, digit runs, symbols."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def char_classes(col) -> Dict[str, F.Column]:
    """Character-class counters used by quality scoring."""
    return {
        "n_chars": F.length(col),
        "n_alpha": F.regexp_count(col, F.lit(r"[A-Za-z]")),
        "n_digit": F.regexp_count(col, F.lit(r"[0-9]")),
        "n_punct": F.regexp_count(col, F.lit(r"[^\sA-Za-z0-9]")),
        "n_space": F.regexp_count(col, F.lit(r"\s")),
    }


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append quality-signal columns: length, token counts, punctuation /
    alpha ratios, mean word length, stopword ratio (en)."""
    c = F.col(text_col)
    cc = char_classes(c)
    tokens = whitespace_token_count(c)
    stop_hits = stopword_hits(c, STOPWORDS["en"])
    return (df
            .withColumn("n_chars", cc["n_chars"])
            .withColumn("n_tokens", tokens)
            .withColumn("punct_ratio",
                        F.round(cc["n_punct"] /
                                F.greatest(cc["n_chars"], F.lit(1)), 6))
            .withColumn("alpha_ratio",
                        F.round(cc["n_alpha"] /
                                F.greatest(cc["n_chars"], F.lit(1)), 6))
            .withColumn("mean_word_len",
                        F.round(cc["n_alpha"] /
                                F.greatest(tokens, F.lit(1)), 6))
            .withColumn("stopword_ratio",
                        F.round(stop_hits /
                                F.greatest(tokens, F.lit(1)), 6)))


def quality_score(df: DataFrame, text_col: str,
                  out_col: str = "quality") -> DataFrame:
    """Scalar quality score in [0,1]: penalize too-short docs, high
    punctuation density, and stopword-free (non-linguistic) text."""
    feat = quality_features(df, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(F.col("punct_ratio") * 4, F.lit(1.0))
    stop_term = F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
    score = F.round((length_term + punct_term + stop_term) / 3.0, 6)
    return feat.withColumn(out_col, score)


def stopword_hits(col, stopwords: Sequence[str]) -> F.Column:
    """How many tokens of `col` are in the stopword list (JVM-side:
    split + filter + array_contains)."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def language_id(df: DataFrame, text_col: str,
                out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic: score text against each language's
    stopword list, pick the argmax (ties -> lexicographically first lang,
    deterministic). 'und' when nothing hits."""
    c = F.col(text_col)
    # tokenize ONCE into a materialized column; each language's hit count
    # references the attribute (stopword_hits inline would re-split the
    # text per language)
    d = df.withColumn("__lid_words", F.split(F.lower(F.trim(c)), r"\s+"))

    def hits(lang):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(F.col("__lid_words"),
                               lambda w: F.array_contains(sw, w)))

    # array_max on struct compares (hits, lang) lexicographically -> ties
    # resolve to the LAST lang alphabetically; flip lang ordering for
    # deterministic first-wins instead
    scored_rev = F.array(*[
        F.struct(hits(lang).alias("hits"),
                 F.lit(chr(255 - i)).alias("ord"),
                 F.lit(lang).alias("lang"))
        for i, lang in enumerate(sorted(STOPWORDS))])
    best = F.array_max(F.filter(scored_rev, lambda s: s["hits"] > 0))
    return (d.withColumn(out_col,
                         F.coalesce(best["lang"], F.lit("und")))
            .drop("__lid_words"))


def rolling_hash_fingerprint(df: DataFrame, text_col: str,
                             id_col: str = "doc_id",
                             k: int = 4, window: int = 8,
                             out_col: str = "winnow_fp") -> DataFrame:
    """Winnowing-style document fingerprint: xxhash64 each word k-gram,
    take the minimum hash per sliding window of ``window`` grams, collect
    the distinct minima — a robust fingerprint for partial-overlap
    detection. Returns (id_col, out_col sorted array<long>).

    Why not array-only formulations: slicing inside transform rebuilds
    the hash array per window index (O(tokens^2) in one codegen
    expression — minutes on 500 docs), and a zip_with doubling trick
    references each level twice, so the expression tree doubles per
    level and codegen re-evaluates it (measured 25x slower than this
    shape at sf0.1). The explode + window-function plan does one pass,
    and the only shuffle is by document id — exactly how it parallelizes
    on a real cluster."""
    from pyspark.sql import Window as W
    from .dedup import word_grams
    # POSITIONAL grams (duplicates kept): winnowing windows slide over
    # gram positions, so deduplicating first (the old word_shingles
    # input) shifted windows and dropped repeated-gram fingerprints;
    # now structurally identical to the md5 oracle twin
    # winnow_md5_profile below
    hashes = F.transform(word_grams(F.col(text_col), k),
                         lambda g: F.xxhash64(g))
    ex = df.select(
        F.col(id_col),
        F.posexplode(hashes).alias("__pos", "__h"))
    per_doc = W.partitionBy(id_col)
    sliding = per_doc.orderBy("__pos").rowsBetween(W.currentRow, window - 1)
    mins = (ex.withColumn("__n", F.count(F.lit(1)).over(per_doc))
            .withColumn("__min", F.min("__h").over(sliding))
            # only full windows start at 0..n-window (a single truncated
            # window survives when the doc is shorter than `window`)
            .filter(F.col("__pos") <=
                    F.greatest(F.col("__n") - window, F.lit(0))))
    return (mins.groupBy(id_col)
            .agg(F.array_sort(F.collect_set("__min")).alias(out_col)))


# -- PII detection / redaction ----------------------------------------------
# Patterns are written in the COMMON subset of Java regex (Spark) and
# RE2 (DuckDB): char classes, {m,n}, \b, \s — no backrefs/lookaround —
# so the same string is usable on both sides of a differential oracle.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"
URL_RE = r"https?://[^\s]+"


def pii_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Per-row PII/link counts: emails, phone-like numbers, URLs —
    the scrub-stage feature columns of a training-data pipeline. All
    JVM-side regexp_extract_all; no UDFs, scales with the scan."""
    c = F.col(text_col)
    # idx=0 (whole match): Spark's regexp_extract_all defaults to
    # capture group 1, which errors on group-free patterns
    return df.withColumns({
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE),
                                                F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE),
                                                F.lit(0))),
        "n_urls": F.size(F.regexp_extract_all(c, F.lit(URL_RE),
                                              F.lit(0))),
    })


def pii_redact(col) -> F.Column:
    """Replace every email / phone-like / URL span with a typed token.
    Order matters: emails first (an email would otherwise survive inside
    a redacted URL's tail? no — but a URL containing an @ would be
    half-eaten by the email pass if URLs went second), so URLs redact
    FIRST, then emails, then phones."""
    out = F.regexp_replace(col, URL_RE, "<URL>")
    out = F.regexp_replace(out, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def winnow_md5_profile(df: DataFrame, text_col: str,
                       id_col: str = "doc_id",
                       k: int = 4, window: int = 8) -> DataFrame:
    """ENGINE-PORTABLE winnowing profile: md5-string k-gram hashes in
    position order (no dedup — winnowing is positional), sliding-window
    MIN over the hex strings (total-ordered, identical in any engine
    with md5), then per-document fingerprint-set size and smallest
    fingerprint. Oracle-checkable in plain SQL (d26); the xxhash64 twin
    rolling_hash_fingerprint stays the fast path. Same plan shape: one
    explode + per-doc window, shuffle key = document id."""
    from pyspark.sql import Window as W
    from .dedup import word_grams
    hashes = F.transform(word_grams(F.col(text_col), k),
                         lambda s: F.md5(s))
    ex = df.select(F.col(id_col), F.posexplode(hashes).alias("__pos", "__h"))
    per_doc = W.partitionBy(id_col)
    sliding = per_doc.orderBy("__pos").rowsBetween(W.currentRow, window - 1)
    mins = (ex.withColumn("__n", F.count(F.lit(1)).over(per_doc))
            .withColumn("__min", F.min("__h").over(sliding))
            .filter(F.col("__pos") <=
                    F.greatest(F.col("__n") - window, F.lit(0))))
    return (mins.groupBy(id_col)
            .agg(F.countDistinct("__min").alias("n_fp"),
                 F.min("__min").alias("min_fp")))


def token_rarity_scores(df: DataFrame, text_col: str,
                        id_col: str) -> DataFrame:
    """Corpus-relative token-rarity score per document: the mean corpus
    frequency ratio of the doc's tokens —
    score = SUM(corpus_count(tok)) / (n_tokens(doc) * total_tokens).
    Low scores mean rare-token-heavy documents (gibberish / OOV noise),
    high scores stop-word-heavy boilerplate — a KenLM-free cousin of
    perplexity filtering whose arithmetic stays EXACT integer until one
    final double division (bit-identical cross-engine; no float-sum
    order dependence, unlike a log-prob mean).

    Scale: token counts are one map-side-combined groupBy; the corpus
    total is a 1-row broadcast; the per-doc aggregate shuffles
    (id, count) pairs only — the document text never moves twice."""
    from .dedup import normalize_text
    tok = df.select(F.col(id_col),
                    F.explode(F.split(normalize_text(F.col(text_col)),
                                      " ")).alias("__tok"))
    freq = tok.groupBy("__tok").agg(F.count("*").alias("__cnt"))
    total = freq.agg(F.sum("__cnt").alias("__total"))
    return (tok.join(freq, "__tok")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("__cnt").alias("__s"))
            .crossJoin(F.broadcast(total))
            .select(F.col(id_col),
                    F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    # divide twice rather than multiplying the bigint
                    # denominators: n_tokens * total overflows int64 at
                    # ~20T corpus tokens x 1M-token docs (review r5);
                    # the two-step double division is still one
                    # deterministic expression per row
                    (F.col("__s").cast("double") / F.col("__total") /
                     F.col("n_tokens"))
                    .alias("rarity_score")))


def collocations(df: DataFrame, text_col: str, id_col: str,
                 min_count: int = 5, top_n: int = 20) -> DataFrame:
    """Collocation mining: adjacent word pairs scored by LIFT —
    ``P(w1 w2) / (P(w1) P(w2))`` rewritten as the all-integer ratio
    ``c_ab * N / (c_a * c_b)`` with one final double division. Lift is
    a strictly monotone transform of PMI (PMI = log2(lift)), so the
    ranking is identical while the arithmetic stays exactly
    reproducible cross-engine — no transcendental functions whose last
    ulp could differ between libm implementations (the d54 oracle
    hash-matches the scores to 6 digits).

    Returns the ``top_n`` pairs with ``c_ab >= min_count`` ordered by
    (lift desc, w1, w2). Bigrams never cross document boundaries
    (``id_col`` scopes the lead() window) and form AFTER dropping
    empty tokens — a single shuffle on the doc id; the count
    aggregations are map-side combined. The frequency floor is
    essential, not cosmetic: a pair of two hapaxes always has the
    corpus-maximum lift.
    """
    from pyspark.sql import Window as W
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    words = F.filter(F.split(F.lower(F.col(text_col)), " "),
                     lambda x: x != "")
    toks = df.select(F.col(id_col).alias("_doc"),
                     F.posexplode(words).alias("_i", "_w"))
    big = (toks.withColumn(
        "_w2", F.lead("_w").over(W.partitionBy("_doc").orderBy("_i")))
        .filter(F.col("_w2").isNotNull()))
    cab = (big.groupBy(F.col("_w").alias("w1"),
                       F.col("_w2").alias("w2"))
           .agg(F.count(F.lit(1)).alias("c_ab"))
           .filter(F.col("c_ab") >= min_count))
    cu = toks.groupBy(F.col("_w").alias("w")).agg(
        F.count(F.lit(1)).alias("c"))
    n = toks.agg(F.count(F.lit(1)).alias("nt"))
    j = (cab.join(cu.withColumnRenamed("w", "w1")
                  .withColumnRenamed("c", "c_a"), "w1")
         .join(cu.withColumnRenamed("w", "w2")
               .withColumnRenamed("c", "c_b"), "w2")
         .crossJoin(F.broadcast(n)))
    # c_a cast to double BEFORE the multiply: two ~1e11 stopword counts
    # overflow a 64-bit product (ANSI job kill / silent wrap), and the
    # double product is exact below 2^53 anyway (review r5)
    lift = F.round(F.col("c_ab").cast("double") * F.col("nt")
                   / (F.col("c_a").cast("double") * F.col("c_b")), 6)
    return (j.select("w1", "w2", F.col("c_ab").cast("bigint")
                     .alias("c_ab"), lift.alias("lift"))
            .orderBy(F.desc("lift"), "w1", "w2").limit(top_n))


def edit1_pairs(vocab: DataFrame, word_col: str = "w") -> DataFrame:
    """EXACT edit-distance-1 pairs over a vocabulary without any
    all-pairs stage — the SymSpell/FastSS deletion-neighborhood join
    (entity-resolution / typo-clustering primitive):

    every word generates its length+1 single-character-deletion
    variants (the word itself included); two words at edit distance 1
    under substitution/insertion/deletion NECESSARILY share a variant
    (substitute: delete the differing char from both; insert/delete:
    the shorter word IS a variant of the longer), so the candidate set
    from an equi-join on the variant is complete — blocking on first
    char or length bands, the naive choice, silently misses
    first-character substitutions. A final levenshtein == 1 filter
    removes the false candidates (distance-2 words can also share a
    variant, e.g. two different substitutions of the same position).

    One explode (length+1 x) + one equi-join on the variant + distinct:
    the candidate volume is sum(len+1) per word, never |V|^2. Returns
    ordered pairs (w1 < w2), each exactly once.
    """
    v = vocab.select(F.col(word_col).alias("_w")).distinct()
    variants = v.select(
        "_w",
        F.explode(F.expr(
            "transform(sequence(0, length(_w)), "
            "i -> concat(substring(_w, 1, i), substring(_w, i+2)))"
        )).alias("_var")).distinct()
    a = variants.select(F.col("_w").alias("w1"), "_var")
    b = variants.select(F.col("_w").alias("w2"), "_var")
    cand = (a.join(b, "_var")
            .filter(F.col("w1") < F.col("w2"))
            .select("w1", "w2").distinct())
    return cand.filter(F.levenshtein("w1", "w2") == 1)


def inverted_index(df: DataFrame, text_col: str, id_col: str,
                   max_postings: Optional[int] = None) -> DataFrame:
    """Posting lists: one row per distinct term with its exact document
    frequency and the sorted list of containing doc ids, optionally
    capped to the ``max_postings`` LOWEST ids (a deterministic cap —
    ``df_docs`` stays exact, so consumers can see how much was
    dropped). The retrieval-side primitive for term lookup, tf-idf
    weighting, and decontamination-by-term.

    Shape (capped path): (term, doc) pairs are deduplicated ON THE MAP
    SIDE (``array_distinct`` per document before the explode), then a
    TWO-PHASE exact top-K replaces the term window (VERDICT r5 item 2):

      phase 1  groupBy(spark_partition_id(), term) — the partial
               aggregate combines each input partition's pairs locally
               (map-side combine before any Exchange), and the
               (pid, term) Exchange spreads a stop term's partials
               across reducers instead of funnelling them into one
               task; each (pid, term) group reduces to ONE row holding
               its local pair count and its K lowest ids.
      phase 2  groupBy(term) merges partials: df_docs = SUM of local
               counts (exact — a doc lives in exactly one partition and
               contributes each term once), postings = K lowest of the
               union of per-partition K-minima (exact — every global
               minimum is a minimum of its own partition).

    So the term-keyed Exchange carries at most ``numInputPartitions``
    rows of ≤K ids per term — bounded regardless of how hot a stop
    term is — and NO task ever sorts a stop term's full posting set
    (the old single-window form did; the cap bounded output, not the
    exchange). Plan pinned in test_operators.py: partial aggregation
    before the first Exchange, no Window operator anywhere.

    The uncapped path keeps the one-shuffle groupBy/collect_list form:
    materializing every posting is inherently a full-list sort, so use
    a cap (or a broadcast stop-term filter) on hot corpora.

    NULL ids are the caller's contract to exclude (Spark's sort_array
    puts NULLs first, DuckDB's list_sort last — a NULL id would land
    in engine-dependent posting slots); text NULLs simply contribute
    no pairs on either engine.
    """
    if max_postings is not None and max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    clash = {"term", "df_docs", "postings"} & {text_col, id_col}
    if clash:
        raise ValueError(f"rename input columns {sorted(clash)}: they "
                         "collide with the output schema")
    toks = df.select(
        F.explode(F.array_distinct(
            F.filter(F.split(F.lower(F.col(text_col)), " "),
                     lambda w: w != ""))).alias("term"),
        F.col(id_col).alias("__ii_doc"))
    if max_postings is None:
        return (toks.groupBy("term")
                .agg(F.count(F.lit(1)).cast("bigint").alias("df_docs"),
                     F.sort_array(F.collect_list("__ii_doc"))
                     .alias("postings")))
    k = max_postings
    partials = (toks
                .groupBy(F.spark_partition_id().alias("__ii_pid"), "term")
                .agg(F.count(F.lit(1)).alias("__ii_c"),
                     F.slice(F.sort_array(F.collect_list("__ii_doc")),
                             1, k).alias("__ii_topk")))
    return (partials.groupBy("term")
            .agg(F.sum("__ii_c").cast("bigint").alias("df_docs"),
                 F.slice(F.sort_array(F.flatten(
                     F.collect_list("__ii_topk"))), 1, k)
                 .alias("postings")))


def bm25_scores(df: DataFrame, text_col: str, id_col: str,
                query_terms: Sequence[str], k1: float = 1.2,
                b: float = 0.75, idf_form: str = "log",
                topk: Optional[int] = None) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms —
    the lexical retrieval scorer that pairs with the embedding-ANN path
    (operators/similarity.py) for hybrid search, and the ranking
    consumer of the inverted-index statistics:

        score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                               (tf(t,d) + k1·(1 - b + b·|d|/avglen))

    ``idf_form``: ``"log"`` is classic BM25+ idf, ln((N - df + 0.5) /
    (df + 0.5) + 1); ``"ratio"`` drops the ln for the raw ratio — the
    same per-term ordering (ln is monotone), engine-portable without
    libm (the repo's oracle rule: no log/exp in oracle-gated scores —
    d69 registers the ratio form; rankings can differ ACROSS multi-term
    sums, which is why both forms are exposed rather than silently
    substituted).

    Scale shape: tokens are filtered to the query terms BEFORE any
    shuffle (an isin() the scan can evaluate), so every aggregate runs
    on the matched sliver, not the corpus; |d| is computed map-side in
    the same projection (no second pass); avglen and the per-term df/N
    are broadcast 1-row/`|terms|`-row aggregates. One groupBy(id, term)
    + one groupBy(id) on sliver-sized data. Returns (id, score) —
    ``topk`` adds an ORDER BY score desc with the id as tiebreak.

    NULL-text docs are excluded from avglen (split(NULL) is NULL and
    AVG ignores it — identical in DuckDB, pinned in the d69 oracle);
    empty strings count as length-0 documents. Neither can ever score
    (no tokens), so exclusion only affects the normalizer.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if idf_form not in ("log", "ratio"):
        raise ValueError(f"idf_form must be log/ratio, got {idf_form!r}")
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("__bm_id"),
        F.size(F.filter(F.split(F.lower(F.col(text_col)), " "),
                        lambda w: w != "")).alias("__bm_len"),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), " "),
                           lambda w: w != "")).alias("__bm_t"))
    hits = toks.filter(F.col("__bm_t").isin(terms))
    tf = (hits.groupBy("__bm_id", "__bm_t")
          .agg(F.count(F.lit(1)).cast("double").alias("__tf"),
               F.max("__bm_len").alias("__len")))
    # tf is referenced twice below (df(t) + the score join); it is
    # sliver-sized (matched docs x |terms|), so one lazy checkpoint
    # stops the corpus tokenization from re-executing per reference.
    # N and avglen share ONE corpus pass; df(t) derives from tf (one
    # row per (doc, term) already) instead of re-scanning the corpus —
    # the whole scorer reads the raw data exactly twice (tf pass +
    # stats pass), review r6
    tf = tf.localCheckpoint(eager=False)
    # NULL text must stay OUT of avglen on every config (ADVICE r6):
    # size(split(NULL)) is NULL under Spark 4's ANSI default (avg skips
    # it) but -1 with spark.sql.ansi.enabled=false on 3.x, which would
    # silently skew every score. The explicit when() makes the
    # exclusion config-independent instead of ANSI-dependent.
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.when(F.col(text_col).isNull(), F.lit(None))
              .otherwise(F.size(F.filter(
                  F.split(F.lower(F.col(text_col)), " "),
                  lambda w: w != "")))).alias("__avg"))
    dfreq = (tf.groupBy("__bm_t")
             .agg(F.count(F.lit(1)).cast("double").alias("__df")))
    x = (tf.join(F.broadcast(dfreq), "__bm_t")
         .crossJoin(F.broadcast(stats)))
    ratio = ((F.col("__n").cast("double") - F.col("__df") + F.lit(0.5))
             / (F.col("__df") + F.lit(0.5)))
    idf = (F.log(ratio + F.lit(1.0)) if idf_form == "log"
           else ratio)
    denom = (F.col("__tf") + F.lit(float(k1))
             * (F.lit(1.0 - b) + F.lit(float(b)) * F.col("__len")
                .cast("double") / F.col("__avg")))
    contrib = idf * F.col("__tf") * F.lit(float(k1 + 1.0)) / denom
    out = (x.groupBy("__bm_id")
           .agg(F.round(F.sum(contrib), 6).alias("score"))
           .select(F.col("__bm_id").alias(id_col), "score"))
    if topk is not None:
        if topk < 1:
            raise ValueError(f"topk must be >= 1, got {topk}")
        out = out.orderBy(F.col("score").desc(), F.col(id_col)) \
                 .limit(topk)
    return out
