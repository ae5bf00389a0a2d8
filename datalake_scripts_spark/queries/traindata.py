"""Training-data curation queries: published-heuristic quality rules,
chunk-level dedup, sequence packing, mixture sampling, vocabulary build.

These extend the LLM-ops family (llmops.py) with the remaining steps a
large-scale pretraining-data pipeline runs between "raw corpus" and
"tokenizer-ready shards". Reference parity: the reference engine has no
equivalents (its scope ends at normalize+serve, monkey_proc.py /
vk_proc.py); these are engine extensions per SURVEY.md §2.8b.

Scale notes (100 TB shapes):
- quality rules and mixture sampling are map-only (no shuffle);
- chunk dedup shuffles once on the chunk hash (uniform key — md5);
- sequence packing windows inside hash buckets, never a global sort;
- vocabulary build is partial-agg + TakeOrdered (map-side combine,
  driver receives only the top-k).

Determinism: integer arithmetic + double division of exact integer
parts everywhere (bit-identical across engines); deterministic
tie-breaks on every top-k/keep-first rule; the Knuth multiplicative
hash (`(key * 2654435761) % m`) for engine-portable sampling/bucketing
(same pattern as llmops.sample_stratified_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as X
from .registry import query, t

SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, §A1.1 heuristics family)
# ---------------------------------------------------------------------------

_GOPHER_MIN_WORDS = 10
_GOPHER_MAX_WORDS = 200
_GOPHER_MIN_MWL = 2.0
_GOPHER_MAX_MWL = 10.0
_GOPHER_MIN_ALPHA = 0.8
_GOPHER_MIN_STOP_HITS = 2


def _gopher_sql() -> str:
    sw = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS_EN) + "]"
    return f"""
    WITH s AS (
      SELECT doc_id, {SQL_TOKS} AS tk FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
               / GREATEST(len(tk), 1) AS mean_word_len,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / GREATEST(len(tk), 1) AS alpha_word_ratio,
             CAST(len(list_filter(tk, x -> list_contains({sw}, x))) AS BIGINT)
               AS stopword_hits
      FROM s
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, stopword_hits,
           CAST(CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
                      AND mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
                      AND alpha_word_ratio >= {_GOPHER_MIN_ALPHA}
                      AND stopword_hits >= {_GOPHER_MIN_STOP_HITS}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM m
    """


@query("quality_gopher_rules", sql=_gopher_sql())
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-paper-style repetition-free quality gates: word-count
    bounds, mean-word-length bounds, alphabetic-word ratio, minimum
    stopword evidence. Map-only; every rule a native expression (one
    whole-stage-codegen span, no UDF)."""
    docs = t(spark, sf_dir, "documents")
    toks = X.tokens("text")
    n_words = F.size(toks)
    mwl = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("double") / F.greatest(n_words, F.lit(1))
    sw = F.array(*[F.lit(w) for w in X.STOPWORDS_EN])
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast(
        "double"
    ) / F.greatest(n_words, F.lit(1))
    hits = F.size(F.filter(toks, X._contains(sw))).cast("bigint")
    m = docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha.alias("alpha_word_ratio"),
        hits.alias("stopword_hits"),
    )
    keep = (
        F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
        & (F.col("alpha_word_ratio") >= _GOPHER_MIN_ALPHA)
        & (F.col("stopword_hits") >= _GOPHER_MIN_STOP_HITS)
    )
    return m.withColumn("keep", keep.cast("int"))


# ---------------------------------------------------------------------------
# Chunk-level exact dedup (the distributed form of C4's line-level dedup)
# ---------------------------------------------------------------------------

_CHUNK_WORDS = 20


def _chunk_dedup_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS tk FROM documents
    ), ch AS (
      SELECT doc_id,
             unnest(list_transform(range(CAST(ceil(len(tk)/{_CHUNK_WORDS}.0) AS BIGINT)),
                    i -> struct_pack(idx := i,
                                     h := md5(array_to_string(
                                        tk[i*{_CHUNK_WORDS}+1:i*{_CHUNK_WORDS}+{_CHUNK_WORDS}], ' '))))) AS c
      FROM toks WHERE len(tk) > 0
    ), ranked AS (
      SELECT doc_id, c.idx AS chunk_idx, c.h AS chunk_hash,
             row_number() OVER (PARTITION BY c.h ORDER BY doc_id, c.idx) AS rn
      FROM ch
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS total_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS dup_chunks
    FROM ranked GROUP BY doc_id
    """


@query("dedup_paragraph_chunks", sql=_chunk_dedup_sql())
def dedup_paragraph_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: shred each document into fixed 20-token
    chunks (the paragraph unit for this corpus — the synthetic docs have
    no newlines), keep the first corpus-wide occurrence of each chunk
    (min (doc_id, chunk_idx)), report per-doc survival. One shuffle, on
    the md5 chunk hash — a uniform key, so no skew at 100 TB; the
    shred itself is a generate (no Python)."""
    docs = t(spark, sf_dir, "documents")
    toks = X.tokens("text")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_CHUNK_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(
            F.array_join(F.slice(toks, i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " ")
        ),
    )
    ch = (
        docs.filter(F.size(toks) > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_hash"))
    )
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    ranked = ch.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("total_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("kept_chunks"),
        F.sum(F.when(F.col("rn") == 1, 0).otherwise(1))
        .cast("bigint")
        .alias("dup_chunks"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (bucketed greedy — the distributed sample-packing step)
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 512
_PACK_BUCKETS = 8


def _pack_sql() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id,
             (doc_id * 2654435761) % {_PACK_BUCKETS} AS bucket,
             CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, bucket, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / {_PACK_CAPACITY}.0) AS BIGINT) AS pack_id
      FROM d
    )
    SELECT bucket, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed GROUP BY bucket, pack_id
    """


@query("pack_sequences_greedy", sql=_pack_sql())
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-capacity packs
    for training shards. Greedy-sequential within Knuth-hash buckets —
    the distributed form: a global first-fit needs a global sort +
    sequential state, so we pack per bucket (window over bucket, ordered
    by key; exclusive running token sum div capacity). At 100 TB the
    bucket count scales with the cluster and no stage sees more than one
    bucket's worth of window state."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % _PACK_BUCKETS).alias("bucket"),
        X.token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = d.withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(float(_PACK_CAPACITY))
        ).cast("bigint"),
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Mixture sampling (per-source target rates, reproducible)
# ---------------------------------------------------------------------------

_MIX_RATES = {"src0": 500, "src1": 250, "src2": 100, "src3": 50}  # per-mille
_MIX_DEFAULT = 20


def _mixture_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES.items()
    )
    return f"""
    WITH d AS (
      SELECT doc_id, source,
             CASE {cases} ELSE {_MIX_DEFAULT} END AS rate_pm,
             (doc_id * 2654435761) % 1000 AS h
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN h < rate_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN h < rate_pm THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS achieved_rate
    FROM d GROUP BY source
    """


@query("mixture_weighted_sample", sql=_mixture_sql())
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture construction: per-source target sampling rates
    applied via the Knuth hash — reproducible across engines, runs and
    partitionings (df.sample() is neither), so a mixture recipe is an
    auditable artifact. Map-only + one tiny agg; the keep decision
    never shuffles the corpus."""
    docs = t(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for s, r in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    d = docs.select(
        "source",
        rate.alias("rate_pm"),
        ((F.col("doc_id") * F.lit(2654435761)) % 1000).alias("h"),
    )
    kept = F.sum(F.when(F.col("h") < F.col("rate_pm"), 1).otherwise(0))
    return d.groupBy("source").agg(
        F.count("*").alias("n_total"),
        kept.cast("bigint").alias("n_kept"),
        (kept.cast("double") / F.count("*")).alias("achieved_rate"),
    )


# ---------------------------------------------------------------------------
# Vocabulary build (tokenizer-training prep)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# TF-IDF top terms (relevance scoring over the corpus vocabulary)
# ---------------------------------------------------------------------------

_TFIDF_TOP = 3


def _tfidf_sql() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ), df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY token
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf FROM (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rn
      FROM scored
    ) WHERE rn <= {_TFIDF_TOP}
    """


@query("text_tfidf_top_terms", sql=_tfidf_sql())
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term), top-3 terms per document. Scale shape:
    term frequencies shuffle once on (doc_id, token); the document-
    frequency table is vocabulary-sized (tiny vs the corpus) so it and
    the 1-row corpus count enter as BROADCAST joins — the fact table
    never re-shuffles for the score; the final per-doc top-k windows on
    doc_id. ROUND(...,6) on the LN output only (libm parity rule,
    queries/__init__.py)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        # bcast: O(vocab) df (Heaps' law) + O(1) single-row corpus count
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOP)
        .select("doc_id", "token", "tfidf")
    )


# ---------------------------------------------------------------------------
# Vocabulary build (tokenizer-training prep)
# ---------------------------------------------------------------------------

_VOCAB_TOP = 50


def _vocab_sql() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS token FROM documents
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM tok GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT {_VOCAB_TOP}
    """


@query("vocab_token_frequencies", sql=_vocab_sql())
def vocab_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term + document frequencies, top-k by
    count (tie-broken by token — the rank-50 boundary is deterministic
    so both engines pick the same set). Partial aggregation map-side;
    the driver receives only k rows via TakeOrdered."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(_VOCAB_TOP)
    )


@query(
    "quality_unigram_logprob",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS token FROM documents),
    uni AS (
      SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM uni),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln((uni.c + 1.0) / (tot.n + tot.v)) * 1000000)
                  AS BIGINT) AS lp_micro
      FROM tok t JOIN uni ON uni.token = t.token CROSS JOIN tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(-SUM(lp_micro) AS BIGINT) AS sum_neglogprob_micro,
           CAST(-SUM(lp_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_neglogprob_micro
    FROM scored GROUP BY doc_id
    """,
)
def quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: build a corpus unigram model
    (add-one smoothing over vocab), score every document by its total
    and average negative log-probability — the standard
    'perplexity filter' gate of pretraining pipelines, here without any
    external LM.

    Determinism: per-token logprobs are fixed-pointed to micro-nats
    (round(ln*1e6) -> BIGINT, round() wrapping a libm output per the
    repo's determinism contract), so the per-doc SUM is exact integer
    arithmetic — order-independent across partitionings and engines;
    the avg is one double division of exact parts.

    Scale shape: tokens shuffle once to build the unigram table, once
    (by token) for the prob join — the model table is
    vocabulary-sized, broadcastable at any corpus scale; the 1-row
    totals cross-join is the lazy scalar-attach idiom (same as tfidf)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    lp_micro = F.round(
        F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))) * 1e6
    ).cast("bigint")
    scored = (
        # bcast: O(vocab) unigram LM (Heaps' law) + O(1) totals row
        tok.join(F.broadcast(uni), "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp_micro.alias("lp_micro"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum("lp_micro")).cast("bigint").alias("sum_neglogprob_micro"),
        (
            (-F.sum("lp_micro")).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_neglogprob_micro"),
    )


@query(
    "split_train_val_test",
    sql="""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN (doc_id * 2654435761) % 100 < 90 THEN 'train'
                  WHEN (doc_id * 2654435761) % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split,
             length(text) AS n_chars
      FROM documents)
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM assigned GROUP BY split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by Knuth
    multiplicative hash of the key — reproducible across engines, runs,
    partitionings, and corpus growth (a doc's split never changes when
    other docs are added, unlike randomSplit). Map-only assignment;
    the summary agg is partial-aggregated. The per-doc assignment is
    the same expression users would write into a partition column."""
    docs = t(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % 100
    assigned = docs.select(
        "doc_id",
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias("split"),
        F.length("text").alias("n_chars"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@query(
    "split_leakage_safe",
    sql=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct({{toks}})), ' '))
               AS fingerprint
      FROM documents),
    assigned AS (
      SELECT doc_id, fingerprint,
             CASE WHEN instr('0123456789abcdef',
                             substr(md5(fingerprint), 1, 1)) - 1 < 12
                    THEN 'train'
                  WHEN instr('0123456789abcdef',
                             substr(md5(fingerprint), 1, 1)) - 1 < 14
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM fp)
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_groups,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM assigned GROUP BY split
    """.format(toks=SQL_TOKS),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split coin is hashed from
    the document's DEDUP-GROUP key (the order-insensitive token-set
    fingerprint), not its id — so exact duplicates and token-reordered
    twins can NEVER straddle train and test, the eval-contamination
    mode a per-id split (split_train_val_test) permits by design.
    Map-only: no join, no shuffle before the summary agg; the same
    expression composes with the near-dup pipeline by hashing
    dedup_duplicate_clusters' cluster_id instead of the fingerprint
    when the corpus needs fuzzy-group safety. Coin = md5 nibble of the
    fingerprint (12/2/2 of 16 => 75/12.5/12.5), identical in both
    engines (simhash-twin primitive set)."""
    from ..operators.text import fingerprint

    docs = t(spark, sf_dir, "documents")
    fp = docs.select("doc_id", fingerprint("text").alias("fingerprint"))
    nib = F.expr(
        "instr('0123456789abcdef', substr(md5(fingerprint), 1, 1)) - 1"
    )
    assigned = fp.select(
        "doc_id",
        "fingerprint",
        F.when(nib < 12, "train").when(nib < 14, "val").otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_groups"),
        F.min("doc_id").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# In-query quality classifier (multinomial Naive Bayes) and DSIR
# importance weighting — the two published "model-based" curation gates
# ---------------------------------------------------------------------------

# weak label: the "curated reference" subset (the Wikipedia/books side
# of the GPT-3 / CCNet quality-filter setup); everything else is "web"
_NB_POS = "('src0', 'src1', 'src2', 'src3', 'src4')"


def _nb_sql() -> str:
    return f"""
    WITH lab AS (
      SELECT doc_id, source IN {_NB_POS} AS pos, {SQL_TOKS} AS tk
      FROM documents
    ), tok AS (
      SELECT doc_id, pos, unnest(tk) AS token FROM lab
    ), vocab AS (
      SELECT token,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
      FROM tok GROUP BY token
    ), tot AS (
      SELECT SUM(cp) AS np, SUM(cn) AS nn, COUNT(*) AS v FROM vocab
    ), prior AS (
      SELECT CAST(round(ln(CAST(SUM(CASE WHEN source IN {_NB_POS}
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(SUM(CASE WHEN source IN {_NB_POS}
                                   THEN 0 ELSE 1 END) AS DOUBLE)) * 1000000)
                  AS BIGINT) AS prior_micro
      FROM documents
    ), scored AS (
      SELECT t.doc_id, t.pos,
             CAST(round(ln((vocab.cp + 1.0) / (tot.np + tot.v)) * 1000000)
                  AS BIGINT)
             - CAST(round(ln((vocab.cn + 1.0) / (tot.nn + tot.v)) * 1000000)
                    AS BIGINT) AS diff_micro
      FROM tok t JOIN vocab ON vocab.token = t.token CROSS JOIN tot
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(p.prior_micro + SUM(s.diff_micro) AS BIGINT)
             AS log_odds_micro,
           CASE WHEN p.prior_micro + SUM(s.diff_micro) > 0
                THEN 'pos' ELSE 'neg' END AS pred,
           CASE WHEN ANY_VALUE(s.pos) THEN 'pos' ELSE 'neg' END AS label
    FROM scored s CROSS JOIN prior p
    GROUP BY s.doc_id, p.prior_micro
    """


@query("quality_nb_classifier", sql=_nb_sql())
def quality_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter, trained and applied in ONE query:
    multinomial Naive Bayes with add-one smoothing over a weak label
    (a curated-source subset vs the rest) — the closed-form stand-in
    for the GPT-3 / CCNet logistic quality classifier
    (Brown et al. 2020 §A; Wenzek et al. 2020). Training IS counting,
    so the whole fit is one corpus groupBy(token) with conditional
    sums; scoring is a broadcast join of the vocabulary-sized model.

    Determinism: each class-conditional token log-prob is fixed-pointed
    to micro-nats BEFORE differencing and summing (round(ln*1e6) ->
    BIGINT per the repo contract), so per-doc log-odds are exact
    integer sums — order-independent across engines; the class prior
    is one fixed-pointed scalar.

    100 TB shape: two corpus-wide stages (token counts, score join);
    the model (vocab + 1-row totals/prior) is Heaps'-law bounded and
    broadcast. No driver-side training loop — a weekly re-fit is the
    same query on a new snapshot."""
    docs = t(spark, sf_dir, "documents")
    pos_set = [f"src{i}" for i in range(5)]
    lab = docs.select(
        "doc_id",
        F.col("source").isin(pos_set).alias("pos"),
        X.tokens("text").alias("tk"),
    )
    tok = lab.select("doc_id", "pos", F.explode("tk").alias("token"))
    vocab = tok.groupBy("token").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("cp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("bigint").alias("cn"),
    )
    tot = vocab.agg(
        F.sum("cp").alias("np"),
        F.sum("cn").alias("nn"),
        F.count(F.lit(1)).alias("v"),
    )
    prior = docs.agg(
        F.round(
            F.log(
                F.sum(F.when(F.col("source").isin(pos_set), 1).otherwise(0))
                .cast("double")
                / F.sum(F.when(F.col("source").isin(pos_set), 0).otherwise(1))
                .cast("double")
            )
            * 1e6
        )
        .cast("bigint")
        .alias("prior_micro")
    )
    micro = lambda num, den: F.round(F.log(num / den) * 1e6).cast("bigint")
    scored = (
        # bcast: O(vocab) NB model (Heaps' law) + two O(1) scalar rows
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "pos",
            (
                micro(F.col("cp") + F.lit(1.0), F.col("np") + F.col("v"))
                - micro(F.col("cn") + F.lit(1.0), F.col("nn") + F.col("v"))
            ).alias("diff_micro"),
        )
    )
    # bcast: O(1) prior row
    agg = scored.crossJoin(F.broadcast(prior)).groupBy(
        "doc_id", "prior_micro"
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("diff_micro").alias("sum_diff"),
        F.any_value("pos").alias("pos"),
    )
    lo = F.col("prior_micro") + F.col("sum_diff")
    return agg.select(
        "doc_id",
        "n_tokens",
        lo.cast("bigint").alias("log_odds_micro"),
        F.when(lo > 0, "pos").otherwise("neg").alias("pred"),
        F.when(F.col("pos"), "pos").otherwise("neg").alias("label"),
    )


_DSIR_B = 4096  # hashed feature buckets (md5 first 3 nibbles)
_DSIR_K = 100  # docs selected into the target mixture


def _dsir_sql() -> str:
    b = _DSIR_B
    return f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({SQL_TOKS}) AS token FROM documents
    ), feat AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5(token), 1, 3)) AS BIGINT) AS f
      FROM tok
    ), raw AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS cr FROM feat GROUP BY f
    ), tgt AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS ct FROM feat
      WHERE source IN {_NB_POS} GROUP BY f
    ), tots AS (
      SELECT (SELECT SUM(cr) FROM raw) AS nr,
             (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS nt
    ), lm AS (
      SELECT raw.f,
             CAST(round(ln((COALESCE(tgt.ct, 0) + 1.0) / (tots.nt + {b}))
                  * 1000000) AS BIGINT)
             - CAST(round(ln((raw.cr + 1.0) / (tots.nr + {b}))
                    * 1000000) AS BIGINT) AS lw_micro
      FROM raw LEFT JOIN tgt ON tgt.f = raw.f CROSS JOIN tots
    )
    SELECT feat.doc_id,
           ANY_VALUE(feat.source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lm.lw_micro) AS BIGINT) AS weight_micro
    FROM feat JOIN lm ON lm.f = feat.f
    GROUP BY feat.doc_id
    ORDER BY weight_micro DESC, doc_id LIMIT {_DSIR_K}
    """


@query("dsir_importance_select", sql=_dsir_sql())
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): estimate hashed-unigram language models of a TARGET
    distribution (the curated-source subset) and the RAW corpus, weight
    every raw doc by its log importance ratio sum_f log(pt(f)/pr(f)),
    and select the top-k — the published recipe for biasing pretraining
    data toward a target domain without a trained classifier.

    The hashed feature space (md5 first 3 nibbles -> 4096 buckets) is
    the paper's memory bound: both LMs are FIXED-size tables regardless
    of corpus vocabulary, broadcastable forever. Determinism: the
    per-bucket log ratio is fixed-pointed to micro-nats before the
    per-doc integer sum; selection is deterministic top-k by
    (weight desc, doc_id) — the paper's Gumbel-noise resampling is the
    same computation with a noise column added, kept noiseless here for
    cross-engine exactness.

    100 TB shape: two bucket-sized groupBys over one corpus token scan
    + one broadcast score join; no shuffle keyed on anything larger
    than 4096 buckets except the final per-doc partial agg; top-k is
    TakeOrdered (map-side truncation, only k rows reach the driver)."""
    docs = t(spark, sf_dir, "documents")
    pos_set = [f"src{i}" for i in range(5)]
    b = _DSIR_B
    feat = docs.select(
        "doc_id",
        "source",
        F.explode(X.tokens("text")).alias("token"),
    ).select(
        "doc_id",
        "source",
        F.conv(F.substring(F.md5("token"), 1, 3), 16, 10)
        .cast("bigint")
        .alias("f"),
    )
    raw = feat.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("cr"))
    tgt = (
        feat.filter(F.col("source").isin(pos_set))
        .groupBy("f")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )
    tots = raw.agg(F.sum("cr").alias("nr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    )
    micro = lambda num, den: F.round(F.log(num / den) * 1e6).cast("bigint")
    lm = (
        # bcast: both LM tables are hash-bounded (<= 4096 rows) + O(1) totals
        raw.join(F.broadcast(tgt), "f", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "f",
            (
                micro(
                    F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0),
                    F.col("nt") + F.lit(b),
                )
                - micro(F.col("cr") + F.lit(1.0), F.col("nr") + F.lit(b))
            ).alias("lw_micro"),
        )
    )
    # bcast: <= 4096-row bucket LM
    return (
        feat.join(F.broadcast(lm), "f")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lw_micro").cast("bigint").alias("weight_micro"),
        )
        .orderBy(F.desc("weight_micro"), "doc_id")
        .limit(_DSIR_K)
    )


# ---------------------------------------------------------------------------
# Flagship composition: the full curation pipeline in one query
# ---------------------------------------------------------------------------


def _curate_sql() -> str:
    from .llmops import _SQL_JACCARD_CTES

    sw = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS_EN) + "]"
    return f"""
    WITH RECURSIVE {_SQL_JACCARD_CTES},
    edges AS (SELECT id_a AS u, id_b AS v FROM jpairs
              UNION SELECT id_b, id_a FROM jpairs),
    reach(doc_id, r) AS (
      SELECT u, v FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON r.doc_id = e.v),
    clusters AS (SELECT doc_id, LEAST(doc_id, MIN(r)) AS cluster_id
                 FROM reach GROUP BY doc_id),
    dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
    gm AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
               / GREATEST(len(tk), 1) AS mwl,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / GREATEST(len(tk), 1) AS alpha,
             CAST(len(list_filter(tk, x -> list_contains({sw}, x))) AS BIGINT)
               AS sw_hits
      FROM (SELECT doc_id, {SQL_TOKS} AS tk FROM documents)),
    csh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
      FROM (SELECT doc_id, {SQL_TOKS} AS tk FROM documents)
      WHERE len(tk) >= 3),
    bench AS (SELECT DISTINCT shingle FROM csh WHERE doc_id < 10),
    contaminated AS (
      SELECT c.doc_id FROM csh c JOIN bench b ON c.shingle = b.shingle
      WHERE c.doc_id >= 10
      GROUP BY c.doc_id HAVING COUNT(*) >= 5)
    SELECT d.doc_id, d.lang, gm.n_words
    FROM documents d
    JOIN gm ON gm.doc_id = d.doc_id
    WHERE d.doc_id >= 10
      AND gm.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
      AND gm.mwl BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
      AND gm.alpha >= {_GOPHER_MIN_ALPHA}
      AND gm.sw_hits >= {_GOPHER_MIN_STOP_HITS}
      AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """


@query("curate_corpus_pipeline", sql=_curate_sql())
def curate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's thesis in one query — the full pretraining curation
    pipeline: Gopher quality gates AND near-duplicate removal
    (jaccard pairs -> connected components -> keep the min-id
    representative) AND benchmark decontamination (drop docs sharing
    >= 5 trigrams with the held-out set), emitting the cleaned corpus
    with per-doc token counts.

    Every stage reuses the already-verified building blocks
    (quality_gopher_rules metrics, ngram_jaccard_pairs +
    duplicate_clusters_star, decontaminate_against_benchmark), so this
    checks their COMPOSITION end-to-end against one oracle. Scale
    shape: the gates are map-only; the drop/contaminated sets are tiny
    relative to the corpus and broadcast into anti-joins; nothing here
    adds a shuffle beyond the stages' own."""
    from ..operators.dedup import duplicate_clusters_star, ngram_jaccard_pairs
    from .llmops import decontaminate_against_benchmark
    from .traindata import quality_gopher_rules as _gopher  # self-module ref

    docs = t(spark, sf_dir, "documents")
    gates = _gopher(spark, sf_dir).filter(F.col("keep") == 1).select(
        "doc_id", "n_words"
    )
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5,
                                block_col="lang")
    clusters = duplicate_clusters_star(pairs)
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    contaminated = decontaminate_against_benchmark(spark, sf_dir).select("doc_id")
    return (
        docs.filter(F.col("doc_id") >= 10)
        .join(gates, "doc_id")
        # no hint: dropped/contaminated doc lists are O(corpus) — AQE
        # decides (broadcast-anti while they fit, shuffle-anti beyond)
        .join(dropped, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_words")
    )


@query(
    "udtf_chunk_documents",
    sql="""
    WITH nums AS (SELECT r.i FROM range(1, 10001) AS r(i))
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           substr(text, (i - 1) * 120 + 1, 120) AS chunk,
           CAST(length(substr(text, (i - 1) * 120 + 1, 120)) AS INT) AS chunk_len
    FROM documents JOIN nums ON (i - 1) * 120 < length(text)
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document chunking through the engine's Python UDTF
    surface (functions.udtfs.ChunkText, Arrow-backed), invoked from SQL
    as a LATERAL table function — the set-returning-function form of the
    reference's explode-into-child-table pattern
    (monkey_proc.py:294-312). The oracle replays the slicing with a
    constant numbers table (DuckDB range() rejects lateral/subquery
    bounds; 10001 covers docs up to 1.2M chars — testdata max is ~580);
    texts are ASCII so char slicing agrees across engines. Production
    chunking stays on the native dedup_paragraph_chunks path; this is
    the SQL-extension point."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk, c.chunk_len
        FROM _udtf_docs d, LATERAL chunk_text(d.text, 120) c
        """
    )


@query(
    "quality_bigram_logprob",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    uni AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cu FROM
      (SELECT unnest({SQL_TOKS}) AS token FROM documents) GROUP BY token),
    vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                    i -> array_to_string(tk[i:i+1], ' '))) AS bigram
      FROM tok WHERE len(tk) >= 2),
    bgc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cb FROM bg
            GROUP BY bigram),
    scored AS (
      SELECT b.doc_id,
             CAST(round(ln((CAST(bgc.cb AS DOUBLE) + 1.0)
                           / (CAST(uni.cu AS DOUBLE) + CAST(vocab.v AS DOUBLE)))
                        * 1000000) AS BIGINT) AS lp_micro
      FROM bg b
      JOIN bgc ON bgc.bigram = b.bigram
      JOIN uni ON uni.token = string_split(b.bigram, ' ')[1]
      CROSS JOIN vocab)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(-SUM(lp_micro) AS BIGINT) AS sum_neglogprob_micro,
           CAST(-SUM(lp_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_neglogprob_micro
    FROM scored GROUP BY doc_id
    """,
)
def quality_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity proxy: score every document by the total /
    average negative conditional log-probability
    -ln P(w_i | w_{i-1}) = -ln((c(bigram)+1) / (c(context) + V))
    under an add-one-smoothed corpus bigram model — the sharper
    fluency gate over the unigram scorer (quality_unigram_logprob):
    repeated boilerplate scores high, shuffled-word salad scores low
    even when its unigram profile is natural.

    Same determinism contract: round(ln * 1e6) -> BIGINT micro-nats
    (round-after-libm), exact integer sums, one final double division.
    Scale shape: bigram + unigram model tables are vocabulary-sized
    (broadcastable); the doc bigram stream shuffles once per model
    join; V attaches as the 1-row lazy scalar (lint-allowlisted)."""
    docs = t(spark, sf_dir, "documents")
    toks = X.tokens("text")
    pairs = F.slice(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        1,
        F.greatest(F.size(toks) - 1, F.lit(0)),
    )
    bg = docs.select("doc_id", F.explode(pairs).alias("bigram")).filter(
        F.col("bigram").isNotNull()
    )
    tok = docs.select(F.explode(toks).alias("token"))
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cu"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    bgc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    ctx = F.split(F.col("bigram"), " ").getItem(0)
    lp = F.round(
        F.log(
            (F.col("cb").cast("double") + 1.0)
            / (F.col("cu").cast("double") + F.col("v").cast("double"))
        )
        * 1e6
    ).cast("bigint")
    scored = (
        # bcast: O(bigram-vocab) — observed bigram TYPES grow
        # sub-linearly (Heaps-style; blocklist op documents the
        # shuffle-join variant for >1e5-term models) + O(vocab) unigram
        bg.join(F.broadcast(bgc), "bigram")
        .withColumn("_ctx", ctx)
        .join(F.broadcast(uni.withColumnRenamed("token", "_ctx")), "_ctx")
        # bcast: O(1) — single-row vocab-size scalar attach
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp_micro"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("lp_micro")).cast("bigint").alias("sum_neglogprob_micro"),
        (
            (-F.sum("lp_micro")).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_neglogprob_micro"),
    )


@query(
    "sample_exact_per_group",
    sql="""
    SELECT c_mktsegment, c_custkey, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT c_mktsegment, c_custkey,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY (c_custkey * 2654435761) % 1000000007, c_custkey
             ) AS rn
      FROM customer)
    WHERE rn <= 20
    """,
)
def sample_exact_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-N-per-stratum sampling (eval-set construction):
    deterministic pseudo-random order via Knuth multiplicative hash of
    the key mod a large prime, then the first 20 rows per stratum —
    reproducible across runs/engines/partitionings AND stable under
    corpus growth for retained keys (sampleBy gives only approximate
    fractions; ORDER BY rand() is unreproducible). Per-group window
    rank, one shuffle on the stratum key; rows beyond N never leave
    the window operator."""
    from pyspark.sql import Window as W

    cust = t(spark, sf_dir, "customer")
    order_key = (F.col("c_custkey") * F.lit(2654435761)) % F.lit(1000000007)
    w = W.partitionBy("c_mktsegment").orderBy(order_key, "c_custkey")
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= 20)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


def _es_key_sql(id_expr: str, w_expr: str) -> str:
    """Efraimidis–Spirakis sampling key, engine-portable: a uniform
    u in (0,1) derived from 8 md5 nibbles of the id (the simhash-twin
    primitive set — instr/substr/md5 evaluate identically in Spark SQL
    and DuckDB), ranked by ln(u)/w — the monotone equivalent of the
    classic u^(1/w) (exp is monotone), so only ONE libm call crosses
    the engines — then FLOOR-fixed-pointed to nano-units so engine
    ulp drift cannot reorder the top-k."""
    # BIGINT accumulator: Spark's instr is INT32 and 16^8 overflows
    # ANSI int arithmetic; DuckDB is BIGINT-native either way
    h = (
        f"CAST((instr('0123456789abcdef', "
        f"substr(md5(CAST({id_expr} AS STRING)), 1, 1)) - 1) AS BIGINT)"
    )
    for i in range(2, 9):
        nib = (
            f"(instr('0123456789abcdef', "
            f"substr(md5(CAST({id_expr} AS STRING)), {i}, 1)) - 1)"
        )
        h = f"({h} * 16 + {nib})"
    u = f"((CAST({h} AS DOUBLE) + 0.5) / 4294967296.0)"
    return f"CAST(FLOOR((ln({u}) / {w_expr}) * 1000000000.0) AS BIGINT)"


_ES_KEY = _es_key_sql("o_orderkey", "o_totalprice")


@query(
    "sample_weighted_reservoir",
    sql=f"""
    SELECT o_orderkey, o_totalprice AS weight, {_ES_KEY} AS es_key_nano
    FROM orders
    ORDER BY es_key_nano DESC, o_orderkey LIMIT 25
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): P(row in sample) rises with its weight, reproducible across
    runs/engines/partitionings — the weighted complement of
    sample_exact_per_group (which is uniform-per-stratum). Each row
    gets key = u^(1/w) with u a deterministic md5-derived uniform;
    the global top-k by key IS the weighted sample. Spark executes it
    as TakeOrdered (per-partition top-k, then a k-row merge on the
    driver) — one pass, no shuffle of the data, O(k) merge state: the
    exact shape a 100 TB weighted draw needs."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").alias("weight"),
            F.expr(_ES_KEY).alias("es_key_nano"),
        )
        .orderBy(F.desc("es_key_nano"), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Token-budget corpus selection (quality-ranked knapsack fill)
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 10_000


def _budget_sql() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, source, {SQL_TOKS} AS tk FROM documents
    ), s AS (
      SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
             (1000 * len(list_distinct(tk))) // len(tk) AS score_pm
      FROM d WHERE len(tk) > 0
    ), b AS (
      SELECT score_pm, CAST(SUM(n_tokens) AS BIGINT) AS btok
      FROM s GROUP BY score_pm
    ), c AS (
      SELECT score_pm,
             CAST(SUM(btok) OVER (ORDER BY score_pm DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - btok
                  AS BIGINT) AS cum_before
      FROM b
    ), r AS (
      SELECT s.doc_id, s.source, s.n_tokens, c.cum_before,
             CAST(COALESCE(SUM(s.n_tokens) OVER (
                  PARTITION BY s.score_pm ORDER BY s.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS fill_before
      FROM s JOIN c USING (score_pm)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum_before + fill_before + n_tokens
                              <= {_BUDGET_TOKENS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN cum_before + fill_before + n_tokens
                              <= {_BUDGET_TOKENS} THEN n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_kept
    FROM r GROUP BY source
    """


@query("select_docs_token_budget", sql=_budget_sql())
def select_docs_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: keep the best-quality documents
    (lexical-diversity score = distinct-token per-mille) until a fixed
    token budget is filled — the "train on the best N tokens" step of a
    pretraining-data pipeline.

    100 TB shape: the naive form is a GLOBAL sort by score + running
    sum — a total-order bottleneck. Instead: (1) bucket docs by integer
    score (<= 1001 buckets); (2) aggregate token sums PER BUCKET (one
    partial-agg shuffle, output <= 1001 rows); (3) compute the
    cumulative fill on that tiny relation (single-partition window over
    <= 1001 rows, then broadcast back); (4) only WITHIN a bucket window
    by doc_id for the remaining-budget fill — per-doc decision =
    cum_before(bucket) + fill_before(doc in bucket) + n_tokens <=
    budget, one formula for fully-kept, cutoff, and dropped buckets.
    No global sort ever happens; the widest window sees one bucket.

    Determinism: integer token counts, integer DIV scoring, doc_id
    tie-break — bit-identical across engines (same formula in the
    DuckDB oracle)."""
    docs = t(spark, sf_dir, "documents")
    s = (
        docs.select("doc_id", "source", X.tokens("text").alias("tk"))
        .filter(F.size("tk") > 0)
        .select(
            "doc_id",
            "source",
            F.size("tk").cast("bigint").alias("n_tokens"),
            F.expr(
                "(1000 * size(array_distinct(tk))) div size(tk)"
            ).alias("score_pm"),
        )
    )
    b = s.groupBy("score_pm").agg(F.sum("n_tokens").alias("btok"))
    # <= 1001 rows: the unpartitioned window is a deliberate
    # single-partition pass over the bucket aggregate, not the corpus
    wc = Window.orderBy(F.desc("score_pm")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = b.select(
        "score_pm",
        (F.sum("btok").over(wc) - F.col("btok"))
        .cast("bigint")
        .alias("cum_before"),
    )
    wf = (
        Window.partitionBy("score_pm")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = s.join(F.broadcast(c), "score_pm").withColumn(  # bcast: <= 1001 rows
        "fill_before",
        F.coalesce(F.sum("n_tokens").over(wf), F.lit(0)).cast("bigint"),
    )
    kept = (
        F.col("cum_before") + F.col("fill_before") + F.col("n_tokens")
        <= F.lit(_BUDGET_TOKENS)
    )
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: distributed pair counting (round 1 = oracle-
# checkable; the iterative trainer lives in operators/bpe.py)
# ---------------------------------------------------------------------------

_BPE_TOP = 20


def _bpe_sql() -> str:
    return f"""
    WITH w AS (
      SELECT unnest({SQL_TOKS}) AS word FROM documents
    ), v AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM w WHERE length(word) >= 2 GROUP BY word
    ), e AS (
      SELECT word, freq, unnest(range(1, length(word))) AS i FROM v
    ), p AS (
      SELECT substr(word, CAST(i AS INT), 1) AS left_sym,
             substr(word, CAST(i AS INT) + 1, 1) AS right_sym,
             freq
      FROM e
    )
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM p GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym LIMIT {_BPE_TOP}
    """


@query("bpe_first_merges", sql=_bpe_sql())
def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, round-1 pair statistics: the top
    merge candidates (adjacent symbol pairs weighted by word frequency)
    over the corpus — the Sennrich et al. 2016 inner loop, distributed.

    The load-bearing trick for 100 TB: BPE statistics live on the
    WORD-FREQUENCY table, not the corpus. One corpus-wide groupBy(word)
    collapses to a vocabulary-sized relation (<< corpus, bounded by
    distinct words); every subsequent pair count is vocab-sized work.
    Pair explosion is native (transform over sequence + explode —
    no Python in the loop); top-k via TakeOrdered, map-side combined.
    The iterative multi-merge trainer (operators/bpe.py:learn_bpe)
    repeats exactly this stage on a re-segmented vocab."""
    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(X.tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS left_sym, "
                "substring(word, i + 1, 1) AS right_sym))"
            )
        ).alias("p"),
    ).select("freq", "p.left_sym", "p.right_sym")
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(_BPE_TOP)
    )


# BPE round 2: sentinel-wrapped symbols make literal replace() apply the
# round-1 winning merge greedy-leftmost in BOTH engines (the encoding
# guarantees adjacent matches never share characters, so non-overlapping
# left-to-right replace == the sequential BPE application rule).
_BPE_S1, _BPE_S2 = "\x01", "\x02"


def _bpe2_sql() -> str:
    s1, s2 = "chr(1)", "chr(2)"
    return f"""
    WITH w AS (
      SELECT unnest({SQL_TOKS}) AS word FROM documents
    ), v AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM w WHERE length(word) >= 2 GROUP BY word
    ), e1 AS (
      SELECT word, freq, unnest(range(1, length(word))) AS i FROM v
    ), p1 AS (
      SELECT substr(word, CAST(i AS INT), 1) AS l,
             substr(word, CAST(i AS INT) + 1, 1) AS r, freq
      FROM e1
    ), win AS (
      SELECT l AS wl, r AS wr
      FROM (SELECT l, r, SUM(freq) AS c FROM p1 GROUP BY l, r)
      ORDER BY c DESC, l, r LIMIT 1
    ), enc AS (
      SELECT regexp_replace(word, '(.)', {s1} || '\\1' || {s2}, 'g') AS ew,
             freq
      FROM v
    ), m AS (
      SELECT replace(ew, {s1}||wl||{s2}||{s1}||wr||{s2},
                     {s1}||wl||wr||{s2}) AS ew,
             freq, wl || wr AS merged_sym
      FROM enc CROSS JOIN win
    ), a AS (
      SELECT string_split(substr(ew, 2, length(ew) - 2),
                          {s2}||{s1}) AS syms,
             freq, merged_sym
      FROM m
    ), e2 AS (
      SELECT syms, freq, merged_sym, unnest(range(1, len(syms))) AS i
      FROM a WHERE len(syms) >= 2
    ), p2 AS (
      SELECT merged_sym, syms[CAST(i AS INT)] AS left_sym,
             syms[CAST(i AS INT) + 1] AS right_sym, freq
      FROM e2
    )
    SELECT merged_sym, left_sym, right_sym,
           CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM p2 GROUP BY merged_sym, left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym LIMIT {_BPE_TOP}
    """


@query("bpe_second_merge", sql=_bpe2_sql())
def bpe_second_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, round 2: apply the round-1 winning merge
    to the whole vocabulary, then recompute pair statistics — the proof
    that ITERATIVE merge application (not just round-1 counting) is
    cross-engine exact.

    Merge application is a literal string replace over sentinel-wrapped
    symbols (word 'aaaa' encodes as \\x01a\\x02\\x01a\\x02... and the
    pair pattern \\x01a\\x02\\x01a\\x02 -> \\x01aa\\x02): adjacent
    matches share no characters, so the engine's non-overlapping
    left-to-right replace IS the greedy-leftmost BPE application rule
    ('aaaa' -> [aa, aa], 'aaa' -> [aa, a]) — bit-identical to the
    F.aggregate left fold in operators/bpe.py:_apply_merge (test-
    asserted) and to DuckDB's replace. The winner is attached as a
    1-row broadcast, so the merge pattern never touches the driver.

    100 TB shape: identical to bpe_first_merges — one corpus-sized
    groupBy(word), then everything (winner, encode, replace, re-count)
    is vocab-sized. A production trainer would cache the vocab between
    rounds (learn_bpe localCheckpoints); as a single declarative query
    the vocab subtree is computed once per consumer."""
    docs = t(spark, sf_dir, "documents")
    s1, s2 = _BPE_S1, _BPE_S2
    vocab = (
        docs.select(F.explode(X.tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs1 = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS l, "
                "substring(word, i + 1, 1) AS r))"
            )
        ).alias("p"),
    ).select("freq", "p.l", "p.r")
    winner = (
        pairs1.groupBy("l", "r")
        .agg(F.sum("freq").alias("c"))
        .orderBy(F.desc("c"), "l", "r")
        .limit(1)
        .select(F.col("l").alias("wl"), F.col("r").alias("wr"))
    )
    enc = vocab.select(
        F.regexp_replace("word", "(.)", s1 + "$1" + s2).alias("ew"), "freq"
    )
    # bcast: 1 row (limit 1 winner)
    merged = enc.crossJoin(F.broadcast(winner)).select(
        F.replace(
            F.col("ew"),
            F.concat(
                F.lit(s1), F.col("wl"), F.lit(s2 + s1), F.col("wr"), F.lit(s2)
            ),
            F.concat(F.lit(s1), F.col("wl"), F.col("wr"), F.lit(s2)),
        ).alias("ew"),
        "freq",
        F.concat("wl", "wr").alias("merged_sym"),
    )
    syms = merged.select(
        F.split(
            F.expr("substring(ew, 2, length(ew) - 2)"), s2 + s1
        ).alias("syms"),
        "freq",
        "merged_sym",
    ).filter(F.size("syms") >= 2)
    pairs2 = syms.select(
        "freq",
        "merged_sym",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(element_at(syms, i) AS left_sym, "
                "element_at(syms, i + 1) AS right_sym))"
            )
        ).alias("p"),
    ).select("freq", "merged_sym", "p.left_sym", "p.right_sym")
    return (
        pairs2.groupBy("merged_sym", "left_sym", "right_sym")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture targets (alpha-smoothed stratum weights)
# ---------------------------------------------------------------------------

_TEMP_TOTAL = 10_000  # token-agnostic doc budget being allocated


def _temperature_sql() -> str:
    return f"""
    WITH s AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             SQRT(CAST(COUNT(*) AS DOUBLE)) AS w
      FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT SUM(w) AS sum_w FROM s
    )
    SELECT s.source, s.lang, s.n_docs,
           ROUND(s.w / tot.sum_w, 6) AS mix_share,
           CAST(FLOOR(ROUND(s.w / tot.sum_w, 6) * {_TEMP_TOTAL}) AS BIGINT)
             AS target_docs
    FROM s CROSS JOIN tot
    """


@query("mixture_temperature_targets", sql=_temperature_sql())
def mixture_temperature_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture targets: stratum weights proportional
    to n^alpha with alpha = 0.5 — the standard multilingual/multi-domain
    up-sampling formula (raising rare strata, damping dominant ones;
    alpha=1 is proportional, alpha=0 uniform). sqrt is IEEE
    correctly-rounded in every libm, so the per-stratum weight is
    bit-identical across engines; the normalized share is rounded to
    6dp BEFORE the floor'd allocation so the one cross-row double sum
    (sum of weights) can't flip a boundary.

    100 TB shape: one partial-agg over (source, lang); the weight table
    is strata-sized (tiny) — normalization is a broadcast of one scalar.
    Feed target_docs into mixture_weighted_sample's per-mille rates to
    materialize the recipe."""
    docs = t(spark, sf_dir, "documents")
    s = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).withColumn("w", F.sqrt(F.col("n_docs").cast("double")))
    tot = s.agg(F.sum("w").alias("sum_w"))
    share = F.round(F.col("w") / F.col("sum_w"), 6)
    return (
        s.crossJoin(F.broadcast(tot))  # bcast: 1-row scalar
        .select(
            "source",
            "lang",
            "n_docs",
            share.alias("mix_share"),
            F.floor(share * _TEMP_TOTAL).cast("bigint").alias("target_docs"),
        )
    )
