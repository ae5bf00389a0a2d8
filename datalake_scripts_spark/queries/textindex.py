"""Persisted inverted-index queries (operators.text_index) — the BM25
serving path that never scans the corpus at query time.

Both queries are verified by the SAME DuckDB oracle as the on-the-fly
``text_bm25_scores`` (imported from its registration): the index
changes WHERE the work happens — tokenize/postings once per corpus
change, bucket-pruned scan per query — not WHAT is computed. That is
the stride-twin proof pattern the persisted ANN index established
(ann_ivf_indexed_topk), applied to lexical retrieval.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text_index as TI
from ..operators import versioned as V
from .llmops import BM25_QUERY_TERMS
from .registry import REGISTRY, query, t

_BM25_ORACLE = REGISTRY["text_bm25_scores"].sql


@query("text_bm25_indexed_topk", sql=_BM25_ORACLE)
def text_bm25_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once/serve-many BM25: postings + docstats are built into
    bucket-partitioned versioned tables, then top-20 is served from the
    stored index — no tokenize pass, no corpus scan; the postings scan
    statically prunes to the <= 5 buckets of the query terms. Served
    result is hash-exact EQUAL to the on-the-fly text_bm25_scores (same
    oracle verifies both). At 100 TB the build amortizes across every
    query and appends maintain it in O(batch) via the change feed."""
    docs = t(spark, sf_dir, "documents")
    corpus_dir = tempfile.mkdtemp(prefix="bm25_corpus_")
    index_dir = tempfile.mkdtemp(prefix="bm25_index_")
    V.write_versioned(spark, docs, corpus_dir, mode="append")
    TI.build_text_index(spark, corpus_dir, index_dir)
    return TI.bm25_topk_indexed(spark, index_dir, BM25_QUERY_TERMS, k=20)


@query("text_bm25_index_refresh", sql=_BM25_ORACLE)
def text_bm25_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance under the full oracle: build the
    index on two thirds of the corpus, append the rest, refresh (the
    change feed's append fast path tokenizes ONLY the new docs and
    rolls the corpus scalars forward by exact-integer addition), then
    serve. The served top-20 must equal the oracle computed over the
    WHOLE corpus — proving refresh lands the index in exactly the
    full-rebuild state with O(batch) work."""
    docs = t(spark, sf_dir, "documents")
    corpus_dir = tempfile.mkdtemp(prefix="bm25r_corpus_")
    index_dir = tempfile.mkdtemp(prefix="bm25r_index_")
    V.write_versioned(
        spark, docs.filter(F.col("doc_id") % 3 != 0), corpus_dir, mode="append"
    )
    TI.build_text_index(spark, corpus_dir, index_dir)
    V.write_versioned(
        spark, docs.filter(F.col("doc_id") % 3 == 0), corpus_dir, mode="append"
    )
    res = TI.refresh_text_index(spark, corpus_dir, index_dir)
    assert res["action"] == "appended", res
    return TI.bm25_topk_indexed(spark, index_dir, BM25_QUERY_TERMS, k=20)


@query(
    "text_phrase_indexed",
    sql=REGISTRY["text_phrase_search"].sql,
)
def text_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search served FROM the persisted positional index: probe
    only the phrase words' buckets, join their posting rows per doc,
    and verify adjacency against the stored positions arrays — no
    corpus scan, no tokenize at query time. Same oracle as the
    on-the-fly positional-intersection query (text_phrase_search),
    which itself cross-checks against the oracle's independent n-gram
    scan — three algorithmically distinct implementations of one
    answer."""
    from .llmops import PHRASE_QUERIES

    docs = t(spark, sf_dir, "documents")
    corpus_dir = tempfile.mkdtemp(prefix="phr_corpus_")
    index_dir = tempfile.mkdtemp(prefix="phr_index_")
    V.write_versioned(spark, docs, corpus_dir, mode="append")
    TI.build_text_index(spark, corpus_dir, index_dir)
    out = None
    for phrase in PHRASE_QUERIES:
        hits = TI.phrase_search_indexed(spark, index_dir, phrase)
        out = hits if out is None else out.unionByName(hits)
    return out


@query("text_bm25_index_nopos", sql=_BM25_ORACLE)
def text_bm25_index_nopos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-only index (``build_text_index(positions=False)``, VERDICT
    r10 ask #7): positional postings grew the index-build shuffle ~1.8x
    (r10 budget re-freeze), a tax a pure-BM25 deployment shouldn't pay —
    the flag drops the positions array while tf/df/docstats (everything
    BM25 scores from) are unchanged, so the served top-20 stays
    hash-exact under the same oracle as the positional build. Its
    shuffle budget freezes separately from text_bm25_indexed_topk's so
    the gate tracks the tax itself."""
    docs = t(spark, sf_dir, "documents")
    corpus_dir = tempfile.mkdtemp(prefix="bm25np_corpus_")
    index_dir = tempfile.mkdtemp(prefix="bm25np_index_")
    V.write_versioned(spark, docs, corpus_dir, mode="append")
    TI.build_text_index(spark, corpus_dir, index_dir, positions=False)
    return TI.bm25_topk_indexed(spark, index_dir, BM25_QUERY_TERMS, k=20)
