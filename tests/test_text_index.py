"""Persisted inverted text index (operators/text_index.py): build-once
serving equals the on-the-fly BM25 exactly, appends maintain the index
with O(batch) tokenize work (proven via manifest file lists, not
timing), non-append changes force the honest rebuild, and serving
prunes to the probed token buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import text_index as TI
from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.queries.llmops import BM25_QUERY_TERMS
from datalake_scripts_spark.queries.registry import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    d = str(tmp_path / "corpus")
    docs = read_table(spark, SF, "documents")
    V.write_versioned(spark, docs.filter("doc_id % 3 != 0"), d, mode="append")
    return d


def _rows(df):
    return sorted(
        (r["doc_id"], r["bm25_micro"], r["n_matched_terms"])
        for r in df.collect()
    )


def test_indexed_equals_on_the_fly(spark, tmp_path):
    """Served top-20 from the stored index == the full-scan
    text_bm25_scores query on the same corpus."""
    cdir, idx = str(tmp_path / "c"), str(tmp_path / "i")
    docs = read_table(spark, SF, "documents")
    V.write_versioned(spark, docs, cdir, mode="append")
    res = TI.build_text_index(spark, cdir, idx)
    assert res["action"] == "built" and res["n_docs"] > 0
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=20)
    want = REGISTRY["text_bm25_scores"].fn(spark, SF)
    assert _rows(got) == _rows(want)


def test_refresh_noop_without_corpus_change(spark, corpus_dir, tmp_path):
    idx = str(tmp_path / "i")
    TI.build_text_index(spark, corpus_dir, idx)
    assert TI.refresh_text_index(spark, corpus_dir, idx)["action"] == "noop"


def test_append_refresh_is_o_batch_and_matches_rebuild(
    spark, corpus_dir, tmp_path
):
    """Appending docs refreshes via the fast path (postings commit
    carries prior files by reference — only the new docs tokenize) and
    the refreshed index serves exactly the full-rebuild answer."""
    idx = str(tmp_path / "i")
    TI.build_text_index(spark, corpus_dir, idx)
    docs = read_table(spark, SF, "documents")
    V.write_versioned(
        spark, docs.filter("doc_id % 3 = 0"), corpus_dir, mode="append"
    )
    before_files = set(
        V._expand_manifest(
            TI._subdir(idx, "postings"),
            V._load_manifest(
                TI._subdir(idx, "postings"),
                V.current_version(TI._subdir(idx, "postings")),
            ),
        )[0]
    )
    res = TI.refresh_text_index(spark, corpus_dir, idx)
    assert res["action"] == "appended" and res["n_new_docs"] > 0
    after_files = set(
        V._expand_manifest(
            TI._subdir(idx, "postings"),
            V._load_manifest(
                TI._subdir(idx, "postings"),
                V.current_version(TI._subdir(idx, "postings")),
            ),
        )[0]
    )
    # O(batch): every pre-existing postings file is carried by
    # reference, the commit only ADDS files
    assert before_files <= after_files

    idx2 = str(tmp_path / "i2")
    TI.build_text_index(spark, corpus_dir, idx2)
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=20)
    want = TI.bm25_topk_indexed(spark, idx2, BM25_QUERY_TERMS, k=20)
    assert _rows(got) == _rows(want)
    # and the corpus scalars rolled forward exactly
    assert TI._index_meta(idx)["n_docs"] == TI._index_meta(idx2)["n_docs"]
    assert TI._index_meta(idx)["total_len"] == TI._index_meta(idx2)["total_len"]


def test_non_append_change_triggers_rebuild(spark, corpus_dir, tmp_path):
    idx = str(tmp_path / "i")
    TI.build_text_index(spark, corpus_dir, idx)
    V.delete_versioned(spark, corpus_dir, "doc_id % 5 = 0")
    res = TI.refresh_text_index(spark, corpus_dir, idx)
    assert res["action"] == "rebuilt"
    # rebuilt index == fresh build on the mutated corpus
    idx2 = str(tmp_path / "i2")
    TI.build_text_index(spark, corpus_dir, idx2)
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=20)
    want = TI.bm25_topk_indexed(spark, idx2, BM25_QUERY_TERMS, k=20)
    assert _rows(got) == _rows(want)


def test_serving_scan_prunes_to_probed_buckets(spark, corpus_dir, tmp_path):
    """The probed-buckets filter reaches the postings scan as a
    partition filter, and every probed bucket is the xxhash64 twin's
    prediction for a query term."""
    idx = str(tmp_path / "i")
    TI.build_text_index(spark, corpus_dir, idx)
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=20)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert got.count() > 0
    # cross-check the driver-side bucket twin against Spark's xxhash64
    twin = {t: TI.bucket_of(t, 64) for t in BM25_QUERY_TERMS}
    spark_buckets = {
        r["t"]: r["b"]
        for r in spark.createDataFrame(
            [(t,) for t in BM25_QUERY_TERMS], "t string"
        )
        .select("t", F.pmod(F.xxhash64(F.col("t")), F.lit(64)).alias("b"))
        .collect()
    }
    assert twin == spark_buckets


def test_concurrent_refresh_loses_cas_then_noops(spark, corpus_dir, tmp_path):
    """Two maintainers race: the loser's retry sees the winner's
    watermark and no-ops — never duplicate postings rows."""
    idx = str(tmp_path / "i")
    TI.build_text_index(spark, corpus_dir, idx)
    docs = read_table(spark, SF, "documents")
    V.write_versioned(
        spark, docs.filter("doc_id % 3 = 0"), corpus_dir, mode="append"
    )
    # maintainer A lands the refresh
    assert TI.refresh_text_index(spark, corpus_dir, idx)["action"] == "appended"
    # maintainer B raced and lost: its fresh read now sees A's watermark
    assert TI.refresh_text_index(spark, corpus_dir, idx)["action"] == "noop"
    # postings hold no duplicate (token, doc) rows
    p = V.read_versioned(spark, TI._subdir(idx, "postings"))
    assert (
        p.groupBy("token", "doc_id").count().filter("count > 1").count() == 0
    )


def test_cli_text_index_build_and_refresh(spark, corpus_dir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main
    from datalake_scripts_spark.queries.llmops import BM25_QUERY_TERMS

    idx = str(tmp_path / "idx")
    assert main([
        "table", "--dir", corpus_dir, "text-index-build", "--index", idx,
    ]) == 0
    assert "built index" in capsys.readouterr().out
    docs = read_table(spark, SF, "documents")
    V.write_versioned(
        spark, docs.filter("doc_id % 3 = 0"), corpus_dir, mode="append"
    )
    assert main([
        "table", "--dir", corpus_dir, "text-index-refresh", "--index", idx,
    ]) == 0
    assert "appended" in capsys.readouterr().out
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=5)
    assert got.count() == 5


def test_crash_gap_between_postings_and_docstats_heals(
    spark, corpus_dir, tmp_path, monkeypatch
):
    """Crash window: the postings CAS commit landed, the docstats
    materialization didn't. Serving detects the gap (no
    for_postings_version marker) and heals it by re-deriving docstats
    from the postings snapshot — result identical to the uncrashed
    refresh."""
    idx = str(tmp_path / "i")
    TI.build_text_index(spark, corpus_dir, idx)
    docs = read_table(spark, SF, "documents")
    V.write_versioned(
        spark, docs.filter("doc_id % 3 = 0"), corpus_dir, mode="append"
    )
    monkeypatch.setattr(
        TI, "_materialize_docstats", lambda *a, **k: None
    )  # simulated crash after the postings commit
    assert TI.refresh_text_index(spark, corpus_dir, idx)["action"] == "appended"
    monkeypatch.undo()
    assert TI._index_meta(idx)["docstats_version"] is None  # the gap
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=20)
    rows = _rows(got)  # serving healed on demand
    assert TI._index_meta(idx)["docstats_version"] is not None
    idx2 = str(tmp_path / "i2")
    TI.build_text_index(spark, corpus_dir, idx2)
    assert rows == _rows(TI.bm25_topk_indexed(spark, idx2, BM25_QUERY_TERMS, k=20))


def test_phrase_indexed_equals_on_the_fly(spark, tmp_path):
    """Phrase serving from the positional index == the on-the-fly
    positional-intersection query on the same (full) corpus, and the
    scan prunes to the phrase words' buckets."""
    from datalake_scripts_spark.queries.llmops import PHRASE_QUERIES

    cdir, idx = str(tmp_path / "c"), str(tmp_path / "i")
    V.write_versioned(
        spark, read_table(spark, SF, "documents"), cdir, mode="append"
    )
    TI.build_text_index(spark, cdir, idx)
    import pyspark.sql.functions as SF2

    from datalake_scripts_spark.operators.text import tokens as _tokens

    docs = V.read_versioned(spark, cdir)
    total_hits = 0
    for phrase in PHRASE_QUERIES:
        got = TI.phrase_search_indexed(spark, idx, phrase)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan
        got_rows, want = _phrase_twin(docs, phrase, got)
        assert got_rows == want
        total_hits += len(want)
    assert total_hits > 0


def _phrase_twin(docs, phrase, got):
    import pyspark.sql.functions as SF

    from datalake_scripts_spark.operators.text import tokens as _tokens
    tok = docs.select(
        "doc_id", SF.posexplode(_tokens("text")).alias("pos", "token")
    )
    words = phrase.split()
    m = tok.filter(SF.col("token") == words[0]).select(
        SF.col("doc_id").alias("d0"), SF.col("pos").alias("p0")
    )
    for i, w in enumerate(words[1:], start=1):
        nxt = tok.filter(SF.col("token") == w).select(
            SF.col("doc_id").alias(f"d{i}"), SF.col("pos").alias(f"p{i}")
        )
        m = m.join(
            nxt,
            on=[SF.col("d0") == SF.col(f"d{i}"),
                SF.col(f"p{i}") == SF.col("p0") + i],
        ).drop(f"d{i}")
    want = {
        (r["d0"], r["n"])
        for r in m.groupBy("d0").agg(SF.count(SF.lit(1)).alias("n")).collect()
    }
    return {(r.doc_id, r.n_occurrences) for r in got.collect()}, want


def test_nopos_index_serves_identical_bm25(spark, corpus_dir, tmp_path):
    """positions=False drops the positional payload; BM25 serving is
    unchanged (tf/df/docstats identical), refresh preserves the flag,
    and phrase search refuses the positionless index loudly."""
    idx_np, idx_pos = str(tmp_path / "np"), str(tmp_path / "pos")
    TI.build_text_index(spark, corpus_dir, idx_np, positions=False)
    TI.build_text_index(spark, corpus_dir, idx_pos)
    p_np = V.read_versioned(spark, TI._subdir(idx_np, TI._POSTINGS))
    assert "positions" not in p_np.columns
    got_np = TI.bm25_topk_indexed(spark, idx_np, BM25_QUERY_TERMS, k=20)
    got_pos = TI.bm25_topk_indexed(spark, idx_pos, BM25_QUERY_TERMS, k=20)
    assert _rows(got_np) == _rows(got_pos)

    # append refresh must keep writing positionless postings
    docs = read_table(spark, SF, "documents")
    V.write_versioned(
        spark, docs.filter("doc_id % 3 = 0"), corpus_dir, mode="append"
    )
    res = TI.refresh_text_index(spark, corpus_dir, idx_np)
    assert res["action"] == "appended" and res["n_new_docs"] > 0
    p_np2 = V.read_versioned(spark, TI._subdir(idx_np, TI._POSTINGS))
    assert "positions" not in p_np2.columns
    assert TI._index_meta(idx_np)["positions"] is False

    with pytest.raises(ValueError, match="positions=False"):
        TI.phrase_search_indexed(spark, idx_np, "the quick")
