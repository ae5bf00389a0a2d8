"""Race matrix for index/matview maintenance (VERDICT r9 ask #5):
cron-writer deployment (the reference's own model, jhub_proc.py:267-276)
makes refresh-vs-append and refresh-vs-refresh races routine, so the
maintenance commits get the same treatment DML got in
tests/test_dml_rebase.py — the winner is injected between the loser's
snapshot read and its CAS by wrapping versioned._commit_manifest, and
the matrix runs against POSIX, in-memory, HTTP (real network
boundary), and fault-injecting commit stores.

Contract proven here: a maintainer either serializes cleanly (lost
races retry and resolve, usually to a no-op) or raises the named
CommitConflict — never a silently stale view, never duplicate or
dropped index rows, never a torn centroids/assignments pair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import datalake_scripts_spark.operators.versioned as V
from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import ann_index as AI
from datalake_scripts_spark.operators import matview as MV
from datalake_scripts_spark.operators.commitstore import (
    FaultInjectingCommitStore,
    MemoryCommitStore,
    PosixCommitStore,
    set_commit_store,
)
from datalake_scripts_spark.operators.versioned import CommitConflict

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server():
    from datalake_scripts_spark.operators.commitstore_http import (
        LocalObjectStoreServer,
    )

    s = LocalObjectStoreServer()
    yield s
    s.close()


@pytest.fixture(params=["posix", "memory", "http", "faulty_http"])
def store(request, server):
    from datalake_scripts_spark.operators.commitstore_http import (
        HttpCommitStore,
    )

    if request.param == "posix":
        s = PosixCommitStore()
    elif request.param == "memory":
        s = MemoryCommitStore()
    elif request.param == "http":
        s = HttpCommitStore(server.url)
    else:
        s = FaultInjectingCommitStore(HttpCommitStore(server.url))
        s.arm("ambiguous_success", 1).arm("torn_write", 1)
    prev = set_commit_store(s)
    yield s
    set_commit_store(prev)


def _race(winner):
    """Run ``winner()`` exactly once, right before the next commit
    attempt (same harness as test_dml_rebase.py)."""
    real = V._commit_manifest
    state = {"done": False}

    def wrapper(td, *a, **k):
        if not state["done"]:
            state["done"] = True
            winner()
        return real(td, *a, **k)

    return wrapper, real


@pytest.fixture()
def corpus_dir(spark, store, tmp_path):
    d = str(tmp_path / "corpus")
    emb = read_table(spark, SF, "embeddings")
    V.write_versioned(
        spark, emb.filter(F.col("vec_id") < 300), d, mode="append"
    )
    return d


def _batch(spark, lo, hi):
    return read_table(spark, SF, "embeddings").filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    )


def _assignment_ids(spark, idx):
    rows = V.read_versioned(
        spark, idx + "/assignments"
    ).select("neighbor_id").collect()
    return sorted(r["neighbor_id"] for r in rows)


# --------------------------------------------- ANN index maintenance


def test_racing_refreshes_never_duplicate(spark, store, corpus_dir, tmp_path):
    """Two refreshes race over the same appended batch: the winner
    lands, the loser's CAS fails and its retry resolves to a no-op —
    the assignments table holds each vector EXACTLY once (the r9
    failure mode was duplicate neighbor rows)."""
    idx = str(tmp_path / "idx")
    AI.build_ann_index(
        spark, corpus_dir, idx, centroids="stride", stride=50,
        assignment="literal",
    )
    V.write_versioned(spark, _batch(spark, 300, 360), corpus_dir, mode="append")

    def winner():
        res = AI.refresh_ann_index(spark, corpus_dir, idx)
        assert res["action"] == "assigned" and res["n_new"] == 60

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        res = AI.refresh_ann_index(spark, corpus_dir, idx)
    finally:
        V._commit_manifest = real
    # the loser retried and saw the winner's watermark
    assert res["action"] == "noop"
    ids = _assignment_ids(spark, idx)
    assert ids == sorted(set(ids)), "duplicate neighbor rows"
    assert len(ids) == 360


def test_corpus_append_during_refresh_lands_next_round(
    spark, store, corpus_dir, tmp_path
):
    """A corpus append landing between the refresh's snapshot read
    and its commit stays ABOVE the pinned watermark: this refresh
    indexes exactly its range, the next one picks up the rest —
    nothing lost, nothing double-indexed (ADVICE r9's unpinned-read
    hazard, now raced end-to-end)."""
    idx = str(tmp_path / "idx")
    AI.build_ann_index(
        spark, corpus_dir, idx, centroids="stride", stride=50,
        assignment="literal",
    )
    V.write_versioned(spark, _batch(spark, 300, 360), corpus_dir, mode="append")

    def winner():
        # NOT an index maintainer: a concurrent corpus producer
        V.write_versioned(
            spark, _batch(spark, 360, 400), corpus_dir, mode="append"
        )

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        res = AI.refresh_ann_index(spark, corpus_dir, idx)
    finally:
        V._commit_manifest = real
    assert res["action"] == "assigned" and res["n_new"] == 60
    assert len(_assignment_ids(spark, idx)) == 360
    res2 = AI.refresh_ann_index(spark, corpus_dir, idx)
    assert res2["action"] == "assigned" and res2["n_new"] == 40
    ids = _assignment_ids(spark, idx)
    assert ids == sorted(set(ids)) and len(ids) == 400


def test_build_losing_race_raises_and_index_not_torn(
    spark, store, corpus_dir, tmp_path
):
    """A rebuild whose assignments CAS loses to a concurrent refresh
    raises the named conflict, and the orphaned centroids snapshot it
    already wrote is never observable: serving reads centroids PINNED
    to the version recorded by the surviving assignments commit."""
    idx = str(tmp_path / "idx")
    AI.build_ann_index(
        spark, corpus_dir, idx, centroids="stride", stride=50,
        assignment="literal",
    )
    V.write_versioned(spark, _batch(spark, 300, 330), corpus_dir, mode="append")

    def winner():
        AI.refresh_ann_index(spark, corpus_dir, idx)

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        with pytest.raises(CommitConflict):
            AI.build_ann_index(
                spark, corpus_dir, idx, centroids="stride", stride=50,
                assignment="literal",
            )
    finally:
        V._commit_manifest = real
    meta = AI._index_meta(idx)
    # assignments' recorded centroids version resolves (not the orphan)
    cents = AI.load_centroids(spark, idx, version=meta["centroids_version"])
    assert cents, "torn index: recorded centroids version unreadable"
    # served result still matches the consistent state: 330 vectors
    assert len(_assignment_ids(spark, idx)) == 330
    q = V.read_versioned(spark, corpus_dir).filter(F.col("vec_id") < 5)
    assert AI.ivf_topk_indexed(spark, q, idx, k=2, nprobe=2).count() > 0


def test_exhausted_retries_propagate_named_conflict(
    spark, store, corpus_dir, tmp_path
):
    """max_attempts lost races in a row -> the named CommitConflict
    reaches the caller (never a silent partial state)."""
    idx = str(tmp_path / "idx")
    AI.build_ann_index(
        spark, corpus_dir, idx, centroids="stride", stride=50,
        assignment="literal",
    )
    V.write_versioned(spark, _batch(spark, 300, 320), corpus_dir, mode="append")

    adir = idx + "/assignments"
    meta0 = AI._index_meta(idx)

    def endless_winner():
        # a degenerate co-maintainer: bumps the assignments table
        # WITHOUT advancing the watermark, so every retry of the
        # loser still sees work to do and loses its CAS again
        V.write_versioned(
            spark, V.read_versioned(spark, adir).limit(0), adir,
            mode="append", partition_by=["cell"],
            meta={
                "source_version": meta0["source_version"],
                "centroids_version": meta0["centroids_version"],
            },
        )

    real = V._commit_manifest

    def wrapper(td, *a, **k):
        # fire before EVERY assignments-append attempt from the loser
        if td.endswith("/assignments") and not getattr(
            wrapper, "in_winner", False
        ):
            wrapper.in_winner = True
            try:
                endless_winner()
            finally:
                wrapper.in_winner = False
        return real(td, *a, **k)

    V._commit_manifest = wrapper
    try:
        with pytest.raises(CommitConflict):
            AI.refresh_ann_index(spark, corpus_dir, idx, max_attempts=2)
    finally:
        V._commit_manifest = real


# --------------------------------------------------- matview cursor


@pytest.fixture()
def source_dir(spark, store, tmp_path):
    d = str(tmp_path / "src")
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") < 600), d, mode="append"
    )
    return d


_SPEC = {"n": ("count", "o_orderkey"), "total": ("sum", "o_totalprice")}


def _view_pdf(spark, view_dir):
    return {
        r["o_orderpriority"]: (r["n"], round(float(r["total"]), 2))
        for r in MV.read_aggregate(spark, view_dir, _SPEC).collect()
    }


def _expected_pdf(spark, source_dir):
    src = V.read_versioned(spark, source_dir)
    return {
        r["o_orderpriority"]: (r["n"], round(float(r["total"]), 2))
        for r in src.groupBy("o_orderpriority")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
        .collect()
    }


def test_matview_loser_with_older_snapshot_is_not_stale(
    spark, store, source_dir, tmp_path
):
    """The r9 failure mode, raced end-to-end: refresh L reads src@S1;
    before L's commit, MORE source lands (S2) and a rival refresh
    folds through S2. Without the CAS, L's overwrite would land LAST
    with S1 state — a view that silently lost the (S1, S2] delta.
    With it, L's commit fails, the retry no-ops at the rival's
    cursor, and the view equals the full recompute."""
    view = str(tmp_path / "view")
    MV.refresh_aggregate(spark, source_dir, view, ["o_orderpriority"], _SPEC)
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    V.write_versioned(
        spark,
        orders.filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 900)),
        source_dir, mode="append",
    )

    def winner():
        V.write_versioned(
            spark, orders.filter(F.col("o_orderkey") >= 900),
            source_dir, mode="append",
        )
        MV.refresh_aggregate(
            spark, source_dir, view, ["o_orderpriority"], _SPEC
        )

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        got = MV.refresh_aggregate(
            spark, source_dir, view, ["o_orderpriority"], _SPEC
        )
    finally:
        V._commit_manifest = real
    assert got == V.current_version(source_dir)
    assert MV.view_source_version(view) == got
    assert _view_pdf(spark, view) == _expected_pdf(spark, source_dir)


def test_matview_same_range_racers_converge(spark, store, source_dir, tmp_path):
    """Both refreshes fold the SAME delta: one lands, the loser
    no-ops on retry; the state is folded exactly once (a double-fold
    would double-count the delta's sums)."""
    view = str(tmp_path / "view")
    MV.refresh_aggregate(spark, source_dir, view, ["o_orderpriority"], _SPEC)
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") >= 600),
        source_dir, mode="append",
    )

    def winner():
        MV.refresh_aggregate(
            spark, source_dir, view, ["o_orderpriority"], _SPEC
        )

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        got = MV.refresh_aggregate(
            spark, source_dir, view, ["o_orderpriority"], _SPEC
        )
    finally:
        V._commit_manifest = real
    assert got == V.current_version(source_dir)
    assert _view_pdf(spark, view) == _expected_pdf(spark, source_dir)


def test_matview_source_append_mid_refresh_folds_next_round(
    spark, store, source_dir, tmp_path
):
    """A source commit landing mid-refresh is invisible to the pinned
    read and folds on the NEXT refresh — cursor never skips it."""
    view = str(tmp_path / "view")
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )

    def winner():
        V.write_versioned(
            spark, orders.filter(F.col("o_orderkey") >= 600),
            source_dir, mode="append",
        )

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        first = MV.refresh_aggregate(
            spark, source_dir, view, ["o_orderpriority"], _SPEC
        )
    finally:
        V._commit_manifest = real
    assert first < V.current_version(source_dir)
    second = MV.refresh_aggregate(
        spark, source_dir, view, ["o_orderpriority"], _SPEC
    )
    assert second == V.current_version(source_dir)
    assert _view_pdf(spark, view) == _expected_pdf(spark, source_dir)


# ------------------------------------------- inverted text index maintenance


@pytest.fixture()
def docs_dir(spark, store, tmp_path):
    d = str(tmp_path / "docs")
    docs = read_table(spark, SF, "documents")
    V.write_versioned(
        spark, docs.filter(F.col("doc_id") < 300), d, mode="append"
    )
    return d


def _doc_batch(spark, lo, hi):
    return read_table(spark, SF, "documents").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _indexed_doc_ids(spark, idx):
    rows = (
        V.read_versioned(spark, idx + "/docstats").select("doc_id").collect()
    )
    return sorted(r["doc_id"] for r in rows)


def test_text_racing_refreshes_never_duplicate(spark, store, docs_dir, tmp_path):
    """Two inverted-index refreshes race over the same appended docs:
    the loser's CAS fails, its retry no-ops at the winner's watermark,
    and postings hold each (token, doc) exactly once."""
    from datalake_scripts_spark.operators import text_index as TI

    idx = str(tmp_path / "tidx")
    TI.build_text_index(spark, docs_dir, idx)
    V.write_versioned(spark, _doc_batch(spark, 300, 360), docs_dir, mode="append")

    def winner():
        res = TI.refresh_text_index(spark, docs_dir, idx)
        assert res["action"] == "appended" and res["n_new_docs"] == 60

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        res = TI.refresh_text_index(spark, docs_dir, idx)
    finally:
        V._commit_manifest = real
    assert res["action"] == "noop"
    ids = _indexed_doc_ids(spark, idx)
    assert ids == sorted(set(ids)), "duplicate docstats rows"
    assert len(ids) == 360
    p = V.read_versioned(spark, idx + "/postings")
    assert p.groupBy("token", "doc_id").count().filter("count > 1").count() == 0


def test_text_corpus_append_mid_refresh_lands_next_round(
    spark, store, docs_dir, tmp_path
):
    """A corpus append landing between the refresh's read and its
    commit stays above the pinned watermark: this refresh indexes
    exactly its range, the next picks up the rest."""
    from datalake_scripts_spark.operators import text_index as TI

    idx = str(tmp_path / "tidx")
    TI.build_text_index(spark, docs_dir, idx)
    V.write_versioned(spark, _doc_batch(spark, 300, 360), docs_dir, mode="append")

    def winner():
        # NOT an index maintainer: a concurrent corpus producer
        V.write_versioned(
            spark, _doc_batch(spark, 360, 400), docs_dir, mode="append"
        )

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        res = TI.refresh_text_index(spark, docs_dir, idx)
    finally:
        V._commit_manifest = real
    assert res["action"] in ("appended", "noop")
    follow = TI.refresh_text_index(spark, docs_dir, idx)
    assert follow["action"] in ("appended", "noop")
    assert len(_indexed_doc_ids(spark, idx)) == 400
    # corpus scalars agree with a from-scratch build
    idx2 = str(tmp_path / "tidx2")
    TI.build_text_index(spark, docs_dir, idx2)
    assert TI._index_meta(idx)["n_docs"] == TI._index_meta(idx2)["n_docs"]
    assert (
        TI._index_meta(idx)["total_len"] == TI._index_meta(idx2)["total_len"]
    )


def test_text_build_losing_race_raises_and_index_not_torn(
    spark, store, docs_dir, tmp_path
):
    """A rebuild whose postings CAS loses to a concurrent refresh
    raises the named conflict; the orphaned docstats snapshot it wrote
    is never observable because serving resolves docstats through the
    surviving postings commit's recorded version."""
    from datalake_scripts_spark.operators import text_index as TI
    from datalake_scripts_spark.queries.llmops import BM25_QUERY_TERMS

    idx = str(tmp_path / "tidx")
    TI.build_text_index(spark, docs_dir, idx)
    V.write_versioned(spark, _doc_batch(spark, 300, 330), docs_dir, mode="append")

    def winner():
        TI.refresh_text_index(spark, docs_dir, idx)

    wrapper, real = _race(winner)
    V._commit_manifest = wrapper
    try:
        with pytest.raises(CommitConflict):
            TI.build_text_index(spark, docs_dir, idx)
    finally:
        V._commit_manifest = real
    meta = TI._index_meta(idx)
    assert meta["n_docs"] == 330  # the winner's consistent pair
    got = TI.bm25_topk_indexed(spark, idx, BM25_QUERY_TERMS, k=5)
    assert got.count() == 5
