"""Online dedup at ingest (streaming.sinks.foreach_batch_dedup_ingest):
cross-epoch duplicates drop against the persisted fingerprint store,
epoch replays no-op, and a crash between the corpus and store commits
repairs from the corpus commit's own change feed."""

from __future__ import annotations

from pyspark.sql import Row

from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.text import fingerprint
from datalake_scripts_spark.streaming import foreach_batch_dedup_ingest


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        schema="doc_id bigint, text string",
    )


def test_cross_epoch_duplicates_drop(spark, tmp_path):
    cdir, sdir = str(tmp_path / "c"), str(tmp_path / "s")
    sink = foreach_batch_dedup_ingest(cdir, sdir)
    sink(_docs(spark, [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")]), 0)
    # epoch 1: doc 4 duplicates doc 1's token set (order-insensitive)
    sink(_docs(spark, [(4, "beta alpha"), (5, "delta")]), 1)
    corpus = {r.doc_id for r in V.read_versioned(spark, cdir).collect()}
    assert corpus == {1, 3, 5}  # 2 dropped in-batch, 4 dropped vs store
    seen = V.read_versioned(spark, sdir).collect()
    assert len(seen) == 3
    assert {r.winner_id for r in seen} == {1, 3, 5}


def test_epoch_replay_noops(spark, tmp_path):
    cdir, sdir = str(tmp_path / "c"), str(tmp_path / "s")
    sink = foreach_batch_dedup_ingest(cdir, sdir)
    batch = _docs(spark, [(1, "alpha"), (2, "beta")])
    sink(batch, 0)
    cv, sv = V.current_version(cdir), V.current_version(sdir)
    sink(batch, 0)  # Structured Streaming replays the last epoch
    assert V.current_version(cdir) == cv
    assert V.current_version(sdir) == sv


def test_crash_between_commits_repairs_store(spark, tmp_path):
    """Corpus commit landed, store commit didn't (crash window): the
    replay derives the store rows from exactly that corpus commit's
    change feed — never re-appends documents."""
    cdir, sdir = str(tmp_path / "c"), str(tmp_path / "s")
    sink = foreach_batch_dedup_ingest(cdir, sdir)
    sink(_docs(spark, [(1, "alpha")]), 0)
    # simulate the torn epoch-1 state: corpus has it, store does not
    batch = _docs(spark, [(7, "omega")]).withColumn(
        "fingerprint", fingerprint("text")
    )
    V.write_versioned(spark, batch, cdir, mode="append", meta={"epoch": 1})
    cv = V.current_version(cdir)
    sink(_docs(spark, [(7, "omega")]), 1)  # replay of the torn epoch
    assert V.current_version(cdir) == cv  # corpus untouched
    seen = V.read_versioned(spark, sdir).collect()
    assert {r.winner_id for r in seen} == {1, 7}
    # and a second replay is now a full no-op
    sv = V.current_version(sdir)
    sink(_docs(spark, [(7, "omega")]), 1)
    assert V.current_version(sdir) == sv


def test_store_rows_unique_per_fingerprint(spark, tmp_path):
    cdir, sdir = str(tmp_path / "c"), str(tmp_path / "s")
    sink = foreach_batch_dedup_ingest(cdir, sdir)
    sink(_docs(spark, [(1, "alpha"), (2, "beta")]), 0)
    sink(_docs(spark, [(3, "alpha"), (4, "beta"), (5, "alpha")]), 1)
    seen = V.read_versioned(spark, sdir)
    assert seen.groupBy("fingerprint").count().filter("count > 1").count() == 0
    corpus = V.read_versioned(spark, cdir)
    assert corpus.groupBy("fingerprint").count().filter("count > 1").count() == 0
