"""End-to-end streaming pipeline — the engine's thesis in one job.

The reference's architecture is load (REST -> raw JSON) -> process
(normalize/typed projection) -> dual-serve (parquet staging + JDBC
serving), run as cron-separated scripts (SURVEY.md §3). This test runs
the same three stages as ONE Structured Streaming query:

    format("reststream")            cursor-polling REST pages
      -> to_timestamp projection    the typed-projection stage
      -> watermarked tumbling agg   event-time processing (replaces
                                    the reference's lag-day re-runs)
      -> foreach_batch_dual         epoch-keyed parquet + JDBC sinks

and asserts exactly-once across a forced checkpoint restart plus a
forced epoch replay, with the streaming result equal to the batch twin
over the same records.
"""

import json

from pyspark.sql import functions as F

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

N_PER_PAGE = 4


def _publish_page(tmp_path, page: int) -> None:
    """Page p carries N events inside hour p of 2024-01-01 (ISO strings:
    the raw zone is untyped; the pipeline does the timestamp parse)."""
    recs = [
        {
            "event_id": page * 100 + i,
            "ts": f"2024-01-01T{page:02d}:{5 * i + 1:02d}:00",
            "event_type": "view" if i % 2 == 0 else "click",
            "value": float(10 * page + i),
        }
        for i in range(N_PER_PAGE)
    ]
    (tmp_path / f"page{page}.json").write_text(json.dumps(recs))


def _pipeline(spark, url_template: str):
    """reststream scan -> typed projection -> watermarked tumbling agg."""
    from datalake_scripts_spark.sources.rest_datasource import (
        register_rest_datasource,
    )
    from datalake_scripts_spark.streaming import tumbling_agg

    register_rest_datasource(spark)
    raw = (
        spark.readStream.format("reststream")
        .schema("event_id long, ts string, event_type string, value double")
        .option("url_template", url_template)
        .load()
    )
    typed = raw.select(
        "event_id",
        F.to_timestamp("ts").alias("ts"),
        "event_type",
        "value",
    )
    return tumbling_agg(typed, window="1 hour", watermark="1 second")


def test_reststream_window_dual_sink_exactly_once(spark, tmp_path):
    from datalake_scripts_spark.streaming import (
        foreach_batch_dual,
        foreach_batch_epoch_jdbc,
        foreach_batch_epoch_parquet,
    )

    url = f"file://{tmp_path}/page{{page}}.json"
    jdbc_url = f"jdbc:derby:{tmp_path}/e2edb;create=true"
    pq_out = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    sink = foreach_batch_dual(
        foreach_batch_epoch_parquet(pq_out),
        foreach_batch_epoch_jdbc(jdbc_url, "hourly_serve", properties=DERBY),
    )

    def run_once():
        q = (
            _pipeline(spark, url)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    def staged():
        try:
            return spark.read.parquet(pq_out)
        except Exception:  # no epoch directory yet
            return None

    def served():
        return (
            spark.read.format("jdbc")
            .option("url", jdbc_url)
            .option("dbtable", "hourly_serve")
            .option("driver", DERBY["driver"])
            .load()
        )

    # ---- phase 1: pages 0-2 published, first run of the query --------
    for p in range(3):
        _publish_page(tmp_path, p)
    run_once()
    # append mode: watermark (max ts in hour 2, minus 1s) finalizes
    # hours 0 and 1; hour 2 stays open in state
    df = staged()
    finalized1 = (
        {r.window_start.hour for r in df.select("window_start").collect()}
        if df is not None
        else set()
    )
    assert finalized1 <= {0, 1}

    # ---- phase 2: pages 3-4 appear, RESTART from the checkpoint ------
    for p in (3, 4):
        _publish_page(tmp_path, p)
    run_once()

    df = staged()
    hours = sorted(r.window_start.hour for r in df.select("window_start").distinct().collect())
    # hours 0-3 closed exactly once each (x2 event types); hour 4 open
    assert {0, 1, 2, 3} <= set(hours) and 4 not in hours

    # exactly-once: no (window, event_type) appears twice across epochs
    dupes = (
        df.groupBy("window_start", "event_type")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dupes == 0

    # both sinks converged to the same rows
    pq_rows = sorted(
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in df.select("window_start", "event_type", "n_events", "sum_value").collect()
    )
    jd_rows = sorted(
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in served().collect()
    )
    assert len(pq_rows) == len(jd_rows)
    assert [t[1:] for t in pq_rows] == [t[1:] for t in jd_rows]

    # ---- batch twin: streaming result == batch agg over hours 0-3 ----
    recs = []
    for p in range(5):
        recs.extend(json.loads((tmp_path / f"page{p}.json").read_text()))
    batch = spark.createDataFrame(recs).select(
        F.to_timestamp("ts").alias("ts"), "event_type", "value"
    )
    expected = sorted(
        (r.h, r.event_type, r.n, float(r.s))
        for r in batch.filter(F.hour("ts") <= 3)
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("s"),
        )
        .collect()
    )
    got = sorted((w, t, n, float(s)) for (w, t, n, s) in pq_rows)
    assert got == expected

    # ---- phase 3: restart with nothing new -> nothing re-delivered ---
    n_before, j_before = df.count(), served().count()
    run_once()
    assert staged().count() == n_before
    assert served().count() == j_before

    # ---- forced epoch replay (crash between sink write and commit):
    # both epoch-keyed sinks must no-op on an already-committed epoch
    epochs = [r.batch_id for r in staged().select("batch_id").distinct().collect()]
    replay_epoch = min(epochs)
    replay_rows = spark.read.parquet(f"{pq_out}/batch_id={replay_epoch}").collect()
    schema = "window_start timestamp, event_type string, n_events bigint, sum_value double"
    replay = spark.createDataFrame(replay_rows, schema)
    sink(replay, replay_epoch)
    assert staged().count() == n_before
    assert served().count() == j_before


def test_stream_into_versioned_table(spark, sf_dir, tmp_path):
    """Streaming commits into the Delta-lite versioned table: one
    snapshot per epoch (time-travelable), a checkpointed restart adds
    nothing, and a forced epoch replay no-ops against the manifest's
    epoch ledger."""
    import pyspark.sql.types as T

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.versioned import (
        current_version,
        read_versioned,
        snapshot_row_count,
    )
    from datalake_scripts_spark.streaming import (
        foreach_batch_versioned,
        stream_from_directory,
    )

    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "vtable")
    ckpt = str(tmp_path / "ckpt")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(3).write.mode("overwrite").parquet(src)
    n_total = ev.count()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    sink = foreach_batch_versioned(table_dir)

    def run_once():
        q = (
            stream_from_directory(spark, src, schema=schema, max_files_per_trigger=1)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert current_version(table_dir) == 3  # one snapshot per epoch
    assert read_versioned(spark, table_dir).count() == n_total
    assert snapshot_row_count(table_dir) == n_total  # metadata-only
    # time travel: v1 is exactly the first epoch's rows
    v1 = read_versioned(spark, table_dir, version=1).count()
    assert 0 < v1 < n_total

    # restart with nothing new: no new snapshot
    run_once()
    assert current_version(table_dir) == 3

    # forced replay of committed epoch 0: the epoch ledger no-ops it
    first_epoch_rows = read_versioned(spark, table_dir, version=1).collect()
    replay = spark.createDataFrame(first_epoch_rows, schema)
    sink(replay, 0)
    assert current_version(table_dir) == 3
    assert read_versioned(spark, table_dir).count() == n_total


def test_versioned_table_as_streaming_source(spark, sf_dir, tmp_path):
    """A versioned APPEND table doubles as a streaming source: commits
    add immutable files under data/, so a file-source stream over that
    directory delivers each commit's rows exactly once — producer
    commits snapshots, consumer streams them, no extra infrastructure.
    (Overwrite/compaction commits rewrite data and need read_changes
    instead — this is the same append-only contract Delta's streaming
    source imposes by default.)"""
    import pyspark.sql.types as T

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.versioned import write_versioned
    from datalake_scripts_spark.streaming import stream_from_directory

    table_dir = str(tmp_path / "vsrc")
    region = read_table(spark, sf_dir, "region")
    write_versioned(spark, region, table_dir, mode="append")

    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.LongType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    out = []

    def collect_batch(batch_df, epoch_id):
        out.append(batch_df.count())

    def run_once():
        q = (
            stream_from_directory(spark, f"{table_dir}/data", schema=schema)
            .writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sum(out) == region.count()
    # a second commit is picked up incrementally, not re-delivered
    write_versioned(spark, region, table_dir, mode="append")
    run_once()
    assert sum(out) == 2 * region.count()


def test_stream_stream_outer_join_emits_nulls_on_expiry(spark, tmp_path):
    """Left-outer stream-stream interval join: an unmatched left row
    emits exactly once with NULL right columns AFTER the watermark
    passes its match horizon — the streaming-native anti-join the
    reference deferred to consumers."""
    import datetime as dt

    from datalake_scripts_spark.streaming import (
        events_schema,
        stream_from_directory,
        stream_stream_interval_join_outer,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def write_file(rows, name):
        spark.createDataFrame(rows, events_schema()).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    T = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, minutes, user, etype):
        return (eid, T + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")

    # user 1: view with a purchase 10 min later (match);
    # user 2: view with no purchase ever (expiry -> null row)
    write_file(
        [ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase"), ev(3, 0, 2, "view")],
        "f1",
    )

    out = []

    def run_once():
        stream = stream_from_directory(spark, src)
        views = stream.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id"
        )
        buys = stream.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        joined = stream_stream_interval_join_outer(
            views, buys, key="user_id", watermark="1 hour", max_delay="30 minutes"
        )
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(lambda b, e: out.extend(b.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    matched = {(r.user_id, r.event_id, r.event_id_r) for r in out}
    assert (1, 1, 2) in matched  # the match emits promptly
    assert not any(r.user_id == 2 for r in out)  # expiry not reached yet

    # far-future events push both watermarks past user 2's horizon
    write_file([ev(90, 300, 99, "view"), ev(91, 301, 99, "purchase")], "f2")
    run_once()
    run_once()  # one more cycle for the no-data watermark flush
    user2 = [r for r in out if r.user_id == 2]
    assert len(user2) == 1
    assert user2[0].event_id == 3 and user2[0].event_id_r is None


def test_stream_cdc_merge_into_versioned(spark, tmp_path):
    """Streaming CDC apply: micro-batches of keyed updates MERGE into a
    versioned dimension — matched keys replace, new keys insert,
    intra-batch duplicates reduce to the latest by ts, each merge state
    is a time-travelable snapshot, and replays no-op."""
    import json as _json

    from datalake_scripts_spark.operators.versioned import (
        current_version,
        read_versioned,
    )
    from datalake_scripts_spark.streaming import foreach_batch_merge_versioned

    table_dir = str(tmp_path / "dim")
    sink = foreach_batch_merge_versioned(table_dir, keys=["k"], latest_by="ts")
    schema = "k bigint, v string, ts bigint"

    def batch(rows):
        return spark.createDataFrame(rows, schema)

    # epoch 0: initial load, including an intra-batch dup for k=2
    sink(batch([(1, "a", 10), (2, "b", 11), (2, "b2", 12)]), 0)
    # epoch 1: update k=1, insert k=3
    sink(batch([(1, "a9", 20), (3, "c", 21)]), 1)

    assert current_version(table_dir) == 2
    cur = {r.k: r.v for r in read_versioned(spark, table_dir).collect()}
    assert cur == {1: "a9", 2: "b2", 3: "c"}
    # time travel to the state after epoch 0
    v1 = {r.k: r.v for r in read_versioned(spark, table_dir, version=1).collect()}
    assert v1 == {1: "a", 2: "b2"}

    # replay of epoch 1: ledger no-op, state unchanged
    sink(batch([(1, "a9", 20), (3, "c", 21)]), 1)
    assert current_version(table_dir) == 2
    assert {r.k: r.v for r in read_versioned(spark, table_dir).collect()} == cur


def test_stream_cdc_merge_dv_path(spark, tmp_path):
    """The deletion_vectors=True CDC sink lands the identical state as
    the overwrite sink, epoch by epoch — but writes O(batch) per epoch:
    the initial-load files are never rewritten."""
    from datalake_scripts_spark.operators import versioned as V
    from datalake_scripts_spark.streaming import foreach_batch_merge_versioned

    schema = "k bigint, v string, ts bigint"

    def batch(rows):
        return spark.createDataFrame(rows, schema)

    dv_dir = str(tmp_path / "dim_dv")
    sink = foreach_batch_merge_versioned(
        dv_dir, keys=["k"], latest_by="ts", deletion_vectors=True
    )
    sink(batch([(1, "a", 10), (2, "b", 11), (2, "b2", 12)]), 0)
    files_after_load = set(V.files_for_read(dv_dir))
    sink(batch([(1, "a9", 20), (3, "c", 21)]), 1)

    assert V.current_version(dv_dir) == 2
    cur = {r.k: r.v for r in V.read_versioned(spark, dv_dir).collect()}
    assert cur == {1: "a9", 2: "b2", 3: "c"}
    # merge-on-read: the epoch-0 files are all still in the manifest
    assert files_after_load <= set(V.files_for_read(dv_dir))
    assert V._load_manifest(dv_dir, 2).get("dvs")
    # time travel + replay idempotence hold on the DV path too
    v1 = {r.k: r.v for r in V.read_versioned(spark, dv_dir, version=1).collect()}
    assert v1 == {1: "a", 2: "b2"}
    sink(batch([(1, "a9", 20), (3, "c", 21)]), 1)
    assert V.current_version(dv_dir) == 2
    assert {r.k: r.v for r in V.read_versioned(spark, dv_dir).collect()} == cur


def test_continuous_aggregate_stream(spark, tmp_path):
    """Streaming continuous aggregate: reststream pages land in a
    versioned source; a materialized per-event-type aggregate refreshes
    at delta cost each epoch. The final view must equal the batch
    GROUP BY over all records; a forced epoch replay changes nothing."""
    from datalake_scripts_spark.operators import matview, versioned
    from datalake_scripts_spark.sources.rest_datasource import (
        register_rest_datasource,
    )
    from datalake_scripts_spark.streaming import (
        foreach_batch_continuous_aggregate,
    )

    url = f"file://{tmp_path}/page{{page}}.json"
    src_dir = str(tmp_path / "raw_events")
    view_dir = str(tmp_path / "agg_by_type")
    ckpt = str(tmp_path / "ckpt_ca")
    spec = {
        "n_events": ("count", "*"),
        "total_value": ("sum", "value"),
        "max_value": ("max", "value"),
    }
    sink = foreach_batch_continuous_aggregate(
        src_dir, view_dir, ["event_type"], spec
    )

    register_rest_datasource(spark)

    def run_once():
        raw = (
            spark.readStream.format("reststream")
            .schema("event_id long, ts string, event_type string, value double")
            .option("url_template", url)
            .load()
        )
        q = (
            raw.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    for p in range(3):
        _publish_page(tmp_path, p)
    run_once()
    for p in (3, 4):
        _publish_page(tmp_path, p)
    run_once()  # restart from checkpoint picks up pages 3-4

    all_src = versioned.read_versioned(spark, src_dir)
    assert all_src.count() == 5 * N_PER_PAGE  # exactly-once landing

    view = matview.read_aggregate(spark, view_dir, spec)
    expected = all_src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
    as_set = lambda df: {tuple(r) for r in df.select(sorted(df.columns)).collect()}
    assert as_set(view) == as_set(expected)

    # forced replay of the last epoch: both source and view unchanged
    src_v = versioned.current_version(src_dir)
    view_v = versioned.current_version(view_dir)
    # find the last committed epoch id from the manifest ledger
    last_meta = versioned._load_manifest(src_dir, src_v).get("meta", {})
    sink(all_src, int(last_meta.get("epoch", 0)))
    assert versioned.current_version(src_dir) == src_v
    assert versioned.current_version(view_dir) == view_v


def test_stream_audited_with_quarantine(spark, sf_dir, tmp_path):
    """Streaming WAP + dead-letter: a poisoned epoch never reaches the
    table — it lands in quarantine with its violation report — while
    clean epochs commit exactly-once and the stream keeps running."""
    import glob
    import json

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators import quality as Q
    from datalake_scripts_spark.operators.versioned import (
        current_version,
        read_versioned,
    )
    from datalake_scripts_spark.streaming import stream_from_directory
    from datalake_scripts_spark.streaming.sinks import (
        foreach_batch_audited_versioned,
    )

    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "vtable")
    qdir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # 3 single-file epochs; file 2 is poisoned with NULL event_types
    clean = ev.filter("event_id % 3 = 0").coalesce(1)
    poison = (
        ev.filter("event_id % 3 = 1")
        .withColumn(
            "event_type",
            F.when(F.col("event_id") % 7 == 0, None).otherwise(
                F.col("event_type")
            ),
        )
        .coalesce(1)
    )
    clean2 = ev.filter("event_id % 3 = 2").coalesce(1)
    clean.write.mode("overwrite").parquet(f"{src}")
    poison.write.mode("append").parquet(f"{src}")
    clean2.write.mode("append").parquet(f"{src}")

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rules = [Q.not_null("event_type")]
    sink = foreach_batch_audited_versioned(table_dir, rules, qdir)

    def run_once():
        q = (
            stream_from_directory(
                spark, src, schema=schema, max_files_per_trigger=1
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    # two clean epochs committed, one quarantined
    assert current_version(table_dir) == 2
    committed = read_versioned(spark, table_dir)
    assert committed.filter("event_type IS NULL").count() == 0
    qdirs = glob.glob(f"{qdir}/epoch=*")
    assert len(qdirs) == 1
    report = json.load(open(f"{qdirs[0]}/_report.json"))
    bad = [r for r in report if r["n_violations"] > 0]
    assert bad[0]["rule"] == "not_null(event_type)"
    n_poison = poison.count()
    assert spark.read.parquet(qdirs[0]).count() == n_poison
    # restart: nothing recommitted, nothing re-quarantined
    run_once()
    assert current_version(table_dir) == 2
    assert len(glob.glob(f"{qdir}/epoch=*")) == 1


def test_trailing_distinct_stream_matches_batch_twin(spark, tmp_path):
    """Streaming 7-day rolling distinct users (VERDICT r8 ask #6): the
    watermarked contribute-to-window explode + dedup-then-count equals
    the batch twin over the same events, lands exactly-once in a
    versioned sink, and a checkpoint replay commits nothing twice."""
    import datetime

    from datalake_scripts_spark.operators import versioned as V
    from datalake_scripts_spark.streaming import (
        events_schema,
        foreach_batch_versioned,
        stream_from_directory,
        trailing_distinct_users,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    base = datetime.datetime(2024, 3, 1)

    def mk(rows):
        return spark.createDataFrame(
            [
                (
                    eid,
                    base + datetime.timedelta(days=d, hours=h),
                    uid,
                    "view",
                    1.0,
                    "{}",
                )
                for eid, d, h, uid in rows
            ],
            schema=events_schema(),
        )

    # users: 1 daily 0..9; 2 on days 0+8; 3 on 3,4; 4 on 9 only;
    # duplicates of (user, day) at different hours must count once
    real = (
        [(100 + d, d, 1, 1) for d in range(10)]
        + [(200, 0, 2, 2), (201, 8, 2, 2), (202, 8, 15, 2)]
        + [(300, 3, 3, 3), (301, 4, 3, 3), (302, 4, 22, 3)]
        + [(400, 9, 5, 4)]
    )
    mk(real).coalesce(1).write.parquet(str(src / "p1"))
    # sentinel far in the future: advances the watermark past every
    # real window day so append mode flushes them; its own days stay
    # unemitted (watermark never passes them)
    mk([(999, 40, 0, 99)]).coalesce(1).write.parquet(str(src / "p2"))

    sink = foreach_batch_versioned(out)

    def run_once():
        q = (
            trailing_distinct_users(
                stream_from_directory(
                    spark, f"{src}/*", max_files_per_trigger=1
                )
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    got = {
        (r["day"].isoformat(), r["distinct_users_7d"])
        for r in V.read_versioned(spark, out).collect()
    }
    # batch twin: distinct (user, day) facts -> bounded explode ->
    # exact distinct count per window-end day (all window days)
    e = (
        mk(real)
        .select(F.to_date("ts").alias("ed"), "user_id")
        .distinct()
    )
    twin = (
        e.withColumn(
            "day",
            F.explode(F.sequence(F.col("ed"), F.date_add(F.col("ed"), 6))),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n"))
    )
    want = {
        (r["day"].isoformat(), r["n"]) for r in twin.collect()
    }
    assert got == want
    # spot semantics: the [3..9] window sees user 1 (daily), user 2
    # (day 8), user 3 (day 4), user 4 (day 9) -> 4 distinct
    d9 = base.date() + datetime.timedelta(days=9)
    assert (d9.isoformat(), 4) in got
    # replay with the same checkpoint: no new files -> no new commits
    v_before = V.current_version(out)
    run_once()
    assert V.current_version(out) == v_before


def test_streaming_funnel_exact_under_out_of_order(spark, tmp_path):
    """Stateful streaming funnel (streaming.windows.streaming_funnel):
    candidate buffers make it EXACT when late earlier-stage events
    retroactively qualify already-seen later-stage events — the case a
    naive (t1,t2,t3)-only state silently loses. Final state equals the
    batch twin over the union of all batches."""
    import datetime

    from datalake_scripts_spark.streaming import (
        events_schema,
        stream_from_directory,
        streaming_funnel,
    )

    src = tmp_path / "src"
    src.mkdir()
    base = datetime.datetime(2024, 5, 1)

    def mk(rows):  # (event_id, hour, user, type)
        return spark.createDataFrame(
            [
                (eid, base + datetime.timedelta(hours=h), uid, et, 1.0, "{}")
                for eid, h, uid, et in rows
            ],
            schema=events_schema(),
        )

    # A: later stages arrive BEFORE the view; B: a late view lowers t1
    # and a better click lowers t2; C: click before view qualifies only
    # after the late view; D: view only
    batch1 = [
        (1, 5, 1, "click"), (2, 6, 1, "purchase"),
        (3, 10, 2, "view"), (4, 12, 2, "click"),
        (5, 3, 3, "view"), (6, 2, 3, "click"),
        (7, 4, 4, "view"),
    ]
    batch2 = [
        (8, 1, 1, "view"),
        (9, 2, 2, "view"), (10, 4, 2, "click"), (11, 5, 2, "purchase"),
        (12, 1, 3, "view"),
    ]
    mk(batch1).coalesce(1).write.parquet(str(src / "p1"))
    mk(batch2).coalesce(1).write.parquet(str(src / "p2"))

    q = (
        streaming_funnel(
            stream_from_directory(spark, f"{src}/*", max_files_per_trigger=1),
            watermark="2 days",
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # every coordinate improves monotonically -> aggregate to final
    got = {
        r["user_id"]: (r["stage"], r["t1"], r["t2"], r["t3"])
        for r in spark.sql(
            "SELECT user_id, MAX(stage_reached) AS stage, MIN(t1) AS t1,"
            "       MIN(t2) AS t2, MIN(t3) AS t3 "
            "FROM funnel_stream GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: (r["stage_reached"], r["t1"], r["t2"], r["t3"])
        for r in streaming_funnel(mk(batch1 + batch2)).collect()
    }
    assert got == want
    # pin the retroactive cases explicitly
    h = lambda n: base + datetime.timedelta(hours=n)
    assert got[1] == (3, h(1), h(5), h(6))   # stages arrived before view
    assert got[2] == (3, h(2), h(4), h(5))   # late view lowered t1 AND t2
    assert got[3] == (2, h(1), h(2), None)   # buffered click qualified late
    assert got[4] == (1, h(4), None, None)
