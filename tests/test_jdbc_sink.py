"""JDBC sink (reference S6, save_spark_postgres) exercised against
Spark's bundled embedded Derby — same code path as the PostgreSQL sink
(driver class + url swap), including append mode, batchsize, and the
createTableColumnTypes DDL carry (the S7 replacement)."""

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table, write_jdbc

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    d = tmp_path_factory.mktemp("derby")
    return f"jdbc:derby:{d}/sinkdb;create=true"


def _read_back(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY["driver"])
        .load()
    )


def test_jdbc_write_read_roundtrip(spark, sf_dir, derby_url):
    nation = read_table(spark, sf_dir, "nation")
    write_jdbc(nation, derby_url, "nation_t", mode="overwrite", properties=DERBY)
    back = _read_back(spark, derby_url, "nation_t")
    assert back.count() == nation.count()
    assert {f.name.lower() for f in back.schema.fields} == {
        "n_nationkey", "n_name", "n_regionkey",
    }


def test_jdbc_append_mode(spark, sf_dir, derby_url):
    region = read_table(spark, sf_dir, "region")
    write_jdbc(region, derby_url, "region_t", mode="overwrite", properties=DERBY)
    write_jdbc(region, derby_url, "region_t", mode="append", properties=DERBY)
    assert _read_back(spark, derby_url, "region_t").count() == 2 * region.count()


def test_jdbc_create_table_column_types(spark, sf_dir, derby_url):
    # the reference managed column types via a psycopg2 side-channel
    # (S7); createTableColumnTypes carries them in-band
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang").limit(10)
    write_jdbc(
        docs,
        derby_url,
        "docs_t",
        mode="overwrite",
        properties=DERBY,
        create_table_column_types="doc_id bigint, lang varchar(8)",
    )
    assert _read_back(spark, derby_url, "docs_t").count() == 10


def test_dual_sink_parquet_and_jdbc(spark, sf_dir, derby_url, tmp_path):
    from datalake_scripts_spark.io import dual_sink, read_table

    region = read_table(spark, sf_dir, "region")
    n = dual_sink(
        spark,
        region,
        str(tmp_path / "region_stage"),
        jdbc_url=derby_url,
        jdbc_table="region_dual",
        mode="overwrite",
        jdbc_properties=DERBY,
    )
    assert n == region.count()
    assert spark.read.parquet(str(tmp_path / "region_stage")).count() == n
    assert _read_back(spark, derby_url, "region_dual").count() == n


def test_execute_jdbc_statements_ddl_channel(spark, sf_dir, derby_url):
    """The psycopg2-side-channel replacement (S7/grants): arbitrary
    DDL/DML runs over the same JDBC url as the write. Exercised with an
    index + insert (embedded Derby rejects GRANT without
    sqlAuthorization; grant-statement generation is covered below)."""
    from datalake_scripts_spark.io import execute_jdbc_statements

    region = read_table(spark, sf_dir, "region")
    write_jdbc(region, derby_url, "region_ddl", mode="overwrite", properties=DERBY)
    execute_jdbc_statements(
        spark,
        derby_url,
        [
            'CREATE INDEX region_ddl_idx ON region_ddl ("r_regionkey")',
            "INSERT INTO region_ddl VALUES (99, 'NOWHERE')",
        ],
        driver=DERBY["driver"],
    )
    assert _read_back(spark, derby_url, "region_ddl").count() == region.count() + 1


def test_write_jdbc_grants_statement_shape(spark, sf_dir, derby_url, monkeypatch):
    """grants=[...] issues GRANT SELECT per grantee after the write."""
    import datalake_scripts_spark.io as io_mod

    seen = {}

    def fake_exec(spark_, url, statements, driver=None):
        seen["url"], seen["statements"], seen["driver"] = url, statements, driver

    monkeypatch.setattr(io_mod, "execute_jdbc_statements", fake_exec)
    region = read_table(spark, sf_dir, "region")
    io_mod.write_jdbc(
        region, derby_url, "region_g", mode="overwrite", properties=DERBY,
        grants=["analyst", "dashboard_ro"],
    )
    assert seen["statements"] == [
        "GRANT SELECT ON region_g TO analyst",
        "GRANT SELECT ON region_g TO dashboard_ro",
    ]
    assert seen["driver"] == DERBY["driver"] and seen["url"] == derby_url


def test_jdbc_partitioned_parallel_read(spark, sf_dir, derby_url):
    """read_jdbc with partitionColumn strides the scan across N
    range-bounded queries; predicate pushdown reaches the remote SQL."""
    from datalake_scripts_spark.io import read_jdbc, write_jdbc

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_jdbc(orders, derby_url, "orders_par", mode="overwrite", properties=DERBY)
    back = read_jdbc(
        spark,
        derby_url,
        "orders_par",
        properties=DERBY,
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(orders.agg({"o_orderkey": "max"}).first()[0]),
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()
    # pushdown: the filter appears in the JDBC scan, not a Spark Filter
    import io as _io
    import contextlib

    q = back.filter(F.col("o_totalprice") > 1000).select("o_orderkey")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_totalprice" in plan
    assert q.count() == orders.filter(F.col("o_totalprice") > 1000).count()


def test_jdbc_predicates_read(spark, sf_dir, derby_url):
    """One query per explicit predicate — the skew-safe parallel form."""
    from datalake_scripts_spark.io import read_jdbc, write_jdbc

    nation = read_table(spark, sf_dir, "nation")
    write_jdbc(nation, derby_url, "nation_pred", mode="overwrite", properties=DERBY)
    back = read_jdbc(
        spark,
        derby_url,
        "nation_pred",
        properties=DERBY,
        predicates=[
            '"n_regionkey" < 2',
            '"n_regionkey" >= 2',
        ],
    )
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == nation.count()


def test_jdbc_merge_upsert_parity(spark, sf_dir, derby_url):
    """write_jdbc_merge (staging + server-side MERGE) lands the same
    state as operators.upsert.merge_upsert computes DataFrame-side
    (VERDICT r3 ask #7): updates replace whole rows by key, new keys
    insert, untouched rows survive, staging table is dropped."""
    from datalake_scripts_spark.io import write_jdbc_merge
    from datalake_scripts_spark.operators.upsert import merge_upsert

    nation = read_table(spark, sf_dir, "nation")
    # first merge into a missing table = plain create-and-append
    write_jdbc_merge(
        nation, derby_url, "nation_m", keys=["n_nationkey"], properties=DERBY
    )
    assert _read_back(spark, derby_url, "nation_m").count() == nation.count()

    # batch: update 5 existing keys (rename), insert 3 new keys
    updates = nation.filter(F.col("n_nationkey") < 5).withColumn(
        "n_name", F.concat(F.lit("NEW_"), F.col("n_name"))
    )
    inserts = nation.filter(F.col("n_nationkey") < 3).withColumn(
        "n_nationkey", F.col("n_nationkey") + 1000
    )
    batch = updates.unionByName(inserts)
    write_jdbc_merge(
        batch, derby_url, "nation_m", keys=["n_nationkey"], properties=DERBY
    )

    got = _read_back(spark, derby_url, "nation_m")
    expected = merge_upsert(nation, batch, keys=["n_nationkey"])
    assert got.count() == expected.count() == nation.count() + 3
    g = {(r[0], r[1]) for r in got.select("n_nationkey", "n_name").collect()}
    e = {(r[0], r[1]) for r in expected.select("n_nationkey", "n_name").collect()}
    assert g == e
    # staging table dropped
    with pytest.raises(Exception):
        _read_back(spark, derby_url, "nation_m_stg").count()


def test_jdbc_merge_rejects_duplicate_source_keys(spark, sf_dir, derby_url):
    from datalake_scripts_spark.io import write_jdbc_merge

    region = read_table(spark, sf_dir, "region")
    dup = region.unionByName(region)
    with pytest.raises(ValueError, match="duplicate keys"):
        write_jdbc_merge(
            dup, derby_url, "region_m", keys=["r_regionkey"], properties=DERBY
        )
