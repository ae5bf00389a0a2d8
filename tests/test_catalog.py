"""Name catalog (operators/catalog.py, VERDICT r6 ask #3): CAS-logged
name->table_dir mapping, saveAsTable/table() parity, grants metadata,
catalog: refs in read/write_versioned and every table CLI verb, and
the `tables` CLI DDL group.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.cli import main as cli_main
from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.catalog import (
    Catalog,
    TableNotFound,
    resolve_table_ref,
)


def test_create_resolve_drop(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("events", str(tmp_path / "ev"), grants=["analyst"])
    assert cat.table_dir("events") == str(tmp_path / "ev")
    assert cat.resolve("events")["grants"] == ["analyst"]
    with pytest.raises(ValueError, match="already registered"):
        cat.create_table("events", str(tmp_path / "other"))
    cat.create_table("events", str(tmp_path / "ev"), if_not_exists=True)
    assert list(cat.tables()) == ["events"]
    cat.drop_table("events")
    with pytest.raises(TableNotFound):
        cat.table_dir("events")
    with pytest.raises(TableNotFound):
        cat.drop_table("events")
    cat.drop_table("events", if_exists=True)  # idempotent form
    with pytest.raises(ValueError, match="invalid table name"):
        cat.create_table("bad name!", str(tmp_path))


def test_grants_lifecycle_and_statements(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("t", str(tmp_path / "t"), grants=["a"])
    cat.alter_grants("t", grant=["b", "c"], revoke=["a"])
    assert cat.resolve("t")["grants"] == ["b", "c"]
    stmts = cat.grant_statements("t", sql_table="schema1.t")
    assert stmts == [
        "GRANT SELECT ON schema1.t TO b",
        "GRANT SELECT ON schema1.t TO c",
    ]
    # history audits every DDL commit
    acts = [h["action"] for h in cat.history()]
    assert acts == ["create", "alter_grants"]


def test_save_as_table_and_read_parity(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    df = spark.range(50).select(F.col("id").alias("k"))
    v = cat.save_as_table(spark, df, "nums")  # auto-registers in warehouse
    assert v == 1
    assert cat.table_dir("nums").endswith("warehouse/nums")
    cat.save_as_table(spark, df, "nums", mode="append")
    got = cat.table(spark, "nums")
    assert got.count() == 100
    assert cat.table(spark, "nums", version=1).count() == 50  # time travel


def test_catalog_refs_in_versioned_api(spark, tmp_path, monkeypatch):
    cdir = str(tmp_path / "cat")
    cat = Catalog(cdir)
    tdir = str(tmp_path / "data")
    cat.create_table("orders_t", tdir)
    monkeypatch.setenv("DATALAKE_CATALOG_DIR", cdir)
    df = spark.range(10).select(F.col("id").alias("k"))
    V.write_versioned(spark, df, "catalog:orders_t", mode="append")
    assert V.read_versioned(spark, "catalog:orders_t").count() == 10
    assert V.current_version(tdir) == 1  # landed in the registered dir
    assert resolve_table_ref("catalog:orders_t") == tdir
    assert resolve_table_ref("/plain/path") == "/plain/path"
    monkeypatch.delenv("DATALAKE_CATALOG_DIR")
    with pytest.raises(ValueError, match="needs a catalog"):
        resolve_table_ref("catalog:orders_t")


def test_concurrent_creates_both_land(tmp_path):
    """Optimistic concurrency: racing creates of different names must
    BOTH survive (the loser replays against the winner's state)."""
    cat = Catalog(str(tmp_path / "cat"))
    errs = []

    def _mk(name):
        try:
            Catalog(str(tmp_path / "cat")).create_table(
                name, str(tmp_path / name)
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=_mk, args=(f"t{i}",)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sorted(cat.tables()) == [f"t{i}" for i in range(8)]


def test_cli_tables_ddl_and_named_verbs(spark, sf_dir, tmp_path, capsys):
    cdir = str(tmp_path / "cat")
    tdir = str(tmp_path / "data")
    src = str(tmp_path / "batch")
    from datalake_scripts_spark.io import read_table

    read_table(spark, sf_dir, "region").write.parquet(src)

    assert cli_main(["tables", "--catalog", cdir, "create",
                     "--name", "regions", "--table-dir", tdir,
                     "--grant", "analyst"]) == 0
    assert cli_main(["tables", "--catalog", cdir, "list"]) == 0
    out = capsys.readouterr().out
    assert "regions" in out and "grants=analyst" in out

    # existing table verbs accept catalog:<name>
    assert cli_main(["table", "--dir", "catalog:regions",
                     "--catalog", cdir, "write", "--source", src]) == 0
    assert V.current_version(tdir) == 1
    assert cli_main(["table", "--dir", "catalog:regions",
                     "--catalog", cdir, "history"]) == 0
    assert "v1" in capsys.readouterr().out

    assert cli_main(["tables", "--catalog", cdir, "grants",
                     "--name", "regions", "--grant", "etl"]) == 0
    assert "GRANT SELECT ON regions TO etl" in capsys.readouterr().out
    assert cli_main(["tables", "--catalog", cdir, "history"]) == 0
    assert "alter_grants" in capsys.readouterr().out
    assert cli_main(["tables", "--catalog", cdir, "drop",
                     "--name", "regions"]) == 0
    capsys.readouterr()  # consume the drop confirmation
    assert cli_main(["tables", "--catalog", cdir, "list"]) == 0
    assert "regions" not in capsys.readouterr().out
    # drop was metadata-only: the data table is intact
    assert V.read_versioned(spark, tdir).count() > 0


def test_attach_views_and_sql_snapshot_isolation(spark, tmp_path):
    from datalake_scripts_spark.operators.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    df1 = spark.range(10).selectExpr("id AS k", "id * 2 AS v")
    cat.save_as_table(spark, df1, "nums")
    views = cat.attach_views(spark, prefix="t_")
    assert views == ["t_nums"]
    assert spark.sql("SELECT COUNT(*) n FROM t_nums").first()["n"] == 10
    # commits after attach are invisible until re-attach
    cat.save_as_table(spark, df1.limit(3), "nums", mode="append")
    assert spark.sql("SELECT COUNT(*) n FROM t_nums").first()["n"] == 10
    cat.attach_views(spark, prefix="t_")
    assert spark.sql("SELECT COUNT(*) n FROM t_nums").first()["n"] == 13
    # explicit version pin
    cat.attach_views(spark, prefix="old_", versions={"nums": 1})
    assert spark.sql("SELECT COUNT(*) n FROM old_nums").first()["n"] == 10
    # one-call sql() attaches everything
    got = cat.sql(spark, "SELECT SUM(v) s FROM nums").first()["s"]
    assert got == sum(i * 2 for i in range(10)) + sum(i * 2 for i in range(3))


def test_saved_views_resolve_at_attach(spark, tmp_path):
    from datalake_scripts_spark.operators.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    cat.save_as_table(
        spark, spark.range(100).selectExpr("id AS k", "id % 5 AS g"), "facts"
    )
    cat.create_view("g_counts", "SELECT g, COUNT(*) AS n FROM facts GROUP BY g")
    # a view over a view, created later -> resolves in creation order
    cat.create_view("g_big", "SELECT * FROM g_counts WHERE n >= 20")
    got = cat.sql(
        spark, "SELECT COUNT(*) AS c FROM g_big"
    ).first()["c"]
    assert got == 5  # 100 rows / 5 groups = 20 each
    # the view re-resolves against the pinned snapshot at each attach
    cat.save_as_table(
        spark, spark.range(10).selectExpr("id AS k", "CAST(0 AS BIGINT) AS g"),
        "facts", mode="append",
    )
    rows = cat.sql(
        spark, "SELECT n FROM g_counts WHERE g = 0"
    ).first()["n"]
    assert rows == 30
    # guards: prefixed attach with views refuses; table_dir on a view
    import pytest as _p
    with _p.raises(ValueError, match="prefix"):
        cat.attach_views(spark, prefix="x_")
    with _p.raises(ValueError, match="saved view"):
        cat.table_dir("g_counts")
    # views list and drop like tables
    assert "view_sql" in cat.tables()["g_counts"]
    cat.drop_table("g_big")
    assert "g_big" not in cat.tables()
