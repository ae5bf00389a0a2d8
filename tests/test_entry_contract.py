"""Driver-contract smoke: entry() returns rows; queries()/oracle_sql()
are consistent; every query runs at sf0.001."""

import pytest


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


# The five engine-specific paths with no DuckDB twin (xxhash64 hash
# family, k-means state). Each has a documented hash-exact oracle twin
# already driver-green (e.g. dedup_minhash_lsh_md5; the stride-book
# ann_pq_rerank_topk for the r12 k-means PQ serve). They ride in the
# prefix ON PURPOSE (VERDICT r4 ask #2: every registry entry gets a
# driver row, the rows-only ones included).
ROWS_ONLY_OK = {
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_topk_vectorized",
    "ann_ivf_kmeans_topk",
    # ann_pq_kmeans_rerank_topk graduated to a hash-exact oracle in
    # r13: the trainer runs exact-integer Lloyd (VERDICT r12 ask #5)
}


def test_registry_consistency():
    import __spark_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert len(qs) >= 60
    assert set(sqls) <= set(qs)
    # non-SQL-expressible ops are the documented exceptions
    assert set(qs) - set(sqls) == ROWS_ONLY_OK




def test_driver_priority_prefix():
    """The driver correctness sweep caps at the first 50 queries() in
    iteration order; pin the curated prefix so an import reshuffle can't
    silently rotate families out of the checked window, and require an
    oracle (hash-exact check, not rows-only) for every prefix entry
    outside the documented engine-specific paths."""
    import __spark_entry__ as e
    from datalake_scripts_spark.queries import DRIVER_PRIORITY

    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    qs, sqls = e.queries(), e.oracle_sql()
    assert list(qs)[:50] == DRIVER_PRIORITY
    no_oracle = [n for n in DRIVER_PRIORITY if n not in sqls]
    assert set(no_oracle) <= ROWS_ONLY_OK, (
        f"prefix entries without oracle beyond the documented four: "
        f"{sorted(set(no_oracle) - ROWS_ONLY_OK)}"
    )


@pytest.mark.parametrize("name", ["q1_pricing_summary", "dedup_minhash_lsh", "events_session_windows"])
def test_sample_queries_run(spark, sf_dir, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_dir)
    assert df.count() >= 0


def test_no_complex_typed_output_columns(spark, sf_dir):
    """Driver-contract guard: result hashing canonicalizes with pandas
    sort_values, which throws on array/map/struct cells (unhashable
    numpy.ndarray). Every registered query must emit only atomic
    columns — serialize arrays with concat_ws / explode them."""
    from pyspark.sql import types as T

    from datalake_scripts_spark.queries import REGISTRY

    offenders = {}
    for name, q in REGISTRY.items():
        # builders with eager barriers (jaccard checkpoints, CC loops)
        # DO run jobs here — acceptable at sf0.001, the fixture scale
        df = q.fn(spark, sf_dir)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed output columns: {offenders}"
