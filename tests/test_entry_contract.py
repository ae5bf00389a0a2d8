"""Driver-contract smoke: entry() returns rows; queries()/oracle_sql()
are consistent; every query runs at sf0.001."""

import pytest


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_consistency():
    import __spark_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert len(qs) >= 60
    assert set(sqls) <= set(qs)
    # non-SQL-expressible ops are the documented exceptions
    assert set(qs) - set(sqls) == {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "approx_distinct_stats",
        "dedup_duplicate_clusters",
        "ann_ivf_topk_vectorized",
    }


@pytest.mark.parametrize("name", ["q1_pricing_summary", "dedup_minhash_lsh", "events_session_windows"])
def test_sample_queries_run(spark, sf_dir, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_dir)
    assert df.count() >= 0
