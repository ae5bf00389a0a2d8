"""Sketch-family tests: exactness in the sparse regime, tolerance for
the randomized KLL quantiles, and mergeability (two-stage union ==
one-shot sketch)."""

from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_hll_exact_in_sparse_regime(spark):
    pdf = REGISTRY["sketch_hll_token_cardinality"].fn(spark, SF).toPandas()
    docs = read_table(spark, SF, "documents")
    from datalake_scripts_spark.operators import text as X

    exact = (
        docs.select("source", F.explode(X.tokens("text")).alias("token"))
        .groupBy("source")
        .agg(F.countDistinct("token").alias("exact"))
        .toPandas()
    )
    m = pdf.merge(exact, on="source")
    assert (m.distinct_tokens == m.exact).all()


def test_hll_union_equals_one_shot(spark):
    pdf = REGISTRY["sketch_hll_union_rollup"].fn(spark, SF).toPandas()
    docs = read_table(spark, SF, "documents")
    from datalake_scripts_spark.operators import text as X

    tok = docs.select("source", F.explode(X.tokens("text")).alias("token"))
    one_shot = tok.agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg("token"))).cast("bigint")
    ).first()[0]
    assert pdf.global_distinct_tokens.iloc[0] == one_shot


def test_kll_quantiles_within_sketch_error(spark):
    # the registry query's rank-window flags (the oracle contract) hold
    pdf = REGISTRY["sketch_kll_price_quantiles"].fn(spark, SF).toPandas()
    assert (pdf[["p50_ok", "p90_ok", "p99_ok"]] == 1).all().all()
    # and the raw sketch quantiles meet the tighter 3% rank error the
    # flags' ±5% window is derived from
    orders = read_table(spark, SF, "orders")
    tp = F.col("o_totalprice").cast("double")
    raw = (
        orders.groupBy("o_orderstatus")
        .agg(F.kll_sketch_agg_double(tp).alias("sketch"))
        .select(
            "o_orderstatus",
            F.kll_sketch_get_quantile_double("sketch", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("sketch", F.lit(0.9)).alias("p90"),
            F.kll_sketch_get_quantile_double("sketch", F.lit(0.99)).alias("p99"),
        )
        .toPandas()
    )
    for _, row in raw.iterrows():
        vals = (
            orders.filter(F.col("o_orderstatus") == row.o_orderstatus)
            .select(tp.alias("v"))
            .toPandas()
            .v.sort_values()
            .reset_index(drop=True)
        )
        # KLL default k=200: normalized rank error ~1.65%; allow 3%
        for q, got in [(0.5, row.p50), (0.9, row.p90), (0.99, row.p99)]:
            rank = (vals <= got).mean()
            assert abs(rank - q) <= 0.03, (row.o_orderstatus, q, rank)


def test_cms_join_size_one_sided_and_tight_on_skew(spark, sf_dir):
    """CMS inner product never underestimates the true join size, and
    on a small key universe (buckets mostly collision-free) it is
    near-exact."""
    from datalake_scripts_spark.queries.sketches import sketch_cms_join_size

    r = sketch_cms_join_size(spark, sf_dir).first()
    assert r.overestimate_ok
    assert r.cms_estimate >= r.exact_join_size > 0
    # sf0.001: 1500 customer keys over 2x1024 buckets -> low collision
    assert r.blowup_factor < 3.0
