"""Generate TPC-H-shaped benchmark data at an arbitrary SF with REAL
key distributions (VERDICT r6 ask #6) — the scale-up evidence k-fold
replication cannot give, because replicas hold cluster diameter and
key skew constant by construction.

Schema, value ranges, and categorical frequencies mirror the driver's
/root/testdata tables (profiled, not copied): every column is derived
deterministically from the row id via xxhash64 arithmetic, so the
generator is seedless, order-independent, and fully DISTRIBUTED — a
spark.range → select → write pipeline that would produce 100 TB on a
real cluster the same way it produces 170 MB here. File counts scale
with SF (ceil(rows / ROWS_PER_FILE)) so scan parallelism grows with
the data like a real lake layout.

Usage: python scripts/gen_sf.py <sf> [out_dir]
       python scripts/gen_sf.py 1 /root/repo/.benchdata/sf1
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

ROWS_PER_FILE = 750_000

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]


def _h(salt: int, *cols):
    return F.xxhash64(F.lit(salt), *cols)


def _mod(salt: int, n: int, *cols):
    """Deterministic uniform int in [0, n) from (salt, cols)."""
    return F.pmod(_h(salt, *cols), F.lit(n)).cast("int")


def _u(salt: int, *cols):
    """Deterministic uniform double in [0, 1)."""
    return F.pmod(_h(salt, *cols), F.lit(1 << 30)) / float(1 << 30)


def _pick(values: list[str], salt: int, *cols):
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), _mod(salt, len(values), *cols) + 1
    )


def _write(df: DataFrame, out_dir: str, name: str, rows: int) -> None:
    files = max(1, math.ceil(rows / ROWS_PER_FILE))
    path = os.path.join(out_dir, f"{name}.parquet")
    df.repartition(files).write.mode("overwrite").parquet(path)
    print(f"{name}: {rows} rows -> {files} file(s)")


def generate(spark: SparkSession, sf: float, out_dir: str) -> None:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    region = spark.createDataFrame(
        [(i, REGIONS[i]) for i in range(5)], "r_regionkey int, r_name string"
    )
    _write(region, out_dir, "region", 5)

    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    _write(nation, out_dir, "nation", 25)

    rid = F.col("id")
    customer = spark.range(n_cust).select(
        rid.alias("c_custkey"),
        F.format_string("Customer#%09d", rid).alias("c_name"),
        _mod(11, 25, rid).alias("c_nationkey"),
        F.round(F.lit(-1000.0) + _u(12, rid) * 11000.0, 2).alias("c_acctbal"),
        _pick(SEGMENTS, 13, rid).alias("c_mktsegment"),
    )
    _write(customer, out_dir, "customer", n_cust)

    supplier = spark.range(n_supp).select(
        rid.alias("s_suppkey"),
        F.format_string("Supplier#%09d", rid).alias("s_name"),
        _mod(21, 25, rid).alias("s_nationkey"),
        F.round(F.lit(-1000.0) + _u(22, rid) * 11000.0, 2).alias("s_acctbal"),
    )
    _write(supplier, out_dir, "supplier", n_supp)

    part = spark.range(n_part).select(
        rid.alias("p_partkey"),
        F.concat_ws(
            " ", _pick(ADJS, 31, rid), _pick(NOUNS, 32, rid)
        ).alias("p_name"),
        F.format_string("Brand#%d", _mod(33, 25, rid) + 1).alias("p_brand"),
        _pick(PTYPES, 34, rid).alias("p_type"),
        (_mod(35, 50, rid) + 1).alias("p_size"),
        # the profiled 900.0..999.9 deci-step lattice
        (F.lit(900.0) + F.pmod(rid, F.lit(1000)).cast("double") / 10.0).alias(
            "p_retailprice"
        ),
    )
    _write(part, out_dir, "part", n_part)

    epoch95 = F.lit("1995-01-01 00:00:00").cast("timestamp")
    orders = spark.range(n_ord).select(
        rid.alias("o_orderkey"),
        _mod(41, n_cust, rid).cast("bigint").alias("o_custkey"),
        _pick(["O", "P", "F"], 42, rid).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u(43, rid) * 499000.0, 2).alias(
            "o_totalprice"
        ),
        F.timestamp_add(
            "DAY", _mod(44, 2400, rid), epoch95
        ).alias("o_orderdate"),
        _pick(PRIORITIES, 45, rid).alias("o_orderpriority"),
    )
    _write(orders, out_dir, "orders", n_ord)

    lineitem = spark.range(n_line).select(
        _mod(51, n_ord, rid).cast("bigint").alias("l_orderkey"),
        _mod(52, n_part, rid).cast("bigint").alias("l_partkey"),
        _mod(53, n_supp, rid).cast("bigint").alias("l_suppkey"),
        (_mod(54, 7, rid) + 1).alias("l_linenumber"),
        (_mod(55, 50, rid) + 1).cast("double").alias("l_quantity"),
        F.round(F.lit(900.0) + _u(56, rid) * 104100.0, 2).alias(
            "l_extendedprice"
        ),
        (_mod(57, 11, rid).cast("double") / 100.0).alias("l_discount"),
        (_mod(58, 9, rid).cast("double") / 100.0).alias("l_tax"),
        _pick(["A", "N", "R"], 59, rid).alias("l_returnflag"),
        _pick(["O", "F"], 60, rid).alias("l_linestatus"),
        F.timestamp_add("DAY", _mod(61, 2500, rid) + 1, epoch95).alias(
            "l_shipdate"
        ),
    )
    _write(lineitem, out_dir, "lineitem", n_line)

    epoch24 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    events = spark.range(n_evt).select(
        rid.alias("event_id"),
        F.timestamp_add(
            "MICROSECOND",
            (_u(71, rid) * 30.0 * 86_400_000_000.0).cast("bigint"),
            epoch24,
        ).alias("ts"),
        _mod(72, n_user, rid).cast("bigint").alias("user_id"),
        _pick(EVENT_TYPES, 73, rid).alias("event_type"),
        # exponential(mean 50), the profiled shape (min 0, p100 ~560)
        F.round(-50.0 * F.log(F.lit(1.0) - _u(74, rid) + 1e-12), 2).alias(
            "value"
        ),
        F.format_string('{"k": %d}', _mod(75, 100, rid)).alias("props"),
    )
    _write(events, out_dir, "events", n_evt)

    # documents: word-soup text over the profiled 30-word vocab with a
    # rare 'dup' marker token, plus an exact-duplicate lane (~1 in 625
    # docs copies one of 32 base texts) so dedup queries have real work
    vocab_arr = F.array(*[F.lit(w) for w in DOC_VOCAB])
    text_seed = F.when(
        F.pmod(rid, F.lit(625)) == 624, F.pmod(_h(80, rid), F.lit(32))
    ).otherwise(rid).alias("text_seed")
    docs_base = spark.range(n_doc).select(rid.alias("doc_id"), text_seed)
    s = F.col("text_seed")
    n_words = F.pmod(_h(81, s), F.lit(100)).cast("int") + 10
    word_at = lambda j: F.when(  # noqa: E731
        F.pmod(_h(83, s, j), F.lit(1150)) == 0, F.lit("dup")
    ).otherwise(
        F.element_at(vocab_arr, F.pmod(_h(82, s, j), F.lit(30)).cast("int") + 1)
    )
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), n_words), word_at), " "
    )
    documents = docs_base.select(
        "doc_id",
        text.alias("text"),
        F.when(_u(84, s) < 0.41, "en")
        .when(_u(84, s) < 0.56, "zh")
        .when(_u(84, s) < 0.71, "es")
        .when(_u(84, s) < 0.86, "fr")
        .otherwise("de")
        .alias("lang"),
        F.format_string("src%d", _mod(85, 20, F.col("doc_id"))).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    _write(documents, out_dir, "documents", n_doc)

    # embeddings: independent random unit directions with INDEPENDENT
    # labels — the profiled testdata shape (within-label avg cosine is
    # ~0 there, i.e. labels carry no geometry). Deliberately NOT
    # clustered: injected cluster structure would quadratically inflate
    # near-dup pair counts at sf1 vs the sf0.1 behavior being compared.
    dims = F.sequence(F.lit(0), F.lit(63))
    label = _mod(91, 10, rid)
    raw = F.transform(
        dims,
        lambda d: F.pmod(_h(93, F.col("vec_id"), d), F.lit(1000)).cast(
            "double"
        )
        / 1000.0
        - 0.5,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("raw"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    embeddings = (
        spark.range(n_vec)
        .select(rid.alias("vec_id"), label.alias("label"))
        .withColumn("raw", raw)
        .select(
            "vec_id",
            F.transform(
                F.col("raw"), lambda x: (x / norm).cast("float")
            ).alias("embedding"),
            F.col("label").cast("int").alias("label"),
        )
    )
    _write(embeddings, out_dir, "embeddings", n_vec)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_name = f"sf{sf:g}"
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata",
        sf_name,
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else default_out
    os.makedirs(out_dir, exist_ok=True)

    from datalake_scripts_spark.session import get_spark

    spark = get_spark("gen_sf", shuffle_partitions=32)
    generate(spark, sf, out_dir)
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
