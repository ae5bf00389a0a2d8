"""Normalization-kit queries: the reference's core semi-structured ->
relational surface (SURVEY.md §2.1-2.2, §2.6), oracle-checked.

Because the DuckDB oracle reads the same flat parquet, these queries
round-trip: build the nested shape (struct / array-of-struct / map) from a
flat table inside the query, then apply the engine operator (flatten /
explode / explode_outer / map-explode / timestamp casts / regex log parse)
to land back on flat rows the oracle can state in ANSI SQL. The nested
construction mirrors the JSON shapes the reference processes (FIXTURES.md
family B); the operator under test is the engine's, not the construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.nested import explode_into, flatten
from ..functions.logparse import parse_bracketed_log
from .registry import query, t


@query(
    "nested_flatten_struct",
    sql="""
    SELECT c_custkey AS custkey,
           c_name AS info_name,
           c_mktsegment AS info_segment,
           c_nationkey AS info_geo_nationkey,
           c_acctbal AS info_geo_acctbal
    FROM customer
    """,
)
def nested_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten(): 2-deep struct -> path-named flat columns in one select
    (engine redesign of ``flat_df``, monkey_proc.py:87-96; collision-free
    full-path naming per SURVEY.md §7 risk 1)."""
    cust = t(spark, sf_dir, "customer")
    nested = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.struct(
                F.col("c_nationkey").alias("nationkey"),
                F.col("c_acctbal").alias("acctbal"),
            ).alias("geo"),
        ).alias("info"),
    )
    return flatten(nested)


@query(
    "nested_explode_child_table",
    sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders
    """,
)
def nested_explode_child_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_into(): carry-the-FK-then-explode (monkey_proc.py:294-303).

    Orders are first nested under their customer as an array of structs
    (the JSON shape), then shredded back to a child table with the parent
    key carried — byte-equal to the flat original.
    """
    orders = t(spark, sf_dir, "orders")
    nested = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.collect_list(
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.col("o_totalprice").alias("totalprice"),
            )
        ).alias("orders")
    )
    child = explode_into(nested, "orders", carry=["custkey"], alias="o")
    return child.select(
        "custkey",
        F.col("o.orderkey").alias("orderkey"),
        F.col("o.totalprice").alias("totalprice"),
    )


@query(
    "nested_explode_outer_preserves_parents",
    sql="""
    SELECT c_custkey AS custkey, o_orderkey AS orderkey
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
)
def nested_explode_outer_preserves_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps parents with empty arrays (null child row) —
    the semantics the reference's plain explode silently loses
    (FIXTURES.md B3 edge case; SURVEY.md §2.6 F1)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.collect_list(F.col("o_orderkey")).alias("orderkeys")
    )
    nested = (
        cust.select(F.col("c_custkey").alias("custkey"))
        .join(per_cust, "custkey", "left")
        .select(
            "custkey", F.coalesce("orderkeys", F.array().cast("array<bigint>")).alias("orderkeys")
        )
    )
    return explode_into(nested, "orderkeys", carry=["custkey"], alias="orderkey", outer=True)


@query(
    "map_explode_key_value",
    sql="""
    SELECT n_nationkey AS nationkey, 'name' AS k, n_name AS v FROM nation
    UNION ALL
    SELECT n_nationkey, 'regionkey', CAST(n_regionkey AS VARCHAR) FROM nation
    """,
)
def map_explode_key_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map + explode -> (key, value) rows — the reference's
    hand-rolled pivot of participants_data (zoom_proc.py:183-190)."""
    nat = t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"),
        F.col("n_name"),
        F.lit("regionkey"),
        F.col("n_regionkey").cast("string"),
    )
    return nat.select(
        F.col("n_nationkey").alias("nationkey"), F.explode(m).alias("k", "v")
    )


@query(
    "ts_parse_iso_roundtrip",
    sql="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_str,
           strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS parsed_ts
    FROM orders
    """,
)
def ts_parse_iso_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 string <-> timestamp round trip — the SurveyMonkey/Zoom
    format family (monkey_proc.py:129-136, zoom_proc.py:141-144) via
    functions.casts.to_ts_iso."""
    from ..functions.casts import to_ts_iso

    orders = t(spark, sf_dir, "orders")
    iso = F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_str")
    return orders.select(
        "o_orderkey",
        iso,
        to_ts_iso(F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
        .cast("timestamp_ntz")
        .alias("parsed_ts"),
    )


@query(
    "ts_parse_epoch_seconds",
    sql="""
    SELECT event_id,
           epoch_us(ts) // 1000000 AS epoch_s,
           make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS ts_from_epoch
    FROM events
    """,
)
def ts_parse_epoch_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-seconds -> timestamp — the VK format family
    (vk_proc.py:170-173,232-239) via functions.casts.to_ts_epoch_seconds."""
    from ..functions.casts import to_ts_epoch_seconds

    ev = t(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        to_ts_epoch_seconds(epoch_s).cast("timestamp_ntz").alias("ts_from_epoch"),
    )


@query(
    "array_to_csv_string",
    sql="""
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), ',') AS name_csv,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens,
           list_contains(string_split(p_type, ' '), 'PROMO') AS is_promo
    FROM part
    """,
)
def array_to_csv_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops: split -> size / contains / concat_ws (array->CSV is the
    zoom internal_ip_addresses pattern, zoom_proc.py:200-203)."""
    from ..functions.casts import array_to_csv

    part = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        array_to_csv(toks).alias("name_csv"),
        F.size(toks).alias("n_tokens"),
        F.array_contains(F.split(F.col("p_type"), " "), "PROMO").alias("is_promo"),
    )


@query(
    "array_transform_filter",
    sql="""
    SELECT p_partkey,
           coalesce(array_to_string(
             list_transform(string_split(p_name, ' '), x -> UPPER(x)), ','), '')
             AS tokens_upper,
           coalesce(array_to_string(
             list_filter(string_split(p_name, ' '), x -> LENGTH(x) > 4), ','), '')
             AS long_tokens
    FROM part
    """,
)
def array_transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter) — JVM-side lambda
    expressions, no Python UDF. Arrays serialized to CSV strings so the
    output schema is all hashable scalars."""
    part = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.concat_ws(",", F.transform(toks, lambda x: F.upper(x))).alias(
            "tokens_upper"
        ),
        F.concat_ws(",", F.filter(toks, lambda x: F.length(x) > 4)).alias(
            "long_tokens"
        ),
    )


@query(
    "json_extract_props",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (raw-zone pattern —
    engine-side equivalent of the reference's json.loads ingestion,
    SURVEY.md §2.6 F8) + aggregation on the extracted key."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "regex_parse_bracketed_log",
    sql="""
    WITH lines AS (
      SELECT event_id,
             CASE WHEN event_type = 'error'
                  THEN '[E ' || strftime(ts, '%Y-%m-%d %H:%M:%S.%g') || ' JupyterHub app:' ||
                       CAST(user_id AS VARCHAR) || '] ' || event_type || ' value=' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)
                  ELSE 'malformed line ' || CAST(event_id AS VARCHAR) END AS log
      FROM events)
    SELECT event_id,
           regexp_extract(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$', 1) AS head,
           regexp_extract(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$', 2) AS log_ts,
           regexp_extract(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$', 3) AS service,
           regexp_extract(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$', 4) AS type,
           regexp_extract(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$', 5) AS code,
           CASE WHEN regexp_matches(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$')
                THEN regexp_extract(log, '^\\[([A-Z]) (\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\S+) ([A-Za-z_]+):(\\d+)\\] (.*)$', 6)
                ELSE log END AS msg
    FROM lines
    """,
)
def regex_parse_bracketed_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-regex rewrite of the reference's only UDF (sqbrackets,
    jhub_proc.py:133-146), including its malformed-line fallback
    (jhub_proc.py:142-145). Log lines are synthesized from events; the
    operator under test is functions.logparse.parse_bracketed_log."""
    ev = t(spark, sf_dir, "events")
    well_formed = F.concat(
        F.lit("[E "),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS"),
        F.lit(" JupyterHub app:"),
        F.col("user_id").cast("string"),
        F.lit("] "),
        F.col("event_type"),
        F.lit(" value="),
        F.col("value").cast("decimal(12,2)").cast("string"),
    )
    malformed = F.concat(F.lit("malformed line "), F.col("event_id").cast("string"))
    lines = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", well_formed).otherwise(malformed).alias("log"),
    )
    return lines.select("event_id", *parse_bracketed_log("log"))


@query(
    "nested_shred_three_levels",
    sql="""
    SELECT c.c_custkey AS custkey,
           o.o_orderkey AS orderkey,
           l.l_linenumber AS linenumber,
           l.l_quantity AS quantity
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
)
def nested_shred_three_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level shred — the deep-nesting chain of the reference's
    survey pipeline (pages->questions->headings->choices,
    monkey_proc.py:294-355), oracle-checked end to end.

    customer->orders->lineitems is first assembled into the nested JSON
    shape (array-of-struct inside array-of-struct), then shredded back
    to line grain with both ancestor keys carried — landing byte-equal
    to the flat join the oracle states.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    lines_per_order = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("linenumber"),
                F.col("l_quantity").alias("quantity"),
            )
        ).alias("lines")
    )
    orders_nested = (
        orders.join(lines_per_order, orders.o_orderkey == lines_per_order.orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.collect_list(
                F.struct(F.col("orderkey"), F.col("lines"))
            ).alias("orders")
        )
    )
    doc = cust.select(F.col("c_custkey").alias("custkey")).join(
        orders_nested, "custkey"
    )
    # shred back down: two explode_into levels, keys carried like the
    # reference carries survey_id/pages_id into every child
    level1 = explode_into(doc, "orders", carry=["custkey"], alias="o")
    level1 = level1.select("custkey", F.col("o.orderkey").alias("orderkey"), "o.lines")
    level2 = explode_into(level1, "lines", carry=["custkey", "orderkey"], alias="ln")
    return level2.select(
        "custkey",
        "orderkey",
        F.col("ln.linenumber").alias("linenumber"),
        F.col("ln.quantity").alias("quantity"),
    )


@query(
    "json_serialize_roundtrip",
    sql="""
    SELECT n_nationkey,
           to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS doc,
           CAST(json_extract_string(
               to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)),
               '$.n_name') AS VARCHAR) AS name_back
    FROM nation
    """,
)
def json_serialize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json serialization + field extraction back out — the write
    direction of the reference's raw-zone (de)serialization (SURVEY.md
    §2.6 F8; json.dumps at monkey_load.py:123). Compact key:value
    rendering is byte-identical across engines for scalar fields."""
    nat = t(spark, sf_dir, "nation")
    doc = F.to_json(F.struct("n_nationkey", "n_name"))
    return nat.select(
        "n_nationkey",
        doc.alias("doc"),
        F.get_json_object(doc, "$.n_name").alias("name_back"),
    )


@query(
    "union_missing_columns",
    sql="""
    SELECT CAST(r_regionkey AS BIGINT) AS key, r_name AS name,
           CAST(NULL AS VARCHAR) AS extra
    FROM region
    UNION ALL
    SELECT CAST(n_nationkey AS BIGINT), n_name, CAST(n_regionkey AS VARCHAR)
    FROM nation
    """,
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-evolution-tolerant
    union — the absent column null-fills (what the reference's
    schema-inference union does implicitly across JSON files of
    different vintages, FIXTURES.md cross-cutting case 1)."""
    reg = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"), F.col("r_name").alias("name")
    )
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("string").alias("extra"),
    )
    return reg.unionByName(nat, allowMissingColumns=True).select(
        F.col("key").cast("bigint").alias("key"), "name", "extra"
    )


@query(
    "json_variant_typed_extract",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END AS INT) AS missing_is_null
    FROM events
    """,
)
def json_variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VARIANT: ``parse_json`` once
    into the binary variant encoding, then typed ``variant_get`` paths.
    At scale this beats per-extraction ``get_json_object`` (which
    re-parses the string for every path) and enables shredded columnar
    variant storage; ``try_variant_get`` returns NULL for absent paths
    instead of erroring (reference's blanket try/except,
    vk_proc.py:811-812, done right)."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "string")
        .isNull()
        .cast("int")
        .alias("missing_is_null"),
    )
