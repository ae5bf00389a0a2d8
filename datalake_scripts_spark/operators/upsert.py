"""Upsert / SCD2 without Delta — anti-join + union emulation of MERGE.

The reference's mutation model is blunt: ``append`` accumulates
duplicates into ``hst_*`` tables, ``overwrite`` drops and reloads
(monkey_proc.py:229-268). These operators provide the middle ground a
real lakehouse needs. With Delta on the classpath these become
``MERGE INTO``; the pure-DataFrame forms here have identical semantics
and run anywhere (pyspark guide: "CDC / SCD2 -> emulate with anti-join
+ union + window").

Scale note: both ops shuffle once on the key. For repeated merges into
a large target, partition the target by a stable key prefix (or bucket
it — operators.scale.write_bucketed) so only touched partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: source rows replace matching target rows
    (whole-row update), unmatched source rows insert.

    target ANTI JOIN source (keep non-updated rows) UNION source.
    Source must be unique per key — enforced, because a multi-match
    MERGE is undefined behavior in SQL too.
    """
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError(f"source has duplicate keys on {keys}")
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source.select(*target.columns))


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    effective_ts_col: str = "effective_ts",
    end_ts_col: str = "end_ts",
    current_flag_col: str = "is_current",
    update_ts_col: str = "ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out changed rows, append
    new versions, keep history.

    ``current`` carries (keys, tracked_cols, effective_ts, end_ts,
    is_current); ``updates`` carries (keys, tracked_cols, ts). A key
    whose tracked values changed gets its open row closed
    (end_ts = update ts, is_current = false) and a new open row. New
    keys insert as open rows. Unchanged keys pass through.
    """
    upd = updates.select(
        *keys,
        *tracked_cols,
        F.col(update_ts_col).alias(effective_ts_col),
    )
    open_rows = current.filter(F.col(current_flag_col))
    closed_rows = current.filter(~F.col(current_flag_col))

    cmp = open_rows.alias("t").join(upd.alias("u"), keys, "left")
    # any tracked column differs (null-safe)
    diff = None
    for c in tracked_cols:
        d = ~F.col(f"t.{c}").eqNullSafe(F.col(f"u.{c}"))
        diff = d if diff is None else (diff | d)
    has_update = F.col(f"u.{effective_ts_col}").isNotNull()

    # 1. open rows with a changing update -> closed
    to_close = cmp.filter(has_update & diff).select(
        *[F.col(f"t.{k}") for k in keys],
        *[F.col(f"t.{c}") for c in tracked_cols],
        F.col(f"t.{effective_ts_col}"),
        F.col(f"u.{effective_ts_col}").alias(end_ts_col),
        F.lit(False).alias(current_flag_col),
    )
    # 2. open rows without change -> unchanged
    unchanged = cmp.filter(~has_update | ~diff).select(
        *[F.col(f"t.{k}") for k in keys],
        *[F.col(f"t.{c}") for c in tracked_cols],
        F.col(f"t.{effective_ts_col}"),
        F.col(f"t.{end_ts_col}"),
        F.col(f"t.{current_flag_col}"),
    )
    # 3. new versions: changed keys + brand-new keys
    existing_keys = open_rows.select(*keys)
    changed_keys = cmp.filter(has_update & diff).select(
        *[F.col(f"t.{k}") for k in keys]
    )
    new_versions = (
        upd.join(changed_keys, keys, "left_semi")
        .unionByName(upd.join(existing_keys, keys, "left_anti"))
        .select(
            *keys,
            *tracked_cols,
            F.col(effective_ts_col),
            F.lit(None).cast(current.schema[end_ts_col].dataType).alias(end_ts_col),
            F.lit(True).alias(current_flag_col),
        )
    )
    return closed_rows.unionByName(unchanged).unionByName(to_close).unionByName(
        new_versions
    )
