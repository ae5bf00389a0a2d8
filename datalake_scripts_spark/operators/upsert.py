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


def scd2_from_changes(
    changes: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_flag_col: str = "is_current",
) -> DataFrame:
    """Build the FULL SCD2 history in one pass from a change feed
    (the batch/backfill dual of :func:`scd2_apply`, which applies one
    incremental batch to an existing dimension).

    Semantics per key, ordered by (ts, tiebreak):

    1. last-write-wins within an equal-``ts`` run (the CDC convention:
       later ``tiebreak`` — e.g. a log sequence number — supersedes);
    2. consecutive no-change rows collapse (a row opens a new version
       only when some tracked column IS DISTINCT FROM its predecessor);
    3. ``valid_from`` = change ts, ``valid_to`` = next change ts
       (half-open interval, NULL = open), ``is_current`` = open row.

    Scale: ONE hash shuffle on ``keys`` — all three window stages share
    the same partitioning, so Catalyst plans a single Exchange; history
    length per key is bounded by that key's change count, never by the
    corpus. The reference's mutation model (hst_* append tables,
    monkey_proc.py:229-268) keeps every raw duplicate; this derives the
    queryable validity-interval view from exactly that shape.
    """
    tiebreak = tiebreak or []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = W.partitionBy(*keys).orderBy(*order)
    return _scd2_pipeline(
        changes, keys, tracked_cols, ts_col, w,
        valid_from_col, valid_to_col, current_flag_col,
    )


def _scd2_pipeline(
    changes: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    ts_col: str,
    w,
    valid_from_col: str,
    valid_to_col: str,
    current_flag_col: str,
) -> DataFrame:

    # 1. last-write-wins per (keys, ts): keep the LAST row of each
    #    equal-ts run — the row whose successor has a different ts.
    lww = changes.withColumn("_next_ts", F.lead(ts_col).over(w)).filter(
        F.col("_next_ts").isNull() | (F.col("_next_ts") != F.col(ts_col))
    )

    # 2. collapse consecutive no-change rows (null-safe per column).
    changed = None
    for c in tracked_cols:
        d = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        changed = d if changed is None else (changed | d)
    is_first = F.lag(ts_col).over(w).isNull()
    collapsed = lww.withColumn("_open", is_first | changed).filter(F.col("_open"))

    # 3. validity intervals: half-open [valid_from, valid_to).
    return collapsed.select(
        *keys,
        *tracked_cols,
        F.col(ts_col).alias(valid_from_col),
        F.lead(ts_col).over(w).alias(valid_to_col),
        F.lead(ts_col).over(w).isNull().alias(current_flag_col),
    )


def scd2_merge_backfill(
    dim: DataFrame,
    late_changes: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_flag_col: str = "is_current",
) -> DataFrame:
    """Merge LATE-ARRIVING changes into an existing SCD2 dimension —
    including changes that land in the MIDDLE of a key's history, the
    case :func:`scd2_apply` (head-append only) cannot express and a
    naive pipeline silently mis-intervals.

    Shape: only the touched keys rework. The late batch's keys
    (semi-join) have their histories re-derived from the union of
    (a) the dim's own version rows — each IS a canonical change at its
    ``valid_from`` — and (b) the late changes; untouched keys pass
    through by anti-join. Cost rides the touched keys' history length,
    never the dimension: the 100 TB backfill shape.

    Equal-timestamp policy: a late change at an existing change-point's
    exact ts WINS (CDC re-delivery semantics) — the merge window orders
    dim rows before late rows at equal ts and last-write-wins keeps the
    late one. WITHIN the late batch, equal-ts rows are ordered by
    ``tiebreak`` (e.g. a log sequence number) so the highest-tiebreak
    change wins deterministically; without it, two late changes for one
    key at one ts would be resolved by nondeterministic physical row
    order. Dim rows carry NULL tiebreaks (they are already per-ts
    unique, being LWW winners of their own build). Consecutive equal
    values across the splice re-collapse, so merging a no-op backfill
    is the identity.

    ``dim`` and ``late_changes`` must not share one DataFrame lineage
    (Spark's self-union rejects zipping a plan with itself); when the
    late batch is derived from the dim, materialize one side first
    (localCheckpoint or a table round-trip — the versioned layer's
    read does this naturally).
    """
    tiebreak = tiebreak or []
    touched = late_changes.select(*keys).distinct()
    existing = (
        dim.join(touched, keys, "left_semi")
        .select(
            *keys,
            *tracked_cols,
            F.col(valid_from_col).alias(ts_col),
            F.lit(0).alias("_src"),
            *[
                F.lit(None).cast(late_changes.schema[c].dataType).alias(c)
                for c in tiebreak
            ],
        )
    )
    late = late_changes.select(
        *keys, *tracked_cols, F.col(ts_col), F.lit(1).alias("_src"), *tiebreak
    )
    merged = existing.unionByName(late)
    w = W.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(),
        F.col("_src").asc(),
        *[F.col(c).asc() for c in tiebreak],
    )
    rebuilt = _scd2_pipeline(
        merged, keys, tracked_cols, ts_col, w,
        valid_from_col, valid_to_col, current_flag_col,
    ).select(*keys, *tracked_cols, valid_from_col, valid_to_col,
             current_flag_col)
    untouched = dim.join(touched, keys, "left_anti").select(
        *keys, *tracked_cols, valid_from_col, valid_to_col, current_flag_col
    )
    return untouched.unionByName(rebuilt)
