"""Interval-overlap join: pairs of rows whose [start, end] intervals
intersect — the join family between equi joins and full theta joins
(event windows × incident windows, shipment windows × promo windows,
session spans × outage spans).

A naive formulation is a cross join with an overlap predicate —
quadratic and unrunnable at scale. The scalable shape here is the
classic *banded* (binned) join:

1. map each interval to the integer bins it spans
   (``floor(start/w) .. floor(end/w)``, ``sequence`` + ``explode``);
2. shuffle both sides on (equi keys ..., bin) — overlapping intervals
   ALWAYS share the bin of the later start, so no candidate is lost;
3. apply the exact overlap predicate inside the bin;
4. emit each pair exactly once WITHOUT a distinct: keep the pair only
   in the first bin where both intervals are present, i.e. where
   ``bin == greatest(floor(l_start/w), floor(r_start/w))``. The
   dedup is a filter evaluated during the join — zero extra shuffle.

Cost: |rows| × (avg interval length / w) exploded rows, then one
hash-shuffle join on the bin key. ``bin_width`` trades explode fan-out
(wide bins → fewer copies) against candidate selectivity (narrow bins
→ fewer false pairs per bucket); set it near the TYPICAL interval
length. Long-tail intervals fan out more — cap them upstream or raise
``bin_width``. At 100 TB both sides stay fully distributed; adding
equi keys (e.g. a tenant or region column) turns the shuffle key into
(key, bin) and bounds every bucket.

Reference parity: the reference engine has no join operators at all
(SURVEY.md §2.3); this generalizes the repo's as-of and point-in-range
joins (operators/asof.py, queries range_join_value_tiers) to
interval × interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    on: list[str] | None = None,
    to_long: Column | None = None,
) -> DataFrame:
    """Inner-join ``left`` × ``right`` on closed-interval overlap
    (``l_start <= r_end AND r_start <= l_end``), optionally ANDed with
    equi keys ``on``. Interval columns must be castable to long (use
    ``to_long`` to supply a conversion, e.g. date→epoch-day); overlap
    is evaluated on the converted values. Output columns: every left
    column, then every right column not shadowed (right's are suffixed
    ``_r`` on collision, including the interval columns).

    The result contains each qualifying (left row, right row) pair
    exactly once — the first-common-bin filter replaces the
    distinct-after-explode a naive banded join needs.

    Preconditions: ``start <= end`` on every row (closed intervals) —
    an inverted interval raises a clear runtime error instead of
    ``sequence``'s opaque one; and no input column may use the
    reserved working names (``_s _e _b0 _s2 _e2 _b02 _bin``) — a
    collision raises up front rather than silently clobbering data.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    on = on or []
    reserved = ("_s", "_e", "_b0", "_s2", "_e2", "_b02", "_bin")
    clash = sorted(
        {c for c in reserved if c in left.columns or c in right.columns}
    )
    if clash:
        raise ValueError(
            f"input column(s) {clash} collide with "
            "interval_overlap_join's reserved working names "
            f"{list(reserved)} — rename them before the join"
        )

    def conv(df, col):
        c = F.col(col)
        return to_long(c) if to_long is not None else c.cast("long")

    def bins(b0, b1, s, e, side):
        # a clear error beats sequence()'s opaque one on end < start
        return F.explode(F.sequence(
            b0,
            F.when(e >= s, b1).otherwise(F.raise_error(F.concat(
                F.lit(
                    f"interval_overlap_join: inverted {side} interval "
                    "(end < start): start="
                ),
                s.cast("string"), F.lit(" end="), e.cast("string"),
            ))),
        ))

    ls = conv(left, left_start).cast("long")
    le = conv(left, left_end).cast("long")
    rs = conv(right, right_start).cast("long")
    re = conv(right, right_end).cast("long")
    lb0 = F.floor(conv(left, left_start) / bin_width)
    lb1 = F.floor(conv(left, left_end) / bin_width)
    rb0 = F.floor(conv(right, right_start) / bin_width)
    rb1 = F.floor(conv(right, right_end) / bin_width)

    l = left.withColumn("_s", ls) \
            .withColumn("_e", le) \
            .withColumn("_b0", lb0) \
            .withColumn("_bin", bins(lb0, lb1, ls, le, "left"))
    rename = {
        c: (c + "_r" if c in left.columns else c)
        for c in right.columns
        if c not in on
    }
    r = right.withColumn("_s2", rs) \
             .withColumn("_e2", re) \
             .withColumn("_b02", rb0) \
             .withColumn("_bin", bins(rb0, rb1, rs, re, "right"))
    r = r.select(
        *on,
        *[F.col(c).alias(rename[c]) for c in right.columns if c not in on],
        "_s2", "_e2", "_b02", "_bin",
    )
    cond = (
        (F.col("_s") <= F.col("_e2"))
        & (F.col("_s2") <= F.col("_e"))
        # emit in the first bin both intervals inhabit — dedup as a
        # join-side filter, not a post-join distinct
        & (F.col("_bin") == F.greatest(F.col("_b0"), F.col("_b02")))
    )
    joined = l.join(r, on=[*on, "_bin"], how="inner").filter(cond)
    return joined.drop("_s", "_e", "_b0", "_s2", "_e2", "_b02", "_bin")


def interval_overlap_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    to_long: Column | None = None,
) -> DataFrame:
    """The small-dimension strategy: broadcast ``right`` and evaluate
    the overlap predicate directly (BroadcastNestedLoopJoin — no
    explode, no bin shuffle, zero duplication). Correct for any sizes
    but O(|left| x |right|) comparisons: use when right is
    dimension-sized (maintenance windows, promo calendars, tier
    tables); the banded :func:`interval_overlap_join` is the
    both-sides-large path. Same output contract (right columns
    suffixed ``_r`` on collision). Intervals are closed and assumed
    ``start <= end``; an inverted interval simply matches nothing
    here (the overlap predicate is evaluated directly — no explode to
    blow up)."""
    on = on or []
    rename = {
        c: (c + "_r" if c in left.columns else c)
        for c in right.columns
        if c not in on
    }
    r = right.select(
        *on,
        *[F.col(c).alias(rename[c]) for c in right.columns if c not in on],
    )

    def cl(col):
        x = left[col]
        return to_long(x) if to_long is not None else x.cast("long")

    def cr(col):
        x = r[rename.get(col, col)]
        return to_long(x) if to_long is not None else x.cast("long")

    cond = (cl(left_start) <= cr(right_end)) & (
        cr(right_start) <= cl(left_end)
    )
    for k in on:
        cond = cond & (left[k] == r[k])
    # bcast: caller contract — right is dimension-sized by definition
    # of this strategy
    joined = left.join(F.broadcast(r), on=cond, how="inner")
    for k in on:
        joined = joined.drop(r[k])
    return joined
