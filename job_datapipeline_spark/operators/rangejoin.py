"""Binned range joins — equi-join rewrites of the inequality joins Spark
would otherwise execute as a BroadcastNestedLoopJoin (or worse, a
CartesianProduct with a post-filter).  Two primitives:

- :func:`bin_range_join` — point-in-interval (``lo <= t <= hi``),
- :func:`interval_overlap_join` — interval-overlap
  (``lo_a <= hi_b AND lo_b <= hi_a``), the session/exposure/FIFO shape.

The device (the same one behind Databricks' range-join optimization and
every IP-in-CIDR lookup at scale): pick a bin width W on the point axis,
map every point to its single bin ``floor(t / W)``, EXPLODE every interval
to the bins it covers, and equi-join on (optional keys..., bin) before
re-checking the exact bounds.  A matching pair meets in exactly one bin —
the point's — so no post-join dedup is needed; the join is an ordinary
shuffled equi-join that partitions, broadcasts and AQE-balances like any
other.

Choosing W: near the TYPICAL interval width.  Cost is
``|points| + sum(interval_width / W + 1)`` join rows — W too small
explodes long intervals into many bin rows, W too large piles unrelated
points into shared bins for the residual filter to discard.  Intervals
orders of magnitude longer than W (the skew case) should be split or
handled on a broadcast side-path; the explode factor for each interval
is ``(hi - lo) / W + 1``, visible and tunable.

Reference parity: none — the reference (glassdoor-scraper/src/main.py)
is single-process pandas.  This is the distributed re-expression of the
"which points fall inside which windows" primitive its daily-batch
design never needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_jdp_bin"
_HIT = "_jdp_hit"
_PID = "_jdp_pid"


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo_col <= point_col <= hi_col`` (and equal ``keys``), as a binned
    equi-join.  ``point_col``/``lo_col``/``hi_col`` must be numeric
    (cast timestamps to epoch seconds first); ``bin_width`` is in the
    same unit.  Column names must be disjoint between the two inputs
    apart from ``keys``.  ``how='inner'`` yields matching pairs;
    ``how='left_point'`` keeps unmatched points with null interval
    columns (the enrichment shape).  Matches are detected via an
    internal always-true flag on the interval side, so interval rows
    whose own columns contain NULLs join correctly; fully-duplicate
    point rows are kept (LEFT-join multiplicity) via an internal
    per-row id."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive (got {bin_width})")
    if how not in ("inner", "left_point"):
        raise ValueError(f"unsupported how={how!r}")
    pts = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    ivl = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    on = [*keys, _BIN]
    in_range = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if how == "inner":
        return pts.join(ivl, on).where(in_range).drop(_BIN)
    ivl_cols = [c for c in intervals.columns if c not in keys]
    # match sentinel: an internal always-true flag on the interval side
    # (NULL interval data columns must not mask a genuine match), plus a
    # per-row point id so duplicate unmatched point rows keep LEFT-join
    # multiplicity instead of collapsing in the group-by
    pts = pts.withColumn(_PID, F.monotonically_increasing_id())
    ivl = ivl.withColumn(_HIT, F.lit(True))
    joined = pts.join(ivl, on, "left").select(
        F.col(_PID),
        *[F.col(c) for c in points.columns],
        *[
            F.when(in_range, F.col(c)).alias(c)
            for c in ivl_cols
        ],
        F.when(in_range, F.col(_HIT)).alias(_HIT),
    )
    # a point may meet several bins' worth of non-matching intervals under
    # LEFT semantics; collapse back to one row per point per MATCHING
    # interval, or one all-null row when none matched
    matched = joined.where(F.col(_HIT)).drop(_PID, _HIT)
    unmatched = (
        joined.groupBy(F.col(_PID), *[F.col(c) for c in points.columns])
        .agg(F.max(_HIT).alias("_any"))
        .where(F.col("_any").isNull())
        .select(
            *[F.col(c) for c in points.columns],
            *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in ivl_cols],
        )
    )
    return matched.unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Join every pair of CLOSED intervals that overlap
    (``left_lo <= right_hi AND right_lo <= left_hi``, plus equal
    ``keys``) as a binned equi-join.  Both sides explode to the bins
    they cover; an overlapping pair shares every bin between
    ``max(lo)`` and ``min(hi)``, so the pair is CLAIMED exactly once in
    the bin containing ``max(left_lo, right_lo)`` — that value lies
    inside both intervals whenever they overlap, hence in both exploded
    bin sets, and the claim filter makes the dedup free (no post-join
    ``distinct``).  Bounds must be numeric (cast timestamps to epoch
    units first) with ``lo <= hi`` on every row; column names must be
    disjoint between the two inputs apart from ``keys``.

    Cost mirrors :func:`bin_range_join`: ``sum(width / W + 1)`` join
    rows PER SIDE — pick W near the typical interval width; split or
    broadcast the rare giant interval.  Half-open ``[lo, hi)``
    semantics: pass ``hi - 1`` for integer axes.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive (got {bin_width})")
    bins = lambda lo, hi: F.explode(  # noqa: E731
        F.sequence(
            F.floor(F.col(lo) / bin_width), F.floor(F.col(hi) / bin_width)
        )
    )
    a = left.withColumn(_BIN, bins(left_lo, left_hi))
    b = right.withColumn(_BIN, bins(right_lo, right_hi))
    overlap = (F.col(left_lo) <= F.col(right_hi)) & (
        F.col(right_lo) <= F.col(left_hi)
    )
    claimed = F.col(_BIN) == F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / bin_width
    )
    return a.join(b, [*keys, _BIN]).where(overlap & claimed).drop(_BIN)


_BINX = "_jdp_binx"
_BINY = "_jdp_biny"


def grid_containment_join(
    points: DataFrame,
    rects: DataFrame,
    *,
    x_col: str,
    y_col: str,
    x_lo: str,
    x_hi: str,
    y_lo: str,
    y_hi: str,
    cell: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Join each point to every axis-aligned rectangle containing it
    (``x_lo <= x <= x_hi AND y_lo <= y <= y_hi``, plus equal ``keys``)
    as a 2-D grid equi-join — :func:`bin_range_join` lifted to the
    plane, the geohash/S2-cell pattern behind every spatial
    containment join at scale.

    Each point maps to its single ``(floor(x/cell), floor(y/cell))``
    grid cell; each rectangle EXPLODES to the cells it covers (the
    cross product of its x-bin and y-bin ranges); the equi-join on
    (keys..., cellx, celly) meets a matching pair in exactly one cell
    — the point's — so the exact-bounds re-check needs no post-join
    dedup.  Coordinates must be numeric (quantize degrees to
    micro-degrees first); ``cell`` is in the same unit.  Cost is
    ``|points| + sum((w/cell + 1) * (h/cell + 1))`` join rows — pick
    ``cell`` near the typical rectangle side; the 1-D bin-width sweep
    in SCALE_GROWTH.md ("Round-8 join-primitive datapoints") is the
    measured version of the same trade, squared.
    """
    if cell <= 0:
        raise ValueError(f"cell must be positive (got {cell})")
    pts = points.withColumn(
        _BINX, F.floor(F.col(x_col) / cell)
    ).withColumn(_BINY, F.floor(F.col(y_col) / cell))
    rc = rects.withColumn(
        _BINX,
        F.explode(
            F.sequence(
                F.floor(F.col(x_lo) / cell), F.floor(F.col(x_hi) / cell)
            )
        ),
    ).withColumn(
        _BINY,
        F.explode(
            F.sequence(
                F.floor(F.col(y_lo) / cell), F.floor(F.col(y_hi) / cell)
            )
        ),
    )
    inside = (
        (F.col(x_col) >= F.col(x_lo))
        & (F.col(x_col) <= F.col(x_hi))
        & (F.col(y_col) >= F.col(y_lo))
        & (F.col(y_col) <= F.col(y_hi))
    )
    return (
        pts.join(rc, [*keys, _BINX, _BINY])
        .where(inside)
        .drop(_BINX, _BINY)
    )
