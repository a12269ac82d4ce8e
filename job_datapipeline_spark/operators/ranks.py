"""Distributed total-order primitives: global row numbers, running sums,
exact ntiles, exact rank picks, and ordered-neighbor carries — WITHOUT a
single-partition window.

Spark executes ``Window.orderBy(...)`` with no ``partitionBy`` on ONE
partition (WindowExec warns "Moving all data to a single partition"), so
a global row_number / cumsum / ntile over a frame that grows with the
data is the canonical scale anti-pattern (docs/SCALING.md).  This module
is the escalation that doc promises, as real code: the classic two-pass
partials+offsets form.

1. ``repartitionByRange`` on the order key — each partition holds a
   contiguous key range and partition ids ascend with the ranges, so pid
   order IS global key order between partitions — then ``localCheckpoint``
   to pin the partitioning: repartitionByRange estimates boundaries by
   sampling, and pinning guarantees the offsets pass and the value pass
   see the SAME partitioning even when a stage is recomputed.
2. A per-partition partial (count / running-sum total / edge payloads):
   P rows, P = spark.sql.shuffle.partitions — bounded by cluster sizing,
   never by data volume.
3. Exclusive prefix offsets over that P-row frame via a triangular LEFT
   self-join (``b.pid < a.pid``): O(P^2) comparisons, trivially small,
   and deliberately window-free so plan audits can assert the composed
   queries contain ZERO unpartitioned WindowExec nodes.
4. The within-partition pass — ``Window.partitionBy(pid).orderBy(keys)``,
   fully parallel — combined with the broadcast per-partition offset.

Determinism contract: ``order_cols`` must be a TOTAL order (callers pin
ties with a key column, exactly as their hash-matched oracle SQL does).

Reference parity: none — the reference (glassdoor-scraper/src/main.py)
is single-process pandas, where a global cumsum is a one-liner; this is
the distributed re-expression of that capability.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_jdp_pid"

OrderCol = Column | str


def _cols(order_cols: Sequence[OrderCol]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def int_div(a: Column, b: Column | int) -> Column:
    """Exact floor division of a non-negative bigint by a positive divisor.

    ``F.floor(a / b)`` routes through IEEE double and can mis-round once a
    exceeds 2^53, quietly undercutting the exact-at-any-scale contract of
    the rank-pick expressions built on it.  ``(a - a % b)`` is exactly
    divisible by b; dividing it in DECIMAL(38,0) keeps every intermediate
    integral, so the pick stays exact at any n."""
    exact = (a - (a % b)).cast("decimal(38,0)")
    return (exact / b).cast("long")


def stamp_range_partitions(
    df: DataFrame, order_cols: Sequence[OrderCol]
) -> DataFrame:
    """Range-partition ``df`` by ``order_cols`` and stamp the pinned
    partition id (see module docstring, steps 1-2)."""
    part = df.repartitionByRange(*_cols(order_cols)).withColumn(
        _PID, F.spark_partition_id().cast("long")
    )
    return part.localCheckpoint()


def _prefix_offsets(
    partials: DataFrame, agg_cols: Sequence[str] | str
) -> DataFrame:
    """Exclusive prefix total of each ``agg_col`` per pid over a P-row
    partials frame, via the window-free triangular left self-join.  A
    single column yields ``_off``; multiple yield ``_off_<col>``."""
    single = isinstance(agg_cols, str)
    cols = [agg_cols] if single else list(agg_cols)
    a = partials.alias("a")
    # broadcast the probe side: the non-equi condition would otherwise
    # compile to CartesianProduct; BroadcastNestedLoopJoin over two P-row
    # frames is both cheaper and honest about the intent
    b = F.broadcast(partials.alias("b"))
    aggs = [
        F.coalesce(F.sum(F.col(f"b.{c}")), F.lit(0).cast("long")).alias(
            "_off" if single else f"_off_{c}"
        )
        for c in cols
    ]
    return (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(*aggs)
    )


def _numbered(
    part: DataFrame, order_cols: Sequence[OrderCol], rn_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared core: global row numbers over a stamped frame, plus the
    per-pid counts frame (reused by callers needing the total)."""
    counts = part.groupBy(_PID).agg(F.count("*").alias("_cnt"))
    offsets = _prefix_offsets(counts, "_cnt")
    w = Window.partitionBy(_PID).orderBy(*_cols(order_cols))
    numbered = (
        part.join(F.broadcast(offsets), _PID)
        .withColumn(rn_col, F.row_number().over(w) + F.col("_off"))
        .drop("_off")
    )
    return numbered, counts


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    *,
    rn_col: str = "rn",
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` in two distributed
    passes instead of a single-partition window."""
    part = stamp_range_partitions(df, order_cols)
    numbered, _ = _numbered(part, order_cols, rn_col)
    return numbered.drop(_PID)


def global_cumsum(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    value_col: str | Sequence[str],
    *,
    out_col: str | Sequence[str] = "cum",
    rn_col: str | None = None,
) -> DataFrame:
    """``sum(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``
    (bigint values) as per-partition running sums plus a broadcast
    exclusive prefix-total per partition.  Accepts one value column or a
    list — multiple running sums share ONE range shuffle and one
    partitioned window (the KS statistic needs two over the same
    order).  ``rn_col`` additionally emits the global row number off the
    SAME shuffle and window (callers that need both — e.g. to join each
    row to its ordered successor — would otherwise pay a second range
    pass)."""
    single = isinstance(value_col, str)
    if single != isinstance(out_col, str):
        # a list value_col with the default string out_col would otherwise
        # become list('cum') == ['c','u','m'] — reject mixed kinds outright
        raise TypeError(
            "value_col and out_col must both be str or both be sequences"
        )
    value_cols = [value_col] if single else list(value_col)
    out_cols = [out_col] if single else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col/out_col length mismatch")
    part = stamp_range_partitions(df, order_cols)
    aggs = [F.sum(c).cast("long").alias(c) for c in value_cols]
    if rn_col is not None:
        aggs.append(F.count("*").alias("_rncnt"))
    partials = part.groupBy(_PID).agg(*aggs)
    off_cols = list(value_cols) + (["_rncnt"] if rn_col is not None else [])
    offsets = _prefix_offsets(partials, off_cols)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*_cols(order_cols))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = part.join(F.broadcast(offsets), _PID)
    drops = [_PID]
    for vc, oc in zip(value_cols, out_cols):
        off = f"_off_{vc}"
        out = out.withColumn(
            oc, F.sum(vc).over(w).cast("long") + F.col(off)
        )
        drops.append(off)
    if rn_col is not None:
        wr = Window.partitionBy(_PID).orderBy(*_cols(order_cols))
        out = out.withColumn(
            rn_col, F.row_number().over(wr) + F.col("_off__rncnt")
        )
        drops.append("_off__rncnt")
    return out.drop(*drops)


def global_cummin(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    value_col: str,
    *,
    out_col: str = "cummin",
    exclusive: bool = False,
) -> DataFrame:
    """``min(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING
    [AND 1 PRECEDING])`` without a single-partition window: per-partition
    running mins plus a broadcast carry-in (the min of every PRECEDING
    partition's min, via the same triangular P-row self-join the prefix
    sums use).  ``exclusive=True`` gives the strictly-preceding frame the
    skyline sweep needs; rows with no preceding value get NULL there
    (``F.least`` skips the NULL side unless both are NULL)."""
    part = stamp_range_partitions(df, order_cols)
    partials = part.groupBy(_PID).agg(F.min(value_col).alias("_pmin"))
    a = partials.alias("a")
    b = F.broadcast(partials.alias("b"))
    carry = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.min(F.col("b._pmin")).alias("_carry"))
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*_cols(order_cols))
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    return (
        part.join(F.broadcast(carry), _PID)
        .withColumn(out_col, F.least(F.min(value_col).over(w), F.col("_carry")))
        .drop(_PID, "_carry")
    )


def exact_ntile(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    k: int,
    *,
    out_col: str = "bucket",
) -> DataFrame:
    """Exact SQL ``NTILE(k) OVER (ORDER BY order_cols)`` from the
    distributed row number: with n rows, ``base = n div k`` and
    ``rem = n mod k``, buckets 1..rem hold base+1 rows and the rest hold
    base — the standard NTILE fill, derived per row from rn and a
    broadcast 1-row total.  No global sort anywhere."""
    part = stamp_range_partitions(df, order_cols)
    rn = "_jdp_rn"
    numbered, counts = _numbered(part, order_cols, rn)
    total = counts.groupBy().agg(
        F.coalesce(F.sum("_cnt"), F.lit(0)).cast("long").alias("_n")
    )
    # The bucket arithmetic runs PER ROW over the full frame, so it uses
    # Spark SQL's native integral `div` (exact on bigints, whole-stage
    # codegen) rather than the decimal-backed int_div helper — the
    # decimal casts measured a ~2x slowdown on the ntile consumers.
    # base = rows in a short bucket, rem = number of long (base+1)
    # buckets (first).  When n < k, base = 0 and every row takes the
    # WHEN branch (rn <= rem), so the ELSE's div-by-zero is unreachable.
    base = f"(_n div {k})"
    rem = f"(_n % {k})"
    bucket = F.expr(
        f"CAST(CASE WHEN {rn} <= {rem} * ({base} + 1) "
        f"THEN (({rn} - 1) div ({base} + 1)) + 1 "
        f"ELSE {rem} + ((({rn} - {rem} * ({base} + 1)) - 1) div {base}) + 1 "
        f"END AS INT)"
    )
    return (
        numbered.crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket)
        .drop(_PID, rn, "_n")
    )


def exact_rank_values(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    rank_exprs: Sequence[Callable[[Column], Column]],
    *,
    rn_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """Rows sitting at exact global ranks (e.g. the p25/p75 picks an EM
    initializer needs), where each requested rank is an expression of the
    total row count n (handed in as a Column) — fully in-plan, no
    driver-side action.

    Only partitions whose (offset, offset+count] span contains a
    requested rank enter the sort window — the rest are pruned before the
    shuffle, so the cost is O(n/P log(n/P)) on a handful of partitions
    rather than a global sort.  Returns the matching rows with their
    global rank in ``rn_col``; with ``total_col`` set, the total row
    count n rides along too (it is already computed for the pruning
    predicate — keeping it saves callers a second full count pass over
    the input).

    The rank expressions are evaluated ONLY on P-row frames (the pruning
    predicate, and an ``_ranks`` array stamped onto the broadcast
    candidate rows); the per-data-row keep test is a native
    ``array_contains`` over that tiny bigint array.  Callers may
    therefore hand in decimal-backed ``int_div`` expressions for
    exactness past 2^53 without paying decimal arithmetic per row —
    re-evaluating rk(n) per data row measured 2.5-3x slower on a
    15-rank sf0.1 scan (the layout_range_boundaries case)."""
    part = stamp_range_partitions(df, order_cols)
    counts = part.groupBy(_PID).agg(F.count("*").alias("_cnt"))
    offsets = _prefix_offsets(counts, "_cnt").join(counts, _PID)
    total = counts.groupBy().agg(
        F.coalesce(F.sum("_cnt"), F.lit(0)).cast("long").alias("_n")
    )
    n = F.col("_n")
    # The rank expressions are functions of the scalar total n ONLY, so
    # they are evaluated exactly ONCE — on the 1-row total frame — into
    # the _ranks long array; both the partition-pruning predicate and the
    # per-row keep test below consume the array (native exists /
    # array_contains over a handful of bigints), never re-running the
    # (possibly decimal-backed int_div) expressions per offset or data
    # row.  The integrality guard rides the same 1-row projection:
    # _ranks truncates to long, so a non-integral rank expression (caller
    # error) would otherwise match truncated ranks and return
    # plausible-but-wrong rows.  assert_true on the broadcast total frame
    # fails the job loudly instead, and fires even when ZERO partitions
    # match the pruning predicate (the broadcast exchange is always
    # built) — a silent-empty result cannot slip past it.
    integral = F.lit(True)
    for rk in rank_exprs:
        integral = integral & (rk(n) == rk(n).cast("long"))
    chk = F.assert_true(
        integral,
        F.lit("exact_rank_values: rank_exprs must evaluate to integral ranks"),
    )
    ranks_arr = F.array(*[rk(n).cast("long") for rk in rank_exprs])
    total = total.select("_n", F.when(chk.isNull(), ranks_arr).alias("_ranks"))
    lo, hi = F.col("_off"), F.col("_off") + F.col("_cnt")
    cand = (
        offsets.crossJoin(F.broadcast(total))
        .where(F.exists("_ranks", lambda r: (r > lo) & (r <= hi)))
        .select(_PID, "_off", "_n", "_ranks")
    )
    w = Window.partitionBy(_PID).orderBy(*_cols(order_cols))
    numbered = part.join(F.broadcast(cand), _PID).withColumn(
        rn_col, F.row_number().over(w) + F.col("_off")
    )
    out = numbered.where(
        F.array_contains(F.col("_ranks"), F.col(rn_col))
    ).drop(_PID, "_off", "_ranks")
    if total_col is None:
        return out.drop("_n")
    return out.withColumnRenamed("_n", total_col)


def ordered_neighbor_carry(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    flag_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """For every row, the payload of the nearest PRECEDING and FOLLOWING
    row (in global ``order_cols`` order) whose ``flag_col`` is true — the
    sort-merge nearest-neighbor device (as-of matching, matched cohorts)
    without the single-partition window.

    Within each range partition a partitioned last IGNORE NULLS window
    finds the local neighbor — BOTH directions via UNBOUNDED-PRECEDING
    frames (the following-side neighbor comes from the same frame over
    the REVERSED sort), because Spark's UnboundedPreceding frame updates
    incrementally (O(n) per partition) while an UnboundedFollowing frame
    recomputes its aggregate per row (O(n^2) per partition — measured as
    a 563 s single-task stall on the 10x ladder before this fix).  The
    cross-partition carry comes from a P-row edge table (each
    partition's first/last flagged payload) turned into per-pid
    carry-ins by the same triangular self-join the prefix sums use.
    Adds ``_prev_<col>`` / ``_next_<col>`` per payload column (null when
    no flagged row exists on that side).

    ``order_cols`` must be plain column names (ascending) here — the
    reversed-frame trick needs to flip the sort direction, which a
    pre-built Column sort expression doesn't expose."""
    for c in order_cols:
        if not isinstance(c, str):
            raise TypeError(
                "ordered_neighbor_carry requires plain (ascending) column "
                "names so the following-side frame can run on the "
                "reversed sort"
            )
    part = stamp_range_partitions(df, order_cols)
    payload = F.struct(*[F.col(c) for c in payload_cols])
    ord_struct = F.struct(*_cols(order_cols))
    pids = part.groupBy(_PID).agg(F.count("*").alias("_cnt")).select(_PID)
    edges = (
        part.where(F.col(flag_col))
        .groupBy(_PID)
        .agg(
            F.max_by(payload, ord_struct).alias("_last"),
            F.min_by(payload, ord_struct).alias("_first"),
        )
    )
    a = pids.alias("a")
    b = F.broadcast(edges.alias("b"))
    carry_prev = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.max_by(F.col("b._last"), F.col(f"b.{_PID}")).alias("_carry_prev"))
    )
    carry_next = (
        a.join(b, F.col(f"b.{_PID}") > F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.min_by(F.col("b._first"), F.col(f"b.{_PID}")).alias("_carry_next"))
    )
    carry = carry_prev.join(carry_next, _PID)
    wp = (
        Window.partitionBy(_PID)
        .orderBy(*_cols(order_cols))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # following-side neighbor = preceding-side neighbor under the
    # reversed sort: an incremental O(n) frame instead of the O(n^2)
    # UnboundedFollowing frame (see docstring)
    wn = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_payload = F.when(F.col(flag_col), payload)
    out = (
        part.join(F.broadcast(carry), _PID)
        .withColumn(
            "_prev_p",
            F.coalesce(
                F.last(local_payload, ignorenulls=True).over(wp),
                F.col("_carry_prev"),
            ),
        )
        .withColumn(
            "_next_p",
            F.coalesce(
                F.last(local_payload, ignorenulls=True).over(wn),
                F.col("_carry_next"),
            ),
        )
    )
    for c in payload_cols:
        out = out.withColumn(f"_prev_{c}", F.col("_prev_p")[c]).withColumn(
            f"_next_{c}", F.col("_next_p")[c]
        )
    return out.drop(_PID, "_carry_prev", "_carry_next", "_prev_p", "_next_p")
