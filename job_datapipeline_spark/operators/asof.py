"""As-of (temporal) join: for each left row, the single nearest right row
per key — at-or-before (backward), at-or-after (forward), or whichever is
closer (nearest), optionally within a tolerance.

Spark has no native ASOF JOIN operator; a naive range join
(``l.key == r.key AND r.ts <= l.ts`` + top-1) explodes to O(|matches|)
intermediate rows before pruning. This implementation uses the
union-and-carry form instead:

    union(left-tagged, right-tagged)
      -> window last/first(right payload struct) over (key ORDER BY ts, side)
      -> keep left rows

One shuffle on the key (the same shuffle a plain join would pay), state is
one carried struct per key inside the sort — no pair blow-up at any skew.
This is the standard shape for "enrich each event with the most recent
dimension version" (slowly-changing dims, price-as-of-trade), and the
forward/nearest forms cover next-maintenance-after-failure and
closest-sensor-reading alignment.

Semantics (matching pandas ``merge_asof`` and SQL ASOF JOIN):
- backward: latest right row with ``r.ts <= l.ts`` (equal ts visible);
- forward: earliest right row with ``r.ts >= l.ts`` (equal ts visible);
- nearest: the closer of the backward match and the STRICTLY-after forward
  match; exact ties in distance prefer backward (pandas tie rule). An
  equal-ts right row has distance zero via the backward arm, so nothing is
  lost by the strict forward arm — and both arms share ONE sort order,
  so nearest still costs a single shuffle + sort;
- ``tolerance`` (a SQL interval/arith expression over the ts type, e.g.
  ``"interval 30 days"``) nulls out matches farther than the bound —
  applied per arm before the nearest comparison;
- the payload rides in ONE struct, so all payload columns always come from
  the same matched right row even when some of its fields are null;
- among equal-ts right rows, backward picks the largest ``right_order``,
  forward the smallest — pass a unique column (event id) to make the pick
  total-order deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: str | None = None,
    direction: str = "backward",
    tolerance: str | Column | None = None,
) -> DataFrame:
    """Left as-of join: left columns + ``payload_cols`` from the matched
    right row (nulls when no row matches within direction/tolerance)."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS} (got {direction!r})")
    tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance

    lcols = left.columns
    # matched right ts travels inside the struct: tolerance and nearest
    # need the distance to the row the payload actually came from
    payload = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col(right_ts).alias("_mts"),
    )
    ptype = right.select(payload.alias("_p")).schema[0].dataType

    # side ordering encodes equal-ts visibility: the looking side must sort
    # so the equal-ts right row falls inside its frame
    l_side, r_side = (0, 1) if direction == "forward" else (1, 0)
    l = left.select(
        F.col(key_left).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast("bigint").alias("_rord"),
        F.lit(None).cast(ptype).alias("_p"),
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(key_right).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        (F.col(right_order) if right_order else F.lit(0)).cast("bigint").alias("_rord"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_rord").asc()]
    w_back = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward arm = backward arm over the REVERSED sort: Spark's
    # UnboundedPreceding frame updates incrementally (O(n) per key) while
    # an UnboundedFollowing frame recomputes its aggregate for every row
    # (O(n^2) per key — pathological on hot keys).  last() over this
    # reversed inclusive frame == first() over (currentRow,
    # unboundedFollowing) on the forward sort.
    rev = [F.col("_ts").desc(), F.col("_side").desc(), F.col("_rord").desc()]
    w_fwd = (
        Window.partitionBy("_k").orderBy(*rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def within_tol(m: Column, dist: Column) -> Column:
        if tol is None:
            return m
        return F.when(m.isNotNull() & (dist <= tol), m)

    base = l.unionByName(r)
    if direction == "backward":
        m = F.last("_p", ignorenulls=True).over(w_back)
        carried = base.select("*", within_tol(m, F.col("_ts") - m["_mts"]).alias("_asof"))
    elif direction == "forward":
        m = F.last("_p", ignorenulls=True).over(w_fwd)
        carried = base.select("*", within_tol(m, m["_mts"] - F.col("_ts")).alias("_asof"))
    else:  # nearest: both arms over the SAME sort (right-before-left at
        # equal ts), so the forward arm is strictly-after — distance-0
        # matches arrive via the backward arm
        mb = F.last("_p", ignorenulls=True).over(w_back)
        mf = F.last("_p", ignorenulls=True).over(w_fwd)
        b = within_tol(mb, F.col("_ts") - mb["_mts"])
        f = within_tol(mf, mf["_mts"] - F.col("_ts"))
        carried = base.select("*", b.alias("_b"), f.alias("_f"))
        db = F.col("_ts") - F.col("_b._mts")
        df = F.col("_f._mts") - F.col("_ts")
        pick = (
            F.when(F.col("_b").isNotNull() & (F.col("_f").isNull() | (db <= df)), F.col("_b"))
            .otherwise(F.col("_f"))
        )
        carried = carried.select("*", pick.alias("_asof"))
    return carried.filter(F.col("_side") == F.lit(l_side)).select(
        *lcols, *[F.col(f"_asof.{c}").alias(c) for c in payload_cols]
    )
