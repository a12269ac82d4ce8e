"""As-of (temporal) join: for each left row, the single latest right row at
or before the left row's timestamp, per key.

Spark has no native ASOF JOIN operator; a naive range join
(``l.key == r.key AND r.ts <= l.ts`` + top-1) explodes to O(|matches|)
intermediate rows before pruning. This implementation uses the
union-and-carry-forward form instead:

    union(left-tagged, right-tagged)
      -> window last(right payload struct) over (key ORDER BY ts, side)
      -> keep left rows

One shuffle on the key (the same shuffle a plain join would pay), state is
one carried struct per key inside the sort — no pair blow-up at any skew.
This is the standard shape for "enrich each event with the most recent
dimension version" (slowly-changing dims, price-as-of-trade).

Semantics:
- a right row with ts EQUAL to the left ts is visible (<=, matching SQL
  ASOF JOIN; the left side sorts after the right side at equal ts);
- the payload rides in ONE struct, so all payload columns always come from
  the same matched right row even when some of its fields are null;
- among equal-(ts) right rows the largest ``right_order`` wins — pass a
  unique column (event id) to make the pick total-order deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """Left as-of join: left columns + ``payload_cols`` from the latest
    right row with ``right_ts <= left_ts`` on the same key (nulls when no
    such row exists)."""
    lcols = left.columns
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    ptype = right.select(payload.alias("_p")).schema[0].dataType

    l = left.select(
        F.col(key_left).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts (<= visibility)
        F.lit(None).cast("bigint").alias("_rord"),
        F.lit(None).cast(ptype).alias("_p"),
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(key_right).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(right_order) if right_order else F.lit(0)).cast("bigint").alias("_rord"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*", F.last("_p", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_asof.{c}").alias(c) for c in payload_cols]
    )
