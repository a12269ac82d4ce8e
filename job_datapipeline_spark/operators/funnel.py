"""Ordered-funnel analysis: how far does each user get through a required
event sequence (view -> click -> purchase), steps in order, each at or
after the previous one?

This is the match_recognize / CEP-shaped question relational engines lack
a native operator for. The common array answer — collect each user's
events, sort, regex over the symbol string — materializes per-user event
arrays, which a hot user at 100 TB turns into a memory hazard. This
implementation stays fully relational:

    step 1: min(ts) over the step-1 events per user
    step i: join step-(i-1) anchors, keep step-i events with
            ts >= anchor, min(ts) per user

Each stage is filter -> shuffle-join on the user key -> hash aggregate,
all map-side-combinable; state per user is ONE timestamp per step. The
event filter prunes to each step's type before any shuffle, so the joined
volumes are step-sized, not corpus-sized. k steps cost k small join+agg
stages over shrinking frames (the funnel property: each stage's output is
a subset of the previous).

Semantics: anchors are EARLIEST-qualifying (ts >= previous anchor, equal
timestamps allowed) — the standard unbounded strict-order funnel. A user
appears iff they completed step 1; ``reached`` counts completed steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel anchors: columns ``user_col``, ``t1..tk`` (earliest
    qualifying timestamp per step, null once the chain breaks), and
    ``reached`` (number of completed steps, >= 1)."""
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps (got {steps})")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur
    for i, step in enumerate(steps[1:], start=2):
        prev_t = f"t{i - 1}"
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(cur.select(user_col, prev_t), user_col)
            .filter(F.col("_ts") >= F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        out = out.join(nxt.select(user_col, f"t{i}"), user_col, "left")
        cur = nxt
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = reached + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.withColumn("reached", reached.cast("int"))
