"""Growth datapoints for the round-5 ninth-batch operators.

Measures, at sf0.01 vs sf0.1 (10x events/lineitem/documents):

- events_active_users: (day, user) distinct frame vs raw events — the
  frame every distinct window reads.
- orders_abc_classification: part frame (the only sorted input) vs
  fact rows.
- events_session_window_native: sessions found vs raw events plus wall
  (one user shuffle).
- text_readability_scores: wall (pure map-side).

Usage: python tools/scale_growth_round5i.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5i")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        ev = table(spark, sf_dir, "events")
        n_events = ev.count()

        frame = ev.select(F.col("ts").cast("date"), "user_id").distinct().count()
        w = _noop(REGISTRY["events_active_users"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_active_users | (day,user) frame vs events | "
            f"{frame} / {n_events} | {w:.2f} |"
        )

        li = table(spark, sf_dir, "lineitem")
        n_rows = li.count()
        n_parts = li.select("l_partkey").distinct().count()
        w = _noop(REGISTRY["orders_abc_classification"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_abc_classification | sorted frame (parts) vs "
            f"fact | {n_parts} / {n_rows} | {w:.2f} |"
        )

        df = REGISTRY["events_session_window_native"].fn(spark, sf_dir)
        t0 = time.time()
        n_sessions = df.agg(F.sum("n_sessions")).collect()[0][0]
        w = time.time() - t0
        print(
            f"| {sf} | events_session_window_native | sessions vs events | "
            f"{n_sessions} / {n_events} | {w:.2f} |"
        )

        w = _noop(REGISTRY["text_readability_scores"].fn(spark, sf_dir))
        print(
            f"| {sf} | text_readability_scores | map-side wall | — | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
