"""Growth datapoints for the round-5 tenth-batch operators.

Measures, at sf0.01 vs sf0.1 (10x events/lineitem/orders):

- events_new_user_growth: day-spine output (calendar-pinned) vs events.
- agg_weighted_median: (group, value) cumsum frame vs raw rows.
- orders_interpurchase_gaps: (segment, gap-value) frame vs orders.
- events_bot_detection: verdict frame (users) vs events, plus wall.

Usage: python tools/scale_growth_round5j.py
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


def main() -> None:
    spark = get_spark("scale-growth-r5j")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_events = table(spark, sf_dir, "events").count()
        n_li = table(spark, sf_dir, "lineitem").count()
        n_orders = table(spark, sf_dir, "orders").count()

        df = REGISTRY["events_new_user_growth"].fn(spark, sf_dir)
        t0 = time.time()
        n_days = df.count()
        w = time.time() - t0
        print(
            f"| {sf} | events_new_user_growth | day spine vs events | "
            f"{n_days} / {n_events} | {w:.2f} |"
        )

        frame = (
            table(spark, sf_dir, "lineitem")
            .select(
                "l_returnflag",
                F.round(F.col("l_extendedprice") * 100).cast("bigint"),
            )
            .distinct()
            .count()
        )
        df = REGISTRY["agg_weighted_median"].fn(spark, sf_dir)
        t0 = time.time()
        df.collect()
        w = time.time() - t0
        print(
            f"| {sf} | agg_weighted_median | cumsum frame vs raw rows | "
            f"{frame} / {n_li} | {w:.2f} |"
        )

        gap_frame = (
            REGISTRY["orders_interpurchase_gaps"].fn(spark, sf_dir)
        )
        t0 = time.time()
        gap_frame.collect()
        w = time.time() - t0
        print(
            f"| {sf} | orders_interpurchase_gaps | segment report vs "
            f"orders | 5 rows / {n_orders} | {w:.2f} |"
        )

        df = REGISTRY["events_bot_detection"].fn(spark, sf_dir)
        t0 = time.time()
        [row] = df.collect()
        w = time.time() - t0
        print(
            f"| {sf} | events_bot_detection | verdict frame (users) vs "
            f"events | {row['n_users']} / {n_events} (bots "
            f"{row['n_bots']}) | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
