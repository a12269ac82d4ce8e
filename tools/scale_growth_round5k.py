"""Growth datapoints for the round-5 eleventh-batch operators.

Measures, at sf0.01 vs sf0.1 (10x lineitem/events/orders):

- orders_open_interval_sweep: date-domain delta frame vs intervals.
- agg_mode_exact: (group, value) frame vs raw rows.
- events_error_rate_slo: day spine vs events.
- orders_seasonality_index: calendar frames (12 months) vs orders.

Usage: python tools/scale_growth_round5k.py
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


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5k")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        li = table(spark, sf_dir, "lineitem")
        n_li = li.count()
        n_events = table(spark, sf_dir, "events").count()
        n_orders = table(spark, sf_dir, "orders").count()

        n_days = (
            li.select(F.col("l_shipdate").cast("date")).distinct().count()
        )
        n_months, w = _timed_count(
            REGISTRY["orders_open_interval_sweep"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | orders_open_interval_sweep | date domain -> months "
            f"vs intervals | ~{n_days} days -> {n_months} months / {n_li} "
            f"| {w:.2f} |"
        )

        n_vals = (
            li.select("l_returnflag", F.round("l_quantity")).distinct().count()
        )
        _n, w = _timed_count(REGISTRY["agg_mode_exact"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_mode_exact | value frame vs raw rows | "
            f"{n_vals} / {n_li} | {w:.2f} |"
        )

        n_d, w = _timed_count(REGISTRY["events_error_rate_slo"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_error_rate_slo | day spine vs events | "
            f"{n_d} / {n_events} | {w:.2f} |"
        )

        n_m, w = _timed_count(
            REGISTRY["orders_seasonality_index"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | orders_seasonality_index | calendar frame vs orders "
            f"| {n_m} / {n_orders} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
