"""Growth datapoints for the round-5 twenty-sixth batch.

Measures, at sf0.01 vs sf0.1:

- events_forecast_backtest: calendar frame (same as the forecaster).
- orders_discount_lift: the ~11-band discount domain.
- orders_littles_law: the calendar spine (same as the sweep).

Usage: python tools/scale_growth_round5zz.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5zz")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_events = table(spark, sf_dir, "events").count()
        n_li = table(spark, sf_dir, "lineitem").count()

        n_t, w = _timed_count(
            REGISTRY["events_forecast_backtest"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | events_forecast_backtest | type frame vs events | "
            f"{n_t} / {n_events} | {w:.2f} |"
        )

        n_b, w = _timed_count(REGISTRY["orders_discount_lift"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_discount_lift | discount bands vs line items | "
            f"{n_b} / {n_li} | {w:.2f} |"
        )

        n_m, w = _timed_count(REGISTRY["orders_littles_law"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_littles_law | month frame vs intervals | "
            f"{n_m} / {n_li} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
