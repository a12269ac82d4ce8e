"""Growth datapoints for the round-5 eighth-batch operators.

Measures, at sf0.01 vs sf0.1 (10x documents/events/orders):

- ml_calibration_ece: bucket frame (fixed-width bins, <= 11) vs corpus.
- events_markov_transitions: transition frame (event-type^2, fixed 25)
  vs raw events.
- orders_rfm_segmentation: customer frame (the only windowed input) vs
  fact rows.
- orders_cohort_ltv: cohort x month cells (calendar-bounded) vs fact
  rows.

Usage: python tools/scale_growth_round5h.py
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


def main() -> None:
    spark = get_spark("scale-growth-r5h")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_docs = table(spark, sf_dir, "documents").count()
        n_events = table(spark, sf_dir, "events").count()
        n_orders = table(spark, sf_dir, "orders").count()

        df = REGISTRY["ml_calibration_ece"].fn(spark, sf_dir)
        t0 = time.time()
        n_buckets = df.count()
        w = time.time() - t0
        print(
            f"| {sf} | ml_calibration_ece | bucket frame vs corpus | "
            f"{n_buckets} / {n_docs} | {w:.2f} |"
        )

        df = REGISTRY["events_markov_transitions"].fn(spark, sf_dir)
        t0 = time.time()
        n_trans = df.count()
        w = time.time() - t0
        print(
            f"| {sf} | events_markov_transitions | transition frame vs "
            f"events | {n_trans} / {n_events} | {w:.2f} |"
        )

        n_cust = (
            table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
        )
        df = REGISTRY["orders_rfm_segmentation"].fn(spark, sf_dir)
        t0 = time.time()
        n_segs = df.count()
        w = time.time() - t0
        print(
            f"| {sf} | orders_rfm_segmentation | windowed frame (custs) "
            f"-> segments vs fact | {n_cust} -> {n_segs} / {n_orders} "
            f"| {w:.2f} |"
        )

        df = REGISTRY["orders_cohort_ltv"].fn(spark, sf_dir)
        t0 = time.time()
        n_cells = df.count()
        w = time.time() - t0
        print(
            f"| {sf} | orders_cohort_ltv | matrix cells vs fact rows | "
            f"{n_cells} / {n_orders} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
