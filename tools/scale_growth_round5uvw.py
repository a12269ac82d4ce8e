"""Growth datapoints for the round-5 twenty-first to twenty-third
batches.

Measures, at sf0.01 vs sf0.1:

- orders_price_waterfall: brand frame vs line items.
- supplier_scorecard: supplier dim frame vs line items.
- events_attribution_models: model x channel frame vs events (one
  user shuffle serves both window passes).
- ops_backfill_planner: hole list vs orders (includes the partitioned
  write it audits).
- embedding_isotropy_report: label x dim frame vs vectors.
- events_rle_paths: distinct journeys vs events.
- layout_bucketed_join: the headline — shuffle exchanges planned by
  the bucketed join (0) vs the unbucketed twin (2) at BOTH scales,
  plus wall including the two bucketed writes.

Usage: python tools/scale_growth_round5uvw.py
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
    spark = get_spark("scale-growth-r5uvw")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_orders = table(spark, sf_dir, "orders").count()
        n_li = table(spark, sf_dir, "lineitem").count()
        n_events = table(spark, sf_dir, "events").count()
        n_vecs = table(spark, sf_dir, "embeddings").count()

        n_b, w = _timed_count(REGISTRY["orders_price_waterfall"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_price_waterfall | brand frame vs line items | "
            f"{n_b} / {n_li} | {w:.2f} |"
        )

        n_s, w = _timed_count(REGISTRY["supplier_scorecard"].fn(spark, sf_dir))
        print(
            f"| {sf} | supplier_scorecard | top-k of supplier dim vs line "
            f"items | {n_s} / {n_li} | {w:.2f} |"
        )

        n_a, w = _timed_count(
            REGISTRY["events_attribution_models"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | events_attribution_models | model x channel frame vs "
            f"events | {n_a} / {n_events} | {w:.2f} |"
        )

        n_p, w = _timed_count(REGISTRY["ops_backfill_planner"].fn(spark, sf_dir))
        print(
            f"| {sf} | ops_backfill_planner | holes found vs orders (incl. "
            f"write) | {n_p} / {n_orders} | {w:.2f} |"
        )

        n_i, w = _timed_count(
            REGISTRY["embedding_isotropy_report"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | embedding_isotropy_report | label frame vs vectors | "
            f"{n_i} / {n_vecs} | {w:.2f} |"
        )

        n_r, w = _timed_count(REGISTRY["events_rle_paths"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_rle_paths | top journeys vs events | "
            f"{n_r} / {n_events} | {w:.2f} |"
        )

        df = REGISTRY["layout_bucketed_join"].fn(spark, sf_dir)
        t0 = time.time()
        rows = df.collect()
        w = time.time() - t0
        shuffles = rows[0]["join_shuffle_exchanges"]
        print(
            f"| {sf} | layout_bucketed_join | join shuffle exchanges "
            f"(bucketed vs unbucketed=2) | {shuffles} / 2, {n_li} lines "
            f"| {w:.2f} |"
        )


if __name__ == "__main__":
    main()
