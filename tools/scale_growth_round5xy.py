"""Growth datapoints for the round-5 twenty-fourth and twenty-fifth
batches.

Measures, at sf0.01 vs sf0.1:

- ml_em_gaussian_mixture: k bounded passes over the fact; wall should
  track the scan, parameters stay a 1-row frame.
- orders_bridge_decomposition: nation frame vs the two filtered years.
- ml_feature_store_build: customer-dim output vs orders (includes the
  materializing write + read-back).

Usage: python tools/scale_growth_round5xy.py
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
    spark = get_spark("scale-growth-r5xy")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_orders = table(spark, sf_dir, "orders").count()
        n_cust = table(spark, sf_dir, "customer").count()

        t0 = time.time()
        n_it, w = _timed_count(
            REGISTRY["ml_em_gaussian_mixture"].fn(spark, sf_dir)
        )
        build = time.time() - t0
        print(
            f"| {sf} | ml_em_gaussian_mixture | 3 bounded passes vs orders | "
            f"{n_it} iterations / {n_orders} | {build:.2f} |"
        )

        n_b, w = _timed_count(
            REGISTRY["orders_bridge_decomposition"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | orders_bridge_decomposition | nation frame vs orders | "
            f"{n_b} / {n_orders} | {w:.2f} |"
        )

        n_f, w = _timed_count(REGISTRY["ml_feature_store_build"].fn(spark, sf_dir))
        print(
            f"| {sf} | ml_feature_store_build | customer dim out vs orders "
            f"(incl. write) | {n_f} / {n_orders} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
