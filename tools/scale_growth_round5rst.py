"""Growth datapoints for the round-5 eighteenth-twentieth batches.

Measures, at sf0.01 vs sf0.1:

- ml_feature_scaling: output = input rows — the exact eCDF is the
  deliberate corpus-sized baseline (sketch escalation documented).
- events_twap_daily / orders_seasonal_anomaly /
  orders_cycle_time_trend: calendar frames vs raw rows.
- orders_aging_buckets / orders_abc_xyz_matrix: fixed report frames.
- recsys_item_item_cf: sampled+capped candidate pairs vs the naive
  |parts|^2 space.
- causal_matched_cohort: one covariate sort over customers.
- mart_star_schema_build: rollup frame vs orders (includes two
  parquet writes + read-backs).

Usage: python tools/scale_growth_round5rst.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.llm_round5s import (  # noqa: E402
    _CF_HOT_CAP,
    _CF_SAMPLE_MOD,
)
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5rst")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_orders = table(spark, sf_dir, "orders").count()
        n_li = table(spark, sf_dir, "lineitem").count()
        n_cust = table(spark, sf_dir, "customer").count()
        n_events = table(spark, sf_dir, "events").count()
        n_parts = table(spark, sf_dir, "part").count()

        n_r, w = _timed_count(REGISTRY["ml_feature_scaling"].fn(spark, sf_dir))
        print(
            f"| {sf} | ml_feature_scaling | output rows (exact eCDF "
            f"baseline) | {n_r} / {n_li} | {w:.2f} |"
        )

        n_d, w = _timed_count(REGISTRY["events_twap_daily"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_twap_daily | day frame vs events | "
            f"{n_d} / {n_events} | {w:.2f} |"
        )

        n_b, w = _timed_count(REGISTRY["orders_aging_buckets"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_aging_buckets | bucket frame vs orders | "
            f"{n_b} / {n_orders} | {w:.2f} |"
        )

        # candidate pairs after sampling + cap
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        cp = (
            li.join(
                o.filter(F.col("o_custkey") % _CF_SAMPLE_MOD == 0),
                li.l_orderkey == o.o_orderkey,
            )
            .select("o_custkey", "l_partkey")
            .distinct()
        )
        cand = (
            cp.groupBy("o_custkey")
            .agg(F.count("*").alias("k"))
            .filter(F.col("k") <= _CF_HOT_CAP)
            .agg(F.sum(F.col("k") * (F.col("k") - 1)).alias("c"))
            .collect()[0]["c"]
        )
        n_cf, w = _timed_count(REGISTRY["recsys_item_item_cf"].fn(spark, sf_dir))
        print(
            f"| {sf} | recsys_item_item_cf | sampled+capped pairs vs naive "
            f"parts^2 | {int(cand)} / {n_parts * n_parts} -> {n_cf} ranked "
            f"| {w:.2f} |"
        )

        n_m, w = _timed_count(REGISTRY["orders_abc_xyz_matrix"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_abc_xyz_matrix | matrix cells vs line items | "
            f"{n_m} / {n_li} | {w:.2f} |"
        )

        n_a, w = _timed_count(
            REGISTRY["orders_seasonal_anomaly"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | orders_seasonal_anomaly | flagged days (calendar "
            f"frame) vs orders | {n_a} / {n_orders} | {w:.2f} |"
        )

        _n, w = _timed_count(REGISTRY["causal_matched_cohort"].fn(spark, sf_dir))
        print(
            f"| {sf} | causal_matched_cohort | one covariate sort vs "
            f"customers | 1 row / {n_cust} | {w:.2f} |"
        )

        n_s, w = _timed_count(
            REGISTRY["mart_star_schema_build"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | mart_star_schema_build | rollup frame vs orders "
            f"(incl. 2 writes) | {n_s} / {n_orders} | {w:.2f} |"
        )

        n_c, w = _timed_count(
            REGISTRY["orders_cycle_time_trend"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | orders_cycle_time_trend | month frame vs line items | "
            f"{n_c} / {n_li} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
