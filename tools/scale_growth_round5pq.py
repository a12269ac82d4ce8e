"""Growth datapoints for the round-5 sixteenth and seventeenth batches.

Measures, at sf0.01 vs sf0.1:

- ann_mmr_diverse_topk: the fold state is pool^2 = 144 sims at ANY
  corpus size; what grows is the relevance pass (vectors scanned).
- orders_duplicate_invoices: blocked candidate pairs (same cust, same
  amount band) vs the naive |orders|^2.
- part_reorder_rate: (part, customer) pair frame vs line items.
- events_holt_forecast: calendar day frame, like the EWMA.
- graph_kcore_peel: edge-frame trajectory across peel rounds.
- orders_theil_sen_trend: calendar-bounded pair frame (months^2/2 per
  nation) — scale-INVARIANT by construction.

Usage: python tools/scale_growth_round5pq.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.llm_round5p import (  # noqa: E402
    _DUPINV_BAND,
    _MMR_POOL,
)
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5pq")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_orders = table(spark, sf_dir, "orders").count()
        n_li = table(spark, sf_dir, "lineitem").count()
        n_vecs = table(spark, sf_dir, "embeddings").count()
        n_events = table(spark, sf_dir, "events").count()

        _n, w = _timed_count(REGISTRY["ann_mmr_diverse_topk"].fn(spark, sf_dir))
        print(
            f"| {sf} | ann_mmr_diverse_topk | fold state (pool^2) vs vectors "
            f"| {_MMR_POOL * _MMR_POOL} / {n_vecs} | {w:.2f} |"
        )

        blocked = (
            table(spark, sf_dir, "orders")
            .groupBy(
                "o_custkey",
                F.floor(F.round("o_totalprice") / _DUPINV_BAND),
            )
            .agg(F.count("*").alias("k"))
            .agg(F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("c"))
            .collect()[0]["c"]
        )
        n_d, w = _timed_count(
            REGISTRY["orders_duplicate_invoices"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | orders_duplicate_invoices | blocked pairs vs naive "
            f"| {int(blocked)} / {n_orders * (n_orders - 1) // 2} -> {n_d} "
            f"flagged | {w:.2f} |"
        )

        n_b, w = _timed_count(REGISTRY["part_reorder_rate"].fn(spark, sf_dir))
        print(
            f"| {sf} | part_reorder_rate | brand frame vs line items | "
            f"{n_b} / {n_li} | {w:.2f} |"
        )

        n_h, w = _timed_count(REGISTRY["events_holt_forecast"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_holt_forecast | day frame vs events | "
            f"{n_h} rows / {n_events} | {w:.2f} |"
        )

        n_k, w = _timed_count(REGISTRY["graph_kcore_peel"].fn(spark, sf_dir))
        print(
            f"| {sf} | graph_kcore_peel | peel trajectory vs line items | "
            f"{n_k} rounds / {n_li} | {w:.2f} |"
        )

        n_t, w = _timed_count(REGISTRY["orders_theil_sen_trend"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_theil_sen_trend | nations (pair frame "
            f"months^2/2) vs orders | {n_t} / {n_orders} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
