"""Growth datapoints for the round-5 sixth-batch operators.

Measures, at sf0.01 vs sf0.1 (10x events/orders/lineitem):

- events_cusum_drift: series-frame size (hours x types — pinned by the
  time span) vs raw events, plus wall.
- graph_triangle_clustering: edges and triangles vs raw events — the
  sparse-regime claim (the cohort graph grows with co-purchase
  density, not event volume), plus wall.
- join_bloom_prefilter: prefilter pass-through fraction at both scales
  (the fixture filter saturates at 10x build keys by design — the
  documented sizing regime), plus wall.
- orders_market_basket: pair frame (bounded by brand-vocabulary^2) vs
  basket count, plus wall.

Usage: python tools/scale_growth_round5f.py
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


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5f")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_events = table(spark, sf_dir, "events").count()

        cusum = REGISTRY["events_cusum_drift"].fn(spark, sf_dir)
        t0 = time.time()
        rows = cusum.collect()
        w = time.time() - t0
        n_hours = sum(r["n_hours"] for r in rows)
        print(
            f"| {sf} | events_cusum_drift | series frame vs raw events | "
            f"{n_hours} / {n_events} | {w:.2f} |"
        )

        tri = REGISTRY["graph_triangle_clustering"].fn(spark, sf_dir)
        t0 = time.time()
        [trow] = tri.collect()
        w = time.time() - t0
        print(
            f"| {sf} | graph_triangle_clustering | edges / triangles vs "
            f"events | {trow['n_edges']} / {trow['n_triangles']} vs "
            f"{n_events} | {w:.2f} |"
        )

        pre = REGISTRY["join_bloom_prefilter"].fn(spark, sf_dir)
        t0 = time.time()
        [prow] = pre.collect()
        w = time.time() - t0
        print(
            f"| {sf} | join_bloom_prefilter | pass-through | "
            f"{prow['orders_after_prefilter']} / {prow['orders_total']} "
            f"(true {prow['true_join_rows']}) | {w:.2f} |"
        )

        mb = REGISTRY["orders_market_basket"].fn(spark, sf_dir)
        n_baskets = (
            table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
        )
        w = _noop(mb)
        print(
            f"| {sf} | orders_market_basket | pair frame bound vs baskets "
            f"| <= 300 pairs / {n_baskets} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
