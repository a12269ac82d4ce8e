"""sf1 scale-ladder: run the expensive relational/event queries at 10x the
bench scale (sf0.1 -> ~sf1: 6M lineitem rows, 150k orders x 10, 1M events)
and record wall-time ratios.

Purpose (VERDICT r3 item 5): the bench runs at sf0.1; the 10x/20x planted-
corpus harness (tools/scale_growth.py) covers the DOCUMENT suite above
that scale, but the TPC-H/event-suite queries had no datapoint above
sf0.1. A query whose plan is linear at sf0.1 can still go super-linear at
sf1 if a broadcast flips to shuffle at the 10 MB threshold, AQE re-plans
a skew join, or a window partition grows past spill size. This tool
catches exactly those flips: every copy of the scaled data is a disjoint
"parallel universe" (keys shifted by copy_index * key_stride), so join
selectivities, group counts per key, and window partition sizes are
IDENTICAL to sf0.1 — the only thing that grows is volume. Ideal behavior
is therefore wall-time growth <= ~10x (sub-linear where fixed overhead
amortizes); anything >> 10x flags a plan flip worth reading.

Scaling recipe: dims (customer/supplier/part) and facts (orders/lineitem/
events) are each replicated FACTOR times with all keys shifted by
copy * stride, foreign keys shifted consistently (orders reference the
copy's customers, lineitem the copy's orders/parts/suppliers, events the
copy's users). nation/region stay fixed (25/5 rows, as in real TPC-H
scaling). documents/embeddings are NOT scaled here — the planted-corpus
harness already measures that suite at up to 27x the bench corpus with
controlled duplicate rates (naive replication would plant quadratic
near-dup clusters and measure the generator, not the operator).

Run:  python tools/scale_ladder.py [factor] [out_dir]
      (defaults: factor=10, out_dir=/tmp/sparkgraft_ladder)
Paste the JSON into SCALE_GROWTH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

# 15 most expensive non-document queries (BENCH_FULL.json ordering),
# chosen to cover every distinct shuffle pattern: wide multi-joins,
# window-over-key, iterative graph, stateful streaming, as-of join,
# approx aggregates, top-k.
LADDER_QUERIES = [
    "pricing_summary",
    "tpch_shipping_priority",
    "tpch_market_share",
    "tpch_waiting_suppliers",
    "tpch_supplier_part_counts",
    "graph_pagerank_bipartite",
    "streaming_sessionize_stateful",
    "events_sliding_windows",
    "events_windowed_topk",
    "events_scd2_islands",
    "events_anomaly_zscore",
    "join_asof_order_event",
    "topk_orders_per_customer",
    "agg_percentiles_approx",
    "join_salted_skew",
    # round-5 final-wave heavies: the two candidate-generating operators
    # (customer-sampled CF pairs; grid-cell NN candidates), the
    # corpus-sized exact-rank baseline, and the 3-pass EM
    "recsys_item_item_cf",
    "geo_nearest_supplier",
    "ml_feature_scaling",
    "ml_em_gaussian_mixture",
]


def build_scaled(spark, out_dir: str, factor: int) -> None:
    """Write the scaled star schema to out_dir (wiped first)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def stride(df, col):
        return df.agg((F.max(col) + 1).alias("m")).head()[0]

    cust = table(spark, BASE_SF, "customer")
    supp = table(spark, BASE_SF, "supplier")
    part = table(spark, BASE_SF, "part")
    orders = table(spark, BASE_SF, "orders")
    li = table(spark, BASE_SF, "lineitem")
    ev = table(spark, BASE_SF, "events")
    c_s, s_s, p_s = stride(cust, "c_custkey"), stride(supp, "s_suppkey"), stride(part, "p_partkey")
    o_s = stride(orders, "o_orderkey")
    e_s = stride(ev, "event_id")
    u_s = stride(ev, "user_id")

    copies = spark.range(factor).select(F.col("id").alias("_copy"))

    def scaled(df, shifts: dict[str, int]):
        out = df.crossJoin(F.broadcast(copies))
        for col, st in shifts.items():
            out = out.withColumn(col, (F.col(col) + F.col("_copy") * F.lit(st)).cast("long"))
        return out.drop("_copy")

    scaled(cust, {"c_custkey": c_s}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet"))
    scaled(supp, {"s_suppkey": s_s}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "supplier.parquet"))
    scaled(part, {"p_partkey": p_s}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet"))
    scaled(orders, {"o_orderkey": o_s, "o_custkey": c_s}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet"))
    scaled(li, {"l_orderkey": o_s, "l_partkey": p_s, "l_suppkey": s_s}).write.mode(
        "overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    scaled(ev, {"event_id": e_s, "user_id": u_s}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet"))
    # nation/region fixed-size dims; documents/embeddings covered by the
    # planted-corpus harness — copy originals so any incidental read works.
    for t in ("nation", "region", "documents", "embeddings"):
        src = os.path.join(BASE_SF, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        shutil.copyfile(src, dst)


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in LADDER_QUERIES:
        fn = REGISTRY[name].fn
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 2)
        print(f"  {name}: {times[name]}s ({n} rows)", file=sys.stderr)
    return times


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_ladder"
    spark = get_spark("scale-ladder")
    t0 = time.time()
    build_scaled(spark, out_dir, factor)
    build_sec = round(time.time() - t0, 1)
    print(f"scaled x{factor} data built in {build_sec}s", file=sys.stderr)
    base = run_suite(spark, BASE_SF)
    big = run_suite(spark, out_dir)
    out = {
        "factor": factor,
        "base_sf": BASE_SF,
        "build_sec": build_sec,
        "base_sec": base,
        "scaled_sec": big,
        "growth": {
            k: round(big[k] / max(base[k], 0.01), 2) for k in LADDER_QUERIES
        },
    }
    print(json.dumps(out, indent=1))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
