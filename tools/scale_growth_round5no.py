"""Growth datapoints for the round-5 fourteenth and fifteenth batches.

Measures, at sf0.01 vs sf0.1 (10x orders/lineitem; 10x docs only at
sf0.1):

- geo_nearest_supplier: CANDIDATE PAIRS after the 3x3 cell prefilter
  vs the |probes| x |suppliers| cross-join a naive plan would pay —
  the grid device's whole value is this ratio staying tiny as both
  sides grow.
- agg_ks_test / agg_mann_whitney: value-domain frame (the only sort)
  vs raw rows.
- agg_trimmed_mean: per-group rank window rows (= raw rows, the exact
  baseline) — the documented sketch escalation is the scale path.
- text_rake_keyphrases: phrase/occurrence frames vs documents.
- layout_zorder_tiles: fixed 256-tile frame vs orders.
- audit_scan_provenance: partition frame vs orders (plus one write).
- compaction_bin_packing: partition x month fold frame vs orders.

Usage: python tools/scale_growth_round5no.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.llm_round5n import _GEO_CELL_DEG  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5no")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        n_orders = table(spark, sf_dir, "orders").count()
        n_docs = table(spark, sf_dir, "documents").count()
        n_supp = table(spark, sf_dir, "supplier").count()

        # candidate pairs surviving the 3x3 cell prefilter vs naive
        cell = _GEO_CELL_DEG * 1_000_000.0
        cust = (
            table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") % 10 == 0)
            .select(
                (
                    ((F.col("c_custkey") * 7919) % 16000).cast("bigint") * 10_000
                    - 80_000_000
                ).alias("lat"),
                (
                    ((F.col("c_custkey") * 104729) % 36000).cast("bigint")
                    * 10_000
                    - 180_000_000
                ).alias("lon"),
            )
        )
        n_probe = cust.count()
        supp = table(spark, sf_dir, "supplier").select(
            (
                ((F.col("s_suppkey") * 6151) % 16000).cast("bigint") * 10_000
                - 80_000_000
            ).alias("slat"),
            (
                ((F.col("s_suppkey") * 3571) % 36000).cast("bigint") * 10_000
                - 180_000_000
            ).alias("slon"),
        )
        ring = spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx long, dy long",
        )
        probe = cust.crossJoin(F.broadcast(ring)).select(
            (F.floor(F.col("lat") / cell).cast("bigint") + F.col("dx")).alias(
                "cx"
            ),
            (F.floor(F.col("lon") / cell).cast("bigint") + F.col("dy")).alias(
                "cy"
            ),
        )
        scell = supp.select(
            F.floor(F.col("slat") / cell).cast("bigint").alias("cx"),
            F.floor(F.col("slon") / cell).cast("bigint").alias("cy"),
        )
        n_cand = probe.join(scell, ["cx", "cy"]).count()
        _n, w = _timed_count(REGISTRY["geo_nearest_supplier"].fn(spark, sf_dir))
        print(
            f"| {sf} | geo_nearest_supplier | grid candidates vs naive "
            f"cross | {n_cand} / {n_probe * n_supp} | {w:.2f} |"
        )

        vals = (
            table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
            .select(F.round(F.col("o_totalprice") * 100))
            .distinct()
            .count()
        )
        _n, w = _timed_count(REGISTRY["agg_ks_test"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_ks_test | value domain vs orders | "
            f"{vals} / {n_orders} | {w:.2f} |"
        )
        _n, w = _timed_count(REGISTRY["agg_mann_whitney"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_mann_whitney | value domain vs orders | "
            f"{vals} / {n_orders} | {w:.2f} |"
        )

        n_g, w = _timed_count(REGISTRY["agg_trimmed_mean"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_trimmed_mean | groups (exact-rank baseline) | "
            f"{n_g} groups | {w:.2f} |"
        )

        n_k, w = _timed_count(REGISTRY["text_rake_keyphrases"].fn(spark, sf_dir))
        print(
            f"| {sf} | text_rake_keyphrases | docs in -> keyphrases out | "
            f"{n_docs} -> {n_k} | {w:.2f} |"
        )

        n_t, w = _timed_count(REGISTRY["layout_zorder_tiles"].fn(spark, sf_dir))
        print(
            f"| {sf} | layout_zorder_tiles | tile frame vs orders | "
            f"{n_t} / {n_orders} | {w:.2f} |"
        )

        n_p, w = _timed_count(REGISTRY["audit_scan_provenance"].fn(spark, sf_dir))
        print(
            f"| {sf} | audit_scan_provenance | partitions vs orders "
            f"(incl. write) | {n_p} / {n_orders} | {w:.2f} |"
        )

        n_b, w = _timed_count(REGISTRY["compaction_bin_packing"].fn(spark, sf_dir))
        print(
            f"| {sf} | compaction_bin_packing | fold frame vs orders | "
            f"{n_b} / {n_orders} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
