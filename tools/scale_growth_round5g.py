"""Growth datapoints for the round-5 seventh-batch operators.

Measures, at sf0.01 vs sf0.1 (10x customer/documents):

- scd2_apply_changes: output rows vs dimension rows (dim + delta-sized
  extras, linear by construction) plus wall.
- corpus_quality_ablation_report: wall only (one scan, 4-row report at
  any scale).
- corpus_psi_drift: shared-vocabulary bin count vs total tokens — the
  bounded-frame claim — plus wall.

Usage: python tools/scale_growth_round5g.py
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


def main() -> None:
    spark = get_spark("scale-growth-r5g")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]

        n_dim = table(spark, sf_dir, "customer").count()
        df = REGISTRY["scd2_apply_changes"].fn(spark, sf_dir)
        t0 = time.time()
        n_out = df.count()
        w = time.time() - t0
        print(
            f"| {sf} | scd2_apply_changes | output vs dim rows | "
            f"{n_out} / {n_dim} | {w:.2f} |"
        )

        df = REGISTRY["corpus_quality_ablation_report"].fn(spark, sf_dir)
        t0 = time.time()
        df.collect()
        w = time.time() - t0
        print(
            f"| {sf} | corpus_quality_ablation_report | report rows | 4 "
            f"| {w:.2f} |"
        )

        docs = table(spark, sf_dir, "documents")
        n_toks = docs.select(
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n")
        ).agg(F.sum("n")).collect()[0][0]
        df = REGISTRY["corpus_psi_drift"].fn(spark, sf_dir)
        t0 = time.time()
        [row] = df.collect()
        w = time.time() - t0
        print(
            f"| {sf} | corpus_psi_drift | shared-vocab bins vs tokens | "
            f"{row['n_bins']} / {n_toks} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
