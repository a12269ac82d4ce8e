"""Growth datapoints for the round-5 third-batch operators.

Measures, at sf0.01 vs sf0.1 (10x the relational tables):

- join_size_estimate: the histogram-only estimate cost vs the cost of
  actually executing the join it predicts — including a deliberately
  explosive self-join (lineitem on l_partkey) where the estimate's
  whole value is refusing the blowup before paying for it.
- pareto_frontier: the running-min window's input frame (distinct
  prices) vs table rows — the distributive-form claim.
- snapshot_diff: wall growth (one checkpointed scan + one full-outer
  join — expected ~linear).
- text_rrf_fusion: wall growth (candidate filter grows with the corpus,
  both ranked frames stay top-N — expected sub-linear).

Usage: python tools/scale_growth_round5c.py
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


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5c")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]

        # -- join-size estimate: histogram cost vs executed-join cost --
        li = table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("k")
        )
        hist = li.groupBy("k").agg(F.count("*").alias("c"))
        est = hist.agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("predicted")
        )
        w_est = _noop(est)
        predicted = est.collect()[0]["predicted"]
        a = li.alias("a")
        b = table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("k")
        ).alias("b")
        blown = a.join(b, F.col("a.k") == F.col("b.k")).agg(
            F.count("*").alias("n")
        )
        t0 = time.time()
        actual = blown.collect()[0]["n"]
        w_join = time.time() - t0
        assert actual == predicted, (actual, predicted)
        print(
            f"| {sf} | join_size_estimate | self-join blowup predicted "
            f"(=actual) | {predicted} rows | est {w_est:.2f} vs join "
            f"{w_join:.2f} |"
        )

        # -- pareto: window frame (distinct prices) vs table rows --
        part = table(spark, sf_dir, "part")
        n_rows = part.count()
        n_prices = (
            part.select(
                F.round(F.col("p_retailprice") * 100).cast("bigint")
            ).distinct().count()
        )
        w = _noop(REGISTRY["pareto_frontier"].fn(spark, sf_dir))
        print(
            f"| {sf} | pareto_frontier | window frame vs table | "
            f"{n_prices} prices / {n_rows} parts | {w:.2f} |"
        )

        # -- snapshot diff / RRF: wall only --
        for name in ("snapshot_diff", "text_rrf_fusion"):
            w = _noop(REGISTRY[name].fn(spark, sf_dir))
            print(f"| {sf} | {name} | wall | — | {w:.2f} |")


if __name__ == "__main__":
    main()
