"""Bounded-state growth datapoints for the round-5 sketch operators.

The scale claim for agg_bloom_membership and agg_countmin_frequency is
that their STATE is bounded by the sketch parameters, independent of
input size — that is what makes a 1000-executor rollup a fixed-width
reduce. This harness measures state rows and wall at sf0.01 and sf0.1
(10x build-side growth) so the claim is a datapoint, not an assertion.

Usage: python tools/scale_growth_sketch.py
Appends nothing; prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402  (must initialize the plans package before importing a submodule)
from job_datapipeline_spark.plans.llm_round5b import (  # noqa: E402
    _BLOOM_K,
    _BLOOM_M,
    _CMS_D,
    _CMS_W,
    _bloom_bit_col,
)
from job_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("scale-growth-sketch")
    print(f"| sf | op | input rows | state rows | state bound | wall s |")
    print(f"|---|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        # Bloom: build keys vs distinct set bits (bounded by m).
        build = (
            table(spark, sf_dir, "orders")
            .select(F.col("o_custkey").cast("string").alias("key"))
            .distinct()
        )
        n_build = build.count()
        bits = build.select(
            F.explode(
                F.array(
                    *[_bloom_bit_col(F.col("key"), j) for j in range(_BLOOM_K)]
                )
            ).alias("bit")
        ).distinct()
        t0 = time.time()
        n_bits = bits.count()
        REGISTRY["agg_bloom_membership"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = time.time() - t0
        print(
            f"| {sf} | bloom | {n_build} keys | {n_bits} set bits "
            f"| m={_BLOOM_M} | {wall:.2f} |"
        )
        # Count-min: token occurrences vs occupied cells (bounded by d*w).
        toks = (
            table(spark, sf_dir, "documents")
            .select(
                F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
            )
            .filter(F.col("tok") != "")
        )
        n_toks = toks.count()
        t0 = time.time()
        # occupied cells = distinct (j, col) pairs the registered plan fills
        from job_datapipeline_spark.plans.llm_round5b import (
            agg_countmin_frequency,  # noqa: F401  (registered fn reused below)
        )

        REGISTRY["agg_countmin_frequency"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = time.time() - t0
        tok_counts = toks.groupBy("tok").count()
        n_cells = (
            tok_counts.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(j).alias("j"),
                                (
                                    F.conv(
                                        F.substring(
                                            F.md5(
                                                F.concat(
                                                    F.col("tok"), F.lit(f":{j}")
                                                )
                                            ),
                                            1,
                                            15,
                                        ),
                                        16,
                                        10,
                                    ).cast("bigint")
                                    % _CMS_W
                                ).alias("col"),
                            )
                            for j in range(_CMS_D)
                        ]
                    )
                ).alias("cell")
            )
            .select("cell.j", "cell.col")
            .distinct()
            .count()
        )
        print(
            f"| {sf} | count-min | {n_toks} token occurrences | {n_cells} "
            f"occupied cells | d*w={_CMS_D * _CMS_W} | {wall:.2f} |"
        )


if __name__ == "__main__":
    main()
