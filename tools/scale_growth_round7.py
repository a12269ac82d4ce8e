"""Scale-growth measurements for the round-7 primitives:

1. operators/ranks.global_cummin (exclusive running min) vs the
   single-partition window it replaced, at 1x / 10x / 100x rows — the
   pareto_frontier escalation path.
2. Misra-Gries mapInPandas summaries vs the exact token groupBy they
   replace at vocabulary scale, at 1x / 10x planted token counts — the
   point is bounded memory and map-side-only work, but the wall clock
   should also stay ~linear.

Usage: python tools/scale_growth_round7.py
Prints one JSON line per (rows, form) with wall seconds (min of 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.operators.ranks import global_cummin  # noqa: E402
from job_datapipeline_spark.plans.llm_round7c import _mg_summaries  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def build_vals(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % 1000003).alias("key"),
            ((F.col("id") * 7) % 997 + 1).alias("v"),
        )
        .localCheckpoint()
    )


def run_cummin(df, form: str) -> None:
    if form == "two_pass":
        out = global_cummin(df, ["key", "k"], "v", out_col="m", exclusive=True)
    else:
        w = Window.orderBy("key", "k").rowsBetween(Window.unboundedPreceding, -1)
        out = df.withColumn("m", F.min("v").over(w))
    out.write.format("noop").mode("overwrite").save()


def build_tokens(spark, n: int):
    # Zipf-ish skew: token id = n mod a square-law bucket so a handful of
    # tokens carry a large share, like stopwords do
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit("t"),
                (
                    (F.col("id") * 2654435761) % 1000003 % (F.col("id") % 317 + 1)
                ).cast("string"),
            ).alias("tok")
        )
        .localCheckpoint()
    )


def run_mg(df, form: str) -> None:
    if form == "mg_sketch":
        out = (
            df.mapInPandas(_mg_summaries, "tok string, est long")
            .groupBy("tok")
            .agg(F.sum("est").alias("est"))
        )
    else:
        out = df.groupBy("tok").agg(F.count("*").alias("c"))
    out.write.format("noop").mode("overwrite").save()


def bench(tag: str, build_fn, run_fn, sizes, forms) -> None:
    spark = get_spark("scale-growth-r7")
    for n in sizes:
        df = build_fn(spark, n)
        for form in forms:
            best = min(
                _timed(run_fn, df, form) for _ in range(3)
            )
            print(
                json.dumps(
                    {"bench": tag, "rows": n, "form": form, "sec": round(best, 3)}
                ),
                flush=True,
            )


def _timed(run_fn, df, form: str) -> float:
    t0 = time.time()
    run_fn(df, form)
    return time.time() - t0


def main() -> None:
    bench(
        "global_cummin",
        build_vals,
        run_cummin,
        [200_000, 2_000_000, 20_000_000],
        ["single_partition_window", "two_pass"],
    )
    bench(
        "misra_gries",
        build_tokens,
        run_mg,
        [1_000_000, 10_000_000],
        ["exact_groupby", "mg_sketch"],
    )


if __name__ == "__main__":
    main()
