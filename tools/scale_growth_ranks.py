"""Scale-growth measurement for operators/ranks.global_cumsum: the
two-pass partials+offsets form vs the single-partition window it
replaced, at 1x / 10x planted row counts.

The single-partition window sorts AND windows every row in one task; the
two-pass form range-partitions, runs P parallel partitioned windows, and
broadcasts a P-row offset table.  On local[32] the win shows up once the
frame outgrows one core's sort+scan appetite; at cluster scale the
single-partition form is not slower — it is a straight OOM/stall, which
is why docs/SCALING.md calls it an anti-pattern.

Usage: python tools/scale_growth_ranks.py
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

from job_datapipeline_spark.operators.ranks import global_cumsum  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def build(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            # non-monotone sort key so the range shuffle really moves rows
            ((F.col("id") * 2654435761) % 1000003).alias("key"),
            ((F.col("id") * 7) % 97 + 1).alias("v"),
        )
        .localCheckpoint()
    )


def run(df, form: str) -> None:
    if form == "two_pass":
        out = global_cumsum(df, ["key", "k"], "v", out_col="cum")
    else:
        w = Window.orderBy("key", "k").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = df.withColumn("cum", F.sum("v").over(w).cast("long"))
    out.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("scale-growth-ranks")
    sizes = [200_000, 2_000_000]
    for n in sizes:
        df = build(spark, n)
        run(df, "two_pass")  # warm
        for form in ("single_partition_window", "two_pass"):
            samples = []
            for _ in range(3):
                t0 = time.time()
                run(df, form)
                samples.append(time.time() - t0)
            print(
                json.dumps(
                    {
                        "op": "global_cumsum",
                        "rows": n,
                        "form": form,
                        "sec": round(min(samples), 3),
                    }
                )
            )
        df.unpersist()


if __name__ == "__main__":
    main()
