"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query wall seconds.

Execution is forced with the noop sink (full computation, zero collect/IO
cost on the result side), after one untimed warmup query to exclude JVM/
session startup from per-query numbers. Each query runs twice and reports
the MIN — round-over-round deltas then reflect plan changes, not JIT/page-
cache jitter.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    # warmup: spin up executors / codegen paths, untimed
    REGISTRY["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    per_query: dict[str, float] = {}
    for name, q in REGISTRY.items():
        samples = []
        for _ in range(runs):
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        per_query[name] = round(min(samples), 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
