"""Time a subset of registry queries (min-of-N noop-sink runs) and
optionally dump .explain("formatted") per query.

Usage: python tools/bench_subset.py [--sf DIR] [--runs N] [--explain DIR] q1 q2 ...

The measurement methodology matches bench.py (noop sink, min-of-N,
untimed warmup) so numbers are comparable to BENCH_FULL.json entries.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.plans.queries import REGISTRY, ensure_registry_order  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

ensure_registry_order()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    explain_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    t0 = time.time()
    x = 0
    for _ in range(20_000_000):
        x += 1
    print(f"spin_probe {round(time.time() - t0, 3)}s (fast phase ~0.85)", flush=True)

    spark = get_spark("bench-subset")
    # warmup, untimed
    REGISTRY["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                q.fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench-subset:{name}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        if not samples:
            continue
        out[name] = min(samples)
        print(f"{min(samples):8.3f}  {name}  (runs: {samples})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
