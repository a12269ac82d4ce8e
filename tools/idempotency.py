"""Double-run determinism sweep: every registered query executed TWICE in
ONE SparkSession, results compared exactly.

What this catches that the oracle gate cannot: session-state leaks between
invocations (temp views, UDTF/datasource registrations, conf mutations a
query forgets to restore), non-idempotent fixture writers (a sink query
appending into a reused directory), and partitioning-dependent values that
happen to differ run-to-run (first-seen group representatives, unstable
collect_list orders) — each would make the same fn() return different rows
on its second call.

Usage: python tools/idempotency.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _normalize(pdf):
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .astype(str)
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("idempotency-sweep")
    failures = 0
    executed = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        executed += 1
        t0 = time.time()
        try:
            a = _normalize(q.fn(spark, sf_dir).toPandas())
            b = _normalize(q.fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        if list(a.columns) != list(b.columns) or len(a) != len(b) or not a.equals(b):
            failures += 1
            print(f"FAIL {name}: run1 != run2 "
                  f"(rows {len(a)} vs {len(b)}) [{time.time()-t0:.1f}s]")
        else:
            print(f"OK   {name} rows={len(a)} [{time.time()-t0:.1f}s]")
    print(
        f"\n{'STABLE' if failures == 0 else f'{failures} UNSTABLE'} over "
        f"{executed} executed queries ({len(REGISTRY)} registered)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
