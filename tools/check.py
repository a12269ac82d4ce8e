"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet tables and reports diffs (see job_datapipeline_spark.testing).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402
from job_datapipeline_spark.testing import compare, duck_con  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duck_con(sf_dir)
    failures = 0
    executed = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        executed += 1
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name} rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print(
        f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} over "
        f"{executed} executed queries ({len(REGISTRY)} registered)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
