"""Plan auditor: compile every registered query and flag physical-plan
shapes that won't survive a 100x scale-up.

Flags raised:
- CartesianProduct           (unintentional cross join)
- high exchange count        (> EXCHANGE_BUDGET shuffles; repeated-subtree
                              plans rely on runtime ReusedExchange — listed
                              so the reliance stays a decision, not an
                              accident)
- row-at-a-time Python UDFs  (BatchEvalPython; Arrow stages are fine)

Filter pushdown and column pruning are asserted per-query in
tests/test_scale_shapes.py — a text heuristic here can't tell a
non-pushable computed-column filter from a missed pushdown.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Exit code 0 always — this is a report, not a gate; the gate is the
allowlist in tests/test_scale_shapes.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

EXCHANGE_BUDGET = 8

# Queries whose flagged shape is understood and documented where it arises.
KNOWN = {
    "join_full_outer_nation_stats": "full outer join cannot broadcast; SMJ is correct",
    "setops_segments": "three set operations = three distinct shuffles each",
    "dedup_near_composed": "repeated candidate subtree collapses via ReusedExchange "
                           "at runtime (see operators/dedup.py near_dedup docstring)",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("audit-plans")
    flagged = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            flagged += 1
            continue
        issues = []
        if "CartesianProduct" in plan:
            issues.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            issues.append("row-at-a-time Python UDF")
        n_ex = plan.count("Exchange")
        if n_ex > EXCHANGE_BUDGET:
            issues.append(f"{n_ex} exchanges")
        if issues:
            note = f"  [known: {KNOWN[name]}]" if name in KNOWN else ""
            print(f"FLAG {name}: {', '.join(issues)}{note}")
            if name not in KNOWN:
                flagged += 1
    print(f"\n{flagged} unexplained flags over {len(only) or len(REGISTRY)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
