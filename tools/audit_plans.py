"""Plan auditor: compile every registered query and flag physical-plan
shapes that won't survive a 100x scale-up.

Flags raised:
- CartesianProduct           (unintentional cross join)
- high exchange count        (> EXCHANGE_BUDGET shuffles; queries allowed
                              past the budget carry a PINNED max count in
                              job_datapipeline_spark/plan_pins.py — one
                              exchange above the pin is an unexplained
                              flag, so plan regressions fail loudly
                              instead of hiding behind old prose)
- row-at-a-time Python UDFs  (BatchEvalPython; Arrow stages are fine)
- repeated fact scans        (the same parquet table scanned >= 3 times in
                              one plan: Spark does not CSE identical
                              subplans, so a frame consumed N times
                              recomputes N times unless localCheckpoint'd
                              or caught by runtime ReusedExchange)
- single-partition windows   (WindowExec fed by Exchange SinglePartition:
                              an unpartitioned Window.orderBy moves EVERY
                              row to one task.  Allowed only over frames
                              bounded by a calendar/grid/domain — see
                              plan_pins.BOUNDED_GLOBAL_WINDOWS; unbounded
                              frames must use operators/ranks)

The allowlists live in job_datapipeline_spark/plan_pins.py and are ALSO
asserted by tests/test_scale_shapes.py::test_pinned_exchange_counts_hold,
so this report and the pytest gate can never drift apart.

Filter pushdown and column pruning are asserted per-query in
tests/test_scale_shapes.py — a text heuristic here can't tell a
non-pushable computed-column filter from a missed pushdown.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Exit code 0 always — this is a report, not a gate; the gate is the
pytest assertion over the same pins.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.plan_pins import (  # noqa: E402
    BOUNDED_GLOBAL_WINDOWS,
    EXCHANGE_BUDGET,
    KNOWN,
)
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402
from job_datapipeline_spark.testing import (  # noqa: E402
    single_partition_windows_in_plan,
)


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
        pin, reason = KNOWN.get(name, (None, None))
        unexplained = []
        explained = []
        notes = []
        spw = single_partition_windows_in_plan(plan)
        if spw:
            issue = f"{len(spw)} single-partition window(s) over unbounded frame"
            if name in BOUNDED_GLOBAL_WINDOWS:
                notes.append(f"bounded frame: {BOUNDED_GLOBAL_WINDOWS[name]}")
            else:
                unexplained.append(issue)
        if "CartesianProduct" in plan:
            (explained if reason else unexplained).append("CartesianProduct")
        if "BatchEvalPython" in plan:
            (explained if reason else unexplained).append(
                "row-at-a-time Python UDF"
            )
        n_ex = plan.count("Exchange")
        if n_ex > EXCHANGE_BUDGET:
            if pin is not None and n_ex <= pin:
                explained.append(f"{n_ex} exchanges (pinned <= {pin})")
                if n_ex < pin:
                    notes.append(
                        f"exchange count {n_ex} DROPPED below pin {pin} — "
                        "refresh the pin in plan_pins.py"
                    )
            elif pin is not None:
                unexplained.append(
                    f"{n_ex} exchanges EXCEEDS pin {pin} — plan regression"
                )
            else:
                unexplained.append(f"{n_ex} exchanges (no pin)")
        scans = Counter(re.findall(r"file:[^\]]*?/(\w+)\.parquet", plan))
        rescans = {t: n for t, n in scans.items() if n >= 3}
        if rescans:
            (explained if reason else unexplained).append(
                "repeated scans: "
                + ", ".join(f"{t}x{n}" for t, n in sorted(rescans.items()))
            )
        if unexplained:
            note = f"  [known: {reason}]" if reason else ""
            print(f"FLAG {name}: {', '.join(unexplained + explained)}{note}")
            flagged += 1
        elif explained:
            print(f"OKPIN {name}: {', '.join(explained)}  [{reason}]")
            for n in notes:
                print(f"NOTE {name}: {n}")
        elif notes:
            print(f"NOTE {name}: {'; '.join(notes)}")
    print(f"\n{flagged} unexplained flags over {len(only) or len(REGISTRY)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
