"""Round-12 adjudication of the r11 watch movers (r11 verdict item 4):
``corpus_decontaminate_semantic`` (1.63 -> 2.75 s) and
``text_bm25_search`` (0.78 -> 1.23 s) moved >1s between the r10 and r11
idle records with NO code change to either (neither was in the r11
changed lane).  Both sat inside the general ~1.14x host-phase elevation
band of that record pair; this harness settles band-vs-regression with
the controlled method (one session, spin-probed, min-of-3 at similar
spin), per the closure criterion the r10 watch pair used:

  - min-of-3 <= ~1.15x of the r10 record  -> host band, close.
  - above that at good spin               -> regression; name the cause
                                             in SCALE_GROWTH.md.

Usage: python tools/bench_mover_adjudication.py [sf_dir] [runs]
Prints one JSON line (append to SCALE_GROWTH.md with the spin probes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_datapipeline_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    ensure_registry_order,
)
from job_datapipeline_spark.session import get_spark  # noqa: E402

MOVERS = ("corpus_decontaminate_semantic", "text_bm25_search")
R10_RECORD = {"corpus_decontaminate_semantic": 1.63, "text_bm25_search": 0.78}
R11_RECORD = {"corpus_decontaminate_semantic": 2.75, "text_bm25_search": 1.23}


def _spin_probe() -> float:
    t0 = time.time()
    x = 0
    for _ in range(20_000_000):
        x += 1
    return round(time.time() - t0, 3)


def _run(spark, sf_dir: str, name: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ensure_registry_order()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    load1 = round(os.getloadavg()[0], 2)
    spin_start = _spin_probe()
    spark = get_spark("bench_mover_adj")

    # untimed warmups (session startup + first-run codegen; bench's
    # min-of-2 warms these too, so warmed numbers are the comparable ones)
    REGISTRY["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for n in MOVERS:
        _run(spark, sf_dir, n)

    samples = {n: [_run(spark, sf_dir, n) for _ in range(runs)] for n in MOVERS}
    spin_end = _spin_probe()
    out = {
        "experiment": "r11_watch_mover_adjudication",
        "sf_dir": sf_dir,
        "runs": runs,
        "load1_start": load1,
        "spin_probe_start": spin_start,
        "spin_probe_end": spin_end,
        "samples": samples,
        "min": {n: min(v) for n, v in samples.items()},
        "r10_record": R10_RECORD,
        "r11_record": R11_RECORD,
        "min_over_r10": {n: round(min(samples[n]) / R10_RECORD[n], 3) for n in MOVERS},
        "min_over_r11": {n: round(min(samples[n]) / R11_RECORD[n], 3) for n in MOVERS},
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
