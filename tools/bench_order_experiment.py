"""Controlled bench-order experiment for the r10 watch pair (r10 verdict
item 1): ``agg_exact_median_mad`` and ``agg_winsorized_mean`` ran
~1.2-1.3x above their r9 records in BOTH r10 idle runs.  The r10 paired
A/B exonerated the ranks-guard code change (old code was equally
elevated); the named remaining suspect is the bench-ORDER change from
the r10 window rebuild — in r10 order the pair runs immediately after
the two INDEX-WRITING ANN queries (ann_ivf_index_roundtrip,
streaming_ann_index_ingest), which leave real side effects in the
session (parquet writes, a drained file stream, checkpoint dirs,
JVM/GC pressure).

Design: ONE session, idle host, ALTERNATING blocks so a co-tenant host
phase hits both conditions equally —

  ISO  block: run the pair directly (r9-like neighborhood: no
              index-writing query in front).
  POST block: run both index-writing ANN queries (untimed), then the
              pair (timed) — the exact r10 adjacency.

3 blocks per condition (ISO POST ISO POST ISO POST), min-of-block
per condition per query.  Verdict logic:
  - POST_min >> ISO_min  -> the order effect is real; fix bench to
    isolate index-writer side effects.
  - POST_min ~= ISO_min  -> the adjacency is innocent; compare ISO_min
    to the r9 records (2.49 s / 1.34 s): within ~1.1x closes the item
    as host phase, above it the residual is code- or data-side and
    needs a new hypothesis.

Usage: python tools/bench_order_experiment.py [sf_dir] [blocks_per_cond]
Writes the record to stdout as one JSON line (append it to
SCALE_GROWTH.md with the spin probes).
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

PAIR = ("agg_exact_median_mad", "agg_winsorized_mean")
WRITERS = ("ann_ivf_index_roundtrip", "streaming_ann_index_ingest")
R9_RECORD = {"agg_exact_median_mad": 2.49, "agg_winsorized_mean": 1.34}


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
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    load1 = round(os.getloadavg()[0], 2)
    spin_start = _spin_probe()
    spark = get_spark("bench_order_exp")

    # untimed warmups: session startup + first-run codegen for every
    # query either condition touches (bench's min-of-2 warms these too,
    # so warmed numbers are the comparable ones)
    REGISTRY["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in PAIR + WRITERS:
        _run(spark, sf_dir, name)

    samples: dict[str, dict[str, list[float]]] = {
        n: {"iso": [], "post": []} for n in PAIR
    }
    for b in range(blocks * 2):
        cond = "iso" if b % 2 == 0 else "post"
        if cond == "post":
            for w in WRITERS:
                _run(spark, sf_dir, w)  # untimed side-effect inducers
        for n in PAIR:
            samples[n][cond].append(_run(spark, sf_dir, n))

    spin_end = _spin_probe()
    out = {
        "experiment": "bench_order_watch_pair",
        "sf_dir": sf_dir,
        "blocks_per_condition": blocks,
        "load1_start": load1,
        "spin_probe_start": spin_start,
        "spin_probe_end": spin_end,
        "samples": samples,
        "min": {
            n: {c: min(v) for c, v in conds.items()}
            for n, conds in samples.items()
        },
        "r9_record": R9_RECORD,
        "post_over_iso": {
            n: round(min(samples[n]["post"]) / min(samples[n]["iso"]), 3)
            for n in PAIR
        },
        "iso_over_r9": {
            n: round(min(samples[n]["iso"]) / R9_RECORD[n], 3) for n in PAIR
        },
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
