"""Round-13 ladder for the exchanges r12 kept on structural grounds with
locally neutral (or negative) bench measurements — the r12 verdict's
"ladder-or-revert" item. Each target isolates EXACTLY the exchange being
judged, on synthetic data whose input is coalesce(1)'d first to reproduce
the one-split-scan shape the real queries read (single parquet file, one
row group), and A/Bs with-exchange vs without at 1x / 10x / 100x.

Targets and the query each stands for:
- simhash_fanout      dedup_simhash_pairs: fan_out before the per-shingle
                      md5 bit-vote (operators/dedup.simhash_pairs)
- shingle_fanout      dedup_containment_pairs: fan_out before the
                      tokenize/3-gram/frequency-order shingle-array build
- dpp_write_cluster   layout_dpp_prune: repartition("order_month") before
                      the month-partitioned fact write
- cells_write_cluster ANN index family: repartition("cell") before the
                      cell-partitioned cells write

Hypothesis under test: the exchange is redundant-but-narrow at bench
scale (the input fits one task) and pays for itself as per-row compute
or per-file write cost grows — i.e. the A/B ratio should grow with the
ladder step. A flat-or-inverted ladder means revert.

Usage: python tools/scale_growth_round13.py [target ...]
Prints one JSON line per target (append to SCALE_GROWTH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import job_datapipeline_spark.plans.queries  # noqa: E402,F401  (registry import side effects)
from job_datapipeline_spark.functions.scale import fan_out  # noqa: E402
from job_datapipeline_spark.operators import dedup as _D  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

STEPS = (1, 10, 100)
BASE_DOCS = 2_000
BASE_ROWS = 150_000


def _spin() -> float:
    t0 = time.time()
    x = 0
    for _ in range(20_000_000):
        x += 1
    return round(time.time() - t0, 3)


def _synth_docs(spark, n: int):
    """Deterministic synthetic corpus: ~30-token docs from md5 material,
    written single-file so the scan is one task (the testdata shape)."""
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda i: F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))),
                1,
                6,
            ),
        ),
        " ",
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), words.alias("text"))


def _single_file(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _time(fn, reps=2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_simhash(spark, scratch):
    out = {}
    for step in STEPS:
        docs = _single_file(_synth_docs(spark, BASE_DOCS * step), f"{scratch}/sim_{step}")
        without = _time(lambda: _noop(_D.simhash_pairs(docs, bits=32, bands=8, max_hamming=6, shingle_n=3)))
        with_ = _time(lambda: _noop(_D.simhash_pairs(fan_out(docs, "doc_id"), bits=32, bands=8, max_hamming=6, shingle_n=3)))
        out[f"{step}x"] = {"without": without, "with": with_, "speedup": round(without / with_, 2)}
    return out


def run_shingle(spark, scratch):
    out = {}
    for step in STEPS:
        docs = _single_file(_synth_docs(spark, BASE_DOCS * step), f"{scratch}/shg_{step}")
        without = _time(lambda: _noop(_D.shingle_string_arrays(docs)))
        with_ = _time(lambda: _noop(_D.shingle_string_arrays(fan_out(docs, "doc_id"))))
        out[f"{step}x"] = {"without": without, "with": with_, "speedup": round(without / with_, 2)}
    return out


def run_dpp_write(spark, scratch):
    out = {}
    for step in STEPS:
        n = BASE_ROWS * step
        fact = spark.range(n).select(
            F.col("id").alias("k"),
            F.date_format(
                F.date_add(F.lit("1992-01-01").cast("date"), F.pmod(F.col("id"), F.lit(2400)).cast("int")),
                "yyyy-MM",
            ).alias("order_month"),
            (F.col("id") % 1000 / 10.0).alias("price"),
        )
        src = _single_file(fact, f"{scratch}/dppsrc_{step}")

        def write(clustered, dst):
            d = src.repartition("order_month") if clustered else src
            d.write.mode("overwrite").partitionBy("order_month").parquet(dst)

        without = _time(lambda: write(False, f"{scratch}/dpp_n_{step}"))
        with_ = _time(lambda: write(True, f"{scratch}/dpp_c_{step}"))
        nf = {}
        for tag, dst in (("without", f"{scratch}/dpp_n_{step}"), ("with", f"{scratch}/dpp_c_{step}")):
            nf[tag] = sum(
                len([f for f in fs if f.endswith(".parquet")]) for _, _, fs in os.walk(dst)
            )
        out[f"{step}x"] = {
            "without": without, "with": with_, "speedup": round(without / with_, 2),
            "files_without": nf["without"], "files_with": nf["with"],
        }
    return out


def run_cells_write(spark, scratch):
    out = {}
    for step in STEPS:
        n = BASE_DOCS * step
        vec = F.transform(F.sequence(F.lit(1), F.lit(64)), lambda i: (F.pmod(F.col("id") * i, F.lit(997)) / 997.0))
        assigned = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("cell"),
            vec.alias("embedding"),
        )
        src = _single_file(assigned, f"{scratch}/cellsrc_{step}")

        def write(clustered, dst):
            d = src.repartition("cell") if clustered else src
            d.write.mode("overwrite").partitionBy("cell").parquet(dst)

        without = _time(lambda: write(False, f"{scratch}/cells_n_{step}"))
        with_ = _time(lambda: write(True, f"{scratch}/cells_c_{step}"))
        nf = {}
        for tag, dst in (("without", f"{scratch}/cells_n_{step}"), ("with", f"{scratch}/cells_c_{step}")):
            nf[tag] = sum(
                len([f for f in fs if f.endswith(".parquet")]) for _, _, fs in os.walk(dst)
            )
        out[f"{step}x"] = {
            "without": without, "with": with_, "speedup": round(without / with_, 2),
            "files_without": nf["without"], "files_with": nf["with"],
        }
    return out


TARGETS = {
    "simhash_fanout": run_simhash,
    "shingle_fanout": run_shingle,
    "dpp_write_cluster": run_dpp_write,
    "cells_write_cluster": run_cells_write,
}


def main() -> None:
    names = sys.argv[1:] or list(TARGETS)
    unknown = [n for n in names if n not in TARGETS]
    if unknown:
        raise SystemExit(f"unknown targets: {unknown} (choose from {list(TARGETS)})")
    spark = get_spark("scale-ladder-r13")
    import tempfile

    scratch = tempfile.mkdtemp(prefix="ladder_r13_")
    spin0 = _spin()
    for name in names:
        res = TARGETS[name](spark, scratch)
        print(
            json.dumps(
                {
                    "experiment": f"r13_ladder_{name}",
                    "spin_probe_start": spin0,
                    "spin_probe_now": _spin(),
                    "steps": res,
                },
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
