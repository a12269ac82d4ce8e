"""Scale-growth measurements for the round-11 TRAINED-quantizer
persistent IVF index (ann_ivf_trained_index /
operators/similarity.ivf_index_write_frame):

1. "Training is write-time-only" — one Lloyd step (broadcast-argmin
   assignment + a 64-avg hash aggregate) measured separately from the
   index write at 1x and 10x corpus: both ~linear, both paid once.

2. "Nothing on the probe path changes" — probe of a fixed query set
   against the TRAINED 1x and 10x index: growth must track probed-cell
   rows exactly as the r10 fixed-id ladder measured, because the probe
   code path is byte-identical (it reads whatever quantizer was
   persisted).

3. "Re-training is a rare event that rewrites one small table plus one
   corpus pass" — a second Lloyd step + re-write at 10x, compared to
   the first: ~equal cost, no dependence on the existing index (the
   old cells are never read).

Vectors are xxhash64-mixed per (id, dim) — deterministic, no RNG at
plan time, no accidental structure (the r9 linear-recipe lesson).

Usage: python tools/scale_growth_round11.py
Prints one JSON line per datapoint with wall seconds (min of 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.operators.similarity import (  # noqa: E402
    ivf_assign,
    ivf_index_probe,
    ivf_index_write_frame,
)
from job_datapipeline_spark.session import get_spark  # noqa: E402

N_BASE = 20_000  # 1x corpus vectors
N_QUERIES = 10
DIM = 64
N_SEEDS = 8


def build_vectors(spark, n: int, id_offset: int = 0):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(2000)).cast("double")
            / 1000.0
            - 1.0
        ),
    )
    return (
        spark.range(n)
        .select((F.col("id") + id_offset).alias("vec_id"))
        .select("vec_id", vec.alias("embedding"))
        .localCheckpoint()
    )


def lloyd_step(corpus, seeds):
    """One Lloyd iteration: broadcast-argmin assignment + 64-avg hash
    aggregate, rounded 6dp — the ann_ivf_trained_index training stage."""
    a1 = ivf_assign(
        corpus.select("vec_id", F.col("embedding").alias("_v")), seeds, "vec_id", 1
    )
    return (
        a1.groupBy("cell")
        .agg(
            *[
                F.round(F.avg(F.col("_v")[i].cast("double")), 6).alias(f"_c{i}")
                for i in range(DIM)
            ]
        )
        .select(
            F.col("cell").alias("cid"),
            F.array(*[f"_c{i}" for i in range(DIM)]).alias("cent"),
        )
    )


def timed(label: str, fn, runs: int = 2) -> float:
    best = float("inf")
    out = None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({"step": label, "wall_s": round(best, 2), "result": out}))
    return best


def main() -> None:
    mults = tuple(int(a) for a in sys.argv[1:]) or (1, 10)
    spark = get_spark("scale_growth_r11", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="r11_growth_")
    queries = build_vectors(spark, N_QUERIES, id_offset=10_000_000).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    try:
        for mult in mults:
            n = N_BASE * mult
            corpus = build_vectors(spark, n)
            seeds = corpus.filter(F.col("vec_id") < N_SEEDS).select(
                F.col("vec_id").alias("cid"), F.col("embedding").alias("_cent")
            )
            path = os.path.join(root, f"idx_{mult}x")

            # 1. training alone (Lloyd step materialized to a tiny frame)
            timed(
                f"train_lloyd_{mult}x",
                lambda: lloyd_step(corpus, seeds).localCheckpoint().count(),
            )
            trained = lloyd_step(corpus, seeds).localCheckpoint()

            # 2. index write from the trained frame (assign + partitioned
            #    parquet — the write-time cost training adds nothing to
            #    beyond the tiny centroid table)
            timed(
                f"index_write_frame_{mult}x",
                lambda: ivf_index_write_frame(corpus, path, trained),
            )

            # 3. probe the trained index (fixed query set, nprobe=2)
            timed(
                f"probe_trained_{mult}x",
                lambda: ivf_index_probe(
                    spark, path, queries, k=5, nprobe=2
                ).count(),
            )

            if mult == mults[-1]:
                # 4. RE-training at the top rung: second Lloyd step from
                #    the trained centroids + full re-write — must cost
                #    the same as the first (the old cells are never read)
                trained2 = lloyd_step(
                    corpus,
                    trained.select("cid", F.col("cent").alias("_cent")),
                ).localCheckpoint()
                timed(
                    f"retrain_rewrite_{mult}x",
                    lambda: ivf_index_write_frame(corpus, path + "_v2", trained2),
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
