"""Scale-growth measurement for the round-11 IVF+PQ hybrid
(ann_ivf_pq_topk): does restricting the integer ADC scan to the query's
nprobe probed cells actually buy the claimed multiplied reduction, and
does the advantage GROW with corpus size?

Two pipelines over the same synthetic corpus, same codebook, same
queries, identical candidate semantics within their search scope:

- pq_full:   ADC sum over ALL corpus codes (the ann_pq_adc_topk shape)
- ivfpq:     ADC sum over only the codes of each query's nprobe=2 of 8
             cells (the ann_ivf_pq_topk shape)

Expectation: both linear in corpus size, ivfpq with a ~nprobe/k_cells
slope (plus the fixed assignment overhead that dominates at tiny
sizes).  This turns the hybrid's "the two reductions multiply" claim
into a measured slope ratio.

Vectors are xxhash64-mixed per (id, dim) — deterministic, no RNG at
plan time (the r9 linear-recipe lesson).

Usage: python tools/scale_growth_round11b.py [mult ...]   (default 1 10)
Prints one JSON line per datapoint with wall seconds (min of 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from job_datapipeline_spark.operators.similarity import ivf_assign  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

N_BASE = 20_000
N_QUERIES = 10
DIM = 64
M, SUB, KS = 8, 8, 16   # PQ geometry (the registry convention)
N_CELLS = 8
NPROBE = 2
CAND = 20


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


def _subspaces():
    return F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.slice("embedding", j * SUB + 1, SUB).alias("svec"),
        )
        for j in range(M)
    ])


def _l2sq_micro(a, b):
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    s = F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)
    return F.round(s * 1_000_000.0, 0).cast("bigint")


def encode(corpus, cb):
    csub = corpus.select("vec_id", F.inline(_subspaces()))
    return (
        csub.join(F.broadcast(cb), "j")
        .select("vec_id", "j", "c", _l2sq_micro(F.col("svec"), F.col("cvec")).alias("_d"))
        .groupBy("vec_id", "j")
        .agg(F.min_by("c", F.struct("_d", "c")).alias("code"))
    )


def lut_for(queries, cb):
    qsub = queries.select(
        "q_id",
        F.inline(F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.slice("qvec", j * SUB + 1, SUB).alias("qsvec"),
            )
            for j in range(M)
        ])),
    )
    return qsub.join(F.broadcast(cb), "j").select(
        "q_id", "j", "c", _l2sq_micro(F.col("qsvec"), F.col("cvec")).alias("dsq")
    )


def topk_count(adc):
    w = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= CAND)
        .count()
    )


def timed(label, fn, runs=2):
    best = float("inf")
    out = None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({"step": label, "wall_s": round(best, 2), "result": out}))


def main() -> None:
    mults = tuple(int(a) for a in sys.argv[1:]) or (1, 10)
    spark = get_spark("scale_growth_r11b", shuffle_partitions=32)
    queries = build_vectors(spark, N_QUERIES, id_offset=10_000_000).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    ).localCheckpoint()

    for mult in mults:
        n = N_BASE * mult
        corpus = build_vectors(spark, n)
        cb = (
            corpus.filter(F.col("vec_id") < KS)
            .select(F.col("vec_id").alias("c"), F.inline(_subspaces()))
            .withColumnRenamed("svec", "cvec")
            .localCheckpoint()
        )
        cents = corpus.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("_cent")
        ).localCheckpoint()
        # codes are a write-time artifact in both pipelines — prebuilt,
        # as the persisted index family stores them
        enc = encode(corpus, cb).localCheckpoint()
        ca = ivf_assign(
            corpus.select("vec_id", F.col("embedding").alias("_v")), cents,
            "vec_id", 1,
        ).select("vec_id", "cell").localCheckpoint()
        lut = lut_for(queries, cb).localCheckpoint()

        # a) full-corpus ADC (ann_pq_adc_topk shape)
        def pq_full():
            adc = (
                enc.join(F.broadcast(lut), (enc["j"] == lut["j"]) & (enc["code"] == lut["c"]))
                .groupBy("q_id", "vec_id")
                .agg(F.sum("dsq").alias("adc"))
            )
            return topk_count(adc)

        # b) cell-restricted ADC (ann_ivf_pq_topk shape)
        def ivfpq():
            qa = ivf_assign(
                queries.select("q_id", F.col("qvec").alias("_qv")), cents,
                "q_id", NPROBE, vec_col="_qv",
            ).select("q_id", "cell")
            lutq = lut.join(F.broadcast(qa), "q_id")
            encc = enc.join(ca, "vec_id")
            adc = (
                encc.join(
                    F.broadcast(lutq),
                    (encc["cell"] == lutq["cell"])
                    & (encc["j"] == lutq["j"])
                    & (encc["code"] == lutq["c"]),
                )
                .groupBy("q_id", "vec_id")
                .agg(F.sum("dsq").alias("adc"))
            )
            return topk_count(adc)

        # c) cell-restricted ADC with the codes STORED cell-keyed (the
        #    production layout: enc+cell is one write-time artifact living
        #    next to the cell partitions — no query-time join)
        encc_stored = enc.join(ca, "vec_id").localCheckpoint()

        def ivfpq_stored():
            qa = ivf_assign(
                queries.select("q_id", F.col("qvec").alias("_qv")), cents,
                "q_id", NPROBE, vec_col="_qv",
            ).select("q_id", "cell")
            lutq = lut.join(F.broadcast(qa), "q_id")
            adc = (
                encc_stored.join(
                    F.broadcast(lutq),
                    (encc_stored["cell"] == lutq["cell"])
                    & (encc_stored["j"] == lutq["j"])
                    & (encc_stored["code"] == lutq["c"]),
                )
                .groupBy("q_id", "vec_id")
                .agg(F.sum("dsq").alias("adc"))
            )
            return topk_count(adc)

        timed(f"pq_full_adc_{mult}x", pq_full)
        timed(f"ivfpq_adc_{mult}x", ivfpq)
        timed(f"ivfpq_stored_codes_{mult}x", ivfpq_stored)


if __name__ == "__main__":
    main()
