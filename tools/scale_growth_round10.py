"""Scale-growth measurements for the round-10 persistent IVF index
(ann_ivf_index_roundtrip / operators/similarity.ivf_index_*):

1. "Pay assignment once at write time" — index WRITE cost at 1x and 10x
   corpus (should be ~linear in corpus size: one broadcast-argmin pass
   plus the partitioned write).

2. "Arrival cost is independent of index size" — APPEND of a FIXED-size
   batch against a 1x and a 10x persisted index (should be ~flat: the
   batch is assigned against the persisted quantizer only; the
   historical cells are never read).

3. "A query reads nprobe partitions" — PROBE of a fixed query set
   against the 1x and 10x index, vs a brute-force full-scan top-k over
   the same 10x corpus.  Probe growth tracks the probed-cell rows
   (corpus/k_cells x nprobe), and the dynamic-partition-pruned probe
   should beat the full scan.

Vectors are xxhash64-mixed per (id, dim) — deterministic, no RNG at
plan time, and no accidental structure (the r9 linear-recipe lesson).

Usage: python tools/scale_growth_round10.py
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
    brute_force_topk,
    ivf_index_append,
    ivf_index_probe,
    ivf_index_write,
)
from job_datapipeline_spark.session import get_spark  # noqa: E402

N_BASE = 20_000  # 1x corpus vectors
N_BATCH = 2_000  # fixed arrival size at every index scale
N_QUERIES = 10
DIM = 64
CENTS = tuple(range(8))  # quantizer = corpus vectors at ids 0..7


def build_vectors(spark, n: int, id_offset: int = 0):
    """n deterministic 64-dim vectors: dim j of id i is a scaled
    xxhash64(i, j) — uniform-ish in [-1, 1), zero planted structure."""
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
    spark = get_spark("scale-growth-r10")
    root = tempfile.mkdtemp(prefix="ivf_growth_")
    queries = build_vectors(spark, N_QUERIES, id_offset=10_000_000).select(
        F.col("vec_id").alias("q_id"), "embedding"
    ).localCheckpoint()

    for mult in (1, 10):
        n = N_BASE * mult
        corpus = build_vectors(spark, n)
        path = os.path.join(root, f"idx_{mult}x")

        timed(
            f"write_{mult}x_{n}vecs",
            lambda: ivf_index_write(corpus, path, CENTS),
        )
        batch = build_vectors(spark, N_BATCH, id_offset=20_000_000)
        timed(
            f"append_{N_BATCH}batch_into_{mult}x",
            lambda: ivf_index_append(spark, path, batch),
        )
        timed(
            f"probe_{N_QUERIES}q_{mult}x",
            lambda: ivf_index_probe(
                spark, path, queries, k=5, nprobe=2, cos_round=4
            ).count(),
        )
        if mult == 10:
            timed(
                f"brute_{N_QUERIES}q_{mult}x",
                lambda: brute_force_topk(
                    corpus.unionByName(batch), queries, k=5
                ).count(),
            )

    # Selectivity regime: with 8 cells and 10 2-probe queries the DPP
    # filter covers every partition, so probe wall ~ brute wall above —
    # honest but uninformative, and at this toy scale (100 MB corpus)
    # fixed per-job costs dominate wall clock anyway.  The 100 TB claim
    # is about BYTES SCANNED, so measure that directly from the executed
    # plan's scan metrics: a production quantizer sizes cells ~sqrt(n);
    # at 64 cells a single 2-probe query must read ~2/64 of the index
    # while the (equally disk-resident) brute scan reads all of it.
    corpus10 = build_vectors(spark, N_BASE * 10)
    path64 = os.path.join(root, "idx_10x_64c")
    flat_path = os.path.join(root, "corpus_flat")
    corpus10.write.mode("overwrite").parquet(flat_path)
    corpus_flat = spark.read.parquet(flat_path)
    one_q = queries.limit(1).localCheckpoint()
    timed(
        "write_10x_64cells",
        lambda: ivf_index_write(corpus10, path64, tuple(range(64))),
    )

    # Rows the probe actually scans: the probe joins the cells table ON
    # ITS PARTITION COLUMN, so after dynamic partition pruning the scan
    # emits exactly the rows of the probed cells — i.e. the candidate
    # count IS the scanned-row count (every row in a probed partition
    # joins by construction).  Compare against the full corpus the brute
    # scan must read.
    from job_datapipeline_spark.operators.similarity import ivf_assign

    cents64 = spark.read.parquet(path64 + "/centroids").select(
        "cid", F.col("cent").alias("_cent")
    )
    qcells = ivf_assign(
        one_q.select("q_id", F.col("embedding").alias("_qv")),
        cents64, "q_id", 2, vec_col="_qv",
    )
    cells64 = spark.read.parquet(path64 + "/cells")
    candidates = cells64.join(F.broadcast(qcells), "cell").count()
    total = corpus_flat.count()
    print(json.dumps({
        "step": "probe_1q_10x_64cells_selectivity",
        "rows_scanned_probe": candidates,
        "rows_scanned_brute": total,
        "scan_fraction": round(candidates / total, 4),
    }))
    timed(
        "probe_1q_10x_64cells",
        lambda: ivf_index_probe(
            spark, path64, one_q, k=5, nprobe=2, cos_round=4
        ).count(),
    )
    timed(
        "brute_1q_10x_parquet",
        lambda: brute_force_topk(corpus_flat, one_q, k=5).count(),
    )

    # --- PQ encode / ADC scan growth (ann_pq_adc_topk's stages) ---
    # encode is the write-time cost (min_by partial agg over n x KS
    # candidate rows per subspace: expect ~linear); the ADC scan reads
    # only codes + the broadcast LUT (expect ~linear in codes).
    from job_datapipeline_spark.plans import llm_round10c as _pq

    for mult in (1, 10):
        n = N_BASE * mult
        corpus = build_vectors(spark, n).withColumnRenamed("vec_id", "cid_")
        corpus = corpus.select(F.col("cid_").alias("vec_id"), "embedding")
        # reuse the registered plan's stages by calling its module-level
        # builder pieces through a temp view-free path: encode via the
        # same expressions (subspaces/l2sq) is exercised end-to-end by
        # the registry query; here we time the operator-shaped stages
        # with the synthetic corpus by running the full query body on a
        # frame-substituted copy: simplest honest proxy = time the
        # encode-equivalent aggregation directly.
        subspaces = F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.slice("embedding", j * 8 + 1, 8).alias("svec"),
            )
            for j in range(8)
        ])
        cb = (
            corpus.filter(F.col("vec_id") < 16)
            .select(F.col("vec_id").alias("c"), F.inline(subspaces))
            .withColumnRenamed("svec", "cvec")
            .localCheckpoint()
        )

        def l2sq_micro(a, b):
            diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
            s = F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)
            return F.round(s * 1_000_000.0, 0).cast("bigint")

        csub = corpus.select("vec_id", F.inline(subspaces))
        enc = (
            csub.join(F.broadcast(cb), "j")
            .select("vec_id", "j", "c", l2sq_micro(F.col("svec"), F.col("cvec")).alias("_d"))
            .groupBy("vec_id", "j")
            .agg(F.min_by("c", F.struct("_d", "c")).alias("code"))
        )
        timed(f"pq_encode_{mult}x_{n}vecs", lambda: enc.count())
        enc_ck = enc.localCheckpoint()
        qsub = queries.select(
            "q_id",
            F.inline(F.array(*[
                F.struct(F.lit(j).alias("j"), F.slice("embedding", j * 8 + 1, 8).alias("qsvec"))
                for j in range(8)
            ])),
        )
        lut = qsub.join(F.broadcast(cb), "j").select(
            "q_id", "j", "c", l2sq_micro(F.col("qsvec"), F.col("cvec")).alias("dsq")
        )
        adc = (
            enc_ck.join(F.broadcast(lut), (enc_ck.j == lut.j) & (enc_ck.code == lut.c))
            .groupBy("q_id", "vec_id")
            .agg(F.sum("dsq").alias("adc"))
        )
        timed(f"pq_adc_scan_{N_QUERIES}q_{mult}x", lambda: adc.count())

    # --- KMV sketch build growth (agg_kmv_theta_sketch_ops's stage) ---
    # distinct + TakeOrderedAndProject: output is K rows at every scale;
    # wall should track the input scan ~linearly.
    for mult in (1, 10):
        n = N_BASE * mult
        keys = spark.range(n).select((F.col("id") % (n // 2)).alias("k"))
        hcol = F.conv(
            F.substring(F.md5(F.col("k").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        sk = keys.select(hcol.alias("h")).distinct().orderBy("h").limit(256)
        timed(f"kmv_sketch_{mult}x_{n}rows", lambda: sk.count())

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
