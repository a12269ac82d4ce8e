"""Scale-growth measurement for the round-12 persisted compositions:

1. ``ann_ivf_pq_index`` — the IVF+PQ index actually STORED.  The r11
   ladder (scale_growth_round11b) measured the stored-cell-keyed-codes
   layout on in-memory frames; this harness measures the REAL parquet
   round trip:
     - build_write:   write quantizer + codebook + cells + codes
                      (expect ~linear in corpus — the pay-once cost)
     - append:        fixed 1k batch into a 1x vs 10x index
                      (expect FLAT — arrival cost independent of size)
     - probe_stored:  DPP-pruned ADC over the persisted codes + float
                      rerank of survivors (expect ~nprobe/k_cells slope
                      vs corpus, i.e. ~1/4 of a full scan's growth)
     - probe_floats:  the same probe against the float-only index
                      (ivf_index_probe — reads nprobe cells of FLOATS);
                      the stored-codes probe should beat it as the
                      corpus grows (32x narrower rows in the hot scan)

2. ``ann_ivf_filtered_probe`` — label as a second partition key:
     - probe_partitioned: scan pruned to (cell x label) leaves
     - probe_postfilter:  cell-only partitions, label filtered after
                          the scan (same results, wider read)
   Expect the partitioned variant's advantage to grow with corpus size
   (it reads ~1/|labels| of each probed cell).

Vectors are xxhash64-mixed per (id, dim) — deterministic, no RNG at
plan time (the r9 linear-recipe lesson).

Usage: python tools/scale_growth_round12.py [mult ...]   (default 1 10)
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

from pyspark.sql import Window, functions as F  # noqa: E402

from job_datapipeline_spark.operators.similarity import (  # noqa: E402
    ivf_assign,
    ivf_index_probe,
    ivf_index_write_frame,
    ivf_pq_index_append,
    ivf_pq_index_probe,
    ivf_pq_index_write_frame,
    pq_subspace_struct,
)
from job_datapipeline_spark.functions.vectors import dot, norm  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

N_BASE = 20_000
N_QUERIES = 10
N_BATCH = 1_000
DIM = 64
M, SUB, KS = 8, 8, 16
N_CELLS = 8
N_LABELS = 10
NPROBE = 2
CAND = 20
TOPK = 5


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
        .select(
            "vec_id",
            vec.alias("embedding"),
            F.pmod(F.xxhash64(F.col("vec_id"), F.lit(-1)), F.lit(N_LABELS))
            .cast("int")
            .alias("label"),
        )
        .localCheckpoint()
    )


def timed(label, fn, runs=2):
    best = float("inf")
    out = None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({"step": label, "wall_s": round(best, 2), "result": out}), flush=True)


def main() -> None:
    mults = tuple(int(a) for a in sys.argv[1:]) or (1, 10)
    spark = get_spark("scale_growth_r12", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="sg12_")
    queries = build_vectors(spark, N_QUERIES, id_offset=10_000_000).select(
        F.col("vec_id").alias("q_id"), "embedding"
    ).localCheckpoint()
    qlab = queries.withColumn(
        "target_label", F.pmod(F.col("q_id"), F.lit(N_LABELS)).cast("int")
    ).localCheckpoint()
    batch = build_vectors(spark, N_BATCH, id_offset=20_000_000).select(
        "vec_id", "embedding"
    ).localCheckpoint()

    for mult in mults:
        n = N_BASE * mult
        corpus = build_vectors(spark, n)
        cents = corpus.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cent")
        ).localCheckpoint()
        cb = corpus.filter(F.col("vec_id") < KS).select(
            F.col("vec_id").alias("c"),
            F.inline(pq_subspace_struct(F.col("embedding"), M, SUB, out="cvec")),
        ).localCheckpoint()
        pq_path = os.path.join(root, f"pq_{mult}x")
        fl_path = os.path.join(root, f"fl_{mult}x")
        lab_path = os.path.join(root, f"lab_{mult}x")
        cell_path = os.path.join(root, f"cellonly_{mult}x")

        # --- 1. IVF+PQ persisted index ---
        timed(
            f"build_write_{mult}x",
            lambda: ivf_pq_index_write_frame(
                corpus.select("vec_id", "embedding"), pq_path, cents, cb, M, SUB
            ),
            runs=1,
        )
        timed(
            f"append_1k_{mult}x",
            lambda: ivf_pq_index_append(spark, pq_path, batch, M, SUB),
            runs=1,
        )
        timed(
            f"probe_stored_codes_{mult}x",
            lambda: ivf_pq_index_probe(
                spark, pq_path, queries, M, SUB,
                k=TOPK, nprobe=NPROBE, cand=CAND,
            ).count(),
        )
        # float-only comparison index (no codes): probe reads nprobe cells
        # of 256-byte float rows instead of 8-byte codes
        ivf_index_write_frame(
            corpus.select("vec_id", "embedding"), fl_path, cents
        )
        timed(
            f"probe_float_cells_{mult}x",
            lambda: ivf_index_probe(
                spark, fl_path, queries, k=TOPK, nprobe=NPROBE
            ).count(),
        )

        # --- 2. filtered probe: label partition key vs post-scan filter ---
        ivf_index_write_frame(
            corpus, lab_path, cents,
            meta_cols=("label",), partition_cols=("cell", "label"),
        )
        ivf_index_write_frame(
            corpus, cell_path, cents,
            meta_cols=("label",), partition_cols=("cell",),
        )

        def filtered_probe(path):
            cents_p = spark.read.parquet(path + "/centroids").select(
                "cid", F.col("cent").alias("_cent")
            )
            qa = ivf_assign(
                qlab.select("q_id", "target_label", F.col("embedding").alias("_qv")),
                cents_p, "q_id", NPROBE, vec_col="_qv",
            ).withColumn("_qn", norm(F.col("_qv")))
            cells = spark.read.parquet(path + "/cells")
            denom = F.col("vnorm") * F.col("_qn")
            cos = F.when(
                denom > 0, dot(F.col("embedding"), F.col("_qv")) / denom
            ).otherwise(F.lit(0.0))
            w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
            return (
                cells.join(
                    F.broadcast(qa),
                    (cells["cell"] == qa["cell"])
                    & (cells["label"] == qa["target_label"]),
                )
                .withColumn("cos", F.round(cos, 4))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= TOPK)
                .count()
            )

        timed(f"probe_label_partitioned_{mult}x", lambda: filtered_probe(lab_path))
        timed(f"probe_label_postscan_{mult}x", lambda: filtered_probe(cell_path))

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
