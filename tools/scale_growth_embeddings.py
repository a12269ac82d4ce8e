"""Scale-growth check for the EMBEDDING suite (VERDICT r3 item 6): do
hyperplane-LSH bucket collisions and IVF probe cost grow linearly in
vector count when the index parameters follow the documented scale path?

The text-dedup harness (tools/scale_growth.py) proves the shingle-LSH /
PPJoin stages bucket-linear; this tool covers the vector twin:

- ``lsh``: hyperplane-bucket collision count + verified near-dup pairs
  (cos >= threshold on collisions only) + wall, via the same bucketing
  ``operators.dedup.embedding_near_dedup`` uses. Measured BOTH ways at
  10x: with the base plane count (demonstrating the occupancy hazard —
  collisions for random vectors grow ~quadratically when the bucket
  count stays fixed) and with the scale path the module doc prescribes
  (planes += log2(growth), keeping expected bucket occupancy constant,
  so collisions grow ~linearly).
- ``ivf``: ivf_topk wall at the base centroid count and at a sqrt-n
  scaled centroid count (more, smaller cells — the standard IVF recipe).

Planted corpus: vectors with md5-derived components (independent across
ids), 5%% of ids get one near-copy (first component nudged by +0.2:
cosine ~0.999 against the original, below 1.0 but above the 0.99
threshold). Fully in-plan, localCheckpointed so generation cost is
excluded from the measured stages.

Run:  python tools/scale_growth_embeddings.py [base_n]
and paste the JSON into SCALE_GROWTH.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.functions.vectors import dot, norm  # noqa: E402
from job_datapipeline_spark.operators.similarity import (  # noqa: E402
    _hyperplane,
    hyperplane_bucket,
    ivf_topk,
)
from job_datapipeline_spark.session import get_spark  # noqa: E402

DIM = 64
DUP_RATE = 0.05
THRESHOLD = 0.99


def planted_vectors(spark, n: int):
    """n unique vectors + floor(n*DUP_RATE) near-copies, fully in-plan.

    Component j of vector i = uniform(-1, 1) derived from md5(i, j) — md5
    (not arithmetic) so distinct ids give effectively independent vectors;
    near-copies shift component 0 by +0.2 (cos ~0.999 vs the original).
    """
    comp = lambda idc, j: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat_ws("_", idc, j)), 1, 8), 16, 10).cast("double")
        / F.lit(float(0x7FFFFFFF))
        - 1.0
    )
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: comp(F.col("id").cast("string"), j.cast("string")),
        ).alias("embedding"),
    )
    dups = (
        base.filter(F.col("vec_id") % int(1 / DUP_RATE) == 3)
        .select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1) + F.lit(0.2)),
                F.slice("embedding", 2, DIM - 1),
            ).alias("embedding"),
        )
    )
    return base.unionByName(dups)


def measure_lsh(vecs, num_planes: int) -> dict:
    planes = [_hyperplane(s, DIM) for s in range(num_planes)]
    t0 = time.time()
    b = vecs.withColumn("_b", hyperplane_bucket(F.col("embedding"), planes)).withColumn(
        "_n", norm(F.col("embedding"))
    )
    a_side = b.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"),
        F.col("_n").alias("_na"), "_b",
    )
    b_side = b.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"),
        F.col("_n").alias("_nb"), "_b",
    )
    coll = a_side.join(b_side, "_b").filter(F.col("id_a") < F.col("id_b"))
    denom = F.col("_na") * F.col("_nb")
    cos = F.when(denom > 0, dot(F.col("_va"), F.col("_vb")) / denom).otherwise(F.lit(0.0))
    agg = coll.agg(
        F.count("*").alias("collisions"),
        F.sum(F.when(F.round(cos, 6) >= THRESHOLD, 1).otherwise(0)).alias("verified"),
    ).head()
    return {
        "planes": num_planes,
        "collisions": agg["collisions"],
        "verified_pairs": int(agg["verified"] or 0),
        "sec": round(time.time() - t0, 2),
    }


def measure_ivf(vecs, n_centroids: int) -> dict:
    step = max(1, 1000 // n_centroids)
    cent_ids = tuple(range(0, n_centroids * step, step))
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    t0 = time.time()
    n = ivf_topk(vecs, queries, k=5, centroid_ids=cent_ids, nprobe=2).count()
    return {"centroids": n_centroids, "topk_rows": n, "sec": round(time.time() - t0, 2)}


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("scale-growth-embeddings")
    out: dict = {"base_n": base_n, "dim": DIM, "dup_rate": DUP_RATE}
    v1 = planted_vectors(spark, base_n).localCheckpoint()
    v10 = planted_vectors(spark, base_n * 10).localCheckpoint()
    scaled_planes = 8 + max(1, round(math.log2(10)))  # keep occupancy ~constant

    out["base"] = {"lsh": measure_lsh(v1, 8), "ivf": measure_ivf(v1, 8)}
    out["x10_fixed_params"] = {"lsh": measure_lsh(v10, 8), "ivf": measure_ivf(v10, 8)}
    out["x10_scaled_params"] = {
        "lsh": measure_lsh(v10, scaled_planes),
        "ivf": measure_ivf(v10, 25),
    }
    g = lambda a, b, k: round(b[k] / max(a[k], 1e-9), 2)  # noqa: E731
    out["growth_fixed"] = {
        "lsh_collisions": g(out["base"]["lsh"], out["x10_fixed_params"]["lsh"], "collisions"),
        "lsh_sec": g(out["base"]["lsh"], out["x10_fixed_params"]["lsh"], "sec"),
        "ivf_sec": g(out["base"]["ivf"], out["x10_fixed_params"]["ivf"], "sec"),
    }
    out["growth_scaled"] = {
        "lsh_collisions": g(out["base"]["lsh"], out["x10_scaled_params"]["lsh"], "collisions"),
        "lsh_verified": g(out["base"]["lsh"], out["x10_scaled_params"]["lsh"], "verified_pairs"),
        "lsh_sec": g(out["base"]["lsh"], out["x10_scaled_params"]["lsh"], "sec"),
        "ivf_sec": g(out["base"]["ivf"], out["x10_scaled_params"]["ivf"], "sec"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
