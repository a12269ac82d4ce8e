"""sf1 ladder rows for the round-5 heavies the round-5 VERDICT listed as
not yet laddered: causal_matched_cohort (post operators/ranks rewrite),
recsys_item_item_cf (end-to-end, not just the pair stage),
streaming_dedup_state_ingest and dedup_minhash_estimate_accuracy.

TPC-H side reuses tools/scale_ladder.build_scaled (key-shifted disjoint
copies — identical per-key densities, 10x volume).  The two DOCUMENT
queries need a corpus ladder instead: naive replication would hand every
base document FACTOR near-identical copies (each pair survives
shingling), planting factor^2-per-doc near-dup clusters and measuring
the generator, not the operator.  Here each copy suffixes EVERY token
with a copy tag (``w -> w_c3``), so every shingle differs across copies
(zero cross-copy similarity) while the base corpus's internal duplicate
structure replicates per copy — pair volume is exactly linear in the
factor by construction.

Run:  python tools/scale_ladder_round6.py [factor]
Paste the JSON into SCALE_GROWTH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402
from tools.scale_ladder import BASE_SF, build_scaled  # noqa: E402

TPCH_QUERIES = ["causal_matched_cohort", "recsys_item_item_cf"]
DOC_QUERIES = ["streaming_dedup_state_ingest", "dedup_minhash_estimate_accuracy"]


def build_doc_ladder(spark, out_dir: str, factor: int) -> None:
    """documents.parquet at factor x base, copy-tagged per token (see
    module docstring); doc_ids stay below the queries' +1e5 planting
    offsets for factor <= 10 (5k base docs -> 50k scaled)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = table(spark, BASE_SF, "documents").select("doc_id", "text")
    n = docs.count()
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    scaled = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_copy") * F.lit(n)).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit(r"$1_c"), F.col("_copy").cast("string")),
            ).alias("text"),
        )
    )
    scaled.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def run_query(spark, name: str, sf_dir: str) -> float:
    samples = []
    for _ in range(2):
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return round(min(samples), 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-ladder-r6")
    out = {}

    tpch_dir = "/tmp/sparkgraft_ladder_r6_tpch"
    build_scaled(spark, tpch_dir, factor)
    for name in TPCH_QUERIES:
        base = run_query(spark, name, BASE_SF)
        big = run_query(spark, name, tpch_dir)
        out[name] = {"base_s": base, "scaled_s": big, "ratio": round(big / max(base, 0.01), 2)}
        print(json.dumps({name: out[name]}))

    doc_dir = "/tmp/sparkgraft_ladder_r6_docs"
    build_doc_ladder(spark, doc_dir, factor)
    for name in DOC_QUERIES:
        base = run_query(spark, name, BASE_SF)
        big = run_query(spark, name, doc_dir)
        out[name] = {"base_s": base, "scaled_s": big, "ratio": round(big / max(base, 0.01), 2)}
        print(json.dumps({name: out[name]}))

    print(json.dumps({"factor": factor, "results": out}))
    shutil.rmtree(tpch_dir, ignore_errors=True)
    shutil.rmtree(doc_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
