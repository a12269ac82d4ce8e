"""Scale-growth check for the r4 LLM-pipeline operators (VERDICT r4 item 4):
chunker, chunk-level dedup (window form vs the documented groupBy+join
form), BM25's tf aggregate, and the hashed-n-gram quality classifier.

Unlike tools/scale_growth.py (which measures dedup PRIMITIVES on in-memory
frames), this harness writes the planted corpus to a temp parquet
``documents.parquet`` with the full documents schema, so what gets timed
is the ACTUAL registered plan (REGISTRY[name].fn) — scan, pushdown and all
— at 1x and 10x. Healthy growth is ~10x wall or less (fixed overhead
amortizes); a quadratic regression shows as ~100x.

The chunk-dedup measurement times BOTH semantically-identical forms the
operator's docstring discusses:

- ``window``: one row_number() window over chunk_hash (the registered
  single-pass form);
- ``groupjoin``: groupBy(chunk_hash).min(struct(doc_id, chunk_idx)) +
  join back (partial-aggregatable — the form the doc prescribes for
  100 TB because the map-side combine collapses each task's repeated
  hashes before the shuffle, and no single hash's occurrence list must
  fit one task's sort buffer).

Run:  python tools/scale_growth_llm.py [base_n]
and paste the JSON into SCALE_GROWTH.md with the window-vs-groupjoin
decision.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.plans import llm_extras  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402
from job_datapipeline_spark.functions.text import tokenize  # noqa: E402
from tools.scale_growth import planted_corpus  # noqa: E402

_LANGS = ["en", "zh", "fr", "de", "es"]


def write_corpus(spark, n_docs: int, sf_dir: str) -> None:
    """Planted corpus (unique docs + 5% near-dup copies, see
    tools/scale_growth.planted_corpus) widened to the documents schema the
    registered plans expect. lang/source are deterministic functions of
    doc_id so the 10x corpus is a superset distribution, not a reshuffle."""
    # Sprinkle the BM25 query vocabulary into ~10% of docs (deterministic
    # by doc_id) so the scoring join and top-k window do real per-scale
    # work, not just the corpus-side tf/df/dl aggregates.
    qterms = sorted({t for _, t in llm_extras._BM25_QUERIES})
    docs = planted_corpus(spark, n_docs).select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) == 0,
            F.concat_ws(
                " ",
                F.col("text"),
                F.element_at(
                    F.array(*[F.lit(t) for t in qterms]),
                    (F.pmod(F.col("doc_id"), F.lit(len(qterms))) + 1).cast("int"),
                ),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(x) for x in _LANGS]),
            (F.pmod(F.col("doc_id"), F.lit(len(_LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("host"), F.pmod(F.col("doc_id"), F.lit(50))).alias("source"),
        F.length("text").cast("int").alias("n_chars"),
        "text",
    )
    docs.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))


def _timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def chunk_dedup_groupjoin(spark, sf_dir: str):
    """The groupBy+join twin of corpus_chunk_dedup: identical output,
    partial-aggregatable first-occurrence resolution instead of a
    per-hash sorted window."""
    from job_datapipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    t = tokenize(F.col("text"))
    sized = docs.select("doc_id", t.alias("t"), F.size(t).alias("n"))
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("n") - llm_extras._CHUNK_SIZE, F.lit(0))
        / float(llm_extras._CHUNK_STRIDE)
    ).cast("bigint")
    chunk = F.slice(
        F.col("t"), F.col("chunk_idx") * llm_extras._CHUNK_STRIDE + 1,
        llm_extras._CHUNK_SIZE,
    )
    chunks = sized.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1))
    ).select(
        "doc_id",
        "chunk_idx",
        F.substring(F.md5(F.array_join(chunk, " ")), 1, 16).alias("chunk_hash"),
    )
    firsts = chunks.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("first")
    )
    flagged = chunks.join(firsts, "chunk_hash").select(
        "doc_id",
        (
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("chunk_idx") != F.col("first.chunk_idx"))
        ).alias("is_dup"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
        .filter(F.col("n_dup_chunks") > 0)
    )


def measure(spark, n_docs: int) -> dict:
    sf_dir = tempfile.mkdtemp(prefix="jdp_scale_llm_")
    try:
        write_corpus(spark, n_docs, sf_dir)
        out: dict = {"n_docs": n_docs}
        for name, key in [
            ("text_chunk_overlap", "chunker"),
            ("corpus_chunk_dedup", "chunk_dedup_window"),
            ("text_bm25_search", "bm25"),
            ("text_quality_classifier", "classifier"),
            # the r4 flagship composition (classifier -> chunk -> chunk-dedup
            # -> temperature-sample); VERDICT r4 item 8 asks for its >sf0.1
            # datapoint, and documents scaling belongs HERE, not in
            # tools/scale_ladder.py (naive replication would plant quadratic
            # near-dup clusters and measure the generator, not the plan).
            ("corpus_pretrain_pipeline", "pretrain_pipeline"),
        ]:
            sec, rows = _timed(lambda n=name: REGISTRY[n].fn(spark, sf_dir).count())
            out[f"{key}_sec"], out[f"{key}_rows"] = sec, rows
        sec, rows = _timed(lambda: chunk_dedup_groupjoin(spark, sf_dir).count())
        out["chunk_dedup_groupjoin_sec"], out["chunk_dedup_groupjoin_rows"] = sec, rows
        assert out["chunk_dedup_groupjoin_rows"] == out["chunk_dedup_window_rows"], (
            "window and groupjoin forms disagree"
        )
        return out
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("scale-growth-llm")
    measure(spark, 200)  # discarded warmup: JVM/codegen init otherwise lands on base's first query
    r1 = measure(spark, base_n)
    r10 = measure(spark, base_n * 10)
    growth = {
        k[:-4]: round(r10[k] / max(r1[k], 0.01), 2)
        for k in r1
        if k.endswith("_sec")
    }
    print(json.dumps({"load1": round(os.getloadavg()[0], 2), "base": r1,
                      "x10": r10, "growth": growth}, indent=1))


if __name__ == "__main__":
    main()
