"""Benchmark decontamination: flag corpus documents that share word n-grams
with an evaluation/benchmark set.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM / Llama
report it as 8-to-13-gram overlap): any training document containing a
long-enough n-gram that also appears in a held-out benchmark is considered
contaminated and dropped (or down-weighted) before training.

Scale shape: both sides explode to distinct n-grams, the join key is the
md5 of the gram (32-byte fixed width — the shuffle carries hashes, never
the gram text), and the benchmark side is tiny relative to the corpus, so
Spark/AQE turns the probe into a broadcast hash join; the corpus side
remains a single map-side explode + one aggregation by doc. No all-pairs
stage anywhere — cost is O(corpus grams + benchmark grams).

Reference parity: the reference pipeline has no decontamination stage;
this belongs to the 100 TB training-data extension surface alongside
operators/dedup.py (near-dup removal) and operators/sampling.py (splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scale import fan_out
from ..functions.text import tokenize, word_ngrams
from ..functions.vectors import dot, l2_distance, norm

# The semantic (embedding-space) twin's knobs — shared by
# corpus_decontaminate_semantic and corpus_decontaminate_coverage.
SEM_THRESHOLD = 0.9
SEM_CENTROID_IDS = (1, 11, 21, 31, 41, 51, 61, 71)
SEM_NPROBE = 3  # eval-side multi-probe: nearest cells searched


def cell_probe_flags(
    train: DataFrame,
    eval_set: DataFrame,
    cents: DataFrame,
    nprobe: int = SEM_NPROBE,
    threshold: float = SEM_THRESHOLD,
) -> DataFrame:
    """The cross-corpus cell-probe device: assign the training corpus to
    its single nearest quantizer cell and every eval vector to its
    ``nprobe`` nearest (IVF multi-probe), join on the cell key, rerank
    with exact cosine, and return per-training-doc flags
    (vec_id, n_bench_hits, max_cos).  Inputs: (vec_id, emb double[])
    frames and a (``_cid``, ``_cent``) centroid dim.

    Quantizer assignment is the engine-replayable broadcast argmin of
    dedup.semantic_prune (rounded L2, centroid-id ties); the assignment
    frame is materialized once — at 100 TB it IS the
    write-partitioned-by-cell layout, and only the tiny eval side pays
    the probe fan-out."""
    tagged = train.select(F.lit("t").alias("side"), "vec_id", "emb").unionByName(
        eval_set.select(F.lit("e").alias("side"), "vec_id", "emb")
    )
    w = Window.partitionBy("side", "vec_id").orderBy(F.asc("_d"), F.asc("_cid"))
    assigned = (
        tagged.join(F.broadcast(cents))
        .withColumn("_d", F.round(l2_distance(F.col("emb"), F.col("_cent")), 6))
        .withColumn("_r", F.row_number().over(w))
        .filter(
            ((F.col("side") == "t") & (F.col("_r") == 1))
            | ((F.col("side") == "e") & (F.col("_r") <= nprobe))
        )
        .select("side", "vec_id", "emb", F.col("_cid").alias("cell"))
        .localCheckpoint()
    )
    t = assigned.filter(F.col("side") == "t").select(
        "vec_id", F.col("emb").alias("_vt"), norm(F.col("emb")).alias("_nt"), "cell"
    )
    e = assigned.filter(F.col("side") == "e").select(
        F.col("emb").alias("_ve"), norm(F.col("emb")).alias("_ne"), "cell"
    )
    cos = F.round(dot(F.col("_vt"), F.col("_ve")) / (F.col("_nt") * F.col("_ne")), 6)
    return (
        t.join(e, "cell")  # candidates within shared cells ONLY
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_bench_hits"),
            F.max("_cos").alias("max_cos"),
        )
    )


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int, out_id: str) -> DataFrame:
    """doc -> one row per distinct word n-gram, carrying only md5(gram)."""
    grams = F.explode(
        F.array_distinct(word_ngrams(tokenize(F.col(text_col)), n))
    ).alias("gram")
    return df.select(F.col(id_col).alias(out_id), grams).select(
        out_id, F.md5(F.col("gram")).alias("gram_h")
    )


def ngram_overlap_flags(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus docs sharing >= ``min_shared`` distinct word ``n``-grams with
    any benchmark doc: (doc_id, n_shared_grams, n_bench_docs).

    Self-matches (same id on both sides — e.g. the benchmark was carved out
    of the corpus) are excluded. Documents shorter than ``n`` tokens produce
    no n-grams and can never be flagged — the conventional minimum-length
    precondition of n-gram decontamination, inherited from
    :func:`word_ngrams` returning an empty array for short docs.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1 (got {min_shared})")
    # fan_out the corpus side: tokenize -> n-gram -> md5-per-gram is the
    # dominant map cost and the corpus typically arrives as a one-split
    # scan (r12 structural finding); the bench side is small by contract.
    cg = _gram_hashes(fan_out(corpus, id_col), id_col, text_col, n, "doc_id")
    bg = _gram_hashes(bench, id_col, text_col, n, "bench_id")
    return (
        cg.join(bg, "gram_h")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_h").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_shared_grams") >= min_shared)
    )
