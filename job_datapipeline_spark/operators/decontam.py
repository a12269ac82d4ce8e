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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize, word_ngrams


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
    cg = _gram_hashes(corpus, id_col, text_col, n, "doc_id")
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
