"""Scale-growth check for the dedup suite: does candidate-pair volume (and
wall time) grow ~linearly in corpus size, as the bucketed designs claim
(operators/dedup.py module doc)?

Method: plant a synthetic corpus of unique documents with a controlled
near-duplicate rate (5% of docs get one mutated copy — a few words
swapped, so pairs survive shingling but are not exact dups), at 1x and
10x, and measure for each scale:

- ``lsh``: LSH candidate-pair count + wall time (minhash -> banding ->
  self-equi-join). Bucketed: candidates scale with planted-pair count,
  which is linear in n.
- ``jaccard``: AllPairs/PPJoin exact-threshold pair count + wall time.
  Prefix/length filters keep the verified set linear too.

A corpus-quadratic regression would show up as ~100x growth in candidates
or time from 1x to 10x; healthy is ~10x (plus fixed overhead). Run:

    python tools/scale_growth.py [base_n]

and paste the JSON into SCALE_GROWTH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.operators import dedup  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

WORDS = [f"w{i:03d}" for i in range(400)]


def planted_corpus(spark, n_docs: int, words_per_doc: int = 40, dup_rate: float = 0.05):
    """n_docs unique docs + floor(n_docs*dup_rate) mutated near-copies.

    Texts are deterministic functions of doc_id (md5-free here: plain
    arithmetic word picks), built fully in-plan: range -> transform over a
    sequence, no driver-side text generation, so the 10x corpus costs 10x,
    not a driver collect.
    """
    # md5-based word picks: arithmetic picks (id*a + i*b mod V) alias doc
    # ids into near-identical texts (period-V clusters -> quadratic planted
    # pairs, which would test the GENERATOR, not the operator). md5 makes
    # unique ids produce effectively independent word sequences.
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in WORDS]),
                    (
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(F.concat_ws(":", F.col("id"), i)), 1, 12
                                ),
                                16,
                                10,
                            ).cast("bigint"),
                            F.lit(len(WORDS)),
                        )
                        + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    n_dups = int(n_docs * dup_rate)
    dups = base.filter(F.col("doc_id") < n_dups).select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        # mutate: replace the first word with a marker -> ~97% shingle overlap
        F.concat(
            F.lit("zqx "),
            F.substring_index(F.col("text"), " ", -(words_per_doc - 1)),
        ).alias("text"),
    )
    return base.unionByName(dups)


def measure(spark, n_docs: int) -> dict:
    docs = planted_corpus(spark, n_docs)
    docs = docs.localCheckpoint()  # isolate corpus build cost from dedup cost

    t0 = time.time()
    sigs = dedup.minhash_signatures(docs, num_hashes=64)
    cands = dedup.lsh_candidate_pairs(sigs, bands=16)
    n_lsh = cands.count()
    t_lsh = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = dedup.jaccard_pairs(docs, threshold=0.8)
    n_jac = pairs.count()
    t_jac = round(time.time() - t0, 2)

    # cross-doc common-span detection (plans/queries dedup_common_spans
    # shape): distinct per-doc bigram -> window doc-frequency -> per-doc
    # shared fraction. Output rows == n_docs by construction; the cost
    # driver is the gram stream, linear in corpus size.
    from pyspark.sql import Window

    from job_datapipeline_spark.functions.text import tokenize, word_ngrams

    t0 = time.time()
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.transform(word_ngrams(tokenize(F.col("text")), 2), F.md5))
        ).alias("g"),
    )
    n_docs_w = F.count("*").over(Window.partitionBy("g"))
    per_doc = (
        grams.select("doc_id", (n_docs_w >= 2).alias("sh"))
        .groupBy("doc_id")
        .agg(F.sum(F.when(F.col("sh"), 1).otherwise(0)).alias("n_shared"))
    )
    n_spans_docs = per_doc.count()
    t_spans = round(time.time() - t0, 2)

    # prefix-filtered containment join (plans/queries.dedup_containment_pairs
    # shape): planted excerpts (first half of each near-dup doc's tokens)
    # must be found as contained; cost must track collisions, not n^2.
    from job_datapipeline_spark.operators.dedup import _PREFILTER_EPS, _shingle_arrays

    t0 = time.time()
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    exc = docs.filter(F.size(toks) >= 30).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, 15), " ").alias("text"),
    ).filter(F.col("doc_id") % 20 == 3)  # 5% excerpt rate
    corpus2 = docs.select("doc_id", "text").unionByName(exc)
    te = 0.9 - _PREFILTER_EPS
    arrays = _shingle_arrays(corpus2, "text", "doc_id", 3).withColumn(
        "_plen", F.col("n_sh") - F.ceil(F.lit(te) * F.col("n_sh")).cast("int") + 1
    ).localCheckpoint()
    pre = arrays.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"),
                        F.explode(F.slice("shs", 1, F.col("_plen"))).alias("sh_h"))
    fullsh = arrays.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"),
                           F.explode("shs").alias("sh_h"))
    candc = (pre.join(fullsh, "sh_h")
             .filter((F.col("id_a") != F.col("id_b")) & (F.col("n_b") >= te * F.col("n_a")))
             .select("id_a", "id_b").distinct())
    av = arrays.select(F.col("doc_id").alias("id_a"), F.col("shs").alias("_sa"), F.col("n_sh").alias("na2"))
    bv = arrays.select(F.col("doc_id").alias("id_b"), F.col("shs").alias("_sb"))
    contained = (candc.join(av, "id_a").join(bv, "id_b")
                 .filter(F.size(F.array_intersect("_sa", "_sb")).cast("double") / F.col("na2") >= 0.9))
    n_contained = contained.count()
    t_contain = round(time.time() - t0, 2)

    return {
        "n_docs": n_docs,
        "lsh_candidates": n_lsh,
        "lsh_sec": t_lsh,
        "jaccard_pairs": n_jac,
        "jaccard_sec": t_jac,
        "common_spans_docs": n_spans_docs,
        "common_spans_sec": t_spans,
        "containment_pairs": n_contained,
        "containment_sec": t_contain,
    }


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("scale-growth")
    r1 = measure(spark, base_n)
    r10 = measure(spark, base_n * 10)
    out = {
        "base": r1,
        "x10": r10,
        "growth": {
            "lsh_candidates": round(r10["lsh_candidates"] / max(r1["lsh_candidates"], 1), 2),
            "lsh_sec": round(r10["lsh_sec"] / max(r1["lsh_sec"], 0.01), 2),
            "jaccard_pairs": round(r10["jaccard_pairs"] / max(r1["jaccard_pairs"], 1), 2),
            "jaccard_sec": round(r10["jaccard_sec"] / max(r1["jaccard_sec"], 0.01), 2),
            "common_spans_sec": round(r10["common_spans_sec"] / max(r1["common_spans_sec"], 0.01), 2),
            "containment_pairs": round(r10["containment_pairs"] / max(r1["containment_pairs"], 1), 2),
            "containment_sec": round(r10["containment_sec"] / max(r1["containment_sec"], 0.01), 2),
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
