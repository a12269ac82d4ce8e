"""Scale-growth measurements for the round-8 heavyweights the round-8
verdict asked to see measured (its item 6):

1. dedup_lsh_tuning_curve's claim — "adding a config costs one banding
   pass, never a second signature build" — at 1x and 10x corpus.  The
   corpus is synthetic with PLANTED near-dup groups of bounded size
   (growth adds GROUPS, not group size — the blocking discipline the
   round-8 fuzzy-matching table argues for), so candidate pairs grow
   ~linearly.  Measured: the one-off signature build, the banding cost
   of the first config, and the MARGINAL cost of each added config.

2. corpus_dedup_threshold_curve's claim — "adding a threshold costs two
   aggregate columns, never another similarity join" — at 1x and 10x.
   Measured: the one-off exact-pair build (PPJoin at the loosest
   floor), the 5-threshold aggregate pass, and the 10-threshold pass
   (the marginal per-threshold cost should be ~0).

3. sql_recursive_hierarchy's claim — recursion steps scale with the
   LOG of the key space, never the row count.  Measured: the decimal-
   digit recursive walk at fixed rows across key spaces 1e4 / 1e7 /
   1e10 (depths ~4 / 7 / 10), and at fixed key space across 1M / 10M
   rows (should be ~linear in rows at constant depth).

Usage: python tools/scale_growth_round9.py
Prints one JSON line per datapoint with wall seconds (min of 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.operators import dedup as _D  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

N_BASE = 15_000  # 1x corpus size (docs), matching the sf0.1 planted corpus
LSH_CONFIGS = ((8, 1), (4, 2), (2, 4), (1, 8))
THRESHOLDS_5 = tuple(range(500, 1000, 100))
THRESHOLDS_10 = tuple(range(500, 1000, 50))


def build_corpus(spark, n: int):
    """n docs of 14 salted tokens; every third doc gets a near-dup copy
    (id + n) with a 3-token tail — groups of <= 2, group count ~ n/3.
    Tokens are xxhash64-mixed per (doc, position): a LINEAR (id*a + i*b)
    recipe gives every doc the same token stride, so docs whose bases
    differ by a small stride multiple share shifted shingle runs — at
    150k docs that manufactured ~3M accidental near-dup pairs and broke
    the linear-growth measurement this harness exists to make."""
    tokens = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(13)),
            lambda i: F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(F.col("id"), i)) % 1000000).cast("string"),
            ),
        ),
        " ",
    )
    base = spark.range(n).select(F.col("id").alias("doc_id"), tokens.alias("text"))
    near = (
        base.filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qq xq zq")).alias("text"),
        )
    )
    return base.unionByName(near).localCheckpoint()


def timed(fn, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def lsh_curve_points(spark) -> None:
    for mult in (1, 10):
        corpus = build_corpus(spark, N_BASE * mult)
        n_docs = corpus.count()
        sigs_holder = {}

        def build_sigs():
            sigs_holder["sigs"] = _D.minhash_signatures(
                corpus, num_hashes=8
            ).localCheckpoint()

        t_sigs = timed(build_sigs, runs=1)  # one-off; checkpoint is sticky
        sigs = sigs_holder["sigs"]

        def curve(k: int):
            def run():
                for b, r in LSH_CONFIGS[:k]:
                    noop(_D.lsh_candidate_pairs(sigs, bands=b, rows_per_band=r))
            return run

        t1 = timed(curve(1))
        t4 = timed(curve(4))
        print(json.dumps({
            "metric": "lsh_tuning_curve_growth",
            "corpus_mult": mult,
            "n_docs": n_docs,
            "sig_build_sec": t_sigs,
            "one_config_sec": t1,
            "four_configs_sec": t4,
            "marginal_per_config_sec": round((t4 - t1) / 3, 2),
        }))


def threshold_curve_points(spark) -> None:
    for mult in (1, 10):
        corpus = build_corpus(spark, N_BASE * mult)
        pairs_holder = {}

        def build_pairs():
            pairs_holder["p"] = _D.jaccard_pairs(
                corpus, threshold=0.5
            ).localCheckpoint()

        t_pairs = timed(build_pairs, runs=1)
        pairs = pairs_holder["p"]
        n_pairs = pairs.count()

        def agg(thresholds):
            def run():
                aggs = []
                for t in thresholds:
                    hit = F.col("jaccard") >= t / 1000.0
                    aggs.append(F.count_if(hit).alias(f"np_{t}"))
                    aggs.append(
                        F.count_distinct(
                            F.when(hit, F.col("id_b"))
                        ).alias(f"nd_{t}")
                    )
                noop(pairs.agg(*aggs))
            return run

        t5 = timed(agg(THRESHOLDS_5))
        t10 = timed(agg(THRESHOLDS_10))
        print(json.dumps({
            "metric": "threshold_curve_growth",
            "corpus_mult": mult,
            "n_pairs": n_pairs,
            "pair_build_sec": t_pairs,
            "agg_5_thresholds_sec": t5,
            "agg_10_thresholds_sec": t10,
            "marginal_per_threshold_sec": round((t10 - t5) / 5, 3),
        }))


def recursion_ladder(spark) -> None:
    # total walk rows = n_rows x (depth + 1); the 1M default row cap is a
    # safety valve, not a scale claim — raise it for the ladder
    spark.conf.set("spark.sql.cteRecursionRowLimit", 200_000_000)
    for n_rows, keyspace in (
        (1_000_000, 10_000),
        (1_000_000, 10_000_000),
        (1_000_000, 10_000_000_000),
        (10_000_000, 10_000_000),
    ):
        spark.range(n_rows).select(
            ((F.col("id") * 2654435761) % keyspace).alias("pk")
        ).localCheckpoint().createOrReplaceTempView("_r9_hier_keys")

        def run():
            noop(spark.sql("""
                WITH RECURSIVE walk(pk, anc, depth) AS (
                    SELECT pk, pk, 0 FROM _r9_hier_keys
                    UNION ALL
                    SELECT pk, anc div 10, depth + 1 FROM walk
                    WHERE anc >= 10
                )
                SELECT depth, count(*) AS n, count(DISTINCT anc) AS n_roots
                FROM walk WHERE anc < 10 GROUP BY depth
            """))

        import math
        print(json.dumps({
            "metric": "recursive_hierarchy_ladder",
            "n_rows": n_rows,
            "keyspace": keyspace,
            "max_depth": int(math.log10(keyspace)),
            "wall_sec": timed(run),
        }))


def unigram_fold_ladder(spark) -> None:
    """The round-9 unigram-LM claim: the Viterbi `aggregate` fold is
    linear in WORD TYPES (the testdata corpus has only 31 — this ladder
    proves the shape on realistic vocabulary sizes).  Synthetic word
    types of length 6-12 chars; vocabulary = all chars + 200 frequent
    substrings.  Measured: one full segmentation pass (edge join +
    fold + usage aggregate) at 10k / 100k / 1M word types."""
    from job_datapipeline_spark.plans.llm_round9b import _segment

    for n_types in (10_000, 100_000, 1_000_000):
        word = F.concat(
            F.lit("w"),
            ((F.col("id") * 7919) % 97).cast("string"),
            F.lit("x"),
            ((F.col("id") * 104729) % 9973).cast("string"),
        )
        words = (
            spark.range(n_types)
            .select(
                word.alias("word"),
                ((F.col("id") % 1000) + 1).cast("bigint").alias("c"),
            )
            .groupBy("word")
            .agg(F.max("c").alias("c"))
            .localCheckpoint()
        )
        n_real = words.count()
        cand = (
            words.select(
                "word", "c",
                F.explode(F.sequence(F.lit(1), F.length("word"))).alias("j"),
            )
            .select(
                "word", "c", "j",
                F.explode(
                    F.sequence(F.lit(1), F.least(F.lit(4), F.col("j")))
                ).alias("k"),
            )
            .withColumn("piece", F.expr("substring(word, j - k + 1, k)"))
            .localCheckpoint()
        )
        seed = cand.groupBy("piece").agg(F.sum("c").cast("bigint").alias("cnt"))
        vocab = (
            seed.filter(F.length("piece") == 1)
            .unionByName(
                seed.filter(F.length("piece") >= 2)
                .orderBy(F.desc("cnt"), F.asc("piece"))
                .limit(200)
            )
            .select("piece", F.lit(1000).cast("long").alias("cost"))
            .localCheckpoint()
        )

        def run():
            best = _segment(cand, vocab)
            noop(
                best.select("c", F.explode(F.split("seg", " ")).alias("p"))
                .groupBy("p")
                .agg(F.sum("c").alias("u"))
            )

        print(json.dumps({
            "metric": "unigram_viterbi_fold_ladder",
            "n_word_types": n_real,
            "wall_sec": timed(run),
        }))


def semantic_decontam_ladder(spark) -> None:
    """The round-9 semantic-decontamination claim: probe cost scales
    with the EVAL side and per-cell occupancy, never train x eval.
    Synthetic 64-dim unit-ish vectors; 64 centroids; eval fixed at 2k
    vectors probing nprobe=3 cells while the training corpus grows
    10x / 100x.  Measured: assignment + cell-join + rerank wall."""
    from pyspark.sql import Window

    from job_datapipeline_spark.functions.vectors import dot, l2_distance, norm

    def vecs(n, salt):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    ((F.col("id") * 2654435761 + i * 40503 + salt) % 2000)
                    .cast("double") / 1000.0 - 1.0
                ),
            ).alias("emb"),
        )

    eval_set = vecs(2_000, 7).localCheckpoint()
    for n_train in (100_000, 1_000_000):
        train = vecs(n_train, 0).localCheckpoint()
        cents = F.broadcast(
            vecs(64, 0).select(
                F.col("vec_id").alias("_cid"), F.col("emb").alias("_cent")
            )
        )
        w = Window.partitionBy("side", "vec_id").orderBy(
            F.asc("_d"), F.asc("_cid")
        )

        def run():
            tagged = train.select(
                F.lit("t").alias("side"), "vec_id", "emb"
            ).unionByName(
                eval_set.select(F.lit("e").alias("side"), "vec_id", "emb")
            )
            assigned = (
                tagged.join(cents)
                .withColumn(
                    "_d", F.round(l2_distance(F.col("emb"), F.col("_cent")), 6)
                )
                .withColumn("_r", F.row_number().over(w))
                .filter(
                    ((F.col("side") == "t") & (F.col("_r") == 1))
                    | ((F.col("side") == "e") & (F.col("_r") <= 3))
                )
                .select("side", "vec_id", "emb", F.col("_cid").alias("cell"))
            )
            t = assigned.filter(F.col("side") == "t").select(
                "vec_id", F.col("emb").alias("_vt"),
                norm(F.col("emb")).alias("_nt"), "cell",
            )
            e = assigned.filter(F.col("side") == "e").select(
                F.col("emb").alias("_ve"), norm(F.col("emb")).alias("_ne"),
                "cell",
            )
            cos = dot(F.col("_vt"), F.col("_ve")) / (F.col("_nt") * F.col("_ne"))
            noop(
                t.join(e, "cell")
                .filter(F.round(cos, 6) >= 0.9)
                .groupBy("vec_id")
                .agg(F.count("*").alias("hits"))
            )

        print(json.dumps({
            "metric": "semantic_decontam_ladder",
            "n_train": n_train,
            "n_eval": 2_000,
            "wall_sec": timed(run),
        }))


def main() -> None:
    spark = get_spark("scale-growth-round9")
    only = set(sys.argv[1:])
    sections = {
        "lsh": lsh_curve_points,
        "threshold": threshold_curve_points,
        "recursion": recursion_ladder,
        "unigram": unigram_fold_ladder,
        "decontam": semantic_decontam_ladder,
    }
    for name, fn in sections.items():
        if not only or name in only:
            fn(spark)


if __name__ == "__main__":
    main()
