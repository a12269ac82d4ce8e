"""Growth datapoints for the round-5 fourth-batch operators.

Measures, at sf0.01 vs sf0.1 (10x the documents/orders tables):

- text_pmi_collocations: the checkpointed bigram-aggregate frame
  (distinct pairs, bounded by vocab^2) vs raw bigram occurrences — the
  bounded-state claim — plus wall.
- text_lexical_diversity: the (lang, token) shuffle frame vs total
  tokens — the bounded-vocabulary claim — plus wall.
- corpus_curriculum_schedule: wall (one range-partitioned sort) and
  phase count (linear in tokens by construction).
- mv_incremental_maintenance: CDC delta rows vs table rows (the
  planted-edit fraction is constant, so maintenance input stays a
  fixed small fraction of the fact table) plus wall.
- corpus_preference_pairs: emitted pairs vs group count (bounded by
  lang x source, flat at 10x) plus wall.
- agg_gini_concentration: rank-window frame (distinct sources, flat)
  plus wall.

Usage: python tools/scale_growth_round5d.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5d")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        docs = table(spark, sf_dir, "documents")

        # -- PMI: bounded pair frame vs raw bigram occurrences --
        ts = F.split(F.trim(F.lower("text")), r"\s+")
        n_bigrams = docs.select(
            F.greatest(F.size(ts) - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("s")).collect()[0]["s"]
        n_pairs = (
            docs.select(F.explode(ts).alias("t1"))
            .groupBy("t1").count().count()
        )  # vocab size; pair frame <= vocab^2
        w = _noop(REGISTRY["text_pmi_collocations"].fn(spark, sf_dir))
        print(
            f"| {sf} | text_pmi_collocations | pair frame bound vs raw "
            f"bigrams | vocab {n_pairs} (frame <= {n_pairs * n_pairs}) / "
            f"{n_bigrams} occurrences | {w:.2f} |"
        )

        # -- lexical diversity: (lang, token) frame vs total tokens --
        lt_frame = (
            docs.select(
                "lang", F.explode(ts).alias("tok")
            ).groupBy("lang", "tok").count().count()
        )
        w = _noop(REGISTRY["text_lexical_diversity"].fn(spark, sf_dir))
        print(
            f"| {sf} | text_lexical_diversity | (lang,token) frame vs "
            f"tokens | {lt_frame} keys / {n_bigrams + docs.count()} toks "
            f"| {w:.2f} |"
        )

        # -- curriculum: wall + phase count --
        cur = REGISTRY["corpus_curriculum_schedule"].fn(spark, sf_dir)
        t0 = time.time()
        n_phases = cur.count()
        w = time.time() - t0
        print(
            f"| {sf} | corpus_curriculum_schedule | phases | {n_phases} "
            f"| {w:.2f} |"
        )

        # -- MV maintenance: delta rows vs fact rows --
        orders = table(spark, sf_dir, "orders")
        n_orders = orders.count()
        n_delta = orders.filter(
            (F.col("o_orderkey") % 97 == 0)
            | ((F.col("o_orderkey") % 89 == 0) & (F.col("o_orderkey") % 97 != 0))
            | (F.col("o_orderkey") % 101 == 0)
        ).count()
        w = _noop(REGISTRY["mv_incremental_maintenance"].fn(spark, sf_dir))
        print(
            f"| {sf} | mv_incremental_maintenance | delta vs fact rows | "
            f"{n_delta} / {n_orders} | {w:.2f} |"
        )

        # -- preference pairs: emitted pairs vs groups --
        n_groups = docs.select("lang", "source").distinct().count()
        pp = REGISTRY["corpus_preference_pairs"].fn(spark, sf_dir)
        t0 = time.time()
        n_emitted = pp.count()
        w = time.time() - t0
        print(
            f"| {sf} | corpus_preference_pairs | pairs vs groups | "
            f"{n_emitted} / {n_groups} | {w:.2f} |"
        )

        # -- Gini: window frame (distinct sources) --
        n_sources = docs.select("source").distinct().count()
        w = _noop(REGISTRY["agg_gini_concentration"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_gini_concentration | window frame (sources) | "
            f"{n_sources} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
