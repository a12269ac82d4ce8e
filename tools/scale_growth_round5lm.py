"""Growth datapoints for the round-5 twelfth and thirteenth batches.

Measures, at sf0.01 vs sf0.1 (10x lineitem/events/orders/documents):

- events_ewma_daily: calendar day frame (the O(days^2) fold bound) vs
  raw events.
- orders_survival_km: 53-row week frame vs orders.
- orders_trend_ols: nation x month frame vs orders.
- agg_benford_audit / agg_chi2_independence: fixed 9- / 125-cell
  frames vs orders.
- embedding_gram_matrix: fixed 136-cell frame vs vectors.
- events_ab_test_ztest: 2-arm frame vs events.
- events_jaccard_affinity: type-pair frame vs the (user,type) dedup.
- text_sparse_cosine_topk: CANDIDATE PAIRS vs documents under the
  RELATIVE df <= 5%-of-corpus cap — the quadratic-hazard measurement
  (sum df^2 over the surviving vocabulary is the bound; the original
  fixed df<=25 cap measurably DEGENERATED at sf0.1 — this fixture's
  vocabulary is small, so at 5000 docs no term had df<=25 and the
  operator returned zero rows — which is exactly why the cap is now
  relative).
- compliance_cascade_delete: 3-row audit vs total fact rows.

Usage: python tools/scale_growth_round5lm.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.functions.text import tokenize  # noqa: E402
from job_datapipeline_spark.plans.llm_round5m import _COS_DF_PCT  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5lm")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        events = table(spark, sf_dir, "events")
        n_events = events.count()
        n_orders = table(spark, sf_dir, "orders").count()
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        n_vecs = table(spark, sf_dir, "embeddings").count()
        n_li = table(spark, sf_dir, "lineitem").count()

        n_days = events.select(F.col("ts").cast("date")).distinct().count()
        n_rows, w = _timed_count(REGISTRY["events_ewma_daily"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_ewma_daily | day frame (fold bound days^2) "
            f"vs events | {n_days} days -> {n_rows} rows / {n_events} "
            f"| {w:.2f} |"
        )

        n_weeks, w = _timed_count(REGISTRY["orders_survival_km"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_survival_km | week frame vs orders | "
            f"{n_weeks} / {n_orders} | {w:.2f} |"
        )

        n_nat, w = _timed_count(REGISTRY["orders_trend_ols"].fn(spark, sf_dir))
        print(
            f"| {sf} | orders_trend_ols | nation frame vs orders | "
            f"{n_nat} / {n_orders} | {w:.2f} |"
        )

        n_d, w = _timed_count(REGISTRY["agg_benford_audit"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_benford_audit | digit frame vs orders | "
            f"{n_d} / {n_orders} | {w:.2f} |"
        )

        n_c, w = _timed_count(REGISTRY["agg_chi2_independence"].fn(spark, sf_dir))
        print(
            f"| {sf} | agg_chi2_independence | cell frame vs orders | "
            f"{n_c} / {n_orders} | {w:.2f} |"
        )

        n_g, w = _timed_count(REGISTRY["embedding_gram_matrix"].fn(spark, sf_dir))
        print(
            f"| {sf} | embedding_gram_matrix | cell frame vs vectors | "
            f"{n_g} / {n_vecs} | {w:.2f} |"
        )

        n_arm, w = _timed_count(REGISTRY["events_ab_test_ztest"].fn(spark, sf_dir))
        print(
            f"| {sf} | events_ab_test_ztest | readout rows vs events | "
            f"{n_arm} / {n_events} | {w:.2f} |"
        )

        ut = events.select("user_id", "event_type").distinct().count()
        n_p, w = _timed_count(
            REGISTRY["events_jaccard_affinity"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | events_jaccard_affinity | type pairs vs (user,type) "
            f"dedup | {n_p} / {ut} | {w:.2f} |"
        )

        # candidate-pair bound for the sparse cosine: sum over surviving
        # terms of df*(df-1)/2 under the fixed absolute df cap
        tf = (
            docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
            .groupBy("doc_id", "tok")
            .count()
        )
        df = tf.groupBy("tok").agg(F.count("*").alias("df"))
        cand = (
            df.filter(F.col("df") <= max(1, n_docs * _COS_DF_PCT // 100))
            .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c"))
            .collect()[0]["c"]
        )
        n_k, w = _timed_count(
            REGISTRY["text_sparse_cosine_topk"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | text_sparse_cosine_topk | candidate bound sum(df^2)/2 "
            f"vs docs | {int(cand)} / {n_docs} -> {n_k} ranked | {w:.2f} |"
        )

        n_a, w = _timed_count(
            REGISTRY["compliance_cascade_delete"].fn(spark, sf_dir)
        )
        print(
            f"| {sf} | compliance_cascade_delete | audit rows vs fact rows | "
            f"{n_a} / {n_li + n_orders} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
