"""Round-11 semantic pins for the r10-advice fixes: the ivf_assign
empty-centroid guard fails loudly (instead of silently-empty results),
the streaming ANN verdict consumes REAL foreachBatch batch ids, the PQ
codebook is corpus-only (no quantizer query leak), and the recursive-CTE
child session is cached per SparkContext."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_datapipeline_spark.catalog import table
from job_datapipeline_spark.operators.similarity import ivf_assign
from job_datapipeline_spark.plans.llm_round8f import _child_session
from job_datapipeline_spark.plans.llm_round10c import _PQ_CB_MAX
from job_datapipeline_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def test_ivf_assign_empty_centroids_raises(spark):
    """An empty quantizer must fail the job loudly — every downstream
    index write/append/probe would otherwise be silently empty (the
    failure mode the exact_rank_values guard closes for ranks)."""
    emb = table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").alias("_v")
    )
    # RUNTIME-empty (pushed parquet filter), the real failure shape — a
    # statically-empty relation would be folded away before execution
    cents = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("cid"), F.col("_v").alias("_cent")
    )
    out = ivf_assign(emb.limit(3), cents, "vec_id", 1, vec_col="_v")
    with pytest.raises(Exception, match="centroid frame is empty"):
        out.count()


@pytest.mark.parametrize("aqe", ["true", "false"])
def test_ivf_assign_empty_guard_survives_aqe_toggle(spark, aqe):
    """SPARK-VERSION SENSITIVITY PIN: the guard's placement deliberately
    exploits optimizer internals (first-wave broadcast build, coalesce(1)
    single-stage agg, the always-true `_nc >= 0` consumer).  A Spark
    upgrade that changes AQE empty-relation propagation or column
    pruning could silently turn it into a no-op — failing OPEN, the
    exact silently-empty mode it exists to prevent.  Assert it fires
    with AQE both on and off so an upgrade that breaks either path
    turns this test red instead of shipping a dead guard.  (Built and
    pinned on Spark 4.1.x — re-run deliberately on any version bump.)"""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    try:
        emb = table(spark, SF_SMOKE, "embeddings").select(
            "vec_id", F.col("embedding").alias("_v")
        )
        cents = emb.filter(F.col("vec_id") < 0).select(
            F.col("vec_id").alias("cid"), F.col("_v").alias("_cent")
        )
        out = ivf_assign(emb.limit(3), cents, "vec_id", 1, vec_col="_v")
        with pytest.raises(Exception, match="centroid frame is empty"):
            out.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_ivf_assign_nonempty_unaffected(spark):
    """The guard is pass-through for a healthy quantizer: assignment of
    5 vectors to 2 centroids keeps every input row exactly once."""
    emb = table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").alias("_v")
    )
    cents = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("cid"), F.col("_v").alias("_cent")
    )
    out = ivf_assign(emb.filter(F.col("vec_id") < 5), cents, "vec_id", 1, vec_col="_v")
    rows = out.toPandas()
    assert sorted(rows["vec_id"]) == [0, 1, 2, 3, 4]
    assert set(rows["cell"]) <= {0, 7}


def test_streaming_ann_verdict_uses_real_batch_ids(spark, tmp_path_factory):
    """multi_batch_hits must be derived from the batch ids foreachBatch
    actually saw (persisted to the arrivals side table), and the stream
    really did split the 3 staged files into >1 micro-batch."""
    df = REGISTRY["streaming_ann_index_ingest"].fn(spark, SF_SMOKE)
    rows = df.toPandas()
    assert rows["multi_batch_hits"].all()
    # the md5-split labels still cover >1 staged file among the hits
    assert rows["arrival_batch"].nunique() > 1


def test_pq_codebook_is_corpus_only(spark):
    """No quantizer query leak: every codebook id is a corpus id (the
    query residue vec_id % 10 == 3 is excluded), and the draw still
    yields exactly 16 entries over the testdata id space."""
    emb = table(spark, SF_SMOKE, "embeddings").select("vec_id")
    cb_ids = sorted(
        emb.filter((F.col("vec_id") < _PQ_CB_MAX) & (F.col("vec_id") % 10 != 3))
        .toPandas()["vec_id"]
        .tolist()
    )
    assert len(cb_ids) == 16
    assert all(v % 10 != 3 for v in cb_ids)


def test_recursive_child_session_cached(spark):
    """One child session per SparkContext: two invocations reuse the
    same newSession() handle (no per-run JVM session accumulation), and
    the recursion row-cap raise is present on it."""
    a = _child_session(spark)
    b = _child_session(spark)
    assert a is b
    assert a is not spark
    assert a.conf.get("spark.sql.cteRecursionRowLimit") == "100000000"


def test_trained_index_quantizer_moved(spark):
    """ann_ivf_trained_index: the persisted quantizer must be the TRAINED
    centroids (differs from the seed vectors), every query gets exactly
    k=5 ranked hits, and cos values match the raw-embedding cosine for
    the returned pairs (the probe serves real vectors, not artifacts)."""
    df = REGISTRY["ann_ivf_trained_index"].fn(spark, SF_SMOKE)
    rows = df.toPandas()
    assert rows["quantizer_trained"].all()
    per_q = rows.groupby("q_id")["rank"].agg(["count", "min", "max"])
    assert (per_q["count"] == 5).all()
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] == 5).all()
    # spot-check one hit's cosine against the raw embeddings
    import math
    r0 = rows.iloc[0]
    emb = {
        r.vec_id: list(r.embedding)
        for r in table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id").isin(int(r0["q_id"]), int(r0["vec_id"])))
        .toPandas()
        .itertuples()
    }
    a, b = emb[r0["q_id"]], emb[r0["vec_id"]]
    dot = sum(x * y for x, y in zip(a, b))
    cos = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    assert abs(round(cos, 4) - r0["cos"]) < 1e-9


def test_ivf_pq_hybrid_recall_and_shape(spark):
    """ann_ivf_pq_topk: exactly k=5 ranked hits per query, hybrid recall
    is nontrivial (the cell-pruned integer ADC scan still finds most of
    the exact top-k), and every returned cos is a real [-1, 1] cosine."""
    df = REGISTRY["ann_ivf_pq_topk"].fn(spark, SF_SMOKE)
    rows = df.toPandas()
    per_q = rows.groupby("q_id")["rank"].agg(["count", "min", "max"])
    assert (per_q["count"] == 5).all()
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] == 5).all()
    assert rows["cos"].between(-1.0, 1.0).all()
    # recall over all queries: the testdata embeddings are structure-free
    # (no planted clusters), so IVF's reachable recall is bounded near
    # nprobe/k_cells = 25% of the corpus; observed 0.24 at sf0.001. Pin
    # "nontrivial and rank-1s land": recall above 0.1 and at least half
    # the queries recover their exact nearest neighbor among the hits.
    assert rows["in_exact_topk"].mean() >= 0.1
    top1 = rows[rows["rank"] == 1]
    assert top1["in_exact_topk"].mean() >= 0.5


def test_filtered_topk_semantics(spark):
    """ann_filtered_topk: every returned hit matches its query's target
    label (the pre-filter guarantee), each query gets exactly k=5 hits,
    and the post-filter comparison shows a real deficit somewhere."""
    df = REGISTRY["ann_filtered_topk"].fn(spark, SF_SMOKE)
    rows = df.toPandas()
    per_q = rows.groupby("q_id")["rank"].agg(["count", "min", "max"])
    assert (per_q["count"] == 5).all()
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] == 5).all()
    # pre-filter guarantee: verify labels against the raw table
    labels = {
        r.vec_id: r.label
        for r in table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .toPandas()
        .itertuples()
    }
    assert all(labels[v] == t for v, t in zip(rows["vec_id"], rows["target_label"]))
    # the 10 queries sweep all 10 labels
    assert sorted(rows["target_label"].unique()) == list(range(10))
    # post-filter failure is real at smoke scale (10% selectivity vs a
    # 25-deep shortlist) and post_hits is bounded by k
    assert rows["post_deficit"].all()
    assert rows["post_hits"].between(0, 5).all()
