"""Round-6 regression tests for the two round-5 driver-red findings and the
ADVICE items: the local oracle harness must flag int-vs-float dtype pairs
(the exact hole that let two un-CAST ``sum()``-derived oracle columns ship
red), and the Viterbi bitmask capacity guard must fail loudly instead of
silently wrapping int64."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from job_datapipeline_spark.plans.llm_round5bb import (
    _BURST_MAX_DAYS,
    _capacity_guard,
)
from job_datapipeline_spark.testing import compare


def test_compare_flags_int_vs_float_dtype_pair():
    """A deliberately un-CAST oracle column: DuckDB HUGEINT renders as
    float64 (877.0) against Spark's int64 (877).  Values are numerically
    equal — the driver's rendered-value hash still mismatches, so the
    local mirror must flag the pair rather than exempt it."""
    sdf = pd.DataFrame({"k": ["a", "b"], "v": pd.array([877, 14633], dtype="int64")})
    odf = pd.DataFrame({"k": ["a", "b"], "v": pd.array([877.0, 14633.0], dtype="float64")})
    problems = compare(sdf, odf)
    assert any("dtype kind" in p for p in problems), problems


def test_compare_still_green_on_matching_dtypes():
    df = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1, 2], dtype="int64")})
    assert compare(df, df.copy()) == []


def test_burst_viterbi_guard_raises_beyond_capacity(spark):
    from pyspark.sql import functions as F

    over = _BURST_MAX_DAYS + 1
    df = spark.range(1).select(
        F.lit("login").alias("event_type"),
        F.transform(
            F.sequence(F.lit(1), F.lit(over)),
            lambda i: F.struct(
                F.date_add(F.lit("2024-01-01").cast("date"), i).alias("day"),
                i.cast("long").alias("n"),
            ),
        ).alias("meta"),
    )
    with pytest.raises(Exception, match="bitmask capacity"):
        df.withColumn("meta", _capacity_guard()).select(
            F.size("meta")
        ).collect()


def test_burst_viterbi_guard_passes_at_capacity(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit("login").alias("event_type"),
        F.transform(
            F.sequence(F.lit(1), F.lit(_BURST_MAX_DAYS)),
            lambda i: F.struct(
                F.date_add(F.lit("2024-01-01").cast("date"), i).alias("day"),
                i.cast("long").alias("n"),
            ),
        ).alias("meta"),
    )
    out = df.withColumn("meta", _capacity_guard()).select(F.size("meta").alias("s")).collect()
    assert out[0]["s"] == _BURST_MAX_DAYS


def test_scratch_root_registered_for_atexit_cleanup():
    """_scratch_dir registers its per-pid root for interpreter-exit rmtree
    (a '/tmp reaper' is not guaranteed on Linux hosts)."""
    from job_datapipeline_spark.plans import queries as q

    path = q._scratch_dir("round6_atexit_probe")
    assert os.path.isdir(path)
    root = os.path.dirname(path)
    assert root in q._SCRATCH_ROOTS
    assert f"_{os.getpid()}" in root


_REWRITTEN_WEAK_PLANS = [
    "ml_em_gaussian_mixture",
    "causal_matched_cohort",
    "corpus_curriculum_schedule",
    "orders_rfm_segmentation",
    "orders_abc_classification",
    "orders_abc_xyz_matrix",
    "mart_star_schema_build",
    # round-6 additions beyond the judge's seven: near-row-cardinality
    # value domains (KS/Mann-Whitney ECDF cumsums) and the supplier dim
    "agg_ks_test",
    "agg_mann_whitney",
    "supplier_scorecard",
]


@pytest.mark.parametrize("name", _REWRITTEN_WEAK_PLANS)
def test_no_single_partition_window_in_rewritten_plans(spark, name):
    """The round-5 'weak plan' family: after the operators/ranks rewrite,
    none of these seven queries may contain a WindowExec fed by an
    Exchange SinglePartition (the 'Moving all data to a single partition'
    anti-pattern) anywhere in its physical plan."""
    from job_datapipeline_spark.plans.queries import REGISTRY
    from job_datapipeline_spark.testing import single_partition_windows

    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
    hits = single_partition_windows(df)
    assert hits == [], f"{name} still has single-partition windows: {hits}"
