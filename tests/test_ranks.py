"""operators/ranks.py — the distributed total-order primitives must agree
exactly with the single-partition window forms they replace, across
partition counts and sort directions, and their physical plans must be
free of unpartitioned WindowExec nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from job_datapipeline_spark.operators.ranks import (
    exact_ntile,
    exact_rank_values,
    global_cumsum,
    global_row_number,
    ordered_neighbor_carry,
)


@pytest.fixture(scope="module")
def frame(spark):
    # 997 rows, deliberately awkward key distribution (clustered + skewed)
    return (
        spark.range(997)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 37) % 113).alias("key"),
            ((F.col("id") * 7) % 50 + 1).alias("v"),
        )
        .localCheckpoint()
    )


def _no_global_window(df):
    from job_datapipeline_spark.testing import single_partition_windows

    assert single_partition_windows(df) == []


def test_global_row_number_matches_window(frame):
    got = global_row_number(frame, [F.col("key").desc(), "k"], rn_col="rn")
    exp = frame.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("key").desc(), "k"))
    )
    assert sorted(got.select("k", "rn").collect()) == sorted(
        exp.select("k", "rn").collect()
    )
    _no_global_window(got)


def test_global_cumsum_matches_window(frame):
    got = global_cumsum(frame, ["key", "k"], "v", out_col="cum")
    w = Window.orderBy("key", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = frame.withColumn("cum", F.sum("v").over(w).cast("long"))
    assert sorted(got.select("k", "cum").collect()) == sorted(
        exp.select("k", "cum").collect()
    )
    _no_global_window(got)


@pytest.mark.parametrize("k", [2, 5, 7, 1000])
def test_exact_ntile_matches_window(frame, k):
    got = exact_ntile(frame, ["key", "k"], k, out_col="b")
    exp = frame.withColumn("b", F.ntile(k).over(Window.orderBy("key", "k")))
    assert sorted(got.select("k", "b").collect()) == sorted(
        exp.select("k", "b").collect()
    )
    _no_global_window(got)


def test_exact_rank_values_picks_percentiles(frame):
    picks = exact_rank_values(
        frame,
        ["v", "k"],
        [
            lambda n: F.floor((n + 3) / 4).cast("long"),
            lambda n: F.floor((3 * n + 3) / 4).cast("long"),
        ],
        rn_col="rn",
    )
    rows = {r["rn"]: r["v"] for r in picks.collect()}
    exp = frame.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "k"))
    ).collect()
    n = len(exp)
    want = {(n + 3) // 4, (3 * n + 3) // 4}
    assert set(rows) == want
    by_rn = {r["rn"]: r["v"] for r in exp}
    for rk, v in rows.items():
        assert by_rn[rk] == v
    _no_global_window(picks)


def test_ordered_neighbor_carry_matches_window(frame):
    df = frame.withColumn("flag", (F.col("k") % 11) == 3)
    got = ordered_neighbor_carry(df, ["key", "k"], "flag", ["v", "k"])
    wp = Window.orderBy("key", "k").rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy("key", "k").rowsBetween(1, Window.unboundedFollowing)
    pv = F.when(F.col("flag"), F.struct("v", "k"))
    exp = (
        df.withColumn("_p", F.last(pv, ignorenulls=True).over(wp))
        .withColumn("_n", F.first(pv, ignorenulls=True).over(wn))
        .select(
            "k",
            F.col("_p")["v"].alias("_prev_v"),
            F.col("_p")["k"].alias("_prev_k"),
            F.col("_n")["v"].alias("_next_v"),
            F.col("_n")["k"].alias("_next_k"),
        )
    )
    g = sorted(
        got.select("k", "_prev_v", "_prev_k", "_next_v", "_next_k").collect()
    )
    e = sorted(exp.collect())
    assert g == e
    _no_global_window(got)


def test_empty_frame_is_safe(spark):
    empty = spark.range(0).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    assert global_row_number(empty, ["k"]).count() == 0
    assert global_cumsum(empty, ["k"], "v").count() == 0
    assert exact_ntile(empty, ["k"], 4).count() == 0
