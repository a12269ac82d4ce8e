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
    global_cummin,
    global_cumsum,
    global_row_number,
    int_div,
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


def test_global_cummin_matches_window(frame):
    for exclusive in (False, True):
        w = Window.orderBy("key", "k").rowsBetween(
            Window.unboundedPreceding, -1 if exclusive else 0
        )
        exp = frame.withColumn("m", F.min("v").over(w))
        got = global_cummin(
            frame, ["key", "k"], "v", out_col="m", exclusive=exclusive
        )
        g = sorted(got.select("k", "m").collect())
        e = sorted(exp.select("k", "m").collect())
        assert g == e
        _no_global_window(got)
    assert global_cummin(
        frame.limit(0), ["k"], "v", exclusive=True
    ).count() == 0


def test_exact_rank_values_total_col(frame):
    lo = lambda n: int_div(n + 1, 2)  # noqa: E731
    picks = exact_rank_values(frame, ["v", "k"], [lo], total_col="n_total")
    rows = picks.select("rn", "n_total").collect()
    assert len(rows) == 1
    assert rows[0]["n_total"] == 997
    assert rows[0]["rn"] == 499  # (997+1) div 2


def test_int_div_exact_past_double_precision(spark):
    # floor(a/b) via IEEE double mis-rounds above 2^53; int_div must not
    big = 2**62 + 3
    df = spark.range(1).select(F.lit(big).cast("long").alias("n"))
    got = df.select(int_div(F.col("n") + 1, 2).alias("d")).collect()[0]["d"]
    assert got == (big + 1) // 2
    flo = df.select(
        F.floor((F.col("n") + 1) / 2).cast("long").alias("d")
    ).collect()[0]["d"]
    assert flo != got  # the bug int_div exists to avoid


def test_global_cumsum_rejects_mixed_col_kinds(frame):
    with pytest.raises(TypeError):
        global_cumsum(frame, ["key", "k"], ["v", "v"])  # out_col stays str


def test_global_cumsum_rn_col_shares_pass(frame):
    w = Window.orderBy("key", "k")
    exp = frame.withColumn(
        "cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    ).withColumn("rn", F.row_number().over(w))
    got = global_cumsum(frame, ["key", "k"], "v", out_col="cum", rn_col="rn")
    assert sorted(got.select("k", "cum", "rn").collect()) == sorted(
        exp.select("k", "cum", "rn").collect()
    )
    _no_global_window(got)
    # one range pass: exactly one range exchange in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") <= 1


def test_exact_rank_values_rejects_non_integral_rank(frame):
    # A fractional rank expression is a caller bug; the long-cast _ranks
    # array could otherwise match the truncated rank and return plausible
    # rows.  The in-plan assert_true must fail the job loudly instead.
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    picks = exact_rank_values(
        frame,
        ["v", "k"],
        [lambda n: n / 4],  # double division -> non-integral for n=997
        rn_col="rn",
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        picks.collect()
