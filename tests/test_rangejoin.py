"""operators/rangejoin.bin_range_join must agree exactly with the naive
inequality join it replaces, across bin widths and join modes, and must
compile to an equi-join (never a BroadcastNestedLoopJoin/Cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_datapipeline_spark.operators.rangejoin import bin_range_join


@pytest.fixture(scope="module")
def frames(spark):
    pts = spark.createDataFrame(
        [(i, i % 3, (i * 37) % 500) for i in range(200)],
        "p_id long, grp long, t long",
    ).localCheckpoint()
    # intervals of width 0..120, some empty, some spanning many bins
    ivl = spark.createDataFrame(
        [
            (j, j % 3, (j * 83) % 450, (j * 83) % 450 + (j * 7) % 121)
            for j in range(60)
        ],
        "i_id long, grp long, lo long, hi long",
    ).localCheckpoint()
    return pts, ivl


def _naive(pts, ivl):
    a, b = pts.alias("a"), ivl.alias("b")
    cond = (
        (F.col("a.t") >= F.col("b.lo"))
        & (F.col("a.t") <= F.col("b.hi"))
        & (F.col("a.grp") == F.col("b.grp"))
    )
    return a.join(b, cond).select("a.p_id", "b.i_id")


@pytest.mark.parametrize("width", [7, 50, 1000])
def test_inner_matches_naive_join(spark, frames, width):
    pts, ivl = frames
    got = bin_range_join(
        pts,
        ivl,
        point_col="t",
        lo_col="lo",
        hi_col="hi",
        bin_width=width,
        keys=["grp"],
    ).select("p_id", "i_id")
    assert sorted(got.collect()) == sorted(_naive(pts, ivl).collect())
    # no duplicate pairs: a point meets an interval in exactly one bin
    assert got.count() == got.distinct().count()


def test_left_point_keeps_unmatched_points(spark, frames):
    pts, ivl = frames
    got = bin_range_join(
        pts,
        ivl,
        point_col="t",
        lo_col="lo",
        hi_col="hi",
        bin_width=50,
        keys=["grp"],
        how="left_point",
    )
    matched = {r["p_id"] for r in _naive(pts, ivl).collect()}
    rows = got.collect()
    # matched points appear once per matching interval, with i_id set
    assert sorted(
        (r["p_id"], r["i_id"]) for r in rows if r["i_id"] is not None
    ) == sorted(_naive(pts, ivl).collect())
    # unmatched points appear exactly once, all-null interval side
    unmatched = [r for r in rows if r["i_id"] is None]
    assert {r["p_id"] for r in unmatched} == (
        {r["p_id"] for r in pts.collect()} - matched
    )
    assert len(unmatched) == len({r["p_id"] for r in unmatched})


def test_plan_is_equi_join(spark, frames):
    pts, ivl = frames
    plan = (
        bin_range_join(
            pts,
            ivl,
            point_col="t",
            lo_col="lo",
            hi_col="hi",
            bin_width=50,
            keys=["grp"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bad_args_raise(spark, frames):
    pts, ivl = frames
    with pytest.raises(ValueError):
        bin_range_join(
            pts, ivl, point_col="t", lo_col="lo", hi_col="hi", bin_width=0
        )
    with pytest.raises(ValueError):
        bin_range_join(
            pts,
            ivl,
            point_col="t",
            lo_col="lo",
            hi_col="hi",
            bin_width=10,
            how="full",
        )
