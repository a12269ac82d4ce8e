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


def test_left_point_null_interval_columns_still_match(spark):
    # an interval row whose first non-key data column is NULL must still
    # register as a match (sentinel is an internal flag, not data nullness)
    pts = spark.createDataFrame([(1, 10), (2, 999)], "p_id long, t long")
    ivl = spark.createDataFrame(
        [(None, 0, 20)], "label string, lo long, hi long"
    )
    rows = bin_range_join(
        pts,
        ivl,
        point_col="t",
        lo_col="lo",
        hi_col="hi",
        bin_width=8,
        how="left_point",
    ).collect()
    by_pid = {r["p_id"]: r for r in rows}
    assert len(rows) == 2
    assert by_pid[1]["lo"] == 0 and by_pid[1]["hi"] == 20  # matched
    assert by_pid[2]["lo"] is None and by_pid[2]["hi"] is None  # unmatched


def test_left_point_duplicate_unmatched_rows_kept(spark):
    # fully-duplicate unmatched point rows keep LEFT-join multiplicity
    pts = spark.createDataFrame(
        [(7, 999), (7, 999), (7, 999)], "p_id long, t long"
    )
    ivl = spark.createDataFrame([(1, 0, 20)], "i_id long, lo long, hi long")
    got = bin_range_join(
        pts,
        ivl,
        point_col="t",
        lo_col="lo",
        hi_col="hi",
        bin_width=8,
        how="left_point",
    )
    assert got.count() == 3
    assert all(r["i_id"] is None for r in got.collect())


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


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------

from job_datapipeline_spark.operators.rangejoin import interval_overlap_join  # noqa: E402


@pytest.fixture(scope="module")
def interval_frames(spark):
    a = spark.createDataFrame(
        [
            (i, i % 2, (i * 53) % 400, (i * 53) % 400 + (i * 11) % 90)
            for i in range(80)
        ],
        "a_id long, grp long, a_lo long, a_hi long",
    ).localCheckpoint()
    b = spark.createDataFrame(
        [
            (j, j % 2, (j * 71) % 380, (j * 71) % 380 + (j * 13) % 130)
            for j in range(70)
        ],
        "b_id long, grp long, b_lo long, b_hi long",
    ).localCheckpoint()
    return a, b


def _naive_overlap(a, b):
    x, y = a.alias("x"), b.alias("y")
    cond = (
        (F.col("x.a_lo") <= F.col("y.b_hi"))
        & (F.col("y.b_lo") <= F.col("x.a_hi"))
        & (F.col("x.grp") == F.col("y.grp"))
    )
    return x.join(y, cond).select("x.a_id", "y.b_id")


@pytest.mark.parametrize("width", [13, 64, 5000])
def test_overlap_matches_naive_join(spark, interval_frames, width):
    a, b = interval_frames
    got = interval_overlap_join(
        a,
        b,
        left_lo="a_lo",
        left_hi="a_hi",
        right_lo="b_lo",
        right_hi="b_hi",
        bin_width=width,
        keys=["grp"],
    ).select("a_id", "b_id")
    assert sorted(got.collect()) == sorted(_naive_overlap(a, b).collect())
    # claimed exactly once: no duplicate pairs at any bin width
    assert got.count() == got.distinct().count()


def test_overlap_plan_is_equi_join(spark, interval_frames):
    a, b = interval_frames
    plan = (
        interval_overlap_join(
            a,
            b,
            left_lo="a_lo",
            left_hi="a_hi",
            right_lo="b_lo",
            right_hi="b_hi",
            bin_width=64,
            keys=["grp"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_overlap_bad_width_raises(spark, interval_frames):
    a, b = interval_frames
    with pytest.raises(ValueError):
        interval_overlap_join(
            a, b, left_lo="a_lo", left_hi="a_hi",
            right_lo="b_lo", right_hi="b_hi", bin_width=-1,
        )


# ---------------------------------------------------------------------------
# 2-D grid containment
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def grid_frames(spark):
    pts = spark.createDataFrame(
        [(i, (i * 37) % 500, (i * 91) % 400) for i in range(300)],
        "p_id long, x long, y long",
    ).localCheckpoint()
    rects = spark.createDataFrame(
        [
            (
                j,
                (j * 83) % 450,
                (j * 83) % 450 + (j * 7) % 121,
                (j * 59) % 350,
                (j * 59) % 350 + (j * 11) % 97,
            )
            for j in range(80)
        ],
        "r_id long, xlo long, xhi long, ylo long, yhi long",
    ).localCheckpoint()
    return pts, rects


def _naive_grid(pts, rects):
    a, b = pts.alias("a"), rects.alias("b")
    cond = (
        (F.col("a.x") >= F.col("b.xlo"))
        & (F.col("a.x") <= F.col("b.xhi"))
        & (F.col("a.y") >= F.col("b.ylo"))
        & (F.col("a.y") <= F.col("b.yhi"))
    )
    return a.join(b, cond).select("a.p_id", "b.r_id")


@pytest.mark.parametrize("cell", [13, 60, 1000])
def test_grid_containment_matches_naive(spark, grid_frames, cell):
    from job_datapipeline_spark.operators.rangejoin import (
        grid_containment_join,
    )

    pts, rects = grid_frames
    got = grid_containment_join(
        pts, rects, x_col="x", y_col="y",
        x_lo="xlo", x_hi="xhi", y_lo="ylo", y_hi="yhi", cell=cell,
    ).select("p_id", "r_id")
    expected = {(r.p_id, r.r_id) for r in _naive_grid(pts, rects).collect()}
    rows = [(r.p_id, r.r_id) for r in got.collect()]
    assert len(rows) == len(set(rows)), "duplicate pairs (claim broken)"
    assert set(rows) == expected
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
