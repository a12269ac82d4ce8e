"""Differential testing for the as-of join: every direction/tolerance
combination must match an independent brute-force reference on randomized
inputs (hypothesis), and the nearest form must not pay a second shuffle."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from job_datapipeline_spark.operators.asof import asof_join

row_l = st.tuples(st.integers(0, 2), st.integers(0, 40))
row_r = st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 999))


def _brute(left, right, direction, tol):
    """Reference implementation, row-at-a-time, mirroring the documented
    semantics: backward <=, forward >=, nearest = closer of backward and
    STRICTLY-after forward, ties preferring backward; tolerance per arm;
    equal-ts right rows -> backward takes max rid, forward min rid."""
    out = {}
    for k, ts in left:
        back = [r for r in right if r[0] == k and r[1] <= ts and (tol is None or ts - r[1] <= tol)]
        b = max(back, key=lambda r: (r[1], r[2])) if back else None
        if direction == "backward":
            out[(k, ts)] = b and b[2]
            continue
        if direction == "forward":
            fwd = [r for r in right if r[0] == k and r[1] >= ts and (tol is None or r[1] - ts <= tol)]
            f = min(fwd, key=lambda r: (r[1], r[2])) if fwd else None
            out[(k, ts)] = f and f[2]
            continue
        fwd = [r for r in right if r[0] == k and r[1] > ts and (tol is None or r[1] - ts <= tol)]
        f = min(fwd, key=lambda r: (r[1], r[2])) if fwd else None
        if b is not None and (f is None or ts - b[1] <= f[1] - ts):
            out[(k, ts)] = b[2]
        else:
            out[(k, ts)] = f and f[2]
    return out


@settings(max_examples=8, deadline=None)
@given(
    left=st.lists(row_l, min_size=1, max_size=8, unique=True),
    right=st.lists(row_r, min_size=0, max_size=8, unique_by=lambda r: (r[0], r[1])),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 0, 5, 100]),
)
def test_asof_matches_bruteforce(spark, left, right, direction, tol):
    ldf = spark.createDataFrame([(k, t) for k, t in left], "k long, ts long")
    rdf = (
        spark.createDataFrame(right, "k long, ts long, rid long")
        if right
        else spark.createDataFrame([], "k long, ts long, rid long")
    )
    got = {
        (r["k"], r["ts"]): r["rid"]
        for r in asof_join(
            ldf, rdf, "k", "k", "ts", "ts", ["rid"],
            right_order="rid", direction=direction,
            tolerance=None if tol is None else str(tol),
        ).collect()
    }
    assert got == _brute(left, right, direction, tol)


def test_asof_nearest_single_shuffle(spark):
    """Both nearest arms ride ONE sort order: exactly one Exchange for the
    window stage (no second shuffle for the forward arm)."""
    ldf = spark.range(10).selectExpr("id % 3 AS k", "id AS ts")
    rdf = spark.range(10).selectExpr("id % 3 AS k", "id * 2 AS ts", "id AS rid")
    df = asof_join(ldf, rdf, "k", "k", "ts", "ts", ["rid"], direction="nearest")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning(_k")
    assert n_exchanges == 1, plan
