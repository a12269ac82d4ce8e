"""Differential testing for the binned join family: on randomized
inputs and bin widths, every primitive must match a row-at-a-time
brute-force reference — point-in-interval (both modes), interval
overlap (including the claim-exactly-once dedup property), and the
2-D grid containment."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from job_datapipeline_spark.operators.rangejoin import (
    bin_range_join,
    grid_containment_join,
    interval_overlap_join,
)

pt = st.tuples(st.integers(0, 5000), st.integers(0, 100))
ivl = st.tuples(st.integers(0, 5000), st.integers(0, 100), st.integers(0, 60))
widths = st.sampled_from([1, 3, 17, 64, 5000])


@settings(max_examples=6, deadline=None)
@given(
    pts=st.lists(pt, min_size=1, max_size=10, unique_by=lambda p: p[0]),
    ivls=st.lists(ivl, min_size=0, max_size=8, unique_by=lambda i: i[0]),
    w=widths,
)
def test_bin_range_join_matches_bruteforce(spark, pts, ivls, w):
    pdf = spark.createDataFrame(
        [(pid, t) for pid, t in pts], "p_id long, t long"
    )
    idf = spark.createDataFrame(
        [(iid, lo, lo + span) for iid, lo, span in ivls],
        "i_id long, lo long, hi long",
    )
    got = {
        (r.p_id, r.i_id)
        for r in bin_range_join(
            pdf, idf, point_col="t", lo_col="lo", hi_col="hi", bin_width=w
        ).collect()
    }
    expected = {
        (pid, iid)
        for pid, t in pts
        for iid, lo, span in ivls
        if lo <= t <= lo + span
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    pts=st.lists(pt, min_size=1, max_size=8, unique_by=lambda p: p[0]),
    ivls=st.lists(ivl, min_size=0, max_size=6, unique_by=lambda i: i[0]),
    w=widths,
)
def test_left_point_matches_bruteforce(spark, pts, ivls, w):
    pdf = spark.createDataFrame(
        [(pid, t) for pid, t in pts], "p_id long, t long"
    )
    idf = spark.createDataFrame(
        [(iid, lo, lo + span) for iid, lo, span in ivls],
        "i_id long, lo long, hi long",
    )
    rows = bin_range_join(
        pdf, idf, point_col="t", lo_col="lo", hi_col="hi", bin_width=w,
        how="left_point",
    ).collect()
    got = {(r.p_id, r.i_id) for r in rows}
    expected = set()
    for pid, t in pts:
        hits = [iid for iid, lo, span in ivls if lo <= t <= lo + span]
        if hits:
            expected |= {(pid, iid) for iid in hits}
        else:
            expected.add((pid, None))
    assert got == expected
    # LEFT multiplicity: every point id appears at least once
    assert {r.p_id for r in rows} == {pid for pid, _ in pts}


@settings(max_examples=6, deadline=None)
@given(
    a=st.lists(ivl, min_size=1, max_size=8, unique_by=lambda i: i[0]),
    b=st.lists(ivl, min_size=0, max_size=8, unique_by=lambda i: i[0]),
    w=widths,
)
def test_interval_overlap_matches_bruteforce(spark, a, b, w):
    adf = spark.createDataFrame(
        [(i, lo, lo + s) for i, lo, s in a], "a_id long, alo long, ahi long"
    )
    bdf = spark.createDataFrame(
        [(i, lo, lo + s) for i, lo, s in b], "b_id long, blo long, bhi long"
    )
    rows = [
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            adf, bdf, left_lo="alo", left_hi="ahi",
            right_lo="blo", right_hi="bhi", bin_width=w,
        ).collect()
    ]
    expected = {
        (ai, bi)
        for ai, alo, asp in a
        for bi, blo, bsp in b
        if alo <= blo + bsp and blo <= alo + asp
    }
    # claim-exactly-once: no duplicates without any distinct
    assert len(rows) == len(set(rows))
    assert set(rows) == expected


gpt = st.tuples(st.integers(0, 3000), st.integers(0, 80), st.integers(0, 80))
grect = st.tuples(
    st.integers(0, 3000),
    st.integers(0, 80), st.integers(0, 40),
    st.integers(0, 80), st.integers(0, 40),
)


@settings(max_examples=6, deadline=None)
@given(
    pts=st.lists(gpt, min_size=1, max_size=8, unique_by=lambda p: p[0]),
    rects=st.lists(grect, min_size=0, max_size=6, unique_by=lambda r: r[0]),
    cell=st.sampled_from([1, 7, 50, 4000]),
)
def test_grid_containment_matches_bruteforce_prop(spark, pts, rects, cell):
    pdf = spark.createDataFrame(
        [(pid, x, y) for pid, x, y in pts], "p_id long, x long, y long"
    )
    rdf = spark.createDataFrame(
        [(rid, xlo, xlo + xs, ylo, ylo + ys) for rid, xlo, xs, ylo, ys in rects],
        "r_id long, xlo long, xhi long, ylo long, yhi long",
    )
    rows = [
        (r.p_id, r.r_id)
        for r in grid_containment_join(
            pdf, rdf, x_col="x", y_col="y",
            x_lo="xlo", x_hi="xhi", y_lo="ylo", y_hi="yhi", cell=cell,
        ).collect()
    ]
    expected = {
        (pid, rid)
        for pid, x, y in pts
        for rid, xlo, xs, ylo, ys in rects
        if xlo <= x <= xlo + xs and ylo <= y <= ylo + ys
    }
    assert len(rows) == len(set(rows))
    assert set(rows) == expected


# ---------------------------------------------------------------------------
# exact_rank_values (touched this round: array-keep rewrite)
# ---------------------------------------------------------------------------

from job_datapipeline_spark.operators.ranks import exact_rank_values, int_div


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=30),
    divisors=st.lists(st.sampled_from([2, 3, 4, 10, 16]), min_size=1,
                      max_size=3, unique=True),
)
def test_exact_rank_values_matches_sorted_reference(spark, vals, divisors):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    ranks = [(lambda n, d=d: int_div(n + d - 1, d)) for d in divisors]
    got = {
        (r.rn, r.v, r.t)
        for r in exact_rank_values(
            df, ["v", "id"], ranks, rn_col="rn", total_col="t"
        ).collect()
    }
    n = len(vals)
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    expected = {
        ((n + d - 1) // d, ordered[(n + d - 1) // d - 1][1], n)
        for d in divisors
        if 1 <= (n + d - 1) // d <= n
    }
    assert got == expected
