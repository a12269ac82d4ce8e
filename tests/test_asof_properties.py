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


# --- mixture sampling: exact pure-python replay ----------------------------

def test_mixture_sample_exact_replay(spark, sf_dir):
    """The kept row set is a deterministic function of (counts, weights,
    salt) — recompute it row-by-row in pure python and demand EXACT
    equality, not statistical closeness."""
    import hashlib

    from job_datapipeline_spark.catalog import table as _table
    from job_datapipeline_spark.operators.sampling import mixture_sample

    docs = _table(spark, sf_dir, "documents").select("doc_id", "lang")
    weights = {"en": 0.25, "de": 0.1875, "es": 0.1875, "fr": 0.1875, "zh": 0.1875}
    rows = [(r["doc_id"], r["lang"]) for r in docs.collect()]

    counts = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    m = min(counts[g] / w for g, w in weights.items())
    expected = set()
    for doc_id, lang in rows:
        p = min(weights[lang] * m / float(counts[lang]), 1.0)
        thr = "g" if p >= 1.0 else format(int(p * 4294967296.0), "08x")
        draw = hashlib.md5(f"x:{doc_id}".encode()).hexdigest()[:8]
        if draw < thr:
            expected.add(doc_id)

    got = {
        r["doc_id"]
        for r in mixture_sample(docs, "lang", weights, "doc_id", salt="x").collect()
    }
    assert got == expected


# --- funnel: brute-force differential --------------------------------------

from job_datapipeline_spark.operators.funnel import funnel_steps

ev_row = st.tuples(st.integers(0, 2), st.integers(0, 20), st.sampled_from(["a", "b", "c", "x"]))


def _brute_funnel(rows, steps):
    out = {}
    for u in {r[0] for r in rows}:
        mine = [r for r in rows if r[0] == u]
        t_prev, anchors = None, []
        for s in steps:
            cand = [ts for (_, ts, t) in mine if t == s and (t_prev is None or ts >= t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            anchors.append(t_prev)
        if anchors:
            out[u] = (len(anchors), anchors)
    return out


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(ev_row, min_size=1, max_size=20, unique_by=lambda r: (r[0], r[1], r[2])))
def test_funnel_matches_bruteforce(spark, rows):
    # dedupe (user, ts): equal-ts different-type events make min(ts)
    # anchors ambiguous only in the brute model, not the operator; keep one
    seen, uniq = set(), []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            uniq.append(r)
    ev = spark.createDataFrame(uniq, "user_id long, ts long, event_type string")
    got = {
        r["user_id"]: (r["reached"], [r[f"t{i}"] for i in range(1, 4) if r[f"t{i}"] is not None])
        for r in funnel_steps(ev, ["a", "b", "c"]).collect()
    }
    assert got == _brute_funnel(uniq, ["a", "b", "c"])
