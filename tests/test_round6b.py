"""Round-6 first batch — pure-python differential replays over sf0.001
for the ranks-primitive surface (Lorenz, length deciles, exact
median/MAD) and the corpus-statistics pair (Heaps' law, n-gram
novelty), plus plan pins: none of the five may contain a
single-partition window."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from job_datapipeline_spark.catalog import table
from job_datapipeline_spark.plans.queries import REGISTRY
from job_datapipeline_spark.testing import single_partition_windows

from conftest import SF_SMOKE

_R6_QUERIES = [
    "orders_lorenz_curve",
    "corpus_length_deciles",
    "agg_exact_median_mad",
    "corpus_heaps_law",
    "text_ngram_novelty",
]


def _ntile(sorted_keys: list, k: int) -> dict:
    n = len(sorted_keys)
    base, rem = divmod(n, k)
    out, pos = {}, 0
    for b in range(1, k + 1):
        size = base + (1 if b <= rem else 0)
        for key in sorted_keys[pos : pos + size]:
            out[key] = b
        pos += size
    return out


def test_lorenz_curve_matches_pure_python(spark):
    spend = defaultdict(int)
    for r in table(spark, SF_SMOKE, "orders").collect():
        spend[r["o_custkey"]] += int(round(r["o_totalprice"] * 100))
    order = sorted(spend, key=lambda ck: (spend[ck], ck))
    decile_of = _ntile(order, 10)
    per = defaultdict(lambda: [0, 0])
    for ck, d in decile_of.items():
        per[d][0] += 1
        per[d][1] += spend[ck]
    total = sum(spend.values())
    rows = REGISTRY["orders_lorenz_curve"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    cum = 0
    for row in sorted(rows, key=lambda r: r["decile"]):
        d = row["decile"]
        cum += per[d][1]
        assert row["n_customers"] == per[d][0]
        assert row["decile_cents"] == per[d][1]
        assert row["cum_cents"] == cum
        assert row["cum_share_micro"] == round(1_000_000.0 * cum / total)
    # the Lorenz property: cumulative share is convex-ish / monotone
    shares = [r["cum_share_micro"] for r in sorted(rows, key=lambda r: r["decile"])]
    assert shares == sorted(shares) and shares[-1] == 1_000_000


def test_exact_median_mad_matches_pure_python(spark):
    vals = sorted(
        (int(round(r["o_totalprice"] * 100)), r["o_orderkey"])
        for r in table(spark, SF_SMOKE, "orders").collect()
    )
    n = len(vals)
    med_x2 = vals[(n + 1) // 2 - 1][0] + vals[(n + 2) // 2 - 1][0]
    devs = sorted(
        (abs(2 * v - med_x2), k) for v, k in vals
    )
    mad_x4 = devs[(n + 1) // 2 - 1][0] + devs[(n + 2) // 2 - 1][0]
    row = REGISTRY["agg_exact_median_mad"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_orders"] == n
    assert row["median_cents_x2"] == med_x2
    assert row["mad_cents_x4"] == mad_x4


def test_heaps_law_matches_pure_python(spark):
    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in table(spark, SF_SMOKE, "documents").collect()
    }
    first = {}
    for did in sorted(docs):
        for t in docs[did]:
            first.setdefault(t, did)
    new_per_doc = defaultdict(int)
    for t, did in first.items():
        new_per_doc[did] += 1
    order = sorted(docs)
    decile_of = _ntile(order, 10)
    agg = defaultdict(lambda: [0, 0, 0])
    for did in order:
        d = decile_of[did]
        agg[d][0] += 1
        agg[d][1] += len(docs[did])
        agg[d][2] += new_per_doc.get(did, 0)
    rows = REGISTRY["corpus_heaps_law"].fn(spark, SF_SMOKE).collect()
    cum_tok = cum_voc = 0
    for row in sorted(rows, key=lambda r: r["decile"]):
        d = row["decile"]
        cum_tok += agg[d][1]
        cum_voc += agg[d][2]
        assert row["n_docs"] == agg[d][0]
        assert row["cum_tokens"] == cum_tok
        assert row["cum_vocab"] == cum_voc
    # final vocab == total distinct types
    assert cum_voc == len(first)


def test_ngram_novelty_matches_pure_python(spark):
    n = 5
    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in table(spark, SF_SMOKE, "documents").collect()
    }

    def grams(toks):
        return {
            hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
            for i in range(len(toks) - n + 1)
        }

    ref = set()
    for did, t in docs.items():
        if did % 2 == 0:
            ref |= grams(t)
    expected = {}
    for did, t in docs.items():
        if did % 2 == 1:
            g = grams(t)
            if g:
                novel = len(g - ref)
                expected[did] = (len(g), novel, (novel * 1000) // len(g))
    rows = REGISTRY["text_ngram_novelty"].fn(spark, SF_SMOKE).collect()
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_permille"])
        for r in rows
    }
    assert got == expected


@pytest.mark.parametrize("name", _R6_QUERIES)
def test_r6_plans_have_no_single_partition_window(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    assert single_partition_windows(df) == []
