"""Round-6 sixth batch — pure-python replays for char entropy, supplier
HHI, and Fano burstiness."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from job_datapipeline_spark.catalog import table
from job_datapipeline_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def _round_ha(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_char_entropy_matches_pure_python(spark):
    expected = {}
    for r in table(spark, SF_SMOKE, "documents").collect():
        counts = Counter(r["text"].lower())
        n = sum(counts.values())
        s = 0.0
        for ch in sorted(counts):  # order-pinned fold
            c = float(counts[ch])
            s += c * math.log(c)
        expected[r["doc_id"]] = (n, _round_ha(1000.0 * (math.log(1.0 * n) - s / n)))
    rows = REGISTRY["text_char_entropy"].fn(spark, SF_SMOKE).collect()
    got = {r["doc_id"]: (r["n_chars_counted"], r["entropy_milli"]) for r in rows}
    assert got == expected


def test_supplier_hhi_matches_pure_python(spark):
    snat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in table(spark, SF_SMOKE, "supplier").collect()
    }
    nname = {
        r["n_nationkey"]: r["n_name"]
        for r in table(spark, SF_SMOKE, "nation").collect()
    }
    rev = defaultdict(lambda: defaultdict(int))
    for r in table(spark, SF_SMOKE, "lineitem").collect():
        nat = nname[snat[r["l_suppkey"]]]
        rev[nat][r["l_suppkey"]] += int(round(r["l_extendedprice"] * 100))
    rows = REGISTRY["orders_supplier_hhi"].fn(spark, SF_SMOKE).collect()
    assert {r["nation"] for r in rows} == set(rev)
    for r in rows:
        cents = rev[r["nation"]]
        total = sum(cents.values())
        ssq = sum(c * c for c in cents.values())
        hhi = _round_ha(1_000_000.0 * float(ssq) / (float(total) * total))
        assert r["n_suppliers"] == len(cents)
        assert r["total_cents"] == total
        assert r["hhi_micro"] == hhi
        want = (
            "unconcentrated" if hhi < 150_000
            else "moderate" if hhi < 250_000 else "high"
        )
        assert r["concentration"] == want


def test_fano_matches_pure_python(spark):
    daily = defaultdict(Counter)
    for r in table(spark, SF_SMOKE, "events").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    rows = REGISTRY["events_fano_burstiness"].fn(spark, SF_SMOKE).collect()
    assert {r["event_type"] for r in rows} == set(daily)
    for r in rows:
        counts = list(daily[r["event_type"]].values())
        nd, s, ss = len(counts), sum(counts), sum(c * c for c in counts)
        fano = 1000.0 * (nd * ss - s * s) / ((nd - 1) * s)
        assert r["n_days"] == nd
        assert r["n_events"] == s
        assert r["fano_milli"] == _round_ha(fano)
        assert r["bursty"] == (fano > 1500.0)
