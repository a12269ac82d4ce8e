"""Round-6 fourth batch — differential replays for PR/AP, gains table,
and Neyman allocation, plus plan pins."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pytest

from job_datapipeline_spark.catalog import table
from job_datapipeline_spark.plans.queries import REGISTRY
from job_datapipeline_spark.testing import single_partition_windows

from conftest import SF_SMOKE

_LABEL_CHARS = 300


def _round_ha(x: float) -> int:
    """round-half-away-from-zero, matching SQL round() (python round is
    banker's)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _scored_docs(spark):
    out = []
    for r in table(spark, SF_SMOKE, "documents").collect():
        alpha = len(re.sub(r"[^a-z]", "", r["text"].lower()))
        score = _round_ha(1_000_000.0 * alpha / r["n_chars"])
        out.append((r["doc_id"], score, 1 if r["n_chars"] >= _LABEL_CHARS else 0))
    return out


def test_pr_curve_matches_pure_python(spark):
    docs = _scored_docs(spark)
    grp = defaultdict(lambda: [0, 0])
    for _, s, p in docs:
        grp[s][0] += 1
        grp[s][1] += p
    p_total = sum(v[1] for v in grp.values())
    c_all = c_pos = 0
    expected = {}
    num = 0
    for s in sorted(grp, reverse=True):
        c_all += grp[s][0]
        c_pos += grp[s][1]
        prec = _round_ha(1_000_000.0 * c_pos / c_all)
        rec = _round_ha(1_000_000.0 * c_pos / p_total)
        expected[s] = (c_pos, c_all - c_pos, prec, rec)
        num += grp[s][1] * prec
    ap = num // p_total
    rows = REGISTRY["ml_pr_curve"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == len(grp)
    for r in rows:
        tp, fp, prec, rec = expected[r["threshold"]]
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["precision_micro"] == prec
        assert r["recall_micro"] == rec
        assert r["ap_micro"] == ap


def test_gains_table_lift_decays_to_unity(spark):
    rows = sorted(
        REGISTRY["ml_gains_table"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 10
    # capture is monotone to 100%; final lift is exactly 1.0 by identity
    caps = [r["capture_micro"] for r in rows]
    assert caps == sorted(caps) and caps[-1] == 1_000_000
    assert rows[-1]["lift_micro"] == 1_000_000
    # (decile-1 lift > 1 would assert the score is a GOOD model — a data
    # property, not an operator property; the fixtures' alpha-ratio score
    # actually anti-correlates with the long-document label)


def test_neyman_allocation_matches_pure_python(spark):
    per = defaultdict(list)
    for r in table(spark, SF_SMOKE, "documents").collect():
        per[r["lang"]].append(len(r["text"].strip().lower().split()))
    sds = {}
    for lang, toks in per.items():
        n = len(toks)
        s = sum(toks)
        ss = sum(t * t for t in toks)
        sds[lang] = (
            math.sqrt((n * 1.0 * ss - s * 1.0 * s) / (n * 1.0 * (n - 1)))
            if n > 1
            else 0.0
        )
    w = sum(len(per[lang]) * sd for lang, sd in sds.items())
    rows = REGISTRY["corpus_neyman_allocation"].fn(spark, SF_SMOKE).collect()
    assert {r["lang"] for r in rows} == set(per)
    for r in rows:
        lang = r["lang"]
        assert r["n_docs"] == len(per[lang])
        assert r["sd_micro"] == _round_ha(1_000_000.0 * sds[lang])
        assert r["alloc_docs"] == _round_ha(1000 * len(per[lang]) * sds[lang] / w)


@pytest.mark.parametrize(
    "name", ["ml_pr_curve", "ml_gains_table", "corpus_neyman_allocation"]
)
def test_round6d_plans_have_no_single_partition_window(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    assert single_partition_windows(df) == [], name
