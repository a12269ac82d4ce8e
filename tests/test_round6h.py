"""Round-6 eighth batch — replay for the winsorized mean."""

from __future__ import annotations

import math

from job_datapipeline_spark.catalog import table
from job_datapipeline_spark.plans.queries import REGISTRY
from job_datapipeline_spark.testing import single_partition_windows

from conftest import SF_SMOKE


def test_winsorized_mean_matches_pure_python(spark):
    vals = sorted(
        (int(round(r["o_totalprice"] * 100)), r["o_orderkey"])
        for r in table(spark, SF_SMOKE, "orders").collect()
    )
    n = len(vals)
    lo = vals[(n + 19) // 20 - 1][0]
    hi = vals[(19 * n + 19) // 20 - 1][0]
    wsum = sum(min(max(v, lo), hi) for v, _ in vals)
    rsum = sum(v for v, _ in vals)

    def rha(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    df = REGISTRY["agg_winsorized_mean"].fn(spark, SF_SMOKE)
    row = df.collect()[0]
    assert row["n_orders"] == n
    assert row["lo_cents"] == lo
    assert row["hi_cents"] == hi
    assert row["winsorized_mean_cents"] == rha(1.0 * wsum / n)
    assert row["raw_mean_cents"] == rha(1.0 * rsum / n)
    assert single_partition_windows(df) == []
