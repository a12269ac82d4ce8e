"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the same contract the external correctness gate applies at sf0.01."""

from __future__ import annotations

import pytest

from job_datapipeline_spark.plans.queries import REGISTRY
from job_datapipeline_spark.testing import compare, duck_con

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    odf = con.execute(q.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"
