"""Golden pipeline tests against the reference's REAL sample outputs (S16):
the 30-row scraped parquet (31-08-2021data-scientist-all.parquet) and the
1,760-row scraped CSV (output_17-08-2021.csv) checked into the reference
repo. Pins below were produced by this engine and reviewed against the raw
values; they encode the cleaner's contract on real-world data.

Divergences from the reference's cleaner, by design (SURVEY.md §2.8):
- F3: the reference's title/lower lambdas are no-ops (``x == np.nan`` is
  always False); we apply the evident intent (initcap), so e.g. raw
  'Avant Arte B.V.' pins as 'Avant Arte B.v.'.
- FX rates: the reference fetches live rates per run (cleaner.py:103);
  goldens use a FIXED dim (GBP 0.8, EUR 0.9) so values are reproducible.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from job_datapipeline_spark.functions.cleaning import parse_salary_bounds, salary_currency
from job_datapipeline_spark.pipelines.cleaner import clean_jobs, exchange_rates_dim
from job_datapipeline_spark.pipelines.populator import skills_dim, top_skills
from job_datapipeline_spark.sources.readers import read_scraped_csv

REF_OUT = "/root/reference/glassdoor-scraper/src/output"
PARQUET_30 = os.path.join(REF_OUT, "31-08-2021data-scientist-all.parquet")
CSV_1760 = os.path.join(REF_OUT, "output_17-08-2021.csv")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PARQUET_30), reason="reference sample fixtures not present"
)


@pytest.fixture(scope="module")
def cleaned_30(spark):
    raw = spark.read.parquet(PARQUET_30)
    jobs = raw.select(
        "company_name",
        "company_rating",
        F.col("estimated_salary").alias("company_estimated_salary"),
        "company_size",
    )
    rates = exchange_rates_dim(spark, {"USD": 1.0, "GBP": 0.8, "EUR": 0.9})
    return clean_jobs(jobs, rates)


def test_clean_stage_golden_rows(cleaned_30):
    rows = {r["company_name"]: r for r in cleaned_30.collect()}
    # P1: the one null-company row of 30 is dropped
    assert len(rows) == 29

    # F4 rating split from 'Cleo4.4★' + F6 range parse + GBP conversion
    cleo = rows["Cleo"]
    assert cleo["company_rating"] == 4.4
    assert (cleo["min_estimated_salary"], cleo["max_estimated_salary"]) == (56250, 98750)
    assert (cleo["company_size_min"], cleo["company_size_max"]) == (1, 50)

    # per-hour annualization: £9/h * 8 * 261 / 0.8 = 23490
    assert rows["Kaiasm"]["min_estimated_salary"] == 23490

    # '10000+ Employees' -> (10000, 10000)
    assert (rows["Raytheon Uk"]["company_size_min"], rows["Raytheon Uk"]["company_size_max"]) == (10000, 10000)

    # rating split without salary: 'Arrow Global3.3★', no salary -> nulls
    arrow = rows["Arrow Global"]
    assert arrow["company_rating"] == 3.3
    assert arrow["min_estimated_salary"] is None

    # F3 divergence pin: initcap INTENT applied (reference would keep raw)
    assert "Avant Arte B.v." in rows

    # aggregate pin over all 29 rows
    agg = (
        cleaned_30.agg(
            F.count("*").alias("n"),
            F.count("min_estimated_salary").alias("n_sal"),
            F.sum("min_estimated_salary").alias("sum_lo"),
            F.count("company_rating").alias("n_rated"),
        ).first()
    )
    assert (agg["n"], agg["n_sal"], agg["n_rated"]) == (29, 19, 13)
    assert agg["sum_lo"] == 1156033


def test_top_skills_golden(spark):
    raw = spark.read.parquet(PARQUET_30)
    docs = raw.select(
        F.lit("data scientist").alias("job_position"), F.col("job_description")
    )
    terms = ["python", "sql", "r", "aws", "spark", "machine", "learning", "data",
             "experience", "models", "statistics", "cloud"]
    jobs_kv, pivot = top_skills(
        docs, skills_dim(spark, terms), "job_position", "job_description", k=10
    )
    kv = [tuple(r) for r in jobs_kv.collect()]
    assert kv == [("33cf9b9f9b3d18e1e9852930019bd131", "data scientist")]
    row = pivot.collect()[0]
    assert tuple(row)[1:] == (
        "data", "experience", "learning", "machine", "python",
        "models", "sql", "cloud", "r", "statistics",
    )


def test_salary_parser_over_1760_real_rows(spark):
    """The F6 parser against every real salary string the reference ever
    scraped into its sample CSV: every currency-tagged quote parses, and
    the per-currency row counts/sums pin the parse exactly."""
    df = read_scraped_csv(spark, CSV_1760, derive_job_position=False)
    assert df.count() == 1760
    lo, _hi = parse_salary_bounds(F.col("estimated_salary"))
    per_cur = {
        r["cur"]: (r["n"], r["parsed"], r["sum_lo"])
        for r in df.select(
            salary_currency(F.col("estimated_salary")).alias("cur"), lo.alias("lo")
        )
        .groupBy("cur")
        .agg(F.count("*").alias("n"), F.count("lo").alias("parsed"), F.sum("lo").alias("sum_lo"))
        .collect()
    }
    assert per_cur == {
        "CAD": (100, 100, 7343923),
        "CHF": (8, 8, 674266),
        "COP": (11, 11, 558000000),
        "EUR": (7, 7, 352000),
        "GBP": (198, 198, 9481329),
        "SGD": (111, 111, 7366908),
        # USD is the fallback currency: unquoted rows land here unparsed
        "USD": (1325, 151, 10890691),
    }
