"""The clean/normalize stage (data-cleaner/cleaner.py:81-116) as one
declarative plan: filter -> project (all derived columns as native
expressions) -> broadcast-join the exchange-rate dim -> done.

The reference runs this as pandas lambdas row-by-row with a retry loop; here
it is a single Spark job — scan, one projection inside whole-stage codegen,
one broadcast hash join. At 100 TB the clean stage is embarrassingly
parallel with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import literal_dim
from ..functions import cleaning as C


def exchange_rates_dim(spark, rates: dict[str, float]) -> DataFrame:
    """The rates dict (fetched from a REST API at cleaner.py:103 in the
    reference) as a broadcastable dimension table."""
    return literal_dim(
        spark, [(iso, float(rate)) for iso, rate in rates.items()], "currency string, rate double"
    )


def clean_jobs(jobs: DataFrame, rates: DataFrame | None = None) -> DataFrame:
    """Apply the full cleaner transform set:

    - P1: drop rows with null company_name              (cleaner.py:85)
    - F4: split trailing star-rating out of the name    (cleaner.py:88-89)
    - F1: title-case company_name (the INTENT of the    (cleaner.py:90-94)
          no-op lambdas; divergence documented)
    - F5: parse company_size -> min/max ints            (cleaner.py:97-100)
    - F6: parse salary range, annualize per-hour, FX-   (cleaner.py:42-79,
          convert via broadcast join, round to ints      103-105)
    """
    df = jobs.filter(F.col("company_name").isNotNull())

    name_clean, rating_from_name = C.split_rating_from_name(F.col("company_name"))
    df = df.withColumn(
        "company_rating", F.coalesce(F.col("company_rating"), rating_from_name)
    ).withColumn("company_name", C.clean_company_name(name_clean))

    size_lo, size_hi = C.parse_company_size(F.col("company_size"))
    df = df.withColumn("company_size_min", size_lo).withColumn("company_size_max", size_hi)

    df = df.withColumn("currency", C.salary_currency(F.col("company_estimated_salary")))
    if rates is not None:
        df = df.join(F.broadcast(rates), "currency", "left")
        rate = F.col("rate")
    else:
        rate = F.lit(1.0)
    sal_lo, sal_hi = C.parse_salary_bounds(F.col("company_estimated_salary"), rate)
    df = (
        df.withColumn("min_estimated_salary", sal_lo)
        .withColumn("max_estimated_salary", sal_hi)
        .drop("rate")
    )
    return df
