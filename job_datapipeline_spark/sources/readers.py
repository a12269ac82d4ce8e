"""Readers: how raw data enters the engine (SURVEY.md §2.1).

The reference lists an S3 bucket, filters keys by suffix, reads each CSV into
pandas and concatenates (data-cleaner/cleaner.py:15-40), deriving a
``job_position`` column from each object key (cleaner.py:10-14,27); the
populator re-lists the bucket and reads only the newest object by
LastModified (data_populator/populator.py:13-29).

Spark-first re-expression:
- the list+filter+read-each loop is ONE schema'd glob scan — the glob does
  the suffix filter, Catalyst does column pruning, and
  ``input_file_name()`` recovers the per-file provenance column;
- "newest object only" becomes a date-partitioned table plus max() over the
  partition values — partition pruning makes the re-read touch only the
  newest directory, no full-data scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..functions.cleaning import job_position_from_filename

# The scraper's per-run CSV schema — 15 columns as written by the reference
# (glassdoor-scraper/src/main_pd.py:110-113 column list; sample file
# glassdoor-scraper/src/output/output_17-08-2021.csv header).
SCRAPED_LISTINGS = StructType(
    [
        StructField("companyName", StringType()),
        StructField("company_starRating", DoubleType()),
        StructField("company_offeredRole", StringType()),
        StructField("company_roleLocation", StringType()),
        StructField("listing_jobDesc", StringType()),
        StructField("requested_url", StringType()),
        StructField("compensation_and_benefits", DoubleType()),
        StructField("culture_and_values", DoubleType()),
        StructField("career_opportunities", DoubleType()),
        StructField("work_life_balance", DoubleType()),
        StructField("job_type", StringType()),
        StructField("industry", StringType()),
        StructField("job_function", StringType()),
        StructField("company_size", StringType()),
        StructField("estimated_salary", StringType()),
    ]
)


def read_scraped_csv(
    spark: SparkSession,
    path_glob: str,
    schema: StructType = SCRAPED_LISTINGS,
    derive_job_position: bool = True,
) -> DataFrame:
    """S5+S6: schema'd CSV glob scan with filename-derived job_position.

    Replaces the reference's list-bucket -> endswith('.csv') -> read-each ->
    concat loop (cleaner.py:15-40) with a single declarative scan: the glob
    IS the suffix predicate (P2), the explicit schema kills inference, and
    ``input_file_name()`` + regex recovers the search term the reference
    parses out of each object key (cleaner.py:10-14).
    """
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path_glob)
    )
    if derive_job_position:
        df = df.withColumn(
            "job_position", job_position_from_filename(F.input_file_name())
        )
    return df


def read_csv_permissive(
    spark: SparkSession,
    path_glob: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Typed CSV scan that QUARANTINES malformed rows instead of failing
    or silently dropping them: every row that cannot be parsed against the
    schema (bad type, extra fields) comes back with its raw line in
    ``corrupt_col`` and nulls in the unparseable fields, so a 100 TB
    ingest can split clean rows from a dead-letter stream in one pass.

    The reference has no malformed-row story at all — ``pd.read_csv``
    (cleaner.py:26) just throws and the whole 5x-retry loop re-reads the
    bucket. Mode notes for callers: FAILFAST turns the first bad row into
    a job failure; DROPMALFORMED is a trap under column pruning — a
    ``count()`` parses no columns, so nothing is "malformed" and nothing
    drops (pinned in tests/test_sources.py).
    """
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    return (
        spark.read.schema(full)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path_glob)
    )


def newest_partition_value(spark: SparkSession, root: str, partition_col: str) -> str:
    """The max value of a partition column — reads partition METADATA only
    (the column is directory-derived, so no row data moves).

    This is the reference's argmax-by-LastModified (populator.py:15,22)
    recast so it scales: at 100 TB listing objects and sorting client-side
    is minutes of API calls; a partitioned table answers it from the
    directory listing.
    """
    row = spark.read.parquet(root).select(F.max(partition_col).alias("v")).first()
    return row["v"]


def read_newest_partition(spark: SparkSession, root: str, partition_col: str = "run_date") -> DataFrame:
    """S7: read ONLY the newest partition of a partitioned parquet dataset.

    The equality filter on the partition column prunes at planning time —
    ``.explain`` shows PartitionFilters, and only the newest directory's
    files are scanned.
    """
    newest = newest_partition_value(spark, root, partition_col)
    return spark.read.parquet(root).filter(F.col(partition_col) == newest)


def read_json_side_input(spark: SparkSession, path: str) -> DataFrame:
    """S8: a small JSON side input (e.g. the skills dictionary,
    data_populator/skills.json) as a DataFrame. ``multiLine`` because such
    files are a single pretty-printed object, not JSON-lines."""
    return spark.read.option("multiLine", "true").json(path)


def skills_terms(spark: SparkSession, path: str, field: str = "skills") -> DataFrame:
    """The skills.json term list as a broadcastable (token) dim — explode
    the array field and lowercase, mirroring populator.py:26-28,44."""
    raw = read_json_side_input(spark, path)
    return raw.select(F.explode(field).alias("token")).select(F.lower("token").alias("token"))
