"""Table catalog: load the testdata star schema, register temp views.

Loads are plain ``spark.read.parquet`` scans — column pruning and filter
pushdown then happen at the scan (Catalyst), which is the whole point: at
100 TB a query that touches 2 columns must read 2 columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType

from .schemas import TESTDATA_SCHEMAS

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs any session needs to read the testdata correctly —
    set here (not only in the session factory) so externally-created
    sessions, e.g. the driver's, behave identically.

    - The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
      rejects; nanosAsLong reads it as int64 and ``table`` converts back.
    - UTC session tz makes ltz<->ntz conversions the identity, so timestamp
      values agree with engines that read parquet timestamps as naive.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One testdata table as a DataFrame (lazy parquet scan)."""
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Re-type nanos-as-long columns back to timestamp_ntz (integer division
    # keeps full precision; a double divide would lose bits above 2^53).
    declared = {f.name: f.dataType for f in TESTDATA_SCHEMAS[name].fields}
    for f_actual in df.schema.fields:
        want = declared.get(f_actual.name)
        if isinstance(want, TimestampNTZType) and isinstance(f_actual.dataType, LongType):
            micros = F.expr(f"`{f_actual.name}` div 1000")
            df = df.withColumn(
                f_actual.name, F.timestamp_micros(micros).cast("timestamp_ntz")
            )
    return df


def literal_dim(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A tiny literal dimension (config values, fixture rows, band tables)
    as a PURE JVM plan: ``range(1)`` + ``inline`` of struct literals.

    ``spark.createDataFrame`` on local rows builds a Python-RDD scan whose
    every downstream job re-runs Python worker round-trips — measured 7s
    for a 12-row broadcast cross join on local[32]; this form runs in 0.2s
    and broadcasts for free. Use for any dim small enough to inline into
    the plan (config cross products, FX rates, test fixtures); real data
    comes through ``table``/the sources layer.
    """
    st = StructType.fromDDL(schema)
    if not rows:
        return spark.createDataFrame([], st)
    structs = [
        F.struct(*[F.lit(v).cast(f.dataType).alias(f.name) for v, f in zip(r, st.fields)])
        for r in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
