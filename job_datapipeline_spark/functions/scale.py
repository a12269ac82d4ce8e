"""Scale-adaptive parallelism helpers.

The round-12 optimization pass found two structural single-thread traps
(OPTIMIZATION_r12.md "Structural finding"):

1. Every testdata table is one parquet file with ONE row group, and a row
   group is the unit of scan-split assignment — so every base-table scan
   is exactly one task, and all pre-shuffle map work (hashing, shingling,
   vector arithmetic, regex) runs on one core of N.
2. AQE's coalescing is BYTE-targeted (``advisoryPartitionSizeInBytes`` /
   ``minPartitionSize``): a shuffle whose output is a few hundred KB is
   coalesced to ONE partition even when each row feeds thousands of
   downstream expression evaluations (fan-outs, folds, per-row crypto
   hashes) — the per-row compute is invisible to a byte heuristic.

``fan_out`` is the explicit fix for stages whose cost is per-row COMPUTE,
not bytes: repartition to the session's default parallelism (local = core
count, cluster = total executor cores — scale-adaptive, never a constant)
right before the heavy map stage. Apply it only where measured compute
dominates the added exchange; the exchange itself moves narrow proxy rows
(keys + small payloads — guide §2.3), so at 100 TB it is amortized by the
work it parallelizes, and hash-partitioning on a real key keeps the
row-to-partition mapping deterministic under task retries (guide §2.5's
rand() warning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` partitions —
    hash-partitioned by ``cols`` when given (deterministic under retry),
    round-robin otherwise (Spark's sort-before-repartition keeps that
    deterministic too). Use immediately before a compute-heavy map stage
    whose input is small in bytes; do NOT use where bytes dominate — AQE
    already sizes those correctly."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n, *cols) if cols else df.repartition(n)
