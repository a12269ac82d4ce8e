"""Grouped top-k and rank->column pivot.

Re-expresses the populator's per-job ``Counter.most_common(10)`` + pivoted
DynamoDB rows (data_populator/populator.py:39-58) as window + pivot.

Semantic fix over the reference (SURVEY.md §2.5 W1): ``most_common`` breaks
ties by insertion order, which is nondeterministic under parallelism. Here
ties always break by the value column ascending, so the result is stable
across partitionings and engines.

Scale shape: window top-k is a single shuffle on the group key with partial
aggregation before it; no driver-side loop over groups (the reference
iterates distinct groups in Python — that dies at 100 TB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_cols: Sequence[str] = (),
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per group, deterministically.

    Ordering: ``order_col`` (desc by default) then ``tiebreak_cols`` asc.
    Adds ``rank_col`` (1-based, bigint to match SQL row_number()).
    """
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )


def rank_pivot(
    df: DataFrame,
    key_cols: Sequence[str],
    rank_col: str,
    value_col: str,
    k: int,
    col_prefix: str = "top_skill_n_",
) -> DataFrame:
    """W2 (populator.py:55-58): pivot rank 1..k into columns
    ``<prefix>1 .. <prefix>k`` holding the value at that rank.

    Explicit pivot values (1..k) keep the schema static — no extra pass to
    discover pivot columns, and the output schema is known at plan time.
    """
    pivoted = (
        df.groupBy(*key_cols)
        .pivot(rank_col, list(range(1, k + 1)))
        .agg(F.first(value_col))
    )
    return pivoted.select(
        *key_cols,
        *[F.col(f"`{i}`").alias(f"{col_prefix}{i}") for i in range(1, k + 1)],
    )
