"""Skew-mitigation join: salting for hot keys.

A shuffle hash join sends every row of a key to one reducer; a hot key
(one user with 10% of all events, the null key, a default value) turns
that reducer into the straggler that dominates the stage. AQE's skew-join
splitting (enabled in the session factory) handles most cases at runtime;
this operator is the explicit form for when the planner must be forced —
e.g. a skewed AGGREGATION feeding a join, or engines/configs without AQE.

Shape: the fact side gets a deterministic salt in [0, salt); the dim side
is replicated ``salt`` times (explode over a literal range — dim size
multiplies by ``salt``, so this suits small-to-medium dims); the join key
becomes (key, salt), spreading each hot key over ``salt`` reducers. The
result set is IDENTICAL to the unsalted join — asserted by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with the fact side salted.

    ``salt_source`` must be a fact column that varies WITHIN a key (a row
    id / event id): the salt is ``pmod(hash(salt_source), salt)``, so one
    hot key's rows spread evenly and deterministically. Salting with a
    function of the key itself would put the whole key in one bucket again.
    """
    f = fact.withColumn("_salt", F.pmod(F.hash(F.col(salt_source)), F.lit(salt)))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
