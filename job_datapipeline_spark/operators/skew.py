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

_FACT_PRESERVING = {"inner", "left", "leftouter", "left_outer",
                    "semi", "leftsemi", "left_semi",
                    "anti", "leftanti", "left_anti", "cross"}


def _check_fact_preserving(how: str) -> None:
    """Salted joins replicate the DIM side, so only joins that never emit
    unmatched dim rows keep the result identical to the plain join."""
    if how.lower() not in _FACT_PRESERVING:
        raise ValueError(
            f"how={how!r} is dim-preserving: unmatched dim rows would be "
            "emitted once per salt. Use inner/left/semi/anti, or swap the "
            "sides so the replicated side is the probe side."
        )


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

    ``how`` must be fact-preserving (inner/left/semi/anti): the dim side is
    replicated over the salt domain, so a dim-preserving join (right/full)
    would emit every UNMATCHED dim row once per salt — not identical to
    the plain join. Rejected rather than silently wrong.
    """
    _check_fact_preserving(how)
    f = fact.withColumn("_salt", F.pmod(F.hash(F.col(salt_source)), F.lit(salt)))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def detect_hot_keys(
    fact: DataFrame,
    key: str,
    min_count: int | None = None,
    top_k: int | None = None,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Find the keys hot enough to need salting, as a 1-column frame.

    Two selection rules (combinable): ``min_count`` keeps keys whose row
    count exceeds it (exact and deterministic — use this when the result
    feeds a correctness-checked plan); ``top_k`` keeps the k most frequent
    (ties broken by key so the selected SET is stable). ``sample_fraction``
    switches the count to a Bernoulli sample — at 100 TB an exact count of
    a single narrow column is one cheap map-side-combined pass, but on a
    wide unprunable source sampling cuts even that scan; sampled counts are
    scaled back up by 1/fraction before ``min_count`` applies. Sampling is
    estimation: keys near the threshold may flip between runs, which never
    affects RESULT correctness (salted and unsalted joins are identical),
    only which keys get spread.
    """
    if min_count is None and top_k is None:
        raise ValueError("need min_count and/or top_k")
    src = fact.select(key)
    scale = 1.0
    if sample_fraction is not None:
        src = src.sample(fraction=sample_fraction, seed=seed)
        scale = 1.0 / sample_fraction
    counts = src.groupBy(key).agg((F.count("*") * F.lit(scale)).alias("_n"))
    if min_count is not None:
        counts = counts.filter(F.col("_n") > min_count)
    if top_k is not None:
        counts = counts.orderBy(F.desc("_n"), F.asc(key)).limit(top_k)
    return counts.select(key)


def salted_join_hotkeys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: str,
    hot: DataFrame,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """``salted_join`` that replicates the dim side ONLY for hot keys.

    Full-dim replication multiplies the dim by ``salt`` — wasteful when the
    dim is large and only a handful of keys are skewed. Here ``hot`` (a
    1-column frame of hot key values, from ``detect_hot_keys`` — small by
    construction, broadcast twice) partitions both sides: hot fact rows
    salt over [0, salt) and meet a salt-exploded copy of the hot dim rows;
    cold rows join with salt 0 against unreplicated dim rows. Dim expansion
    is ``|dim| + (salt-1)·|hot|`` instead of ``salt·|dim|``. The result is
    provably identical to the plain join: the (key, salt) pairing is a
    partition of the original key matching. Like :func:`salted_join`,
    ``how`` must be fact-preserving (an unmatched hot dim row would
    otherwise appear once per salt).
    """
    _check_fact_preserving(how)
    hot = F.broadcast(hot.select(F.col(key)).distinct().withColumn("_hot", F.lit(True)))
    f = fact.join(hot, key, "left").withColumn(
        "_salt",
        F.when(F.col("_hot").isNotNull(), F.pmod(F.hash(F.col(salt_source)), F.lit(salt)))
        .otherwise(F.lit(0)),
    ).drop("_hot")
    d = (
        dim.join(hot, key, "left")
        .withColumn(
            "_salts",
            F.when(F.col("_hot").isNotNull(), F.sequence(F.lit(0), F.lit(salt - 1)))
            .otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_hot", "_salts")
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")
