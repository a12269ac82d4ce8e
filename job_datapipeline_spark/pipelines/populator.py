"""The aggregate/publish stage (data_populator/populator.py:39-58) as one
declarative plan producing the two serving tables:

    jobs_kv(job_id, job)
    top_k_skills(job_id, top_skill_n_1 .. top_skill_n_k)

The reference loops over distinct groups in driver Python with a Counter;
here it is explode -> broadcast semi-join -> two-phase hash agg -> window
top-k (deterministic ties) -> static pivot. One shuffle on the group key.

Documented divergence (P3): the reference selects each group's rows by
SUBSTRING containment — ``jobs[jobs.job_position.str.contains(job)]``
(populator.py:43) — so one row can feed several groups. This pipeline
groups by column EQUALITY (the common case its data actually exercises:
job_position values equal the configured search terms). The faithful
contains-semantics form is covered by the ``populator_contains_match``
registry query (broadcast non-equi join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import literal_dim
from ..functions.cleaning import deterministic_job_id
from ..functions.text import tokenize
from ..operators.topk import rank_pivot, top_k_per_group


def skills_dim(spark: SparkSession, skills: Sequence[str]) -> DataFrame:
    """The skills.json term list (data_populator/skills.json:1-16) as a
    broadcastable single-column dim."""
    return literal_dim(spark, [(s.lower(),) for s in skills], "token string")


def skill_counts(df: DataFrame, skills: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """A2 + J6 (populator.py:42-44): tokenize, keep skill tokens, count per
    (group, token). Map-side partial agg makes the explode cheap on the wire."""
    toks = df.select(F.col(group_col).alias("job"), F.explode(tokenize(F.col(text_col))).alias("token"))
    return (
        toks.join(F.broadcast(skills), "token", "left_semi")
        .groupBy("job", "token")
        .agg(F.count("*").alias("cnt"))
    )


def top_skills(
    df: DataFrame,
    skills: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Produce (jobs_kv, top_k_skills) — the populator's end state
    (populator.py:47-58), with the W1 determinism fix (ties -> token asc)."""
    counts = skill_counts(df, skills, group_col, text_col)
    ranked = top_k_per_group(counts, ["job"], "cnt", k, tiebreak_cols=["token"])
    keyed = ranked.withColumn("job_id", deterministic_job_id(F.col("job")))
    jobs_kv = keyed.select("job_id", "job").distinct()
    pivoted = rank_pivot(keyed, ["job_id"], "rank", "token", k)
    return jobs_kv, pivoted
