"""Growth datapoints for the round-5 fifth-batch operators.

Measures, at sf0.01 vs sf0.1 (10x events/documents/lineitem):

- events_interpolate_linear: spine size (series x hours — fixed by the
  time span, not the event count) vs raw events, plus wall.
- corpus_negative_samples: broadcast ring size (B rows, flat) and
  output rows (anchors x k, linear by construction), plus wall.
- join_skew_diagnosis: histogram frame (distinct keys) vs raw rows,
  plus wall.
- ml_classification_metrics: wall only (one aggregate; the wire
  carries four counters at any scale).
- ml_auc_rank: the distinct-score window frame vs raw rows — the
  bounded-frame claim — plus wall.

Usage: python tools/scale_growth_round5e.py
Prints a markdown table for SCALE_GROWTH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.catalog import table  # noqa: E402
from job_datapipeline_spark.plans.queries import REGISTRY  # noqa: E402
from job_datapipeline_spark.plans.llm_round5d import _score_micro  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale-growth-r5e")
    print("| sf | op | measure | value | wall s |")
    print("|---|---|---|---|---|")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]

        n_events = table(spark, sf_dir, "events").count()
        interp = REGISTRY["events_interpolate_linear"].fn(spark, sf_dir)
        t0 = time.time()
        n_spine = interp.count()
        w = time.time() - t0
        print(
            f"| {sf} | events_interpolate_linear | spine vs raw events | "
            f"{n_spine} / {n_events} | {w:.2f} |"
        )

        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        neg = REGISTRY["corpus_negative_samples"].fn(spark, sf_dir)
        t0 = time.time()
        n_out = neg.count()
        w = time.time() - t0
        print(
            f"| {sf} | corpus_negative_samples | ring 16 rows; output vs "
            f"anchors | {n_out} / {n_docs} | {w:.2f} |"
        )

        li = table(spark, sf_dir, "lineitem")
        n_rows = li.count()
        n_keys = li.select("l_suppkey").distinct().count()
        w = _noop(REGISTRY["join_skew_diagnosis"].fn(spark, sf_dir))
        print(
            f"| {sf} | join_skew_diagnosis | histogram keys vs raw rows | "
            f"{n_keys} / {n_rows} | {w:.2f} |"
        )

        w = _noop(REGISTRY["ml_classification_metrics"].fn(spark, sf_dir))
        print(
            f"| {sf} | ml_classification_metrics | wire state | 4 counters "
            f"| {w:.2f} |"
        )

        n_scores = docs.select(_score_micro()).distinct().count()
        w = _noop(REGISTRY["ml_auc_rank"].fn(spark, sf_dir))
        print(
            f"| {sf} | ml_auc_rank | distinct-score frame vs raw rows | "
            f"{n_scores} / {n_docs} | {w:.2f} |"
        )


if __name__ == "__main__":
    main()
