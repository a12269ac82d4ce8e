"""Scale-growth measurements for the two round-7 join primitives the
round-7 verdict asked to see measured (its item 3):

1. operators/rangejoin.bin_range_join — the bin-width trade.  The
   documented cost model (rangejoin.py module docstring) says join-input
   rows are ``|points| + sum(interval_width / W + 1)``: W far below the
   typical interval width explodes intervals into many bin rows, W far
   above piles unrelated points into shared bins for the residual filter
   to discard.  This sweeps W across four orders of magnitude around the
   typical width at 1x / 10x rows — the wall clock should be U-shaped
   with its minimum near the typical width, and the 10x run should grow
   ~linearly at the optimum.

2. part_fuzzy_matches-style blocked fuzzy matching — the
   sum-of-block-squares claim (plans/llm_round7b.py).  Candidate pairs
   are sum over blocks of s*(s-1)/2.  Growing the corpus 10x by adding
   BLOCKS (block size fixed — the blocking-key-refinement discipline the
   query's doc prescribes) must grow pairs ~10x; growing it 10x by
   growing BLOCK SIZE (fixed key — what happens when the key is NOT
   refined) must grow pairs ~100x.  Both modes are measured; the table
   is the argument for refining the key as data grows.

Usage: python tools/scale_growth_round8.py
Prints one JSON line per datapoint with wall seconds (min of 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from job_datapipeline_spark.operators.rangejoin import bin_range_join  # noqa: E402
from job_datapipeline_spark.session import get_spark  # noqa: E402

N_POINTS = 1_000_000
N_INTERVALS = 100_000
TYP_W = 1_000  # typical interval width on the point axis
SPAN = 100_000_000


def build_points(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("p_id"),
            ((F.col("id") * 2654435761) % SPAN).alias("t"),
        )
        .localCheckpoint()
    )


def build_intervals(spark, m: int):
    # widths 500..1500 deterministic around TYP_W
    # two modular steps keep every intermediate below 2^63 (ANSI mode)
    lo = (((F.col("id") * 40503) % SPAN) * 26544353) % SPAN
    width = (F.col("id") * 7) % TYP_W + TYP_W // 2
    return (
        spark.range(m)
        .select(
            F.col("id").alias("i_id"),
            lo.alias("lo"),
            (lo + width).alias("hi"),
        )
        .localCheckpoint()
    )


def run_range(points, intervals, bin_w: int) -> None:
    out = bin_range_join(
        points, intervals, point_col="t", lo_col="lo", hi_col="hi",
        bin_width=bin_w,
    )
    out.write.format("noop").mode("overwrite").save()


def build_entities(spark, n_blocks: int, block_size: int):
    n = n_blocks * block_size
    return (
        spark.range(n)
        .select(
            F.col("id").alias("key"),
            (F.col("id") % n_blocks).alias("blk"),
            F.concat(
                F.lit("widget model "),
                ((F.col("id") * 2654435761) % 97).cast("string"),
                F.lit(" rev "),
                ((F.col("id") * 7919) % 53).cast("string"),
            ).alias("name"),
        )
        .localCheckpoint()
    )


def run_fuzzy(df) -> int:
    a, b = df.alias("a"), df.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.key") < F.col("b.key")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.col("a.key").alias("key_a"),
        F.col("b.key").alias("key_b"),
        F.levenshtein(F.col("a.name"), F.col("b.name")).cast("bigint").alias("dist"),
    )
    w = Window.partitionBy("blk").orderBy("dist", "key_a", "key_b")
    wc = Window.partitionBy("blk")
    out = (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_pairs", F.count("*").over(wc))
        .where(F.col("rn") == 1)
        .agg(F.sum("n_pairs").cast("bigint").alias("total_pairs"))
    )
    return out.collect()[0][0] or 0


def timed(fn, *args):
    """(best wall seconds of 3, last call's return value) — callers that
    need the result don't pay a fourth un-timed invocation."""
    best, res = float("inf"), None
    for _ in range(3):
        t0 = time.monotonic()
        res = fn(*args)
        best = min(best, time.monotonic() - t0)
    return best, res


def main() -> None:
    spark = get_spark()
    # at 10x, AQE's size estimate tempts it to broadcast the 10M-row
    # point side and the driver-side build dies; both joined sides here
    # grow with the data, so the shuffled join is the honest 100 TB
    # shape — disable broadcast conversion outright for the sweep
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # -- experiment 1: bin-width sweep ------------------------------------
    for scale in (1, 10):
        pts = build_points(spark, N_POINTS * scale)
        ivl = build_intervals(spark, N_INTERVALS * scale)
        # exploded interval bin rows for the cost model column
        for bin_w in (10, 100, 1_000, 10_000, 100_000):
            bins = ivl.select(
                F.sum(
                    F.floor(F.col("hi") / bin_w) - F.floor(F.col("lo") / bin_w) + 1
                ).alias("b")
            ).collect()[0][0]
            sec, _ = timed(run_range, pts, ivl, bin_w)
            print(json.dumps({
                "exp": "bin_range_join", "scale": scale, "bin_width": bin_w,
                "interval_bin_rows": int(bins), "sec": round(sec, 2),
            }), flush=True)
        pts.unpersist()
        ivl.unpersist()

    # -- experiment 2: blocked fuzzy matching -----------------------------
    base_blocks, base_size = 2_000, 20
    for label, n_blocks, block_size in (
        ("1x", base_blocks, base_size),
        ("10x_more_blocks", base_blocks * 10, base_size),
        ("10x_bigger_blocks", base_blocks, base_size * 10),
    ):
        ents = build_entities(spark, n_blocks, block_size)
        sec, n_pairs = timed(run_fuzzy, ents)
        print(json.dumps({
            "exp": "blocked_fuzzy", "mode": label,
            "rows": n_blocks * block_size, "pairs": int(n_pairs),
            "sec": round(sec, 2),
        }), flush=True)
        ents.unpersist()


# -- experiment 3 (added later in round 8): the 2-D cell-size trade --------
# grid_containment_join squares the 1-D bin trade: rectangle bin rows are
# (w/cell + 1) * (h/cell + 1), so the too-small-cell penalty grows
# QUADRATICALLY while the too-large-cell penalty is the same residual-
# filter blowup.  Typical rectangle half-side here is ~500 on both axes.

GRID_N_POINTS = 1_000_000
GRID_N_RECTS = 50_000
GRID_SPAN = 1_000_000
GRID_TYP = 500  # typical rectangle half-side


def build_grid_points(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("p_id"),
            ((F.col("id") * 2654435761) % GRID_SPAN).alias("x"),
            ((F.col("id") * 40503) % GRID_SPAN).alias("y"),
        )
        .localCheckpoint()
    )


def build_grid_rects(spark, m: int):
    cx = (F.col("id") * 7919) % GRID_SPAN
    cy = (F.col("id") * 104729) % GRID_SPAN
    hw = (F.col("id") * 7) % GRID_TYP + GRID_TYP // 2
    hh = (F.col("id") * 11) % GRID_TYP + GRID_TYP // 2
    return (
        spark.range(m)
        .select(
            F.col("id").alias("r_id"),
            (cx - hw).alias("xlo"),
            (cx + hw).alias("xhi"),
            (cy - hh).alias("ylo"),
            (cy + hh).alias("yhi"),
        )
        .localCheckpoint()
    )


def run_grid(points, rects, cell: int) -> None:
    from job_datapipeline_spark.operators.rangejoin import (
        grid_containment_join,
    )

    out = grid_containment_join(
        points, rects, x_col="x", y_col="y",
        x_lo="xlo", x_hi="xhi", y_lo="ylo", y_hi="yhi", cell=cell,
    )
    out.write.format("noop").mode("overwrite").save()


def grid_main(spark) -> None:
    for scale in (1, 10):
        pts = build_grid_points(spark, GRID_N_POINTS * scale)
        rcs = build_grid_rects(spark, GRID_N_RECTS * scale)
        for cell in (100, 1_000, 10_000, 100_000):
            bins = rcs.select(
                F.sum(
                    (F.floor(F.col("xhi") / cell) - F.floor(F.col("xlo") / cell) + 1)
                    * (F.floor(F.col("yhi") / cell) - F.floor(F.col("ylo") / cell) + 1)
                ).alias("b")
            ).collect()[0][0]
            sec, _ = timed(run_grid, pts, rcs, cell)
            print(json.dumps({
                "exp": "grid_containment_join", "scale": scale, "cell": cell,
                "rect_cell_rows": int(bins), "sec": round(sec, 2),
            }), flush=True)
        pts.unpersist()
        rcs.unpersist()


if __name__ == "__main__":
    if "--grid-only" in sys.argv:
        spark = get_spark()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        grid_main(spark)
    else:
        main()
        grid_main(get_spark())
