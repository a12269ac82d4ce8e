"""Streaming-equals-batch proofs: the file-source + AvailableNow pipelines
must reproduce their batch twins on the same inputs, and checkpointed reruns
must be exactly-once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_datapipeline_spark.catalog import table
from job_datapipeline_spark.plans.queries import REGISTRY
from job_datapipeline_spark.streaming import pipelines as P


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """The sf0.001 events table re-laid as an incrementally-growing file
    directory (3 appends ~ 3 daily drops), named events.parquet so the
    batch registry queries can read the same root."""
    root = tmp_path_factory.mktemp("stream") / "src"
    ev = table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    for chunk in range(3):
        ev.filter(F.col("event_id") % 3 == chunk).write.mode("append").parquet(
            str(root / "events.parquet")
        )
    return str(root)


def test_hourly_rollup_stream_equals_batch(spark, events_dir, tmp_path):
    stream = P.hourly_rollup_stream(P.read_events_stream(spark, events_dir + "/events.parquet"))
    P.available_now_to_memory(stream, "rollup_mem", str(tmp_path / "ckpt"))
    got = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in spark.table("rollup_mem").collect()
    }
    batch = REGISTRY["events_hourly_rollup"].fn(spark, events_dir)
    want = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_sessionize_stream_equals_batch(spark, events_dir, tmp_path):
    stream = P.sessionize_stream(P.read_events_stream(spark, events_dir + "/events.parquet"))
    P.available_now_to_memory(stream, "sess_mem", str(tmp_path / "ckpt"))
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.table("sess_mem").collect()
    }
    batch = REGISTRY["events_sessionize"].fn(spark, events_dir)
    want = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
    # streaming session END = last ts + gap; batch records the last ts —
    # the interval identifies the same event set either way (checked via
    # (user, start, count) above); spot-check the end offset relationship
    ends_stream = {
        (r["user_id"], str(r["session_start"])): r["session_end"]
        for r in spark.table("sess_mem").collect()
    }
    ends_batch = {
        (r["user_id"], str(r["session_start"])): r["session_end"]
        for r in batch.collect()
    }
    for key, batch_end in list(ends_batch.items())[:50]:
        delta = (ends_stream[key] - batch_end).total_seconds()
        assert delta == 30 * 60, f"{key}: stream end must be batch end + gap, got {delta}s"


def test_dedup_stream_drops_watermarked_duplicates(spark, sf_dir, tmp_path):
    src = str(tmp_path / "dup_src")
    ev = (
        table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_id") < 200)
    )
    # the same 200 events land twice (a re-delivered daily drop)
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    deduped = P.dedup_events_stream(P.read_events_stream(spark, src))
    P.available_now_to_parquet(deduped, out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() == 200
    assert result.select("event_id").distinct().count() == 200

    # exactly-once on rerun: same checkpoint, no new files -> no new rows
    P.available_now_to_parquet(
        P.dedup_events_stream(P.read_events_stream(spark, src)), out, ckpt
    )
    assert spark.read.parquet(out).count() == 200
