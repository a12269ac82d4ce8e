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


def test_stateful_sessionize_merges_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState continuity proof: events split into two
    TIME-ORDERED files fed one-per-micro-batch; sessions spanning the file
    boundary must be merged by carried state, and the final emitted set must
    equal the batch gaps-and-islands sessions under the emission rule (all
    non-final sessions + final sessions past the watermark gap horizon)."""
    from job_datapipeline_spark.streaming.stateful import sessionize_stateful

    ev = table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    # cut INSIDE the longest non-final multi-event session, so at least one
    # session is guaranteed to have events on both sides of the boundary
    ev.createOrReplaceTempView("_ev_stateful")
    cut = spark.sql("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                              > INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS is_new
          FROM _ev_stateful),
        sess AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM marked),
        agg AS (
          SELECT user_id, sid, min(ts) AS s, max(ts) AS e
          FROM sess GROUP BY user_id, sid)
        SELECT timestamp_micros((unix_micros(s) + unix_micros(e)) DIV 2 + 1) AS c
        FROM agg
        WHERE sid < (SELECT max(s2.sid) FROM agg s2 WHERE s2.user_id = agg.user_id)
          AND unix_micros(e) - unix_micros(s) >= 2
        ORDER BY unix_micros(e) - unix_micros(s) DESC, user_id
        LIMIT 1
    """).collect()[0]["c"]
    src = str(tmp_path / "src")
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    stream = sessionize_stateful(
        P.read_events_stream(spark, src, max_files_per_trigger=1)
    )
    P.available_now_to_memory(stream, "sess_state_mem", str(tmp_path / "ckpt"), "append")
    result = spark.table("sess_state_mem")
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in result.collect()
    }

    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("""
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                  > INTERVAL 30 MINUTES
                          THEN 1 ELSE 0 END AS is_new
              FROM _ev_stateful),
            sess AS (
              SELECT user_id, ts,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM marked),
            agg AS (
              SELECT user_id, sid, count(*) AS n_events,
                     min(ts) AS session_start, max(ts) AS session_end
              FROM sess GROUP BY user_id, sid),
            wm AS (SELECT max(ts) - INTERVAL 1 SECONDS AS horizon FROM _ev_stateful)
            SELECT user_id, session_start, session_end, n_events
            FROM agg, wm
            WHERE sid < (SELECT max(s2.sid) FROM agg s2 WHERE s2.user_id = agg.user_id)
               OR session_end + INTERVAL 30 MINUTES < horizon
        """).collect()
    }
    assert got == want and len(got) > 0

    # at least one emitted session must straddle the file boundary: its
    # events came from BOTH micro-batches, merged through GroupState
    straddling = result.filter(
        (F.col("session_start") < F.lit(cut)) & (F.col("session_end") >= F.lit(cut))
    ).count()
    assert straddling > 0


def test_stream_stream_join_equals_batch(spark, events_dir, tmp_path):
    # append mode: only pairs whose watermark horizon has passed are final,
    # but AvailableNow over a finite directory runs a no-data batch at the
    # end that advances the watermark to (max ts - delay), so pairs older
    # than that horizon are all emitted; compare against the batch twin
    # restricted to the same horizon
    stream = P.view_click_attribution_stream(
        P.read_events_stream(spark, events_dir + "/events.parquet")
    )
    P.available_now_to_memory(stream, "attr_mem", str(tmp_path / "ckpt"), output_mode="append")
    got = {
        (r["user_id"], r["view_id"], r["click_id"])
        for r in spark.table("attr_mem").collect()
    }
    ev = table(spark, events_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    batch = P.view_click_attribution_stream(ev)
    want_all = {
        (r["user_id"], r["view_id"], r["click_id"]) for r in batch.collect()
    }
    # streamed pairs must be a subset of batch pairs and cover everything
    # below the final watermark horizon
    assert got <= want_all
    horizon = ev.agg(
        (F.max("ts") - F.expr("interval 1 hour")).alias("h")
    ).collect()[0]["h"]
    want_final = {
        (r["user_id"], r["view_id"], r["click_id"])
        for r in batch.filter(
            (F.col("view_ts") < F.lit(horizon)) & (F.col("click_ts") < F.lit(horizon))
        ).collect()
    }
    assert want_final <= got and len(want_final) > 0


def test_transform_with_state_totals_or_documented_gate(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 StatefulProcessor API): when the
    protobuf dependency exists, cumulative per-user totals across TWO
    micro-batches must equal the batch groupBy (state carries across
    batches); in environments without protobuf the operator must fail
    FAST with a clear ImportError, not crash mid-stream."""
    import tempfile

    import pytest as _pytest
    from pyspark.sql import functions as F

    from job_datapipeline_spark.catalog import table
    from job_datapipeline_spark.streaming.stateful import (
        _tws_available,
        user_totals_tws,
    )

    ev = table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ok, _ = _tws_available()
    if not ok:
        with _pytest.raises(ImportError, match="protobuf"):
            user_totals_tws(ev)
        _pytest.skip("protobuf absent: TWS gate verified, run skipped")
    src = tempfile.mkdtemp(prefix="tws_src_") + "/events"
    ev.repartitionByRange(2, "event_id").write.mode("overwrite").parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = user_totals_tws(stream)
        q = (
            out.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="tws_ck_"))
            .format("memory")
            .queryName("tws_totals")
            .start()
        )
        q.awaitTermination()
        final = spark.table("tws_totals").groupBy("user_id").agg(
            F.max("n_events").alias("n"), F.max("total_value").alias("s")
        )
        batch = ev.groupBy("user_id").agg(
            F.count("*").alias("bn"), F.sum("value").alias("bs")
        )
        bad = final.join(batch, "user_id").filter(
            "n <> bn OR abs(s - bs) > 1e-6"
        )
        assert bad.count() == 0
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_processor_differential_replay(spark, sf_dir):
    """Pure-python replay of the TWS state transitions — proves the
    StatefulProcessor's cross-batch semantics WITHOUT the protobuf state
    server (absent in this container). The processor only touches its
    handle via getValueState/exists/get/update, so an in-memory handle
    keyed the way the runtime keys state (per grouping key) drives the
    REAL class through three micro-batches; every emission must equal the
    independently-computed cumulative aggregate of the batches seen so
    far, and the final emission must equal the whole-table groupBy."""
    import pandas as pd

    from job_datapipeline_spark.catalog import table
    from job_datapipeline_spark.streaming.stateful import totals_stateful_processor

    processor, out_schema = totals_stateful_processor()
    assert [f.name for f in out_schema.fields] == [
        "user_id", "n_events", "total_value",
    ]

    class _FakeValueState:
        def __init__(self, store, key):
            self._store, self._key = store, key

        def exists(self):
            return self._key in self._store

        def get(self):
            return self._store[self._key]

        def update(self, value):
            self._store[self._key] = tuple(value)

    class _FakeHandle:
        def __init__(self, store, key):
            self._store, self._key = store, key

        def getValueState(self, name, schema):
            return _FakeValueState(self._store, (name, self._key))

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .toPandas()
    )
    batches = [ev[ev["event_id"] % 3 == k] for k in range(3)]
    store: dict = {}
    seen = pd.DataFrame(columns=ev.columns)
    for batch in batches:
        emitted = {}
        for user_id, pdf in batch.groupby("user_id"):
            processor.init(_FakeHandle(store, int(user_id)))
            for out in processor.handleInputRows((int(user_id),), iter([pdf]), None):
                emitted[int(out["user_id"].iloc[0])] = (
                    int(out["n_events"].iloc[0]),
                    float(out["total_value"].iloc[0]),
                )
        seen = pd.concat([seen, batch], ignore_index=True)
        # independent cumulative expectation over all batches so far
        cum = seen.groupby("user_id").agg(n=("value", "size"), s=("value", "sum"))
        assert set(emitted) == set(batch["user_id"].astype(int).unique())
        for uid, (n, s) in emitted.items():
            assert n == int(cum.loc[uid, "n"])
            assert abs(s - float(cum.loc[uid, "s"])) < 1e-6
    # final state equals the whole-table aggregate for every user
    total = ev.groupby("user_id").agg(n=("value", "size"), s=("value", "sum"))
    assert len(store) == len(total)
    for (name, uid), (n, s) in store.items():
        assert name == "tot"
        assert n == int(total.loc[uid, "n"])
        assert abs(s - float(total.loc[uid, "s"])) < 1e-6
