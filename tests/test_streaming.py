"""Structured Streaming semantics: streaming answers must converge to
the batch answers regardless of arrival order/chunking (Q-ST1's
contract; reference latest-wins semantics orchestrator.py:322-324)."""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
    ARRIVALS_STREAM_SCHEMA,
    latest_snapshot_state,
    read_event_stream,
    run_to_completion,
    running_user_stats,
    windowed_event_counts,
)

from conftest import SF_SMOKE


@pytest.fixture()
def chunked_events_dir(spark, tmp_path):
    """events.parquet split into 4 arrival files, deliberately NOT in
    event-time order (chunk by event_id % 4 → each file spans the full
    time range, so every micro-batch delivers 'late' data)."""
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = tmp_path / "stream_in"
    for b in range(4):
        e.filter(F.col("event_id") % 4 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(out))
    return str(out)


def test_windowed_counts_match_batch(spark, chunked_events_dir):
    name = f"wc_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, chunked_events_dir)
    # each chunk spans the FULL event-time range, so the watermark must
    # exceed the total range or the (correct) late-data drop kicks in
    result = run_to_completion(
        windowed_event_counts(stream, watermark="3650 days"), name, output_mode="update"
    )
    # batch ground truth over the same files
    batch = (
        spark.read.parquet(chunked_events_dir)
        .withColumn("ts_t", F.col("ts").cast("timestamp"))
        .groupBy("user_id", F.window("ts_t", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("user_id", F.unix_timestamp("w.start").alias("window_start_s"), "cnt")
    )
    # update mode re-emits windows as late chunks arrive: keep last emit
    final = (
        result.groupBy("user_id", "window_start_s")
        .agg(F.max("cnt").alias("cnt"))
    )
    assert final.exceptAll(batch).isEmpty() and batch.exceptAll(final).isEmpty()


def test_latest_wins_any_arrival_order(spark, tmp_path):
    """Max-ts-per-customer state is arrival-order independent: feed
    timestamps newest-first and the state still lands on the max."""
    out = tmp_path / "arrivals"
    rows = [("acme", 3000), ("acme", 1000), ("beta", 500), ("acme", 2000), ("beta", 700)]
    for i, (cust, ts) in enumerate(rows):  # one file per arrival, newest first for acme
        spark.createDataFrame([(cust, ts)], ARRIVALS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(out))
    stream = (
        spark.readStream.schema(ARRIVALS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(out))
    )
    name = f"lw_{uuid.uuid4().hex[:8]}"
    result = run_to_completion(latest_snapshot_state(stream), name, "complete")
    state = {r.customer_id: r.max_ts for r in result.collect()}
    assert state == {"acme": 3000, "beta": 700}


def test_stateful_running_stats_match_batch(spark, chunked_events_dir):
    name = f"rs_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, chunked_events_dir)
    result = run_to_completion(running_user_stats(stream), name, "update")
    # last emit per key is the final running state
    final = (
        result.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value_x100").alias("max_value_x100"),
        )
    )
    batch = (
        spark.read.parquet(chunked_events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("value") * 100).cast("long").alias("max_value_x100"),
        )
    )
    assert final.exceptAll(batch).isEmpty() and batch.exceptAll(final).isEmpty()


def test_watermark_bounds_state(spark, tmp_path):
    """The bounded-state guarantee SCALING.md claims: watermark
    advancement EVICTS window state, so state size tracks open windows,
    not input size. (Empirically in this Spark build, a late row that
    arrives in the same batch where the watermark passes its window
    still merges before eviction — late DROP is best-effort, eviction
    is the guarantee. The test pins the guarantee.)"""
    import os
    import time

    import pandas as pd

    out = tmp_path / "late_in"
    out.mkdir()

    def chunk(name, ids, hours, mtime_off):
        pd.DataFrame(
            {
                "event_id": ids,
                "ts": pd.to_datetime(
                    [int(h * 3_600_000_000) for h in hours], unit="us"
                ).astype("datetime64[us]"),
                "user_id": [1] * len(ids),
                "event_type": ["view"] * len(ids),
                "value": [1.0] * len(ids),
                "props": ["{}"] * len(ids),
            }
        ).to_parquet(out / name)
        t = time.time() + mtime_off
        os.utime(out / name, (t, t))

    # batch 0: hour-0 events; batch 1: hour 50/51 (advances watermark to
    # 49h, evicting the hour-0 window state); batch 2: one LATE hour-0 row
    chunk("a.parquet", [1, 2], [0.0, 0.1], -200)
    chunk("b.parquet", [3, 4], [50.0, 51.0], -100)
    chunk("c.parquet", [5], [0.2], 0)

    name = f"wm_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, str(out))
    q = (
        windowed_event_counts(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    # watermark advanced to 49h (51h max event time - 2h) by the last batch
    assert progress[-1]["eventTime"]["watermark"].startswith("1970-01-03T01"), [
        p["eventTime"].get("watermark") for p in progress
    ]
    # state grew to 3 windows while the watermark lagged, then EVICTION:
    # only the hour-50 and hour-51 windows survive — the hour-0 window's
    # state is gone and is not resurrected by the late row
    state_sizes = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    assert state_sizes[-1] == 2, state_sizes
    assert max(state_sizes) == 3, state_sizes


def test_stream_stream_interval_join_matches_batch(spark, chunked_events_dir):
    """Stream-stream interval join (clicks x errors within 1 hour,
    same user) must converge to the batch interval join over the same
    input, under out-of-order arrival chunks."""
    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        clicks_with_recent_errors,
    )

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, chunked_events_dir)
    result = run_to_completion(
        clicks_with_recent_errors(stream, watermark="3650 days"), name, "append"
    )
    e = spark.read.parquet(chunked_events_dir).withColumn(
        "ts_t", F.col("ts").cast("timestamp")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts_t").alias("click_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("err_user_id"),
        F.round("value", 2).alias("error_value"),
        F.col("ts_t").alias("error_ts"),
    )
    batch = clicks.join(
        errors,
        (F.col("user_id") == F.col("err_user_id"))
        & (F.col("error_ts") <= F.col("click_ts"))
        & (F.col("error_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 hour")),
    ).select("click_id", "user_id", "error_id", "error_value")
    assert result.count() > 0
    assert result.exceptAll(batch).isEmpty() and batch.exceptAll(result).isEmpty()


def test_backpressure_caps_one_file_per_microbatch(spark, chunked_events_dir):
    """ST5: maxFilesPerTrigger=1 means every micro-batch ingests at most
    one arrival file — 4 input files must produce >= 4 data-carrying
    micro-batches (the file-source backpressure SCALING.md claims)."""
    import glob

    name = f"bp_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, chunked_events_dir)
    agg = latest_snapshot_state(
        stream.select(F.col("user_id").alias("customer_id"), F.col("ts"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_files = len(glob.glob(f"{chunked_events_dir}/*.parquet"))
    assert n_files == 4
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(data_batches) >= n_files
    total_rows = spark.read.parquet(chunked_events_dir).count()
    assert all(p["numInputRows"] < total_rows for p in data_batches)


def test_watermark_dedup_drops_duplicates_within_horizon(spark, tmp_path):
    """Each arrival file repeats the SAME event rows; the watermarked
    dedup must emit every event exactly once (duplicates here arrive
    within the watermark horizon), matching batch dropDuplicates."""
    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        deduped_event_stream,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(400)
    out = tmp_path / "dup_stream_in"
    for _ in range(3):  # the same rows, three arrival files
        e.coalesce(1).write.mode("append").parquet(str(out))

    name = f"dd_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, str(out))
    result = run_to_completion(
        deduped_event_stream(stream, watermark="3650 days"), name, output_mode="append"
    )
    got = [r.event_id for r in result.select("event_id").collect()]
    want = {r.event_id for r in e.select("event_id").collect()}
    assert len(got) == len(want), "duplicates leaked or rows lost"
    assert set(got) == want


def test_transformwithstate_matches_batch(spark, chunked_events_dir):
    """Spark 4 transformWithStateInPandas twin of the
    applyInPandasWithState operator: final per-user (count, max) state
    must equal the batch aggregate whatever the arrival chunking.

    The TWS driver worker needs a working google.protobuf (it speaks
    the Spark Connect state-server protocol); this container ships a
    broken protobuf, so the test skips there — the operator itself is
    plain public API and runs wherever protobuf is intact. The
    applyInPandasWithState twin above is fully exercised regardless."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unusable: TWS state-server protocol unavailable")
    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        running_user_stats_tws,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev_provider = spark.conf.get(provider_key)
    except Exception:
        prev_provider = None
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        name = f"tws_{uuid.uuid4().hex[:8]}"
        stream = read_event_stream(spark, chunked_events_dir)
        result = run_to_completion(
            running_user_stats_tws(stream), name, output_mode="update"
        )
    finally:
        # don't leak the provider override into later streaming tests
        # sharing this session
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    # update mode emits one row per (user, batch); keep the final state
    final = {}
    for r in result.collect():
        final[r.user_id] = (r.n_events, r.max_value_x100)
    batch = (
        spark.read.parquet(chunked_events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("value") * 100).cast("long").alias("mx"),
        )
        .collect()
    )
    want = {r.user_id: (r.n, r.mx) for r in batch}
    # the LAST emission per user carries the final running state; since
    # memory-sink update mode appends every emission, take the max n
    best = {}
    for r in result.collect():
        if r.user_id not in best or r.n_events > best[r.user_id][0]:
            best[r.user_id] = (r.n_events, r.max_value_x100)
    assert best == want


def test_tws_processor_logic_with_fake_handle():
    """VERDICT r2 task 6: the container's broken google.protobuf blocks
    the end-to-end transformWithStateInPandas run, so the processor's
    state-update logic is proven here against a faked handle/ValueState
    — multi-batch accumulation, max semantics, and one-record-per-key
    bounded state — without the state server."""
    import pandas as _pd

    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        _make_running_user_stats_processor,
    )

    class FakeValueState:
        def __init__(self):
            self.value = None

        def exists(self):
            return self.value is not None

        def get(self):
            return self.value

        def update(self, v):
            self.value = tuple(v)

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    proc = _make_running_user_stats_processor()()
    handle = FakeHandle()
    proc.init(handle)

    # batch 1: two chunks for user "u1"
    out1 = list(
        proc.handleInputRows(
            ("u1",),
            iter(
                [
                    _pd.DataFrame({"value": [1.0, 2.5]}),
                    _pd.DataFrame({"value": [0.25]}),
                ]
            ),
            None,
        )
    )
    assert len(out1) == 1
    assert out1[0].iloc[0].tolist() == ["u1", 3, 250]
    # state holds exactly one record per key
    assert handle.states["agg"].value == (3, 250)

    # batch 2: running state carries over; new max wins
    out2 = list(
        proc.handleInputRows(("u1",), iter([_pd.DataFrame({"value": [9.99]})]), None)
    )
    assert out2[0].iloc[0].tolist() == ["u1", 4, 999]
    assert handle.states["agg"].value == (4, 999)

    # empty batch: count unchanged, emission still reflects state
    out3 = list(
        proc.handleInputRows(("u1",), iter([_pd.DataFrame({"value": []})]), None)
    )
    assert out3[0].iloc[0].tolist() == ["u1", 4, 999]
    proc.close()


def test_streaming_cms_converges_to_batch_sketch(spark, chunked_events_dir):
    """Draining the chunked stream through the streaming CMS maintainer
    yields EXACTLY the batch sketch cells over the same rows — the
    streaming face of count-min mergeability (counts fold across
    micro-batches with no watermark because state is bounded by the
    sketch geometry, not the data)."""
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        streaming_cms_cells,
    )

    name = f"cms_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, chunked_events_dir)
    result = run_to_completion(
        streaming_cms_cells(stream), name, output_mode="complete"
    )
    got = {(r.d, r.bucket): r.cnt for r in result.collect()}
    want = {
        (r.d, r.bucket): r.cnt
        for r in REGISTRY["q_a17_cms"].spark(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_session_windows_converge_to_batch(spark, chunked_events_dir):
    """Session windows under streaming — including sessions MERGED by
    out-of-order arrivals across micro-batches — drain to exactly the
    batch session_window answer over the same rows."""
    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        sessionized_event_counts,
    )

    name = f"sess_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, chunked_events_dir)
    # session windows support append (sessions closed by the watermark)
    # or complete — NOT update; complete shows the final merged state
    final = run_to_completion(
        sessionized_event_counts(stream, watermark="3650 days"),
        name,
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(chunked_events_dir)
        .withColumn("ts_t", F.col("ts").cast("timestamp"))
        .groupBy("user_id", F.session_window("ts_t", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start_s"),
            "cnt",
        )
    )
    # exact set equality: every batch session with its final count
    assert final.exceptAll(batch).isEmpty() and batch.exceptAll(final).isEmpty()


def test_rolling_anomaly_stream_matches_batch_on_ordered_arrival(spark, tmp_path):
    """Streaming rolling z-score (bounded ring-buffer state) must equal
    the batch q_ts6_anomaly when arrival order respects event order —
    chunks are contiguous TIME SLICES here, one micro-batch each, so
    the per-key ring buffer sees events exactly as the batch window
    frame does."""
    from pyspark.sql import Window

    from neo4j_blue_green_arrow_etl_spark.operators.temporal import q_ts6_anomaly
    from neo4j_blue_green_arrow_etl_spark.streaming.stream_queries import (
        rolling_anomaly_stream,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    w = Window.orderBy("ts", "event_id")
    ranked = e.withColumn("q", F.ntile(4).over(w))
    out = tmp_path / "anomaly_in"
    for b in range(1, 5):  # written in time order -> in-order arrival
        ranked.filter(F.col("q") == b).drop("q").coalesce(1).write.mode(
            "append"
        ).parquet(str(out))
    name = f"anom_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, str(out))
    result = run_to_completion(
        rolling_anomaly_stream(stream), name, output_mode="append"
    )
    got = {(r.event_id, r.z) for r in result.collect()}
    want = {(r.event_id, r.z) for r in q_ts6_anomaly(spark, SF_SMOKE).collect()}
    assert got == want and want
