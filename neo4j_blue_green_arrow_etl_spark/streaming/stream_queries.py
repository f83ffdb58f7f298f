"""Structured Streaming surface: the engine's incremental counterparts
of the batch declared queries.

The reference's orchestrator is a continuous micro-batch loop (SURVEY
§2.9); snapshot *control-plane* discovery stays a driver loop by design.
This module is the *data-plane* streaming surface: the same logical
expressions as the batch queries (q_st2 tumbling window, q_a2/ST3
latest-wins state) run under ``readStream`` so they incrementally
maintain results over unbounded input.

Contract pinned by tests/test_streaming.py: for any split of the input
into arrival chunks — including out-of-order event-time arrivals — the
final streaming state equals the one-shot batch answer (Q-ST1's
promise, reference orchestrator.py:322-324 latest-wins semantics).

Scale notes: watermarked windowed aggregation keeps per-window partial
state only until ``watermark`` passes the window end — state is bounded
by (keys x open windows), not input size. ``applyInPandasWithState``
holds one tuple per key. Shuffle is a single hash exchange on the
grouping key, exactly as the batch plan.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),  # microsecond event time
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

ARRIVALS_STREAM_SCHEMA = StructType(
    [
        StructField("customer_id", StringType()),
        StructField("ts", LongType()),
    ]
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of events parquet (one file per micro-batch
    arrival); ``ts_t`` aliases the microsecond ts exactly as the batch
    reader's normalize_event_ts output."""
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # ST5 backpressure analogue
        .parquet(input_dir)
    )
    return raw.withColumn("ts_t", F.col("ts").cast("timestamp"))


def windowed_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Incremental q_st2: per-user tumbling 1-hour event-time window
    counts with a late-data watermark. Append-mode compatible: a window
    finalizes once the watermark passes its end."""
    return (
        events.withWatermark("ts_t", watermark)
        .groupBy("user_id", F.window("ts_t", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "cnt",
        )
    )


def latest_snapshot_state(arrivals: DataFrame) -> DataFrame:
    """Incremental ST3 latest-wins: max event-time ts per customer,
    regardless of arrival order (update/complete mode)."""
    return arrivals.groupBy("customer_id").agg(F.max("ts").alias("max_ts"))


_RUNNING_MAX_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value_x100", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("mx100", LongType())]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (SURVEY §2.9 'applyInPandasWithState for
    custom stateful operators'): per-user running event count and max
    value, emitted every micro-batch in update mode.

    The state function is a CLOSURE, not a module-level function:
    cloudpickle ships closures by value, while module-level functions
    are pickled by reference (module+qualname) and executor Python
    workers then need this package importable — true only if the driver
    happens to run with the repo as cwd/sys.path. By-value shipping
    removes the deployment coupling (no --py-files needed)."""

    def running_max_fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # per-user running (count, max value); value scaled to int cents
        # so the state tuple stays integral — one tuple per key, ever
        n, mx = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = int(round(pdf["value"].max() * 100)) if len(pdf) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value_x100": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        running_max_fn,
        outputStructType=_RUNNING_MAX_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str, output_mode: str = "update"
) -> DataFrame:
    """Drain all available input through a memory sink (availableNow
    trigger) and return the final in-memory table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def clicks_with_recent_errors(
    events: DataFrame, max_lag: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each click paired with every error
    event of the same user in the preceding ``max_lag`` window.

    Both sides are watermarked and the join condition bounds the error
    timestamp to [click - max_lag, click], so Spark can GC join state
    once the watermark passes the bound — state stays proportional to
    (keys x lag window), not stream length. This is the streaming
    counterpart of the batch as-of join (q_j7_asof) when ALL recent
    matches are wanted rather than the latest one."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts_t").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("err_user_id"),
            F.col("value").alias("error_value"),
            F.col("ts_t").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    lag = F.expr(f"INTERVAL {max_lag}")
    return clicks.join(
        errors,
        (F.col("user_id") == F.col("err_user_id"))
        & (F.col("error_ts") <= F.col("click_ts"))
        & (F.col("error_ts") >= F.col("click_ts") - lag),
    ).select("click_id", "user_id", "error_id", F.round("error_value", 2).alias("error_value"))


def deduped_event_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-key dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each seen key only until the
    watermark passes its event time, so dedup state is O(keys per
    watermark horizon) instead of O(all keys ever) — the difference
    between a stream that runs for years and one that OOMs. Trade-off
    (documented, inherent): a duplicate arriving later than the
    watermark horizon after its first copy is NOT caught; the batch
    q_st5_dropdup is the unbounded-state exact twin."""
    return events.withWatermark("ts_t", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def _make_running_user_stats_processor():
    """Module-level construction of the TWS StatefulProcessor so its
    batch-update logic is unit-testable with a faked handle (see
    tests/test_streaming.py::test_tws_processor_logic_with_fake_handle)
    even where the TWS state-server protocol (google.protobuf) is
    unavailable. Import stays lazy: pyspark's stateful_processor module
    is Spark-4-only public API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningUserStatsProcessor(StatefulProcessor):
        """Per-user running (count, max*100) with one ValueState record
        per key — identical semantics to the applyInPandasWithState
        twin ``running_user_stats``."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "agg",
                StructType(
                    [StructField("n", LongType()), StructField("mx100", LongType())]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, mx = self._st.get() if self._st.exists() else (0, None)
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    batch_max = int(round(pdf["value"].max() * 100))
                    mx = batch_max if mx is None else max(mx, batch_max)
            self._st.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value_x100": [mx]}
            )

        def close(self) -> None:
            pass

    return RunningUserStatsProcessor


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same per-user running (count, max) operator as
    ``running_user_stats``, on Spark 4's ``transformWithStateInPandas``
    — the successor API to applyInPandasWithState (SPARK-49564
    arbitrary-state v2): typed state handles (ValueState here; List/Map
    state and timers exist for richer operators), an object lifecycle
    (init/handleInputRows/close), and the same bounded one-record-per-
    key state. Both APIs ship so pipelines on either surface have a
    reference implementation; the convergence-to-batch test covers
    them against the same oracle."""
    RunningUserStatsProcessor = _make_running_user_stats_processor()
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningUserStatsProcessor(),
        outputStructType=_RUNNING_MAX_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def streaming_cms_cells(events: DataFrame) -> DataFrame:
    """Continuously maintained count-min sketch over the event stream:
    the same DEPTH x WIDTH cell addressing as the batch build
    (operators.sketches.q_a17_cms), run as a streaming aggregation.

    The sketch is the rare aggregate that is streaming-safe WITHOUT a
    watermark: its state is bounded by the sketch geometry (DEPTH x
    WIDTH rows), never by key cardinality or input size, so the
    unbounded groupBy cannot grow. Counts are associative, so every
    micro-batch's map-side partials fold into the running cells — the
    streaming twin of the batch sketch's cell-wise mergeability
    (pinned by test: draining any chunking of the input yields exactly
    the batch cells)."""
    from ..operators.sketches import cms_bucket_array

    return (
        events.select(
            F.posexplode(cms_bucket_array("user_id")).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Incremental q_st3: per-user SESSION windows (merge while events
    arrive within ``gap``) maintained under Structured Streaming. The
    hard part session windows add over tumbling ones is MERGING — two
    open sessions fuse when a late event lands between them — which the
    engine handles in the state store; the watermark closes sessions
    whose gap has definitely expired, bounding state by (users x open
    sessions). Output modes: append (emit once closed) or complete —
    Spark rejects update for merging session aggregations. Same logical
    expression as the batch q_st3_session, so any chunking of the input
    drains to the batch answer (pinned by test)."""
    return (
        events.withWatermark("ts_t", watermark)
        .groupBy("user_id", F.session_window("ts_t", gap).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "cnt",
        )
    )


# ---------------------------------------------------------------------------
# Streaming rolling-anomaly detection (round 4): the stateful twin of the
# batch q_ts6_anomaly (operators/temporal.py) — same trailing-N baseline,
# same exclusive frame, state = one bounded ring buffer per key.
# ---------------------------------------------------------------------------

_ANOM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

_ANOM_STATE_SCHEMA = StructType([StructField("window", ArrayType(DoubleType()))])


def rolling_anomaly_stream(
    events: DataFrame, window: int = 20, z_thresh: float = 3.0
) -> DataFrame:
    """Per-event-type rolling z-score anomaly flags under Structured
    Streaming: each value is scored against the mean/stddev of the
    ``window`` PRECEDING values of its key (exclusive of itself) and
    emitted when |z| > ``z_thresh``.

    State is ONE float array of at most ``window`` values per key —
    bounded forever, no watermark needed (the baseline is count-based,
    not time-based). Rows inside a batch are processed in (ts,
    event_id) order; convergence to the batch operator holds when
    arrival order respects event order per key (the chunked-replay
    test), which is the semantics a count-based trailing baseline can
    guarantee under streaming — out-of-order arrival shifts WHICH
    events form a late row's baseline, exactly as it would for any
    online detector."""

    def anomaly_fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        out_id, out_val, out_z = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                if len(buf) >= window:
                    mu = sum(buf) / len(buf)
                    var = sum((x - mu) ** 2 for x in buf) / (len(buf) - 1)
                    sd = math.sqrt(var)
                    if sd > 0 and abs(val - mu) > z_thresh * sd:
                        out_id.append(int(eid))
                        out_val.append(round(float(val), 2))
                        out_z.append(round((float(val) - mu) / sd, 2))
                buf.append(float(val))
                if len(buf) > window:
                    buf.pop(0)
        state.update((buf,))
        yield pd.DataFrame(
            {
                "event_id": out_id,
                "event_type": [key[0]] * len(out_id),
                "value": out_val,
                "z": out_z,
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        anomaly_fn,
        outputStructType=_ANOM_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
