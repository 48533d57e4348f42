"""Structured-Streaming operators over the event stream.

The reference is batch-only (`slice_db/dump.py:133-144` — one consistent
snapshot per run); these operators are the engine's streaming extension,
specced directly against Spark Structured Streaming semantics on the
``events`` table shape (event_id, ts, user_id, event_type, value, props).

Each builder takes any streaming *or* batch DataFrame with that schema —
Spark's unified API means the same plan runs under ``readStream`` (tests
feed a file/memory source with ``trigger(availableNow=True)``) or as a
batch query.  Watermarks bound state for late data; at cluster scale state
lives in the state store keyed by (window, group) — partition count =
``spark.sql.shuffle.partitions`` — and RocksDB state backend is the knob
to turn for 100 TB jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); parquet fixtures read naive
    micros as TIMESTAMP_NTZ, which ``withWatermark`` rejects.  The session
    timezone is UTC, so the NTZ→LTZ cast is value-preserving."""
    from pyspark.sql import types as T

    if isinstance(events.schema["ts"].dataType, T.TimestampNTZType):
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events


def tumbling_event_counts(events: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Per-(window, event_type) counts + value sums over tumbling windows.

    With a streaming source, the watermark closes windows ``watermark``
    past max(ts) and drops later data (append-mode compatible).
    """
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_event_rates(events: DataFrame, window: str = "10 minutes",
                        slide: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Sliding-window event rate per type (overlapping windows)."""
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into one
    session (``F.session_window`` — dynamic-length state per key)."""
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids within the
    watermark horizon (``dropDuplicatesWithinWatermark`` bounds state; the
    batch path degrades to plain dropDuplicates)."""
    events = _event_time(events)
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


USER_STATE_SCHEMA = "n bigint, sv double, last_us bigint"
USER_ACTIVITY_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_ts timestamp"


def user_activity_state(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running totals — event count, value sum, last event time — carried in
    the state store across micro-batches and emitted (update mode) for
    every user active in the batch.

    The Arrow-batched state function is the engine's template for stateful
    logic Spark's built-in aggregates can't express (per-key models,
    sessionized ML features, CDC merge).  State is (n, sv, last_us) —
    fixed-width, so 100 TB of events costs |users| × ~24 bytes of state.
    The batch path computes the identical result relationally — the
    unified-API oracle the stream tests compare against.
    """
    events = _event_time(events)
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        n, sv, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            sv += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
        state.update((n, sv, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [sv],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            USER_ACTIVITY_SCHEMA,
            USER_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_to_memory(spark, stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Execute a streaming plan against a memory sink until all available
    data is processed; returns the result table DataFrame.  Test/driver
    utility — production jobs point writeStream at kafka/delta/parquet."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def interval_join(
    a: DataFrame,
    b: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    window_us: int | None = None,
) -> DataFrame:
    """Stream-stream time-bounded join: pairs sharing ``user_id`` with
    ``a.ts <= b.ts <= a.ts + window`` — the streaming form of
    :func:`..operators.events.range_pairs`, same output schema
    ``(user_id, a_id, b_id, dt_us)``.

    Streaming path: Spark's native stream-stream inner join.  Both sides
    carry a watermark and the join condition carries explicit event-time
    bounds, so the state store only retains rows inside the
    watermark+window horizon — state is bounded by arrival rate ×
    horizon, not stream length.  Batch path: the interval-bucket
    equi-join decomposition (``range_pairs``) — Catalyst would otherwise
    plan the raw inequality join as a per-key cross product; the
    stream-vs-batch test proves the two formulations agree.
    """
    w_us = window_us if window_us is not None else _interval_us(window)
    a = _event_time(a)
    b = _event_time(b)
    if not (a.isStreaming or b.isStreaming):
        from ..operators.events import range_pairs

        return range_pairs(a, b, window_us=w_us)

    aa = a.withWatermark("ts", watermark).select(
        F.col("user_id"), F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    bb = b.withWatermark("ts", watermark).select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    joined = aa.join(
        bb,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {window}"))
        & (F.col("a_id") != F.col("b_id")),
    )
    return joined.select(
        "user_id",
        "a_id",
        "b_id",
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("dt_us"),
    )


_INTERVAL_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def _interval_us(window: str) -> int:
    """'10 minutes' / '1 day' / '1 minute 30 seconds' → microseconds.
    Fixed-length units only (no month/year — those are calendar-dependent
    and Spark's stream-stream join state bound needs a fixed horizon);
    matches every unit the streaming path's ``INTERVAL`` literal accepts
    for time-of-day arithmetic, so batch and stream take the same window
    strings."""
    toks = window.split()
    if not toks or len(toks) % 2:
        raise ValueError(f"malformed interval {window!r} (want '<n> <unit>' pairs)")
    total = 0
    for n, unit in zip(toks[::2], toks[1::2]):
        u = unit.lower().rstrip("s")
        if u not in _INTERVAL_UNIT_US:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {window!r} "
                f"(fixed-length units only: {sorted(_INTERVAL_UNIT_US)})"
            )
        total += int(n) * _INTERVAL_UNIT_US[u]
    return total


def enriched_segment_counts(
    events: DataFrame,
    customers: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a STATIC
    dimension (customer → market segment), then windowed counts per
    segment — the standard "enrich a stream with a lookup table" shape.

    The static side is just a DataFrame: Spark re-plans it per
    micro-batch (so slowly-changing dimensions pick up updates) and
    broadcast-joins it when it fits — no state store involvement at all;
    only the downstream windowed aggregate keeps (watermark-bounded)
    state.  Batch path: the identical plan, which the oracle gates.
    Output (window_start_s, segment, n) — epoch seconds, exact ints."""
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        src.join(dim, on="user_id")
        .groupBy(F.window("ts", window).alias("win"), "segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_seconds(F.col("win.start")).alias("window_start_s"),
            "segment",
            "n",
        )
    )


def rollup_to_parquet(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Continuous aggregate (hypertable-rollup pattern): tumbling
    per-(window, event_type) counts maintained INCREMENTALLY in a parquet
    sink.  Append output mode + the watermark mean a window's row is
    written exactly once — when the watermark passes its end and the
    window can no longer change — so the sink holds one final row per
    closed window with no upserts, and restarts resume from the
    checkpoint.  The streaming analog of a time-bucketed materialized
    view; late rows beyond the watermark are dropped by contract.

    Returns the StreamingQuery (caller awaits termination; tests use
    ``availableNow`` so the call drains and stops).  Windows still open
    when the stream drains remain unwritten — they belong to the next
    run, which the checkpoint makes incremental.
    """
    agg = tumbling_event_counts(events, window=window, watermark=watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


SESSION_CLOSE_SCHEMA = "user_id bigint, n_events bigint, sum_value double, session_end_us bigint"


def session_close_tws(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Gap-closed session summaries via Spark 4's ``transformWithState``
    API — the arbitrary-stateful successor to ``applyInPandasWithState``
    (`user_activity_state` above), demonstrated with the two features the
    old API lacks: typed VALUE STATE and EVENT-TIME TIMERS.

    Per user the processor accumulates (n, Σvalue, last event time) in a
    value state; every batch it re-registers ONE timer at
    ``last_event + gap``.  When the watermark passes that point the timer
    fires, the closed session row is emitted (append mode — each session
    exactly once), and the state is cleared.  State size is fixed per
    live user; expired users leave nothing behind — the 100 TB/continuous
    story the rollup sink and watermarked aggregates share.

    Batch inputs have no timer machinery: the batch path emits the same
    summaries via `sessionized_counts`-style gap windows, keeping the
    unified-API contract the other streaming operators follow.
    """
    gap_us = _interval_us(gap)
    events = _event_time(events)
    if not events.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy("ts")
        us = F.unix_micros(F.col("ts"))
        gap_flag = F.when(
            us - F.unix_micros(F.lag("ts").over(w)) > gap_us, F.lit(1)
        ).otherwise(F.lit(0))
        sess = F.sum(gap_flag).over(w)
        return (
            events.withColumn("__sess", sess)
            .groupBy("user_id", "__sess")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
                (F.max(us) + F.lit(gap_us)).alias("session_end_us"),
            )
            .select("user_id", "n_events", "sum_value", "session_end_us")
        )

    try:
        import google.protobuf  # noqa: F401  (state-server wire format)
    except ImportError as e:
        raise ImportError(
            "the transformWithState streaming path needs Spark's runtime "
            "dependency 'protobuf' (public PyPI package; absent in this "
            "environment) — the batch path of session_close_tws works "
            "without it, and applyInPandasWithState (`user_activity_state`) "
            "covers protobuf-free custom streaming state"
        ) from e

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SessionCloser(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._agg = handle.getValueState("agg", "n BIGINT, sv DOUBLE, last_us BIGINT")

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            n, sv, last_us = (
                self._agg.get() if self._agg.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                sv += float(pdf["value"].sum())
                last_us = max(last_us, int(pdf["ts"].max().value // 1000))
            self._agg.update((n, sv, last_us))
            # one live timer per user: drop the stale one, arm at last+gap
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_us // 1000 + gap_us // 1000)
            return iter(())  # append mode: emit only on closure

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo: ExpiredTimerInfo):
            if self._agg.exists():
                n, sv, last_us = self._agg.get()
                self._agg.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "sum_value": [sv],
                        "session_end_us": [last_us + gap_us],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionCloser(),
            outputStructType=SESSION_CLOSE_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def trending_report(spark, rollup_dir: str, k: int = 3) -> DataFrame:
    """Top-``k`` event types per closed window, read from the
    :func:`rollup_to_parquet` sink — the serving-side half of a streaming
    trending board.

    Streaming append mode cannot rank inside the stream (a rank over an
    aggregate is not incrementally maintainable), so the standard split
    is: the stream maintains the window counts EXACTLY ONCE in the sink,
    and ranking is a cheap batch read over closed windows — the same
    continuous-aggregate-then-view layering as the rollup itself.  The
    window rank partitions by window (never global), ties break on
    event_type."""
    from pyspark.sql.window import Window

    rolled = spark.read.parquet(rollup_dir)
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    return (
        rolled.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select("window_start", "event_type", F.col("n").cast("bigint").alias("n"), "rnk")
    )
