"""Structured-Streaming operator tests: the same plan runs as a real
stream (file source, availableNow trigger, memory sink) and as a batch
query; results must agree — Spark's unified-API contract is the oracle.
"""

from __future__ import annotations

import os

import pytest

from slice_db_spark.streaming import (
    sessionized_counts,
    sliding_event_rates,
    streaming_dedup,
    tumbling_event_counts,
)
from slice_db_spark.streaming.events import run_stream_to_memory

from conftest import SF_DIR, rows_set


@pytest.fixture(scope="module")
def events_batch(catalog):
    return catalog["events"]


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    # the file streaming source wants a directory; stage the parquet file
    d = tmp_path_factory.mktemp("events_stream")
    src = os.path.join(SF_DIR, "events.parquet")
    os.link(src, d / "events.parquet")
    # raw schema has ts as long (TIMESTAMP(NANOS) under nanosAsLong conf);
    # apply the same ns→µs conversion load_catalog does for batch
    from pyspark.sql import functions as F

    raw_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(raw_schema).parquet(str(d))
    return stream.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


def test_tumbling_stream_matches_batch(spark, events_batch, events_stream):
    want = rows_set(tumbling_event_counts(events_batch))
    got = rows_set(
        run_stream_to_memory(spark, tumbling_event_counts(events_stream), "t_tumble", output_mode="complete")
    )
    assert got == want and len(got) > 0


def test_sliding_stream_matches_batch(spark, events_batch, events_stream):
    want = rows_set(sliding_event_rates(events_batch))
    got = rows_set(
        run_stream_to_memory(spark, sliding_event_rates(events_stream), "t_slide", output_mode="complete")
    )
    assert got == want
    # every event lands in window/slide = 2 overlapping windows
    assert sum(r[3] for r in got) == 2 * events_batch.count()


def test_sessionized_stream_matches_batch(spark, events_batch, events_stream):
    want = rows_set(sessionized_counts(events_batch))
    got = rows_set(
        run_stream_to_memory(spark, sessionized_counts(events_stream), "t_session", output_mode="complete")
    )
    assert got == want and len(got) > 0


def test_streaming_dedup(spark, events_batch, events_stream):
    want = events_batch.dropDuplicates(["event_id"]).count()
    got = run_stream_to_memory(spark, streaming_dedup(events_stream), "t_dedup").count()
    assert got == want
