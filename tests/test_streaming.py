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
    # apply the same timestamp normalization load_catalog does for batch
    from slice_db_spark.session import normalize_timestamps

    raw_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(raw_schema).parquet(str(d))
    return normalize_timestamps(stream, src)


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


def test_user_activity_state_stream_matches_batch(spark, events_batch, tmp_path_factory):
    """applyInPandasWithState across MULTIPLE micro-batches: stage the
    events as several files, process one file per trigger, and check the
    final per-user state equals the batch aggregate."""
    import math

    from pyspark.sql import functions as F

    from slice_db_spark.streaming import user_activity_state

    d = tmp_path_factory.mktemp("events_multi")
    events_batch.repartition(4).write.mode("overwrite").parquet(str(d))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = run_stream_to_memory(
        spark, user_activity_state(stream), "t_state", output_mode="update"
    )
    # update mode emits a row per (user, batch); the final state is the row
    # with the highest running count
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = {
        r.user_id: r
        for r in out.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    want = {r.user_id: r for r in user_activity_state(events_batch).collect()}
    assert set(final) == set(want) and len(want) > 0
    for uid, got in final.items():
        exp = want[uid]
        assert got.n_events == exp.n_events, uid
        assert math.isclose(got.sum_value, exp.sum_value, rel_tol=1e-9), uid
        assert got.last_ts == exp.last_ts, uid


def test_interval_join_stream_matches_batch(spark, events_batch, events_stream):
    """Stream-stream time-bounded join == batch interval-bucket range
    join: Spark's native streaming join (watermark-bounded state) and the
    bucketed equi-join decomposition must produce identical pairs."""
    from slice_db_spark.streaming.events import interval_join

    def sides(df):
        return (
            df.where("event_type = 'error'"),
            df.where("event_type = 'purchase'"),
        )

    batch = interval_join(*sides(events_batch), window="10 minutes")
    sa, sb = sides(events_stream)
    streamed = run_stream_to_memory(
        spark, interval_join(sa, sb, window="10 minutes"), "interval_join_test"
    )
    assert rows_set(streamed) == rows_set(batch)
    assert batch.count() > 0


def test_interval_us_units_and_compound():
    """Batch and stream accept the same window strings: every
    fixed-length unit plus compound intervals; calendar units reject
    with a clear error."""
    import pytest

    from slice_db_spark.streaming.events import _interval_us

    assert _interval_us("10 minutes") == 600_000_000
    assert _interval_us("1 day") == 86_400_000_000
    assert _interval_us("2 weeks") == 14 * 86_400_000_000
    assert _interval_us("500 milliseconds") == 500_000
    assert _interval_us("1 minute 30 seconds") == 90_000_000
    with pytest.raises(ValueError, match="unsupported interval unit"):
        _interval_us("1 month")
    with pytest.raises(ValueError, match="malformed interval"):
        _interval_us("10")


def test_interval_join_batch_accepts_day_window(spark, events_batch):
    """The batch fallback must not crash on units the streaming INTERVAL
    literal accepts (review finding: KeyError('day'))."""
    from slice_db_spark.streaming.events import interval_join

    out = interval_join(
        events_batch.where("event_type = 'signup'").limit(50),
        events_batch.where("event_type = 'purchase'").limit(50),
        window="1 day",
    )
    assert out.columns == ["user_id", "a_id", "b_id", "dt_us"]
    out.count()  # executes


def test_interval_join_drops_late_rows_past_watermark(spark, tmp_path_factory):
    """Watermark semantics across micro-batches: the GLOBAL watermark is
    the min over both sides' watermarks, and join state is evicted at
    the END of each batch — so a row must arrive two batches after both
    sides advanced past it to be provably dropped.  This pins the state
    bound the docstring claims (horizon-bounded state, not stream-length
    state)."""
    import datetime as dtm

    from pyspark.sql import Row

    from slice_db_spark.streaming.events import interval_join

    base = dtm.datetime(2024, 1, 1)

    def rows(specs):
        return [
            Row(event_id=i, ts=base + dtm.timedelta(minutes=m), user_id=u, event_type=t)
            for i, (u, m, t) in specs
        ]

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    # batch 1: pairs (0,2) and (1,3); advances BOTH sides' event time to
    # ~200 -> watermark(min of sides) = ~170 after the batch
    b1 = rows([
        (0, (1, 0, "error")), (2, (1, 1, "purchase")),
        (1, (1, 200, "error")), (3, (1, 201, "purchase")),
    ])
    # batch 2: pair (4,5); at its END, eviction runs with wm=170 and
    # removes error id 0 (0 + 10min < 170)
    b2 = rows([(4, (1, 400, "error")), (5, (1, 401, "purchase"))])
    # batch 3: purchase at t=2 — would pair with error 0 in a batch
    # computation, but that state is gone
    b3 = rows([(6, (1, 2, "purchase"))])

    staged = tmp_path_factory.mktemp("late_join_staged")
    for i, b in enumerate((b1, b2, b3)):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(
            str(staged / f"b{i}")
        )
    import glob
    import shutil

    flat = tmp_path_factory.mktemp("late_join_flat")
    import time as _time

    now = _time.time()
    for i in range(3):
        (part,) = glob.glob(str(staged / f"b{i}" / "part-*.parquet"))
        dst = flat / f"{i}.parquet"
        shutil.copy(part, dst)
        # the file source orders batches by MODIFICATION TIME; copies can
        # land in the same clock tick, so pin strictly-increasing mtimes
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(flat))
    )
    out = run_stream_to_memory(
        spark,
        interval_join(
            stream.where("event_type = 'error'"),
            stream.where("event_type = 'purchase'"),
            window="10 minutes",
            watermark="30 minutes",
        ),
        "late_join_t",
    )
    got = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert {(0, 2), (1, 3), (4, 5)} <= got
    assert (0, 6) not in got


def test_enrich_stream_matches_batch(spark, events_batch, events_stream, catalog):
    """Stream-static join: the identical plan over readStream (static
    dim re-planned per micro-batch, no join state) equals the batch
    result."""
    from slice_db_spark.streaming.events import enriched_segment_counts

    customers = catalog["customer"]
    batch = enriched_segment_counts(events_batch, customers)
    streamed = run_stream_to_memory(
        spark,
        enriched_segment_counts(events_stream, customers),
        "enrich_test",
        output_mode="complete",
    )
    assert rows_set(streamed) == rows_set(batch)
    assert batch.count() > 0


def test_rollup_incremental_exactly_once(spark, events_batch, tmp_path_factory):
    """Continuous-aggregate sink: run the rollup twice over a growing
    landing dir; closed windows appear EXACTLY once across both runs
    (checkpoint-incremental, no duplicates), and every written row
    matches the batch aggregate."""
    from slice_db_spark.streaming.events import rollup_to_parquet, tumbling_event_counts

    land = tmp_path_factory.mktemp("rollup_land")
    out = tmp_path_factory.mktemp("rollup_out")
    ck = tmp_path_factory.mktemp("rollup_ck")
    schema = events_batch.schema

    # split by TIME (arrival respects event time, the rollup's contract —
    # a parity split would make half the rows maximally late and the
    # watermark would drop them by design)
    mid = events_batch.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
    first = events_batch.where(f"unix_micros(ts) <= {int(mid)}")
    second = events_batch.where(f"unix_micros(ts) > {int(mid)}")
    first.coalesce(1).write.mode("overwrite").parquet(str(land / "b0"))

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(land) + "/*/")
        q = rollup_to_parquet(stream, str(out), str(ck))
        q.awaitTermination()

    run()
    second.coalesce(1).write.mode("overwrite").parquet(str(land / "b1"))
    run()

    got = spark.read.parquet(str(out))
    # exactly-once: no (window, type) row written twice across the runs
    n = got.count()
    assert n == got.select("window_start", "event_type").distinct().count()
    # every written row agrees with the batch aggregate over ALL data
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in tumbling_event_counts(events_batch).collect()
    }
    for r in got.collect():
        k = (r["window_start"], r["event_type"])
        assert want[k][0] == r["n"], k
    assert n > 0


def _us(s_):
    import datetime

    return int(datetime.datetime.fromisoformat(s_).timestamp() * 1_000_000)


def test_session_close_tws_batch_path(spark):
    """Unified-API batch path of the transformWithState session closer:
    gap sessionization summaries, one row per closed-or-open session."""
    from slice_db_spark.streaming.events import session_close_tws

    us = _us
    gap_us = 10 * 60 * 1_000_000
    batch_df = spark.createDataFrame(
        [(1, 1, "2024-01-01 02:00:00", 1.0), (2, 1, "2024-01-01 02:05:00", 2.0),
         (3, 2, "2024-01-01 02:00:00", 5.0), (4, 1, "2024-01-01 03:00:00", 7.0)],
        "event_id bigint, user_id bigint, ts string, value double",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts", "value")
    bgot = {
        (r.user_id, r.n_events, r.sum_value, r.session_end_us)
        for r in session_close_tws(batch_df, gap="10 minutes").collect()
    }
    assert bgot == {
        (1, 2, 3.0, us("2024-01-01 02:05:00") + gap_us),
        (1, 1, 7.0, us("2024-01-01 03:00:00") + gap_us),  # new session after gap
        (2, 1, 5.0, us("2024-01-01 02:00:00") + gap_us),
    }


def test_session_close_tws_streaming_timers(spark, tmp_path):
    """transformWithState streaming path: event-time timers fire once the
    watermark passes last_event+gap, each closed session emits exactly
    once (append), state clears.  Needs Spark's protobuf runtime
    dependency — absent in this sandbox, so this skips (same pattern as
    the live-PostgreSQL tests)."""
    import json
    import os

    import pytest

    from slice_db_spark.streaming.events import session_close_tws

    pytest.importorskip("google.protobuf")
    us = _us
    gap_us = 10 * 60 * 1_000_000

    d = tmp_path / "ev"
    d.mkdir()
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

    def batch(name, rows, mtime):
        p = d / name
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (mtime, mtime))

    batch("b1.jsonl", [
        {"event_id": 1, "ts": "2024-01-01 02:00:00", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 02:05:00", "user_id": 1, "event_type": "a", "value": 2.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01 02:00:00", "user_id": 2, "event_type": "a", "value": 5.0, "props": "{}"},
    ], 1_700_000_000)
    batch("b2.jsonl", [
        {"event_id": 4, "ts": "2024-01-01 03:00:00", "user_id": 1, "event_type": "a", "value": 7.0, "props": "{}"},
        {"event_id": 5, "ts": "2024-01-01 05:00:00", "user_id": 9, "event_type": "a", "value": 0.0, "props": "{}"},
    ], 1_700_000_100)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(d))
    out = session_close_tws(stream, gap="10 minutes", watermark="1 minute")
    got = {
        (r.user_id, r.n_events, r.sum_value, r.session_end_us)
        for r in run_stream_to_memory(spark, out, "t_tws").collect()
    }
    assert (1, 2, 3.0, us("2024-01-01 02:05:00") + gap_us) in got
    assert (2, 1, 5.0, us("2024-01-01 02:00:00") + gap_us) in got
    assert all(u in (1, 2) for u, *_ in got), got


def test_trending_report_over_rollup_sink(spark, events_batch, tmp_path_factory):
    """Serving-side trending: rank over the rollup sink equals a rank
    over the batch aggregate restricted to the windows the sink closed."""
    from slice_db_spark.streaming.events import (
        rollup_to_parquet,
        trending_report,
        tumbling_event_counts,
    )

    land = tmp_path_factory.mktemp("trend_land")
    out = tmp_path_factory.mktemp("trend_out")
    ck = tmp_path_factory.mktemp("trend_ck")
    events_batch.coalesce(1).write.mode("overwrite").parquet(str(land / "b0"))
    stream = spark.readStream.schema(events_batch.schema).parquet(str(land) + "/*/")
    rollup_to_parquet(stream, str(out), str(ck)).awaitTermination()

    got = {
        (r.window_start, r.event_type, r.n, r.rnk)
        for r in trending_report(spark, str(out), k=2).collect()
    }
    assert got and all(rnk <= 2 for *_, rnk in got)
    # ground truth: batch aggregate ranked the same way, restricted to
    # the windows present in the sink
    closed = {w for (w, *_ ) in got}
    import itertools

    agg = [
        (r.window_start, r.event_type, r.n)
        for r in tumbling_event_counts(events_batch).collect()
        if r.window_start in closed
    ]
    want = set()
    keyfn = lambda t: t[0]  # noqa: E731
    for w, grp in itertools.groupby(sorted(agg, key=lambda t: (t[0], -t[2], t[1])), keyfn):
        for i, (ww, et, n) in enumerate(grp, 1):
            if i <= 2:
                want.add((ww, et, n, i))
    assert got == want


def test_hist_stream_state_matches_batch_sketch(spark, events_batch, tmp_path_factory):
    """Streaming histogram maintenance: run the sketch stream over a
    landing dir in two installments (second run is checkpoint-
    incremental); the merged state must equal the batch histogram of ALL
    values, and quantiles read off the state must match the batch sketch
    exactly — the mergeable-state contract, end to end."""
    from slice_db_spark.operators.sketches import hist_counts, hist_quantiles
    from slice_db_spark.streaming.sketches import (
        hist_stream_to_parquet,
        read_hist_quantiles,
        read_hist_state,
    )

    vals = events_batch.selectExpr("value * 1 as value")
    lo, hi, n = vals.selectExpr(
        "cast(min(round(value*100)) as bigint)",
        "cast(max(round(value*100)) as bigint)",
        "count(*)",
    ).first()
    land = tmp_path_factory.mktemp("hist_land")
    out = tmp_path_factory.mktemp("hist_out")
    ck = tmp_path_factory.mktemp("hist_ck")
    half = vals.limit(vals.count() // 2)

    schema = vals.schema
    vals.exceptAll(half).coalesce(1).write.mode("overwrite").parquet(str(land / "b0"))

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(land) + "/*/")
        hist_stream_to_parquet(
            stream, str(out), str(ck), int(lo), int(hi)
        ).awaitTermination()

    run()
    half.coalesce(1).write.mode("overwrite").parquet(str(land / "b1"))
    run()

    want = {r["bucket"]: r["cnt"] for r in hist_counts(vals, "value", int(lo), int(hi)).collect()}
    got = {r["bucket"]: r["cnt"] for r in read_hist_state(spark, str(out)).collect()}
    assert got == want
    bq = {r["p_pct"]: r["est_cents"] for r in hist_quantiles(
        spark, hist_counts(vals, "value", int(lo), int(hi)), int(lo), int(hi), int(n)
    ).collect()}
    sq = {r["p_pct"]: r["est_cents"] for r in
          read_hist_quantiles(spark, str(out), int(lo), int(hi)).collect()}
    assert sq == bq and set(sq) == {50, 90, 99}


def test_cms_stream_estimates_match_batch(spark, events_batch, tmp_path_factory):
    """Streaming CMS maintenance: two incremental runs; read-side
    estimates off the merged epochs must equal the batch CMS over all
    rows, and every estimate must be >= the true count (the never-under
    contract, preserved through the merge)."""
    from slice_db_spark.operators.sketches import cms_estimates
    from slice_db_spark.streaming.sketches import cms_stream_to_parquet, read_cms_estimates

    vals = events_batch.selectExpr("event_type as value")
    land = tmp_path_factory.mktemp("cms_land")
    out = tmp_path_factory.mktemp("cms_out")
    ck = tmp_path_factory.mktemp("cms_ck")
    half = vals.limit(vals.count() // 2)
    vals.exceptAll(half).coalesce(1).write.mode("overwrite").parquet(str(land / "b0"))

    def run():
        stream = spark.readStream.schema(vals.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(land) + "/*/")
        cms_stream_to_parquet(stream, str(out), str(ck)).awaitTermination()

    run()
    half.coalesce(1).write.mode("overwrite").parquet(str(land / "b1"))
    run()

    keys = vals.selectExpr("value as key").distinct()
    want = {r["key"]: r["cms_estimate"] for r in cms_estimates(vals, "value", keys).collect()}
    got = {r["key"]: r["cms_estimate"] for r in read_cms_estimates(spark, str(out), keys).collect()}
    assert got == want
    true = {r["value"]: r["cnt"] for r in
            vals.groupBy("value").count().withColumnRenamed("count", "cnt").collect()}
    assert all(got[k] >= true[k] for k in true)
