"""Batch event-sequence analytics: conversion funnels, gap-based
sessionization, as-of joins, and bounded-interval range joins.

Complements :mod:`..streaming.events` (the watermark/window operators)
with the batch shapes product analytics runs over the same table.  All
outputs use epoch-microsecond BIGINTs so the DuckDB oracles compare
exactly (`unix_micros` ↔ ``epoch_us`` — no float epochs, no timezone
rendering).

Scale notes: every shuffle is keyed by ``user_id`` (funnel /
sessionization / as-of) or ``(user_id, time-bucket)`` (range join);
funnel stages are repeated joins on the SAME key so the exchanges are
reused across stages; sessionization and the as-of merge are one window
pass per user partition; the range join never compares events further
apart than one bucket width — no global ordering, no cross join
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each user who performed
    ``stages[0]``, the earliest time of each subsequent stage STRICTLY
    AFTER the previous stage's time (the standard strictly-sequential
    funnel definition — re-orderings don't count as conversions).

    Output: (user, t_<stage> epoch-µs BIGINT, nullable past the drop-off
    point, n_stages_reached).  Users who never entered the funnel are
    absent; a NULL ``t_<s>`` means the user dropped off before ``s``.
    """
    if not stages:
        raise ValueError("stages must not be empty")
    us = F.unix_micros(F.col(ts_col))
    cols = [f"t_{s}" for s in stages]
    # ONE pass over the fact table: sorted per-(user, stage) time arrays.
    # A naive per-stage filter+join formulation re-scans the events k+
    # times; aggregating first shrinks everything downstream to one row
    # per (user, stage), so the k stage joins run over frames ~|users|
    # in size — negligible next to the fact scan they replace.
    per = (
        events.where(F.col(type_col).isin(stages))
        .select(F.col(user_col), F.col(type_col), us.alias("__us"))
        .groupBy(user_col, type_col)
        .agg(F.sort_array(F.collect_list("__us")).alias("__ts"))
    )
    out = (
        per.where(F.col(type_col) == stages[0])
        .select(F.col(user_col), F.element_at("__ts", 1).alias(cols[0]))
    )
    for i, s in enumerate(stages[1:], 1):
        stage_i = per.where(F.col(type_col) == s).select(
            F.col(user_col), F.col("__ts").alias("__ts_i")
        )
        out = out.join(stage_i, user_col, "left")
        prev = F.col(cols[i - 1])
        # earliest event of this stage strictly after the previous stage's
        # time; the filter+array_min runs interpreted but over one small
        # per-user array, not the event stream
        out = out.withColumn(
            cols[i],
            F.when(
                prev.isNotNull(),
                F.array_min(F.filter("__ts_i", lambda x: x > prev)),
            ),
        ).drop("__ts_i")
    reached = None
    for c in cols:
        r = F.when(F.col(c).isNotNull(), 1).otherwise(0)
        reached = r if reached is None else reached + r
    return out.select(
        F.col(user_col), *cols, reached.cast("bigint").alias("n_stages_reached")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    since their previous event exceeds ``gap_minutes`` (the batch analog
    of the streaming session window, as one lag + running-sum window
    pass per user partition).

    Output per session: (user, session_id 1-based, n_events,
    start_us, end_us, duration_us) — epoch-µs BIGINTs.  ``order_col``
    breaks equal-timestamp ties deterministically.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy("__us", order_col)
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = events.select(
        F.col(user_col), us.alias("__us"), F.col(order_col)
    ).withColumn(
        "__new",
        F.when(
            F.lag("__us").over(w).isNull()
            | ((F.col("__us") - F.lag("__us").over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_id = with_flag.withColumn("session_id", F.sum("__new").over(wsum))
    return (
        with_id.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__us").alias("start_us"),
            F.max("__us").alias("end_us"),
        )
        .select(
            F.col(user_col),
            F.col("session_id").cast("bigint").alias("session_id"),
            F.col("n_events").cast("bigint").alias("n_events"),
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    strict: bool = False,
) -> DataFrame:
    """As-of join: for every ``left`` row, the id of the LATEST ``right``
    row of the same ``on`` key with ``right.ts <= left.ts`` (``strict=True``
    excludes equal timestamps).  Ties between right rows sharing a
    timestamp break deterministically toward the larger ``right_id``
    (the id column's own ordering — numeric or lexicographic).

    Spark has no ASOF JOIN operator; the classic sort-merge formulation is
    one tagged union + one running ``last(..., ignoreNulls)`` window per
    key — a single shuffle on ``on``, no inequality join, no per-row
    Python.  At 100 TB the state per partition is one struct (the current
    best right row), so the window is a streaming pass; skew follows key
    cardinality exactly like any per-user analytic.

    Returns ``(on, l_id, l_us, r_id)`` with ``r_id`` NULL when no right
    row precedes.  Right-side attributes re-attach by one equi-join on
    ``(on, r_id)`` — kept out of the window so multiple attributes cannot
    mix values from different right rows.
    """
    l_us = F.unix_micros(F.col(ts_col))
    # sides order right-before-left at equal timestamps (<=); strict flips
    l_side, r_side = (0, 1) if strict else (1, 0)
    # both id columns keep their own types (a bigint cast here would
    # null/crash string ids); the union needs only that each side's null
    # placeholder matches the other side's real column type
    l = left.select(
        F.col(on),
        l_us.alias("__us"),
        F.lit(l_side).alias("__side"),
        F.col(left_id).alias("l_id"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("__r"),
    )
    r = right.select(
        F.col(on),
        l_us.alias("__us"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("l_id"),
        F.col(right_id).alias("__r"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__us", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l.unionByName(r)
        .withColumn("r_id", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("l_id").isNotNull())
        .select(on, "l_id", F.col("__us").alias("l_us"), "r_id")
    )


def range_pairs(
    a: DataFrame,
    b: DataFrame,
    window_us: int,
    on: str = "user_id",
    ts_col: str = "ts",
    a_id: str = "event_id",
    b_id: str = "event_id",
) -> DataFrame:
    """Bounded range join: every pair (a, b) sharing ``on`` with
    ``a.ts <= b.ts <= a.ts + window_us``.  Output
    ``(on, a_id, b_id, dt_us)``; self-pairs (same id) are excluded so the
    operator composes as a self-join of one event stream.

    A naive inequality join is a per-key cross product.  Instead each
    side buckets time into ``window_us``-wide bins: a qualifying b is
    always in a's bin or the next one, so ``a`` expands to TWO join keys
    (its bin and bin+1) and the join is a plain equi-join on
    ``(on, bin)`` with a residual range filter — the standard
    interval-bucket decomposition.  The two keys are distinct, so no
    pair is produced twice.

    Scale: shuffle keyed by ``(on, bin)``, so hot users are further
    split by time; comparisons are bounded by pairs at most one bucket
    apart, never |a|×|b| per key.  ``window_us`` IS the cost knob: the
    candidate volume scales with events per (user, window).
    """
    a_us = F.unix_micros(F.col(ts_col))
    bin_ = (F.col("__us") / F.lit(window_us)).cast("bigint")
    aa = (
        a.select(F.col(on), a_us.alias("__us"), F.col(a_id).alias("a_id"))
        .withColumn("__bin", F.explode(F.array(bin_, bin_ + 1)))
    )
    bb = (
        b.select(F.col(on), a_us.alias("__b_us"), F.col(b_id).alias("b_id"))
        .withColumn("__bin", (F.col("__b_us") / F.lit(window_us)).cast("bigint"))
    )
    return (
        aa.join(bb, on=[on, "__bin"])
        .where(
            (F.col("__b_us") >= F.col("__us"))
            & (F.col("__b_us") - F.col("__us") <= window_us)
            & (F.col("a_id") != F.col("b_id"))
        )
        .select(
            on,
            "a_id",
            "b_id",
            (F.col("__b_us") - F.col("__us")).alias("dt_us"),
        )
    )


WEEK_US = 7 * 86_400_000_000


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = WEEK_US,
) -> DataFrame:
    """Cohort retention: users grouped by the epoch-week of their FIRST
    event; for each (cohort, week-offset) the count of distinct users
    active that week.  Output
    ``(cohort_week, week_offset, n_users)`` — the classic retention
    triangle, all integer arithmetic.

    One fact scan: retention at week granularity only needs the DISTINCT
    (user, week) activity pairs, so the cohort (min week per user) and
    the activity matrix both derive from that one aggregated frame —
    shuffles are keyed by user then by (cohort, offset), both bounded by
    |users| × weeks, never by raw event count."""
    wk = (
        events.select(
            F.col(user_col),
            F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us)).alias("__wk"),
        )
        .distinct()
    )
    first = wk.groupBy(user_col).agg(F.min("__wk").alias("__cohort"))
    return (
        wk.join(first, on=user_col)
        .groupBy(
            F.col("__cohort").alias("cohort_week"),
            (F.col("__wk") - F.col("__cohort")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences.

    Orders each user's events by (event-time, ``id_col``) — the id
    tie-break makes equal-timestamp sequences deterministic — takes the
    adjacent (state, next-state) pairs via ``lead``, and returns per
    ordered pair ``(prev_type, next_type, n, p_ppm)`` where ``p_ppm`` is
    the conditional transition probability ``floor(1e6·n/Σ_next n)`` in
    exact integer parts-per-million (cross-engine identical; no float
    accumulation).

    Scale: the window is partitioned by user (no global ordering), the
    pair count is a map-side-combinable groupBy on two short strings, and
    the denominator comes from a second window over the |states|² result
    frame — bounded by the state alphabet, not the event count."""
    w = Window.partitionBy(user_col).orderBy("__ts_us", id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("prev_type"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col),
        )
        .select(
            "prev_type",
            F.lead("prev_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.floor(F.lit(1e6) * F.col("n") / F.sum("n").over(tot)).cast("bigint").alias("p_ppm"),
    )


def top_paths(
    events: DataFrame,
    length: int = 3,
    k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common length-``length`` event-type paths (consecutive
    per-user subsequences) — the sequence-mining staple behind "what do
    users do before purchasing".

    One user-partitioned window pass emits each position's forward
    ``lead`` types; interior path steps never cross users because leads
    run inside the partition.  The path count is a map-side-combinable
    groupBy on ``length`` short strings, and top-k is TakeOrdered with a
    full lexicographic tie-break — no global sort.

    Output: (p1..pN, n) with ``n`` descending."""
    w = Window.partitionBy(user_col).orderBy("__ts_us", id_col)
    base = events.select(
        F.col(user_col),
        F.col(type_col).alias("p1"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(id_col),
    )
    cols = {f"p{i + 1}": F.lead("p1", i).over(w) for i in range(1, length)}
    steps = base.select("p1", *[c.alias(n) for n, c in cols.items()])
    for name in cols:
        steps = steps.where(F.col(name).isNotNull())
    names = [f"p{i + 1}" for i in range(length)]
    return (
        steps.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), *names)
        .limit(k)
    )


def cohort_value(
    events: DataFrame,
    value_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    bucket_us: int = WEEK_US,
) -> DataFrame:
    """Cohort lifetime value: users cohorted by first-activity week, the
    ``value_type`` events' value summed per (cohort, week-offset) and
    accumulated into running LTV.

    Monetary values ride as exact micro-unit integers (``round(v·1e6)``,
    the same fixed-point convention as the moving-average operator) so
    the per-cell and cumulative sums are bit-exact cross-engine — double
    summation would be association-order-dependent.

    Shapes: cohorts derive from the same distinct (user, week) frame as
    :func:`retention_cohorts`; the value stream filters to one event type
    before any shuffle; the cumulative window partitions by cohort over
    the |cohorts|×|weeks|-bounded cell frame, never raw events.

    Output: (cohort_week, week_offset, n_buyers, rev_micro, ltv_micro)."""
    wk = (
        events.select(
            F.col(user_col),
            F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us)).alias("__wk"),
        )
        .distinct()
    )
    first = wk.groupBy(user_col).agg(F.min("__wk").alias("__cohort"))
    purch = events.where(F.col(type_col) == value_type).select(
        F.col(user_col),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us)).alias("__wk"),
        F.round(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("__fx"),
    )
    cells = (
        purch.join(first, on=user_col)
        .groupBy(
            F.col("__cohort").alias("cohort_week"),
            (F.col("__wk") - F.col("__cohort")).alias("week_offset"),
        )
        .agg(
            F.countDistinct(user_col).alias("n_buyers"),
            F.sum("__fx").alias("rev_micro"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_week",
        "week_offset",
        F.col("n_buyers").cast("bigint").alias("n_buyers"),
        "rev_micro",
        F.sum("rev_micro").over(w).alias("ltv_micro"),
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple = ("start_us", "end_us"),
    right_cols: tuple = ("start_us", "end_us"),
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Interval-OVERLAP join (closed intervals: ``max(starts) ≤
    min(ends)``) via bucket decomposition — the interval×interval
    sibling of :func:`range_pairs`' point-in-interval join.  Each
    interval explodes to the time buckets it covers, candidates pair on
    a shared bucket (a hash EQUI-join — never an inequality join, which
    Spark would execute as a nested-loop product), the exact predicate
    filters, and duplicates from multi-bucket overlaps drop.

    Candidate volume per bucket = |left∩bucket|·|right∩bucket|, so
    ``bucket_us`` should sit near the typical interval length (the same
    tuning rule as range_pairs).  Returns all left columns + all right
    columns + ``overlap_us``."""
    ls, le = left_cols
    rs, re_ = right_cols
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"overlap_join: rename clashing columns first: {sorted(clash)}")
    lb = left.withColumn(
        "__bkt", F.explode(F.expr(f"sequence({ls} div {bucket_us}, {le} div {bucket_us})"))
    )
    rb = right.withColumn(
        "__bkt", F.explode(F.expr(f"sequence({rs} div {bucket_us}, {re_} div {bucket_us})"))
    )
    joined = (
        lb.join(rb, "__bkt")
        .where(
            F.greatest(F.col(ls), F.col(rs)) <= F.least(F.col(le), F.col(re_))
        )
        .drop("__bkt")
        .dropDuplicates(left.columns + right.columns)
    )
    return joined.withColumn(
        "overlap_us",
        (F.least(F.col(le), F.col(re_)) - F.greatest(F.col(ls), F.col(rs))).cast("bigint"),
    )
