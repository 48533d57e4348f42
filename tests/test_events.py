"""Event-sequence operator contracts on crafted timelines: strict funnel
ordering, drop-off NULLs, and session gap boundaries."""

from __future__ import annotations

import datetime as dt

from slice_db_spark.operators.events import funnel, sessionize


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=m), u, t)
            for i, (u, m, t) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )


def test_funnel_strict_ordering_and_dropoff(spark):
    df = _events(
        spark,
        [
            # user 1 converts fully in order
            (1, 0, "signup"), (1, 5, "view"), (1, 10, "click"),
            # user 2: click BEFORE view — must not count as stage 3
            (2, 0, "signup"), (2, 10, "view"), (2, 5, "click"),
            # user 3 never signed up — absent from the funnel
            (3, 0, "view"), (3, 5, "click"),
        ],
    )
    out = {r["user_id"]: r.asDict() for r in funnel(df, ["signup", "view", "click"]).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_stages_reached"] == 3
    assert out[1]["t_signup"] < out[1]["t_view"] < out[1]["t_click"]
    assert out[2]["n_stages_reached"] == 2
    assert out[2]["t_view"] is not None and out[2]["t_click"] is None


def test_funnel_repeat_events_use_earliest_valid(spark):
    df = _events(
        spark,
        [
            (1, 5, "signup"), (1, 0, "view"),  # view before signup ignored
            (1, 9, "view"), (1, 20, "view"),   # earliest valid view = minute 9
        ],
    )
    r = funnel(df, ["signup", "view"]).collect()[0]
    assert r["t_view"] - r["t_signup"] == 4 * 60 * 1_000_000


def test_sessionize_gap_boundary(spark):
    df = _events(
        spark,
        [
            (1, 0, "click"), (1, 29, "click"),   # 29-min gap: same session
            (1, 60, "click"),                     # 31-min gap: new session
            (2, 0, "view"),                       # separate user
        ],
    )
    out = sessionize(df, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["session_id"])
    assert [r["n_events"] for r in u1] == [2, 1]
    assert u1[0]["duration_us"] == 29 * 60 * 1_000_000
    assert u1[1]["session_id"] == 2
    assert by_user[2][0]["n_events"] == 1 and by_user[2][0]["duration_us"] == 0


def test_sessionize_exact_gap_is_same_session(spark):
    # gap strictly greater than threshold splits; exactly 30 min does not
    df = _events(spark, [(1, 0, "click"), (1, 30, "click")])
    out = sessionize(df, gap_minutes=30).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


# ------------------------------------------------------------- as-of join


def _us(minutes):
    base = dt.datetime(2024, 1, 1)
    return int((base + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000)


def test_asof_join_latest_prior(spark):
    from slice_db_spark.operators.events import asof_join

    df = _events(
        spark,
        [
            (1, 0, "click"),      # id 0
            (1, 10, "click"),     # id 1
            (1, 15, "purchase"),  # id 2 -> click id 1
            (1, 20, "purchase"),  # id 3 -> still click id 1
            (2, 5, "purchase"),   # id 4 -> no prior click
        ],
    )
    left = df.where("event_type = 'purchase'")
    right = df.where("event_type = 'click'")
    out = {r["l_id"]: r.asDict() for r in asof_join(left, right).collect()}
    assert out[2]["r_id"] == 1 and out[3]["r_id"] == 1
    assert out[4]["r_id"] is None
    assert out[2]["l_us"] == _us(15)


def test_asof_join_equal_ts_and_strict(spark):
    from slice_db_spark.operators.events import asof_join

    df = _events(
        spark,
        [
            (1, 0, "click"),      # id 0
            (1, 5, "click"),      # id 1: same minute as the purchase
            (1, 5, "purchase"),   # id 2
        ],
    )
    left = df.where("event_type = 'purchase'")
    right = df.where("event_type = 'click'")
    # default <= : the simultaneous click wins
    assert asof_join(left, right).collect()[0]["r_id"] == 1
    # strict < : the simultaneous click is excluded
    assert asof_join(left, right, strict=True).collect()[0]["r_id"] == 0


def test_asof_join_equal_ts_right_tie_breaks_to_max_id(spark):
    from slice_db_spark.operators.events import asof_join

    df = _events(
        spark,
        [
            (1, 5, "click"),      # id 0
            (1, 5, "click"),      # id 1: same ts — larger id wins
            (1, 9, "purchase"),   # id 2
        ],
    )
    out = asof_join(
        df.where("event_type = 'purchase'"), df.where("event_type = 'click'")
    ).collect()
    assert out[0]["r_id"] == 1


# ------------------------------------------------------------ range join


def test_range_pairs_boundaries_and_buckets(spark):
    from slice_db_spark.operators.events import range_pairs

    w_us = 10 * 60 * 1_000_000  # 10-minute window
    df = _events(
        spark,
        [
            (1, 0, "error"),       # id 0
            (1, 0, "purchase"),    # id 1: dt = 0, included
            (1, 10, "purchase"),   # id 2: dt = window exactly, included
            (1, 11, "purchase"),   # id 3: past the window, excluded
            (1, 9, "purchase"),    # id 4: crosses the bucket boundary
            (2, 1, "purchase"),    # id 5: other user, excluded
            (1, -1, "purchase"),   # id 6: BEFORE the error, excluded
        ],
    )
    out = range_pairs(
        df.where("event_type = 'error'"),
        df.where("event_type = 'purchase'"),
        window_us=w_us,
    ).collect()
    got = {(r["a_id"], r["b_id"]): r["dt_us"] for r in out}
    assert set(got) == {(0, 1), (0, 2), (0, 4)}
    assert got[(0, 1)] == 0 and got[(0, 2)] == w_us
    # no duplicate pairs from the two-key expansion
    assert len(out) == len(got)


def test_range_pairs_self_join_excludes_self(spark):
    from slice_db_spark.operators.events import range_pairs

    df = _events(spark, [(1, 0, "click"), (1, 5, "click")])
    out = range_pairs(df, df, window_us=10 * 60 * 1_000_000).collect()
    assert {(r["a_id"], r["b_id"]) for r in out} == {(0, 1)}


def test_asof_join_string_ids(spark):
    """Non-numeric ids must survive the union (no bigint cast): the
    tie-break uses the column's own ordering."""
    import datetime as dtm

    from slice_db_spark.operators.events import asof_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c_a", base, 1, "click"),
        ("c_b", base, 1, "click"),              # same ts: 'c_b' > 'c_a' wins
        ("p_1", base + dt.timedelta(minutes=1), 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id bigint, event_type string"
    )
    out = asof_join(
        df.where("event_type = 'purchase'"), df.where("event_type = 'click'")
    ).collect()
    assert out[0]["l_id"] == "p_1" and out[0]["r_id"] == "c_b"


def test_retention_cohorts(spark):
    from slice_db_spark.operators.events import retention_cohorts

    wk_min = 7 * 24 * 60  # one week in minutes
    df = _events(
        spark,
        [
            (1, 0, "view"),              # user 1: cohort week 2821 (epoch), active wk 0
            (1, wk_min + 5, "view"),     # ...and the next week (offset 1)
            (1, wk_min + 9, "click"),    # same week: distinct-user counting, not events
            (2, wk_min, "view"),         # user 2: first active one week later
        ],
    )
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(df).collect()}
    cohorts = sorted({c for c, _ in out})
    c0 = cohorts[0]
    assert out[(c0, 0)] == 1          # user 1's first week
    assert out[(c0, 1)] == 1          # user 1 retained
    assert out[(c0 + 1, 0)] == 1      # user 2's own cohort
    assert len(out) == 3


def test_events_moving_avg_range_frame_ties(spark, tmp_path):
    """RANGE frame semantics: equal-timestamp events are frame-peers (both
    included in each other's window), and the hour boundary is inclusive
    of exactly (t - 3599.999999s, t]."""
    import pyspark.sql.functions as F
    from slice_db_spark.plans.queries import events_moving_avg

    rows = [
        # user 1: two events at the same microsecond + one 1h later
        (1, 1, "2024-01-01 00:00:00", "a", 2.0, "{}"),
        (2, 1, "2024-01-01 00:00:00", "a", 4.0, "{}"),
        (3, 1, "2024-01-01 01:00:00", "a", 8.0, "{}"),  # 2,4 fall OUT (3600s ago)
        (4, 2, "2024-01-01 00:30:00", "a", 1.0, "{}"),
        (5, 2, "2024-01-01 01:29:59", "a", 3.0, "{}"),  # 0:30 within 3599s -> in
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts").cast("timestamp_ntz"))
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/events.parquet")
    out = {r.event_id: r.asDict() for r in events_moving_avg(spark, sf).collect()}
    assert out[1]["n_window"] == 2 and out[1]["avg_value_1h"] == 3.0  # tie peer seen
    assert out[2]["n_window"] == 2 and out[2]["avg_value_1h"] == 3.0
    assert out[3]["n_window"] == 1 and out[3]["avg_value_1h"] == 8.0  # exact 1h ago excluded
    assert out[5]["n_window"] == 2 and out[5]["avg_value_1h"] == 2.0  # 3599s ago included


def test_transition_matrix_counts_and_ppm(spark):
    from slice_db_spark.operators.events import transition_matrix

    df = _events(
        spark,
        [
            # user 1: a -> b -> a   (transitions: a->b, b->a)
            (1, 0, "a"), (1, 1, "b"), (1, 2, "a"),
            # user 2: a -> b        (a->b)
            (2, 0, "a"), (2, 1, "b"),
            # user 3: single event — no transition
            (3, 0, "b"),
        ],
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p_ppm"])
        for r in transition_matrix(df).collect()
    }
    assert out == {
        ("a", "b"): (2, 1_000_000),  # a always goes to b
        ("b", "a"): (1, 1_000_000),  # the only observed b-exit
    }


def test_transition_matrix_equal_ts_breaks_on_id(spark):
    from slice_db_spark.operators.events import transition_matrix

    # same timestamp: order must follow event_id (0:x then 1:y)
    df = _events(spark, [(1, 0, "x"), (1, 0, "y")])
    out = [(r["prev_type"], r["next_type"]) for r in transition_matrix(df).collect()]
    assert out == [("x", "y")]


def test_top_paths_counts_and_user_boundaries(spark):
    from slice_db_spark.operators.events import top_paths

    df = _events(
        spark,
        [
            # user 1: a b c a b c  -> paths abc, bca, cab, abc
            (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
            (1, 3, "a"), (1, 4, "b"), (1, 5, "c"),
            # user 2: a b  (too short for a 3-path; must NOT borrow user 1)
            (2, 0, "a"), (2, 1, "b"),
        ],
    )
    rows = [(r.p1, r.p2, r.p3, r.n) for r in top_paths(df, length=3, k=10).collect()]
    assert rows[0] == ("a", "b", "c", 2)
    assert ("b", "c", "a", 1) in rows and ("c", "a", "b", 1) in rows
    assert len(rows) == 3  # user 2 contributed nothing


def test_cohort_value_cells_and_ltv(spark):
    """Crafted purchases: cohorts from first activity of ANY type;
    per-cell revenue in exact micro-units; LTV accumulates per cohort."""
    import datetime as dtm

    from slice_db_spark.operators.events import cohort_value

    base = dtm.datetime(2024, 1, 1)  # well clear of week-bucket boundaries
    week = dtm.timedelta(days=7)
    rows = [
        # user 1: active (view) week 0, buys 10.50 week 0 and 2.25 week 2
        (1, base, "view", 0.0),
        (2, base + dtm.timedelta(hours=1), "purchase", 10.50),
        (3, base + 2 * week, "purchase", 2.25),
        # user 2: first active week 2, buys 1.00 week 2
        (4, base + 2 * week + dtm.timedelta(hours=2), "purchase", 1.00),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v) for i, (u, ts, t, v) in
         [(r[0], ((1 if r[0] in (1, 2, 3) else 2), r[1], r[2], r[3])) for r in rows]],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    out = {(r.cohort_week, r.week_offset): r for r in cohort_value(df).collect()}
    c0 = min(k[0] for k in out)
    # user 1 cohort: week-0 cell 10.50, week-2 cell 2.25, LTV accumulates
    assert out[(c0, 0)].rev_micro == 10_500_000 and out[(c0, 0)].ltv_micro == 10_500_000
    assert out[(c0, 2)].rev_micro == 2_250_000 and out[(c0, 2)].ltv_micro == 12_750_000
    # user 2's cohort starts 2 weeks later with offset 0
    assert out[(c0 + 2, 0)].rev_micro == 1_000_000
    assert out[(c0 + 2, 0)].n_buyers == 1


def test_overlap_join_bucket_decomposition_vs_brute(spark):
    """Crafted intervals spanning bucket boundaries: the bucket-
    decomposed equi-join must return exactly the brute-force overlap
    set (closed intervals), with one row per overlapping pair no matter
    how many buckets the pair shares, and correct overlap lengths."""
    from slice_db_spark.operators.events import overlap_join

    B = 100
    left = spark.createDataFrame(
        [(1, 10, 50), (2, 90, 210), (3, 250, 260), (4, 400, 400)],
        "lid bigint, ls bigint, le bigint",
    )
    right = spark.createDataFrame(
        [(10, 40, 95), (20, 200, 205), (30, 255, 255), (40, 300, 399)],
        "rid bigint, rs bigint, re bigint",
    )
    got = {
        (r["lid"], r["rid"]): r["overlap_us"]
        for r in overlap_join(left, right, ("ls", "le"), ("rs", "re"), bucket_us=B).collect()
    }
    # brute force
    lrows = [(1, 10, 50), (2, 90, 210), (3, 250, 260), (4, 400, 400)]
    rrows = [(10, 40, 95), (20, 200, 205), (30, 255, 255), (40, 300, 399)]
    want = {
        (l[0], r[0]): min(l[2], r[2]) - max(l[1], r[1])
        for l in lrows for r in rrows
        if max(l[1], r[1]) <= min(l[2], r[2])
    }
    assert got == want
    assert (2, 10) in got and got[(2, 20)] == 5 and got[(3, 30)] == 0
    assert (4, 40) not in got  # adjacent-but-disjoint (399 < 400)

    from pyspark.sql import functions as F  # clash guard
    import pytest

    with pytest.raises(ValueError):
        overlap_join(left, left, ("ls", "le"), ("ls", "le"))


def test_events_twa_holds_weight_values(spark):
    """Hand-computed TWA: value 10 held 9s then value 0 held 1s → TWA 9,
    not the naive avg 5 (naive avg is exactly the lie TWA fixes); a
    user's final event (no hold) contributes nothing."""
    import datetime

    import slice_db_spark.plans.queries as Q

    t0 = datetime.datetime(2024, 1, 1)
    mk = lambda s: t0 + datetime.timedelta(seconds=s)
    rows = [
        (1, mk(0), 7, "view", 10.0, "{}"),
        (2, mk(9), 7, "view", 0.0, "{}"),
        (3, mk(10), 7, "view", 99.0, "{}"),  # last event: no hold
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    Q._CATALOGS["__twa__"] = {"events": df}
    try:
        got = {r["user_id"]: r for r in Q.events_twa(spark, "__twa__").collect()}
    finally:
        del Q._CATALOGS["__twa__"]
    r = got[7]
    assert r["n_held"] == 2 and r["span_us"] == 10_000_000
    assert r["twa_fx"] == 9_000_000  # 9.0 in x1e6 fixed point


def test_events_ohlc_struct_ordered_open_close(spark):
    """Open/close come from timestamp order (event_id tie-break), not
    value order: first value 5, last value 1, with high 9 / low 0 in
    between."""
    import datetime

    import slice_db_spark.plans.queries as Q

    t0 = datetime.datetime(2024, 3, 1)
    mk = lambda s: t0 + datetime.timedelta(seconds=s)
    rows = [
        (10, mk(10), 1, "t", 5.0, "{}"),
        (11, mk(20), 1, "t", 9.0, "{}"),
        (12, mk(30), 1, "t", 0.0, "{}"),
        (13, mk(40), 1, "t", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    Q._CATALOGS["__ohlc__"] = {"events": df}
    try:
        (r,) = Q.events_ohlc(spark, "__ohlc__").collect()
    finally:
        del Q._CATALOGS["__ohlc__"]
    assert (r["open_fx"], r["high_fx"], r["low_fx"], r["close_fx"]) == (
        5_000_000, 9_000_000, 0, 1_000_000,
    )
    assert r["n_events"] == 4


def test_events_heatmap_epoch_arithmetic(spark):
    """Known timestamps: 1970-01-01 (Thursday) maps to dow 4; an event
    exactly one day later to dow 5; hours from epoch, not locale."""
    import datetime

    import slice_db_spark.plans.queries as Q

    rows = [
        (1, datetime.datetime(1970, 1, 1, 13, 30), 1, "t", 1.0, "{}"),
        (2, datetime.datetime(1970, 1, 2, 0, 5), 1, "t", 1.0, "{}"),
        (3, datetime.datetime(1970, 1, 2, 0, 40), 1, "t", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    Q._CATALOGS["__hm__"] = {"events": df}
    try:
        got = {(r["dow"], r["hour"]): (r["n"], r["share_ppm"])
               for r in Q.events_heatmap(spark, "__hm__").collect()}
    finally:
        del Q._CATALOGS["__hm__"]
    assert got == {(4, 13): (1, 333333), (5, 0): (2, 666666)}


def test_basket_affinity_lift_directions(spark):
    """Crafted baskets: brands X and Y always co-occur (lift > 1, exactly
    n_orders/(n_a·n_b/n_ab) in ppm); X and Z never do (absent); the
    min-pair support threshold prunes singletons."""
    import slice_db_spark.plans.queries as Q

    # orders 1..4: {X,Y}, {X,Y}, {Z}, {Z,W} — one (Z,W) pair is below
    # the min support of 2 and must be pruned
    rows = [(1, 100), (1, 101), (2, 100), (2, 101), (3, 102), (4, 102), (4, 103)]
    li = spark.createDataFrame(
        [(o, p, 1, 1.0, 1.0, 0.0) for o, p in rows],
        "l_orderkey bigint, l_partkey bigint, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(100, "X"), (101, "Y"), (102, "Z"), (103, "W")],
        "p_partkey bigint, p_brand string",
    )
    Q._CATALOGS["__ba__"] = {"lineitem": li, "part": part}
    try:
        got = {(r["brand_a"], r["brand_b"]): r
               for r in Q.basket_affinity(spark, "__ba__").collect()}
    finally:
        del Q._CATALOGS["__ba__"]
    assert set(got) == {("X", "Y")}
    r = got[("X", "Y")]
    # lift = n_ab * n_orders / (n_a * n_b) = 2*4/(2*2) = 2.0
    assert (r["n_ab"], r["n_a"], r["n_b"], r["lift_ppm"]) == (2, 2, 2, 2_000_000)


def test_markov_stationary_absorbing_chain(spark):
    """Crafted chain where every user path funnels A→B→C and C→C: mass
    concentrates on the absorbing state round over round; states keep
    integer ppm and totals never exceed 1e6 (floor-only losses)."""
    import datetime

    import slice_db_spark.plans.queries as Q

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(6):
        for i, et in enumerate(["A", "B", "C", "C", "C"]):
            rows.append((eid, t0 + datetime.timedelta(seconds=i), u, et, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    Q._CATALOGS["__mk__"] = {"events": df}
    try:
        got = {r["state"]: r["pi_ppm"] for r in Q.markov_stationary(spark, "__mk__").collect()}
    finally:
        del Q._CATALOGS["__mk__"]
    # P: A->B 1.0, B->C 1.0, C->C 1.0. pi0 uniform(3) = 333333 each.
    # round1: B=333333, C=666666; round2: C gets B+C; round3: all C.
    assert set(got) <= {"B", "C"} and got["C"] >= 999_990
    assert sum(got.values()) <= 1_000_000


def test_session_concurrency_overlap_and_midnight(spark):
    """Three users: two sessions overlap mid-day (peak 2), a third
    session crosses midnight and must count toward BOTH days' peaks;
    sessions meeting at a single point still overlap (closed
    intervals)."""
    import datetime

    import slice_db_spark.plans.queries as Q

    d0 = datetime.datetime(2024, 5, 1)
    mk = lambda day, h, m=0: d0 + datetime.timedelta(days=day, hours=h, minutes=m)
    rows, eid = [], 0
    # user 1: 10:00-10:20 (events at 10:00, 10:20)
    for t in (mk(0, 10), mk(0, 10, 20)):
        rows.append((eid, t, 1, "t", 1.0, "{}")); eid += 1
    # user 2: 10:20-10:40 — meets user 1 exactly at 10:20 → overlap
    for t in (mk(0, 10, 20), mk(0, 10, 40)):
        rows.append((eid, t, 2, "t", 1.0, "{}")); eid += 1
    # user 3: 23:50 day0 → 00:10 day1 (gap 20min < 30 → one session)
    for t in (mk(0, 23, 50), mk(1, 0, 10)):
        rows.append((eid, t, 3, "t", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    Q._CATALOGS["__sc__"] = {"events": df}
    try:
        got = {r["day_us"]: r for r in Q.session_concurrency(spark, "__sc__").collect()}
    finally:
        del Q._CATALOGS["__sc__"]
    DAY = 86_400_000_000
    d0_us = int(d0.timestamp()) * 1_000_000
    day0 = d0_us - d0_us % DAY
    assert got[day0]["n_sessions"] == 3 and got[day0]["peak_concurrency"] == 2
    assert got[day0 + DAY]["n_sessions"] == 1 and got[day0 + DAY]["peak_concurrency"] == 1
