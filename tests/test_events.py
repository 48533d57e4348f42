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
