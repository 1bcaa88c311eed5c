"""As-of join and sessionization: tie/inclusivity semantics pinned on
handcrafted frames (driver-gate parity is in test_queries_duckdb.py,
where the as-of oracle is DuckDB's NATIVE ASOF JOIN)."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkextract import relops  # noqa: E402

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    # (event_id, ts_offset_s, user_id, event_type, value)
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, t, float(v)) for i, s, u, t, v in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def test_asof_inclusive_and_latest_prior(spark):
    df = _ev(spark, [
        (0, 0, 1, "signup", 10.0),    # update @0
        (1, 5, 1, "click", 0.0),      # -> 10
        (2, 10, 1, "signup", 20.0),   # update @10; event@10 sees it (inclusive)
        (3, 10, 1, "click", 0.0),     # -> 20
        (4, 20, 1, "click", 0.0),     # -> 20
        (5, 3, 2, "click", 0.0),      # user 2: no update ever -> no match
    ])
    got = {r.event_id: (r.has_match, r.asof_value) for r in relops.asof_join(df).collect()}
    assert got[1] == (True, 10.0)
    assert got[3] == (True, 20.0)
    assert got[4] == (True, 20.0)
    assert got[5] == (False, 0.0)
    # the update events themselves see their own value (inclusive as-of)
    assert got[0] == (True, 10.0) and got[2] == (True, 20.0)


def test_asof_same_ts_updates_latest_event_id_wins(spark):
    df = _ev(spark, [
        (7, 0, 1, "signup", 1.0),
        (9, 0, 1, "signup", 2.0),   # same ts, higher event_id -> wins
        (10, 1, 1, "click", 0.0),
    ])
    got = {r.event_id: r.asof_value for r in relops.asof_join(df).collect()}
    assert got[10] == 2.0


def test_asof_single_exchange(spark):
    df = _ev(spark, [(0, 0, 1, "signup", 1.0), (1, 5, 1, "click", 0.0)])
    plan = relops.asof_join(df)._jdf.queryExecution().executedPlan().toString()
    # union + ONE user_id window — exactly one exchange, no range or
    # nested-loop join anywhere (the same-ts tie-break rides inside the
    # window ordering instead of a separate dedup pass)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan


def test_sessionize_gap_rule(spark):
    df = _ev(spark, [
        (0, 0, 1, "click", 0.0),
        (1, 60, 1, "click", 0.0),          # 1 min gap -> same session
        (2, 60 + 31 * 60, 1, "click", 0.0),  # 31 min gap -> new session
        (3, 60 + 31 * 60 + 5, 1, "click", 0.0),
        (4, 0, 2, "click", 0.0),           # other user independent
    ])
    got = {r.event_id: (r.session_id, r.event_seq) for r in relops.sessionize(df).collect()}
    assert got[0] == (1, 1) and got[1] == (1, 2)
    assert got[2] == (2, 1) and got[3] == (2, 2)
    assert got[4] == (1, 1)


def test_sessionize_boundary_exactly_gap(spark):
    # gap of exactly 30 min is NOT a new session (> rule, not >=)
    df = _ev(spark, [(0, 0, 1, "click", 0.0), (1, 1800, 1, "click", 0.0)])
    got = {r.event_id: r.session_id for r in relops.sessionize(df).collect()}
    assert got[1] == 1


def test_session_window_boundary_exactly_gap(spark):
    """Empirically pinned: Spark MERGES an event arriving at exactly
    start+gap into the window (new session requires a STRICTLY larger
    gap) — the DuckDB twin uses the same strict > rule."""
    df = _ev(spark, [(0, 0, 1, "click", 0.0), (1, 1800, 1, "click", 0.0)])
    rows = relops.session_window_agg(df).collect()
    assert len(rows) == 1 and rows[0].n_events == 2


def test_session_window_matches_sessionize_islands(spark):
    """Away from the exact boundary the two derivations agree: same
    number of sessions per user, same event counts."""
    df = _ev(spark, [
        (0, 0, 1, "click", 0.0), (1, 60, 1, "click", 0.0),
        (2, 60 + 31 * 60, 1, "click", 0.0), (3, 0, 2, "click", 0.0),
    ])
    sw = sorted((r.user_id, r.n_events) for r in relops.session_window_agg(df).collect())
    sess = relops.sessionize(df).groupBy("user_id", "session_id").count()
    gi = sorted((r.user_id, r["count"]) for r in sess.collect())
    assert sw == gi
