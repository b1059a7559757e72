"""N-step funnel operator: first-touch chain semantics, the within
window, and depth monotonicity."""

from __future__ import annotations

from uw_mapreduce_spark.operators.funnel import funnel_steps


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")


def test_first_touch_chain(spark):
    ev = _ev(spark, [
        (1, "a", 100), (1, "a", 50),          # t_1 = 50 (earliest)
        (1, "b", 40),                          # before t_1 -> ignored
        (1, "b", 70), (1, "b", 60),           # t_2 = 60 (earliest after 50)
        (1, "c", 65),                          # after t_1 but BEFORE t_2? 65 > 60 -> counts
    ])
    out = funnel_steps(ev, ["a", "b", "c"]).collect()[0]
    assert (out["t_1"], out["t_2"], out["t_3"], out["depth"]) == (50, 60, 65, 3)


def test_within_window_cuts_chain(spark):
    ev = _ev(spark, [
        (1, "a", 0), (1, "b", 150),   # within=100: b too late -> depth 1
        (2, "a", 0), (2, "b", 80), (2, "c", 300),  # c vs t_2=80 -> 300 > 180 -> depth 2
    ])
    out = {r["user_id"]: r for r in funnel_steps(ev, ["a", "b", "c"], within=100).collect()}
    assert out[1]["depth"] == 1 and out[1]["t_2"] is None
    assert out[2]["depth"] == 2 and out[2]["t_3"] is None


def test_users_without_step1_absent_and_depth_monotone(spark):
    ev = _ev(spark, [
        (1, "b", 10), (1, "c", 20),   # never did step 1 -> no row
        (2, "a", 10), (2, "c", 20),   # skipped step 2: c cannot count
    ])
    rows = funnel_steps(ev, ["a", "b", "c"]).collect()
    assert {r["user_id"] for r in rows} == {2}
    r = rows[0]
    assert r["depth"] == 1 and r["t_2"] is None and r["t_3"] is None
