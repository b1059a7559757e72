"""Capped sessionization: the duration cap must split sessions a pure
gap rule would keep together, and anchors must reset greedily."""

from __future__ import annotations

from uw_mapreduce_spark.operators.sessions import sessionize_capped


def test_cap_splits_what_gap_keeps(spark):
    # 5 events 40 apart: gap=100 never splits; max_dur=100 forces a
    # split when t-anchor > 100: t=0(anchor 0),40,80,120>100 -> new
    # session (anchor 120), 160.
    rows = [(1, i, i * 40) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, eid long, t long")
    got = {
        r["t"]: r["session_seq"]
        for r in sessionize_capped(df, ["k"], "t", gap=100, max_dur=100).collect()
    }
    assert got == {0: 1, 40: 1, 80: 1, 120: 2, 160: 2}


def test_gap_rule_still_applies(spark):
    rows = [(1, 0, 0), (1, 1, 50), (1, 2, 500), (1, 3, 520)]
    df = spark.createDataFrame(rows, "k long, eid long, t long")
    got = {
        r["t"]: r["session_seq"]
        for r in sessionize_capped(df, ["k"], "t", gap=100, max_dur=10_000).collect()
    }
    assert got == {0: 1, 50: 1, 500: 2, 520: 2}


def test_anchor_resets_greedily(spark):
    # After a cap split the NEW anchor governs the next cap check:
    # t=0, 90, 180 (cap 100: 180-0>100 split at... check chain:
    # 90-0=90 ok; 180 vs anchor 0 -> split, anchor 180; 260 vs 180=80 ok.
    rows = [(1, 0, 0), (1, 1, 90), (1, 2, 180), (1, 3, 260)]
    df = spark.createDataFrame(rows, "k long, eid long, t long")
    got = {
        r["t"]: r["session_seq"]
        for r in sessionize_capped(df, ["k"], "t", gap=1000, max_dur=100).collect()
    }
    assert got == {0: 1, 90: 1, 180: 2, 260: 2}
