"""Round-7 second-half hypothesis properties: the debounce keep-chain,
the N-step funnel, and the grouped weighted median — each against an
exact pure-Python model on adversarial random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    ts=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40,
                unique=True),
    gap=st.integers(min_value=1, max_value=200),
)
def test_debounce_keep_chain_property(spark, ts, gap):
    from uw_mapreduce_spark.operators.debounce import debounce

    df = spark.createDataFrame([(1, t) for t in ts], "k long, t long")
    got = {r["t"]: r["kept"] for r in debounce(df, ["k"], "t", gap=gap).collect()}
    last = None
    for t in sorted(ts):
        kept = last is None or t - last >= gap
        if kept:
            last = t
        assert got[t] == kept, (t, gap)


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 300)),
        min_size=1, max_size=30,
    ),
    within=st.one_of(st.none(), st.integers(min_value=1, max_value=150)),
)
def test_funnel_steps_first_touch_property(spark, events, within):
    from uw_mapreduce_spark.operators.funnel import funnel_steps

    events = list({(t, ts) for t, ts in events})  # unique (type, ts)
    df = spark.createDataFrame(
        [(1, t, ts) for t, ts in events], "user_id long, event_type string, ts_us long"
    )
    rows = funnel_steps(df, ["a", "b", "c"], within=within).collect()

    def model():
        times = lambda typ: sorted(ts for t, ts in events if t == typ)
        a = times("a")
        if not a:
            return None
        t1 = a[0]
        t_prev, out = t1, [t1]
        for typ in ("b", "c"):
            cand = [
                ts for ts in times(typ)
                if ts > t_prev and (within is None or ts <= t_prev + within)
            ]
            if not cand:
                out.append(None)
                return out + [None] * (3 - len(out))
            t_prev = cand[0]
            out.append(t_prev)
        return out

    want = model()
    if want is None:
        assert rows == []
    else:
        assert len(rows) == 1
        r = rows[0]
        assert [r["t_1"], r["t_2"], r["t_3"]] == want
        assert r["depth"] == sum(1 for x in want if x is not None)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 50)),  # (value, weight)
        min_size=1, max_size=40,
    ),
)
def test_weighted_median_property(spark, rows):
    from uw_mapreduce_spark.operators.rank import grouped_weighted_median

    df = spark.createDataFrame([("g", v, w) for v, w in rows], "g string, v long, w long")
    got = grouped_weighted_median(df, ["g"], "v", "w").collect()[0]["wmedian"]
    total = sum(w for _, w in rows)
    acc = 0
    for v in sorted({v for v, _ in rows}):
        acc += sum(w for vv, w in rows if vv == v)
        if 2 * acc >= total:
            assert got == v
            return
    raise AssertionError("model never crossed half-weight")
