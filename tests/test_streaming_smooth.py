"""Streaming EWMA: drained stream ≡ batch scan (one shared kernel),
including across micro-batch boundaries and on whichever custom
-stateful API the environment can run."""

from __future__ import annotations


def test_ewma_stream_converges_to_batch(spark, sf_small):
    from uw_mapreduce_spark.sources.tables import load_table
    from uw_mapreduce_spark.streaming.sliding import stream_events
    from uw_mapreduce_spark.streaming.smooth import ewma_stream

    batch = load_table(spark, sf_small, "events")
    expected = {tuple(r) for r in ewma_stream(batch).collect()}
    assert len(expected) == batch.count()

    out = ewma_stream(stream_events(spark, sf_small))
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_smooth_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("select * from ewma_smooth_out").collect()}
    assert got == expected


def test_ewma_stream_names_executed_stateful_api(spark, sf_small):
    """Pin WHICH custom-stateful API the EWMA stream executes (the
    CUSUM discipline): the auto path must match the environment probe,
    and the forced fallback must produce the same kernel output."""
    from uw_mapreduce_spark.sources.tables import load_table
    from uw_mapreduce_spark.streaming.drift import _tws_available
    from uw_mapreduce_spark.streaming.sliding import stream_events
    from uw_mapreduce_spark.streaming.smooth import ewma_stream

    auto = ewma_stream(stream_events(spark, sf_small))
    plan = auto._jdf.queryExecution().logical().toString()
    expected_api = (
        "transformWithState" if _tws_available() else "applyInPandasWithState"
    )
    ran = (
        "TransformWithState" if "TransformWithState" in plan
        else ("FlatMapGroupsInPandasWithState"
              if "FlatMapGroupsInPandasWithState" in plan else "unknown")
    )
    assert (
        (expected_api == "transformWithState" and ran == "TransformWithState")
        or (expected_api == "applyInPandasWithState"
            and ran == "FlatMapGroupsInPandasWithState")
    ), f"expected {expected_api}, logical plan ran {ran}"

    batch = load_table(spark, sf_small, "events")
    expected = {tuple(r) for r in ewma_stream(batch).collect()}
    forced = ewma_stream(
        stream_events(spark, sf_small), stream_api="applyInPandasWithState"
    )
    q = (
        forced.writeStream.format("memory")
        .queryName("ewma_forced_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("select * from ewma_forced_out").collect()}
    assert got == expected


def test_holt_stream_converges_to_batch_on_both_apis(spark, sf_small):
    """Drained Holt stream ≡ the batch keyed scan, on the auto-probed
    custom-stateful API AND the forced fallback — one shared kernel."""
    from uw_mapreduce_spark.sources.tables import load_table
    from uw_mapreduce_spark.streaming.drift import _tws_available
    from uw_mapreduce_spark.streaming.sliding import stream_events
    from uw_mapreduce_spark.streaming.smooth import holt_stream

    batch = load_table(spark, sf_small, "events")
    expected = {tuple(r) for r in holt_stream(batch).collect()}
    assert len(expected) == batch.count()

    auto = holt_stream(stream_events(spark, sf_small))
    plan = auto._jdf.queryExecution().logical().toString()
    expected_api = (
        "TransformWithState" if _tws_available() else "FlatMapGroupsInPandasWithState"
    )
    assert expected_api in plan, f"expected {expected_api} in plan"
    q = (
        auto.writeStream.format("memory")
        .queryName("holt_auto_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("select * from holt_auto_out").collect()}
    assert got == expected

    forced = holt_stream(
        stream_events(spark, sf_small), stream_api="applyInPandasWithState"
    )
    q2 = (
        forced.writeStream.format("memory")
        .queryName("holt_forced_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got2 = {tuple(r) for r in spark.sql("select * from holt_forced_out").collect()}
    assert got2 == expected
