"""Structured Streaming sliding aggregation: a fully-drained stream must
equal the batch answer on the same input (the Structured Streaming
correctness contract)."""

from __future__ import annotations

from uw_mapreduce_spark.sources.tables import load_table
from uw_mapreduce_spark.streaming.sliding import sliding_event_time_sum, stream_events


def test_stream_converges_to_batch(spark, sf_small):
    batch = load_table(spark, sf_small, "events")
    expected = {
        tuple(r)
        for r in sliding_event_time_sum(batch, "1 hour", "30 minutes", by=["event_type"]).collect()
    }

    stream = stream_events(spark, sf_small)
    agg = sliding_event_time_sum(stream, "1 hour", "30 minutes", by=["event_type"])
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from stream_out").collect()}
    assert got == expected
    assert len(got) > 0
