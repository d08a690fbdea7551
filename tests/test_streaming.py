"""Structured Streaming: the windowed agg must produce the same result
through readStream (memory sink) as through the batch DataFrame."""

from searchengine_spark.streaming.events import (
    run_stream_over_parquet,
    windowed_event_agg,
)

SF = "/root/testdata/sf0.001"


def test_stream_agg_equals_batch(spark):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_agg(batch).collect()
    }
    streamed = run_stream_over_parquet(
        spark, f"{SF}/events.parquet", batch.schema, "t_stream_out"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in streamed.collect()
    }
    assert got == expected
    assert len(got) > 0
