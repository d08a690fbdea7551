"""Structured Streaming: the windowed agg must produce the same result
through readStream (memory sink) as through the batch DataFrame."""

import shutil

from searchengine_spark.streaming.events import (
    run_stream_over_parquet,
    windowed_event_agg,
)

SF = "/root/testdata/sf0.001"


def test_stream_agg_equals_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value_e4"])
        for r in windowed_event_agg(batch).collect()
    }
    # streaming file sources read directories
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", stream_dir / "part-000.parquet")
    streamed = run_stream_over_parquet(
        spark, str(stream_dir), batch.schema, "t_stream_out"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value_e4"])
        for r in streamed.collect()
    }
    assert got == expected
    assert len(got) > 0
