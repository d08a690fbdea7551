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


def test_dedup_stream_equals_batch_across_microbatches(spark, tmp_path):
    """Duplicates split ACROSS micro-batches (one file per trigger)
    must be dropped by the streaming state store; surviving content
    keys equal the batch dropDuplicates set and first-arrival wins."""
    from searchengine_spark.streaming.events import (
        dedup_stream,
        run_dedup_stream_over_parquet,
    )

    rows1 = [(i, f"text {i % 4}", f"2026-01-01 00:0{i % 6}:00") for i in range(8)]
    rows2 = [(i + 100, f"text {i % 6}", f"2026-01-01 00:0{i % 6}:30") for i in range(8)]
    schema = "doc_id long, text string, ts string"
    d1 = spark.createDataFrame(rows1, schema)
    d2 = spark.createDataFrame(rows2, schema)
    sdir = tmp_path / "docs_stream"
    sdir.mkdir()
    d1.coalesce(1).write.parquet(str(sdir / "f1"))
    d2.coalesce(1).write.parquet(str(sdir / "f2"))
    # flatten: file source reads a directory tree of parquet parts
    batch = spark.read.parquet(str(sdir / "f1"), str(sdir / "f2"))

    streamed = run_dedup_stream_over_parquet(
        spark, f"{sdir}/*", batch.schema, "t_dd_stream"
    )
    got_keys = {r["content_key"] for r in streamed.collect()}
    want_keys = {r["content_key"] for r in dedup_stream(batch).collect()}
    assert got_keys == want_keys
    # 6 distinct texts total ("text 0".."text 5"); duplicates existed
    # both within each file and across the two files
    assert len(got_keys) == 6
    assert streamed.count() == 6  # exactly one survivor per key
