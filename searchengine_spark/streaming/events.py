"""Structured Streaming surface (SURVEY.md §2.9).

The reference is a continuous multithreaded loop, not a stream
processor; its streaming-shaped concepts map to: politeness window ≙
processing-time window, frontier quota ≙ backpressure, Model state ≙
state store. The crawl itself runs as batch rounds (Iceberg-snapshot
resumability beats a streaming query for that loop — SURVEY §2.9), but
the engine still ships streaming operators for the event-log side:

* windowed_event_agg — tumbling-window counts/sums with watermarked
  late-data handling; same function serves the batch DataFrame (for
  the DuckDB oracle) and the readStream DataFrame (tests drive it
  through a memory sink);
* sessionize — gap-based sessions via lag/cumsum windows (batch) —
  the applyInPandasWithState equivalent for bounded replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

WINDOW = "5 minutes"
WATERMARK = "10 minutes"


def windowed_event_agg(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Tumbling 5-min window per event_type: count + sum(value).

    Works on both batch and streaming inputs; streaming adds the
    watermark for state cleanup.
    """
    # watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the
    # cast is value-preserving for the parquet NTZ column
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if streaming:
        src = src.withWatermark("ts", WATERMARK)
    return (
        src.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact fixed-point sum: per-row `value` sits on a <=4 dp
            # decimal grid, so the lifted integers sum order-
            # independently — round-after-float-SUM flips the last
            # digit when a sum of grid values lands exactly on a .5
            # boundary (the round-2 driver hash failure)
            F.sum(F.round(F.col("value") * 1e4).cast("long")).alias(
                "total_value_e4"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value_e4",
        )
    )


SESSION_GAP_MIN = 30


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle > SESSION_GAP_MIN minutes. lag + running-sum windows."""
    w_user = W.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_timestamp(F.col("ts"))  # NTZ-safe (session TZ = UTC)
    gap = epoch - F.lag(epoch).over(w_user)
    with_break = (
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    )
    df = (
        events.withColumn("_new_session", with_break)
        .withColumn(
            "session_no",
            F.sum("_new_session").over(
                w_user.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    return (
        df.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            # exact fixed-point sum (see windowed_event_agg)
            F.sum(F.round(F.col("value") * 1e4).cast("long")).alias(
                "session_value_e4"
            ),
        )
        .orderBy("user_id", "session_no")
    )


def run_stream_over_parquet(spark, parquet_path: str, schema, query_name: str = "ev_out"):
    """Drive the streaming agg over a parquet directory synchronously
    (memory sink + processAllAvailable) — the local smoke path; a real
    deployment swaps the source for kafka/kinesis unchanged."""
    stream = (
        spark.readStream.schema(schema).parquet(parquet_path)
    )
    agg = windowed_event_agg(stream, streaming=True)
    # complete mode: a finite replay must also emit the still-open last
    # window (append mode only emits watermark-closed windows)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    streaming: bool = False,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Ingest-time exact dedup by content hash (md5(text)) — the
    streaming twin of operators/dedup.exact: keeps the FIRST arrival
    per content key.

    Streaming uses dropDuplicatesWithinWatermark, so the dedup state
    store holds only the watermark horizon — the unbounded-state-safe
    form (a duplicate arriving later than the horizon passes through;
    at ingest scale the horizon is sized to the source's max
    reordering, and the batch exact-dedup downstream remains the
    backstop). Batch mode is plain dropDuplicates on the same key for
    stream≡batch comparison tests."""
    keyed = docs.withColumn("content_key", F.md5(F.col("text")))
    if streaming:
        keyed = keyed.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).withWatermark(ts_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["content_key"])
    return keyed.dropDuplicates(["content_key"])


def run_dedup_stream_over_parquet(
    spark,
    parquet_path: str,
    schema,
    query_name: str = "dd_out",
    one_file_per_trigger: bool = True,
):
    """Drive dedup_stream over a parquet directory synchronously.
    one_file_per_trigger forces one file per micro-batch so duplicates
    SPANNING batches must be caught by the state store, not by
    within-batch dedup."""
    reader = spark.readStream.schema(schema)
    if one_file_per_trigger:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(parquet_path)
    out = dedup_stream(stream, streaming=True)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
