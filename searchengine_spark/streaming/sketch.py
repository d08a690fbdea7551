"""Streaming KMV distinct-count — the sketch's merge property run live.

The batch form (operators/sketches.py) answers "distinct users per
type" over a table; a production ingest wants the same number
continuously without unbounded state. ``dropDuplicates`` on a stream
keeps one state row PER DISTINCT KEY (unbounded); the KMV sketch keeps
exactly k longs per group FOREVER, because bottom-k union is a closed,
exact merge: state' = bottom-k(state ∪ batch-hashes). That closure is
the whole point of the sketch (sketches.py module docstring) — this
module is its `applyInPandasWithState` form, per-group state =
`array<long>`, emitting the refreshed (n_seen_rows, sketch, estimate)
per trigger.

Hashing stays OUT of the Python UDF: `hash60` is computed natively in
the plan before groupBy, so the stateful function only merges int64s
(numpy union, no md5 in Python on the hot path).

The estimate matches the batch `kmv_estimate` formula exactly, with
one honest difference: below k the streaming sketch cannot know the
exact distinct count of everything it has EVER seen without unbounded
state, so `n_distinct` here is len(sketch) (exact below k — the sketch
IS the distinct set — and saturates at k above). Parity with the batch
operator's sketch array is pinned by tests/test_sketch_stream.py with
duplicates split across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashes import hash60
from ..operators.sketches import DEFAULT_K, TWO60

OUT_SCHEMA = "grp string, n_rows long, kmv array<bigint>, kmv_est long"
STATE_SCHEMA = "kmv array<bigint>, n_rows long"


def _make_update_fn(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (grp,) = key
        kmv, n_rows = (list(state.get[0]), int(state.get[1])) if state.exists else ([], 0)
        cur = set(kmv)
        for pdf in pdfs:
            n_rows += len(pdf)
            cur.update(int(h) for h in pdf["_h"].to_numpy())
        kmv = sorted(cur)[:k]
        state.update((kmv, n_rows))
        if len(kmv) < k:
            est = len(kmv)
        else:
            est = int(float(k - 1) * TWO60 / float(kmv[k - 1]))
        yield pd.DataFrame(
            {"grp": [grp], "n_rows": [n_rows], "kmv": [kmv], "kmv_est": [est]}
        )

    return update


def kmv_stream(
    source: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """(streaming) df -> per-trigger refreshed sketch rows per group.

    NOTE the state-size contract: per group the state is ≤ k int64s +
    one counter, independent of stream length — vs dropDuplicates'
    one-row-per-distinct-key. 10^6 groups × k=256 ≈ 2 GB state total
    at any scale of input.
    """
    hashed = source.select(
        F.col(group_col).cast("string").alias("grp"),
        hash60(F.col(value_col).cast("string")).alias("_h"),
    )
    return hashed.groupBy("grp").applyInPandasWithState(
        _make_update_fn(k),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_kmv_stream_over_parquet(
    spark,
    parquet_path: str,
    schema,
    group_col: str,
    value_col: str,
    k: int = DEFAULT_K,
    query_name: str = "kmv_out",
):
    """Drive the sketch stream synchronously (one file per trigger, so
    merges MUST happen through the state store); returns every emitted
    update row — the final state per group is the max-n_rows row."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    )
    out = kmv_stream(stream, group_col, value_col, k)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
