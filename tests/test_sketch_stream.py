"""Streaming KMV: state-store merges across micro-batches must land on
exactly the batch operator's sketch (bottom-k union is a closed merge)."""

from pyspark.sql import functions as F

from searchengine_spark.operators import sketches as SK
from searchengine_spark.streaming.sketch import run_kmv_stream_over_parquet

K = 32


def test_kmv_stream_equals_batch_across_microbatches(spark, tmp_path):
    # two overlapping batches, duplicates within AND across files;
    # per-group distinct (90) > k so the estimator branch is live
    rows1 = [(f"g{i % 2}", i // 2) for i in range(240)]  # uids 0..119 per grp
    rows2 = [(f"g{i % 2}", 60 + i // 2) for i in range(240)]  # uids 60..179
    schema = "grp string, uid long"
    d1 = spark.createDataFrame(rows1, schema)
    d2 = spark.createDataFrame(rows2, schema)
    sdir = tmp_path / "kmv_stream"
    sdir.mkdir()
    d1.coalesce(1).write.parquet(str(sdir / "f1"))
    d2.coalesce(1).write.parquet(str(sdir / "f2"))
    batch = spark.read.parquet(str(sdir / "f1"), str(sdir / "f2"))

    emitted = run_kmv_stream_over_parquet(
        spark, f"{sdir}/*", batch.schema, "grp", "uid", k=K, query_name="t_kmv"
    ).collect()
    # one update row per group per trigger that touched it
    final = {}
    for r in emitted:
        if r["grp"] not in final or r["n_rows"] > final[r["grp"]]["n_rows"]:
            final[r["grp"]] = r

    want = {
        r["grp"]: r
        for r in SK.kmv_estimate(
            SK.kmv_sketch(
                batch, ["grp"], F.col("uid").cast("string"), k=K
            ),
            k=K,
        ).collect()
    }
    assert set(final) == {"g0", "g1"} == set(want)
    for g in want:
        assert list(final[g]["kmv"]) == list(want[g]["kmv"]), g
        assert final[g]["kmv_est"] == want[g]["kmv_est"], g
        assert final[g]["n_rows"] == 240  # 120 rows per group per file
        assert want[g]["n_distinct"] == 180  # exact count stays batch-side
    # the state actually merged across triggers: the first trigger's
    # emission differs from the final sketch (file2 adds smaller hashes
    # with overwhelming probability at 120->180 distinct)
    first = {}
    for r in emitted:
        if r["grp"] not in first or r["n_rows"] < first[r["grp"]]["n_rows"]:
            first[r["grp"]] = r
    assert any(
        list(first[g]["kmv"]) != list(final[g]["kmv"]) for g in final
    )
