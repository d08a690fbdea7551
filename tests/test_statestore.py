"""Snapshot store: atomic pointer commits, append semantics, history."""

import os

from searchengine_spark.sources.statestore import TableStore


def test_commit_read_roundtrip(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    assert not st.exists("t")
    v = st.commit("t", df)
    assert v == 1 and st.exists("t")
    got = sorted((r["id"], r["v"]) for r in st.read("t").collect())
    assert got == [(1, "a"), (2, "b")]


def test_append_mode_unions(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    st.commit("t", spark.createDataFrame([(1,)], "id int"))
    st.commit("t", spark.createDataFrame([(2,)], "id int"), mode="append")
    assert sorted(r["id"] for r in st.read("t").collect()) == [1, 2]
    # previous snapshot still readable (time travel within retention)
    assert [r["id"] for r in st.read("t", version=1).collect()] == [1]


def test_retention_keeps_last_three(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    for i in range(5):
        st.commit("t", spark.createDataFrame([(i,)], "id int"))
    hist = st.history("t")
    assert hist[-1] == 5 and len(hist) <= 3


def test_pointer_is_atomic_artifact(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    st.commit("t", spark.createDataFrame([(1,)], "id int"))
    # a stale tmp snapshot dir must not affect reads
    os.makedirs(str(tmp_path / "t" / "v000009.tmp-dead"), exist_ok=True)
    assert st.latest_version("t") == 1
    assert st.read("t").count() == 1
