"""Operator-level semantics tests: dedup families, ANN recall,
pagerank, index/search, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import dedup as DD
from searchengine_spark.operators import index as IX
from searchengine_spark.operators import multimodal as MM
from searchengine_spark.operators import pagerank as PR
from searchengine_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


# ---- dedup ---------------------------------------------------------------

def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"), ("c", "q"), ("d", "x y z")],
        "doc_id string, text string",
    )
    got = DD.exact_dup_groups(df).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 3 and got[0]["keep_doc_id"] == "a"


def test_minhash_lsh_finds_near_dups_not_distinct(spark):
    """A doc and its 90%-overlap variant must pair; unrelated docs must not."""
    base = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(45))
    other = " ".join(f"v{i}" for i in range(50))
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", other)], "doc_id string, text string"
    )
    got = DD.minhash_dedup(df, threshold=0.5).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert ("a", "b") in pairs
    assert all("c" not in p for p in pairs)


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [("a", "x y z q r"), ("b", "x y z q r"), ("c", "m n o p s")],
        "doc_id string, text string",
    )
    rows = df.withColumn("sh", DD.simhash_expr("text")).collect()
    sh = {r["doc_id"]: r["sh"] for r in rows}
    assert sh["a"] == sh["b"]
    assert sh["a"] != sh["c"]
    assert 0 <= sh["a"] < (1 << DD.SIMHASH_BITS)


# ---- similarity ----------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_ann_lsh_recall_vs_brute_force(spark, emb):
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = SIM.brute_force_topk(emb, q, k=10)
    approx = SIM.ann_topk(emb, q, k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, recall  # multi-probe hamming-1, 12 planes


def test_cosine_expr_matches_numpy(spark, emb):
    rows = emb.limit(4).collect()
    a, b = np.array(rows[0]["embedding"]), np.array(rows[1]["embedding"])
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    df = spark.createDataFrame(
        [(rows[0]["embedding"], rows[1]["embedding"])],
        "x array<double>, y array<double>",
    )
    got = df.select(SIM.cosine_expr(F.col("x"), F.col("y")).alias("c")).collect()[0]["c"]
    assert abs(got - expected) < 1e-9


# ---- pagerank -------------------------------------------------------------

def test_pagerank_chain_and_conservation(spark):
    # a -> b -> c: rank should accumulate downstream
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, out_degree int"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    r = {x["node"]: x["rank"] for x in PR.pagerank(edges, nodes, n_iter=10).collect()}
    assert r["a"] < r["b"] < r["c"]
    assert abs(r["a"] - 0.15) < 1e-6  # no in-links -> 1-damping


def test_edges_from_docs_semi_join(spark):
    from searchengine_spark.functions.urls import url_md5_py

    def linkspan(url):
        return {"kind": "link", "text": None, "media_ref": url, "offset": 0}

    docs = spark.createDataFrame(
        [
            (url_md5_py("a.com/1"), [linkspan("http://a.com/2"), linkspan("http://nowhere.com/x")]),
            (url_md5_py("a.com/2"), [linkspan("http://a.com/1"), linkspan("http://a.com/1")]),
        ],
        "url_md5 string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = PR.edges_from_docs(docs).collect()
    # nowhere.com dropped (J2 semi-join); duplicate link deduped (A10)
    assert len(got) == 2
    assert all(r["out_degree"] == 1 for r in got)


# ---- index / search --------------------------------------------------------

def test_postings_and_search(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "apple banana apple cherry", "h1"),
            ("d2", "banana cherry banana banana", "h1"),
            ("d3", "apple cherry", "h2"),
        ],
        "doc_id string, text string, host string",
    )
    p = IX.build_postings(docs)
    rows = {(r["term"], r["doc_id"]): r for r in p.collect()}
    assert rows[("apple", "d1")]["tf"] == 2
    assert rows[("apple", "d1")]["first_pos"] == 1
    assert rows[("banana", "d2")]["tf"] == 3
    # multi-term AND: only docs with both terms
    res = IX.search(p, ["apple", "cherry"], docs.select("doc_id", "host"))
    got = [r["doc_id"] for r in res.collect()]
    assert set(got) == {"d1", "d3"}  # d2 has no apple
    # host-dedup: d1 and d3 differ in host -> both kept
    res2 = IX.search(p, ["banana"], docs.select("doc_id", "host"))
    hosts = [r["host"] for r in res2.collect()]
    assert hosts.count("h1") == 1  # d1,d2 same host -> best only


def test_small_postings_max_rank(spark):
    docs = spark.createDataFrame(
        [("d1", "abcdefghXX abcdefghXX abcdefghYY")], "doc_id string, text string"
    )
    p = IX.build_postings(docs)
    s = IX.build_small_postings(p).collect()
    assert len(s) == 1  # both truncate to 'abcdefgh'; max-rank instance kept
    assert s[0]["tf"] == 2  # the XX one (tf 2 > tf 1)


# ---- multimodal -------------------------------------------------------------

def test_media_features_shape_and_determinism(spark):
    media = MM.synth_media_df(spark, SF).limit(20)
    f1 = MM.extract_media_features(media).collect()
    f2 = MM.extract_media_features(media).collect()
    assert len(f1) == 20
    for r in f1:
        assert len(r["features"]) == MM.FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-3
    assert sorted(map(str, f1)) == sorted(map(str, f2))


def test_media_stats_prunes_payload(spark, tmp_path):
    """Metadata aggregate must not read the binary payload column."""
    path = str(tmp_path / "media.parquet")
    MM.synth_media_df(spark, SF).write.mode("overwrite").parquet(path)
    plan = MM.media_stats(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_frame_sample_plan(spark):
    frames = MM.frame_sample_plan(MM.synth_media_df(spark, SF), every_nth=10)
    rows = frames.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    assert len(rows) > 0


def test_parse_query_and_search_query(spark):
    from searchengine_spark.operators.index import parse_query, search_query

    assert parse_query('apple "banana cherry" pre*') == [
        {"term": "apple", "kind": "word"},
        {"term": "banana cherry", "kind": "phrase"},
        {"term": "pre", "kind": "prefix"},
    ]
    docs = spark.createDataFrame(
        [("d1", "apple banana cherry", "h1"), ("d2", "apple pear", "h2")],
        "doc_id string, text string, host string",
    )
    p = IX.build_postings(docs)
    got = search_query(p, '"apple banana"', docs.select("doc_id", "host"))
    assert [r["doc_id"] for r in got.collect()] == ["d1"]
    got2 = search_query(p, "pea*", docs.select("doc_id", "host"))
    assert [r["doc_id"] for r in got2.collect()] == ["d2"]
