"""BPE vocabulary induction: three-form merge semantics + training.

Pins the engine-portability claim of operators/vocab.py: applying a
merge via literal replace() on the delimited symbol string is
row-equal to the pure-Python greedy left-to-right merge in BOTH Spark
(Java String.replace) and DuckDB (replace) — including overlapping
runs (a == b) and multi-char merged symbols — and that the full
training loop matches bpe_train_py, ties and early-stop included.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import vocab as VB

SEP, DLM = VB.SEP, VB.DLM


def _rep(syms):
    return DLM + DLM.join(syms) + DLM


def _unrep(rep):
    return [s for s in rep.split(DLM) if s != ""]


# (symbols, merge a, merge b) — overlap runs, chained merged symbols,
# and the suffix trap (a appearing as a suffix of a longer symbol)
MERGE_CASES = [
    (["a", "a", "a", "a"], "a", "a"),  # even run -> [aa, aa]
    (["a", "a", "a"], "a", "a"),  # odd run -> [aa, a]
    (["a", "b", "a", "b"], "a", "b"),  # disjoint matches
    (["p", "ar", "t"], "p", "ar"),  # multi-char right symbol
    (["xa", "b"], "a", "b"),  # 'a' only as suffix: no match
    (["a", "bx"], "a", "b"),  # 'b' only as prefix: no match
    (["b", "a", "a", "b"], "a", "b"),  # match not at start
    (["a"], "a", "a"),  # single symbol: no pair
]


def test_merge_apply_py_reference():
    assert VB.bpe_apply_py(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert VB.bpe_apply_py(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert VB.bpe_apply_py(["xa", "b"], "a", "b") == ["xa", "b"]


@pytest.mark.parametrize("syms,a,b", MERGE_CASES)
def test_merge_apply_three_forms(spark, syms, a, b):
    expected = VB.bpe_apply_py(syms, a, b)

    # python replace on the delimited string (same scanner family)
    pat = SEP + a + DLM + b + SEP
    rew = SEP + a + b + SEP
    assert _unrep(_rep(syms).replace(pat, rew)) == expected

    # DuckDB replace
    con = duckdb.connect()
    (dk,) = con.execute(
        "SELECT replace(?, ?, ?)", [_rep(syms), pat, rew]
    ).fetchone()
    assert _unrep(dk) == expected

    # Spark replace (apply_merge_expr)
    df = spark.createDataFrame([(_rep(syms),)], "rep string")
    got = df.select(VB.apply_merge_expr("rep", a, b).alias("r")).first()["r"]
    assert _unrep(got) == expected


def test_word_table_and_training_match_py(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest wide wider",
        "low newer wide wide",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1

    words = VB.word_table(docs)
    got_counts = {r["word"]: r["cnt"] for r in words.collect()}
    assert got_counts == counts

    py = VB.bpe_train_py(counts, 6)
    words = words.persist()
    try:
        sp = VB.learn_merges(words, 6)
    finally:
        words.unpersist()
    assert sp == py
    # merged symbols must feed later merges (vocabulary grows)
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _, _ in sp)


def test_training_tiebreak_is_lexicographic(spark):
    # 'ba' and 'ab' pairs tie at count 2: winner must be ('a','b')
    docs = spark.createDataFrame(
        [(0, "ab ab ba ba")], "doc_id long, text string"
    )
    rows = VB.bpe_merges(spark, docs, n_merges=1).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "b")
    assert rows[0]["pair_count"] == 2
    assert VB.bpe_train_py({"ab": 2, "ba": 2}, 1)[0][1:3] == ("a", "b")


def test_training_early_stop_no_pairs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c a b")], "doc_id long, text string"
    )
    # single-char words -> no adjacent pairs -> zero merges, both forms
    assert VB.bpe_merges(spark, docs, n_merges=4).count() == 0
    assert VB.bpe_train_py({"a": 2, "b": 2, "c": 1}, 4) == []


def test_oracle_twin_matches_spark_on_fixture(spark, tmp_path):
    texts = [
        "hugging hugging bug bugs rug",
        "hug hugs rugs debug debug",
        "aaa aaaa baa aab",  # overlap-run stress inside training
    ]
    docs = spark.createDataFrame(
        [(i, t, "s0") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    pq = str(tmp_path / "docs.parquet")
    docs.write.parquet(pq)

    words = VB.word_table(docs).persist()
    try:
        sp = VB.learn_merges(words, VB.N_MERGES)
    finally:
        words.unpersist()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    sql = "WITH " + VB.bpe_ctes_sql() + "\n" + VB.merges_select_sql()
    dk = con.execute(sql).fetchall()
    assert [tuple(r) for r in dk] == sp


def test_batched_py_batch1_equals_sequential():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 4}
    assert VB.bpe_train_batched_py(wc, 8, batch=1) == VB.bpe_train_py(wc, 8)


def test_batched_selection_symbols_disjoint():
    top = [
        {"a": "e", "b": "r", "pc": 9},
        {"a": "r", "b": "s", "pc": 8},  # shares 'r' -> skipped
        {"a": "s", "b": "t", "pc": 7},
        {"a": "e", "b": "t", "pc": 6},  # shares both -> skipped
        {"a": "o", "b": "w", "pc": 5},
    ]
    picked = VB._pick_nonconflicting(top, 3)
    assert [(r["a"], r["b"]) for r in picked] == [
        ("e", "r"), ("s", "t"), ("o", "w")
    ]
    syms = [s for r in picked for s in (r["a"], r["b"])]
    assert len(syms) == len(set(syms))


def test_batched_spark_matches_py_and_batch1_sequential(spark):
    texts = [
        "low low low lower lowest newest newest",
        "wide wider widest new newer est est",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    words = VB.word_table(docs).persist()
    try:
        seq = VB.learn_merges(words, 6)
        b1 = VB.learn_merges_batched(words, 6, batch=1)
        b3 = VB.learn_merges_batched(words, 6, batch=3)
    finally:
        words.unpersist()
    assert b1 == seq  # batch=1 IS the sequential algorithm
    assert b3 == VB.bpe_train_batched_py(counts, 6, batch=3)
    assert len(b3) == 6
