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
from hypothesis import given, settings, strategies as st
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


# ---------------------------------------------------------------------------
# property tests (hypothesis) — broaden the curated MERGE_CASES to
# arbitrary symbol sequences and arbitrary word tables
# ---------------------------------------------------------------------------

# symbols: 1-3 chars over a tiny alphabet to force overlap runs,
# suffix/prefix traps and a==b collisions with high probability
_sym = st.text(alphabet="abc", min_size=1, max_size=3)
_syms = st.lists(_sym, min_size=0, max_size=10)
_words = st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=9),
    min_size=0,
    max_size=8,
)


@given(_syms, _sym, _sym)
@settings(max_examples=500, deadline=None)
def test_prop_replace_equals_greedy_merge(syms, a, b):
    """The delimited-string replace() IS greedy left-to-right
    non-overlapping merge, for ANY symbol sequence (vocab.py:27-39)."""
    pat = SEP + a + DLM + b + SEP
    rew = SEP + a + b + SEP
    got = _unrep(_rep(syms).replace(pat, rew))
    assert got == VB.bpe_apply_py(syms, a, b)
    # delimiter structure survives the merge (rep stays well-formed)
    assert _rep(got) == _rep(syms).replace(pat, rew)


@given(_syms, _sym, _sym)
@settings(max_examples=150, deadline=None)
def test_prop_replace_duckdb_matches_py(syms, a, b):
    """DuckDB replace() scanner ≡ Python str.replace on merge patterns
    (the SQL-twin half of the portability claim)."""
    pat = SEP + a + DLM + b + SEP
    rew = SEP + a + b + SEP
    con = duckdb.connect()
    try:
        (dk,) = con.execute(
            "SELECT replace(?, ?, ?)", [_rep(syms), pat, rew]
        ).fetchone()
    finally:
        con.close()
    assert dk == _rep(syms).replace(pat, rew)


@given(_words, st.integers(min_value=1, max_value=10))
@settings(max_examples=200, deadline=None)
def test_prop_batch1_is_sequential(wc, n):
    assert VB.bpe_train_batched_py(wc, n, batch=1) == VB.bpe_train_py(wc, n)


@given(
    _words,
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=200, deadline=None)
def test_prop_batched_counts_are_exact(wc, n, batch):
    """The exactness claim of _pick_nonconflicting (vocab.py:386-404):
    every recorded pair_count equals a from-scratch recount of the
    state immediately before THAT merge applies — i.e. in-batch
    disjoint merges neither create nor destroy each other's pairs."""
    rows = VB.bpe_train_batched_py(wc, n, batch=batch)
    state = {w: list(w) for w in wc}
    for rank, a, b, merged, pc in rows:
        counts = {}
        for w, syms in state.items():
            c = wc[w]
            for j in range(len(syms) - 1):
                k = (syms[j], syms[j + 1])
                counts[k] = counts.get(k, 0) + c
        assert counts.get((a, b), 0) == pc, (rank, a, b)
        assert merged == a + b
        state = {w: VB.bpe_apply_py(s, a, b) for w, s in state.items()}
    # rank column is dense 1..len
    assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


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
