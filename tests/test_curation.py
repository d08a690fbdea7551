"""Corpus-curation operator semantics + Spark/DuckDB twin equality.

Covers operators/curation.py: n-gram decontamination, Gopher-style
repetition stats, deterministic split + mixture sampling. The twin
tests pin the exact row equality the driver's oracle relies on, on a
crafted fixture that exercises the short-doc gram rule and both flag
states.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.hashes import hash60_py
from searchengine_spark.operators import curation as CU


def _duck(docs_pdf, sql):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


# ---- n-gram builder ------------------------------------------------------

def test_ngram_short_doc_rule_matches_duckdb(spark):
    """A doc with fewer than n tokens yields its single sub-n gram, and
    the Spark and DuckDB builders agree token-for-token."""
    rows = [(0, "a b"), (1, "a"), (2, "a b c d e"), (3, "x x x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", CU.ngrams_expr("text", 3).alias("g")
        ).collect()
    }
    assert got[0] == ["a b"]
    assert got[1] == ["a"]
    assert got[2] == ["a b c", "b c d", "c d e"]
    assert got[3] == ["x x x"]

    duck = _duck(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        f"SELECT doc_id, {CU.ngrams_sql('text', 3)} AS g "
        "FROM documents ORDER BY doc_id",
    )
    # DuckDB's list_distinct does NOT preserve element order (Spark's
    # array_distinct does); every consumer explodes the list into
    # order-free joins/aggregates, so set equality is the contract.
    for _, row in duck.iterrows():
        assert set(row["g"]) == set(got[row["doc_id"]])
        assert len(row["g"]) == len(got[row["doc_id"]])


# ---- decontaminate -------------------------------------------------------

def _decon_fixture():
    # doc 0 (0 % 97 == 0) is the benchmark member; 3-grams of its text:
    # "a b c", "b c d", "c d e".
    return [
        (0, "a b c d e"),     # benchmark — must not appear in output
        (1, "a b c d x"),     # grams: abc, bcd, cdx -> 2/3 hit
        (2, "a b c x y"),     # 1/3 hit -> not contaminated
        (3, "a b c x"),       # 1/2 hit -> exactly at the 0.5 boundary
        (4, "z z z z z"),     # 0 hits -> excluded entirely
    ]


def test_decontaminate_semantics(spark):
    df = spark.createDataFrame(_decon_fixture(), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["overlap_frac"],
                      r["contaminated"])
        for r in CU.decontaminate(df, n=3, flag_frac=0.5).collect()
    }
    assert set(got) == {1, 2, 3}  # benchmark doc 0 and no-hit doc 4 absent
    assert got[1] == (3, 2, 0.6667, True)
    assert got[2] == (3, 1, 0.3333, False)
    assert got[3] == (2, 1, 0.5, True)  # >= boundary is inclusive


def test_decontaminate_matches_duckdb_twin(spark):
    df = spark.createDataFrame(_decon_fixture(), "doc_id long, text string")
    got = [
        tuple(r)
        for r in CU.decontaminate(df, n=3, flag_frac=0.5)
        .orderBy("doc_id").collect()
    ]
    duck = _duck(
        pd.DataFrame(_decon_fixture(), columns=["doc_id", "text"]),
        "WITH " + CU.decontaminate_sql(n=3, flag_frac=0.5)
        + " SELECT doc_id, n_grams, n_hit, overlap_frac, contaminated"
        " FROM decon ORDER BY doc_id",
    )
    assert got == [tuple(r) for r in duck.itertuples(index=False)]


# ---- repetition stats ----------------------------------------------------

def test_repetition_stats_extremes(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a a a a a a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in
           CU.repetition_stats(df).collect()}
    # all-distinct doc: zero duplicate fractions, passes
    assert got[0]["dup_word_frac"] == 0.0
    assert got[0]["dup_2gram_frac"] == 0.0
    assert got[0]["dup_3gram_frac"] == 0.0
    assert got[0]["repetition_pass"] is True
    # all-same doc: 6 words 1 distinct -> 1 - 1/6; fails every gate
    assert got[1]["dup_word_frac"] == round(1 - 1 / 6, 4)
    assert got[1]["dup_2gram_frac"] == round(1 - 1 / 5, 4)
    assert got[1]["dup_3gram_frac"] == 0.75
    assert got[1]["repetition_pass"] is False


def test_repetition_stats_matches_duckdb_twin(spark):
    rows = [(0, "a b c d e f"), (1, "a a a a a a"), (2, "x"),
            (3, "p q p q p q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in
           CU.repetition_stats(df).orderBy("doc_id").collect()]
    duck = _duck(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        f"SELECT {CU.repetition_stats_sql('text')} FROM documents"
        " ORDER BY doc_id",
    )
    assert got == [tuple(r) for r in duck.itertuples(index=False)]


# ---- split + sampling ----------------------------------------------------

def _source_with_rate(rate_idx):
    """Find a source string whose mixture-rate index is rate_idx."""
    for i in range(1000):
        s = f"src{i}"
        if hash60_py(s, "rate") % len(CU.SAMPLE_RATES) == rate_idx:
            return s
    raise AssertionError("no source found")


def test_corpus_sample_full_rate_source_keeps_everything(spark):
    full = _source_with_rate(0)   # rate 1.0
    zeroish = _source_with_rate(3)  # rate 0.1
    rows = [(i, full if i < 40 else zeroish, 10) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    got = CU.corpus_sample(df).collect()
    by_src = {}
    for r in got:
        a = by_src.setdefault(r["source"], [0, 0, 0])
        a[0] += r["n_docs"]; a[1] += r["n_sampled"]; a[2] += r["chars_sampled"]
    assert by_src[full] == [40, 40, 400]          # rate 1.0 keeps all
    assert by_src[zeroish][1] < 40                # rate 0.1 drops most
    assert by_src[zeroish][2] == by_src[zeroish][1] * 10
    assert {r["split"] for r in got} <= {"train", "val", "test"}


def test_split_assignment_is_deterministic_and_python_checkable(spark):
    """The split of any doc is a pure function of doc_id via hash60 —
    recompute it in pure Python and demand row equality."""
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    ).select("doc_id", CU._split_expr(F.col("doc_id")).alias("split"))
    got = {r["doc_id"]: r["split"] for r in df.collect()}

    def py_split(doc_id):
        b = hash60_py(str(doc_id), "split") % CU.SPLIT_BUCKETS
        if b < CU.SPLIT_TRAIN_LT:
            return "train"
        if b < CU.SPLIT_VAL_LT:
            return "val"
        return "test"

    assert got == {i: py_split(i) for i in range(500)}
    # sanity: the 96/2/2 design shows up at n=500 within loose bounds
    n_train = sum(1 for v in got.values() if v == "train")
    assert n_train > 450


# ---- chunking / packing --------------------------------------------------

def test_chunk_stats_exact_values(spark):
    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 128)),   # exactly one chunk, no pad
         (1, " ".join(["w"] * 129)),   # two chunks, 127 pad
         (2, "w")],                    # one chunk, 127 pad
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["n_chunks"], r["pad_tokens"])
           for r in CU.chunk_stats(df).collect()}
    assert got == {0: (128, 1, 0), 1: (129, 2, 127), 2: (1, 1, 127)}


def test_pack_stats_hand_fixture(spark):
    """seq_len=10, one source, docs of 4/5/3/9 tokens laid end-to-end:
    stream = 21 tokens -> 3 sequences, tail_pad 9. Boundaries at 10 and
    20: doc c spans [9,12) (straddles), doc d spans [12,21) (straddles
    20); a=[0,4) and b=[4,9) do not."""
    rows = [(0, "s", "a b c d"), (1, "s", "a b c d e"),
            (2, "s", "a b c"), (3, "s", "a b c d e f g h i")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = CU.pack_stats(df, seq_len=10).collect()[0]
    assert (r["n_docs"], r["total_tokens"], r["n_sequences"],
            r["tail_pad"], r["docs_straddling"]) == (4, 21, 3, 9, 2)


def test_pack_stats_matches_duckdb_twin(spark):
    rows = [(i, f"s{i % 3}", " ".join(["w"] * (3 + 7 * i % 40)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [tuple(r) for r in CU.pack_stats(df).orderBy("source").collect()]
    duck = _duck(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]),
        CU.pack_stats_sql() + " ORDER BY source",
    )
    assert got == [tuple(r) for r in duck.itertuples(index=False)]


# ---- PII redaction -------------------------------------------------------

def test_redact_pii_semantics_and_twin(spark):
    rows = [
        (0, "mail bob.smith+x@corp.example.org now"),
        (1, "server 192.168.1.250 up"),
        (2, "call 555-867-5309 or 555-123-4567"),
        (3, "no pii here at all"),
        (4, "a@b.io and 1.2.3.4 and 555-000-1111 together"),
        (5, "version 1.2.3 is not an ip; 12-34-5678 not a phone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = df.select(
        "doc_id",
        CU.redact_pii_expr("text").alias("red"),
        *CU.pii_count_exprs("text"),
    ).orderBy("doc_id")
    res = {r["doc_id"]: r.asDict() for r in got.collect()}
    assert res[0]["red"] == "mail <EMAIL> now"
    assert res[1]["red"] == "server <IP> up"
    assert res[2]["red"] == "call <PHONE> or <PHONE>"
    assert res[2]["n_phone"] == 2
    assert res[3]["red"] == "no pii here at all"
    assert res[4]["red"] == "<EMAIL> and <IP> and <PHONE> together"
    assert (res[4]["n_email"], res[4]["n_ipv4"], res[4]["n_phone"]) == (1, 1, 1)
    # non-PII lookalikes untouched
    assert res[5]["red"] == rows[5][1]

    duck = _duck(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        f"SELECT doc_id, {CU.redact_pii_sql('text')} AS red, "
        f"{', '.join(CU.pii_count_sqls('text'))} "
        "FROM documents ORDER BY doc_id",
    )
    spark_rows = [tuple(r) for r in got.collect()]
    assert spark_rows == [tuple(r) for r in duck.itertuples(index=False)]


# ---- curation funnel -----------------------------------------------------

def test_curation_funnel_monotone_and_discriminating(spark):
    """Every stage of the funnel must be <= the previous one, and on
    the sf0.001 corpus each gate except none-at-all must actually drop
    documents (the fixture universe injects exact dups and the decon
    flag threshold is set to fire on systematic overlap)."""
    from searchengine_spark.queries import QUERIES

    row = QUERIES["curation_funnel"](spark, "/root/testdata/sf0.001").collect()[0]
    seq = [row["n_total"], row["n_dedup"], row["n_rep_pass"],
           row["n_decon_pass"], row["n_sampled"]]
    assert seq == sorted(seq, reverse=True)
    assert row["n_total"] > row["n_dedup"]       # injected dups dropped
    assert row["n_rep_pass"] < row["n_dedup"]    # repetition gate fires
    assert row["n_sampled"] < row["n_rep_pass"]  # sampling drops some
    assert row["n_sampled"] > 0


def test_decontaminate_plan_broadcasts_benchmark_side(spark):
    """Scale shape: the benchmark gram set must be the BROADCAST side —
    a sort-merge join here would shuffle the full corpus gram stream."""
    df = spark.createDataFrame(_decon_fixture(), "doc_id long, text string")
    plan = CU.decontaminate(df, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- token-budget mixture assembly ---------------------------------------

def _mixture_py(rows, budgets):
    """Independent python twin of the mixture rule over (source,
    tokens, qlevel) rows: per-source level aggregation, cumsum in
    qlevel-desc order, n_full + crossing-level extra epoch."""
    from collections import defaultdict

    ltok = defaultdict(int)
    ttok = defaultdict(int)
    for src, tok, ql in rows:
        ltok[(src, ql)] += tok
        ttok[src] += tok
    out = {}
    for src, budget in budgets.items():
        if src not in ttok:
            continue
        n_full, rem = budget // ttok[src], budget % ttok[src]
        cum = 0
        for ql in sorted({q for s, q in ltok if s == src}, reverse=True):
            extra = 1 if cum < rem else 0
            out[(src, ql)] = n_full + extra
            cum += ltok[(src, ql)]
    return out


def test_mixture_assign_explicit_budgets_hand_checked(spark):
    """Three-source fixture against explicit budgets: downsample
    (budget < total picks top quality levels only, crossing level
    included), exact fit (mult 1.0 -> everyone exactly 1 epoch, no
    extra), multi-epoch upsample (budget = 2.0x + remainder), and
    budget 0 -> everything dropped."""
    docs = spark.createDataFrame(
        [
            # sA: quality rises with length; totals hand-computable
            (1, "sA", "one two"),                      # 2 tokens, low q
            (2, "sA", " ".join(["w"] * 40)),           # 40 tokens
            (3, "sA", " ".join(["the dog ran"] * 30)), # 90 tokens, high q
            (4, "sB", " ".join(["x"] * 10)),
            (5, "sB", " ".join(["y"] * 10)),
            (6, "sC", " ".join(["z"] * 10)),
        ],
        "doc_id long, source string, text string",
    )
    base = docs.select(
        "source",
        F.size(F.split("text", r"\s+")).cast("long").alias("tokens"),
        (F.round(CU.quality_score_expr("text") * CU.QLEVEL_SCALE, 0))
        .cast("long")
        .alias("qlevel"),
    ).collect()
    rows = [(r["source"], r["tokens"], r["qlevel"]) for r in base]
    tot = {s: sum(t for src, t, _ in rows if src == s) for s in ("sA", "sB", "sC")}
    budgets = {"sA": tot["sA"] // 2, "sB": 2 * tot["sB"] + 3, "sC": 0}
    bdf = spark.createDataFrame(
        list(budgets.items()), "source string, budget_tokens long"
    )
    got = {
        (r["source"], r["qlevel"]): r["n_epochs"]
        for r in CU.mixture_assign(docs, budgets=bdf).collect()
    }
    want = _mixture_py(rows, budgets)
    assert got == want
    per_doc = CU.mixture_assign(docs, budgets=bdf).collect()
    # sC budget 0: dropped entirely; sB upsampled: every doc >= 2 epochs
    assert all(r["n_epochs"] == 0 for r in per_doc if r["source"] == "sC")
    assert all(r["n_epochs"] >= 2 for r in per_doc if r["source"] == "sB")
    # realized >= budget, overshoot < the crossing level (sA downsample)
    sa = [r for r in per_doc if r["source"] == "sA"]
    realized = sum(r["tokens"] * r["n_epochs"] for r in sa)
    assert realized >= budgets["sA"]
    max_level = max(r["tokens"] for r in sa)
    assert realized - budgets["sA"] < max_level
    # quality monotone: higher qlevel never gets fewer epochs
    for a in sa:
        for b in sa:
            if a["qlevel"] > b["qlevel"]:
                assert a["n_epochs"] >= b["n_epochs"]


def test_mixture_assign_default_budgets_match_python_twin(spark):
    """Derived budgets (hash60(source,'mix') % 4 multiplier) over the
    real documents table: Spark per-(source, qlevel) epochs equal the
    independent python twin, and the realized-token bound holds for
    every source."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    per_doc = CU.mixture_assign(docs).collect()
    rows = [(r["source"], r["tokens"], r["qlevel"]) for r in per_doc]
    mults = {
        src: CU.MIX_MULTS[hash60_py(src, "mix") % 4]
        for src in {r[0] for r in rows}
    }
    tot = {}
    for src, tok, _ in rows:
        tot[src] = tot.get(src, 0) + tok
    import math

    budgets = {src: math.floor(mults[src] * tot[src]) for src in tot}
    want = _mixture_py(rows, budgets)
    got = {(r["source"], r["qlevel"]): r["n_epochs"] for r in per_doc}
    assert got == want
    assert {r["source"]: r["budget_tokens"] for r in per_doc} == {
        s: b for s, b in budgets.items()
    }
    for src in tot:
        realized = sum(
            r["tokens"] * r["n_epochs"] for r in per_doc if r["source"] == src
        )
        if budgets[src] == 0:
            assert realized == 0
        else:
            assert realized >= budgets[src]


def test_mixture_assign_matches_duckdb_twin(spark):
    """Row-for-row Spark == DuckDB on the per-doc frame (the driver's
    oracle aggregates it; this pins the granular form)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        CU.mixture_assign(docs)
        .orderBy("doc_id")
        .toPandas()
    )
    docs_pdf = docs.toPandas()
    sql = "WITH " + CU.mixture_assign_sql() + " SELECT * FROM mx_doc ORDER BY doc_id"
    want = _duck(docs_pdf, sql)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# linear quality classifier (fastText-style hashed bag-of-words)
# ---------------------------------------------------------------------------


def test_linear_classifier_hand_computed(spark):
    """Exact-integer inference: python twin recomputes the hashed-BoW
    dot product, the cross-multiplied keep decision and the sigmoid;
    a tiny bucket count forces hash collisions so the collision path
    is exercised, and an empty doc scores at the bias alone."""
    import math

    from searchengine_spark.functions.hashes import hash60_py
    from searchengine_spark.operators import curation as CU

    n_buckets, bias_e6, thr_e6 = 4, 50_000, 10_000
    rows = [(1, "alpha beta alpha"), (2, "gamma"), (3, ""), (4, "beta beta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = CU.synthetic_weights(spark, n_buckets)
    wmap = {r["bucket"]: r["w_e6"] for r in w.collect()}
    assert wmap == {
        b: hash60_py(f"w|{b}") % 2001 - 1000 for b in range(n_buckets)
    }

    out = {
        r["doc_id"]: r
        for r in CU.linear_classifier_score(
            docs, w, n_buckets, bias_e6=bias_e6, thr_e6=thr_e6
        ).collect()
    }
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        dot = sum(wmap[hash60_py(t) % n_buckets] for t in toks)
        nt = max(len(toks), 1)
        keep = dot + nt * bias_e6 >= nt * thr_e6
        score = round(
            1.0 / (1.0 + math.exp(-(dot / (1e6 * nt) + bias_e6 / 1e6))), 6
        )
        got = out[doc_id]
        assert got["n_tokens"] == len(toks)
        assert got["dot_e6"] == dot
        assert got["keep"] == keep
        assert abs(got["score"] - score) < 2e-6, (doc_id, got["score"], score)
    # empty doc: dot 0, decision/score at the bias alone
    assert out[3]["dot_e6"] == 0 and out[3]["keep"] is True


def test_linear_classifier_weights_broadcast_plan(spark):
    """The weight join must broadcast (bucket tables are KB-MB at any
    width) — a shuffled weight join would be a 100 TB regression."""
    from searchengine_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c")], "doc_id long, text string"
    )
    out = CU.linear_classifier_score(docs, CU.synthetic_weights(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_boilerplate_stats_flags_shared_footer(spark):
    """Site A: 4/5 docs share a 7-token footer -> flagged (>=3 docs,
    >=30%); the odd doc and site B (2/5 sharing, below min_docs) stay
    clean. Coverage is the merged footer span, not window count."""
    from searchengine_spark.operators.curation import boilerplate_stats

    footer = "one two three four five six seven"
    rows = []
    for i in range(5):
        body = f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}"
        rows.append((i, "A", body + (" " + footer if i < 4 else "")))
    for i in range(5, 10):
        body = f"k{i} l{i} m{i} n{i} o{i} p{i}"
        rows.append((i, "B", body + (" " + footer if i < 7 else "")))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in boilerplate_stats(docs).collect()}
    for i in range(4):
        assert out[i]["n_boiler_tokens"] == 7, i  # merged footer span
        assert out[i]["n_tokens"] == 13
        assert out[i]["boiler_e6"] == 7 * 1_000_000 // 13
    assert out[4]["n_boiler_tokens"] == 0
    for i in range(5, 10):  # only 2 docs share -> below min_docs
        assert out[i]["n_boiler_tokens"] == 0, i
