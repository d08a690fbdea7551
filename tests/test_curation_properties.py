"""Property tests for the curation layer (hypothesis over the DuckDB
twins — fast, no Spark session; Spark ≡ DuckDB row-equality is pinned
separately by tests/test_curation.py, so invariants proven here carry
over to the native expressions)."""

import math
import re

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from searchengine_spark.functions.hashes import hash60_py
from searchengine_spark.operators import curation as CU

words = st.text(
    alphabet=st.sampled_from("abcxyz019@.-"), min_size=1, max_size=8
)
texts = st.lists(words, min_size=1, max_size=40).map(" ".join)
pii_bits = st.sampled_from(
    ["bob@x.io", "10.1.2.3", "555-123-4567", "a@b.cd e", "1.2.3.4.5"]
)
pii_texts = st.lists(st.one_of(words, pii_bits), min_size=1, max_size=20).map(
    " ".join
)


def _duck_one(sql, **frames):
    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


# Python model of the redaction chain (same common-subset regexes;
# re module accepts them identically to RE2/Java for this subset)
def _redact_py(s):
    for _n, pat, rep in CU.PII_RULES:
        s = re.sub(pat, rep, s)
    return s


@given(pii_texts)
@settings(max_examples=300, deadline=None)
def test_redact_idempotent_and_matches_sql(t):
    """Replacement tokens can never re-trigger a later rule, so the
    redaction chain is idempotent; and the DuckDB twin agrees with the
    Python model character-for-character."""
    once = _redact_py(t)
    assert _redact_py(once) == once
    duck = _duck_one(
        f"SELECT {CU.redact_pii_sql('t')} AS r FROM d",
        d=pd.DataFrame({"t": [t]}),
    )["r"][0]
    assert duck == once


@given(st.lists(texts, min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_pack_stats_conservation(docs):
    """total_tokens == sum of per-doc counts; n_sequences is the exact
    ceiling; tail_pad complements it; straddling docs never exceed
    n_docs; all per the DuckDB twin on one source."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "source": ["s"] * len(docs),
            "text": docs,
        }
    )
    row = _duck_one(CU.pack_stats_sql(), documents=pdf).iloc[0]
    toks = [len(d.split(" ")) for d in docs]
    total = sum(toks)
    assert row["n_docs"] == len(docs)
    assert row["total_tokens"] == total
    assert row["n_sequences"] == math.ceil(total / CU.SEQ_LEN)
    assert row["tail_pad"] == row["n_sequences"] * CU.SEQ_LEN - total
    assert 0 <= row["docs_straddling"] <= len(docs)
    # exact straddle recount from the prefix stream
    straddle = 0
    pos = 0
    for t in toks:
        s, e = pos, pos + t
        if (e - 1) // CU.SEQ_LEN > s // CU.SEQ_LEN:
            straddle += 1
        pos = e
    assert row["docs_straddling"] == straddle


@given(texts)
@settings(max_examples=200, deadline=None)
def test_repetition_fracs_bounded_and_zero_iff_distinct(t):
    duck = _duck_one(
        f"SELECT {CU.repetition_stats_sql('t')} FROM "
        "(SELECT 0 AS doc_id, t FROM d) ",
        d=pd.DataFrame({"t": [t]}),
    ).iloc[0]
    toks = t.split(" ")
    for col in ("dup_word_frac", "dup_2gram_frac", "dup_3gram_frac"):
        assert 0.0 <= duck[col] < 1.0
    assert (duck["dup_word_frac"] == 0.0) == (len(set(toks)) == len(toks))


@given(st.integers(min_value=0, max_value=10**12), words)
@settings(max_examples=300, deadline=None)
def test_split_and_sample_pure_functions(doc_id, source):
    """Split/sample decisions are pure functions of (doc_id, source)
    through hash60 — re-derivable in Python, always in-range."""
    b = hash60_py(str(doc_id), "split") % CU.SPLIT_BUCKETS
    split = (
        "train" if b < CU.SPLIT_TRAIN_LT
        else "val" if b < CU.SPLIT_VAL_LT
        else "test"
    )
    assert split in ("train", "val", "test")
    rate = CU.SAMPLE_RATES[hash60_py(source, "rate") % len(CU.SAMPLE_RATES)]
    keep = (hash60_py(str(doc_id), "samp") % CU.SPLIT_BUCKETS) < rate * CU.SPLIT_BUCKETS
    duck = _duck_one(
        f"SELECT {CU._split_sql('doc_id')} AS sp, "
        f"{CU.sampled_sql('doc_id', 'source')} AS kp FROM d",
        d=pd.DataFrame({"doc_id": [doc_id], "source": [source]}),
    ).iloc[0]
    assert duck["sp"] == split
    assert bool(duck["kp"]) == keep
