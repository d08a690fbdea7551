"""Anchor-context index (operators/anchors.py) — pairing-rule fixture.

Pins the span-level semantics on a hand-built document set:
* a link takes the immediately preceding ``text`` span as context;
* links at offset 0 or behind non-text spans contribute nothing;
* raw www./slash variants of one target fold into one md5 bucket
  (getMD5 aliasing, SearchEngine.h:213-223);
* rejected raw URLs (canonicalize -> NULL) are dropped;
* anchor_count counts link occurrences, n_source_docs distinct docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import SPANS_SCHEMA
from searchengine_spark.functions.urls import canonicalize_py, url_md5_py
from searchengine_spark.operators.anchors import anchor_terms


def _span(kind, text=None, ref=None, off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, schema=f"doc_id string, url string, spans {SPANS_SCHEMA}"
    )


TARGET = "http://host1.com/p/9"
TARGET_WWW = "http://www.host1.com/p/9"  # same getMD5 key as TARGET


def test_anchor_pairing_and_folding(spark):
    rows = [
        # d1: text then link -> context credited; a second link to the
        # www-variant right behind a text span too.
        (
            "d1",
            "u1",
            [
                _span("title", "t", off=0),
                _span("text", "alpha beta", off=1),
                _span("link", ref=TARGET, off=2),
                _span("text", "beta gamma", off=3),
                _span("link", ref=TARGET_WWW, off=4),
            ],
        ),
        # d2: link at offset 0 (no predecessor) and a link behind a
        # media span -> both contribute nothing; then one real credit.
        (
            "d2",
            "u2",
            [
                _span("link", ref=TARGET, off=0),
                _span("media", ref="x.png", off=1),
                _span("link", ref=TARGET, off=2),
                _span("text", "alpha", off=3),
                _span("link", ref=TARGET, off=4),
            ],
        ),
        # d3: rejected target (no scheme colon) -> dropped.
        (
            "d3",
            "u3",
            [
                _span("text", "alpha", off=0),
                _span("link", ref="httpx//bad", off=1),
            ],
        ),
    ]
    out = anchor_terms(_docs(spark, rows)).orderBy("term").collect()
    key = url_md5_py(canonicalize_py(TARGET))
    assert url_md5_py(canonicalize_py(TARGET_WWW)) == key  # folding premise

    got = {(r.target_md5, r.term): (r.anchor_count, r.n_source_docs) for r in out}
    assert got == {
        # 'alpha' from d1's first link + d2's last link -> 2 links, 2 docs
        (key, "alpha"): (2, 2),
        # 'beta' appears in both of d1's credited contexts -> 2 links, 1 doc
        (key, "beta"): (2, 1),
        (key, "gamma"): (1, 1),
    }


def test_anchor_empty_and_no_links(spark):
    rows = [
        ("d1", "u1", [_span("text", "only text", off=0)]),
        ("d2", "u2", []),
    ]
    assert anchor_terms(_docs(spark, rows)).count() == 0


def test_anchor_no_shuffle_before_agg(spark):
    """The link/context pairing must stay in-row: the only exchanges
    are the two aggregation phases of the exact countDistinct (partial
    on (key, src_doc), final on key) — no join, no extra shuffle from
    the pairing itself."""
    rows = [
        (
            "d1",
            "u1",
            [
                _span("text", "alpha", off=0),
                _span("link", ref=TARGET, off=1),
            ],
        ),
    ]
    plan = anchor_terms(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan and "Cartesian" not in plan, plan


def test_anchor_direction_semantics(spark):
    """direction='prev' takes the preceding text span, 'next' the
    following (where real-HTML anchor inner text flushes), 'both'
    credits each — a term in both neighbors counts twice."""
    from searchengine_spark.operators.anchors import anchor_terms as AT

    rows = [
        (
            "d1",
            "u1",
            [
                _span("text", "alpha", off=0),
                _span("link", ref=TARGET, off=1),
                _span("text", "alpha omega", off=2),
            ],
        ),
    ]
    docs = _docs(spark, rows)
    prev = {r.term: r.anchor_count for r in AT(docs, "prev").collect()}
    nxt = {r.term: r.anchor_count for r in AT(docs, "next").collect()}
    both = {r.term: r.anchor_count for r in AT(docs, "both").collect()}
    assert prev == {"alpha": 1}
    assert nxt == {"alpha": 1, "omega": 1}
    assert both == {"alpha": 2, "omega": 1}
    import pytest as _pt

    with _pt.raises(ValueError):
        AT(docs, "sideways")


def test_anchor_resolve_raw_hrefs(spark):
    """resolve_raw_hrefs=True resolves page-relative hrefs against the
    source page URL (the HTTP-adapter span shape) before keying;
    unresolvable hrefs (no leading slash) drop."""
    from searchengine_spark.operators.anchors import anchor_terms as AT

    rows = [
        (
            "d1",
            "https://host9.net/a",
            [
                _span("text", "alpha", off=0),
                _span("link", ref="/p/7", off=1),
                _span("text", "beta", off=2),
                _span("link", ref="rel-no-slash", off=3),
            ],
        ),
    ]
    docs = _docs(spark, rows)
    out = AT(docs, "prev", resolve_raw_hrefs=True).collect()
    key = url_md5_py(canonicalize_py("https://host9.net/p/7"))
    assert {(r.target_md5, r.term) for r in out} == {(key, "alpha")}


def _rand_docs(n_docs=60, seed=7):
    """Deterministic pseudo-random span fixtures exercising every
    pairing edge: links at offset 0, behind media/links, text with
    multi-space gaps, None media_ref, rejected/aliased raw targets."""
    import random

    rng = random.Random(seed)
    kinds = ["text", "link", "media", "title", "b"]
    words = ["alpha", "beta", "gamma", "delta", "", "x"]
    raws = [
        TARGET,
        TARGET_WWW,
        "httpx//bad",
        "//h7.net/q/1",
        "host3.org/a/2//",
        None,
        "/rel/path",
    ]
    docs = []
    for di in range(n_docs):
        spans = []
        for off in range(rng.randrange(0, 9)):
            kind = rng.choices(kinds, weights=[4, 3, 1, 1, 1])[0]
            spans.append(
                {
                    "kind": kind,
                    "text": (
                        " ".join(rng.choices(words, k=rng.randrange(0, 4)))
                        if kind in ("text", "title", "b")
                        else None
                    ),
                    "media_ref": rng.choice(raws) if kind in ("link", "media") else None,
                    "offset": off,
                }
            )
        docs.append(
            {"doc_id": f"d{di}", "url": f"https://src{di % 5}.net/p", "spans": spans}
        )
    return docs


@pytest.mark.parametrize("direction", ["prev", "next", "both"])
def test_contributions_merge_equals_one_shot(spark, direction):
    """Incremental-base contract: per-source contributions computed on
    ANY split of the docs (here two appended halves), then merged, are
    row-equal to the one-shot anchor_terms build — the associativity
    refresh_incremental's anchors_base relies on (a source doc's
    contributions are a pure function of its own spans)."""
    from searchengine_spark.operators.anchors import (
        anchor_contributions,
        merge_anchor_contributions,
    )

    docs = _rand_docs()
    as_rows = lambda ds: [(d["doc_id"], d["url"], d["spans"]) for d in ds]
    base = anchor_contributions(_docs(spark, as_rows(docs[:30])), direction).unionByName(
        anchor_contributions(_docs(spark, as_rows(docs[30:])), direction)
    )
    got = {
        (r.target_md5, r.term): (r.anchor_count, r.n_source_docs)
        for r in merge_anchor_contributions(base).collect()
    }
    want = {
        (r.target_md5, r.term): (r.anchor_count, r.n_source_docs)
        for r in anchor_terms(_docs(spark, as_rows(docs)), direction).collect()
    }
    assert got == want
    assert want, "fixture degenerated to an empty index"


@pytest.mark.parametrize("direction", ["prev", "next", "both"])
@pytest.mark.parametrize("resolve", [False, True])
def test_anchor_terms_spark_equals_py(spark, direction, resolve):
    """Three-form discipline: the Spark expr form equals the pure
    twin on pseudo-random span fixtures, for every direction and both
    href-resolution modes."""
    from searchengine_spark.operators.anchors import anchor_terms_py

    docs = _rand_docs()
    df = _docs(spark, [(d["doc_id"], d["url"], d["spans"]) for d in docs])
    got = {
        (r.target_md5, r.term): (r.anchor_count, r.n_source_docs)
        for r in anchor_terms(df, direction, resolve).collect()
    }
    want = anchor_terms_py(docs, direction, resolve)
    assert got == want
    assert want, "fixture degenerated to an empty index"  # non-vacuous
