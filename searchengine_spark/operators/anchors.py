"""Anchor-context term index — inbound link text credited to targets.

The reference engine indexes only on-page text (getWords,
SearchEngine.cpp:~700-900) and uses link structure solely for PageRank
(getURLs, SearchEngine.cpp:40-114).  Crediting the text surrounding an
inbound link to the *target* page is the classic complementary ranking
signal (the "anchor file" of Brin & Page 1998, §4.2.2) and the one a
web-scale deployment of this engine would add first: anchor terms
describe a page in its *neighbors'* words, covering pages with little
on-page text.

Operator semantics (span-level, corpus-agnostic):

* a ``link`` span at offset ``o`` takes anchor context from its
  neighbor span(s) **iff** the neighbor is a ``text`` span.  Which
  neighbor depends on ``direction``:

  - ``"prev"`` (default): the span at ``o-1``.  With the engine's
    span extractor (functions/spans.py) that is the prose flushed
    immediately before the ``<a>`` open tag — the text leading into
    the link; with the interleaved-corpus generator
    (corpus.gen_spans_py) it is the sentence the link was emitted
    from.  This is the catalog-oracle direction.
  - ``"next"``: the span at ``o+1``.  With the span extractor the
    anchor's own inner text accumulates until the next block tag and
    flushes AFTER the link span — so ``o+1`` is where real-HTML
    ``<a>anchor text</a>`` lands.
  - ``"both"``: both neighbors; a term present in both counts twice
    (two context occurrences).  The production console uses this.

  Links whose selected neighbor(s) are absent or non-text (media,
  another link) contribute nothing — by design they do not reach for
  farther-away text.
* the link target is keyed exactly like every other page key in the
  engine: ``url_md5(canonicalize(raw))`` — so the reference's
  www./slash aliasing (getMD5, SearchEngine.h:213-223) folds raw
  variants of the same page into one anchor bucket, and URLs the
  canonicalizer rejects are dropped.  With
  ``resolve_raw_hrefs=True`` the raw href is first resolved against
  the page URL (functions/spans.resolve_href_expr — the HTTP-adapter
  path, whose spans carry raw hrefs straight off the page; the
  synthetic corpus pre-resolves and must NOT re-resolve).
* output: one row per (target_md5, term) with ``anchor_count``
  (context occurrences of the term — a page linking twice counts
  twice) and ``n_source_docs`` (distinct linking documents).

Scale notes (100 TB): the link/context pairing is entirely *in-row*
(array ops over the spans column — no posexplode self-join, no
shuffle); the only shuffle is the final (target_md5, term) hash
aggregation, which map-side-combines and is exactly the anchor-file
build of a production indexer.  Popular targets are the natural skew
axis; both aggregates are associative so AQE skew handling applies,
and countDistinct's expand is bounded by per-(target, term) source
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.functions.spans import resolve_href_expr
from searchengine_spark.functions.urls import canonicalize_expr, url_md5_expr

_DIRECTIONS = {"prev": (-1,), "next": (1,), "both": (-1, 1)}


def link_context_pairs(
    docs: DataFrame,
    direction: str = "prev",
    resolve_raw_hrefs: bool = False,
) -> DataFrame:
    """(doc_id, url, spans) -> one row per (link span, text neighbor):
    (src_doc, target_md5, ctx).

    The pairing is in-row: ``F.get(spans, o+delta)`` is the 0-indexed
    array slot of the neighbor (span offsets are assigned in array
    order by both span producers); out-of-range indexes yield NULL,
    never an error, so no boundary guards are needed.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {sorted(_DIRECTIONS)}")
    s = F.col("spans")
    links = F.filter(s, lambda x: x["kind"] == F.lit("link"))

    def _ctx(l, delta: int):
        sp = F.get(s, l["offset"] + F.lit(delta))
        return F.when(sp["kind"] == F.lit("text"), sp["text"])

    pairs = F.transform(
        links,
        lambda l: F.struct(
            l["media_ref"].alias("target_raw"),
            F.array_compact(
                F.array(*[_ctx(l, d) for d in _DIRECTIONS[direction]])
            ).alias("ctxs"),
        ),
    )
    exploded = docs.select(
        F.col("doc_id").alias("src_doc"),
        F.col("url").alias("src_url"),
        F.explode(pairs).alias("p"),
    ).where(F.size(F.col("p.ctxs")) > 0)
    raw = (
        resolve_href_expr(F.col("src_url"), F.col("p.target_raw"))
        if resolve_raw_hrefs
        else F.col("p.target_raw")
    )
    return (
        exploded.select(
            "src_doc",
            canonicalize_expr(raw).alias("target_canon"),
            F.explode(F.col("p.ctxs")).alias("ctx"),
        )
        .where(F.col("target_canon").isNotNull())
        # No md5-null filter: a non-null canonical URL always yields a
        # non-null getMD5 key (canonicalize never returns a string that
        # strips to empty under the www./slash rules), and the filter
        # would re-inline the whole canonicalize CASE tree into the
        # pushed predicate (the janino-bloat class of trap).
        .select(
            "src_doc",
            url_md5_expr("target_canon").alias("target_md5"),
            "ctx",
        )
    )


def anchor_terms(
    docs: DataFrame,
    direction: str = "prev",
    resolve_raw_hrefs: bool = False,
) -> DataFrame:
    """(doc_id, url, spans) -> (target_md5, term, anchor_count,
    n_source_docs) — the anchor-context term index."""
    terms = (
        link_context_pairs(docs, direction, resolve_raw_hrefs)
        .select(
            "src_doc",
            "target_md5",
            F.explode(F.split(F.col("ctx"), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    return terms.groupBy("target_md5", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("anchor_count"),
        F.countDistinct("src_doc").cast("bigint").alias("n_source_docs"),
    )


def anchor_contributions(
    docs: DataFrame,
    direction: str = "prev",
    resolve_raw_hrefs: bool = False,
) -> DataFrame:
    """Per-SOURCE-doc anchor partials: (src_doc, target_md5, term,
    anchor_count) — the append-only base of the incremental anchor
    index.  A source doc's contributions are a pure function of its own
    spans, and docs are append-only (the seen-set fetches a URL once),
    so a crawl round's delta is exactly ``anchor_contributions(delta
    docs)``; the final index is an associative re-merge
    (:func:`merge_anchor_contributions`).  Keeping ``src_doc`` in the
    key is what lets ``n_source_docs`` survive the merge as a
    countDistinct."""
    pairs = link_context_pairs(docs, direction, resolve_raw_hrefs)
    terms = pairs.select(
        "src_doc",
        "target_md5",
        F.explode(F.split(F.col("ctx"), " ")).alias("term"),
    ).where(F.col("term") != "")
    return terms.groupBy("src_doc", "target_md5", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("anchor_count")
    )


def merge_anchor_contributions(base: DataFrame) -> DataFrame:
    """Fold :func:`anchor_contributions` partials (any number of
    appended deltas) into the served index shape — row-equal to
    :func:`anchor_terms` over the union of the source docs (pinned by
    tests/test_anchors.py): SUM of counts is the total context
    occurrences, and (src_doc, target_md5, term) is UNIQUE in the base
    — each delta is grouped on exactly that key and docs are
    append-only (a source doc lands in one delta, ever) — so the
    distinct source count is a plain count(*): no countDistinct
    expand, one map-side-combinable (target_md5, term) aggregation —
    the same single shuffle as the one-shot build, minus the text
    parse."""
    return base.groupBy("target_md5", "term").agg(
        F.sum("anchor_count").cast("bigint").alias("anchor_count"),
        F.count(F.lit(1)).cast("bigint").alias("n_source_docs"),
    )


def anchor_terms_py(
    docs: list[dict],
    direction: str = "prev",
    resolve_raw_hrefs: bool = False,
) -> dict:
    """Pure-Python twin of :func:`anchor_terms` (three-form discipline:
    the Spark expr, the DuckDB oracle in queries.py, and this — pinned
    row-equal by tests/test_anchors.py).

    ``docs`` is [{doc_id, url, spans}] with spans as
    [{kind, text, media_ref, offset}]; mirrors the Spark mechanics
    exactly, including neighbor lookup by ARRAY INDEX ``offset+delta``
    (both span producers assign offset = array position).

    Returns {(target_md5, term): (anchor_count, n_source_docs)}.
    """
    from searchengine_spark.functions.spans import resolve_href_py
    from searchengine_spark.functions.urls import canonicalize_py, url_md5_py

    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {sorted(_DIRECTIONS)}")
    agg: dict[tuple, list] = {}
    for d in docs:
        spans = d["spans"] or []
        for s in spans:
            if s["kind"] != "link":
                continue
            ctxs = []
            for delta in _DIRECTIONS[direction]:
                i = s["offset"] + delta
                if (
                    0 <= i < len(spans)
                    and spans[i]["kind"] == "text"
                    and spans[i]["text"] is not None
                ):
                    ctxs.append(spans[i]["text"])
            if not ctxs:
                continue
            raw = s["media_ref"]
            if resolve_raw_hrefs and raw is not None:
                raw = resolve_href_py(d["url"], raw)
            if raw is None:
                continue
            canon = canonicalize_py(raw)
            if canon is None:
                continue
            key = url_md5_py(canon)
            for ctx in ctxs:
                for term in ctx.split(" "):
                    if term == "":
                        continue
                    ent = agg.setdefault((key, term), [0, set()])
                    ent[0] += 1
                    ent[1].add(d["doc_id"])
    return {k: (c, len(srcs)) for k, (c, srcs) in agg.items()}
