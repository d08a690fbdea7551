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

* a ``link`` span at offset ``o`` takes as its anchor context the span
  at offset ``o-1`` **iff** that span is a ``text`` span.  With the
  engine's span extractor (functions/spans.py) the text run flushed
  immediately before an ``<a>`` open tag is exactly the prose leading
  into the link; with the interleaved-corpus generator
  (corpus.gen_spans_py) the preceding text chunk is the sentence the
  link was emitted from.  Links at offset 0 or behind non-text spans
  (media, another link) carry no context and contribute nothing.
* the link target is keyed exactly like every other page key in the
  engine: ``url_md5(canonicalize(raw))`` — so the reference's
  www./slash aliasing (getMD5, SearchEngine.h:213-223) folds raw
  variants of the same page into one anchor bucket, and URLs the
  canonicalizer rejects are dropped.
* output: one row per (target_md5, term) with ``anchor_count`` (link
  occurrences whose context contains the term — a page linking twice
  counts twice) and ``n_source_docs`` (distinct linking documents).

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

from searchengine_spark.functions.urls import canonicalize_expr, url_md5_expr


def link_context_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, url, spans) -> one row per link span that has anchor
    context: (src_doc, target_md5, ctx).

    The pairing is in-row: ``element_at(spans, o)`` is the 1-based
    array slot of the span at 0-based offset ``o-1`` (span offsets are
    assigned in array order by both span producers).
    """
    s = F.col("spans")
    links = F.filter(s, lambda x: x["kind"] == F.lit("link"))
    pairs = F.transform(
        links,
        lambda l: F.struct(
            l["media_ref"].alias("target_raw"),
            F.when(
                (l["offset"] >= F.lit(1))
                & (F.element_at(s, l["offset"])["kind"] == F.lit("text")),
                F.element_at(s, l["offset"])["text"],
            ).alias("ctx"),
        ),
    )
    return (
        docs.select(F.col("doc_id").alias("src_doc"), F.explode(pairs).alias("p"))
        .where(F.col("p.ctx").isNotNull())
        .select(
            "src_doc",
            canonicalize_expr(F.col("p.target_raw")).alias("target_canon"),
            F.col("p.ctx").alias("ctx"),
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


def anchor_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, url, spans) -> (target_md5, term, anchor_count,
    n_source_docs) — the anchor-context term index."""
    terms = (
        link_context_pairs(docs)
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
