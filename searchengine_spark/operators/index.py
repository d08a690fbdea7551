"""Inverted index (postings) + multi-term search (SURVEY.md D8, A4-A6,
A8-A9, J4, O1-O3, S12-S13).

The reference builds two globally-sorted flat dictionaries with a
hand-rolled external sorter (ExternalSorter.hpp:131-451) and serves
term lookups by binary search (PageSearcher.cpp:39-67). Spark form:

* build: tokenize -> posexplode -> per-(doc,term) agg (first position
  wins, tf, normalized rank) -> `repartitionByRange(term)` +
  `sortWithinPartitions` -> write. The shuffle+TimSort+spill machinery
  replaces the external sorter; parquet min/max column stats on the
  sorted `term` column give the same O(log N)-file-pruning effect as
  the reference's binary search when Catalyst pushes a term predicate.
* small dict (A6): 8-byte-truncated terms keeping the max-rank
  instance — a windowed reduction, not a second sorter.
* search (J4/A8): per-term postings -> k-way inner join on doc ->
  proximity co-rank 0.9^(posDiff-1) (PageSearcher.cpp:271-288) ->
  top-K (TakeOrderedAndProject) -> host-dedup window (A9).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window as W, functions as F

SMALLWORDSIZE = 8  # SearchEngine.h:28
CORANK_DECAY = 0.9  # PageSearcher.cpp:280-282
CORANK_MIN = 1e-6  # PageSearcher.cpp:284
MAX_SHOW = 200  # PageSearcher.cpp:226


def build_postings(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    n_term_partitions: int = 8,
) -> DataFrame:
    """(doc, text) -> postings(term, doc_id, first_pos, tf, rank),
    range-partitioned + sorted by term (the 'finaldict' equivalent).

    rank = tf / n_words (A5's per-page normalization: total weight per
    page sums to ~1, mirroring rank *= pageRank/totalRank with
    pageRank=1).
    """
    words = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
        F.size(F.split(F.col(text_col), " ")).alias("n_words"),
    ).where(F.length("term") > 0)
    agg = words.groupBy("doc_id", "term").agg(
        (F.min("pos") + 1).alias("first_pos"),  # 1-based like list_position
        F.count("*").alias("tf"),
        F.first("n_words").alias("_n"),
    )
    postings = agg.select(
        "term",
        "doc_id",
        "first_pos",
        "tf",
        F.round(F.col("tf") / F.col("_n"), 6).alias("rank"),
    )
    return postings.repartitionByRange(n_term_partitions, "term").sortWithinPartitions(
        "term", "rank", "doc_id"
    )


def build_small_postings(postings: DataFrame) -> DataFrame:
    """A6: truncate terms to SMALLWORDSIZE bytes, keep the max-rank
    instance per (doc, short term); deterministic tie-break by term."""
    w = W.partitionBy("doc_id", "sterm").orderBy(F.desc("rank"), "term")
    return (
        postings.withColumn("sterm", F.substring("term", 1, SMALLWORDSIZE))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("sterm", "doc_id", "first_pos", "tf", "rank")
    )


def term_lookup(postings: DataFrame, term: str, max_postings: int = 10000) -> DataFrame:
    """S13: single-term range scan; the maxSearch cap (PageSearcher.cpp:425)
    is a deterministic limit by (rank desc, doc_id)."""
    return (
        postings.where(F.col("term") == term)
        .orderBy(F.desc("rank"), "doc_id")
        .limit(max_postings)
    )


def search(
    postings: DataFrame,
    terms: list[str],
    docs_meta: DataFrame | None = None,
    host_col: str = "host",
    k: int = MAX_SHOW,
) -> DataFrame:
    """Multi-term AND search with proximity ranking.

    J4: k-way inner join on doc_id (term 1 builds the hash side, terms
    2..k require presence). A8: rank = sum(per-term rank) * coRank,
    coRank = Π 0.9^(|pos_i - pos_{i+1}| - 1) clamped at 1e-6. O3:
    top-K. A9 (optional docs_meta with a host column): best doc per
    host + n_extra.
    """
    per_term = [
        postings.where(F.col("term") == t).select(
            "doc_id",
            F.col("rank").alias(f"rank_{i}"),
            F.col("first_pos").alias(f"pos_{i}"),
        )
        for i, t in enumerate(terms)
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id", "inner"), per_term)

    sum_rank = reduce(lambda a, b: a + b, [F.col(f"rank_{i}") for i in range(len(terms))])
    co = F.lit(1.0)
    for i in range(len(terms) - 1):
        diff = F.abs(F.col(f"pos_{i}") - F.col(f"pos_{i + 1}")) - 1
        co = co * F.pow(F.lit(CORANK_DECAY), diff.cast("double"))
    co = F.greatest(co, F.lit(CORANK_MIN))
    scored = joined.select(
        "doc_id", F.round(sum_rank * co, 6).alias("score")
    ).orderBy(F.desc("score"), "doc_id").limit(k)

    if docs_meta is None:
        return scored
    with_host = scored.join(
        docs_meta.select(F.col("doc_id"), F.col(host_col).alias("host")), "doc_id"
    )
    w = W.partitionBy("host").orderBy(F.desc("score"), "doc_id")
    return (
        with_host.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_host_docs", F.count("*").over(W.partitionBy("host")))
        .where(F.col("_rn") == 1)
        .select(
            "doc_id",
            "score",
            "host",
            (F.col("n_host_docs") - 1).alias("n_more_from_host"),
        )
        .orderBy(F.desc("score"), "doc_id")
    )


def parse_query(q: str) -> list[dict]:
    """splitSentence, PageSearcher.cpp:69-108: whitespace-split terms;
    double-quoted spans become phrase terms; a trailing '*' marks a
    prefix term (the sorted-dict prefix mode, SearchEngine.h:389-415).

    Returns [{"term": str, "kind": "word"|"phrase"|"prefix"}].
    """
    out: list[dict] = []
    i, n = 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        if q[i] == '"':
            j = q.find('"', i + 1)
            if j < 0:
                j = n
            phrase = " ".join(q[i + 1 : j].split())
            if phrase:
                out.append({"term": phrase, "kind": "phrase"})
            i = j + 1
            continue
        j = i
        while j < n and not q[j].isspace():
            j += 1
        w = q[i:j]
        if w.endswith("*") and len(w) > 1:
            out.append({"term": w[:-1], "kind": "prefix"})
        elif w:
            out.append({"term": w, "kind": "word"})
        i = j
    return out


def search_query(
    postings: DataFrame,
    q: str,
    docs_meta: DataFrame | None = None,
    host_col: str = "host",
    k: int = MAX_SHOW,
) -> DataFrame:
    """Console-style entry: parse the query string, expand prefix terms
    against the dictionary, then run the k-way AND search. Phrase terms
    are matched as their first word plus a position-adjacency rank
    boost through the proximity co-rank (A8)."""
    parsed = parse_query(q)
    terms: list[str] = []
    for p in parsed:
        if p["kind"] == "prefix":
            hits = (
                postings.where(F.col("term").startswith(p["term"]))
                .groupBy("term")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "term")
                .limit(1)
                .collect()
            )
            if hits:
                terms.append(hits[0]["term"])
        elif p["kind"] == "phrase":
            terms.extend(p["term"].split())
        else:
            terms.append(p["term"])
    if not terms:
        raise ValueError("empty query")
    return search(postings, terms, docs_meta, host_col, k)


def prefix_search(postings: DataFrame, prefix: str) -> DataFrame:
    """O2's phrase/prefix mode: term startswith prefix (the sorted-dict
    prefix compare, SearchEngine.h:389-415) — Catalyst turns this into
    a StartsWith range predicate over the sorted term column."""
    return (
        postings.where(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("rank"), 6).alias("total_rank"),
        )
        .orderBy("term")
    )
