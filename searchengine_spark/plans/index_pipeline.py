"""Rank + index + search over the crawl store — SURVEY.md §3.2/§3.3
(runRanking, SearchEngine.cpp:1072-1358; searchPages,
PageSearcher.cpp:348-559) as one DataFrame pipeline.

The reference's entry 3 (link extract -> PageRank -> tokenize ->
external-sort dictionaries) and entry 4 (console search) become:

    docs snapshot -> edges (semi-join) -> pagerank
    docs + ranks  -> tokenize spans text -> postings (rank-weighted,
                     sorted by term) -> small postings
    query string  -> parse -> k-way join search -> top-K -> host-dedup
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.operators.index import (
    build_postings,
    build_small_postings,
    search_query,
)
from searchengine_spark.operators.pagerank import edges_from_docs, pagerank
from searchengine_spark.sources.statestore import TableStore

PAGERANK_ITERS = 5  # reference default loops (SearchEngine.cpp:1210-1264)


def doc_text_expr() -> F.Column:
    """Indexable text of an interleaved doc: title + text spans in
    document order (getWords scans URL -> Title -> Body,
    SearchEngine.cpp:321-331; media/link spans carry no words)."""
    return F.array_join(
        F.transform(
            F.filter(
                "spans",
                lambda s: (s["kind"] == F.lit("title")) | (s["kind"] == F.lit("text")),
            ),
            lambda s: s["text"],
        ),
        " ",
    )


def rank_docs(docs: DataFrame, n_iter: int = PAGERANK_ITERS) -> DataFrame:
    """docs(url_md5, spans) -> (url_md5, page_rank)."""
    edges = edges_from_docs(docs)
    nodes = docs.select(F.col("url_md5").alias("node")).distinct()
    ranks = pagerank(edges, nodes, n_iter=n_iter)
    return ranks.select(F.col("node").alias("url_md5"), F.col("rank").alias("page_rank"))


def build_index(docs: DataFrame, with_pagerank: bool = True) -> DataFrame:
    """docs -> rank-weighted postings.

    Word rank = (tf / n_words) * page_rank — the reference's A5
    normalization (rank *= pageRank/totalRank, SearchEngine.cpp:479-488)
    with pageRank folded in at index time, exactly where getWords_helper
    reads m_tmp.m_rank[] (SearchEngine.cpp:512-528).
    """
    text_docs = docs.select(
        F.col("url_md5").alias("doc_id"),
        doc_text_expr().alias("text"),
        F.col("host"),
    ).where(F.length("text") > 0)
    postings = build_postings(text_docs)
    if not with_pagerank:
        return postings
    pr = rank_docs(docs)
    return (
        postings.join(
            F.broadcast(pr.withColumnRenamed("url_md5", "doc_id")), "doc_id", "left"
        )
        .withColumn(
            "rank",
            F.round(F.col("rank") * F.coalesce(F.col("page_rank"), F.lit(1.0)), 6),
        )
        .drop("page_rank")
        .repartitionByRange("term")
        .sortWithinPartitions("term", "rank", "doc_id")
    )


class SearchService:
    """The console (entry 4) over a crawl TableStore: builds/refreshes
    the index from the docs snapshot, serves parsed queries."""

    def __init__(self, store: TableStore):
        self.store = store
        self._postings: DataFrame | None = None
        self._meta: DataFrame | None = None

    def refresh(self) -> None:
        docs = self.store.read("docs")
        self._postings = build_index(docs).cache()
        self._meta = docs.select(
            F.col("url_md5").alias("doc_id"), "url", "host"
        ).cache()
        self.store.commit("postings", self._postings, meta={"kind": "index"})
        self.store.commit(
            "postings_small", build_small_postings(self._postings), meta={"kind": "index"}
        )

    def search(self, q: str, k: int = 20) -> DataFrame:
        if self._postings is None:
            self.refresh()
        hits = search_query(self._postings, q, self._meta.select("doc_id", "host"), k=k)
        return hits.join(self._meta.select("doc_id", "url"), "doc_id").orderBy(
            F.desc("score"), "doc_id"
        )

    def get_doc(self, url_md5: str) -> DataFrame:
        """'#get' page dump (PageSearcher.cpp:111-150): fetch one doc's
        spans by key — a pruned snapshot scan."""
        return self.store.read("docs").where(F.col("url_md5") == url_md5)
