"""End-to-end: crawl -> pagerank -> index -> search over the store —
the full 'a user of the reference switches to this repo' path."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.config import CrawlConfig
from searchengine_spark.corpus import raw_url_py
from searchengine_spark.plans.crawl import CrawlDriver
from searchengine_spark.plans.index_pipeline import (
    SearchService,
    build_index,
    doc_sections,
    rank_docs,
)

CFG = CrawlConfig(n_shards=4, per_shard_quota=8, politeness_rounds=1, max_doc=120)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2estore"))
    d = CrawlDriver(spark, root, CFG)
    d.seed([raw_url_py(i) for i in range(32)])
    d.run(3)
    return d


def test_doc_sections_from_spans(crawled):
    docs = crawled.store.read("docs")
    row = doc_sections(docs).limit(1).collect()[0]
    assert row["url"]  # state URL: the self link is indexed at weight 40
    assert row["title"].startswith("page ")
    assert "body of" in row["body"]


def test_style_spans_amplify_index_rank(crawled):
    """Corpus style spans (<b>/<h1>/<h2>, corpus.fetch_spans_py) reach
    the index as weight amplifiers: the styled 'highlightN' word
    (mult >= 1.5) outranks the doc's plain body word (weight 1) even
    though the body word appears earlier (decay favors it)."""
    docs = crawled.store.read("docs")
    idx = build_index(docs, with_pagerank=False)
    styled = idx.where(F.col("term").startswith("highlight")).collect()
    assert styled, "no styled span in the crawled corpus slice"
    body = {
        r["doc_id"]: r["rank"]
        for r in idx.where(F.col("term") == "body").collect()
    }
    for r in styled:
        assert r["rank"] > body[r["doc_id"]]


def test_rank_docs_produces_valid_ranks(crawled):
    docs = crawled.store.read("docs")
    ranks = rank_docs(docs).collect()
    assert len(ranks) == docs.count()
    for r in ranks:
        assert 0.15 - 1e-9 <= r["page_rank"] <= 100.0


def test_build_index_rank_weighted(crawled):
    docs = crawled.store.read("docs")
    plain = build_index(docs, with_pagerank=False)
    weighted = build_index(docs, with_pagerank=True)
    assert plain.count() == weighted.count()
    # weighting preserves the postings keys, scales the rank
    p = {(r["term"], r["doc_id"]): r["rank"] for r in plain.collect()}
    w = {(r["term"], r["doc_id"]): r["rank"] for r in weighted.collect()}
    assert set(p) == set(w)


def test_search_service_end_to_end(crawled):
    svc = SearchService(crawled.store)
    svc.refresh()
    # every synthetic page contains 'page' (title) and 'body' (text)
    hits = svc.search("page body", k=10).collect()
    assert 0 < len(hits) <= 10
    assert hits[0]["score"] >= hits[-1]["score"]
    assert all(h["url"] is not None for h in hits)
    # host-dedup: no host repeated
    hosts = [h["host"] for h in hits]
    assert len(hosts) == len(set(hosts))
    # postings snapshots committed for reuse
    assert crawled.store.exists("postings")
    assert crawled.store.exists("postings_small")
    assert crawled.store.exists("tokens")


def test_console_parameter_surface(crawled):
    """The '#' console parameters (cmdExec, PageSearcher.cpp:111-150):
    #unmerge returns the raw top-K (no host-dedup, no n_more column),
    #maxSearch caps per-term reads, #get <index> seeks the positional
    content DB (insertion order = round, seq_in_round)."""
    svc = SearchService(crawled.store)
    svc.refresh()
    merged = svc.search("page body", k=10).collect()
    raw = svc.search("page body", k=10, merge_host=False).collect()
    assert len(raw) >= len(merged)  # dedup can only shrink
    assert "n_more_from_host" not in raw[0].asDict()
    assert {h["doc_id"] for h in merged} <= {h["doc_id"] for h in raw}

    capped = svc.search("page body", k=10, max_search=1).collect()
    assert len(capped) <= len(merged)

    first = svc.get_doc_by_index(0).collect()
    assert len(first) == 1
    assert first[0]["round"] == 0 and first[0]["seq_in_round"] == 1
    # and the index walks the insertion order
    second = svc.get_doc_by_index(1).collect()[0]
    assert (second["round"], second["seq_in_round"]) > (0, 1)
    assert svc.get_doc_by_index(10 ** 6).count() == 0  # out of bound


def test_search_service_phrase_adjacency(crawled):
    """Quoted phrases match only position-adjacent docs: every title is
    'page <canonical_url>', and only https docs keep their scheme, so
    '"page https"' must select exactly the https subset of 'page'."""
    svc = SearchService(crawled.store)
    svc.refresh()
    hits = svc.search('"page https"', k=500).collect()
    assert hits
    # adjacency: only https docs have 'https' right after 'page' in the
    # title ('page <canonical>'; http canonicals lost their scheme)
    assert all(h["url"].startswith("https:") for h in hits)
    loose = svc.search("page", k=500).collect()
    assert len(loose) >= len(hits)
    # a stop word inside a phrase occupies its position, no constraint
    assert svc.search('"body of"', k=500).collect()


def test_get_doc_dump(crawled):
    svc = SearchService(crawled.store)
    key = crawled.store.read("docs").limit(1).collect()[0]["url_md5"]
    dump = svc.get_doc(key).collect()
    assert len(dump) == 1 and dump[0]["spans"]
