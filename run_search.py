"""spark-submit entry point for the search console (reference entry 4,
PageSearcher.cpp:348-559 — searchPages over a crawled store).

    python run_search.py --store /tmp/crawlstore --query 'page body'
    python run_search.py --store /tmp/crawlstore --query '"page https"' --k 5
    python run_search.py --store /tmp/crawlstore --get <url_md5>
    python run_search.py --store /tmp/crawlstore --get-index 0
    python run_search.py --store /tmp/crawlstore --query sort --unmerge
    python run_search.py --store /tmp/crawlstore --query zebra --anchors

Builds (or refreshes) the weighted dict + token index from the store's
docs snapshot, then serves the query: short words route to the small
dict's exact range, other words get the boundary-rule range expansion,
quoted phrases true positional adjacency, a trailing '*' most-common-
dict-word expansion. The reference console's '#' parameters map to
flags: #maxShow -> --k, #maxSearch -> --max-search, #merge/#unmerge ->
--unmerge, #get <index> -> --get-index. Output: one JSON line per hit.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="crawl state-store root")
    ap.add_argument("--query", help="query string (supports \"phrases\" and prefix*)")
    ap.add_argument(
        "--batch",
        help="file of queries (one per line): request-log batch mode over "
        "the fixed-size joined tier — word terms only, one action for "
        "the whole file regardless of how many queries it holds",
    )
    ap.add_argument("--get", help="dump one doc's spans by url_md5")
    ap.add_argument(
        "--get-index", type=int, default=None,
        help="dump the Nth inserted doc (#get <index>; 0-based)",
    )
    ap.add_argument("--k", type=int, default=10, help="#maxShow")
    ap.add_argument(
        "--max-search", type=int, default=None,
        help="#maxSearch: per-term postings read cap",
    )
    ap.add_argument(
        "--unmerge", action="store_true",
        help="#unmerge: raw top-K, no host-dedup of results",
    )
    ap.add_argument(
        "--snippets", action="store_true",
        help="add a keyword-in-context snippet per hit (first query-term "
        "occurrence in the indexed token stream, ±5 tokens)",
    )
    ap.add_argument(
        "--anchors", action="store_true",
        help="anchor-boosted ranking: RRF-fuse the console ranking with "
        "an inbound-anchor arm (text around links TO a page, credited "
        "to it) — a page can surface on what its neighbors call it",
    )
    ap.add_argument(
        "--incremental", action="store_true",
        help="maintain the index incrementally: re-tokenize only crawl "
        "rounds newer than the last indexed round (persisted "
        "postings_base/tokens_base/links_base append chains + a "
        "recomputed pageRank factor applied at read time)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if (
        not args.query
        and not args.get
        and args.get_index is None
        and not args.batch
    ):
        print("error: need --query, --batch, --get or --get-index", file=sys.stderr)
        return 2

    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.plans.index_pipeline import SearchService
    from searchengine_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("search", master=args.master)
    driver = CrawlDriver(spark, args.store)
    if driver.store.read_manifest() is None:
        print(f"error: {args.store} has no committed crawl state", file=sys.stderr)
        if own_session:
            spark.stop()
        return 2
    svc = SearchService(driver.store, incremental=args.incremental)
    if args.get or args.get_index is not None:
        doc = (
            svc.get_doc(args.get)
            if args.get
            else svc.get_doc_by_index(args.get_index)
        )
        for r in doc.collect():
            print(json.dumps({"url_md5": r["url_md5"], "url": r["url"],
                              "n_spans": len(r["spans"])}))
    elif args.batch:
        try:
            with open(args.batch) as f:
                queries = {
                    f"q{i:05d}": line.strip()
                    for i, line in enumerate(f)
                    if line.strip()
                }
        except OSError as e:
            print(f"error: {e}", file=sys.stderr)
            if own_session:
                spark.stop()
            return 2
        if not queries:
            print("error: batch file holds no queries", file=sys.stderr)
            if own_session:
                spark.stop()
            return 2
        try:
            hits = svc.search_batch(
                queries,
                k=args.k,
                merge_host=not args.unmerge,
                max_search=args.max_search,
            ).collect()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            if own_session:
                spark.stop()
            return 2
        for r in hits:
            out = {
                "query_id": r["query_id"], "doc_id": r["doc_id"],
                "score": r["score"], "host": r["host"], "url": r["url"],
            }
            if not args.unmerge:
                out["n_more_from_host"] = r["n_more_from_host"]
            print(json.dumps(out))
    elif args.anchors:
        try:
            hits = svc.search_anchors(
                args.query, k=args.k, max_search=args.max_search
            ).collect()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            if own_session:
                spark.stop()
            return 2
        for r in hits:
            print(json.dumps({
                "doc_id": r["doc_id"], "rank": r["rank"],
                "rrf_e6": r["rrf_e6"], "console_rank": r["console_rank"],
                "anchor_rank": r["anchor_rank"], "host": r["host"],
                "url": r["url"],
            }))
    else:
        try:
            hits = svc.search(
                args.query,
                k=args.k,
                merge_host=not args.unmerge,
                max_search=args.max_search,
                snippets=args.snippets,
            ).collect()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            if own_session:
                spark.stop()
            return 2
        for r in hits:
            out = {
                "doc_id": r["doc_id"], "score": r["score"], "host": r["host"],
                "url": r["url"],
            }
            if not args.unmerge:
                out["n_more_from_host"] = r["n_more_from_host"]
            if args.snippets:
                out["snippet"] = r["snippet"]
            print(json.dumps(out))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
