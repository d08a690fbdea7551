"""spark-submit entry point for the search console (reference entry 4,
PageSearcher.cpp:348-559 — searchPages over a crawled store).

    python run_search.py --store /tmp/crawlstore --query 'page body'
    python run_search.py --store /tmp/crawlstore --query '"page https"' --k 5
    python run_search.py --store /tmp/crawlstore --get <url_md5>

Builds (or refreshes) the weighted dict + token index from the store's
docs snapshot, then serves the query: words get the boundary-rule range
expansion, quoted phrases true positional adjacency, a trailing '*'
most-common-dict-word expansion. Output: one JSON line per hit.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="crawl state-store root")
    ap.add_argument("--query", help="query string (supports \"phrases\" and prefix*)")
    ap.add_argument("--get", help="dump one doc's spans by url_md5")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.query and not args.get:
        print("error: need --query or --get", file=sys.stderr)
        return 2

    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.plans.index_pipeline import SearchService
    from searchengine_spark.session import get_spark

    spark = get_spark("search", master=args.master)
    driver = CrawlDriver(spark, args.store)
    if driver.store.read_manifest() is None:
        print(f"error: {args.store} has no committed crawl state", file=sys.stderr)
        spark.stop()
        return 2
    svc = SearchService(driver.store)
    if args.get:
        for r in svc.get_doc(args.get).collect():
            print(json.dumps({"url_md5": r["url_md5"], "url": r["url"],
                              "n_spans": len(r["spans"])}))
    else:
        try:
            hits = svc.search(args.query, k=args.k).collect()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            spark.stop()
            return 2
        for r in hits:
            print(json.dumps({
                "doc_id": r["doc_id"], "score": r["score"], "host": r["host"],
                "url": r["url"], "n_more_from_host": r["n_more_from_host"],
            }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
