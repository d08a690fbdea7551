"""spark-submit entry point for the crawl engine.

Local smoke:
    python run_crawl.py --store /tmp/crawlstore --rounds 3 --seeds 48

Cluster (the north-rule invocation shape — same code, no changes):
    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip run_crawl.py \
        --store hdfs://.../crawlstore --rounds 100 --resume

The driver loop is the only driver-side logic; every round is one job
DAG on the executors. State snapshots make --resume pick up exactly
where the last committed round left off (verified equal to an
uninterrupted run in tests/test_crawl.py::test_resume_from_snapshot).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, spark=None) -> int:
    """CLI entry. `spark` injects an existing session (tests); the
    CLI path creates one and stops it on exit."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="state-store root directory")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=48, help="seed URL count (grammar ids)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--per-shard-quota", type=int, default=25)
    ap.add_argument("--politeness-rounds", type=int, default=1)
    ap.add_argument("--max-doc", type=int, default=500)
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument(
        "--seen-filter", choices=["bloom", "cuckoo"], default="bloom",
        help="seen-set prefilter structure (north rule 'bloom/cuckoo'): "
        "bloom = OR-mergeable bitmaps; cuckoo = deletable fingerprint "
        "table. Both fall back to the exact anti-join; safe to switch "
        "across resumes (the inactive structure's table is dropped)",
    )
    ap.add_argument(
        "--ingest-sitemaps", action="store_true",
        help="before the rounds, fetch every known host's robots-declared "
        "sitemaps and admit their page URLs into the frontier "
        "(HTTP adapter only)",
    )
    ap.add_argument(
        "--changed-since", metavar="YYYY-MM-DD", default=None,
        help="make --ingest-sitemaps lastmod-aware: already-seen pages "
        "whose sitemap <lastmod> is newer than this date are requeued "
        "for a re-fetch, and index children with older lastmod are "
        "not fetched at all",
    )
    ap.add_argument(
        "--evict-url", action="append", default=[],
        help="before the rounds, evict this URL from the seen set so the "
        "next page linking it re-admits it for a re-fetch (repeatable; "
        "the adaptive-recrawl actuator — pair with the recrawl_schedule "
        "query to pick due URLs)",
    )
    ap.add_argument(
        "--requeue-url", action="append", default=[],
        help="before the rounds, append this already-crawled URL straight "
        "back into the frontier for a GUARANTEED re-fetch (repeatable; "
        "seen set untouched — unlike --evict-url, no link re-discovery "
        "is needed)",
    )
    ap.add_argument(
        "--recrawl-due", action="store_true",
        help="before the rounds, run the composed freshness pass: derive "
        "the change log from the store's fetch history, apply the "
        "adaptive-recrawl backoff, and requeue every URL whose revisit "
        "is due (decider + actuator in one transaction)",
    )
    ap.add_argument(
        "--priority", choices=["fifo", "depth"], default="fifo",
        help="frontier pick order: fifo = reference-parity "
        "(discovered_round, url_md5); depth = shallow-first priority "
        "queue (path depth prepends the pick order)",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--http",
        action="store_true",
        help="fetch over real HTTP (pages + robots.txt + DNS) instead of "
        "the synthetic corpus; seeds must then be real URLs (--seed-url)",
    )
    ap.add_argument(
        "--seed-url",
        action="append",
        default=[],
        help="explicit seed URL (repeatable); required with --http",
    )
    ap.add_argument("--fetch-timeout", type=float, default=10.0)
    ap.add_argument(
        "--robots-ttl",
        type=int,
        default=0,
        help="re-fetch a host's robots.txt every N rounds (HTTP adapter; "
        "0 = cache forever, the reference's behavior)",
    )
    ap.add_argument(
        "--force-adapter",
        action="store_true",
        help="resume a store with a DIFFERENT fetch adapter than it was "
        "seeded with (mixes corpora in one docs table — deliberate only)",
    )
    args = ap.parse_args(argv)

    from searchengine_spark.config import CrawlConfig
    from searchengine_spark.corpus import raw_url_py
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("crawl", master=args.master)
    cfg = CrawlConfig(
        n_shards=args.n_shards,
        per_shard_quota=args.per_shard_quota,
        politeness_rounds=args.politeness_rounds,
        max_doc=args.max_doc,
        use_bloom=not args.no_bloom,
        seen_filter=args.seen_filter,
        robots_ttl_rounds=args.robots_ttl,
        priority=args.priority,
    )
    use_http = args.http
    if args.resume and not args.http:
        # resume adopts the store's pinned adapter the same way it
        # adopts the pinned shard/bloom config: a store crawled over
        # HTTP resumes over HTTP without re-passing --http. The
        # check_config refusal still fires on an EXPLICIT mismatch
        # (--http against a synthetic store, or --force-adapter to
        # switch deliberately).
        probe = CrawlDriver(spark, args.store, cfg)
        stored_cfg = probe.store.read_config()
        if stored_cfg is not None and stored_cfg.get("adapter") == "http":
            use_http = True
            print(
                "note: resuming with the store's pinned 'http' fetch adapter",
                file=sys.stderr,
            )
    adapter = None
    if use_http:
        if not args.seed_url and not args.resume:
            print("error: --http needs at least one --seed-url", file=sys.stderr)
            return 2
        from searchengine_spark.sources.http_fetch import HttpFetchAdapter

        adapter = HttpFetchAdapter(timeout_s=args.fetch_timeout)
    driver = CrawlDriver(
        spark, args.store, cfg, adapter=adapter,
        allow_adapter_switch=args.force_adapter,
    )
    if args.resume:
        if driver.store.read_manifest() is None:
            print(
                f"error: --resume given but {args.store} has no committed "
                "crawl state (run once without --resume to seed it)",
                file=sys.stderr,
            )
            return 2
        # shard/bloom geometry is baked into the persisted state: a
        # resume must run the config the store was seeded with, not the
        # CLI defaults (use_bloom and priority stay CLI-controlled —
        # derived data / a pick-order knob, both safe to change)
        stored = driver.store.read_config()
        if stored is not None:
            stored.pop("adapter", None)  # tag, not a CrawlConfig field
            stored["use_bloom"] = cfg.use_bloom
            stored["priority"] = cfg.priority
            stored["seen_filter"] = cfg.seen_filter
            resumed = CrawlConfig(**stored)
            if resumed != cfg:
                print(
                    f"note: resuming with the store's pinned config {stored}",
                    file=sys.stderr,
                )
            cfg = resumed
            driver = CrawlDriver(
                spark, args.store, cfg, adapter=adapter,
                allow_adapter_switch=args.force_adapter,
            )
        try:
            driver.check_config()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    if not args.resume:
        seeds = args.seed_url or [raw_url_py(i) for i in range(args.seeds)]
        driver.seed(seeds)
    if args.changed_since and not args.ingest_sitemaps:
        print("error: --changed-since needs --ingest-sitemaps", file=sys.stderr)
        if own_session:
            spark.stop()
        return 2
    if args.ingest_sitemaps:
        try:
            print(json.dumps({
                "sitemap_ingest": driver.ingest_sitemaps(args.changed_since)
            }))
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            if own_session:
                spark.stop()
            return 2
    if args.evict_url:
        print(json.dumps({"evict": driver.evict_seen(args.evict_url)}))
    if args.requeue_url:
        print(json.dumps({"requeue": driver.requeue(args.requeue_url)}))
    if args.recrawl_due:
        print(json.dumps({"recrawl_due": driver.recrawl_due()}))
    for st in driver.run(args.rounds, resume=args.resume):
        print(
            json.dumps(
                {
                    "round": st.round_no,
                    "scheduled": st.scheduled,
                    "fetched_ok": st.fetched_ok,
                    "fetch_failed": st.fetch_failed,
                    "candidates": st.candidates,
                    "admitted": st.admitted,
                    "new_urls": st.new_urls,
                    "wall_sec": round(st.wall_sec, 2),
                }
            )
        )
    n_docs = driver.store.read("docs").count()
    n_seen = driver.seen_set().count()
    print(json.dumps({"total_docs": n_docs, "seen_set": n_seen}))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
