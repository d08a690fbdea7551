"""Crawl configuration shared by the Spark engine and the oracle simulator.

Defaults mirror the reference's constants where one exists (cites into
/root/reference/SearchEngine/SearchEngine/SearchEngine.h).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    n_shards: int = 8  # PENDINGDBMAX=2000 at production scale (SearchEngine.h:32)
    per_shard_quota: int = 25  # round backpressure (ref: maxPending/shards/BULK, :808-810)
    politeness_rounds: int = 1  # DDOSDELAY=15s ≙ 1 round tick (SearchEngine.h:21)
    max_urls_per_host: int = 1_000_000  # MAXURLPERHOST (SearchEngine.h:17)
    max_doc: int = 500  # synthetic URL universe size (corpus grammar ids)
    shard_salt: str = "s0"  # hot-host salting knob (north_rule; SURVEY §4-X3)
    use_bloom: bool = True  # seen prefilter before the exact anti-join (D3)
    bloom_bits_per_shard: int = 1 << 16
    bloom_hashes: int = 4
    # which prefilter structure use_bloom enables (north rule: "bloom/
    # cuckoo-filter URL-seen set"): "bloom" = OR-mergeable bitmaps
    # (operators.seen), "cuckoo" = deletable fingerprint table
    # (operators.cuckoo). Both are DERIVED data under the same
    # exact-anti-join fallback, so check_config exempts the knob (like
    # use_bloom) — a round commits only the active structure's table
    # and drops the other's version, forcing a rebuild on switch-back.
    seen_filter: str = "bloom"
    # cuckoo geometry (pinned, like bloom_bits_per_shard: a drifted
    # resume would probe existing blocks at wrong positions). buckets
    # must be a power of two (xor alternate bucket) and <= 2^16 (stash
    # packing); capacity/shard = buckets*bucket_size at ~95% load.
    cuckoo_buckets_per_shard: int = 1 << 11
    cuckoo_bucket_size: int = 4
    # robots cache TTL in rounds for learned-robots adapters (HTTP):
    # a host whose robots_state was resolved more than this many rounds
    # ago is re-resolved in the hosts merge. 0 = cache forever (the
    # reference's behavior — robots is fetched once per host). No-op
    # for expr-derived robots (synthetic adapter).
    robots_ttl_rounds: int = 0
    # frontier pick order (north-star "priority frontier queue"):
    # "fifo" = reference-parity (discovered_round, url_md5) — what the
    # byte-equality suite pins; "depth" = shallow-first (path depth
    # prepends the pick order at every level). A scheduling-order
    # knob only — no state table is keyed by it, so check_config
    # exempts it (like use_bloom) and it may change across resumes.
    priority: str = "fifo"
