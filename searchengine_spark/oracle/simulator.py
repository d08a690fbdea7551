"""Single-threaded pure-Python crawl simulator — the ordering oracle.

Implements the exact de-randomized semantics of the Spark engine
(plans/crawl.py): same canonicalize/filter/shard/robots/dedup rules,
same (discovered_round, url_md5) ordering contract, same politeness
clocks, host caps, deterministic failures and bad-host retry windows.

The engine's ordered fetch log and final seen set must equal this
simulator's byte-for-byte (SURVEY.md §5.2 — the tractable stand-in for
"reproduce the reference C++ crawler's crawl ordering", whose only
nondeterminism sources S9/O4/X11 we have pinned).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from searchengine_spark.config import CrawlConfig
from searchengine_spark.corpus import (
    fetch_fails_py,
    fetch_spans_py,
    robots_allows_py,
    url_path_py,
)
from searchengine_spark.functions.hashes import hash60_py
from searchengine_spark.functions.urls import (
    canonicalize_py,
    filter_url_py,
    host_shard_py,
    split_host_py,
    url_md5_py,
)

MAXHOSTTRY = 10


@dataclass
class HostState:
    next_allowed: int = 0
    fail_count: int = 0
    fetch_count: int = 0
    url_count: int = 0


@dataclass
class SimState:
    frontier: dict = field(default_factory=dict)  # md5 -> (url, host, shard, disc)
    hosts: dict = field(default_factory=dict)  # host -> HostState
    seen: set = field(default_factory=set)
    fetch_log: list = field(default_factory=list)  # (round, seq, url, host)
    docs: list = field(default_factory=list)  # (md5, url, round, seq)


def _normalize(raw_url: str, cfg: CrawlConfig):
    """canonicalize -> filter -> robots -> (url, md5, host, shard) or None."""
    u = canonicalize_py(raw_url)
    if u is None or not filter_url_py(u):
        return None
    md5 = url_md5_py(u)
    if md5 is None:
        return None
    host = split_host_py(u)
    if not robots_allows_py(host, url_path_py(u)):
        return None
    return (u, md5, host, host_shard_py(host, cfg.n_shards, cfg.shard_salt))


def seed(state: SimState, seed_urls: list[str], cfg: CrawlConfig) -> None:
    cands = [c for c in (_normalize(u, cfg) for u in seed_urls) if c is not None]
    for _, _, host, _ in cands:  # attempted-count quirk (pre-dedup)
        state.hosts.setdefault(host, HostState()).url_count += 1
    # batch dedup keeping min canonical url
    best: dict[str, tuple] = {}
    for u, md5, host, shard in cands:
        if md5 not in best or u < best[md5][0]:
            best[md5] = (u, host, shard)
    for md5, (u, host, shard) in best.items():
        state.frontier[md5] = (u, host, shard, 0)
        state.seen.add(md5)


def run_round(state: SimState, round_no: int, cfg: CrawlConfig) -> dict:
    # ---- eligibility (politeness + bad-host retry window)
    def eff_next_allowed(host: str) -> int:
        hs = state.hosts.get(host)
        if hs is None:
            return 0
        if hs.fail_count >= MAXHOSTTRY and (
            round_no % 10 != hash60_py(host, "retry") % 10
        ):
            return 2**31 - 1
        return hs.next_allowed

    eligible = [
        (md5, u, host, shard, disc)
        for md5, (u, host, shard, disc) in state.frontier.items()
        if eff_next_allowed(host) <= round_no
    ]

    # ---- per-host pick: min (discovered_round, url_md5)
    per_host: dict[str, tuple] = {}
    for md5, u, host, shard, disc in eligible:
        key = (disc, md5)
        if host not in per_host or key < (per_host[host][4], per_host[host][0]):
            per_host[host] = (md5, u, host, shard, disc)

    # ---- per-shard quota by (discovered_round, url_md5)
    by_shard: dict[int, list] = {}
    for row in per_host.values():
        by_shard.setdefault(row[3], []).append(row)
    scheduled = []
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r[4], r[0]))
        scheduled.extend(rows[: cfg.per_shard_quota])

    # ---- global log order
    scheduled.sort(key=lambda r: (r[4], r[0]))

    candidates = []  # (url, md5, host, shard) post row-filters
    n_ok = n_fail = 0
    for seq, (md5, u, host, shard, disc) in enumerate(scheduled, start=1):
        del state.frontier[md5]
        hs = state.hosts.setdefault(host, HostState())
        hs.next_allowed = round_no + cfg.politeness_rounds
        if fetch_fails_py(host, round_no):
            hs.fail_count += 1
            n_fail += 1
            state.frontier[md5] = (u, host, shard, round_no + 1)  # retry
            continue
        hs.fetch_count += 1
        n_ok += 1
        state.fetch_log.append((round_no, seq, u, host))
        state.docs.append((md5, u, round_no, seq))
        for s in fetch_spans_py(u, cfg.max_doc):
            if s["kind"] == "link":
                c = _normalize(s["media_ref"], cfg)
                if c is not None:
                    candidates.append(c)

    # ---- host-cap admission over ALL filtered candidates
    remaining_snapshot = {
        h: cfg.max_urls_per_host - hs.url_count for h, hs in state.hosts.items()
    }
    by_host: dict[str, list] = {}
    for c in candidates:
        by_host.setdefault(c[2], []).append(c)
    admitted = []
    for host, rows in by_host.items():
        rows.sort(key=lambda r: (r[1], r[0]))  # (url_md5, url)
        rem = remaining_snapshot.get(host, cfg.max_urls_per_host)
        admitted.extend(rows[: max(0, rem)])
        state.hosts.setdefault(host, HostState()).url_count += len(rows)

    # ---- batch dedup (min url per md5) then seen anti-join
    best: dict[str, tuple] = {}
    for u, md5, host, shard in admitted:
        if md5 not in best or u < best[md5][0]:
            best[md5] = (u, host, shard)
    n_new = 0
    for md5, (u, host, shard) in sorted(best.items()):
        if md5 in state.seen:
            continue
        state.seen.add(md5)
        state.frontier[md5] = (u, host, shard, round_no + 1)
        n_new += 1

    return {
        "round": round_no,
        "scheduled": len(scheduled),
        "fetched_ok": n_ok,
        "fetch_failed": n_fail,
        "candidates": len(candidates),
        "admitted": len(admitted),
        "new_urls": n_new,
    }


def evict(state: SimState, urls: list[str], cfg: CrawlConfig) -> int:
    """Seen-set eviction twin of CrawlDriver.evict_seen: drop the URLs'
    md5 keys from the seen set so the next page that links them
    re-admits them into the frontier (the recrawl actuator). Keys still
    PENDING in the frontier are skipped (evicting one would double-
    admit it while queued); host url_count is untouched (admission
    caps count ATTEMPTS, the reference filterURL semantics)."""
    n = 0
    for u in urls:
        c = _normalize(u, cfg)
        if c is None:
            continue
        md5 = c[1]
        if md5 in state.seen and md5 not in state.frontier:
            state.seen.discard(md5)
            n += 1
    return n


def requeue(
    state: SimState, urls: list[str], cfg: CrawlConfig, disc_round: int
) -> int:
    """Guaranteed-re-fetch twin of CrawlDriver.requeue: append already-
    SEEN URLs straight back into the frontier (discovered_round =
    disc_round, so they compete like freshly discovered URLs in the
    next round's (discovered_round, url_md5) pick order). The seen set
    is untouched — the key stays deduped against organic re-discovery.
    Unseen URLs are skipped (they belong to normal admission), as are
    keys already pending."""
    n = 0
    for u in urls:
        c = _normalize(u, cfg)
        if c is None:
            continue
        url, md5, host, shard = c
        if md5 in state.seen and md5 not in state.frontier:
            state.frontier[md5] = (url, host, shard, disc_round)
            n += 1
    return n


def recrawl_due(
    state: SimState,
    target_round: int,
    cfg: CrawlConfig,
    max_interval: int = 16,
) -> int:
    """Composed-freshness twin of CrawlDriver.recrawl_due: derive the
    change-observation log from the fetch history (state.docs holds one
    row per successful fetch), apply the Cho backoff closed form per
    key, and requeue the keys due by `target_round`.

    Synthetic content is a pure function of the URL, so a re-fetch
    never observes a change: the last change is always observation 1
    (the first sighting) and interval = min(2^(n_obs - 1),
    max_interval), due when last_fetch_round + interval <= target.
    Requeue semantics (seen untouched; pending keys skipped) match
    `requeue` exactly."""
    obs: dict[str, list[int]] = {}
    urls: dict[str, str] = {}
    for md5, url, r, _seq in state.docs:
        obs.setdefault(md5, []).append(r)
        urls[md5] = url
    n = 0
    for md5 in obs:
        rounds = obs[md5]
        interval = min(2 ** (len(rounds) - 1), max_interval)
        if rounds[-1] + interval > target_round:
            continue
        if md5 not in state.seen or md5 in state.frontier:
            continue
        c = _normalize(urls[md5], cfg)
        if c is None:
            continue
        url, _md5, host, shard = c
        state.frontier[md5] = (url, host, shard, target_round)
        n += 1
    return n


def simulate(seed_urls: list[str], n_rounds: int, cfg: CrawlConfig) -> SimState:
    state = SimState()
    seed(state, seed_urls, cfg)
    for r in range(n_rounds):
        run_round(state, r, cfg)
    return state
