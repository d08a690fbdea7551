"""Production HTTP fetch adapter for the crawl's network boundary.

The crawl round computes documents through one column slot
(plans/crawl.py: `ok.withColumn("spans", ...)`): the sandbox fills it
with the synthetic JVM projection (corpus.fetch_spans_expr); a real
deployment swaps in THIS adapter — a vectorized pandas UDF that fetches
each scheduled URL over HTTP(S) and emits (status, content_type, body),
after which the existing extract_spans_udf turns HTML into the spans
array and content_type_allowed applies the P8 gate unchanged.

Concurrency model ≙ the reference's ~1000 crawl threads blocked on
sockets (SearchEngine.cpp:662-770, KKSocket.hpp): network fetch is
latency-bound, so each Arrow batch fans out over a thread pool
(stdlib-only; no extra deps). Politeness is ALREADY enforced upstream
by the scheduler (one URL per host per round), so the pool needs no
per-host throttling of its own — every URL in a batch is a distinct
host by construction.

Failure semantics match the reference's error path: any transport
error, timeout, or non-2xx is reported as a status code (0 for
transport-level failures) with an empty body; the round marks the URL
failed and the hosts merge applies the backoff/fail counters exactly
as for synthetic failures. A 2xx response with a disallowed
Content-Type is NOT a failure: it counts as fetched (no backoff, no
fail counter — same as the synthetic adapter's post-fetch P8 gate,
plans/crawl.py) and is merely excluded from indexing.
"""

from __future__ import annotations

import codecs
import concurrent.futures as _fut
import html as _html
import re as _re
import urllib.error
import urllib.parse
import urllib.request

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FETCH_RESULT_TYPE = StructType(
    [
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", StringType()),
    ]
)

DEFAULT_TIMEOUT_S = 10.0  # ≙ reference connect/read budget
DEFAULT_MAX_BYTES = 1 << 20  # MAXDOWNLOADSIZE-style body cap
DEFAULT_POOL = 64  # per-executor-core fanout; latency-bound work
USER_AGENT = "searchengine-spark/0.4 (+crawler)"


class _NoAutoRedirect(urllib.request.HTTPRedirectHandler):
    """Surface every 3xx as an HTTPError so redirect policy is OURS,
    not urllib's default (which silently chases up to 10 hops of any
    3xx — both more permissive than the reference and invisible to the
    crawl's bookkeeping)."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
        return None


_OPENER = urllib.request.build_opener(_NoAutoRedirect())


def fetch_one(
    url: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    _hops: int = 1,
) -> tuple[int, str, str]:
    """One URL -> (status, content_type, body). Never raises: transport
    failures return status 0, HTTP errors their status code — the
    caller's failure handling is uniform with the synthetic adapter.

    Redirect policy = the reference's (httpDownload.h:108-133): a 301
    is followed exactly ONCE (Location re-resolved, one re-fetch; a
    second 301 in the chain is a failure). Other 3xx codes stay
    non-2xx failures — the reference instead falls through and would
    hand the redirect stub body to the indexer (httpDownload.h:135-139
    has no 3xx arm), which is a bug not worth parity; our uniform
    non-2xx split records the code and applies host backoff."""
    u = url if "://" in url else "http://" + url
    req = urllib.request.Request(u, headers={"User-Agent": USER_AGENT})
    try:
        with _OPENER.open(req, timeout=timeout_s) as resp:
            raw = resp.read(max_bytes)
            ctype = resp.headers.get("Content-Type", "") or ""
            # resolve the charset defensively OUTSIDE the failure path:
            # a misspelled charset header (LookupError) must degrade to
            # utf-8 replacement decoding, not misreport a successful
            # fetch as a transport failure (phantom backoff/fail count)
            charset = resp.headers.get_content_charset() or "utf-8"
            try:
                codecs.lookup(charset)
            except LookupError:
                charset = "utf-8"
            return (
                int(resp.status),
                ctype,
                raw.decode(charset, errors="replace"),
            )
    except urllib.error.HTTPError as e:  # non-2xx with a real response
        if e.code == 301 and _hops > 0:
            loc = (e.headers.get("Location", "") or "").strip()
            if loc:
                return fetch_one(
                    urllib.parse.urljoin(u, loc),
                    timeout_s,
                    max_bytes,
                    _hops=_hops - 1,
                )
        return (int(e.code), e.headers.get("Content-Type", "") or "", "")
    except Exception:  # DNS, refused, timeout, TLS, bad URL ...
        return (0, "", "")


def fetch_batch(
    urls: list[str],
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    pool_size: int = DEFAULT_POOL,
) -> list[tuple[int, str, str]]:
    """Fan a batch of (distinct-host) URLs over a thread pool, order
    preserved."""
    if not urls:
        return []
    n = min(pool_size, max(1, len(urls)))
    with _fut.ThreadPoolExecutor(max_workers=n) as ex:
        return list(
            ex.map(lambda u: fetch_one(u, timeout_s, max_bytes), urls)
        )


def make_http_fetch_udf(
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    pool_size: int = DEFAULT_POOL,
):
    """Arrow-batched fetch UDF: url column -> struct(status,
    content_type, body). Marked nondeterministic so Catalyst evaluates
    it exactly once even when both a filter (the P8 gate) and a
    projection reference it (the dup-evaluation trap — see
    CLAUDE.md/known traps)."""

    def _fetch(urls: pd.Series) -> pd.DataFrame:
        rows = fetch_batch(
            urls.fillna("").tolist(), timeout_s, max_bytes, pool_size
        )
        return pd.DataFrame(rows, columns=["status", "content_type", "body"])

    return (
        F.pandas_udf(_fetch, returnType=FETCH_RESULT_TYPE)
        .asNondeterministic()
    )


def fetched_docs(scheduled, cfg, udf=None, cache_handles: list | None = None):
    """The production form of the round's fetch stage: scheduled
    (url_md5, url, host, shard, round, seq_in_round) -> the same
    columns + content_type + spans, P8-gated, plus the failed subset.

    Returns (ok_docs, failed) — drop-in for the synthetic pair in
    plans/crawl.py. `spans` comes from the existing extract_spans_udf
    over the fetched body, so span semantics (T1-T5) are byte-shared
    with the fixture-verified extractor.

    Split semantics (must match the synthetic adapter so swapping in
    this one does not change hosts-merge state or fetch stats):
    * failed  = transport errors and non-2xx ONLY (these feed the
      host's retry/backoff/fail counters and get re-queued);
    * ok_docs = 2xx responses whose Content-Type passes the P8 gate;
    * a 2xx response with a disallowed Content-Type is in NEITHER
      frame — it counted as a successful fetch (no backoff) but is
      excluded from indexing, exactly the synthetic post-fetch gate
      (plans/crawl.py: ok.where(content_type_allowed)).

    The fetched frame is CACHED (two consumers branch from it; without
    the cache each branch would re-fetch every URL over the network).
    Pass `cache_handles` to receive the handle for round-scoped
    unpersist, run_round-style."""
    from searchengine_spark.functions.spans import extract_spans_udf
    from searchengine_spark.plans.crawl import content_type_allowed

    u = udf if udf is not None else make_http_fetch_udf()
    fetched = scheduled.withColumn("_f", u(F.col("url"))).cache()
    if cache_handles is not None:
        cache_handles.append(fetched)
    is_2xx = (F.col("_f.status") >= 200) & (F.col("_f.status") < 300)
    ok = (
        fetched.where(is_2xx & content_type_allowed(F.col("_f.content_type")))
        .withColumn("content_type", F.col("_f.content_type"))
        .withColumn("spans", extract_spans_udf(F.col("_f.body")))
        .drop("_f")
    )
    failed = fetched.where(~is_2xx).drop("_f")
    return ok, failed


ROBOTS_RESULT_TYPE = StructType(
    [
        StructField("robots_state", StringType()),
        StructField("ip", StringType()),
        StructField("crawl_delay", IntegerType()),
    ]
)


def resolve_host(
    host: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> tuple[str, str, int]:
    """First-contact host resolution: GET /robots.txt through the same
    transport as page fetches + one DNS lookup. Missing/unreachable
    robots.txt degrades to 'allow' (the conventional crawler default);
    a resolvable 2xx body parses through corpus.parse_robots_txt into
    the engine's robots_state string and through parse_crawl_delay
    into a per-host politeness override (rounds, capped). The
    port-in-host quirk (P2) is honored: DNS resolves the name left of
    the ':'."""
    import socket

    from searchengine_spark.corpus import parse_crawl_delay, parse_robots_txt

    st, _, body = fetch_one(f"http://{host}/robots.txt", timeout_s, max_bytes)
    ok = 200 <= st < 300
    robots = parse_robots_txt(body) if ok else "allow"
    delay = parse_crawl_delay(body) if ok else 0
    name = host.rsplit(":", 1)[0] if ":" in host else host
    try:
        ip = socket.gethostbyname(name)
    except OSError:
        ip = "0.0.0.0"
    return robots, ip, delay


def make_resolve_hosts_udf(
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    pool_size: int = DEFAULT_POOL,
):
    """Arrow-batched host resolver: host column -> struct(robots_state,
    ip, crawl_delay), thread-pooled like the page fetch
    (latency-bound)."""

    def _resolve(hosts: pd.Series) -> pd.DataFrame:
        hs = hosts.fillna("").tolist()
        if not hs:
            return pd.DataFrame(columns=["robots_state", "ip", "crawl_delay"])
        n = min(pool_size, max(1, len(hs)))
        with _fut.ThreadPoolExecutor(max_workers=n) as ex:
            rows = list(ex.map(lambda h: resolve_host(h, timeout_s, max_bytes), hs))
        return pd.DataFrame(rows, columns=["robots_state", "ip", "crawl_delay"])

    return (
        F.pandas_udf(_resolve, returnType=ROBOTS_RESULT_TYPE)
        .asNondeterministic()
    )


class HttpFetchAdapter:
    """The production network boundary for CrawlDriver: real HTTP page
    fetches (fetched_docs), real robots.txt + DNS at first host contact
    (resolve_host). Drop-in for SyntheticFetchAdapter — same
    (docs_new, failed) contract, same hosts-table columns.

    `ingest_robots=False`: robots state is LEARNED, not derivable from
    the host name, so the crawl plan gates candidates and scheduled
    URLs against the hosts table's cached robots_state instead of the
    synthetic ingest expression (plans/crawl.py)."""

    ingest_robots = False
    tag = "http"  # pinned into _crawl_config at seed time
    # real pages carry raw hrefs in their link spans; run_round
    # resolves them against the page URL (getURLs semantics) before
    # candidate normalization — the synthetic grammar pre-resolves
    emits_raw_hrefs = True

    def __init__(
        self,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        max_bytes: int = DEFAULT_MAX_BYTES,
        pool_size: int = DEFAULT_POOL,
    ):
        self.timeout_s = timeout_s
        self.max_bytes = max_bytes
        self.pool_size = pool_size
        self._fetch_udf = make_http_fetch_udf(timeout_s, max_bytes, pool_size)
        self._resolve_udf = make_resolve_hosts_udf(timeout_s, max_bytes, pool_size)

    def fetch(self, scheduled, round_no: int, cfg, cache_handles):
        ok, failed = fetched_docs(
            scheduled, cfg, udf=self._fetch_udf, cache_handles=cache_handles
        )
        docs_new = ok.select(
            "url_md5", "url", "host", "shard", "round", "seq_in_round", "spans"
        )
        return docs_new, failed.select(*scheduled.columns)

    def robots_state_expr(self):
        return None  # must fetch: resolve_hosts runs instead

    def host_ip_expr(self):
        return None

    def resolve_hosts(self, new_hosts):
        return new_hosts.select(
            "host", self._resolve_udf(F.col("host")).alias("_r")
        ).select(
            "host",
            F.col("_r.robots_state").alias("robots_state"),
            F.col("_r.ip").alias("ip"),
            F.col("_r.crawl_delay").alias("crawl_delay"),
        )

    def sitemap_urls_udf(self):
        """host -> array<string> of robots-declared sitemap page URLs
        (CrawlDriver.ingest_sitemaps's discovery surface)."""
        return make_sitemap_urls_udf(
            self.timeout_s, self.max_bytes, self.pool_size
        )

    def sitemap_entries_udf(self, changed_since: str | None = None):
        """host -> array<struct<loc,lastmod>> — the lastmod-aware
        discovery surface (CrawlDriver.ingest_sitemaps with
        changed_since: seen pages whose lastmod is newer get
        REQUEUED for a re-fetch, and stale index children are not
        even fetched)."""
        return make_sitemap_entries_udf(
            self.timeout_s, self.max_bytes, self.pool_size, changed_since
        )


# ---------------------------------------------------------------------------
# sitemap discovery (sitemaps.org protocol over the same transport)
# ---------------------------------------------------------------------------

SITEMAP_MAX_FILES = 8  # sitemap files fetched per host (index children incl.)
SITEMAP_MAX_URLS = 50_000  # the protocol's own per-file cap; also our total

_LOC_RE = _re.compile(r"<loc>\s*(.*?)\s*</loc>", _re.IGNORECASE | _re.DOTALL)
_ENTRY_RE = _re.compile(
    r"<(?:url|sitemap)>(.*?)</(?:url|sitemap)>", _re.IGNORECASE | _re.DOTALL
)
_LASTMOD_RE = _re.compile(
    r"<lastmod>\s*(.*?)\s*</lastmod>", _re.IGNORECASE | _re.DOTALL
)
# sitemaps.org lastmod is W3C datetime; only the DATE prefix is kept
# (YYYY-MM-DD sorts chronologically as a string, mixed granularities
# compare cleanly) — anything not starting with a date is treated as
# absent rather than guessed at.
_LASTMOD_DATE_RE = _re.compile(r"^\d{4}-\d{2}-\d{2}")


def _lastmod_date(s: str | None) -> str | None:
    if not s:
        return None
    m = _LASTMOD_DATE_RE.match(s.strip())
    return m.group(0) if m else None


def parse_sitemap_entries(
    xml: str,
) -> tuple[str, list[tuple[str, str | None]]]:
    """One sitemap file -> (kind, [(loc, lastmod_date|None), ...]):
    kind is 'index' for a <sitemapindex> (locs are CHILD SITEMAP urls)
    else 'urlset' (locs are page urls). Regex extraction with entity
    unescape — the sitemaps.org schema is flat enough that a full XML
    parser buys nothing at the fetch boundary; malformed files degrade
    to however many well-formed entries they contain (a bare <loc>
    outside an entry block still counts, with no lastmod)."""
    kind = "index" if _re.search(r"<\s*sitemapindex", xml, _re.I) else "urlset"
    out: list[tuple[str, str | None]] = []
    covered: set[str] = set()
    for m in _ENTRY_RE.finditer(xml):
        block = m.group(1)
        locm = _LOC_RE.search(block)
        if not locm or not locm.group(1).strip():
            continue
        loc = _html.unescape(locm.group(1))
        lm = _LASTMOD_RE.search(block)
        out.append((loc, _lastmod_date(lm.group(1) if lm else None)))
        covered.add(loc)
    # malformed fallback: bare <loc> tags outside entry blocks
    for m in _LOC_RE.finditer(xml):
        if m.group(1).strip():
            loc = _html.unescape(m.group(1))
            if loc not in covered:
                out.append((loc, None))
                covered.add(loc)
    return kind, out[:SITEMAP_MAX_URLS]


def parse_sitemap(xml: str) -> tuple[str, list[str]]:
    """Back-compat form of parse_sitemap_entries: (kind, locs) with
    lastmod dropped."""
    kind, entries = parse_sitemap_entries(xml)
    return kind, [loc for loc, _ in entries]


def fetch_host_sitemap_entries(
    host: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    changed_since: str | None = None,
) -> list[tuple[str, str | None]]:
    """Host -> (page URL, lastmod date) pairs declared by its
    robots.txt `Sitemap:` lines (sitemaps.org; RFC 9309 §2.3).
    Conservative discovery: only DECLARED sitemaps are fetched (no
    blind /sitemap.xml probe — an undeclared guess 404s on most hosts
    and pollutes failure stats). A <sitemapindex> is followed one BFS
    level within the same SITEMAP_MAX_FILES budget; page URLs cap at
    SITEMAP_MAX_URLS total. Every fetch is the adapter's own
    transport (fetch_one), so timeout/size caps and the 301-once
    policy hold here too.

    `changed_since` (YYYY-MM-DD) makes the index level lastmod-aware:
    a CHILD sitemap whose index entry carries a lastmod ON OR BEFORE
    the date is not fetched at all (its pages cannot have changed
    since, per the protocol's lastmod contract) — the fetch saver that
    matters on large sites where one index fronts hundreds of stable
    child files. Children without a lastmod are always fetched."""
    from searchengine_spark.corpus import parse_sitemap_decls

    st, _, body = fetch_one(f"http://{host}/robots.txt", timeout_s, max_bytes)
    if not (200 <= st < 300):
        return []
    queue: list[str] = parse_sitemap_decls(body)[:SITEMAP_MAX_FILES]
    pages: list[tuple[str, str | None]] = []
    fetched = 0
    while queue and fetched < SITEMAP_MAX_FILES and len(pages) < SITEMAP_MAX_URLS:
        sm_url = queue.pop(0)
        fetched += 1
        st, _, xml = fetch_one(sm_url, timeout_s, max_bytes)
        if not (200 <= st < 300):
            continue
        kind, entries = parse_sitemap_entries(xml)
        if kind == "index":
            children = [
                loc
                for loc, lm in entries
                if not (changed_since and lm and lm <= changed_since)
            ]
            queue.extend(children[: SITEMAP_MAX_FILES - fetched])
        else:
            pages.extend(entries[: SITEMAP_MAX_URLS - len(pages)])
    return pages


def fetch_host_sitemaps(
    host: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> list[str]:
    """Back-compat form of fetch_host_sitemap_entries: page URLs only."""
    return [
        loc for loc, _ in fetch_host_sitemap_entries(host, timeout_s, max_bytes)
    ]


def make_sitemap_urls_udf(
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    pool_size: int = DEFAULT_POOL,
):
    """Arrow-batched sitemap discovery: host column -> array<string>
    of declared page URLs, thread-pooled like every other latency-
    bound fetch in this adapter."""
    from pyspark.sql.types import ArrayType

    def _discover(hosts: pd.Series) -> pd.Series:
        hs = hosts.fillna("").tolist()
        if not hs:
            return pd.Series([], dtype=object)
        n = min(pool_size, max(1, len(hs)))
        with _fut.ThreadPoolExecutor(max_workers=n) as ex:
            rows = list(
                ex.map(lambda h: fetch_host_sitemaps(h, timeout_s, max_bytes), hs)
            )
        return pd.Series(rows)

    return (
        F.pandas_udf(_discover, returnType=ArrayType(StringType()))
        .asNondeterministic()
    )


def make_sitemap_entries_udf(
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    pool_size: int = DEFAULT_POOL,
    changed_since: str | None = None,
):
    """Lastmod-aware sitemap discovery: host column ->
    array<struct<loc, lastmod>> (lastmod is a YYYY-MM-DD string or
    NULL). `changed_since` also prunes index-level children inside the
    fetch (fetch_host_sitemap_entries). Thread-pooled like every other
    latency-bound fetch in this adapter."""

    def _discover(hosts: pd.Series) -> pd.Series:
        hs = hosts.fillna("").tolist()
        if not hs:
            return pd.Series([], dtype=object)
        n = min(pool_size, max(1, len(hs)))
        with _fut.ThreadPoolExecutor(max_workers=n) as ex:
            rows = list(
                ex.map(
                    lambda h: [
                        {"loc": loc, "lastmod": lm}
                        for loc, lm in fetch_host_sitemap_entries(
                            h, timeout_s, max_bytes, changed_since
                        )
                    ],
                    hs,
                )
            )
        return pd.Series(rows)

    return (
        F.pandas_udf(
            _discover,
            returnType="array<struct<loc:string,lastmod:string>>",
        )
        .asNondeterministic()
    )
