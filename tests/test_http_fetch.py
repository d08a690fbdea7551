"""Production HTTP fetch adapter (S5/S6 network path) against a real
local HTTP server: statuses, decode, body cap, transport failures, and
the Spark-side fetched_docs stage (P8 gate + span extraction) feeding
the same downstream the synthetic adapter feeds."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from searchengine_spark.config import CrawlConfig
from searchengine_spark.sources import http_fetch as HF

HTML = (
    "<html><head><title>Adapter Page</title></head>"
    '<body>hello fetched world <a href="http://a.com/next">n</a>'
    "</body></html>"
)


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path == "/ok":
            body = HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/big":
            body = b"x" * 100_000
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/badcharset":
            body = b"<html><body>charset page</body></html>"
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/html; charset=bogus-enc-42"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/png":
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", "4")
            self.end_headers()
            self.wfile.write(b"\x89PNG")
        elif self.path in ("/moved", "/hop1", "/hop2", "/found", "/movedrel"):
            target = {
                "/moved": "/ok",  # one 301 hop -> content
                "/hop1": "/hop2",  # 301 chain: second hop must NOT follow
                "/hop2": "/ok",
                "/found": "/ok",  # 302: reference has no arm; our failure
                "/movedrel": "ok",  # relative Location resolves vs request
            }[self.path]
            self.send_response(302 if self.path == "/found" else 301)
            self.send_header("Location", target)
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self.send_error(404)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_one_statuses(server):
    st, ct, body = HF.fetch_one(f"{server}/ok")
    assert st == 200 and ct.startswith("text/html") and "fetched world" in body
    st404, _, body404 = HF.fetch_one(f"{server}/missing")
    assert st404 == 404 and body404 == ""
    # transport failure: refused port -> status 0, never raises
    st0, ct0, b0 = HF.fetch_one("http://127.0.0.1:9/x", timeout_s=1.0)
    assert (st0, ct0, b0) == (0, "", "")


def test_fetch_one_body_cap(server):
    st, _, body = HF.fetch_one(f"{server}/big", max_bytes=1000)
    assert st == 200 and len(body) == 1000


def test_fetch_batch_order_preserved(server):
    urls = [f"{server}/ok", f"{server}/missing", f"{server}/ok"]
    rows = HF.fetch_batch(urls, pool_size=3)
    assert [r[0] for r in rows] == [200, 404, 200]


def test_fetched_docs_stage(spark, server):
    """The Spark stage: 2xx+text/html rows become docs with extracted
    spans; 404 and dead hosts land in failed; a 2xx non-HTML response
    is in NEITHER (fetched ok, just not indexable) — the same split
    the synthetic adapter produces for the hosts merge."""
    rows = [
        ("m1", f"{server}/ok", "h1.com", 0, 0, 1),
        ("m2", f"{server}/missing", "h2.com", 0, 0, 2),
        ("m3", f"{server}/png", "h3.com", 1, 0, 3),
        ("m4", "http://127.0.0.1:9/x", "h4.com", 1, 0, 4),
    ]
    scheduled = spark.createDataFrame(
        rows,
        "url_md5 string, url string, host string, shard int, "
        "round int, seq_in_round int",
    )
    handles: list = []
    ok, failed = HF.fetched_docs(
        scheduled,
        CrawlConfig(n_shards=4),
        udf=HF.make_http_fetch_udf(timeout_s=3.0),
        cache_handles=handles,
    )
    got_ok = ok.collect()
    assert [r["url_md5"] for r in got_ok] == ["m1"]
    spans = got_ok[0]["spans"]
    kinds = [s["kind"] for s in spans]
    assert "title" in kinds
    title = next(s for s in spans if s["kind"] == "title")
    assert title["text"] == "Adapter Page"
    link = next(s for s in spans if s["kind"] == "link")
    assert link["media_ref"] == "http://a.com/next"
    # m3 (200 + image/png): fetched OK — no fail counter — but not
    # indexable, so it appears in neither frame
    assert sorted(r["url_md5"] for r in failed.collect()) == ["m2", "m4"]
    for h in handles:
        h.unpersist()


def test_fetch_one_bad_charset_header(server):
    """A 2xx response advertising an unknown charset must decode with
    utf-8 replacement, not be misreported as a transport failure."""
    st, ct, body = HF.fetch_one(f"{server}/badcharset")
    assert st == 200
    assert "charset page" in body


# ---------------------------------------------------------------------------
# end-to-end: a full crawl loop over real HTTP (pages + robots + DNS)
# ---------------------------------------------------------------------------

PAGE_A = (
    "<html><head><title>Home One</title></head><body>alpha beta"
    '<a href="http://127.0.0.1:{p}/a">a</a>'
    '<a href="http://127.0.0.2:{p}/">two</a>'
    '<a href="http://127.0.0.3:{p}/">three</a>'
    '<a href="http://127.0.0.3:{p}/secret/x">hidden</a>'
    '<a href="http://127.0.0.4:{p}/ok/page">allowed carve-out</a>'
    '<a href="http://127.0.0.4:{p}/blocked">blanket-disallowed</a>'
    '<a href="http://127.0.0.5:{p}/">five</a>'
    '<a href="http://127.0.0.1:9/x">dead</a>'
    "</body></html>"
)
SIMPLE = "<html><head><title>{t}</title></head><body>plain text</body></html>"


class _SiteHandler(BaseHTTPRequestHandler):
    requests: list  # class attr set by the fixture

    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        name = (self.headers.get("Host") or "").split(":")[0]
        port = self.server.server_address[1]
        self.requests.append((name, self.path))
        if self.path == "/robots.txt":
            if name == "127.0.0.2":
                self._send(b"User-agent: *\nDisallow: /\n", "text/plain")
            elif name == "127.0.0.3":
                self._send(b"User-agent: *\nDisallow: /secret\n", "text/plain")
            elif name == "127.0.0.4":
                self._send(
                    b"User-agent: *\nDisallow: /\nAllow: /ok\n", "text/plain"
                )
            else:
                self.send_error(404)
        elif name == "127.0.0.5":
            self._send(b"\x89PNG....", "image/png")
        elif name == "127.0.0.1" and self.path in ("/", ""):
            self._send(PAGE_A.format(p=port).encode())
        elif name == "127.0.0.1" and self.path == "/a":
            self._send(SIMPLE.format(t="Page A").encode())
        elif name == "127.0.0.3" and not self.path.startswith("/secret"):
            self._send(SIMPLE.format(t="Three Home").encode())
        elif name == "127.0.0.4" and self.path.startswith("/ok"):
            self._send(SIMPLE.format(t="Carved Out").encode())
        else:
            self.send_error(404)

    def log_message(self, *a):
        pass


@pytest.fixture()
def site():
    reqs: list = []
    handler = type("_H", (_SiteHandler,), {"requests": reqs})
    srv = ThreadingHTTPServer(("", 0), handler)  # all loopback aliases
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], reqs
    srv.shutdown()


def test_http_crawl_loop_end_to_end(spark, site, tmp_path):
    """A full multi-round crawl through HttpFetchAdapter against a live
    local multi-host site: P8 content-type gating, transport-failure
    backoff, and robots.txt fetched over HTTP into hosts.robots_state
    with deny/disallow enforcement — no synthetic expressions anywhere
    on the network path."""
    from searchengine_spark.config import CrawlConfig
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    port, reqs = site
    h1, h2, h3, h4 = (f"127.0.0.{i}:{port}" for i in (1, 2, 3, 4))
    h5, dead = f"127.0.0.5:{port}", "127.0.0.1:9"
    drv = CrawlDriver(
        spark,
        str(tmp_path / "store"),
        CrawlConfig(n_shards=4, politeness_rounds=1),
        adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=8),
    )
    drv.seed([f"http://{h1}/"])
    stats = drv.run(4)

    docs = drv.store.read("docs").select("host", "url", "round").collect()
    fetched_urls = {r["url"] for r in docs}
    # indexable pages all crawled; deny-host, disallowed path, png and
    # dead host produced no documents; h4's Allow carve-out under a
    # blanket Disallow IS crawled (RFC 9309 longest-match precedence)
    assert fetched_urls == {h1, f"{h1}/a", h3, f"{h4}/ok/page"}
    # politeness budget: never two fetches of one host in one round
    per_round = {}
    for r in docs:
        key = (r["host"], r["round"])
        per_round[key] = per_round.get(key, 0) + 1
    assert all(v == 1 for v in per_round.values())

    hosts = {r["host"]: r for r in drv.store.read("hosts").collect()}
    # robots fetched over HTTP and parsed into the cache
    assert hosts[h2]["robots_state"] == "deny"
    assert hosts[h3]["robots_state"] == "disallow:/secret"
    assert hosts[h4]["robots_state"] == "rules:-/|+/ok"
    assert hosts[h1]["robots_state"] == "allow"  # 404 robots -> allow
    # DNS resolved through the adapter (port-in-host honored)
    assert hosts[h1]["ip"] == "127.0.0.1"
    assert hosts[h2]["ip"] == "127.0.0.2"
    # transport failure: backoff + fail counter, never a doc
    assert hosts[dead]["fail_count"] >= 1
    assert hosts[dead]["fetch_count"] == 0
    # P8: the png host was FETCHED ok (no failure, no backoff) but
    # yielded no document
    assert hosts[h5]["fetch_count"] == 1
    assert hosts[h5]["fail_count"] == 0

    # the server log agrees: /secret and h4's blanket-disallowed path
    # never requested, deny-host h2 received ONLY its robots probe,
    # robots fetched once per host
    assert not any(p.startswith("/secret") for _, p in reqs)
    assert not any(
        n == "127.0.0.4" and p == "/blocked" for n, p in reqs
    )
    assert [p for n, p in reqs if n == "127.0.0.2"] == ["/robots.txt"]
    robots_reqs = [(n, p) for n, p in reqs if p == "/robots.txt"]
    assert len(robots_reqs) == len(set(robots_reqs))

    # stats line up with the adapter's split semantics
    total_failed = sum(s.fetch_failed for s in stats)
    assert total_failed >= 1  # the dead host's transport failures


# ---------------------------------------------------------------------------
# robots TTL: periodic re-resolution of cached robots state
# ---------------------------------------------------------------------------

TTL_PAGE = (
    "<html><head><title>TTL Home</title></head><body>words"
    '<a href="http://127.0.0.1:{p}/b">b</a></body></html>'
)


class _TtlHandler(BaseHTTPRequestHandler):
    robots_cell: list  # [body]; mutable so the test can flip it
    requests: list

    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        self.requests.append(self.path)
        port = self.server.server_address[1]
        if self.path == "/robots.txt":
            self._send(self.robots_cell[0].encode(), "text/plain")
        elif self.path in ("/", ""):
            self._send(TTL_PAGE.format(p=port).encode())
        elif self.path == "/b":
            self._send(SIMPLE.format(t="Page B").encode())
        else:
            self.send_error(404)

    def log_message(self, *a):
        pass


def test_robots_ttl_refresh(spark, tmp_path):
    """ADVICE r5: with the default TTL (0), a host's robots_state is
    cached forever — first contact wins, the reference's behavior. With
    cfg.robots_ttl_rounds=N, the hosts merge re-fetches robots.txt for
    hosts whose state is older than N rounds, and the FRESH answer
    replaces the cache (a production crawler must notice a site
    tightening its robots policy)."""
    from searchengine_spark.config import CrawlConfig
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    cell = ["User-agent: *\nDisallow: /private\n"]
    reqs: list = []
    handler = type(
        "_H", (_TtlHandler,), {"robots_cell": cell, "requests": reqs}
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        h = f"127.0.0.1:{port}"
        drv = CrawlDriver(
            spark,
            str(tmp_path / "ttlstore"),
            CrawlConfig(n_shards=4, robots_ttl_rounds=1),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{h}/"])
        hosts = {r["host"]: r for r in drv.store.read("hosts").collect()}
        assert hosts[h]["robots_state"] == "disallow:/private"

        # the site tightens its policy between rounds; TTL=1 means the
        # round-1 hosts merge re-resolves (round 1 - checked 0 >= 1)
        cell[0] = "User-agent: *\nDisallow: /\n"
        drv.run(2)
        hosts = {r["host"]: r for r in drv.store.read("hosts").collect()}
        assert hosts[h]["robots_state"] == "deny"
        assert reqs.count("/robots.txt") >= 2
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# raw-href resolution on the HTTP path (getURLs semantics)
# ---------------------------------------------------------------------------


def test_resolve_href_expr_equals_py(spark):
    """The native resolver used by run_round on HTTP-fetched spans is
    row-equal to resolve_href_py (getURLs, SearchEngine.cpp:43-100) on
    every pattern class: absolute http/https kept, protocol-relative
    takes the base scheme, root-relative takes base host + scheme,
    everything else (fragment/mailto/relative-no-slash) drops."""
    from searchengine_spark.functions.spans import (
        resolve_href_expr,
        resolve_href_py,
    )

    cases = [
        ("a.com/p/1", "http://b.com/x"),
        ("a.com/p/1", "https://b.com/x"),
        ("a.com/p/1", "//cdn.com/y"),
        ("https://a.com/p/1", "//cdn.com/y"),
        ("a.com/p/1", "/local/path"),
        ("https://a.com/deep/page", "/local/path"),
        ("127.0.0.1:8931", "/port/in/host"),
        ("a.com/p/1", "relative-no-slash"),
        ("a.com/p/1", "#frag"),
        ("a.com/p/1", "mailto:x@y.z"),
        ("a.com/p/1", "//"),
    ]
    df = spark.createDataFrame(cases, "base string, href string")
    got = [
        r["r"]
        for r in df.select(
            resolve_href_expr(F.col("base"), F.col("href")).alias("r")
        ).collect()
    ]
    want = [resolve_href_py(b, h) for b, h in cases]
    assert got == want


REL_PAGE = (
    "<html><head><title>Rel Home</title></head><body>hello words "
    '<a href="/private/x">p</a> <a href="/tmp/y">t</a> '
    '<a href="/ok/z">ok</a> <a href="#frag">f</a></body></html>'
)


class _RelHandler(BaseHTTPRequestHandler):
    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path == "/robots.txt":
            self._send(
                b"User-agent: *\nDisallow: /private\nDisallow: /tmp/\n",
                "text/plain",
            )
        elif self.path in ("/", ""):
            self._send(REL_PAGE.encode())
        else:
            self._send(SIMPLE.format(t=f"Page {self.path}").encode())

    def log_message(self, *a):
        pass


def test_http_crawl_resolves_relative_links_and_multi_robots(spark, tmp_path):
    """End-to-end over real HTTP: a page whose links are all
    root-relative crawls correctly — hrefs resolve against the page
    host (no phantom 'private'/'tmp' hosts in the frontier), BOTH
    robots Disallow rules gate their paths (multi-prefix state) with
    no fetch and no failure mark, and the allowed path is fetched."""
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RelHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        h = f"127.0.0.1:{port}"
        drv = CrawlDriver(
            spark,
            str(tmp_path / "relstore"),
            CrawlConfig(n_shards=4),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{h}/"])
        stats = drv.run(2)

        hosts = {r["host"]: r for r in drv.store.read("hosts").collect()}
        assert set(hosts) == {h}  # no phantom hosts from relative hrefs
        assert hosts[h]["robots_state"] == "disallow:/private|/tmp/"
        assert hosts[h]["fail_count"] == 0  # robots drops are not failures

        docs = {r["url"] for r in drv.store.read("docs").collect()}
        assert docs == {h, f"{h}/ok/z"}  # allowed path fetched, gated not
        assert sum(s.fetch_failed for s in stats) == 0
    finally:
        srv.shutdown()


GATED_PAGE = (
    "<html><head><title>All Gated</title></head><body>words here "
    '<a href="/private/x">p</a> <a href="/tmp/y">t</a></body></html>'
)


class _AllGatedHandler(_RelHandler):
    def do_GET(self):  # noqa: N802
        if self.path == "/robots.txt":
            self._send(
                b"User-agent: *\nDisallow: /private\nDisallow: /tmp/\n",
                "text/plain",
            )
        else:
            self._send(GATED_PAGE.encode())


def test_crawl_survives_emptied_frontier(spark, tmp_path):
    """Round 1 robots-gates EVERY extracted link, leaving a zero-row
    frontier snapshot (partitioned write -> no part files, just
    _SUCCESS); round 2 must read that snapshot via its persisted
    schema and finish as an idle round instead of dying on parquet
    schema inference. (Found driving the real HTTP surface; fixed in
    TableStore._stored_schema/read.)"""
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _AllGatedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        h = f"127.0.0.1:{port}"
        drv = CrawlDriver(
            spark,
            str(tmp_path / "emptystore"),
            CrawlConfig(n_shards=4),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{h}/"])
        stats = drv.run(2)

        assert stats[0].fetched_ok == 1  # the seed page itself
        assert stats[1].scheduled == 0  # idle round over empty frontier
        assert stats[1].fetched_ok == 0
        front = drv.store.read("frontier")
        assert front.count() == 0 and "url" in front.columns
    finally:
        srv.shutdown()


def test_fetch_one_redirect_policy(server):
    """Reference redirect parity (httpDownload.h:108-133): a 301
    follows exactly one hop (absolute or relative Location); a second
    301 in the chain is a failure reporting 301; a 302 is a plain
    non-2xx failure (the reference has no 3xx arm and would index the
    stub body — deliberately not replicated; documented in
    fetch_one)."""
    st, ct, body = HF.fetch_one(f"{server}/moved")
    assert st == 200 and "fetched world" in body
    st, _, body = HF.fetch_one(f"{server}/movedrel")
    assert st == 200 and "fetched world" in body
    st, _, body = HF.fetch_one(f"{server}/hop1")
    assert st == 301 and body == ""
    st, _, body = HF.fetch_one(f"{server}/found")
    assert st == 302 and body == ""


def test_cli_resume_adopts_pinned_http_adapter(spark, tmp_path, capsys):
    """`run_crawl.py --resume` without --http on a store that was
    crawled over HTTP must adopt the store's pinned adapter (the same
    way it adopts the pinned shard/bloom config) instead of refusing
    with an adapter-switch error; --http on resume still works too."""
    import run_crawl

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _AllGatedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        store = str(tmp_path / "clistore")
        rc = run_crawl.main(
            [
                "--store", store, "--rounds", "1", "--http",
                "--seed-url", f"http://127.0.0.1:{port}/",
                "--n-shards", "4", "--fetch-timeout", "3",
            ],
            spark=spark,
        )
        assert rc == 0
        # resume WITHOUT --http: must adopt the pinned http adapter
        rc = run_crawl.main(
            ["--store", store, "--rounds", "1", "--resume"], spark=spark
        )
        assert rc == 0
        err = capsys.readouterr().err
        assert "pinned 'http' fetch adapter" in err
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# Crawl-delay: per-host politeness override from robots.txt
# ---------------------------------------------------------------------------


class _DelayHandler(BaseHTTPRequestHandler):
    requests: list

    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        port = self.server.server_address[1]
        self.requests.append(self.path)
        if self.path == "/robots.txt":
            self._send(b"User-agent: *\nCrawl-delay: 2\n", "text/plain")
        elif self.path in ("/", ""):
            self._send(
                (
                    "<html><head><title>Root</title></head><body>"
                    f'<a href="http://127.0.0.1:{port}/a">a</a>'
                    f'<a href="http://127.0.0.1:{port}/b">b</a>'
                    "</body></html>"
                ).encode()
            )
        else:
            self._send(SIMPLE.format(t="Leaf").encode())

    def log_message(self, *a):
        pass


def test_crawl_delay_enforced(spark, tmp_path):
    """A robots `Crawl-delay: 2` stretches the host's politeness clock
    beyond the global window (politeness_rounds=1): successive fetches
    of the host land >= 2 rounds apart, and the parsed delay is cached
    in hosts.crawl_delay."""
    from searchengine_spark.config import CrawlConfig
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    reqs: list = []
    handler = type("_H", (_DelayHandler,), {"requests": reqs})
    srv = ThreadingHTTPServer(("", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        host = f"127.0.0.1:{port}"
        drv = CrawlDriver(
            spark,
            str(tmp_path / "store"),
            CrawlConfig(n_shards=4, politeness_rounds=1),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{host}/"])
        drv.run(6)
        docs = drv.store.read("docs").select("url", "round").collect()
        rounds = sorted(r["round"] for r in docs)
        # three pages (/ -> /a, /b), each fetch >= 2 rounds after the
        # previous: 0, 2, 4 exactly under the delay-2 clock
        assert len(docs) == 3
        assert rounds == [0, 2, 4]
        hosts = {r["host"]: r for r in drv.store.read("hosts").collect()}
        assert hosts[host]["crawl_delay"] == 2
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# sitemap discovery (robots 'Sitemap:' -> <loc> -> frontier ingestion)
# ---------------------------------------------------------------------------


class _SitemapHandler(BaseHTTPRequestHandler):
    requests: list

    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        port = self.server.server_address[1]
        self.requests.append(self.path)
        if self.path == "/robots.txt":
            self._send(
                (
                    "User-agent: *\nDisallow: /private\n"
                    f"Sitemap: http://127.0.0.1:{port}/sm-index.xml\n"
                ).encode(),
                "text/plain",
            )
        elif self.path == "/sm-index.xml":
            self._send(
                (
                    '<?xml version="1.0"?><sitemapindex>'
                    f"<sitemap><loc>http://127.0.0.1:{port}/sm-1.xml</loc>"
                    "</sitemap></sitemapindex>"
                ).encode(),
                "application/xml",
            )
        elif self.path == "/sm-1.xml":
            self._send(
                (
                    '<?xml version="1.0"?><urlset>'
                    f"<loc> http://127.0.0.1:{port}/unlinked-a </loc>"
                    f"<loc>http://127.0.0.1:{port}/unlinked-b&amp;x</loc>"
                    f"<loc>http://127.0.0.1:{port}/private/x</loc>"
                    "</urlset>"
                ).encode(),
                "application/xml",
            )
        elif self.path in ("/", ""):
            # the root page links NOWHERE: sitemap ingestion is the only
            # way the unlinked pages can be discovered
            self._send(b"<html><head><title>Root</title></head><body>r</body></html>")
        else:
            self._send(SIMPLE.format(t="Leaf").encode())

    def log_message(self, *a):
        pass


def test_parse_sitemap_decls_and_parse_sitemap():
    from searchengine_spark.corpus import parse_sitemap_decls

    txt = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://h/s1.xml\n"
        "sitemap: http://h/s2.xml # comment\n"
        "Sitemap: http://h/s1.xml\n"  # dup dropped
    )
    assert parse_sitemap_decls(txt) == ["http://h/s1.xml", "http://h/s2.xml"]
    assert parse_sitemap_decls("User-agent: *\nDisallow: /\n") == []

    kind, locs = HF.parse_sitemap(
        "<urlset><loc> http://h/a </loc><loc>http://h/b&amp;c</loc></urlset>"
    )
    assert kind == "urlset"
    assert locs == ["http://h/a", "http://h/b&c"]
    kind, locs = HF.parse_sitemap(
        "<sitemapindex><sitemap><loc>http://h/s.xml</loc></sitemap></sitemapindex>"
    )
    assert kind == "index"
    assert locs == ["http://h/s.xml"]


def test_sitemap_ingest_end_to_end(spark, tmp_path):
    """The full discovery path: robots declares a sitemapindex, the
    index points at a urlset, its pages are UNLINKED (link-following
    can never reach them); ingest_sitemaps admits the allowed ones
    into the frontier (robots gate drops /private/x), later rounds
    fetch them, and a re-ingest is a seen-dedup no-op."""
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    reqs: list = []
    handler = type("_H", (_SitemapHandler,), {"requests": reqs})
    srv = ThreadingHTTPServer(("", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        host = f"127.0.0.1:{port}"
        drv = CrawlDriver(
            spark,
            str(tmp_path / "store"),
            CrawlConfig(n_shards=4, politeness_rounds=1),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{host}/"])
        drv.run(1)  # fetches the linkless root; frontier drains
        out = drv.ingest_sitemaps()
        assert out["sitemap_urls"] == 3
        assert out["candidates"] == 2  # /private/x robots-gated
        assert out["new_urls"] == 2

        drv.run(3, resume=True)  # politeness: one fetch/round
        urls = {r["url"] for r in drv.store.read("docs").select("url").collect()}
        assert f"{host}/unlinked-a" in urls
        assert any(u.startswith(f"{host}/unlinked-b") for u in urls)
        assert not any("/private" in u for u in urls)
        assert not any("/private" in p for p in reqs)

        again = drv.ingest_sitemaps()
        assert again["new_urls"] == 0  # seen-dedup: ingest is idempotent
    finally:
        srv.shutdown()


def test_sitemap_ingest_refused_without_surface(spark, tmp_path):
    from searchengine_spark.plans.crawl import CrawlDriver

    d = CrawlDriver(spark, str(tmp_path / "s"), CrawlConfig(n_shards=4))
    d.seed(["http://host0.com/p/0/"])
    with pytest.raises(ValueError, match="sitemap surface"):
        d.ingest_sitemaps()


def test_parse_sitemap_entries_lastmod():
    """Entry-level lastmod extraction: per-<url> pairing, W3C datetime
    truncated to the date, malformed dates treated as absent, the
    bare-<loc> fallback, index kind."""
    kind, ents = HF.parse_sitemap_entries(
        "<urlset>"
        "<url><loc>http://h/a</loc><lastmod>2026-08-15</lastmod></url>"
        "<url><loc>http://h/b</loc>"
        "<lastmod>2026-02-01T10:30:00+00:00</lastmod></url>"
        "<url><loc>http://h/c</loc></url>"
        "<url><loc>http://h/d</loc><lastmod>yesterday</lastmod></url>"
        "<loc>http://h/bare</loc>"
        "</urlset>"
    )
    assert kind == "urlset"
    assert ents == [
        ("http://h/a", "2026-08-15"),
        ("http://h/b", "2026-02-01"),
        ("http://h/c", None),
        ("http://h/d", None),
        ("http://h/bare", None),
    ]
    kind, ents = HF.parse_sitemap_entries(
        "<sitemapindex><sitemap><loc>http://h/s.xml</loc>"
        "<lastmod>2026-01-01</lastmod></sitemap></sitemapindex>"
    )
    assert kind == "index"
    assert ents == [("http://h/s.xml", "2026-01-01")]


class _LmSitemapHandler(BaseHTTPRequestHandler):
    """Index with a STALE child (lastmod 2026-01-01) and a FRESH child
    (2026-08-15); the fresh child carries a hot page, a cold page and
    a no-lastmod page."""

    requests: list

    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        port = self.server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        self.requests.append(self.path)
        if self.path == "/robots.txt":
            self._send(
                f"User-agent: *\nSitemap: {base}/sm-lm-index.xml\n".encode(),
                "text/plain",
            )
        elif self.path == "/sm-lm-index.xml":
            self._send(
                (
                    '<?xml version="1.0"?><sitemapindex>'
                    f"<sitemap><loc>{base}/sm-old.xml</loc>"
                    "<lastmod>2026-01-01</lastmod></sitemap>"
                    f"<sitemap><loc>{base}/sm-new.xml</loc>"
                    "<lastmod>2026-08-15</lastmod></sitemap>"
                    "</sitemapindex>"
                ).encode(),
                "application/xml",
            )
        elif self.path == "/sm-old.xml":
            self._send(
                (
                    '<?xml version="1.0"?><urlset>'
                    f"<url><loc>{base}/stale-page</loc>"
                    "<lastmod>2026-01-02</lastmod></url></urlset>"
                ).encode(),
                "application/xml",
            )
        elif self.path == "/sm-new.xml":
            self._send(
                (
                    '<?xml version="1.0"?><urlset>'
                    f"<url><loc>{base}/page-hot</loc>"
                    "<lastmod>2026-08-15</lastmod></url>"
                    f"<url><loc>{base}/page-cold</loc>"
                    "<lastmod>2026-02-01</lastmod></url>"
                    f"<url><loc>{base}/page-nolm</loc></url>"
                    "</urlset>"
                ).encode(),
                "application/xml",
            )
        elif self.path in ("/", ""):
            self._send(b"<html><head><title>R</title></head><body>r</body></html>")
        else:
            self._send(SIMPLE.format(t="Leaf").encode())

    def log_message(self, *a):
        pass


def test_sitemap_lastmod_reingest(spark, tmp_path):
    """Lastmod-aware re-ingest: a plain ingest admits everything; a
    later changed-since pass (1) skips fetching the stale index child
    entirely, (2) requeues EXACTLY the seen page whose lastmod is
    newer than the date (not the cold page, not the no-lastmod page),
    (3) is pending-safe (second pass requeues nothing while the row
    sits in the frontier), and the requeued page is then re-fetched —
    two docs rows, seen set untouched."""
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    reqs: list = []
    handler = type("_H", (_LmSitemapHandler,), {"requests": reqs})
    srv = ThreadingHTTPServer(("", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        host = f"127.0.0.1:{port}"
        drv = CrawlDriver(
            spark,
            str(tmp_path / "store"),
            CrawlConfig(n_shards=4, politeness_rounds=1),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{host}/"])
        drv.run(1)
        out = drv.ingest_sitemaps()  # plain: admits all 4 pages
        assert out["new_urls"] == 4
        drv.run(4, resume=True)  # politeness 1/host/round: drain them
        docs_urls = [
            r["url"] for r in drv.store.read("docs").select("url").collect()
        ]
        assert f"{host}/page-hot" in docs_urls
        n_seen_before = drv.store.read("seen").count()

        n_old_fetches = reqs.count("/sm-old.xml")
        out2 = drv.ingest_sitemaps(changed_since="2026-06-01")
        assert out2["requeued"] == 1  # page-hot only
        assert out2["new_urls"] == 0  # everything already seen
        # stale index child not re-fetched by the changed-since pass
        assert reqs.count("/sm-old.xml") == n_old_fetches
        # pending-safe: the row is in the frontier, a second pass no-ops
        out3 = drv.ingest_sitemaps(changed_since="2026-06-01")
        assert out3["requeued"] == 0

        drv.run(1, resume=True)  # the one pending row: page-hot again
        docs_urls = [
            r["url"] for r in drv.store.read("docs").select("url").collect()
        ]
        assert docs_urls.count(f"{host}/page-hot") == 2
        assert docs_urls.count(f"{host}/page-cold") == 1
        assert docs_urls.count(f"{host}/page-nolm") == 1
        assert drv.store.read("seen").count() == n_seen_before

        # nothing newer than the far-future date -> no requeue
        out4 = drv.ingest_sitemaps(changed_since="2026-12-31")
        assert out4["requeued"] == 0
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# Anchor-boosted search over an HTTP-crawled store
# ---------------------------------------------------------------------------

ANCHOR_ROOT = (
    "<html><head><title>Root</title></head><body>"
    "<p>plain words about zebra stripes</p>"
    '<a href="/target">zebra insights</a>'
    '<p>unrelated trailer</p>'
    '<a href="/other">other page</a>'
    "</body></html>"
)
ANCHOR_TARGET = (
    "<html><head><title>Target Page</title></head><body>"
    "<p>completely unrelated content here</p></body></html>"
)
ANCHOR_OTHER = (
    "<html><head><title>Other</title></head><body>"
    "<p>nothing special</p></body></html>"
)


class _AnchorHandler(BaseHTTPRequestHandler):
    def _send(self, body: bytes, ctype: str = "text/html; charset=utf-8"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path in ("/", ""):
            self._send(ANCHOR_ROOT.encode())
        elif self.path == "/target":
            self._send(ANCHOR_TARGET.encode())
        elif self.path == "/other":
            self._send(ANCHOR_OTHER.encode())
        else:
            self.send_error(404)

    def log_message(self, *a):
        pass


def test_anchor_boosted_search_over_http_store(spark, tmp_path, capsys):
    """The anchor file's raison d'être, end to end over real HTTP: the
    term 'zebra' appears on the ROOT page (body + the anchor text of
    its link to /target) but NEVER on /target itself — plain console
    search can't return /target; anchor-boosted search surfaces it
    through what its neighbor calls it. Raw hrefs resolve against the
    page URL (the store's pinned http adapter drives
    resolve_raw_hrefs)."""
    import run_search
    from searchengine_spark.plans.crawl import CrawlDriver
    from searchengine_spark.plans.index_pipeline import SearchService
    from searchengine_spark.sources.http_fetch import HttpFetchAdapter

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _AnchorHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        host = f"127.0.0.1:{port}"
        store = str(tmp_path / "anchorstore")
        drv = CrawlDriver(
            spark,
            store,
            CrawlConfig(n_shards=4, politeness_rounds=1),
            adapter=HttpFetchAdapter(timeout_s=3.0, pool_size=4),
        )
        drv.seed([f"http://{host}/"])
        drv.run(3)
        urls = {r["url"] for r in drv.store.read("docs").select("url").collect()}
        assert f"{host}/target" in urls, urls

        svc = SearchService(drv.store)
        # plain console search: /target has no on-page 'zebra'
        plain = {r["url"] for r in svc.search("zebra", k=10).collect()}
        assert f"{host}/target" not in plain
        assert host in plain  # the root page says zebra in its body

        fused = svc.search_anchors("zebra", k=10).collect()
        by_url = {r["url"]: r for r in fused}
        assert f"{host}/target" in by_url, fused
        tgt = by_url[f"{host}/target"]
        # anchor-only evidence: no console rank, a real anchor rank
        assert tgt["console_rank"] is None
        assert tgt["anchor_rank"] is not None
        # /other was linked but never with 'zebra' context
        assert f"{host}/other" not in by_url

        # CLI wiring: --anchors prints the fused rows
        rc = run_search.main(
            ["--store", store, "--query", "zebra", "--anchors", "--k", "5"],
            spark=spark,
        )
        assert rc == 0
        lines = [
            json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        assert any(h["url"] == f"{host}/target" for h in lines)
    finally:
        srv.shutdown()
