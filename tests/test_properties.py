"""Property tests (hypothesis) — SURVEY.md §5.3: canonicalize
idempotence, dedup monotonicity, politeness gaps, frontier
conservation. Pure Python (oracle layer) — no Spark session needed."""

from hypothesis import given, settings, strategies as st

from searchengine_spark.config import CrawlConfig
from searchengine_spark.corpus import raw_url_py
from searchengine_spark.functions.urls import (
    canonicalize_py,
    filter_url_py,
    registered_domain_py,
    split_host_py,
    url_md5_py,
)
from searchengine_spark.oracle import simulator as sim

url_chars = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789./:-_%wцé"),
    min_size=0,
    max_size=64,
)
urls = st.one_of(
    url_chars,
    url_chars.map(lambda s: "http://" + s),
    url_chars.map(lambda s: "https://" + s),
    url_chars.map(lambda s: "//" + s),
    st.integers(min_value=0, max_value=100000).map(raw_url_py),
)


@given(urls)
@settings(max_examples=500, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_py(u)
    if c is not None and c != "":
        c2 = canonicalize_py(c)
        # https canonical forms stay fixed; http forms already stripped
        assert c2 == c, (u, c, c2)


@given(urls)
@settings(max_examples=500, deadline=None)
def test_md5_key_stable_under_www(u):
    c = canonicalize_py(u)
    if c is None or c == "" or c.startswith("https") or c.startswith("www."):
        return  # getMD5 strips exactly one leading 'www.' (SearchEngine.h:217)
    assert url_md5_py("www." + c) == url_md5_py(c)


@given(urls)
@settings(max_examples=500, deadline=None)
def test_registered_domain_is_suffix(u):
    c = canonicalize_py(u)
    if c is None or c == "":
        return
    host = split_host_py(c)
    if not host:
        return
    rd = registered_domain_py(host)
    assert host.endswith(rd)
    assert len(rd) > 0


@given(urls)
@settings(max_examples=300, deadline=None)
def test_filter_deterministic_and_total(u):
    c = canonicalize_py(u)
    if c is None:
        return
    assert filter_url_py(c) == filter_url_py(c)  # pure


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_simulator_invariants(n_seeds, politeness, rounds):
    cfg = CrawlConfig(
        n_shards=4,
        per_shard_quota=5,
        politeness_rounds=politeness,
        max_urls_per_host=7,
        max_doc=120,
    )
    seeds = [raw_url_py(i) for i in range(n_seeds)]
    state = sim.simulate(seeds, rounds, cfg)
    # politeness: per-host fetch gap >= budget
    per_host: dict[str, list[int]] = {}
    for r, _seq, _u, host in state.fetch_log:
        per_host.setdefault(host, []).append(r)
    for host, rs in per_host.items():
        for a, b in zip(rs, rs[1:]):
            assert b - a >= politeness, (host, rs)
    # conservation: every fetched doc key is in seen; frontier ∪ docs ⊆ seen
    doc_keys = {m for m, *_ in state.docs}
    assert doc_keys <= state.seen
    assert set(state.frontier) <= state.seen
    assert doc_keys.isdisjoint(set(state.frontier))
    # seen monotonicity vs a shorter run
    if rounds > 1:
        shorter = sim.simulate(seeds, rounds - 1, cfg)
        assert shorter.seen <= state.seen
        assert shorter.fetch_log == state.fetch_log[: len(shorter.fetch_log)]
