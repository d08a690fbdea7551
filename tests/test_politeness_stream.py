"""Stateful streaming politeness gate: streaming decisions must equal
the batch twin, and robots.txt parsing must round-trip."""

import shutil

from searchengine_spark.corpus import (
    parse_robots_txt,
    robots_state_py,
    robots_txt_of_state,
)
from searchengine_spark.streaming.politeness import (
    POLITENESS_TICKS,
    gate_requests_batch,
    gate_requests_stream,
)


def _requests(spark):
    rows = []
    for h in ("a.com", "b.com"):
        for t in (0, 5, 16, 17, 40):
            rows.append((h, f"{h}/u{t}", t))
    return spark.createDataFrame(rows, "host string, url string, tick long")


def test_batch_gate_rules(spark):
    got = gate_requests_batch(_requests(spark))
    a = got[got.host == "a.com"].sort_values("tick")
    assert list(a.decision) == ["grant", "defer", "grant", "defer", "grant"]


def test_streaming_gate_equals_batch(spark, tmp_path):
    df = _requests(spark)
    src = tmp_path / "req_stream"
    src.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "req_parquet"))
    for f in (tmp_path / "req_parquet").glob("*.parquet"):
        shutil.copy(f, src / f.name)

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        gate_requests_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("gate_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["host"], r["url"]): r["decision"]
        for r in spark.sql("SELECT * FROM gate_out").collect()
    }
    want = {
        (r.host, r.url): r.decision for r in gate_requests_batch(df).itertuples()
    }
    assert got == want
    # exactly one grant per host per politeness window
    grants = [k for k, v in got.items() if v == "grant" and k[0] == "a.com"]
    assert len(grants) == 3  # ticks 0, 16, 40 with window 15


def test_robots_roundtrip():
    for state in ("allow", "deny", "disallow:/x/"):
        assert parse_robots_txt(robots_txt_of_state(state)) == state
    assert parse_robots_txt("# empty file\n") == "allow"
    assert (
        parse_robots_txt("User-agent: other\nDisallow: /\nUser-agent: *\nDisallow: /priv\n")
        == "disallow:/priv"
    )
    # hash-derived states used by the synthetic corpus stay parseable
    for h in ("hothost.com", "host0.com", "host1.org"):
        st = robots_state_py(h)
        assert parse_robots_txt(robots_txt_of_state(st)) == st


def test_robots_multi_prefix_parse():
    """Every `User-agent: *` Disallow rule survives into the state
    (not just the first); '|' is the separator so a rule containing it
    is dropped; duplicates collapse; the inverse generator round-trips
    the multi-prefix form."""
    txt = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Disallow: /tmp/\n"
        "Disallow: /tmp/\n"          # duplicate collapses
        "Disallow: /bad|pipe\n"      # '|' cannot ride in the grammar
        "User-agent: other\n"
        "Disallow: /other-only\n"
    )
    st = parse_robots_txt(txt)
    assert st == "disallow:/private|/tmp/"
    assert parse_robots_txt(robots_txt_of_state(st)) == st


def test_robots_allow_rules_parse_and_gate():
    """RFC 9309 §2.2.2: a body mixing Allow and Disallow compiles to a
    'rules:' state gated longest-match-wins, Allow winning equal-length
    ties; Allow-only bodies are vacuous ('allow'); Disallow-only bodies
    keep the legacy states byte-for-byte; the inverse generator
    round-trips the new form."""
    from searchengine_spark.corpus import robots_rules_blocked_py

    txt = (
        "User-agent: *\n"
        "Disallow: /\n"
        "Allow: /public/\n"
        "Allow: /pub\n"
    )
    st = parse_robots_txt(txt)
    assert st == "rules:-/|+/public/|+/pub"
    assert parse_robots_txt(robots_txt_of_state(st)) == st
    # longest match wins: /public/x matches -/ (1), +/public/ (8), +/pub (4)
    assert robots_rules_blocked_py(st, "/public/x") is False
    assert robots_rules_blocked_py(st, "/pubz") is False       # +/pub beats -/
    assert robots_rules_blocked_py(st, "/private") is True     # only -/ matches
    # equal-length tie -> Allow wins
    tie = "rules:-/a|+/a"
    assert robots_rules_blocked_py(tie, "/a/x") is False
    # no matching rule -> allowed
    assert robots_rules_blocked_py("rules:-/x", "/y") is False
    # Allow-only body: nothing to override
    assert parse_robots_txt("User-agent: *\nAllow: /ok\n") == "allow"
    # Disallow-only bodies keep legacy states exactly
    assert parse_robots_txt("User-agent: *\nDisallow: /\n") == "deny"
    assert parse_robots_txt("User-agent: *\nDisallow: /p\n") == "disallow:/p"
    # legacy forms through the py twin
    assert robots_rules_blocked_py("deny", "/anything") is True
    assert robots_rules_blocked_py("allow", "/anything") is False
    assert robots_rules_blocked_py(None, "/anything") is False
    assert robots_rules_blocked_py("disallow:/a|/b", "/b/c") is True


def test_parse_crawl_delay():
    from searchengine_spark.corpus import parse_crawl_delay

    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 3\n") == 3
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2.7\n") == 2
    assert parse_crawl_delay("User-agent: *\nDisallow: /x\n") == 0
    # cap: hostile robots cannot starve the frontier
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 9999\n") == 16
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 40\n", cap=8) == 8
    # other agents' delay does not apply; last * value wins; junk -> kept
    assert parse_crawl_delay(
        "User-agent: bot\nCrawl-delay: 9\nUser-agent: *\n"
        "Crawl-delay: 1\nCrawl-delay: junk\nCrawl-delay: 4\n"
    ) == 4
    assert parse_crawl_delay("") == 0
