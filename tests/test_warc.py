"""WARC source/sink: record framing, parser strictness, round-trip
fidelity, deterministic export bytes."""

import gzip
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.sources import warc as W


def test_record_bytes_parse_roundtrip_unicode_and_empty():
    recs = [
        ("response", "http://a/x", "k1", "héllo wörld — §".encode("utf-8"),
         {"lang": "de", "source": "web"}),
        ("response", "http://b/y", "k2", b"", {"lang": "en", "source": "s"}),
        ("metadata", "http://c/z", "k3", b"\x00\x01\xffbinary", {}),
    ]
    blob = b"".join(
        W.warc_record_bytes(t, u, k, p, meta=m) for t, u, k, p, m in recs
    )
    parsed = list(W.parse_warc_stream(blob, "t.warc"))
    assert [(r["warc_type"], r["target_uri"], r["record_id"], r["payload"])
            for r in parsed] == [(t, u, k, p) for t, u, k, p, _ in recs]
    assert parsed[0]["meta"] == {"lang": "de", "source": "web"}
    assert parsed[1]["meta"] == {"lang": "en", "source": "s"}
    # payload containing CRLF CRLF must not confuse the framing
    tricky = b"a\r\n\r\nb" * 3
    blob2 = W.warc_record_bytes("response", "u", "k", tricky) + blob
    got = list(W.parse_warc_stream(blob2, "t2.warc"))
    assert got[0]["payload"] == tricky and len(got) == 4


def test_parser_rejects_truncated():
    rec = W.warc_record_bytes("response", "u", "k", b"0123456789")
    with pytest.raises(ValueError, match="truncated payload"):
        list(W.parse_warc_stream(rec[:-14], "t.warc"))  # cut into payload
    with pytest.raises(ValueError, match="bad record marker"):
        list(W.parse_warc_stream(b"HTTP/1.1 200\r\n\r\n", "t.warc"))


def _docs_df(spark, n=40):
    return spark.range(n).select(
        F.col("id").cast("string").alias("k"),
        F.concat(F.lit("doc://"), F.col("id").cast("string")).alias("uri"),
        F.concat(F.lit("text payload "), F.col("id").cast("string")).alias("body"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


@pytest.mark.parametrize("compress", [True, False])
def test_export_read_roundtrip(spark, tmp_path, compress):
    out = str(tmp_path / ("gz" if compress else "plain"))
    n = W.warc_export(
        _docs_df(spark), out, "k", "uri", "body", ["lang"], n_files=3,
        compress=compress,
    )
    assert n == 40
    glob = f"{out}/*.warc.gz" if compress else f"{out}/*.warc"
    back = W.read_warc(spark, glob)
    rows = back.collect()
    assert len(rows) == 40
    got = {
        (r["record_id"], r["target_uri"], bytes(r["payload"]).decode(),
         r["meta"]["lang"])
        for r in rows
    }
    want = {
        (r["k"], r["uri"], r["body"], r["lang"]) for r in _docs_df(spark).collect()
    }
    assert got == want
    assert all(r["warc_type"] == "response" for r in rows)
    # parallelism granularity = files
    assert back.select("src_file").distinct().count() == 3


def test_export_warc_cli_over_crawl_store(spark, tmp_path):
    """End-to-end: seed+run a tiny crawl, export via the CLI main, read
    the archives back, and verify the corpus and its ordering metadata
    survived losslessly (payload = span JSON; X-SE headers = crawl
    coordinates)."""
    import json as J

    from searchengine_spark.config import CrawlConfig
    from searchengine_spark.corpus import raw_url_py
    from searchengine_spark.plans.crawl import CrawlDriver
    from tools.export_warc import main as export_main

    root = str(tmp_path / "store")
    out = str(tmp_path / "warc_out")
    cfg = CrawlConfig(n_shards=2, per_shard_quota=4, max_doc=40)
    driver = CrawlDriver(spark, root, cfg)
    driver.seed([raw_url_py(i) for i in range(12)])
    driver.run(2)
    rc = export_main(
        ["--store", root, "--out", out, "--n-files", "2"], spark=spark
    )
    assert rc == 0
    back = W.read_warc(spark, f"{out}/*.warc.gz")
    docs = driver.store.read(
        "docs", driver.store.read_manifest()["versions"]["docs"]
    )
    want = {
        r["url_md5"]: (r["url"], r["host"], r["round"], r["seq_in_round"], r["sj"])
        for r in docs.select(
            "url_md5", "url", "host", "round", "seq_in_round",
            F.to_json("spans").alias("sj"),
        ).collect()
    }
    got_rows = back.collect()
    assert len(got_rows) == len(want) > 0
    for r in got_rows:
        key = r["meta"]["url_md5"]
        url, host, rnd, seq, sj = want[key]
        assert r["target_uri"] == url
        assert r["record_id"] == key
        assert (r["meta"]["host"], int(r["meta"]["round"]),
                int(r["meta"]["seq_in_round"])) == (host, rnd, seq)
        payload = bytes(r["payload"]).decode("utf-8")
        assert payload == sj
        J.loads(payload)  # re-importable spans JSON

    # non-store path: clean exit 2, nothing written
    rc2 = export_main(
        ["--store", str(tmp_path / "nope"), "--out", str(tmp_path / "w2")],
        spark=spark,
    )
    assert rc2 == 2

    # ---- import direction: WARC -> fresh store -> search parity ----
    from searchengine_spark.plans.index_pipeline import SearchService
    from searchengine_spark.sources.statestore import TableStore

    store_b = TableStore(spark, str(tmp_path / "store_b"))
    n_imported = W.import_warc(spark, f"{out}/*.warc.gz", store_b)
    assert n_imported == len(want)
    # reconstructed docs table row-equal to the exported snapshot
    cols = ["url_md5", "url", "host", "shard", "round", "seq_in_round"]
    a_rows = {tuple(r) for r in docs.select(*cols, F.to_json("spans")).collect()}
    b_rows = {
        tuple(r)
        for r in store_b.read("docs").select(*cols, F.to_json("spans")).collect()
    }
    assert a_rows == b_rows

    svc_a = SearchService(driver.store)
    svc_a.refresh()
    svc_b = SearchService(store_b)
    svc_b.refresh()
    q = "page body"
    res_a = [tuple(r) for r in svc_a.search(q, k=5).collect()]
    res_b = [tuple(r) for r in svc_b.search(q, k=5).collect()]
    assert res_a == res_b and len(res_a) > 0


def test_export_bytes_deterministic(spark, tmp_path):
    def content_set(d):
        out = set()
        for f in os.listdir(d):
            data = open(os.path.join(d, f), "rb").read()
            out.add(hashlib.md5(gzip.decompress(data)).hexdigest())
        return out

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    W.warc_export(_docs_df(spark), a, "k", "uri", "body", ["lang"], n_files=3)
    W.warc_export(_docs_df(spark).repartition(7), b, "k", "uri", "body", ["lang"],
                  n_files=3)
    assert content_set(a) == content_set(b)  # layout-independent file contents
