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
