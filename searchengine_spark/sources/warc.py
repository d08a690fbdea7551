"""WARC (ISO 28500 / WARC/1.0) source and sink.

The reference persists fetched pages in its own content DB
(KeyValueDB.hpp:25-48 keyed storage; page payloads written by the
crawl loop, SearchEngine.cpp:662-770). The interchange format the rest
of the world uses for exactly that corpus shape is WARC — Common
Crawl, wayback machines, and most training-data pipelines speak it —
so a complete engine needs both directions:

- :func:`warc_export` — distributed sink: one ``.warc.gz`` file per
  partition, written inside ``mapInPandas`` (the same shape as any
  Spark file sink: partition → file; at cluster scale ``out_dir`` is a
  distributed filesystem path and each task writes its own object).
  Records are WARC/1.0 ``response``-style records with the payload as
  the block and engine metadata carried in custom ``X-SE-*`` headers
  (the spec permits unregistered fields).
- :func:`read_warc` — distributed source: ``binaryFile`` listing +
  ``mapInPandas`` parser, one task per file. This parallelism-per-file
  granularity is not a shortcut, it is the format's own contract:
  gzipped WARC members cannot be split mid-file, which is why Common
  Crawl ships ~10^5 files per crawl — file count IS the parallelism.
  The parser is strict Content-Length framing (headers until CRLF
  CRLF, exactly Content-Length payload bytes, CRLF CRLF terminator)
  with whole-file gzip handled by extension.

Determinism contract (what makes the oracle possible): export
partitioning is by range of the record key, record order within a file
is the sorted key order, and read-back is set-equal to the input —
pinned end-to-end by the ``warc_roundtrip`` catalog query, whose
DuckDB twin computes the same aggregates straight from the original
table (round trip ≡ identity).
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

READ_SCHEMA = (
    "warc_type string, target_uri string, record_id string, "
    "content_type string, meta map<string,string>, payload binary, "
    "src_file string"
)


def warc_record_bytes(
    warc_type: str,
    target_uri: str,
    record_id: str,
    payload: bytes,
    content_type: str = "application/octet-stream",
    meta: dict[str, str] | None = None,
) -> bytes:
    """Serialize ONE WARC/1.0 record (strict CRLF framing)."""
    out = io.BytesIO()
    out.write(WARC_VERSION + _CRLF)
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Target-URI", target_uri),
        ("WARC-Record-ID", f"<urn:se:{record_id}>"),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    for k, v in (meta or {}).items():
        headers.append((f"X-SE-{k}", str(v)))
    for k, v in headers:
        out.write(f"{k}: {v}".encode("utf-8") + _CRLF)
    out.write(_CRLF)
    out.write(payload)
    out.write(_CRLF + _CRLF)
    return out.getvalue()


def parse_warc_stream(data: bytes, src_file: str) -> Iterator[dict]:
    """Parse a (decompressed) WARC byte stream into record dicts."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record padding / stray newlines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"{src_file}: truncated WARC header at byte {pos}")
        head = data[pos:hdr_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"{src_file}: bad record marker {lines[0]!r}")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip()] = v.strip()
        try:
            length = int(fields["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"{src_file}: missing Content-Length") from e
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(f"{src_file}: truncated payload at byte {body_start}")
        rid = fields.get("WARC-Record-ID", "")
        yield {
            "warc_type": fields.get("WARC-Type", ""),
            "target_uri": fields.get("WARC-Target-URI", ""),
            "record_id": rid.removeprefix("<urn:se:").removesuffix(">"),
            "content_type": fields.get("Content-Type", ""),
            "meta": {
                k[len("X-SE-") :]: v for k, v in fields.items() if k.startswith("X-SE-")
            },
            "payload": payload,
            "src_file": src_file,
        }
        pos = body_start + length


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files -> DataFrame (one parse task per file; ``.gz``
    members decompressed whole-file, per the format's split contract)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if path.endswith(".gz"):
                    raw = gzip.decompress(raw)
                rows.extend(parse_warc_stream(raw, os.path.basename(path)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_type",
                    "target_uri",
                    "record_id",
                    "content_type",
                    "meta",
                    "payload",
                    "src_file",
                ],
            )

    return files.mapInPandas(_parse, READ_SCHEMA)


def import_warc(spark: SparkSession, path_glob: str, store) -> int:
    """Re-import WARC archives (as written by tools/export_warc.py)
    into a crawl store's ``docs`` table and commit a manifest pinning
    it — the "index a crawl archive" direction: after this,
    ``SearchService(store)`` serves the imported corpus exactly as it
    serves a crawled one (parity pinned end-to-end by
    tests/test_warc.py::test_warc_import_search_parity).

    The payload block is the span-sequence JSON (lossless post-parse
    form) and the X-SE headers carry the crawl coordinates, so the
    reconstructed docs table is row-equal to the exported one. Returns
    the number of imported docs.
    """
    from ..corpus import SPANS_SCHEMA

    parsed = read_warc(spark, path_glob)
    m = F.col("meta")
    docs = parsed.select(
        m.getItem("url_md5").alias("url_md5"),
        F.col("target_uri").alias("url"),
        m.getItem("host").alias("host"),
        m.getItem("shard").cast("int").alias("shard"),
        m.getItem("round").cast("int").alias("round"),
        m.getItem("seq_in_round").cast("int").alias("seq_in_round"),
        F.from_json(F.col("payload").cast("string"), SPANS_SCHEMA).alias("spans"),
    )
    v = store.commit("docs", docs, meta={"kind": "warc-import", "src": path_glob})
    imported = store.read("docs", v)
    n = imported.count()
    max_round = imported.agg(F.max("round")).collect()[0][0]
    store.commit_manifest(int(max_round if max_round is not None else 0), {"docs": v})
    return int(n)


def warc_export(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    uri_col: str,
    payload_col: str,
    meta_cols: list[str],
    n_files: int = 4,
    content_type: str = "text/plain; charset=utf-8",
    compress: bool = True,
) -> int:
    """Export a DataFrame as WARC files (``response`` records).

    Deterministic layout: range-partitioned and sorted by ``key_col``,
    so the SET of (file-content) bytes is reproducible run-to-run
    (file names carry a uuid — names are not part of the contract,
    content is). Payload column must be string or binary. Returns the
    number of records written.
    """
    os.makedirs(out_dir, exist_ok=True)
    # dedupe: meta_cols may repeat key/uri cols (the CLI carries url_md5
    # both as the record key and as an X-SE header); a duplicate column
    # in select() would make pandas itertuples mangle the field names
    cols = list(dict.fromkeys([key_col, uri_col, payload_col, *meta_cols]))
    prepped = (
        df.select(*cols)
        .repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        count = 0
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                payload = d[payload_col]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                buf.write(
                    warc_record_bytes(
                        "response",
                        str(d[uri_col]),
                        str(d[key_col]),
                        bytes(payload),
                        content_type=content_type,
                        meta={m: d[m] for m in meta_cols},
                    )
                )
                count += 1
        if count:
            ext = ".warc.gz" if compress else ".warc"
            name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}{ext}")
            data = buf.getvalue()
            if compress:
                # mtime=0: byte-stable gzip output for a given content
                data = gzip.compress(data, mtime=0)
            tmp = name + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.rename(tmp, name)  # atomic: readers never see partials
        yield pd.DataFrame({"n": [count]})

    written = prepped.mapInPandas(_write, "n long")
    return int(written.agg(F.sum("n")).collect()[0][0] or 0)
