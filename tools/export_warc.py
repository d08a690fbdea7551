"""Export a crawl store's docs snapshot as WARC/1.0 archives.

    python tools/export_warc.py --store /tmp/crawlstore --out /tmp/warc

The reference keeps fetched pages only in its private content DB
(KeyValueDB.hpp:25-48); this bridge writes the same corpus in the
interchange format crawl consumers speak (Common Crawl, training-data
pipelines): one record per fetched doc, WARC-Target-URI = the
scheduled canonical url, payload = the page's span sequence as JSON
(the engine's lossless post-parse representation — kind/text/
media_ref/offset; re-importable byte-exactly), X-SE-* headers carrying
host/round/seq/url_md5 so the crawl ordering survives the export.

Reads the docs table at the ROUND-MANIFEST-pinned version (never bare
_latest — a concurrently appending crawl can't tear the export).
Prints one JSON line: {"exported": N, "files": M, "out": DIR}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="crawl state-store root")
    ap.add_argument("--out", required=True, help="output directory for WARC files")
    ap.add_argument(
        "--n-files", type=int, default=16,
        help="target file count (= read-side parallelism; gzip WARC "
        "members cannot split mid-file)",
    )
    ap.add_argument(
        "--plain", action="store_true", help="write .warc (uncompressed)"
    )
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from searchengine_spark.session import get_spark
    from searchengine_spark.sources import warc as W
    from searchengine_spark.sources.statestore import TableStore

    own_session = spark is None
    if own_session:
        spark = get_spark("export-warc", master=args.master)

    store = TableStore(spark, args.store)
    manifest = store.read_manifest()
    if manifest is None:
        print(
            f"error: {args.store} has no committed round manifest "
            "(not a seeded crawl store)",
            file=sys.stderr,
        )
        return 2
    docs = store.read("docs", manifest["versions"]["docs"]).select(
        "url_md5",
        "url",
        F.to_json("spans").alias("payload"),
        "host",
        F.col("shard").cast("string").alias("shard"),
        F.col("round").cast("string").alias("round"),
        F.col("seq_in_round").cast("string").alias("seq_in_round"),
    )
    n = W.warc_export(
        docs,
        args.out,
        key_col="url_md5",
        uri_col="url",
        payload_col="payload",
        meta_cols=["host", "shard", "round", "seq_in_round", "url_md5"],
        n_files=args.n_files,
        content_type="application/json; charset=utf-8",
        compress=not args.plain,
    )
    pattern = "*.warc" if args.plain else "*.warc.gz"
    n_files = len(glob.glob(os.path.join(args.out, pattern)))
    print(json.dumps({"exported": n, "files": n_files, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
