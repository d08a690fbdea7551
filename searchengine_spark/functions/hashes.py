"""Portable deterministic hashing used across the engine.

The reference keys everything on raw 16-byte MD5 (md5.h in the reference,
RSA reference implementation; key type KeyValueDB.hpp:25-48) and derives
its frontier shard from an xor-fold of the two 64-bit MD5 halves
(SearchEngine.h:716-717).

We keep MD5 as the identity key (`F.md5` hex — matches DuckDB `md5()`
byte-for-byte, which is what makes the correctness oracle possible) and
define a *portable* 60-bit integer hash: the first 15 hex chars of the MD5
digest parsed base-16. 60 bits fits a signed 64-bit long in both engines,
so `hash60(x)` is bit-identical in Spark SQL and DuckDB SQL — every shard
assignment, salt, minhash, simhash and LSH bucket in this repo derives
from it and is therefore oracle-checkable.

At cluster scale, xxhash64 would be marginally faster than md5; the
engine centralizes the choice here so swapping is a one-line change.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

HASH60_MASK = (1 << 60) - 1


def hash60(col: Column | str, salt: str | None = None) -> Column:
    """Deterministic 60-bit non-negative integer hash of a string column.

    Spark:  conv(substr(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt), F.lit("|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB-SQL twin of :func:`hash60` (same bits)."""
    if salt is not None:
        expr = f"'{salt}' || '|' || ({expr})"
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def hash60_py(s: str, salt: str | None = None) -> int:
    """Pure-Python twin (for the oracle simulator and pandas UDFs)."""
    if salt is not None:
        s = f"{salt}|{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_py(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()
