"""Partitioned bloom-filter URL-seen set (D3).

The reference holds the entire seen set as exact in-RAM MD5 hashes
(SearchEngine.h:517-522; 48 MB per 1 M pages, README.md:9). At the
10^10-URL scale of the north rule no single JVM holds that, so the
engine keeps the *exact* set as a distributed table and adds a
partitioned bloom prefilter:

* blocks table: one bitmap per host-shard, built with `applyInPandas`
  over the seen table grouped by shard (numpy bit ops, Arrow batches);
* probe: candidates test their shard's bitmap via a broadcast of the
  blocks (n_shards × bits/8 bytes — e.g. 2000 shards × 8 KiB = 16 MiB);
  bloom-negative candidates are *definitely new* and skip the exact
  anti-join; only bloom-positive candidates (true hits + false
  positives) shuffle into the exact `left_anti` against `seen`.

Exactness is therefore preserved (bloom is a prefilter, never the
verdict — SURVEY.md §7.4-3) while the shuffled side of the hot J1 join
shrinks by roughly the new-URL fraction, which at steady-state crawl is
the dominant fraction.

Bit positions come from hash60(url_md5, salt=k) so the filter is
deterministic and identical in the pure-Python oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from searchengine_spark.config import CrawlConfig


def _bit_positions(md5_hex: str, cfg: CrawlConfig) -> list[int]:
    """k independent positions from k overlapping 15-hex windows of the
    (already uniformly distributed) md5 key — no re-hashing needed."""
    return [
        int(md5_hex[4 * k : 4 * k + 15], 16) % cfg.bloom_bits_per_shard
        for k in range(cfg.bloom_hashes)
    ]


def build_bloom_blocks(seen: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """seen(url_md5, shard) -> blocks(shard, bitmap binary)."""
    nbytes = cfg.bloom_bits_per_shard // 8

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, dtype=np.uint8)
        for m in pdf["url_md5"]:
            for pos in _bit_positions(m, cfg):
                bits[pos >> 3] |= 1 << (pos & 7)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bitmap": [bits.tobytes()]}
        )

    return (
        seen.select("url_md5", "shard")
        .groupBy("shard")
        .applyInPandas(build, schema="shard int, bitmap binary")
    )


def merge_bloom_blocks(a: DataFrame, b: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """OR-merge two block tables (incremental maintenance: each round
    builds blocks only from that round's new keys and ORs them in —
    the full seen set is never rescanned)."""
    nbytes = cfg.bloom_bits_per_shard // 8

    def orall(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for bm in pdf["bitmap"]:
            acc |= np.frombuffer(bm, dtype=np.uint8)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bitmap": [acc.tobytes()]}
        )

    return (
        a.unionByName(b)
        .groupBy("shard")
        .applyInPandas(orall, schema="shard int, bitmap binary")
    )


def bloom_prefilter(
    spark: SparkSession, candidates: DataFrame, blocks: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """Tag candidates with maybe_seen; bloom-negatives are exact-new."""
    block_map = {r["shard"]: np.frombuffer(r["bitmap"], dtype=np.uint8) for r in blocks.collect()}
    bc = spark.sparkContext.broadcast(block_map)
    khashes, nbits = cfg.bloom_hashes, cfg.bloom_bits_per_shard

    @F.pandas_udf("boolean")
    def maybe_seen(md5s: pd.Series, shards: pd.Series) -> pd.Series:
        blocks_local = bc.value
        out = []
        for m, s in zip(md5s, shards):
            bm = blocks_local.get(int(s))
            if bm is None:
                out.append(False)
                continue
            hit = True
            for k in range(khashes):
                pos = int(m[4 * k : 4 * k + 15], 16) % nbits
                if not (bm[pos >> 3] >> (pos & 7)) & 1:
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", maybe_seen(F.col("url_md5"), F.col("shard")))


def dedup_seen_with_bloom(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    blocks: DataFrame,
    cfg: CrawlConfig,
) -> DataFrame:
    """Exact seen-dedup with the bloom fast path.

    result ≡ candidates ANTI JOIN seen — verified by tests; only the
    physical shape differs (bloom-negatives never shuffle).
    """
    tagged = bloom_prefilter(spark, candidates, blocks, cfg)
    definitely_new = tagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = tagged.where(F.col("maybe_seen")).drop("maybe_seen")
    cleared = suspects.join(seen.select("url_md5"), "url_md5", "left_anti")
    return definitely_new.unionByName(cleared)
