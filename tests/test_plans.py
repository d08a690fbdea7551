"""Physical-plan shape assertions — the scale contract, checked in CI:
filters and projections reach the parquet scan, small dims broadcast,
seen-dedup with bloom equals the exact anti-join."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.config import CrawlConfig
from searchengine_spark.corpus import raw_url_expr
from searchengine_spark.operators import frontier as FR
from searchengine_spark.operators.seen import build_bloom_blocks, dedup_seen_with_bloom

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_shipdate") < "1996-01-01")
        .select("l_orderkey", "l_extendedprice")
    )
    df.collect()
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: read schema restricted to the 3 referenced columns
    assert "l_comment" not in plan and "l_quantity" not in plan


def test_hosts_join_is_broadcast(spark):
    cfg = CrawlConfig(n_shards=4)
    frontier = spark.createDataFrame(
        [("a.com/1", "m1", "a.com", 0, 0)],
        "url string, url_md5 string, host string, shard int, discovered_round int",
    )
    hosts = spark.createDataFrame(
        [("a.com", 0)], "host string, next_allowed_round int"
    )
    plan = _plan(FR.schedule_round(frontier, hosts, 0, cfg))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bloom_dedup_equals_exact_antijoin(spark):
    cfg = CrawlConfig(n_shards=4, use_bloom=True, bloom_bits_per_shard=1 << 12)
    raw = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), raw_url_expr("id").alias("raw_url")
    )
    cand = FR.dedup_batch(FR.normalize_candidates(raw, cfg))
    seen = cand.where(F.col("url_md5").substr(1, 1) < "8").select("url_md5", "shard")
    blocks = build_bloom_blocks(seen, cfg)
    via_bloom = {
        r["url_md5"]
        for r in dedup_seen_with_bloom(spark, cand, seen, blocks, cfg).collect()
    }
    exact = {r["url_md5"] for r in FR.dedup_seen(cand, seen).collect()}
    assert via_bloom == exact


def test_postings_sorted_within_partitions(spark):
    from searchengine_spark.operators.index import build_postings

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = build_postings(docs)
    # verify each partition is sorted by term (the parquet min/max
    # pruning contract for term lookups)
    def check(it):
        prev = None
        for row in it:
            if prev is not None and row["term"] < prev:
                yield ("unsorted",)
            prev = row["term"]

    bad = p.rdd.mapPartitions(check).collect()
    assert bad == []


def test_aqe_and_arrow_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
