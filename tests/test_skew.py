"""Hot-host skew handling: the synthetic universe gives one host
(hothost.com) ~1/8 of all URLs; storage buckets must stay balanced
while host-affine operators stay correct."""

from pyspark.sql import functions as F

from searchengine_spark.config import CrawlConfig
from searchengine_spark.corpus import HOT_HOST, raw_url_expr
from searchengine_spark.operators import frontier as FR

CFG = CrawlConfig(n_shards=8)


def _cand(spark, n=4000):
    raw = spark.range(n).select(
        F.col("id").alias("doc_id"), raw_url_expr("id").alias("raw_url")
    )
    return FR.normalize_candidates(raw, CFG)


def test_hot_host_exists_and_dominates_one_shard(spark):
    cand = _cand(spark)
    per_host = {r["host"]: r["n"] for r in cand.groupBy("host").agg(F.count("*").alias("n")).collect()}
    total = sum(per_host.values())
    assert per_host[HOT_HOST] / total > 0.10  # the skew is real
    # host-affine shard: hothost lands in exactly one shard
    shards = cand.where(F.col("host") == HOT_HOST).select("shard").distinct().collect()
    assert len(shards) == 1


def test_storage_buckets_balanced_under_skew(spark):
    cand = FR.with_storage_bucket(_cand(spark), n_buckets=16)
    counts = [r["n"] for r in cand.groupBy("storage_bucket").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 16
    mean = sum(counts) / len(counts)
    assert max(counts) / mean < 1.5, counts  # hot host spread evenly


def test_scheduling_caps_hot_host_per_round(spark):
    """Politeness: hothost gets exactly 1 slot per round no matter how
    much frontier it owns."""
    cand = FR.dedup_batch(_cand(spark)).select(
        "url", "url_md5", "host", "shard", F.lit(0).alias("discovered_round")
    )
    hosts = cand.select("host").distinct().select(
        "host", F.lit(0).alias("next_allowed_round")
    )
    sched = FR.schedule_round(cand, hosts, 0, CFG)
    hot = sched.where(F.col("host") == HOT_HOST).count()
    assert hot == 1
