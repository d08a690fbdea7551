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


def _single_window_admission(cand, remaining, default_rem):
    """The obvious (skew-unsafe) form — the oracle's semantics."""
    from pyspark.sql import Window as W

    w = W.partitionBy("host").orderBy("url_md5", "url")
    return (
        cand.join(remaining, "host", "left")
        .withColumn("_rem", F.coalesce(F.col("_rem"), F.lit(default_rem)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("_rem"))
        .drop("_rn", "_rem")
    )


def test_admission_equals_single_window_under_skew(spark):
    """admit_host_caps must produce the row-identical set to the ranked
    window the oracle uses, with a hot host owning >30% of candidates,
    hosts over/under/at quota, a host missing from `remaining`
    (default), and a host with zero quota."""
    cand = FR.dedup_batch(_cand(spark))
    per_host = {
        r["host"]: r["n"]
        for r in cand.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    hot_n = per_host[HOT_HOST]
    assert hot_n / sum(per_host.values()) > 0.10
    rows = []
    for i, (h, n) in enumerate(sorted(per_host.items())):
        if h == HOT_HOST:
            rows.append((h, 3))  # hot host: way over quota
        elif i % 4 == 0:
            continue  # absent -> default_rem
        elif i % 4 == 1:
            rows.append((h, 0))  # zero quota: admit nothing
        elif i % 4 == 2:
            rows.append((h, n))  # exactly at quota: admit all
        else:
            rows.append((h, max(1, n - 1)))  # one short
    remaining = spark.createDataFrame(rows, "host string, _rem int")
    got = FR.admit_host_caps(cand, remaining, default_rem=2)
    want = _single_window_admission(cand, remaining, default_rem=2)
    key = lambda r: (r["host"], r["url_md5"], r["url"])  # noqa: E731
    got_rows = sorted(map(key, got.collect()))
    want_rows = sorted(map(key, want.collect()))
    assert got_rows == want_rows
    # the hot host really was capped at its quota
    assert sum(1 for r in got_rows if r[0] == HOT_HOST) == 3
    # the adaptive small-batch path (n_candidates below the threshold)
    # returns the same set through the direct single-window plan
    small = FR.admit_host_caps(
        cand, remaining, default_rem=2, n_candidates=100
    )
    small_rows = sorted(map(key, small.collect()))
    assert small_rows == want_rows
    plan = small._jdf.queryExecution().executedPlan().toString()
    wins = {
        ln.lstrip(" +-:*")
        for ln in plan.splitlines()
        if "Window [" in ln and "windowspec" in ln
    }
    assert len(wins) == 1 and not any("_salt" in w for w in wins)


def test_admission_plan_bounds_every_host_sort(spark):
    """No single-task sort of the full candidate batch: the under-quota
    branch carries NO window at all, and both windows on the over-quota
    branch are bounded — the first is salted (host, _salt), the second
    sees at most n_salts*rem survivor rows per host."""
    cand = _cand(spark, n=500)
    remaining = spark.createDataFrame([(HOT_HOST, 2)], "host string, _rem int")
    adm = FR.admit_host_caps(cand, remaining, default_rem=5)
    adm.collect()
    plan = adm._jdf.queryExecution().executedPlan().toString()
    # AQE prints the plan twice (initial + final): dedup by content
    win_lines = sorted(
        {
            ln.lstrip(" +-:*")
            for ln in plan.splitlines()
            if "Window [" in ln and "windowspec" in ln
        }
    )
    assert len(win_lines) == 2, win_lines
    salted = [ln for ln in win_lines if "_salt" in ln]
    assert len(salted) == 1, win_lines  # stage-1 partitions by (host, _salt)
    # the over-quota branch is gated on (_cnt > _rem) — AQE may fold the
    # gate into the cnt-join's residual condition instead of a Filter:
    assert any(
        "_cnt" in ln and "_rem" in ln and ("Filter" in ln or "Join" in ln)
        for ln in plan.splitlines()
    ), plan


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
