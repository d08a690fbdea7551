"""Benchmark harness.

Headline metric (BASELINE.json): frontier-schedule throughput — URLs
pushed through the full candidate pipeline (canonicalize + key + shard
via the Arrow-batched UDF -> batch dedup -> seen anti-join -> politeness
schedule) per second, on a synthetic frontier emulating the 10^10-URL
shape at small scale (hot-host skew included).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput_urls_per_sec": ...}

Scaling evidence (north_rule's N vs 4N executors, sandbox stand-in):
  python bench.py --scaling
runs the same job at local[8] and local[32] in fresh subprocesses and
writes BENCH/BASELINE.md with throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# ~2M candidate URLs at sf0.1 — the pipeline-shape stand-in for 10^10
FRONTIER_URLS_PER_SF = 20_000_000

BENCH_QUERIES = [
    "schedule_round",
    "frontier_dedup",
    "top_hosts",
    "pagerank3",
    "term_stats",
    "search_2term",
    "dedup_minhash",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_stats",
    "events_window",
    "sessionize",
]


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def frontier_pipeline_bench(spark, n_urls: int, workdir: str | None = None) -> dict:
    """The headline: candidate->schedule pipeline over n_urls raw URLs.

    Untimed setup materializes the inputs a steady-state crawl round
    reads from its state tables (raw candidate batch + seen keys);
    the timed section is one action over the full pipeline:
    parse-UDF -> batch dedup (map-side agg) -> seen anti-join ->
    politeness schedule (per-host min-struct + per-shard quota).
    """
    import tempfile

    from pyspark.sql import functions as F

    from searchengine_spark.config import CrawlConfig
    from searchengine_spark.corpus import raw_url_expr
    from searchengine_spark.operators import frontier as FR

    cfg = CrawlConfig(n_shards=256, per_shard_quota=2000, shard_salt="s0")
    parts = spark.sparkContext.defaultParallelism * 2
    workdir = workdir or tempfile.mkdtemp(prefix="bench_frontier_")

    # ---- untimed setup: materialize inputs
    raw = spark.range(0, n_urls, 1, parts).select(
        raw_url_expr(F.col("id")).alias("raw_url")
    )
    raw.write.mode("overwrite").parquet(f"{workdir}/raw")
    # steady-state seen set: even ids already crawled (~50% dup pressure)
    seen_raw = spark.range(0, n_urls, 2, parts).select(
        raw_url_expr(F.col("id")).alias("raw_url")
    )
    seen_cand = FR.normalize_candidates(seen_raw, cfg)
    seen_cand.select("url_md5", "shard").distinct().write.mode("overwrite").parquet(
        f"{workdir}/seen"
    )
    # hosts dimension is engine state (read, not derived, in a real round)
    seen_cand.select("host").distinct().select(
        "host", F.lit(0).alias("next_allowed_round")
    ).write.mode("overwrite").parquet(f"{workdir}/hosts")

    raw_in = spark.read.parquet(f"{workdir}/raw")
    seen_in = spark.read.parquet(f"{workdir}/seen")
    hosts_in = spark.read.parquet(f"{workdir}/hosts")

    # ---- timed: one job, full pipeline
    t0 = time.time()
    cand = FR.normalize_candidates(raw_in, cfg)
    deduped = FR.dedup_batch(cand)
    new = FR.dedup_seen(deduped, seen_in)
    frontier = new.select(
        "url", "url_md5", "host", "shard", F.lit(0).alias("discovered_round")
    )
    scheduled = FR.schedule_round(frontier, hosts_in, 0, cfg)
    n_scheduled = scheduled.count()
    wall = time.time() - t0
    return {
        "n_input_urls": n_urls,
        "n_scheduled": n_scheduled,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(n_urls / wall, 1),
    }


def run_suite(master: str | None = None, sf_dir: str = SF_DIR) -> dict:
    from searchengine_spark.queries import QUERIES
    from searchengine_spark.session import get_spark

    spark = get_spark("bench", master=master or f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sf = _sf_of(sf_dir)
    timings: dict[str, float] = {}

    n_urls = int(
        os.environ.get("BENCH_FRONTIER_URLS", max(200_000, int(FRONTIER_URLS_PER_SF * sf)))
    )
    fb = frontier_pipeline_bench(spark, n_urls)
    timings["frontier_pipeline"] = fb["wall_sec"]

    for name in [] if os.environ.get("BENCH_SKIP_QUERIES") else BENCH_QUERIES:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "frontier_schedule_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "throughput_urls_per_sec": fb["urls_per_sec"],
        "frontier_urls": fb["n_input_urls"],
        "frontier_scheduled": fb["n_scheduled"],
        "master": spark.sparkContext.master,
    }
    spark.stop()
    return out


def run_scaling(sf_dir: str = SF_DIR) -> None:
    """local[8] vs local[32]: same job, report throughput + efficiency."""
    results = {}
    for n in (8, 32):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(n),
            BENCH_MASTER=f"local[{n}]",
            # scaling evidence needs compute to dominate fixed job overhead
            BENCH_FRONTIER_URLS=os.environ.get("BENCH_SCALING_URLS", "8000000"),
            BENCH_SKIP_QUERIES="1",
        )
        p = subprocess.run(
            [sys.executable, __file__, "--single"],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n] = json.loads(line)
    # full suite (default sizing) for the per-query table
    p = subprocess.run(
        [sys.executable, __file__, "--single"],
        env=dict(os.environ, SPARK_GRAFT_CPUS="32", BENCH_MASTER="local[32]"),
        capture_output=True, text=True, cwd=REPO,
    )
    suite = json.loads([ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])
    t8 = results[8]["throughput_urls_per_sec"]
    t32 = results[32]["throughput_urls_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    md = f"""# BENCH — measured baseline (searchengine_spark)

Headline metric (BASELINE.json): frontier-schedule throughput — URLs
canonicalized + keyed + sharded + deduped (batch + seen anti-join) +
politeness-scheduled per second, synthetic frontier with hot-host skew,
{results[32]['frontier_urls']:,} candidate URLs, ~50% steady-state dup rate.

Cluster-size scaling criterion (north_rule: N vs 4N executors) evidenced
in-sandbox by the same job at two parallelism levels on identical input:

| parallelism | wall (s) | throughput (URLs/s) |
|---|---|---|
| local[8]  | {results[8]['queries']['frontier_pipeline']} | {t8:,.0f} |
| local[32] | {results[32]['queries']['frontier_pipeline']} | {t32:,.0f} |

**Scaling efficiency (T32/T8)/(32/8) = {eff:.3f}** (target >= 0.8).

Reference comparison: the C++ crawler reports 2,000 pages/s end-to-end on
one i7 (README.md:5) — network-bound fetching. Our comparable stage (the
schedule+dedup bookkeeping the reference does in RAM hashes) runs at
{t32:,.0f} URLs/s on 32 local cores.

Full suite timings at sf={suite['sf']} (local[32], frontier at
{suite['frontier_urls']:,} URLs -> {suite['throughput_urls_per_sec']:,.0f} URLs/s):

| query | sec |
|---|---|
"""
    for k, v in suite["queries"].items():
        md += f"| {k} | {v} |\n"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "t8_urls_per_sec": t8, "t32_urls_per_sec": t32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        master = os.environ.get("BENCH_MASTER")
        print(json.dumps(run_suite(master=master)))
