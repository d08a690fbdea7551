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
    df = FR.schedule_round(frontier, hosts, 0, cfg)
    df.collect()  # AQE picks the join strategy at runtime (no hint)
    plan = _plan(df)
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


def test_global_seq_bucket_path_exact(spark):
    """The static-range (md5-prefix bucket) form of with_global_seq —
    the shape large scheduling rounds take — produces the exact global
    (discovered_round, url_md5) rank, no sampling pass, no cache."""
    import hashlib

    rows = [(hashlib.md5(f"u{i}".encode()).hexdigest(), i % 3) for i in range(5000)]
    df = spark.createDataFrame(rows, "url_md5 string, discovered_round int")
    bucket = F.conv(F.substring("url_md5", 1, 2), 16, 10).cast("int")
    got = FR.with_global_seq(
        df, ["discovered_round", "url_md5"], "seq", bound=None, bucket=bucket
    ).collect()
    expect = {k: i + 1 for i, k in enumerate(sorted((r[1], r[0]) for r in rows))}
    assert all(
        expect[(r["discovered_round"], r["url_md5"])] == r["seq"] for r in got
    )
    # and the bounded fast path agrees on the same input
    fast = FR.with_global_seq(df, ["discovered_round", "url_md5"], "seq", bound=5000)
    assert {(r["url_md5"], r["seq"]) for r in fast.collect()} == {
        (r["url_md5"], r["seq"]) for r in got
    }


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


def test_ivf_corpus_partition_pruning(spark, tmp_path):
    """The IVF scale rule (similarity.py): the assigned corpus persists
    partitioned by cid, so an nprobe query touches only its cells —
    the cid filter must reach the scan as a PartitionFilter, pruning
    the other cells' files entirely."""
    from searchengine_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = SIM.ivf_fit(emb)
    asg = SIM.ivf_assign(
        emb.select("vec_id", SIM._q6(F.col("embedding")).alias("xi")), cents
    ).select("vec_id", "cid")
    out = str(tmp_path / "ivf_corpus")
    asg.write.partitionBy("cid").parquet(out)

    probe = spark.read.parquet(out).where(F.col("cid").isin(0, 1))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters")[1][:120]
    got_cells = {r["cid"] for r in probe.select("cid").distinct().collect()}
    assert got_cells <= {0, 1}


def test_aqe_and_arrow_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_bucketed_postings_join_avoids_shuffle(spark, tmp_path):
    """Bucketing showcase: two tables bucketed+sorted on doc_id join
    without exchanging either side (the co-located join the crawl
    store uses for repeated doc-keyed joins at scale)."""
    from searchengine_spark.operators.index import build_postings

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = build_postings(docs)
    for name in ("t_post_a", "t_post_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            p.write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .mode("overwrite")
            .saveAsTable(name)
        )
    a = spark.table("t_post_a").groupBy("doc_id").count()
    b = spark.table("t_post_b").groupBy("doc_id").count()
    j = a.join(b, "doc_id")
    j.collect()
    plan = _plan(j)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan[:2000]


def test_external_sort_flagship_at_volume(spark):
    """O1 parity with the reference's externalSortTest
    (ExternalSorter.hpp:453-470; 160M random int64s there, scaled here):
    shuffle-sort 2M pseudo-random longs, verify global sortedness and
    exact count across partition boundaries."""
    from searchengine_spark.functions.hashes import hash60

    n = 2_000_000
    df = (
        spark.range(n)
        .select(hash60(F.col("id").cast("string"), "sort").alias("v"))
        .repartitionByRange(16, "v")
        .sortWithinPartitions("v")
    )

    def check(it):
        prev = None
        cnt = 0
        first = last = None
        for row in it:
            v = row["v"]
            if first is None:
                first = v
            if prev is not None and v < prev:
                yield ("UNSORTED", 0, 0)
                return
            prev = v
            last = v
            cnt += 1
        yield ("ok", cnt, first if first is not None else 0)

    parts = df.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, r) for r in check(it)]
    ).collect()
    assert all(r[1][0] == "ok" for r in parts)
    assert sum(r[1][1] for r in parts) == n
    # cross-partition monotonicity: partition i's first >= partition i-1's first
    firsts = [r[1][2] for r in sorted(parts) if r[1][1] > 0]
    assert firsts == sorted(firsts)


def test_snapshot_zstd_roundtrip(spark, tmp_path):
    """Menu-103 parity (KeyValDB_compressTest): compress -> decompress
    -> byte-equality, here as a zstd parquet round trip of spans docs."""
    from searchengine_spark.corpus import interleaved_docs_df

    docs = interleaved_docs_df(spark, SF, max_doc=500)
    path = str(tmp_path / "docs_zstd")
    docs.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    a = sorted(str(r) for r in docs.collect())
    b = sorted(str(r) for r in back.collect())
    assert a == b


def test_term_lookup_pushdown_on_sorted_postings(spark, tmp_path):
    """S13: a term predicate over the range-partitioned, sorted postings
    parquet reaches the scan as a pushed filter (min/max stats then
    prune to the O(1) files that can contain the term — the reference's
    binary search over the sorted flat dict, PageSearcher.cpp:39-67)."""
    from searchengine_spark.operators.index import build_postings, term_lookup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "postings")
    build_postings(docs).write.mode("overwrite").parquet(path)
    p = spark.read.parquet(path)
    q = term_lookup(p, "sort", max_postings=100)
    q.collect()
    plan = _plan(q)
    assert "PushedFilters" in plan and "EqualTo(term,sort)" in plan, plan[:1500]


def test_shared_postings_barrier_survives_optimizer(spark):
    """shared_postings' fold-proof barrier must survive optimization
    (a rand()-based one is silently folded by Spark 4): the final plan
    keeps the shuffle() predicate above ONE term-keyed exchange, and
    row content is unchanged.

    SPARK-VERSION COUPLING (see CLAUDE.md known traps): exchange reuse
    depends on (a) `shuffle()` staying nondeterministic-to-Catalyst so
    per-branch pushdown can't specialize the subtree below the barrier,
    and (b) AQE reusing canonically identical exchanges. Both held up
    to Spark 4.1; a Spark upgrade can silently break either."""
    from searchengine_spark.operators import index as IX

    p = spark.createDataFrame(
        [("alpha", "d1", 1, 0.5), ("beta", "d2", 2, 0.4)],
        "term string, doc_id string, pos int, rank double",
    )
    shared = IX.shared_postings(p, n_parts=4)
    # both consumer branches must read the SAME columns: column pruning
    # reaches below the exchange, so branches with different column
    # sets get different canonical subtrees and NO reuse (CLAUDE.md
    # trap) — the real search consumers all read all four dict columns
    a = shared.groupBy("term").agg(
        F.count("doc_id").alias("count"), F.sum("rank").alias("r"),
        F.min("pos").alias("mp"),
    )
    b = shared.groupBy("doc_id").agg(
        F.count("term").alias("c2"), F.sum("rank").alias("r2"),
        F.min("pos").alias("mp2"),
    )
    out = a.join(b, a["count"] == b["c2"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "shuffle(" in plan, (
        "shared_postings' element_at(shuffle([true]),1) barrier was "
        "optimized away — this Spark version folds or strips the "
        "nondeterministic shuffle() predicate, so every consumer branch "
        "re-evaluates the dict build (search_smallterm regresses ~3x). "
        "Find a new fold-proof barrier (operators/index.py "
        "shared_postings) before trusting any multi-consumer dict plan."
    )
    # AQE prints a REUSED query stage by repeating the subtree with the
    # SAME plan_id: all term-exchange prints in the final plan must be
    # the one exchange object (distinct plan_ids = branches each built
    # their own dict)
    import re

    final = plan.split("== Initial Plan ==")[0]
    ids = set(
        re.findall(
            r"Exchange hashpartitioning\(term#\d+, \d+\), REPARTITION_BY_NUM,"
            r" \[plan_id=(\d+)\]",
            final,
        )
    )
    assert len(ids) == 1, (
        "the term-keyed exchange under shared_postings is no longer "
        "REUSED across consumer branches (AQE exchange-reuse behavior "
        f"changed — {len(ids)} distinct exchange plan_ids {ids}): each "
        "branch now pays its own dict build. Plan:\n" + final[:2000]
    )
    rows = sorted((r["term"], r["doc_id"]) for r in shared.collect())
    assert rows == [("alpha", "d1"), ("beta", "d2")]


def test_seen_filter_cogroup_matches_broadcast(spark, monkeypatch):
    """The r6 scale dispatch of the seen-filter prefilters: above the
    configured-geometry byte bound, the driver collect+broadcast of the
    block map is replaced by a shard-cogrouped probe (VERDICT r5 "What's
    wrong" #1 — the broadcast path would materialize ~12.5 GB of bitmap
    on the driver at 10^10 URLs). Both arms must tag IDENTICAL rows,
    and the exact dedup through the cogroup arm must equal the plain
    anti-join, for bloom AND cuckoo, including a shard with no block."""
    from searchengine_spark.operators import seen as SN
    from searchengine_spark.operators.cuckoo import dedup_seen_with_cuckoo

    n = 400
    cand = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("url_md5"),
        F.pmod(F.col("id"), F.lit(7)).cast("int").alias("shard"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
    )
    # seen = even ids, but shard 6 keeps NO block (missing-shard rule)
    seen = cand.where(F.expr("conv(substring(url_md5,1,2),16,10) % 2 = 0"))
    expected = sorted(
        r["url_md5"]
        for r in cand.join(seen.select("url_md5"), "url_md5", "left_anti").collect()
    )
    for flt in ("bloom", "cuckoo"):
        cfg = CrawlConfig(n_shards=7, seen_filter=flt)
        blocks = SN.build_filter_blocks(seen.where(F.col("shard") != 6), cfg)
        fn = dedup_seen_with_bloom if flt == "bloom" else dedup_seen_with_cuckoo
        monkeypatch.setenv("SEEN_FILTER_BROADCAST_MAX", str(1 << 40))
        via_bc = sorted(r["url_md5"] for r in fn(spark, cand, seen, blocks, cfg).collect())
        monkeypatch.setenv("SEEN_FILTER_BROADCAST_MAX", "0")
        via_cg = sorted(r["url_md5"] for r in fn(spark, cand, seen, blocks, cfg).collect())
        assert via_bc == via_cg == expected, flt
        # and the cogroup arm's tagged sets match the broadcast arm's
        if flt == "bloom":
            tag_cg = SN.bloom_prefilter(spark, cand, blocks, cfg)
        else:
            from searchengine_spark.operators.cuckoo import cuckoo_prefilter

            tag_cg = cuckoo_prefilter(spark, cand, blocks, cfg)
        monkeypatch.setenv("SEEN_FILTER_BROADCAST_MAX", str(1 << 40))
        if flt == "bloom":
            tag_bc = SN.bloom_prefilter(spark, cand, blocks, cfg)
        else:
            tag_bc = cuckoo_prefilter(spark, cand, blocks, cfg)
        got_cg = sorted((r["url_md5"], r["maybe_seen"]) for r in tag_cg.collect())
        got_bc = sorted((r["url_md5"], r["maybe_seen"]) for r in tag_bc.collect())
        assert got_cg == got_bc, flt
        # no block => every shard-6 candidate is a suspect in both arms
        suspects = {m for m, s in got_cg if s}
        sh6 = {r["url_md5"] for r in cand.where(F.col("shard") == 6).collect()}
        assert sh6 <= suspects, flt


def test_catalog_plan_audit_invariants(spark):
    """North-rule sweep over EVERY catalog query's physical plan:
    'vectorized pandas/Arrow UDFs (no per-row Python) throughout' means
    zero BatchEvalPython nodes anywhere, and no unbounded CartesianProduct
    may appear (tiny-side cross joins must come through as
    BroadcastNestedLoopJoin). Noise-immune counterpart to the wall-clock
    bench: tools/plan_audit.py emits the full per-query inventory."""
    import sys

    sys.path.insert(0, "tools")
    from plan_audit import audit_catalog

    audit = audit_catalog(spark, SF)
    assert len(audit) >= 50  # the whole catalog, not a subset
    row_python = {n: a["row_python"] for n, a in audit.items() if a["row_python"]}
    assert not row_python, (
        "row-at-a-time Python UDF (BatchEvalPython) found in catalog "
        f"plans — the north rule mandates Arrow-vectorized only: {row_python}"
    )
    cartesian = {n: a["cartesian"] for n, a in audit.items() if a["cartesian"]}
    assert not cartesian, f"CartesianProduct in catalog plans: {cartesian}"
