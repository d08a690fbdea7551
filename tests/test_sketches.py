"""KMV bottom-k sketch: merge algebra, layout independence, estimator
accuracy, and the three-form (Spark / py) equivalence."""

import math

from pyspark.sql import functions as F

from searchengine_spark.operators import sketches as SK

K = 32


def _values_df(spark, n, prefix="v", parts=4):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.lit("g").alias("grp"),
            F.concat(F.lit(prefix), F.col("id").cast("string")).alias("v"),
        )
    )


def _sketch_map(df):
    rows = df.collect()
    return {r["grp"]: (r["n_distinct"], list(r["kmv"])) for r in rows}


def test_exact_below_k(spark):
    df = _values_df(spark, 10)
    sk = SK.kmv_estimate(SK.kmv_sketch(df, ["grp"], "v", k=K), k=K)
    row = sk.collect()[0]
    assert row["n_distinct"] == 10
    assert len(row["kmv"]) == 10
    assert row["kth_min"] is None
    assert row["kmv_est"] == 10  # below k the sketch IS the distinct set


def test_layout_independent_and_duplicate_proof(spark):
    base = _values_df(spark, 500)
    dup = base.union(base).union(base)  # heavy duplication
    a = _sketch_map(SK.kmv_sketch(base.repartition(1), ["grp"], "v", k=K))
    b = _sketch_map(SK.kmv_sketch(dup.repartition(13), ["grp"], "v", k=K, n_cells=3))
    assert a == b  # same distinct set -> identical sketch, any layout


def test_merge_equals_sketch_of_union(spark):
    # overlapping halves: union cardinality < sum of halves
    left = _values_df(spark, 400)  # v0..v399
    right = (
        spark.range(200, 700)
        .select(
            F.lit("g").alias("grp"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
        )
    )  # v200..v699
    sk_l = SK.kmv_sketch(left, ["grp"], "v", k=K)
    sk_r = SK.kmv_sketch(right, ["grp"], "v", k=K)
    merged = _sketch_map(SK.kmv_merge(sk_l, sk_r, ["grp"], k=K))
    full = _sketch_map(SK.kmv_sketch(left.union(right), ["grp"], "v", k=K))
    assert merged["g"][1] == full["g"][1]  # sketch(A∪B) == merge(skA, skB)
    # disjoint group keys survive the full-outer merge
    only_l = sk_l.withColumn("grp", F.lit("left_only"))
    m2 = _sketch_map(SK.kmv_merge(only_l, sk_r, ["grp"], k=K))
    assert set(m2) == {"left_only", "g"}


def test_estimator_error_bound(spark):
    n = 5000
    k = 256
    df = _values_df(spark, n, parts=8)
    row = SK.kmv_estimate(SK.kmv_sketch(df, ["grp"], "v", k=k), k=k).collect()[0]
    rel = abs(row["kmv_est"] - n) / n
    # theory: stderr ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert rel < 4 / math.sqrt(k - 2), (row["kmv_est"], n, rel)
    assert row["n_distinct"] == n  # exact count by-product stays exact


def test_py_twin_matches_spark(spark):
    vals = [f"v{i}" for i in range(100)]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    n_py, kmv_py = SK.kmv_sketch_py(vals, k=K)
    sp = _sketch_map(SK.kmv_sketch(df, ["grp"], "v", k=K))["g"]
    assert sp == (n_py, kmv_py)
    assert SK.kmv_estimate_py(kmv_py, k=K) == (
        SK.kmv_estimate(SK.kmv_sketch(df, ["grp"], "v", k=K), k=K)
        .collect()[0]["kmv_est"]
    )
    # py merge twin agrees with itself as ground truth for chunked build
    chunks = [vals[:30], vals[30:80], vals[80:]]
    acc: list[int] = []
    for c in chunks:
        acc = SK.kmv_merge_py(acc, SK.kmv_sketch_py(c, k=K)[1], k=K)
    assert acc == kmv_py


def _pair_frame(spark, n_a, lo_b, hi_b, k):
    a = _values_df(spark, n_a)  # v0..v{n_a-1}
    b = spark.range(lo_b, hi_b).select(
        F.lit("g").alias("grp"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    sk_a = SK.kmv_sketch(a, ["grp"], "v", k=k).select(
        "grp", F.col("kmv").alias("_ka")
    )
    sk_b = SK.kmv_sketch(b, ["grp"], "v", k=k).select(
        "grp", F.col("kmv").alias("_kb")
    )
    return sk_a.join(sk_b, "grp")


def test_set_ops_exact_below_k(spark):
    # both sides below k: theta = 2^60, everything exact
    row = SK.kmv_set_estimates(_pair_frame(spark, 20, 10, 40, K), k=K).collect()[0]
    assert row["theta"] == 1 << 60
    assert row["n_and"] == row["est_intersect"] == 10  # v10..v19
    assert row["n_or"] == row["est_union"] == 40  # v0..v39
    assert row["jaccard_e6"] == 10 * 1_000_000 // 40


def test_set_ops_estimator_accuracy(spark):
    # |A|=1000 (v0..999), |B|=1000 (v500..1499): true ∩=500 ∪=1500 J=1/3
    k = 256
    row = SK.kmv_set_estimates(_pair_frame(spark, 1000, 500, 1500, k), k=k).collect()[0]
    assert abs(row["est_union"] - 1500) / 1500 < 4 / math.sqrt(k - 2)
    assert abs(row["est_intersect"] - 500) / 500 < 0.35  # ~k/3 candidates
    assert abs(row["jaccard_e6"] / 1e6 - 1 / 3) < 0.12


def test_set_ops_py_twin_matches_spark(spark):
    row = SK.kmv_set_estimates(_pair_frame(spark, 200, 100, 400, K), k=K).collect()[0]
    _, ka = SK.kmv_sketch_py([f"v{i}" for i in range(200)], k=K)
    _, kb = SK.kmv_sketch_py([f"v{i}" for i in range(100, 400)], k=K)
    want = SK.kmv_set_estimates_py(ka, kb, k=K)
    got = {f: row[f] for f in want}
    assert got == want


def _weighted_df(spark, items, parts=4):
    return spark.createDataFrame(
        [("g", str(i), int(w)) for i, w in items], "grp string, id string, w long"
    ).repartition(parts)


def test_priority_sample_exact_when_k_covers(spark):
    items = [(f"d{i}", 10 + i) for i in range(12)]
    rows = SK.priority_sample(
        _weighted_df(spark, items), ["grp"], "id", "w", k=20
    ).collect()
    assert len(rows) == 12
    assert all(r["tau_e6"] == 0 for r in rows)
    assert all(r["est_w_e6"] == r["w"] * 1_000_000 for r in rows)
    assert {r["sample_id"] for r in rows} == {i for i, _ in items}


def test_priority_sample_matches_py_twin_and_layout_free(spark):
    items = [(f"d{i}", 1 + (i * 37) % 500) for i in range(300)]
    want = SK.priority_sample_py(items, k=24)
    for parts, cells in [(1, 16), (13, 5)]:
        got = [
            (r["rank"], r["sample_id"], r["w"], r["tau_e6"], r["est_w_e6"])
            for r in SK.priority_sample(
                _weighted_df(spark, items, parts), ["grp"], "id", "w", k=24,
                n_cells=cells,
            ).orderBy("rank").collect()
        ]
        assert got == want, (parts, cells)


def test_priority_sample_heavy_item_always_kept_exact(spark):
    # one item carries half the total weight: w >= tau, kept, est exact
    items = [(f"d{i}", 10) for i in range(400)] + [("whale", 4000)]
    rows = SK.priority_sample(
        _weighted_df(spark, items), ["grp"], "id", "w", k=16
    ).collect()
    whale = [r for r in rows if r["sample_id"] == "whale"]
    assert len(whale) == 1
    # w=4000 >> tau (~10·n/k of the light tail), so est is the exact w
    assert whale[0]["est_w_e6"] == 4000 * 1_000_000
    assert whale[0]["w"] * 1_000_000 >= whale[0]["tau_e6"]


def test_priority_sample_subset_sum_estimate(spark):
    # unbiased total-weight estimator: sum over sample of max(w, tau)
    items = [(f"d{i}", 1 + (i * i) % 200) for i in range(500)]
    true_total = sum(w for _, w in items)
    rows = SK.priority_sample(
        _weighted_df(spark, items, parts=8), ["grp"], "id", "w", k=64
    ).collect()
    est_total = sum(r["est_w_e6"] for r in rows) / 1e6
    assert abs(est_total - true_total) / true_total < 0.25, (est_total, true_total)


def _value_rows(spark, vals, parts=4):
    return spark.createDataFrame(
        [("g", int(v)) for v in vals], "grp string, v long"
    ).repartition(parts)


def test_hist_quantiles_within_one_bin_of_exact(spark):
    # skewed integers on [0, 10000): quadratic ramp
    vals = [(i * i) % 10_000 for i in range(3000)]
    df = _value_rows(spark, vals)
    lo, width, n_bins = 0, 100, 100
    qs = [250_000, 500_000, 900_000, 990_000]
    h = SK.hist_sketch(df, ["grp"], "v", lo, width, n_bins)
    got = {
        r["q_e6"]: r["est"]
        for r in SK.hist_quantiles(h, ["grp"], lo, width, qs).collect()
    }
    exact = (
        df.groupBy("grp")
        .agg(
            F.expr(
                "percentile(v, array(0.25D, 0.5D, 0.9D, 0.99D))"
            ).alias("p")
        )
        .collect()[0]["p"]
    )
    for q, ex in zip(qs, exact):
        assert abs(got[q] - ex) <= width, (q, got[q], ex)
    # n_rows exact
    rows = SK.hist_quantiles(h, ["grp"], lo, width, qs).collect()
    assert all(r["n_rows"] == 3000 for r in rows)


def test_hist_merge_equals_full(spark):
    vals = [(i * 7) % 5000 for i in range(2000)]
    lo, width, n_bins = 0, 50, 100
    a = SK.hist_sketch(_value_rows(spark, vals[:800]), ["grp"], "v", lo, width, n_bins)
    b = SK.hist_sketch(_value_rows(spark, vals[800:]), ["grp"], "v", lo, width, n_bins)
    merged = {
        (r["bucket"]): r["cnt"]
        for r in SK.hist_merge(a, b, ["grp"]).collect()
    }
    full = {
        (r["bucket"]): r["cnt"]
        for r in SK.hist_sketch(
            _value_rows(spark, vals, parts=9), ["grp"], "v", lo, width, n_bins
        ).collect()
    }
    assert merged == full
    # py twin: same buckets, same interpolated quantiles
    assert SK.hist_sketch_py(vals, lo, width, n_bins) == full
    qs = [500_000, 990_000]
    want_py = SK.hist_quantiles_py(full, lo, width, qs)
    got = {
        r["q_e6"]: r["est"]
        for r in SK.hist_quantiles(
            SK.hist_merge(a, b, ["grp"]), ["grp"], lo, width, qs
        ).collect()
    }
    assert got == want_py


def test_hist_clamps_out_of_range(spark):
    df = _value_rows(spark, [-50, -1, 0, 999, 1000, 5000])
    h = {
        r["bucket"]: r["cnt"]
        for r in SK.hist_sketch(df, ["grp"], "v", 0, 100, 10).collect()
    }
    assert h[0] == 3  # -50, -1 clamp into bin 0 alongside 0
    assert h[9] == 3  # 999 lands in last bin; 1000, 5000 clamp into it


def test_plan_shape_two_shuffles_no_collect(spark):
    """The sketch is two exchanges (cell agg, group fold) and nothing
    driver-side; assert no CartesianProduct and that partial
    aggregation survives (ObjectHashAggregate for collect_set)."""
    df = _values_df(spark, 200)
    sk = SK.kmv_sketch(df, ["grp"], "v", k=K)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 3  # cell agg + group fold (+AQE reads)


# ------------------------------------------------------- heavy hitters


def _hh_stream(spec):
    """spec: {item: count} -> flat list of occurrences."""
    out = []
    for it, c in spec.items():
        out.extend([it] * c)
    return out


def test_topk_sketch_exact_kept_and_sound_bound(spark):
    """Kept items carry EXACT global counts (an item's whole count
    lives in one hash cell); every truncated item's true count is
    <= miss_bound; Spark == pure-py twin row-for-row; layout-free."""
    spec = {f"w{i}": 50 - i for i in range(20)}  # 20 items, 50..31
    rows = [("g", v) for v in _hh_stream(spec)]
    df = spark.createDataFrame(rows, "grp string, it string").repartition(7)
    t, n_cells, k = 3, 4, 8
    sk = SK.topk_sketch(df, ["grp"], "it", t=t, n_cells=n_cells)
    est = SK.topk_estimate(sk, ["grp"], k=k).collect()
    got = [(r["rank"], r["item"], r["cnt_lo"], r["cnt_hi"], r["miss_bound"]) for r in est]
    want = SK.topk_estimate_py(SK.topk_sketch_py(_hh_stream(spec), t=t, n_cells=n_cells), k=k)
    assert got == want
    kept = {r["item"] for r in est}
    mb = est[0]["miss_bound"]
    for r in est:
        assert r["cnt_lo"] == r["cnt_hi"] == spec[r["item"]]  # exact
    for it, c in spec.items():
        if it not in kept and c > mb:
            # only rank-k truncation (not cell truncation) may drop it;
            # then an equal-or-larger kept item must exist beyond rank
            assert c <= min(r["cnt_lo"] for r in est), it
    # layout independence
    est2 = SK.topk_estimate(
        SK.topk_sketch(df.repartition(13), ["grp"], "it", t=t, n_cells=n_cells),
        ["grp"], k=k,
    ).collect()
    assert [tuple(r) for r in est2] == [tuple(r) for r in est]


def test_topk_merge_soundness_and_identification(spark):
    """Merging two rounds' summaries: every kept item's true union
    count lies in [lo, hi]; any item with true count > miss_bound is
    guaranteed present; bounds add across merges."""
    spec_a = {"big": 40, "x1": 9, "x2": 8, "x3": 7, "x4": 6, "x5": 5, "y1": 4}
    spec_b = {"big": 35, "x1": 10, "z1": 9, "z2": 8, "z3": 7, "y1": 6, "x9": 2}
    true = {k: spec_a.get(k, 0) + spec_b.get(k, 0) for k in {*spec_a, *spec_b}}
    t, n_cells = 2, 2
    mk = lambda spec: SK.topk_sketch(  # noqa: E731
        spark.createDataFrame(
            [("g", v) for v in _hh_stream(spec)], "grp string, it string"
        ),
        ["grp"], "it", t=t, n_cells=n_cells,
    )
    merged = SK.topk_merge(mk(spec_a), mk(spec_b), ["grp"], t=t)
    est = SK.topk_estimate(merged, ["grp"], k=10).collect()
    assert est, "merged summary empty"
    mb = est[0]["miss_bound"]
    kept = {}
    for r in est:
        kept[r["item"]] = (r["cnt_lo"], r["cnt_hi"])
        assert r["cnt_lo"] <= true[r["item"]] <= r["cnt_hi"], r["item"]
    for it, c in true.items():
        if c > mb:
            assert it in kept, f"{it} (true {c} > miss_bound {mb}) missing"
    # the heavy item is identified with a nontrivial lower bound
    assert "big" in kept and kept["big"][0] == true["big"]
