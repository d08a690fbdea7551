"""Mergeable KMV (bottom-k) distinct-cardinality sketch.

The reference engine answers "how many distinct URLs / hosts have we
seen" EXACTLY, by construction: every key lives in its KeyValDB seen
set (KeyValueDB.hpp:25-48) and the counters in SearchEngine.h are
incremented on first insert. That is the right design for one box and
10^8 keys; at 100 TB / 10^12 keys an exact distinct per dimension is a
full shuffle of every distinct key — the classic scale wall.

The KMV (k-minimum-values, a.k.a. bottom-k) sketch replaces that with
a fixed-size, MERGEABLE summary: keep the k smallest distinct values
of a uniform hash of the key. Cardinality estimate (Bar-Yossef et al.
2002; Beyer et al. SIGMOD'07 "On synopses for distinct-value
estimation"):

    n̂ = (k-1) / U_(k)          with U_(k) = kth smallest hash / 2^60

Relative error ~ 1/sqrt(k-2). Mergeability is exact and closed:
sketch(A ∪ B) = bottom-k(sketch(A) ∪ sketch(B)) — which is what a
1000-executor cluster (partial per executor, merge at the end) and an
incremental crawl (merge yesterday's sketch with today's delta) both
need. Unlike HLL the sketch state is plain `array<bigint>`, so the
DuckDB oracle can reproduce it bit-for-bit from the shared `hash60`.

Spark shape (scale-first):
- ONE wide shuffle keyed (group, h mod n_cells) with map-side partial
  `collect_set` — the hash-space partitioning by `h mod n_cells` means
  a value can only ever collide with itself inside one cell, so no
  cross-cell dedup is needed and per-reduce-cell memory is bounded by
  distinct/n_cells (pick n_cells ~ distinct_upper / 10^6 at scale).
- A second TINY shuffle (n_cells rows per group, each ≤ k longs) folds
  cells into the final bottom-k.
- Exact n_distinct falls out for free as sum of cell set sizes (it is
  the same number the reference's counters hold, modulo md5 collisions
  at ~2^-30 for 10^9 keys — documented, not hidden).

Three-form discipline: the sketch is pure `hash60` + order statistics,
so the DuckDB twin (row_number window) and the pure-Python twin
(`kmv_sketch_py`) are row-equal with the Spark form by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashes import HASH60_MASK, hash60, hash60_py

TWO60 = float(1 << 60)  # exactly representable: 1152921504606846976.0

DEFAULT_K = 64
DEFAULT_CELLS = 16


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value: Column | str,
    k: int = DEFAULT_K,
    n_cells: int = DEFAULT_CELLS,
) -> DataFrame:
    """Per-group bottom-k sketch over ``hash60(value)``.

    Returns ``group_cols + [n_distinct: long, kmv: array<long>]`` where
    ``kmv`` is the ascending-sorted k smallest distinct hashes (shorter
    than k iff the group has fewer than k distinct values). The result
    is independent of input partitioning/layout (pinned by
    tests/test_sketches.py) — bottom-k of a set is layout-free.
    """
    h = hash60(F.col(value) if isinstance(value, str) else value).alias("_h")
    cells = (
        df.select(*group_cols, h)
        .groupBy(*group_cols, F.pmod(F.col("_h"), F.lit(n_cells)).alias("_cell"))
        .agg(F.array_sort(F.collect_set("_h")).alias("_set"))
        .select(
            *group_cols,
            F.size("_set").alias("_cell_n"),
            F.slice("_set", 1, k).alias("_ks"),
        )
    )
    return cells.groupBy(*group_cols).agg(
        F.sum("_cell_n").cast("long").alias("n_distinct"),
        F.slice(F.array_sort(F.flatten(F.collect_list("_ks"))), 1, k).alias("kmv"),
    )


def kmv_estimate(sketch: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Attach ``kth_min`` (null below k) and the integer estimate
    ``kmv_est`` = floor((k-1)·2^60 / kth) — floor, not round, because
    floor of an identical IEEE double is engine-portable by definition
    while round() at a .5 ulp boundary is luck (CLAUDE.md float rule).
    Groups with fewer than k distinct values report the exact count.
    """
    below = F.size("kmv") < k
    kth = F.element_at("kmv", k)
    est = F.floor(F.lit(float(k - 1)) * F.lit(TWO60) / kth.cast("double")).cast("long")
    return sketch.select(
        "*",
        F.when(below, F.lit(None).cast("long")).otherwise(kth).alias("kth_min"),
        F.when(below, F.col("n_distinct")).otherwise(est).alias("kmv_est"),
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Exact sketch union: full-outer on the group key, concat + sort +
    slice. ``n_distinct`` does NOT merge exactly (the halves may share
    values), so the merged frame carries only the sketch columns —
    estimate via :func:`kmv_estimate` (which then uses ``size(kmv)`` as
    the below-k exact count, correct because below k the sketch IS the
    distinct set).
    """
    pa = a.select(*group_cols, F.col("kmv").alias("_ka"))
    pb = b.select(*group_cols, F.col("kmv").alias("_kb"))
    merged = F.slice(
        F.array_sort(
            F.array_union(
                F.coalesce("_ka", F.array().cast("array<long>")),
                F.coalesce("_kb", F.array().cast("array<long>")),
            )
        ),
        1,
        k,
    )
    return (
        pa.join(pb, group_cols, "full_outer")
        .select(*group_cols, merged.alias("kmv"))
        .withColumn("n_distinct", F.size("kmv").cast("long"))
        .select(*group_cols, "n_distinct", "kmv")
    )


def kmv_set_estimates(joined: DataFrame, ka: str = "_ka", kb: str = "_kb", k: int = DEFAULT_K) -> DataFrame:
    """Theta-style set-operation estimates from TWO sketches per row.

    ``joined`` holds two sketch arrays (columns ``ka``/``kb``); attaches

    - ``theta``: min of the two kth-minima (2^60 when a side is below k
      — that side's sketch is its full distinct set, so its theta is
      the whole hash space);
    - ``n_and`` / ``n_or``: sketch members below theta present in both
      / either. Sound because a sketch contains ALL of its set's hashes
      below its own theta ≥ theta, so below theta the sketches are
      complete — intersection/union there is exact, not sampled twice;
    - ``est_intersect`` / ``est_union`` = floor(n·2^60/theta) — the
      theta estimator n/θ_norm; collapses to the exact count when both
      sides are below k (theta = 2^60), and to the KMV (k-1)/U_(k)
      estimator for the union when theta is a kth min;
    - ``jaccard_e6`` = (n_and·10^6) div n_or — all-integer, so
      cross-engine parity is exact by construction.

    This is what "how contaminated is corpus B with corpus A" costs at
    100 TB: two fixed-size sketches and a per-group array op — no join
    between the corpora.
    """
    top = F.lit(1 << 60)
    theta = F.least(
        F.coalesce(F.element_at(ka, k), top),
        F.coalesce(F.element_at(kb, k), top),
    )
    j = joined.withColumn("theta", theta)
    below = lambda arr: F.filter(arr, lambda x: x < F.col("theta"))  # noqa: E731
    j = j.withColumn(
        "n_and", F.size(below(F.array_intersect(ka, kb))).cast("long")
    ).withColumn("n_or", F.size(below(F.array_union(ka, kb))).cast("long"))
    est = lambda n: (  # noqa: E731
        F.floor(F.col(n).cast("double") * F.lit(TWO60) / F.col("theta").cast("double"))
        .cast("long")
    )
    return (
        j.withColumn("est_intersect", est("n_and"))
        .withColumn("est_union", est("n_or"))
        .withColumn(
            "jaccard_e6",
            F.when(F.col("n_or") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("(n_and * 1000000) div n_or")
            ),
        )
    )


# ------------------------------------------------------ priority sampling


def priority_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int = DEFAULT_K,
    n_cells: int = DEFAULT_CELLS,
) -> DataFrame:
    """Deterministic priority sampling (Duffield-Lund-Thorup, JACM'07):
    a fixed-size weight-sensitive sample with UNBIASED subset-sum
    estimators — the third member of the mergeable-summary family
    (distinct → KMV, quantiles → histogram, weighted totals → this).

    priority q_i = w_i / u_i with u_i = (hash60(id)+1)/2^60; keep the k
    largest priorities per group; τ = (k+1)-th priority (0 when the
    group fits entirely). For ANY subset S of kept items,
    E[Σ max(w_i, τ)] = Σ_{i∈S_true} w_i — estimate per-source bytes,
    per-domain token counts, etc. of a 100 TB corpus from k rows.
    Heavy items (w ≥ τ) are ALWAYS kept and reported exactly.

    Spark shape mirrors kmv_sketch: per-(group, h mod n_cells) partial
    top-(k+1) via one map-side-combined collect_list (cells partition
    the id space, so cell tops are disjoint and fold exactly), then a
    tiny per-group fold. Sorting uses struct(-q, id, w) ascending ≡
    (q DESC, id ASC): negation of a double is exact, so the order — and
    therefore the sample — is bit-identical in the DuckDB twin's
    row_number form. All OUTPUT columns are integers (τ and estimates
    in e6 fixed-point, floored) so oracle value-hashing never touches a
    float. Merge = top-(k+1) of the union of two samples (priorities
    kept in the rows), closed like the other two sketches.
    """
    h = hash60(F.col(id_col).cast("string"), "prio")
    q = F.col(weight_col).cast("double") / (
        (h + F.lit(1)).cast("double") / F.lit(TWO60)
    )
    base = df.select(
        *group_cols,
        F.col(id_col).cast("string").alias("_id"),
        F.col(weight_col).cast("long").alias("_w"),
        q.alias("_q"),
        h.alias("_h"),
    )
    item = F.struct(
        (-F.col("_q")).alias("nq"), F.col("_id").alias("id"), F.col("_w").alias("w")
    )
    cells = base.groupBy(
        *group_cols, F.pmod(F.col("_h"), F.lit(n_cells)).alias("_cell")
    ).agg(F.slice(F.array_sort(F.collect_list(item)), 1, k + 1).alias("_top"))
    folded = cells.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_top"))), 1, k + 1).alias(
            "_top"
        )
    )
    tau_e6 = (
        F.when(
            F.size("_top") == k + 1,
            F.floor(-F.element_at("_top", k + 1).getField("nq") * 1_000_000),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    out = folded.withColumn("tau_e6", tau_e6).select(
        *group_cols,
        "tau_e6",
        F.posexplode(F.slice("_top", 1, k)).alias("_pos", "_item"),
    )
    return out.select(
        *group_cols,
        (F.col("_pos") + 1).cast("long").alias("rank"),
        F.col("_item.id").alias("sample_id"),
        F.col("_item.w").alias("w"),
        "tau_e6",
        F.greatest(F.col("_item.w") * 1_000_000, F.col("tau_e6")).alias("est_w_e6"),
    )


# ------------------------------------------------------- histogram sketch


def hist_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_int: Column | str,
    lo: int,
    width: int,
    n_bins: int,
) -> DataFrame:
    """Fixed-grid histogram over an INTEGER-grid column (e.g. an e4
    fixed-point value): bucket = clamp((v - lo) div width, 0, n_bins-1).

    This is the mergeable-quantile companion to the KMV sketch: state
    is ≤ n_bins counts per group, built in ONE groupBy with full
    map-side combine, and histograms MERGE by plain count addition
    (:func:`hist_merge`) — across executors, crawl rounds, or days.
    Spark's own ``approx_percentile`` (t-digest-ish) is the built-in
    alternative; this form exists because its all-integer arithmetic
    is engine-portable, so the oracle can pin it exactly, and because
    the state is a plain (bucket, cnt) table any engine can store.

    Out-of-range values clamp into the edge bins (their mass is
    counted; their position saturates — stated, not hidden).
    """
    v = F.col(value_int) if isinstance(value_int, str) else value_int
    prep = df.withColumn("_v", v.cast("long"))
    b = F.least(
        F.greatest(F.expr(f"(_v - {int(lo)}) div {int(width)}"), F.lit(0)),
        F.lit(int(n_bins) - 1),
    )
    return prep.groupBy(*group_cols, b.cast("long").alias("bucket")).agg(
        F.count("*").cast("long").alias("cnt")
    )


def hist_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Histogram union: counts add. Exact and closed, like kmv_merge."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    lo: int,
    width: int,
    qs_e6: list[int],
) -> DataFrame:
    """Interpolated quantiles FROM a histogram — rank r = q·(n-1) (the
    same definition as Spark ``percentile`` / DuckDB ``quantile_cont``,
    so the error vs exact is bounded by one bin width), rank carried in
    e6 units and the within-bin interpolation done with integer floor
    division: bit-identical in Spark, DuckDB and Python.

    Per group the histogram is ≤ n_bins rows, so the cumulative window
    is bounded; int64 holds width·(n-1)·10^6 — beyond ~10^11 rows per
    group scale the rank units down (or widen to decimal), documented
    here rather than silently truncated.
    """
    from pyspark.sql import Window as W

    cum_w = W.partitionBy(*group_cols).orderBy("bucket")
    all_w = W.partitionBy(*group_cols)
    h = (
        hist.withColumn("cum", F.sum("cnt").over(cum_w))
        .withColumn("n", F.sum("cnt").over(all_w))
        .withColumn(
            "q_e6", F.explode(F.array([F.lit(int(q)).cast("long") for q in qs_e6]))
        )
        .withColumn("r_e6", F.col("q_e6") * (F.col("n") - 1))
    )
    inbin = ((F.col("cum") - F.col("cnt")) * 1_000_000 <= F.col("r_e6")) & (
        F.col("r_e6") < F.col("cum") * 1_000_000
    )
    est = (
        F.lit(int(lo))
        + F.col("bucket") * int(width)
        + F.expr(
            f"(({int(width)} * (r_e6 - (cum - cnt) * 1000000)) div (cnt * 1000000))"
        )
    )
    return h.where(inbin).select(
        *group_cols,
        "q_e6",
        F.col("n").alias("n_rows"),
        est.cast("long").alias("est"),
    )


# ------------------------------------------------------- heavy hitters


def topk_sketch(
    df: DataFrame,
    group_cols: list[str],
    item: Column | str,
    t: int = 8,
    n_cells: int = DEFAULT_CELLS,
) -> DataFrame:
    """Deterministic mergeable heavy-hitters summary — the fourth
    member of the mergeable family (distinct → KMV, quantiles →
    histogram, subset-sums → priority sample, frequent items → this).

    Classic Misra-Gries/SpaceSaving state depends on stream ORDER, so
    it can never be oracle-pinned layout-free. This form is
    deterministic by the same trick as the other sketches: cell =
    hash60(item) mod n_cells partitions the ITEM space, so an item's
    entire count lands in exactly one cell — per-cell counts are exact
    global counts, and the summary keeps each cell's top-t by
    (cnt DESC, item ASC) plus ``bound`` = the cell's (t+1)-th count
    (0 when the cell holds ≤ t items). Soundness: any item ABSENT from
    the summary has true count ≤ its cell's bound.

    Spark shape: one map-side-combined exact count keyed
    (group, item) — the same first shuffle an exact top-k pays — then
    a tiny per-(group, cell) fold; per-reduce-cell memory is bounded
    by distinct/n_cells. The sketch's value is downstream: state is
    ≤ n_cells·t rows per group FOREVER, and cross-round merging
    (:func:`topk_merge`) never rescans the corpus — the incremental
    "top hosts / top terms per round" shape (the reference keeps exact
    per-host counters in PendDB for its top-hosts report, which is the
    one-box answer this replaces at 10^12 keys).

    Returns group_cols + [cell, items: array<struct<item,lo,hi>>,
    bound]; lo = hi = exact count for a fresh sketch (they diverge
    only after merges, where an absent side contributes its bound to
    hi).
    """
    c = (F.col(item) if isinstance(item, str) else item).cast("string")
    cnts = (
        df.select(*group_cols, c.alias("_it"))
        .groupBy(*group_cols, "_it")
        .agg(F.count("*").alias("_cnt"))
    )
    entry = F.struct(
        (-F.col("_cnt")).alias("nc"), F.col("_it").alias("item"), F.col("_cnt").alias("cnt")
    )
    cells = cnts.groupBy(
        *group_cols, F.pmod(hash60(F.col("_it")), F.lit(n_cells)).alias("cell")
    ).agg(F.slice(F.array_sort(F.collect_list(entry)), 1, t + 1).alias("_top"))
    bound = (
        F.when(F.size("_top") == t + 1, F.element_at("_top", t + 1).getField("cnt"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    items = F.transform(
        F.slice("_top", 1, t),
        lambda e: F.struct(
            e.getField("item").alias("item"),
            e.getField("cnt").alias("lo"),
            e.getField("cnt").alias("hi"),
        ),
    )
    return cells.select(*group_cols, "cell", items.alias("items"), bound.alias("bound"))


def topk_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], t: int = 8
) -> DataFrame:
    """Merge two heavy-hitters summaries (e.g. two crawl rounds).

    Per (group, cell): lo counts ADD where present (each side's lo is
    a true lower bound of that side's count); an item absent from one
    side contributes that side's BOUND to hi (it may have been
    truncated there with up to bound occurrences). Re-truncate to
    top-t by (lo DESC, item ASC); the merged bound is
    max(bound_a + bound_b, max dropped hi) so the absence guarantee
    survives: any item not in the merged summary has true total
    ≤ merged bound. Associative and closed like the other merges.
    """
    key = [*group_cols, "cell"]
    ea = a.select(*key, F.col("bound").alias("_ba"), F.explode("items").alias("e")).select(
        *key, "_ba", F.col("e.item").alias("item"),
        F.col("e.lo").alias("_loa"), F.col("e.hi").alias("_hia"),
    )
    eb = b.select(*key, F.col("bound").alias("_bb"), F.explode("items").alias("e")).select(
        *key, "_bb", F.col("e.item").alias("item"),
        F.col("e.lo").alias("_lob"), F.col("e.hi").alias("_hib"),
    )
    bounds = (
        a.select(*key, F.col("bound").alias("ba"))
        .join(b.select(*key, F.col("bound").alias("bb")), key, "full_outer")
        .select(
            *key,
            F.coalesce("ba", F.lit(0)).alias("ba"),
            F.coalesce("bb", F.lit(0)).alias("bb"),
        )
    )
    merged = (
        ea.drop("_ba")
        .join(eb.drop("_bb"), [*key, "item"], "full_outer")
        .join(bounds, key, "left")
        .select(
            *key,
            "item",
            (F.coalesce("_loa", F.lit(0)) + F.coalesce("_lob", F.lit(0))).alias("lo"),
            (
                F.coalesce("_hia", F.col("ba")) + F.coalesce("_hib", F.col("bb"))
            ).alias("hi"),
        )
    )
    entry = F.struct(
        (-F.col("lo")).alias("nl"), F.col("item").alias("item"),
        F.col("lo").alias("lo"), F.col("hi").alias("hi"),
    )
    folded = merged.groupBy(*key).agg(
        F.array_sort(F.collect_list(entry)).alias("_all")
    ).join(bounds, key, "left")
    kept = F.transform(
        F.slice("_all", 1, t),
        lambda e: F.struct(
            e.getField("item").alias("item"),
            e.getField("lo").alias("lo"),
            e.getField("hi").alias("hi"),
        ),
    )
    dropped_hi = F.coalesce(
        F.array_max(
            F.transform(
                F.slice(
                    "_all", t + 1, F.greatest(F.size("_all") - t, F.lit(0))
                ),
                lambda e: e.getField("hi"),
            )
        ),
        F.lit(0),
    )
    new_bound = F.greatest(F.col("ba") + F.col("bb"), dropped_hi).cast("long")
    return folded.select(
        *group_cols, "cell", kept.alias("items"), new_bound.alias("bound")
    )


def topk_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 10
) -> DataFrame:
    """Fold a summary's cells into per-group top-k rows:
    (group, rank, item, cnt_lo, cnt_hi, miss_bound) — rank by
    (lo DESC, item ASC); miss_bound = max cell bound, the sound cap on
    any item NOT shown. All outputs integer (oracle-exact)."""
    entry = F.struct(
        (-F.col("e.lo")).alias("nl"),
        F.col("e.item").alias("item"),
        F.col("e.lo").alias("lo"),
        F.col("e.hi").alias("hi"),
    )
    ex = sketch.select(*group_cols, "bound", F.explode("items").alias("e"))
    folded = ex.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("_top"),
        F.max("bound").alias("miss_bound"),
    )
    out = folded.select(
        *group_cols,
        "miss_bound",
        F.posexplode("_top").alias("_pos", "_e"),
    )
    return out.select(
        *group_cols,
        (F.col("_pos") + 1).cast("long").alias("rank"),
        F.col("_e.item").alias("item"),
        F.col("_e.lo").alias("cnt_lo"),
        F.col("_e.hi").alias("cnt_hi"),
        F.col("miss_bound").cast("long").alias("miss_bound"),
    )


# ---------------------------------------------------------------- py twin


def kmv_sketch_py(values, k: int = DEFAULT_K) -> tuple[int, list[int]]:
    """Pure-Python twin: (n_distinct, bottom-k sorted hash list)."""
    hs = {hash60_py(str(v)) for v in values}
    return len(hs), sorted(hs)[:k]


def kmv_merge_py(a: list[int], b: list[int], k: int = DEFAULT_K) -> list[int]:
    return sorted(set(a) | set(b))[:k]


def kmv_estimate_py(kmv: list[int], k: int = DEFAULT_K) -> int:
    if len(kmv) < k:
        return len(kmv)
    import math

    return int(math.floor(float(k - 1) * TWO60 / float(kmv[k - 1])))


def priority_sample_py(items, k: int = DEFAULT_K) -> list[tuple]:
    """Pure twin: items = [(id, w)]; returns
    [(rank, sample_id, w, tau_e6, est_w_e6)] — same IEEE op sequence
    as the Spark/DuckDB forms (int→double, two divisions, ·1e6, floor).
    """
    import math

    scored = sorted(
        (
            -(float(w) / ((hash60_py(str(i), "prio") + 1) / TWO60)),
            str(i),
            int(w),
        )
        for i, w in items
    )
    top = scored[: k + 1]
    tau_e6 = int(math.floor(-top[k][0] * 1_000_000)) if len(top) == k + 1 else 0
    return [
        (r + 1, sid, w, tau_e6, max(w * 1_000_000, tau_e6))
        for r, (_nq, sid, w) in enumerate(top[:k])
    ]


def hist_sketch_py(values, lo: int, width: int, n_bins: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for v in values:
        b = min(max((int(v) - lo) // width, 0), n_bins - 1)
        out[b] = out.get(b, 0) + 1
    return out


def hist_quantiles_py(
    hist: dict[int, int], lo: int, width: int, qs_e6: list[int]
) -> dict[int, int]:
    n = sum(hist.values())
    out = {}
    for q in qs_e6:
        r = q * (n - 1)
        cum = 0
        for b in sorted(hist):
            cnt = hist[b]
            if cum * 1_000_000 <= r < (cum + cnt) * 1_000_000:
                out[q] = lo + b * width + (width * (r - cum * 1_000_000)) // (
                    cnt * 1_000_000
                )
                break
            cum += cnt
    return out


def topk_sketch_py(
    values, t: int = 8, n_cells: int = DEFAULT_CELLS
) -> dict[int, tuple[list[tuple[str, int, int]], int]]:
    """Pure twin: cell -> ([(item, lo, hi)] top-t by (cnt DESC, item),
    bound = the cell's (t+1)-th count or 0)."""
    from collections import Counter

    cnt = Counter(str(v) for v in values)
    cells: dict[int, list] = {}
    for it, c in cnt.items():
        cells.setdefault(hash60_py(it) % n_cells, []).append((-c, it, c))
    out = {}
    for cell, lst in cells.items():
        lst.sort()
        bound = lst[t][2] if len(lst) > t else 0
        out[cell] = ([(it, c, c) for _nc, it, c in lst[:t]], bound)
    return out


def topk_estimate_py(sketch: dict, k: int = 10) -> list[tuple]:
    """Pure twin of topk_estimate: [(rank, item, lo, hi, miss_bound)]."""
    flat = sorted(
        (-lo, it, lo, hi)
        for items, _b in sketch.values()
        for it, lo, hi in items
    )
    mb = max((b for _items, b in sketch.values()), default=0)
    return [
        (r + 1, it, lo, hi, mb) for r, (_nl, it, lo, hi) in enumerate(flat[:k])
    ]


def kmv_set_estimates_py(ka: list[int], kb: list[int], k: int = DEFAULT_K) -> dict:
    import math

    top = 1 << 60
    theta = min(
        ka[k - 1] if len(ka) >= k else top,
        kb[k - 1] if len(kb) >= k else top,
    )
    sa, sb = set(ka), set(kb)
    n_and = sum(1 for h in sa & sb if h < theta)
    n_or = sum(1 for h in sa | sb if h < theta)
    est = lambda n: int(math.floor(float(n) * TWO60 / float(theta)))  # noqa: E731
    return {
        "theta": theta,
        "n_and": n_and,
        "n_or": n_or,
        "est_intersect": est(n_and),
        "est_union": est(n_or),
        "jaccard_e6": (n_and * 1_000_000) // n_or if n_or else 0,
    }


__all__ = [
    "HASH60_MASK",
    "kmv_sketch",
    "kmv_estimate",
    "kmv_merge",
    "kmv_set_estimates",
    "priority_sample",
    "priority_sample_py",
    "hist_sketch",
    "hist_merge",
    "hist_quantiles",
    "hist_sketch_py",
    "hist_quantiles_py",
    "kmv_sketch_py",
    "kmv_merge_py",
    "kmv_estimate_py",
    "kmv_set_estimates_py",
    "topk_sketch",
    "topk_merge",
    "topk_estimate",
    "topk_sketch_py",
    "topk_estimate_py",
]
