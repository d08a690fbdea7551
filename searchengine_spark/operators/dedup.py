"""Deduplication family for the training-data pipeline.

Five dedup strategies over a documents table (doc_id, text ...), each
declarative DataFrame algebra so Catalyst owns the physical plan:

* exact           — md5(text) hash-groupBy
* minhash + LSH   — word-set minhash signatures, banded LSH bucket join,
                    exact-Jaccard verification of candidates
* simhash         — 16-bit sign-of-sum signature, bucket grouping
* n-gram Jaccard  — word-shingle similarity on LSH-candidate pairs
* embedding cosine near-dup lives in operators/similarity.py

All hashing derives from the portable hash60 (functions/hashes.py) so
every stage has an exact DuckDB SQL twin. At 100 TB the shape is: one
shuffle to group signatures (banded so a band's bucket is small), one
shuffle to verify candidate pairs — never an all-pairs product.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
# DataType objects, not DDL strings: string return types parse via the
# active SparkContext and would make this module import-order-dependent
from pyspark.sql import types as _T


N_MINHASH = 8
LSH_BAND_SIZE = 2  # 4 bands of 2 -> catches jaccard >~ 0.6 reliably
SIMHASH_BITS = 64  # two 32-bit halves of a salted md5; hex-string packed


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: groups of byte-identical texts (content_hash ≙ the
    reference's md5-keyed content store, KeyValueDB.hpp:68-83)."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def _word_set(text_col: str) -> Column:
    return F.array_distinct(F.split(F.col(text_col), " "))


def _mh_window(md5_col: Column, i: int) -> Column:
    """i-th 60-bit window of one md5 digest — 8 independent-enough
    minhash permutations from a single hash pass (same trick as the
    bloom bit positions; the digest bits are uniform)."""
    return F.conv(F.substring(md5_col, 2 * i + 1, 15), 16, 10).cast("long")


def _mh_window_sql(md5_expr: str, i: int) -> str:
    return f"(('0x' || substr({md5_expr}, {2 * i + 1}, 15))::BIGINT)"


def _minhash_sig_batch(elem_arrays: pd.Series) -> pd.Series:
    """Arrow kernel twin of the native signature columns: per row, md5
    each element string once, mh_i = min over elements of the i-th
    60-bit digest window (hex chars [2i, 2i+15) == digest bytes
    [i, i+8) >> 4). Returns the N_MINHASH values as one array<long>.

    Guide §4.2 rationale: the native form is N_MINHASH interpreted
    ``transform`` passes (conv+substring per element per window); here
    each element hashes once per batch (pure-function dict memo, task-
    local) and the windows are byte slices of the digest. Bit-equal to
    minhash_signature_sql, pinned by
    tests/test_operators.py::test_minhash_udf_matches_expr."""
    cache: dict[str, list[int]] = {}
    out = []
    for arr in elem_arrays:
        if arr is None:
            out.append(None)
            continue
        mins = [None] * N_MINHASH
        for s in arr:
            wins = cache.get(s)
            if wins is None:
                d = hashlib.md5(s.encode("utf-8")).digest()
                wins = [
                    int.from_bytes(d[i : i + 8], "big") >> 4
                    for i in range(N_MINHASH)
                ]
                cache[s] = wins
            for i in range(N_MINHASH):
                m = mins[i]
                if m is None or wins[i] < m:
                    mins[i] = wins[i]
        out.append(mins)
    return pd.Series(out)


minhash_sig_udf = F.pandas_udf(
    _minhash_sig_batch, _T.ArrayType(_T.LongType())
)


def minhash_signature(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + mh_0..mh_{N-1}: element hashed ONCE (md5), the N
    permutations read N overlapping 60-bit windows of the digest —
    via the Arrow kernel (minhash_sig_udf); the native expr path
    (`_window_of`) and the SQL twin stay the semantic anchors."""
    words = _word_set(text_col)
    out = docs.select("doc_id", minhash_sig_udf(words).alias("_mh"))
    for i in range(N_MINHASH):
        out = out.withColumn(f"mh_{i}", F.element_at("_mh", i + 1))
    return out.drop("_mh")


def _window_of(i: int):
    # NB: must stay unary — pyspark gives a 2-arg lambda (element, index)
    return lambda h: _mh_window(h, i)


def minhash_signature_sql(text: str) -> list[str]:
    """DuckDB twins of the N signature columns."""
    hs = f"list_transform(list_distinct(string_split({text}, ' ')), w -> md5(w))"
    return [
        f"list_min(list_transform({hs}, h -> {_mh_window_sql('h', i)}))"
        for i in range(N_MINHASH)
    ]


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Banded LSH: docs sharing any band of the signature become a
    candidate pair (a < b). One self-join per band via a stacked
    (band_id, band_key) exploded view — a single shuffle on band_key."""
    bands = []
    for b in range(N_MINHASH // LSH_BAND_SIZE):
        cols = [F.col(f"mh_{b * LSH_BAND_SIZE + j}") for j in range(LSH_BAND_SIZE)]
        bands.append(F.struct(F.lit(b).alias("band"), F.concat_ws(":", *cols).alias("key")))
    banded = sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Exact word-set Jaccard on candidate pairs only (never all-pairs)."""
    w = docs.select("doc_id", _word_set(text_col).alias("wset"))
    j = (
        pairs.join(w.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("wset", "wa"), "doc_a")
        .join(w.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("wset", "wb"), "doc_b")
        .withColumn("_i", F.size(F.array_intersect("wa", "wb")))
        # |A∪B| = |A|+|B|-|A∩B| over the distinct word-set arrays — no
        # per-pair union array materialization
        .withColumn("_u", F.size("wa") + F.size("wb") - F.col("_i"))
        .withColumn("jaccard", F.round(F.col("_i") / F.col("_u"), 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return j


def minhash_dedup(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Full pipeline: signature -> banded LSH -> exact-Jaccard verify.

    No .cache() inside the operator: at production scale the caller
    persists signatures as a table; in one-shot use, pinned storage
    would outlive the query and starve co-resident processes (the
    correctness driver runs a DuckDB oracle in the same VM).
    """
    sigs = minhash_signature(docs, text_col)
    pairs = lsh_candidate_pairs(sigs)
    return jaccard_verify(pairs, docs, text_col, threshold)


def simhash_expr(text_col: str = "text") -> Column:
    """64-bit sign-of-sum simhash over the word set, packed as a
    16-hex-char string (two 32-bit halves — avoids the sign bit of a
    64-bit integer diverging between engines).

    bit b of each half = 1 iff sum over words of (±1 per digest bit)
    > 0; digests are md5('sh|'+word), halves = hex chars 1-8 / 9-16.
    ONE native `aggregate` pass with a 64-counter accumulator — each
    word hashed once, no shuffle at all.
    """
    words = _word_set(text_col)
    digests = F.transform(words, lambda w: F.md5(F.concat(F.lit("sh|"), w)))
    zero = F.array(*[F.lit(0).cast("long") for _ in range(64)])

    def merge(acc, d):
        hi = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
        # bit i of a 32-bit half as floor(h / 2^i) % 2 — exact doubles.
        # NB: keep the transform-with-index form: unrolling 64 literal
        # branches inlines the conv(substring(...)) subtrees into every
        # branch (interpreted HOF eval has no CSE) and measured 2x
        # SLOWER than one lambda with a runtime pow.
        bit_votes = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.when(
                F.pmod(
                    F.floor(
                        F.when(i < 32, hi).otherwise(lo)
                        / F.pow(F.lit(2.0), F.pmod(i, F.lit(32)).cast("double"))
                    ),
                    2,
                )
                == 1,
                1,
            )
            .otherwise(-1)
            .cast("long"),
        )
        return F.zip_with(acc, bit_votes, lambda a, b: a + b)

    votes = F.aggregate(digests, zero, merge)
    hi_val = F.lit(0).cast("long")
    lo_val = F.lit(0).cast("long")
    for b in range(32):
        hi_val = hi_val + F.when(
            F.element_at(votes, b + 1) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        lo_val = lo_val + F.when(
            F.element_at(votes, b + 33) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return F.format_string("%08x%08x", hi_val, lo_val)


def simhash_sql(text: str) -> str:
    """DuckDB twin — bit-identical 16-hex-char simhash."""
    ws = f"list_distinct(string_split({text}, ' '))"
    digests = f"list_transform({ws}, w -> md5('sh|' || w))"

    def half(off: int) -> str:
        terms = []
        for b in range(32):
            vote = (
                f"list_sum(list_transform({digests}, d -> CASE WHEN "
                f"((('0x' || substr(d, {off}, 8))::BIGINT >> {b}) & 1) = 1 "
                f"THEN 1 ELSE -1 END))"
            )
            terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
        return "(" + " + ".join(terms) + ")"

    return f"printf('%08x%08x', {half(1)}, {half(9)})"


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Arrow kernel twin of :func:`simhash_expr` — bit-identical output
    (pinned by tests/test_operators.py::test_simhash_udf_matches_expr).

    Why it exists (optimization guide §4.2): the native form is a
    64-branch higher-order ``aggregate`` per word — interpreted
    per-element Catalyst eval, no codegen for HOF lambdas — measured
    ~1.4 ms/doc at bench scale. Here each distinct word hashes once
    per batch (dict memo — pure-function memo within one task, no
    cross-run state) and the 64 bit votes are one numpy add."""
    shifts = np.arange(32, dtype=np.uint64)
    packs = 1 << np.arange(32, dtype=np.int64)
    cache: dict[str, np.ndarray] = {}
    out = []
    for t in texts:
        if t is None:
            # expr twin: aggregate(NULL array) -> NULL votes -> both
            # when-sums take the otherwise(0) branch
            out.append("0000000000000000")
            continue
        votes = np.zeros(64, dtype=np.int64)
        for w in set(t.split(" ")):
            bits = cache.get(w)
            if bits is None:
                d = hashlib.md5(("sh|" + w).encode("utf-8")).hexdigest()
                hi = np.uint64(int(d[0:8], 16))
                lo = np.uint64(int(d[8:16], 16))
                b = np.empty(64, dtype=np.int64)
                b[:32] = ((hi >> shifts) & np.uint64(1)).astype(np.int64)
                b[32:] = ((lo >> shifts) & np.uint64(1)).astype(np.int64)
                bits = 2 * b - 1
                cache[w] = bits
            votes += bits
        pos = votes > 0
        hi_val = int(pos[:32].dot(packs))
        lo_val = int(pos[32:].dot(packs))
        out.append(f"{hi_val:08x}{lo_val:08x}")
    return pd.Series(out)


simhash_udf = F.pandas_udf(_simhash_batch, _T.StringType())


def simhash_dup_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs sharing an identical simhash — near-dup buckets.

    Signature column via the Arrow kernel (simhash_udf); the native
    expr/SQL twins stay the cross-engine semantic anchors."""
    return (
        docs.withColumn("simhash", simhash_udf(F.col(text_col)))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# duplicate-group formation: connected components over verified dup pairs
# ---------------------------------------------------------------------------


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node u connects its LARGER neighbors
    to m(u) = min(neighbors(u) ∪ {u}). Pure min-aggregates — fully
    deterministic for any id type with a total order."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select("a", F.least(F.col("_mb"), F.col("a")).alias("_m"))
    )
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient each edge toward its larger endpoint u,
    then connect u and all its smaller neighbors to their min."""
    orient = edges.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    mins = orient.groupBy("u").agg(F.min("v").alias("_m"))
    nb = orient.join(mins, "u").select(
        F.col("v").alias("a"), F.col("_m").alias("b")
    )
    own = mins.select(F.col("u").alias("a"), F.col("_m").alias("b"))
    return nb.unionByName(own).where(F.col("a") != F.col("b")).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive duplicate groups over a pair graph: (doc_id, group_id)
    with group_id = the component's MINIMUM doc_id (deterministic label;
    a keep/drop policy is then `keep iff doc_id == group_id`).

    The missing piece between pairwise dedup (minhash_dedup /
    embedding_near_dups return verified PAIRS) and a production keep
    list: A~B and B~C must collapse into one group even when A≁C.

    Scale shape: alternating large-star/small-star label propagation —
    O(log^2 n) rounds proven (in practice 2-3 for dup clusters, whose
    diameter is tiny), every step a map-side-combinable min-aggregate +
    distinct, NO driver-side union-find and no windows. The input pair
    plan (often a whole LSH pipeline) is evaluated EXACTLY ONCE: the
    distinct pair set is eagerly localCheckpointed and both the edge
    iteration and the final node list derive from that checkpoint.
    Per-iteration checkpoints are LAZY — the convergence-digest action
    materializes them, so each round costs one job, not two. The
    checkpoint footprint is bounded by the PAIR count
    (threshold-verified dups, orders of magnitude smaller than the
    corpus).

    Convergence check per round: (count, sum of row hashes) — one tiny
    aggregate action. A star-contracted fixpoint reproduces itself, so
    equal digests end the loop; `max_iter` is a safety cap (raises if
    hit — silent truncation would emit wrong groups).
    """
    pairs0 = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # the ONLY evaluation of `pairs`
    )
    e = pairs0.where(F.col("a") != F.col("b"))

    def digest(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = digest(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = digest(e)  # materializes the lazy checkpoint: 1 job/round
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged star graph: every non-root points at its component min
    nodes = (
        pairs0.select(F.col("a").alias("doc_id"))
        .unionByName(pairs0.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    labels = e.select(F.col("a").alias("doc_id"), F.col("b").alias("group_id"))
    return nodes.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("group_id"), F.col("doc_id")).alias("group_id")
    )


def dup_groups(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Pairs -> (doc_id, group_id, group_size), the per-doc keep/drop
    surface: keep iff doc_id == group_id."""
    cc = connected_components(pairs, a_col, b_col)
    sizes = cc.groupBy("group_id").agg(F.count("*").alias("group_size"))
    return cc.join(sizes, "group_id").select("doc_id", "group_id", "group_size")


# ---------------------------------------------------------------------------
# substring-level dedup: repeated token spans across documents
# ---------------------------------------------------------------------------

SPAN_WINDOW = 6  # tokens per fingerprint window (dedup unit)


def _span_hashes_batch(texts: pd.Series) -> pd.Series:
    """Arrow kernel twin of the native window-fingerprint array in
    :func:`repeated_spans`: split on ' ', hash60 of each
    SPAN_WINDOW-token window (hash60 == first 15 hex chars of md5 ==
    first 7.5 digest bytes). NULL/short texts yield the empty array,
    matching the native when().otherwise(empty) form. Pinned by
    tests/test_operators.py::test_span_hashes_udf_matches_expr."""
    out = []
    for t in texts:
        if t is None:
            out.append([])
            continue
        toks = t.split(" ")
        npos = len(toks) - SPAN_WINDOW + 1
        if npos < 1:
            out.append([])
            continue
        hs = []
        for i in range(npos):
            d = hashlib.md5(
                " ".join(toks[i : i + SPAN_WINDOW]).encode("utf-8")
            ).digest()
            hs.append(int.from_bytes(d[0:8], "big") >> 4)
        out.append(hs)
    return pd.Series(out)


span_hashes_udf = F.pandas_udf(_span_hashes_batch, _T.ArrayType(_T.LongType()))


def repeated_spans(
    docs: DataFrame, window: int = SPAN_WINDOW, text_col: str = "text"
) -> DataFrame:
    """Substring-level exact dedup: maximal spans of >= `window`
    consecutive tokens that appear verbatim in MORE THAN ONE document
    (the "repeated long sequence" class of training-data dedup — doc-
    level exact/minhash/simhash miss a passage pasted into otherwise
    distinct pages; the reference's engine has no analogue, this is a
    pipeline addition like minhash/simhash above).

    Shape, per stage:
    1. window fingerprints are built with pure array ops INSIDE the row
       (split -> sequence -> slice/array_join -> hash60): no explode of
       raw tokens, no per-doc window function — the only thing leaving
       the map side is (doc_id, pos, whash);
    2. one hash-groupBy finds window hashes seen in >1 distinct doc
       (partial aggs map-side; at 100 TB this is the one big shuffle,
       keyed on a uniform 60-bit hash so no skew);
    3. duplicated windows join back on whash (same key, same exchange
       reuse) — candidates only, never all windows;
    4. overlapping/adjacent windows merge into maximal spans with a
       per-doc lag over the (small) duplicated subset: windows are
       fixed-length so [p1,p1+w-1] and [p2,p2+w-1] overlap-or-touch
       iff p2 - p1 <= w.

    Returns (doc_id, span_start, span_end, span_tokens, n_windows),
    token positions 1-based inclusive. hash60 fingerprints make every
    stage DuckDB-twinnable (SQL_DEDUP_SPANS in queries.py).
    """
    from searchengine_spark.functions.hashes import hash60

    toks = F.split(F.col(text_col), " ")
    npos = F.size(toks) - window + 1  # windows in this doc
    if window == SPAN_WINDOW:
        # hot path: Arrow kernel (one md5 per window, no interpreted
        # slice/array_join/conv chain per window) — bit-equal by test
        whashes = span_hashes_udf(F.col(text_col))
    else:
        whashes = F.when(
            npos >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(npos, F.lit(1))),
                lambda i: hash60(F.array_join(F.slice(toks, i, window), " ")),
            ),
        ).otherwise(F.array().cast("array<long>"))
    wins = docs.select(
        "doc_id", F.posexplode(whashes).alias("p0", "whash")
    ).select(
        "doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "whash"
    )
    dup_hashes = (
        wins.groupBy("whash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("whash")
    )
    dwin = wins.join(dup_hashes, "whash").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    grp = (
        dwin.withColumn(
            "_b",
            F.when(
                F.col("pos") - F.lag("pos").over(w_doc) <= window, F.lit(0)
            ).otherwise(F.lit(1)),  # first row per doc: lag NULL -> new span
        )
        .withColumn("_g", F.sum("_b").over(w_doc))
    )
    return (
        grp.groupBy("doc_id", "_g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window - 1).alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )
