"""Bigram language-model training and per-document scoring — the
model-based quality gate of a training-data pipeline (the CCNet
recipe: fit a small LM on a trusted reference corpus, score candidate
documents by cross-entropy, drop the worst tail). The heuristic gates
in functions/text.py (length/punct/stopword) catch boilerplate; an LM
catches fluent-looking junk those ratios miss.

Spark-first shape — every stage is a shuffle the optimizer can see:

* :func:`fit_bigram_lm` — two map-side-combinable groupBys over the
  exploded bigram stream (pair counts keyed (a,b), context counts
  keyed (a)) plus a one-row vocabulary-size aggregate. Model size is
  bounded by the OBSERVED bigram vocabulary, not corpus size, so at
  100 TB the counts tables are small relative to the corpus and the
  scoring joins below shuffle on high-cardinality keys with no skew
  hot spot (natural-text head words are the hottest keys; both joins
  are AQE-skew-splittable and the pair table can be broadcast when a
  trimmed vocabulary keeps it small).
* :func:`score_bigram_lm` — the target corpus's bigram stream LEFT
  joins the model (unseen pairs/contexts coalesce to 0 — add-one
  smoothing handles them), then one per-doc aggregate. Train and score
  corpora are independent arguments: self-scoring (outlier detection)
  and reference-scoring (CCNet) are the same plan.

Determinism contract (what makes the DuckDB twin hash-exact): the
per-bigram log-probability is floored to integer micro-nats BEFORE the
per-doc sum — ``lp_e6 = floor(1e6 * ln((c_ab + 1) / (c_a + V)))`` —
so document scores are exact BIGINT sums of identically-computed
integers in both engines (floor not round; the ratio is one IEEE
division of exactly-representable integers; ln may differ by 1 ulp
across libm implementations, which moves a floor only when 1e6*ln(x)
sits within ~1e-9 of an integer).

Reference tie-in: the reference has no LM gate (its quality signal is
the crawl's link structure, SearchEngine.cpp:282-490 tokenizer +
PageRank); this operator is part of the beyond-reference
training-data layer, same tier as operators/curation.py.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, functions as F


class BigramLM(NamedTuple):
    """A fitted model: two count tables + the 1-row vocab size."""

    pair_counts: DataFrame  # (a, b, c_ab)
    ctx_counts: DataFrame  # (a, c_a)
    vocab: DataFrame  # (vsz) one row


def _words(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)


def doc_bigrams(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, text) -> one row per adjacent token pair (doc_id, a, b).

    Array-native: the pair list is built inside the row with a
    2-arg transform lambda (elem, index — see CLAUDE.md trap) and then
    exploded once; no positional self-join."""
    ws = _words(text_col)
    pairs = F.transform(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("a"), F.element_at(ws, i + F.lit(2)).alias("b")
        ),
    )
    return docs.select(
        F.col(doc_col).alias("doc_id"), F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))


def fit_bigram_lm(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> BigramLM:
    """Count-based bigram model with add-one smoothing baked into the
    scorer: P(b|a) = (c(a,b) + 1) / (c(a) + V), V = distinct tokens."""
    bg = doc_bigrams(docs, doc_col, text_col)
    pair = bg.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ctx = bg.groupBy("a").agg(F.count("*").alias("c_a"))
    vocab = (
        docs.select(F.explode(_words(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("vsz"))
    )
    return BigramLM(pair, ctx, vocab)


def score_bigram_lm(
    docs: DataFrame,
    model: BigramLM,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document negative log-likelihood under the model, in exact
    integer micro-nats:

    (doc_id, n_bigrams, nll_e6, avg_nll_e6) — nll_e6 = -Σ floor(1e6 ·
    ln P(b|a)), avg = integer division (exact in both engines for the
    positive values NLL takes). Docs with < 2 tokens have no bigrams
    and are absent from the output (nothing to score). Unseen pairs or
    contexts (target corpus ≠ training corpus) take the smoothed
    P = 1/(c(a)+V) or 1/V path via the left joins."""
    bg = doc_bigrams(docs, doc_col, text_col)
    joined = (
        bg.join(model.pair_counts, ["a", "b"], "left")
        .join(model.ctx_counts, ["a"], "left")
        .crossJoin(F.broadcast(model.vocab))
        .select(
            "doc_id",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.coalesce(F.col("c_ab"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c_a"), F.lit(0)) + F.col("vsz"))
                )
            ).alias("lp_e6"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (-F.sum("lp_e6")).alias("nll_e6"),
        F.expr("(-sum(lp_e6)) div count(*)").alias("avg_nll_e6"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney (the production estimator ADVICE.md's add-one
# note points at: same two-count-table plan shape, one more discount
# join) + frequency-trimmed vocabulary.
# ---------------------------------------------------------------------------

# Fixed discount D = 3/4 kept as an integer ratio so every count term
# stays BIGINT-exact: max(c_ab - D, 0) -> greatest(4·c_ab - 3, 0) over
# a 4·-scaled denominator.
KN_DISCOUNT_NUM = 3
KN_DISCOUNT_DEN = 4
UNK = "<unk>"  # reserved type; a corpus token spelled "<unk>" merges into it


class KNBigramLM(NamedTuple):
    """Fitted interpolated-KN model. All four stats tables derive from
    the pair-count table (vocab-sized, not corpus-sized)."""

    pair_counts: DataFrame  # (a, b, c_ab)
    ctx: DataFrame  # (a, c_a, n1a)   c_a = Σ c_ab; n1a = N1+(a·)
    cont: DataFrame  # (b, n1b)        n1b = N1+(·b)
    totals: DataFrame  # (t_types, vsz) one row; t_types = N1+(··)
    kept: DataFrame | None  # (w) trimmed vocab; None when min_count <= 1


def _kept_vocab(docs: DataFrame, text_col: str, min_count: int) -> DataFrame:
    words = docs.select(F.explode(_words(text_col)).alias("w"))
    return (
        words.groupBy("w")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("w")
    )


def _map_unk(bg: DataFrame, kept: DataFrame) -> DataFrame:
    """Map both sides of the bigram stream through the kept-vocab
    table (word -> word | '<unk>'). Two hash joins keyed on the word —
    broadcastable when the trimmed vocabulary is small, which is the
    point of trimming."""
    ka = kept.select(F.col("w").alias("a"), F.lit(True).alias("_ka"))
    kb = kept.select(F.col("w").alias("b"), F.lit(True).alias("_kb"))
    return (
        bg.join(ka, "a", "left")
        .join(kb, "b", "left")
        .select(
            "doc_id",
            F.when(F.col("_ka").isNotNull(), F.col("a"))
            .otherwise(F.lit(UNK))
            .alias("a"),
            F.when(F.col("_kb").isNotNull(), F.col("b"))
            .otherwise(F.lit(UNK))
            .alias("b"),
        )
    )


def fit_kn_bigram_lm(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> KNBigramLM:
    """Interpolated Kneser-Ney bigram model with an optionally
    frequency-trimmed vocabulary (words with corpus count < min_count
    become '<unk>' on BOTH bigram sides before counting — the trim the
    CCNet-style gate needs to keep the pair table broadcast-sized).

    Estimator (seen context a):

        p(b|a) = max(c_ab − D, 0)/c_a + D·N1+(a·)/c_a · p_cont(b)
        p_cont(b) = (N1+(·b) + 1) / (N1+(··) + V)

    D = 3/4. The continuation distribution carries a +1/+V uniform
    floor so unseen continuation TYPES score finite (plain KN assigns
    them zero); an unseen CONTEXT backs off to p_cont(b) directly.
    V counts the kept vocabulary + 1 (the reserved '<unk>' type).

    Everything derives from the pair table: c_a = Σ_b c_ab, N1+(a·)
    and N1+(·b) are its per-side distinct counts, N1+(··) its row
    count — three map-side-combinable aggregates over a vocab²-bounded
    frame, nothing corpus-sized after the first groupBy.
    """
    bg = doc_bigrams(docs, doc_col, text_col)
    kept = None
    if min_count > 1:
        kept = _kept_vocab(docs, text_col, min_count)
        bg = _map_unk(bg, kept)
        vocab_n = kept.agg(F.count("*").alias("_n"))
    else:
        vocab_n = docs.select(F.explode(_words(text_col)).alias("w")).agg(
            F.countDistinct("w").alias("_n")
        )
    pair = bg.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ctx = pair.groupBy("a").agg(
        F.sum("c_ab").alias("c_a"), F.count("*").alias("n1a")
    )
    cont = pair.groupBy("b").agg(F.count("*").alias("n1b"))
    totals = (
        pair.agg(F.count("*").alias("t_types"))
        .crossJoin(vocab_n)
        .select("t_types", (F.col("_n") + 1).alias("vsz"))
    )
    return KNBigramLM(pair, ctx, cont, totals, kept)


def score_kn_bigram_lm(
    docs: DataFrame,
    model: KNBigramLM,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document NLL under an interpolated-KN model, same exact
    BIGINT micro-nat contract and output schema as
    :func:`score_bigram_lm` (n_bigrams, nll_e6, avg_nll_e6).

    The per-bigram probability is ONE IEEE division of two BIGINT-
    exact operands (numerator/denominator assembled with integer
    arithmetic, D = 3/4 as a 4·-scaling), so both engines floor the
    same double:

        seen ctx:  num = max(4·c_ab−3, 0)·(T+V) + 3·n1a·(n1b+1)
                   den = 4·c_a·(T+V)
        unseen ctx: num = n1b+1, den = T+V    (pure continuation)

    BIGINT bound: num < 4·c_ab·(T+V) must stay under 2^63 (and under
    2^53 for the division to be exact-in-double) — at trimmed-vocab
    production sizes (c_ab ≤ 10^9, T+V ≤ 10^7) the 2^63 bound holds;
    beyond 2^53 the division is correctly-rounded rather than exact,
    identically in both engines."""
    bg = doc_bigrams(docs, doc_col, text_col)
    if model.kept is not None:
        bg = _map_unk(bg, model.kept)
    tv = F.col("t_types") + F.col("vsz")
    num_seen = (
        F.greatest(
            F.lit(KN_DISCOUNT_DEN) * F.coalesce(F.col("c_ab"), F.lit(0))
            - F.lit(KN_DISCOUNT_NUM),
            F.lit(0),
        )
        * tv
        + F.lit(KN_DISCOUNT_NUM)
        * F.col("n1a")
        * (F.coalesce(F.col("n1b"), F.lit(0)) + 1)
    )
    den_seen = F.lit(KN_DISCOUNT_DEN) * F.col("c_a") * tv
    num_unseen = F.coalesce(F.col("n1b"), F.lit(0)) + 1
    joined = (
        bg.join(model.pair_counts, ["a", "b"], "left")
        .join(model.ctx, ["a"], "left")
        .join(model.cont, ["b"], "left")
        .crossJoin(F.broadcast(model.totals))
        .select(
            "doc_id",
            F.floor(
                F.lit(1e6)
                * F.log(
                    F.when(F.col("c_a").isNull(), num_unseen)
                    .otherwise(num_seen)
                    .cast("double")
                    / F.when(F.col("c_a").isNull(), tv)
                    .otherwise(den_seen)
                    .cast("double")
                )
            ).alias("lp_e6"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (-F.sum("lp_e6")).alias("nll_e6"),
        F.expr("(-sum(lp_e6)) div count(*)").alias("avg_nll_e6"),
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations (phrase mining) by pointwise mutual
    information over the adjacent-bigram stream — the standard
    vocabulary-construction signal for deciding which adjacent pairs
    deserve a merged token (Church & Hanks 1990).

    PMI(a,b) = ln( c_ab · T / (c_left(a) · c_right(b)) ) with
    positional marginals — c_left = a's count as a LEFT element,
    c_right = b's count as a RIGHT element, T = total bigrams — all
    derived from ONE corpus-sized groupBy (the pair table); the
    marginals are vocab-sized re-aggregations of it. ``min_count``
    suppresses the low-frequency PMI explosion (a hapax pair has
    near-maximal PMI) and is applied AFTER the marginals are counted.

    Exact integer contract (lm.py discipline): pmi_e6 =
    floor(1e6 · ln((c_ab·T)/(c_left·c_right))) computed as one double
    expression from identical BIGINT operands in both engines.
    Products stay in doubles (c_ab·T at 10^13-bigram scale overflows
    BIGINT; doubles carry it exactly enough for the micro-nat floor).

    Returns (a, b, c_ab, pmi_e6, rank), rank 1..k by
    (pmi_e6 desc, a, b) — TakeOrderedAndProject, rank window only
    over the ≤k survivors.
    """
    bg = doc_bigrams(docs, doc_col, text_col)
    pair = bg.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    left = pair.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_left"))
    right = pair.groupBy("b").agg(F.sum("c_ab").cast("long").alias("c_right"))
    tot = pair.agg(F.sum("c_ab").cast("long").alias("t_bigrams"))
    scored = (
        pair.where(F.col("c_ab") >= min_count)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "c_ab",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    (F.col("c_ab").cast("double") * F.col("t_bigrams"))
                    / (F.col("c_left").cast("double") * F.col("c_right"))
                )
            )
            .cast("long")
            .alias("pmi_e6"),
        )
    )
    from pyspark.sql import Window as _W

    top = scored.orderBy(F.desc("pmi_e6"), "a", "b").limit(k)
    w = _W.orderBy(F.desc("pmi_e6"), "a", "b")  # bounded: ≤ k rows
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
