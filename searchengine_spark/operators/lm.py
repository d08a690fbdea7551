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
