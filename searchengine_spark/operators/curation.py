"""Corpus-curation operators for a training-data pipeline.

Three first-class operations a 100 TB pretraining corpus needs beyond
dedup (operators/dedup.py) and text stats (functions/text.py):

- **Benchmark decontamination** (`decontaminate`): flag training
  documents sharing verbatim n-grams with a held-out benchmark set —
  the standard n-gram-overlap decontamination step (GPT-3 appendix C /
  Llama style, over whitespace-token n-grams). The benchmark
  membership is derived deterministically from the corpus itself
  (doc_id % DECON_BENCH_MOD == 0) so tests and oracles need no
  external data.
- **Repetition quality stats** (`repetition_stats`): Gopher-style
  duplicate-n-gram fractions (1-, 2-, 3-gram) computed entirely
  in-row with native array expressions — the repetition signals used
  to drop boilerplate/spam before training.
- **Deterministic split + mixture sampling** (`corpus_sample`):
  hash-bucket train/val/test assignment plus a per-source Bernoulli
  sampling rate (the "mixture weights" step of corpus assembly), all
  derived from hash60 so the split is reproducible, engine-portable
  and oracle-checkable.

Scale notes (100 TB):
- `decontaminate` explodes candidate n-grams map-side and joins them
  against a BROADCAST distinct benchmark n-gram hash set (benchmarks
  are tiny relative to the corpus; hashing grams to 60-bit ints keeps
  the broadcast at 8 bytes/gram). The only shuffle is the final
  per-doc partial-aggregated count — no corpus-sized wide join.
- `repetition_stats` is pure per-row projection: no shuffle at all,
  whole-stage codegen end to end.
- `corpus_sample` is a map + one small partial-aggregated groupBy on
  (source, split) — output cardinality is #sources × 3.

The reference engine has no curation layer (it indexes everything it
crawls); these operators extend the pipeline the way its DocDB scan +
word-weight pass (SearchEngine.cpp:282-490) feeds the indexer, but on
the training-data side of the fork.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from searchengine_spark.functions.hashes import hash60, hash60_sql
from searchengine_spark.functions.text import (
    quality_score_expr,
    quality_score_sql,
    token_count_expr,
)

# decontamination.  N=3 is the test-scale default: the synthetic corpus
# draws from a ~20-word vocabulary, so 3-grams give a substantive overlap
# set (171 flagged docs at sf0.01) while 5-grams collide almost never
# (1 doc).  A production run over natural text would raise this to the
# usual 8-13 (every function below takes `n` explicitly).
DECON_NGRAM = 3
DECON_BENCH_MOD = 97  # doc_id % 97 == 0 -> benchmark member
# Real decontamination flags on ANY verbatim long-n-gram hit (threshold
# ~0); with the short test-scale n the fraction gate keeps incidental
# single-gram collisions below the flag while still firing on docs with
# systematic benchmark overlap (5% of distinct grams).
DECON_FLAG_FRAC = 0.05

# split + sampling
SPLIT_BUCKETS = 10_000
SPLIT_TRAIN_LT = 9_600  # [0, 9600) train
SPLIT_VAL_LT = 9_800  # [9600, 9800) val; rest test
SAMPLE_RATES = [1.0, 0.5, 0.25, 0.1]  # indexed by hash60(source) % 4


# ---------------------------------------------------------------------------
# n-gram builders (Spark expr + DuckDB SQL twin, same short-doc rule as
# the shingle builders in queries.py: a doc shorter than n tokens
# yields its single sub-n gram)
# ---------------------------------------------------------------------------

def ngrams_expr(text: Column | str, n: int, distinct: bool = True) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    w = F.split(c, " ")
    ln = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.array_distinct(grams) if distinct else grams


def ngrams_sql(text: str, n: int, distinct: bool = True) -> str:
    w = f"string_split({text}, ' ')"
    grams = (
        f"list_transform(range(1, greatest(len({w}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' '))"
    )
    return f"list_distinct({grams})" if distinct else grams


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    docs: DataFrame,
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
    flag_frac: float = DECON_FLAG_FRAC,
) -> DataFrame:
    """Per-candidate-doc benchmark n-gram overlap.

    Returns (doc_id, n_grams, n_hit, overlap_frac, contaminated) for
    every non-benchmark doc sharing >= 1 distinct n-gram with the
    benchmark set. The gram join key is hash60(gram) so the broadcast
    side is fixed-width ints, not strings.
    """
    grams = ngrams_expr("text", n)
    bench_grams = (
        docs.where(F.col("doc_id") % bench_mod == 0)
        .select(F.explode(grams).alias("gram"))
        .select(hash60(F.col("gram"), "dc").alias("gh"))
        .distinct()
    )
    cand = docs.where(F.col("doc_id") % bench_mod != 0).select(
        "doc_id", grams.alias("_g")
    )
    exploded = cand.select(
        "doc_id", F.size("_g").alias("n_grams"), F.explode("_g").alias("gram")
    ).select("doc_id", "n_grams", hash60(F.col("gram"), "dc").alias("gh"))
    hits = (
        exploded.join(F.broadcast(bench_grams), "gh")
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        hits.withColumn(
            "overlap_frac",
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 4),
        )
        .withColumn("contaminated", F.col("overlap_frac") >= flag_frac)
        .select("doc_id", "n_grams", "n_hit", "overlap_frac", "contaminated")
    )


def decontaminate_sql(
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
    flag_frac: float = DECON_FLAG_FRAC,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`decontaminate` (CTE body; caller wraps in
    WITH ... SELECT). Same hash-keyed join over the same gram rule."""
    grams = ngrams_sql("text", n)
    return f"""
  bench_grams AS (
    SELECT DISTINCT {hash60_sql('gram', 'dc')} AS gh
    FROM (SELECT unnest({grams}) AS gram FROM {table}
          WHERE doc_id % {bench_mod} = 0)
  ),
  cand_grams AS (
    SELECT doc_id, len({grams}) AS n_grams,
           unnest(list_transform({grams},
                  g -> {hash60_sql('g', 'dc')})) AS gh
    FROM {table} WHERE doc_id % {bench_mod} <> 0
  ),
  hits AS (
    SELECT doc_id, n_grams, count(*) AS n_hit
    FROM cand_grams JOIN bench_grams USING (gh)
    GROUP BY doc_id, n_grams
  ),
  decon AS (
    SELECT doc_id, n_grams, n_hit,
           round(CAST(n_hit AS DOUBLE) / n_grams, 4) AS overlap_frac,
           round(CAST(n_hit AS DOUBLE) / n_grams, 4) >= {flag_frac}
             AS contaminated
    FROM hits
  )"""


# ---------------------------------------------------------------------------
# repetition quality stats (pure in-row)
# ---------------------------------------------------------------------------

# gopher-ish thresholds tuned to the synthetic corpus so both states occur
REP_MAX_DUP_WORD = 0.55
REP_MAX_DUP_2GRAM = 0.25
REP_MAX_DUP_3GRAM = 0.10


def _dup_frac(text: Column | str, n: int) -> Column:
    all_g = ngrams_expr(text, n, distinct=False)
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(all_g)).cast("double") / F.size(all_g),
        4,
    )


def _dup_frac_sql(text: str, n: int) -> str:
    all_g = ngrams_sql(text, n, distinct=False)
    return (
        f"round(1.0 - CAST(len(list_distinct({all_g})) AS DOUBLE)"
        f" / len({all_g}), 4)"
    )


def repetition_pass_expr(text: Column | str) -> Column:
    """The Gopher-style repetition gate as a standalone predicate."""
    return (
        (_dup_frac(text, 1) <= REP_MAX_DUP_WORD)
        & (_dup_frac(text, 2) <= REP_MAX_DUP_2GRAM)
        & (_dup_frac(text, 3) <= REP_MAX_DUP_3GRAM)
    )


def repetition_pass_sql(text: str) -> str:
    d1, d2, d3 = (_dup_frac_sql(text, n) for n in (1, 2, 3))
    return (
        f"({d1} <= {REP_MAX_DUP_WORD} AND {d2} <= {REP_MAX_DUP_2GRAM} "
        f"AND {d3} <= {REP_MAX_DUP_3GRAM})"
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Duplicate-n-gram fractions per doc + a Gopher-style pass flag.

    Entirely native array expressions — no explode, no shuffle; the
    whole operator is one codegen'd projection, so at 100 TB it runs
    at scan speed.
    """
    return docs.select(
        "doc_id",
        _dup_frac("text", 1).alias("dup_word_frac"),
        _dup_frac("text", 2).alias("dup_2gram_frac"),
        _dup_frac("text", 3).alias("dup_3gram_frac"),
        repetition_pass_expr("text").alias("repetition_pass"),
    )


def repetition_stats_sql(text: str = "text") -> str:
    """Projection list twin (columns match repetition_stats)."""
    d1, d2, d3 = (_dup_frac_sql(text, n) for n in (1, 2, 3))
    return (
        f"doc_id, {d1} AS dup_word_frac, {d2} AS dup_2gram_frac, "
        f"{d3} AS dup_3gram_frac, "
        f"{repetition_pass_sql(text)} AS repetition_pass"
    )


# ---------------------------------------------------------------------------
# deterministic split + mixture sampling
# ---------------------------------------------------------------------------

def _split_expr(doc_id: Column) -> Column:
    b = hash60(doc_id.cast("string"), "split") % SPLIT_BUCKETS
    return (
        F.when(b < SPLIT_TRAIN_LT, F.lit("train"))
        .when(b < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _split_sql(doc_id: str) -> str:
    b = f"({hash60_sql(f'CAST({doc_id} AS VARCHAR)', 'split')} % {SPLIT_BUCKETS})"
    return (
        f"CASE WHEN {b} < {SPLIT_TRAIN_LT} THEN 'train' "
        f"WHEN {b} < {SPLIT_VAL_LT} THEN 'val' ELSE 'test' END"
    )


def _rate_expr(source: Column) -> Column:
    idx = hash60(source, "rate") % len(SAMPLE_RATES)
    expr = F.when(idx == 0, F.lit(SAMPLE_RATES[0]))
    for i in range(1, len(SAMPLE_RATES)):
        expr = expr.when(idx == i, F.lit(SAMPLE_RATES[i]))
    return expr.otherwise(F.lit(0.0))


def _rate_sql(source: str) -> str:
    idx = f"({hash60_sql(source, 'rate')} % {len(SAMPLE_RATES)})"
    whens = " ".join(
        f"WHEN {idx} = {i} THEN {r}" for i, r in enumerate(SAMPLE_RATES)
    )
    return f"CASE {whens} ELSE 0.0 END"


def sampled_expr(doc_id: Column, source: Column) -> Column:
    """Deterministic Bernoulli keep-decision at the per-source rate."""
    b = hash60(doc_id.cast("string"), "samp") % SPLIT_BUCKETS
    return b < _rate_expr(source) * SPLIT_BUCKETS


def sampled_sql(doc_id: str, source: str) -> str:
    b = f"({hash60_sql(f'CAST({doc_id} AS VARCHAR)', 'samp')} % {SPLIT_BUCKETS})"
    return f"({b} < ({_rate_sql(source)}) * {SPLIT_BUCKETS})"


# ---------------------------------------------------------------------------
# sequence chunking / packing (concat-and-chunk, GPT-style)
# ---------------------------------------------------------------------------

SEQ_LEN = 128  # tokens per training sequence (whitespace tokens here)


def _tok_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, " ")).cast("long")


def _tok_sql(text: str) -> str:
    return f"CAST(len(string_split({text}, ' ')) AS BIGINT)"


def chunk_stats(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-doc chunking stats for PAD-style (one doc per sequence)
    batching: token count, number of seq_len chunks, tail padding.

    Pure projection — no shuffle.
    """
    t = _tok_expr("text")
    n_chunks = F.ceil(t / F.lit(seq_len)).cast("long")
    return docs.select(
        "doc_id",
        t.alias("n_tokens"),
        n_chunks.alias("n_chunks"),
        (n_chunks * seq_len - t).alias("pad_tokens"),
    )


def chunk_stats_sql(text: str = "text", seq_len: int = SEQ_LEN) -> str:
    """Projection-list twin of :func:`chunk_stats`."""
    t = _tok_sql(text)
    n_chunks = f"CAST(ceil({t} / {seq_len}.0) AS BIGINT)"
    return (
        f"doc_id, {t} AS n_tokens, {n_chunks} AS n_chunks, "
        f"{n_chunks} * {seq_len} - {t} AS pad_tokens"
    )


def pack_stats(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-source concat-and-chunk packing stats: documents are laid
    end-to-end in doc_id order within each source and cut into seq_len
    sequences (the zero-padding-waste packing used for pretraining).

    Returns per source: docs, total tokens, number of sequences the
    stream cuts into, tail padding of the last sequence, and how many
    docs straddle a sequence boundary (the attention-masking cost of
    packing).

    Scale: the prefix sum is a running-total window per source. Source
    partitions are corpus-scale at 100 TB, so a production run would
    range-partition each source's stream and offset per-partition sums
    the way operators/frontier.with_global_seq does; the semantics
    pinned here are partitioning-independent (doc_id order).
    """
    t = _tok_expr("text")
    win = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = docs.select("source", "doc_id", t.alias("_t")).withColumn(
        "_end", F.sum("_t").over(win)
    )
    d = d.withColumn("_start", F.col("_end") - F.col("_t")).withColumn(
        "_crosses",
        (
            F.floor((F.col("_end") - 1) / seq_len)
            > F.floor(F.col("_start") / seq_len)
        ).cast("long"),
    )
    n_seq = F.ceil(F.sum("_t") / F.lit(seq_len)).cast("long")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_t").alias("total_tokens"),
        n_seq.alias("n_sequences"),
        (n_seq * seq_len - F.sum("_t")).alias("tail_pad"),
        F.sum("_crosses").alias("docs_straddling"),
    )


def pack_stats_sql(seq_len: int = SEQ_LEN) -> str:
    """Full SELECT twin of :func:`pack_stats` (unordered)."""
    t = _tok_sql("text")
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(t) / {seq_len}.0) AS BIGINT) AS n_sequences,
       CAST(ceil(sum(t) / {seq_len}.0) AS BIGINT) * {seq_len}
         - CAST(sum(t) AS BIGINT) AS tail_pad,
       CAST(sum(CASE WHEN floor((e - 1) / {seq_len})
                          > floor((e - t) / {seq_len})
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_straddling
FROM (
  SELECT source, doc_id, {t} AS t,
         CAST(sum({t}) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
  FROM documents
)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns live in the common Java-regex (Spark) / RE2 (DuckDB) subset —
# char classes, bounded repetition and \b word boundaries only — so the
# native expression and the SQL twin compile to the same matches.
# Replacement tokens contain no digits or '@' so chained redaction can
# never re-trigger a later rule.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii_expr(text: Column | str) -> Column:
    """Chained regexp_replace over PII_RULES (email → ipv4 → phone).

    Pure per-row projection: no shuffle, codegen'd, runs at scan speed
    at any scale.
    """
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, rep in PII_RULES:
        c = F.regexp_replace(c, pat, rep)
    return c


def redact_pii_sql(text: str) -> str:
    e = text
    for _name, pat, rep in PII_RULES:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    return e


def pii_count_exprs(text: Column | str) -> list[Column]:
    """One `n_<rule>` long column per rule, counted on the RAW text."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _rep in PII_RULES
    ]


def pii_count_sqls(text: str) -> list[str]:
    return [
        f"CAST(len(regexp_extract_all({text}, '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _rep in PII_RULES
    ]


def corpus_sample(docs: DataFrame) -> DataFrame:
    """Per (source, split): doc counts, sampled-doc counts and sampled
    char volume under the deterministic hash split + mixture rates."""
    tagged = docs.select(
        "source",
        "n_chars",
        _split_expr(F.col("doc_id")).alias("split"),
        sampled_expr(F.col("doc_id"), F.col("source")).alias("_keep"),
    )
    return tagged.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("_keep").cast("long")).alias("n_sampled"),
        F.sum(F.when(F.col("_keep"), F.col("n_chars")).otherwise(0)).alias(
            "chars_sampled"
        ),
    )


def corpus_sample_sql() -> str:
    """Full SELECT twin of :func:`corpus_sample` (unordered; caller
    appends ORDER BY). Integer SUMs are BIGINT-cast per the oracle
    casting rule."""
    return f"""
SELECT source, {_split_sql('doc_id')} AS split,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN {sampled_sql('doc_id', 'source')} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN {sampled_sql('doc_id', 'source')} THEN n_chars
                ELSE 0 END) AS BIGINT) AS chars_sampled
FROM documents
GROUP BY source, {_split_sql('doc_id')}
"""


# ---------------------------------------------------------------------------
# Token-budget mixture assembly
# ---------------------------------------------------------------------------

# hash60(source,'mix') % 4 -> budget multiplier (test-scale defaults;
# production passes an explicit budgets table). 0.25/0.6 exercise
# downsampling, 1.0 the exact-fit edge, 2.5 multi-epoch upsampling.
MIX_MULTS = [0.25, 0.6, 1.0, 2.5]
QLEVEL_SCALE = 10_000  # quality_score is 4-dp-rounded; ×1e4 is exact


def mixture_assign(docs: DataFrame, budgets: DataFrame | None = None) -> DataFrame:
    """Assemble a training mixture against per-source TOKEN budgets:
    every doc gets an integer epoch count (0 = dropped), filled in
    quality order — the "mixture weights" step that turns a curated
    corpus into an actual pretraining data recipe (each source sampled
    up or down to its target share).

    Deterministic, engine-portable rule (selection unit = quality
    LEVEL, the 4-dp quality score × 1e4):

    * ``n_full = budget div total_tokens`` epochs go to EVERY doc of
      the source (multi-epoch upsampling when budget > available);
    * the remainder ``budget mod total_tokens`` is filled by whole
      quality levels from the top: a level gets the extra epoch iff
      the level-token cumsum BEFORE it is < the remainder (the
      crossing level is included, so realized ≥ budget and the
      overshoot is < one level's tokens).

    Doc-exact prefix selection would need a per-source cumsum over
    every doc — a skewed single-task window at corpus scale. Level
    granularity makes the cumsum run over the tiny (source × ≤1e4
    levels) aggregate instead: two map-side-combined groupBys, one
    window over the level table, one broadcast join back to docs. The
    realized-vs-budget error bound (one level) is the price, stated
    not hidden.

    ``budgets``: optional (source, budget_tokens) table; defaults to
    ``floor(MIX_MULTS[hash60(source,'mix') % 4] × total_tokens)`` so
    tests and oracles are self-contained.

    Returns (doc_id, source, tokens, qlevel, budget_tokens, n_epochs).
    """
    base = docs.select(
        "doc_id",
        "source",
        token_count_expr("text").cast("long").alias("tokens"),
        F.round(quality_score_expr("text") * QLEVEL_SCALE, 0)
        .cast("long")
        .alias("qlevel"),
    )
    levels = base.groupBy("source", "qlevel").agg(F.sum("tokens").alias("ltok"))
    totals = levels.groupBy("source").agg(F.sum("ltok").alias("ttok"))
    if budgets is None:
        mult = F.element_at(
            F.array(*[F.lit(m) for m in MIX_MULTS]),
            (hash60(F.col("source"), "mix") % 4).cast("int") + 1,
        )
        budgets = totals.select(
            "source",
            F.floor(mult * F.col("ttok")).cast("long").alias("budget_tokens"),
        )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("qlevel"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rule = (
        levels.join(totals, "source")
        .join(budgets, "source")
        .withColumn("cum_before", F.coalesce(F.sum("ltok").over(w), F.lit(0)))
        .select(
            "source",
            "qlevel",
            "budget_tokens",
            F.expr("budget_tokens div ttok").alias("n_full"),
            (
                F.col("cum_before") < F.col("budget_tokens") % F.col("ttok")
            ).alias("_extra"),
        )
    )
    return base.join(F.broadcast(rule), ["source", "qlevel"]).select(
        "doc_id",
        "source",
        "tokens",
        "qlevel",
        "budget_tokens",
        (F.col("n_full") + F.col("_extra").cast("long")).alias("n_epochs"),
    )


def mixture_assign_sql(docs_rel: str = "documents") -> str:
    """CTE-body twin of :func:`mixture_assign` (per-doc rows, default
    derived budgets): a flat chain ending in ``mx_doc`` — caller
    prepends ``WITH`` and selects from ``mx_doc``. DuckDB ``//`` is
    the BIGINT twin of Spark's ``div``; integer SUMs are BIGINT-cast
    per the oracle casting rule."""
    toks = "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)"
    qlev = f"CAST(round(({quality_score_sql('text')}) * {QLEVEL_SCALE}, 0) AS BIGINT)"
    mults = "[" + ", ".join(str(m) for m in MIX_MULTS) + "]"
    return f"""
mx_base AS (
  SELECT doc_id, source, {toks} AS tokens, {qlev} AS qlevel
  FROM {docs_rel}
),
mx_levels AS (
  SELECT source, qlevel, CAST(sum(tokens) AS BIGINT) AS ltok
  FROM mx_base GROUP BY source, qlevel
),
mx_tot AS (
  SELECT source, CAST(sum(ltok) AS BIGINT) AS ttok FROM mx_levels GROUP BY source
),
mx_budget AS (
  SELECT source,
         CAST(floor(list_extract({mults},
                CAST({hash60_sql('source', 'mix')} % 4 AS INT) + 1) * ttok)
              AS BIGINT) AS budget_tokens
  FROM mx_tot
),
mx_rule AS (
  SELECT l.source, l.qlevel, b.budget_tokens,
         b.budget_tokens // t.ttok AS n_full,
         CASE WHEN COALESCE(SUM(l.ltok) OVER (
                PARTITION BY l.source ORDER BY l.qlevel DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              < b.budget_tokens % t.ttok
              THEN 1 ELSE 0 END AS extra
  FROM mx_levels l
  JOIN mx_tot t USING (source)
  JOIN mx_budget b USING (source)
),
mx_doc AS (
  SELECT d.doc_id, d.source, d.tokens, d.qlevel, r.budget_tokens,
         CAST(r.n_full + r.extra AS BIGINT) AS n_epochs
  FROM mx_base d JOIN mx_rule r ON d.source = r.source AND d.qlevel = r.qlevel
)"""


# ---------------------------------------------------------------------------
# linear quality classifier (fastText-style hashed bag-of-words)
# ---------------------------------------------------------------------------

# feature-hashing width.  1024 keeps the weight table broadcast-trivial
# (8 KB of BIGINTs) while giving the ~20-word synthetic vocabulary
# collision-free buckets; a production fastText-style filter uses
# 2^20-2^21 buckets — still a ~16 MB broadcast, nowhere near a shuffle.
CLS_BUCKETS = 1024


def hashed_bow_buckets(
    docs: DataFrame,
    n_buckets: int = CLS_BUCKETS,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, bucket, c): hashed bag-of-words term counts — the feature
    extraction half of fastText-style classification (Joulin et al.
    2017, "Bag of Tricks"; feature hashing per Weinberger et al. 2009).
    bucket = hash60(term) % n_buckets, so the feature map is identical
    in all three engines. One corpus-sized partial-aggregated groupBy;
    cardinality ≤ tokens, typically ≪ (distinct terms are far fewer)."""
    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(text_col, " "), lambda w: F.length(w) > 0)
        ).alias("term"),
    )
    return (
        toks.select("doc_id", (hash60(F.col("term")) % n_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def linear_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = CLS_BUCKETS,
    bias_e6: int = 0,
    thr_e6: int = 0,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear text-classifier INFERENCE: the quality
    gate of a CCNet-style curation pipeline (a trained quality model
    scores every document; low scores are dropped or down-sampled).

    weights: (bucket, w_e6) — integer micro-unit weights, broadcast
    (bucket tables are KBs-to-MBs at any production width). Per doc:

        dot_e6  = Σ_buckets c(doc,b) · w_e6(b)          (exact BIGINT)
        label   = dot_e6 + n_tokens·bias_e6 >= n_tokens·thr_e6
                                                (exact integer compare)
        score   = sigmoid(dot_e6/(1e6·n_tokens) + bias)  (float, 6 dp)

    The keep/drop LABEL is decided entirely in integers — the
    length-averaged threshold comparison is cross-multiplied so no
    division happens before the decision; the sigmoid score is
    reporting convenience (same documented ulp-risk class as the LM
    micro-nat floors, operators/lm.py:26-31). Empty docs score at the
    bias alone. Scale shape: one corpus-sized groupBy (the bucket
    counts), one broadcast join, one per-doc re-aggregation; no
    corpus×corpus anything.
    """
    cnt = hashed_bow_buckets(docs, n_buckets, doc_col, text_col)
    dot = (
        cnt.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("w_e6")).cast("long").alias("dot_e6"))
    )
    base = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.size(
            F.filter(F.split(text_col, " "), lambda w: F.length(w) > 0)
        ).cast("long").alias("n_tokens"),
    )
    j = base.join(dot, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("dot_e6"), F.lit(0)).cast("long").alias("dot_e6"),
    )
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    raw = F.col("dot_e6") / (F.lit(1e6) * nt) + F.lit(bias_e6 / 1e6)
    return j.select(
        "doc_id",
        "n_tokens",
        "dot_e6",
        (
            F.col("dot_e6") + nt * F.lit(bias_e6) >= nt * F.lit(thr_e6)
        ).alias("keep"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6).alias("score"),
    )


def synthetic_weights(spark, n_buckets: int = CLS_BUCKETS) -> DataFrame:
    """Deterministic stand-in for a trained weight vector: w_e6(b) =
    hash60('w|b') % 2001 - 1000 (micro-units in [-1000, 1000], i.e.
    weights in [-0.001, 0.001]) — reproducible in SQL so the oracle
    needs no external model file. A real deployment loads its trained
    vector into the same (bucket, w_e6) shape."""
    return spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (hash60(F.concat(F.lit("w|"), F.col("id").cast("string"))) % 2001 - 1000)
        .cast("long")
        .alias("w_e6"),
    )


def linear_classifier_sql(
    docs_rel: str = "documents",
    n_buckets: int = CLS_BUCKETS,
    bias_e6: int = 0,
    thr_e6: int = 0,
) -> str:
    """DuckDB CTE-chain twin of synthetic_weights + linear_classifier_score
    (ending in CTE ``cls_out``)."""
    w = hash60_sql("'w|' || CAST(range AS VARCHAR)")
    t = hash60_sql("term")
    return f"""
cls_w AS (
  SELECT CAST(range AS BIGINT) AS bucket,
         CAST(({w} % 2001) - 1000 AS BIGINT) AS w_e6
  FROM range({n_buckets})
),
cls_t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS term
  FROM {docs_rel}
),
cls_c AS (
  SELECT doc_id, {t} % {n_buckets} AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM cls_t GROUP BY 1, 2
),
cls_dot AS (
  SELECT doc_id, CAST(SUM(c * w_e6) AS BIGINT) AS dot_e6
  FROM cls_c JOIN cls_w USING (bucket) GROUP BY 1
),
cls_n AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0))
              AS BIGINT) AS n_tokens
  FROM {docs_rel}
),
cls_out AS (
  SELECT n.doc_id, n.n_tokens,
         CAST(COALESCE(d.dot_e6, 0) AS BIGINT) AS dot_e6,
         COALESCE(d.dot_e6, 0) + greatest(n.n_tokens, 1) * {bias_e6}
           >= greatest(n.n_tokens, 1) * {thr_e6} AS keep,
         round(1.0 / (1.0 + exp(-(
           COALESCE(d.dot_e6, 0) / (1e6 * greatest(n.n_tokens, 1))
           + {bias_e6} / 1e6))), 6) AS score
  FROM cls_n n LEFT JOIN cls_dot d USING (doc_id)
)"""


# ---------------------------------------------------------------------------
# per-site boilerplate detection (template/footer stripping)
# ---------------------------------------------------------------------------

BP_WINDOW = 6  # tokens per fingerprint window (= dedup.SPAN_WINDOW class)
BP_MIN_DOCS = 3  # a window must recur in >= this many docs of the site
BP_FRAC_PCT = 30  # ... and in >= this % of the site's docs


def boilerplate_stats(
    docs: DataFrame,
    window: int = BP_WINDOW,
    min_docs: int = BP_MIN_DOCS,
    frac_pct: int = BP_FRAC_PCT,
    text_col: str = "text",
    site_col: str = "source",
) -> DataFrame:
    """Per-site boilerplate measurement: token windows recurring across
    a large fraction of one site's documents (nav bars, footers, cookie
    banners) are template text, not content — the classic crawl->corpus
    cleaning step (CommonCrawl/CCNet pipelines strip them before LLM
    training; the reference indexes pages whole and has no analogue).

    A window is boilerplate for site s iff it appears in >= min_docs
    distinct docs of s AND in >= frac_pct% of s's docs (integer
    arithmetic: nd*100 >= frac_pct*site_docs — no float thresholds).
    Coverage merges overlapping flagged windows per doc (fixed-width
    windows: positions p1<p2 overlap-or-touch iff p2-p1 <= window).

    Output per doc: n_tokens, n_boiler_tokens, boiler_e6 (micro-
    fraction, BIGINT) — the keep/strip decision and the cleaned-size
    accounting a mixture planner needs.

    Scale shape mirrors operators/dedup.repeated_spans: in-row window
    fingerprints (split -> sequence -> slice -> hash60, nothing per-row
    Python), ONE big shuffle keyed (site, whash) with map-side partial
    aggs, candidates-only join back, and a per-doc lag merge over the
    small flagged subset. Site cardinality never concentrates a
    reducer: the key includes the 60-bit window hash.
    """
    toks = F.split(F.col(text_col), " ")
    npos = F.size(toks) - window + 1
    whashes = F.when(
        npos >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(npos, F.lit(1))),
            lambda i: hash60(F.array_join(F.slice(toks, i, window), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    base = docs.select(
        "doc_id",
        F.col(site_col).alias("_site"),
        F.size(toks).cast("long").alias("n_tokens"),
        whashes.alias("_wh"),
    )
    wins = base.select(
        "doc_id", "_site", F.posexplode("_wh").alias("p0", "whash")
    ).select("doc_id", "_site", (F.col("p0") + 1).cast("long").alias("pos"), "whash")
    site_docs = base.groupBy("_site").agg(
        F.countDistinct("doc_id").alias("_sd")
    )
    bp = (
        wins.groupBy("_site", "whash")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .join(site_docs, "_site")
        .where(
            (F.col("_nd") >= min_docs)
            & (F.col("_nd") * 100 >= F.lit(frac_pct) * F.col("_sd"))
        )
        .select("_site", "whash")
    )
    bwin = wins.join(bp, ["_site", "whash"]).select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        bwin.withColumn(
            "_b",
            F.when(
                F.col("pos") - F.lag("pos").over(w_doc) <= window, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("_g", F.sum("_b").over(w_doc))
        .groupBy("doc_id", "_g")
        .agg(
            (F.max("pos") + window - F.min("pos")).cast("long").alias("_cov")
        )
        .groupBy("doc_id")
        .agg(F.sum("_cov").cast("long").alias("n_boiler_tokens"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_boiler_tokens", F.lit(0)).cast("long").alias(
                "n_boiler_tokens"
            ),
            F.expr(
                "cast((coalesce(n_boiler_tokens, 0) * 1000000L) div n_tokens as bigint)"
            ).alias("boiler_e6"),
        )
    )


def boilerplate_stats_sql(
    window: int = BP_WINDOW,
    min_docs: int = BP_MIN_DOCS,
    frac_pct: int = BP_FRAC_PCT,
    docs_cte: str = "documents",
) -> str:
    """DuckDB twin of :func:`boilerplate_stats` as CTE text ending in
    `bpstats(doc_id, n_tokens, n_boiler_tokens, boiler_e6)`; expects
    `{docs_cte}(doc_id, source, text)`."""
    return f"""
  bp_base AS (
    SELECT doc_id, source AS _site,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           string_split(text, ' ') AS _toks
    FROM {docs_cte}
  ),
  bp_wins AS (
    SELECT doc_id, _site,
      unnest(range(1, greatest(len(_toks) - {window} + 1, 0) + 1)) AS pos,
      unnest(list_transform(
        range(1, greatest(len(_toks) - {window} + 1, 0) + 1),
        i -> ('0x' || substr(md5(array_to_string(
               list_slice(_toks, i, i + {window} - 1), ' ')), 1, 15))::BIGINT
      )) AS whash
    FROM bp_base
  ),
  bp_site AS (SELECT _site, count(DISTINCT doc_id) AS _sd
              FROM bp_base GROUP BY _site),
  bp_hash AS (
    SELECT w._site, w.whash
    FROM bp_wins w
    GROUP BY w._site, w.whash
    HAVING count(DISTINCT w.doc_id) >= {min_docs}
       AND count(DISTINCT w.doc_id) * 100 >=
           {frac_pct} * (SELECT _sd FROM bp_site s WHERE s._site = w._site)
  ),
  bp_flag AS (
    SELECT w.doc_id, w.pos
    FROM bp_wins w JOIN bp_hash h ON w._site = h._site AND w.whash = h.whash
  ),
  bp_brk AS (
    SELECT doc_id, pos,
      CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                <= {window} THEN 0 ELSE 1 END AS b
    FROM bp_flag
  ),
  bp_grp AS (
    SELECT doc_id, pos,
      CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS g
    FROM bp_brk
  ),
  bp_cov AS (
    SELECT doc_id, CAST(sum(cov) AS BIGINT) AS n_boiler_tokens FROM (
      SELECT doc_id, g, max(pos) + {window} - min(pos) AS cov
      FROM bp_grp GROUP BY doc_id, g
    ) GROUP BY doc_id
  ),
  bpstats AS (
    SELECT b.doc_id, b.n_tokens,
           CAST(COALESCE(c.n_boiler_tokens, 0) AS BIGINT) AS n_boiler_tokens,
           CAST((COALESCE(c.n_boiler_tokens, 0) * 1000000) // b.n_tokens
                AS BIGINT) AS boiler_e6
    FROM bp_base b LEFT JOIN bp_cov c ON b.doc_id = c.doc_id
  )"""
