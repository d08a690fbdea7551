"""Fuzzy term suggestion ("did you mean") over the dictionary —
SymSpell-style symmetric-deletion candidate generation with an exact
Levenshtein verify.

The reference's console drops an unknown term (empty dict range →
no results, PageSearcher.cpp:412-427); a production search front end
wants a correction suggestion instead. The scale-safe shape (Garbe's
SymSpell, public domain): a dict word w and a query q are within
Levenshtein distance 1 ONLY IF they share a key in
``{x} ∪ deletions1(x)`` — so candidate generation is an EQUI-JOIN on
deletion keys (dictionary-sized ×(len+1) key inflation, query side
broadcast), never a distance scan of the vocabulary. Key collisions
overshoot (equal-length words sharing a deletion are distance ≤ 2,
e.g. 'abc'/'bca' share 'bc'), so every candidate pair is verified
with the built-in ``levenshtein`` — plain Levenshtein in BOTH engines
(no Damerau transposition: 'sotr' does NOT suggest 'sort'), which is
what makes the operator oracle-pinnable.

100 TB shape: the dictionary is vocabulary-sized (≪ corpus); the only
shuffles are the dict build groupBy and the key equi-join (query side
broadcast, ≤ |queries|·(maxlen+1) keys); the exact verify runs only on
key-colliding candidates; the per-query rank window sees only that
query's verified candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def deletion_keys(term: Column) -> Column:
    """``{term} ∪ single-character-deletions(term)`` as an array
    (array_union dedups, e.g. 'aa' → ['aa','a']). Assumes non-empty
    strings (tokenizer output never yields '')."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            term.substr(F.lit(1), i - 1),
            term.substr(i + 1, F.length(term)),
        ),
    )
    return F.array_union(F.array(term), dels)


def spell_suggest(
    dict_df: DataFrame,
    queries: list[str],
    max_suggestions: int = 3,
    term_col: str = "term",
    freq_col: str = "n_docs",
) -> DataFrame:
    """Suggestions within Levenshtein distance ≤ 1 for each query
    word, ranked by dictionary document frequency.

    dict_df: (term, n_docs). Returns (query, suggestion, distance,
    n_docs, rank) — rank 1..max_suggestions per query by
    (n_docs desc, suggestion); a query with no in-distance dict word
    (or an exactly-spelled rare one) contributes only what verifies.
    Distance 0 rows (the query IS a dict word) are kept — they signal
    "correctly spelled" with the word's own frequency.
    """
    if not queries:
        raise ValueError("empty query list")
    if any(not q for q in queries):
        raise ValueError("queries must be non-empty strings")
    if len(set(queries)) != len(queries):
        raise ValueError("queries must be distinct")
    spark = dict_df.sparkSession
    d = dict_df.select(
        F.col(term_col).alias("suggestion"),
        F.col(freq_col).cast("long").alias("n_docs"),
    )
    dkeys = d.select(
        "suggestion", F.explode(deletion_keys(F.col("suggestion"))).alias("key")
    ).distinct()
    qdf = spark.createDataFrame([(q,) for q in queries], "query string")
    qkeys = qdf.select(
        "query", F.explode(deletion_keys(F.col("query"))).alias("key")
    ).distinct()
    cand = (
        dkeys.join(F.broadcast(qkeys), "key")
        .select("query", "suggestion")
        .distinct()
    )
    ver = cand.where(
        F.levenshtein("query", "suggestion") <= 1
    ).withColumn(
        "distance", F.levenshtein("query", "suggestion").cast("int")
    )
    ranked = ver.join(d, "suggestion").withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("query").orderBy(F.desc("n_docs"), "suggestion"))
        .cast("int"),
    )
    return ranked.where(F.col("rank") <= max_suggestions).select(
        "query", "suggestion", "distance", "n_docs", "rank"
    )
