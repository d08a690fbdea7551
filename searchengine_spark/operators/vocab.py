"""BPE vocabulary induction over the document corpus.

The reference engine counts fixed words (getWords,
SearchEngine.cpp:282-490) and has no subword model; a training-data
pipeline at 100 TB needs one. This module implements byte-pair-encoding
vocabulary *training* (merge-rule induction) and corpus *encoding*
statistics, Spark-first:

Scale design (the word-level Sennrich formulation):
  - ONE corpus-scale pass builds the word-frequency table
    (explode + groupBy word, map-side combine) — |V| rows, not corpus
    tokens.  Every merge iteration thereafter runs over the vocab-sized
    table only: pair-count agg (partial agg absorbs the heavy skew on
    frequent pairs) + a 1-row argmax collect + a codegen'd replace()
    projection.  N merges = N small jobs after a single big one.
  - The word table is persisted MEMORY_AND_DISK for the duration of the
    merge loop and unpersisted in a finally: (catalog queries must not
    leak cache, see CLAUDE.md).
  - BPE merge selection is inherently sequential (merge i+1's counts
    depend on merge i); the 1-row-per-merge collect is the minimal
    driver round-trip, bounded by n_merges.

Engine-portable merge application: a word's symbol sequence
[s1..sn] is encoded as the string  D s1 D s2 D ... D sn D  with
D = "\\x1f\\x1f" (two unit separators; \\x1f never occurs in corpus
text).  Applying merge (a, b) is then the literal replacement

    "\\x1f" + a + D + b + "\\x1f"   ->   "\\x1f" + a + b + "\\x1f"

whose greedy left-to-right non-overlapping semantics are identical in
Java String.replace (Spark `replace`), DuckDB `replace`, and Python
str.replace — including the overlapping-run case a == b ("aaa" with
(a,a) -> ["aa","a"]), because all three scanners resume AFTER the
replacement.  The single-\\x1f pattern edges consume the inner half of
each boundary delimiter and the replacement restores it, so the
delimiter structure D survives every merge; since symbols never
contain \\x1f, the pattern can only match complete symbols.  This keeps
the hot path in whole-stage codegen on Spark and makes the DuckDB twin
a plain chained-CTE replica (no fold/reduce needed in either engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SEP = "\x1f"  # unit separator: never appears in corpus words
DLM = SEP + SEP  # symbol delimiter
N_MERGES = 8  # test-scale default; production vocabularies use 10k-50k

_DD_SQL = "(chr(31)||chr(31))"  # DLM as a DuckDB expression
_D_SQL = "chr(31)"

MERGES_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


# ---------------------------------------------------------------------------
# word table + symbol representation
# ---------------------------------------------------------------------------


def encode_word_expr(word: Column | str) -> Column:
    """word -> D c1 D c2 D ... D cn D (initial symbols = characters)."""
    c = F.col(word) if isinstance(word, str) else word
    chars = F.transform(
        F.sequence(F.lit(1), F.length(c)), lambda i: c.substr(i, F.lit(1))
    )
    return F.concat(F.lit(DLM), F.array_join(chars, DLM), F.lit(DLM))


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, rep): corpus word frequencies + initial symbol rep.

    The ONLY corpus-scale pass of BPE training; groupBy(word) partial
    agg collapses each partition to near-vocab size before the shuffle.
    """
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn("rep", encode_word_expr("word"))


def syms_expr(rep: Column | str) -> Column:
    """Delimited rep -> array of symbols (drops boundary empties)."""
    c = F.col(rep) if isinstance(rep, str) else rep
    return F.filter(F.split(c, DLM), lambda x: x != "")


def pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, pc): weighted adjacent-pair counts over current symbols.

    Pair keys are skewed (the next merge IS the most frequent pair) but
    the aggregation is partial: each task pre-sums its own pairs, so
    the hot key arrives at the reducer as one row per task.
    """
    syms = syms_expr("rep")
    pairs = F.transform(
        F.slice(syms, 1, F.size(syms) - 1),
        lambda s, i: F.struct(
            s.alias("a"), F.element_at(syms, i + F.lit(2)).alias("b")
        ),
    )
    return (
        words.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pc"))
    )


def apply_merge_expr(rep: Column | str, a: str, b: str) -> Column:
    """Apply merge (a, b) to a delimited rep — native replace()."""
    c = F.col(rep) if isinstance(rep, str) else rep
    return F.replace(
        c, F.lit(SEP + a + DLM + b + SEP), F.lit(SEP + a + b + SEP)
    )


# ---------------------------------------------------------------------------
# training loop
# ---------------------------------------------------------------------------


def learn_merges(
    words: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Run the sequential merge loop; returns merge-table rows.

    Winner rule: max weighted pair count, ties broken by (a, b)
    ascending — both engines compare ASCII bytewise, so the rule is
    engine-portable. Stops early if no adjacent pairs remain (the SQL
    twin's empty-CTE cascade produces the same truncated table).
    """
    rows: list[tuple[int, str, str, str, int]] = []
    cur = words
    for i in range(1, n_merges + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, pc = top[0]["a"], top[0]["b"], int(top[0]["pc"])
        rows.append((i, a, b, a + b, pc))
        cur = cur.withColumn("rep", apply_merge_expr("rep", a, b))
    return rows


def bpe_merges(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """Merge table (merge_rank, left_sym, right_sym, merged, pair_count).

    The word table is persisted across the loop so each merge iteration
    scans |V| rows instead of replaying the corpus pass; the chained
    replace() lineage on top of the persisted base is n_merges nested
    string expressions — trivially within codegen limits.
    """
    words = word_table(docs).persist()
    try:
        words.count()  # materialize before the loop
        rows = learn_merges(words, n_merges)
    finally:
        words.unpersist()
    return spark.createDataFrame(rows, MERGES_SCHEMA)


def encoded_words(
    words: DataFrame, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    """Word table with all merges applied + per-word BPE token count."""
    rep = F.col("rep")
    for _, a, b, _, _ in merges:
        rep = F.replace(
            rep, F.lit(SEP + a + DLM + b + SEP), F.lit(SEP + a + b + SEP)
        )
    return words.withColumn("rep", rep).withColumn(
        "n_tokens", F.size(syms_expr("rep")).cast("long")
    )


def bpe_encode_stats(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """Per-source encoding stats after training n_merges BPE merges.

    docs are re-exploded to words and joined to the encoded vocab —
    vocab is tiny relative to the corpus, so the join broadcasts (AQE
    picks it from size; at a 10^7-word production vocab it degrades
    gracefully to a shuffle join on the word key).  Outputs per source:
    n_docs, n_words, bpe_tokens, chars_per_token (corpus compression).
    """
    words = word_table(docs).persist()
    try:
        words.count()
        merges = learn_merges(words, n_merges)
        enc = encoded_words(words, merges).select("word", "n_tokens")
        per_word = docs.select(
            "doc_id",
            "source",
            F.explode(F.split("text", " ")).alias("word"),
        ).where(F.col("word") != "")
        joined = per_word.join(enc, "word")
        out = (
            joined.groupBy("source")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_tokens").alias("bpe_tokens"),
                F.round(
                    F.sum(F.length("word")).cast("double")
                    / F.sum("n_tokens"),
                    4,
                ).alias("chars_per_token"),
            )
        )
        # materialize before unpersisting the loop cache: the returned
        # rows are literal, so no lineage escapes the finally block
        rows = out.collect()
    finally:
        words.unpersist()
    schema = StructType(
        [
            StructField("source", StringType(), True),
            StructField("n_docs", LongType(), False),
            StructField("n_words", LongType(), False),
            StructField("bpe_tokens", LongType(), False),
            StructField("chars_per_token", DoubleType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# DuckDB SQL twin builders
# ---------------------------------------------------------------------------


def words0_sql(source_table: str = "documents", text: str = "text") -> str:
    return f"""words_0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         {_DD_SQL} || array_to_string(
           list_transform(range(1, length(word)+1), i -> word[i]),
           {_DD_SQL}) || {_DD_SQL} AS rep
  FROM (SELECT unnest(string_split({text}, ' ')) AS word FROM {source_table})
  WHERE word <> '' GROUP BY word
)"""


def _stage_sql(i: int) -> str:
    """pairs_i / win_i / words_i CTEs for merge stage i >= 1."""
    prev = f"words_{i - 1}"
    return f"""pairs_{i} AS (
  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pc FROM (
    SELECT cnt, syms[i] AS a, syms[i+1] AS b FROM (
      SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM (
        SELECT cnt,
               list_filter(string_split(rep, {_DD_SQL}), x -> x <> '') AS syms
        FROM {prev})))
  GROUP BY a, b
),
win_{i} AS (
  SELECT a, b, pc FROM pairs_{i} ORDER BY pc DESC, a, b LIMIT 1
),
words_{i} AS (
  SELECT word, cnt,
         replace(rep,
                 {_D_SQL}||w.a||{_DD_SQL}||w.b||{_D_SQL},
                 {_D_SQL}||w.a||w.b||{_D_SQL}) AS rep
  FROM {prev}, win_{i} w
)"""


def bpe_ctes_sql(
    n_merges: int = N_MERGES,
    source_table: str = "documents",
    text: str = "text",
) -> str:
    """CTE chain words_0 .. words_N, win_1 .. win_N (no WITH prefix)."""
    parts = [words0_sql(source_table, text)]
    parts += [_stage_sql(i) for i in range(1, n_merges + 1)]
    return ",\n".join(parts)


def merges_select_sql(n_merges: int = N_MERGES) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, a AS left_sym, "
        f"b AS right_sym, a||b AS merged, pc AS pair_count FROM win_{i}"
        for i in range(1, n_merges + 1)
    )
    return f"SELECT * FROM (\n{unions}\n) ORDER BY merge_rank"


def encode_stats_select_sql(
    n_merges: int = N_MERGES, source_table: str = "documents"
) -> str:
    """Needs bpe_ctes_sql CTEs in scope; adds enc + per-source rollup."""
    return f"""enc AS (
  SELECT word,
         CAST(len(list_filter(string_split(rep, {_DD_SQL}), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM words_{n_merges}
),
perword AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
  FROM {source_table}
),
joined AS (
  SELECT p.doc_id, p.source, p.word, e.n_tokens
  FROM perword p JOIN enc e USING (word) WHERE p.word <> ''
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS bpe_tokens,
       round(CAST(sum(length(word)) AS DOUBLE) / sum(n_tokens), 4)
         AS chars_per_token
FROM joined GROUP BY source"""


# ---------------------------------------------------------------------------
# pure-Python reference (third form, pinned row-equal in tests)
# ---------------------------------------------------------------------------


def bpe_apply_py(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge — the semantics the
    delimited-string replace() realizes in both SQL engines."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train_py(
    word_counts: dict[str, int], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, str, int]]:
    state = {w: list(w) for w in word_counts}
    rows: list[tuple[int, str, str, str, int]] = []
    for i in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            c = word_counts[w]
            for j in range(len(syms) - 1):
                k = (syms[j], syms[j + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (a, b), pc = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rows.append((i, a, b, a + b, pc))
        state = {w: bpe_apply_py(s, a, b) for w, s in state.items()}
    return rows


# ---------------------------------------------------------------------------
# batched training (the production scale path)
# ---------------------------------------------------------------------------


def _pick_nonconflicting(top, limit: int):
    """Greedy rank-order selection of pairs with pairwise-DISJOINT
    symbol sets. Disjointness is what keeps the batch exact: a merge
    never removes a symbol (it fuses two into one that stays between
    its neighbors), so an occurrence of (c,d) can neither be created
    nor destroyed by applying (a,b) when {a,b} ∩ {c,d} = ∅ — every
    count recorded for the batch equals what a sequential loop would
    have seen when it reached that pair, and the in-batch replaces
    commute."""
    used: set[str] = set()
    picked = []
    for r in top:
        if len(picked) >= limit:
            break
        if r["a"] in used or r["b"] in used:
            continue
        picked.append(r)
        used.update((r["a"], r["b"]))
    return picked


def learn_merges_batched(
    words: DataFrame,
    n_merges: int,
    batch: int = 8,
    overscan: int = 4,
) -> list[tuple[int, str, str, str, int]]:
    """BPE training with B merges per corpus-table pass.

    A 30k-merge production vocabulary cannot pay 30k sequential driver
    round-trips; this variant collects the top batch*overscan pairs
    once per round and applies every pairwise-non-conflicting prefix
    of that ranking in one chained-replace projection — ~B× fewer
    jobs. batch=1 is EXACTLY the sequential algorithm; batch>1 is the
    standard distributed-BPE compromise: in-batch counts are exact
    (see _pick_nonconflicting), but a merge created inside the batch
    (e.g. 'ab') cannot be a candidate until the next round, so the
    merge ORDER can differ from sequential BPE where a fresh pair
    would have outranked the rest. Deterministic for a fixed (batch,
    overscan): same corpus -> same merge table on every engine."""
    rows: list[tuple[int, str, str, str, int]] = []
    cur = words
    while len(rows) < n_merges:
        top = (
            pair_counts(cur)
            .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .limit(batch * overscan)
            .collect()
        )
        if not top:
            break
        picked = _pick_nonconflicting(top, min(batch, n_merges - len(rows)))
        for r in picked:
            rows.append(
                (len(rows) + 1, r["a"], r["b"], r["a"] + r["b"], int(r["pc"]))
            )
            cur = cur.withColumn(
                "rep", apply_merge_expr("rep", r["a"], r["b"])
            )
    return rows


def bpe_train_batched_py(
    word_counts: dict[str, int],
    n_merges: int,
    batch: int = 8,
    overscan: int = 4,
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python twin of learn_merges_batched (same ranking, same
    greedy disjoint selection, same per-round application)."""
    state = {w: list(w) for w in word_counts}
    rows: list[tuple[int, str, str, str, int]] = []
    while len(rows) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            c = word_counts[w]
            for j in range(len(syms) - 1):
                k = (syms[j], syms[j + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[: batch * overscan]
        top = [{"a": a, "b": b, "pc": pc} for (a, b), pc in ranked]
        picked = _pick_nonconflicting(top, min(batch, n_merges - len(rows)))
        for r in picked:
            rows.append(
                (len(rows) + 1, r["a"], r["b"], r["a"] + r["b"], int(r["pc"]))
            )
            state = {
                w: bpe_apply_py(s, r["a"], r["b"]) for w, s in state.items()
            }
    return rows
