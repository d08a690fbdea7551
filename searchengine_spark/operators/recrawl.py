"""Adaptive recrawl scheduling (freshness-driven revisit intervals).

The reference crawls each URL once: the seen set (SearchEngine.h:517-522)
permanently retires a fetched key, and freshness is out of scope for its
one-shot index build. A production frontier at 10^10 URLs must also
decide *when to come back*: news front pages change hourly, archive
pages never. The classic policy (Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003; used in this
exponential-backoff form by Heritrix's wayback-style recrawl and most
production crawlers) is multiplicative backoff on observed change:

    interval = 1 after a round that observed a change,
    doubles per unchanged observation, capped at MAX_INTERVAL.

Because the policy resets on every change, the recurrence has a closed
form over a change-observation log: with R observed rounds and
last_change = max round whose fetch saw a changed content hash,

    interval          = min(2^(R - last_change), MAX_INTERVAL)
    next_fetch_round  = R + interval

so the whole scheduler is ONE partial-aggregation groupBy over the
observation log — no per-URL recurrence, no window, no iteration. That
is the form that survives 10^10 URLs: observations arrive as (url_md5,
round, changed) appends (changed = content_hash != previous hash,
computed at fetch time), and the schedule is a single agg + projection.

Sandbox twin: `synthetic_changes` derives a deterministic observation
log from url_md5 via the shared hash60 (per-URL volatility class ->
per-round Bernoulli draw), so the DuckDB oracle regenerates the
identical log and the schedule is hash-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashes import hash60, hash60_py, hash60_sql

N_ROUNDS = 6  # observed rounds in the synthetic log
MAX_INTERVAL = 16  # reference-free cap; mirrors the crawl-delay cap class
RATES = (5, 25, 55, 90)  # % change probability per volatility class


def change_rate_expr(key: Column | str) -> Column:
    """Volatility class of a URL: RATES[hash60('vol|'+key) % 4]."""
    k = F.col(key) if isinstance(key, str) else key
    idx = F.pmod(hash60(k, "vol"), F.lit(len(RATES)))
    expr = F.lit(RATES[0])
    for i, r in enumerate(RATES[1:], start=1):
        expr = F.when(idx == i, F.lit(r)).otherwise(expr)
    return expr.cast("int")


def change_rate_sql(key: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN {r}" for i, r in enumerate(RATES)
    )
    return f"(CASE ({hash60_sql(key, 'vol')} % {len(RATES)}) {whens} END)"


def change_rate_py(key: str) -> int:
    return RATES[hash60_py(key, "vol") % len(RATES)]


def synthetic_changes(urls: DataFrame, n_rounds: int = N_ROUNDS) -> DataFrame:
    """urls(url_md5, ...) -> observation log (url_md5, r, chg).

    chg(url, r) = [hash60('chg<r>|' + url_md5) % 100 < rate(url)] — a
    pure function of (url_md5, r), so the oracle regenerates it
    bit-identically. Production replaces this with the real fetch-time
    comparison of consecutive content hashes appended each round.
    """
    rounds = F.explode(F.sequence(F.lit(1), F.lit(n_rounds))).alias("r")
    obs = urls.select("url_md5", rounds).withColumn(
        "_draw",
        F.pmod(
            hash60(
                F.concat(
                    F.lit("chg"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    F.col("url_md5"),
                )
            ),
            F.lit(100),
        ),
    )
    return obs.select(
        "url_md5",
        "r",
        (F.col("_draw") < change_rate_expr("url_md5")).cast("int").alias("chg"),
    )


def synthetic_changes_sql(urls_cte: str, n_rounds: int = N_ROUNDS) -> str:
    """DuckDB twin of :func:`synthetic_changes` as CTE text; expects
    `{urls_cte}` to provide distinct url_md5 rows."""
    draw = hash60_sql(f"'chg' || r || '|' || url_md5")
    return f"""
  rounds AS (SELECT unnest(range(1, {n_rounds} + 1)) AS r),
  obs AS (
    SELECT u.url_md5, CAST(r.r AS BIGINT) AS r,
           CAST({draw} % 100 < {change_rate_sql('url_md5')} AS INT) AS chg
    FROM {urls_cte} u CROSS JOIN rounds r
  )"""


def recrawl_schedule(
    obs: DataFrame,
    n_rounds: int = N_ROUNDS,
    max_interval: int = MAX_INTERVAL,
) -> DataFrame:
    """Observation log (url_md5, r, chg) -> per-URL revisit schedule.

    Output: url_md5, n_changes, last_change, revisit_interval,
    next_fetch_round — all BIGINT (exact integers, oracle-portable).
    One groupBy(url_md5) with map-side partial agg; the backoff closed
    form is a pure projection.
    """
    agg = obs.groupBy("url_md5").agg(
        F.sum("chg").cast("long").alias("n_changes"),
        F.max(F.col("r") * F.col("chg")).cast("long").alias("last_change"),
    )
    # F.shiftleft takes a literal bit count; the column-exponent form is
    # SQL-only
    interval = F.least(
        F.expr(
            f"cast(shiftleft(1, cast({n_rounds} - last_change as int)) as bigint)"
        ),
        F.lit(max_interval).cast("long"),
    )
    return agg.select(
        "url_md5",
        "n_changes",
        "last_change",
        interval.alias("revisit_interval"),
        (F.lit(n_rounds) + interval).cast("long").alias("next_fetch_round"),
    )


def recrawl_schedule_sql(
    n_rounds: int = N_ROUNDS, max_interval: int = MAX_INTERVAL
) -> str:
    """DuckDB twin over the `obs` CTE from synthetic_changes_sql."""
    return f"""
  ragg AS (
    SELECT url_md5,
           CAST(sum(chg) AS BIGINT) AS n_changes,
           CAST(max(r * chg) AS BIGINT) AS last_change
    FROM obs GROUP BY url_md5
  ),
  sched AS (
    SELECT url_md5, n_changes, last_change,
           CAST(least(1 << ({n_rounds} - last_change), {max_interval}) AS BIGINT)
             AS revisit_interval,
           CAST({n_rounds}
                + least(1 << ({n_rounds} - last_change), {max_interval})
                AS BIGINT) AS next_fetch_round
    FROM ragg
  )"""


def recrawl_schedule_py(
    changes: list[int], n_rounds: int = N_ROUNDS, max_interval: int = MAX_INTERVAL
) -> tuple[int, int, int, int]:
    """Pure twin over a per-URL change list (1-indexed rounds); also
    the direct simulation of the doubling recurrence — test_operators
    pins the closed form against stepping it round by round."""
    n_changes = sum(changes)
    last_change = max((r for r, c in enumerate(changes, start=1) if c), default=0)
    interval = min(1 << (n_rounds - last_change), max_interval)
    return n_changes, last_change, interval, n_rounds + interval
