"""Mirror-host detection — hosts serving largely-identical content.

The reference engine dedups search *results* by host (seenHosts,
PageSearcher.cpp:481-538) and keys its content store on md5(url)
(KeyValueDB.hpp:68-83), so a site mirrored under a second hostname is
crawled, stored and indexed twice — the classic crawl-budget leak a
web-scale deployment detects first (Bharat & Broder 1999, "Mirror,
mirror on the Web: a study of host pairs with replicated content").
This operator finds host pairs whose page content overlaps: pages are
fingerprinted (md5 of text), each host pair is scored by the number
of distinct fingerprints it shares, and containment is reported
against the smaller host so a partial mirror of a large site still
surfaces.

Scale shape (100 TB): one shuffle keyed on the content fingerprint
(uniform by construction — md5); the pair fan-out inside one
fingerprint bucket is bounded by ``max_hosts_per_hash`` (a fingerprint
carried by more hosts than that is boilerplate — an empty page, a
navigation stub — and is dropped, the same df-cap discipline as
dedup.repeated_spans); host sizes join back onto the pairs with NO
forced broadcast — the per-host aggregate is unbounded (~10^8 hosts
on the open web, too big for a driver broadcast), so AQE picks
broadcast when it measures small and a uniform host-keyed shuffle
otherwise. Never an all-pairs host product. The
fingerprint is the full md5 hex (exact); a deployment squeezing
shuffle bytes can swap in hash60 at ~17 expected collisions per 10^10
pages, which containment thresholds don't feel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_HOSTS_PER_HASH = 16  # fingerprints on more hosts = boilerplate, dropped
MIN_SHARED = 2  # one shared page is coincidence, not a mirror


def host_content_sigs(
    docs: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """(host, chash) distinct — one row per content fingerprint a host
    serves; re-posts of one page inside a host collapse here."""
    return docs.select(
        F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("chash")
    ).distinct()


def mirror_pairs(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    max_hosts_per_hash: int = MAX_HOSTS_PER_HASH,
    min_shared: int = MIN_SHARED,
) -> DataFrame:
    """Host pairs ranked by shared distinct content fingerprints.

    Returns (host_a, host_b, n_shared, n_a, n_b, containment_e6) with
    host_a < host_b; ``containment_e6 = n_shared * 1e6 DIV
    min(n_a, n_b)`` in exact integer arithmetic (micro-points), so a
    full mirror of the smaller host scores 1_000_000. DuckDB twin:
    queries.SQL_MIRROR_HOSTS.
    """
    sigs = host_content_sigs(docs, host_col, text_col)
    sizes = sigs.groupBy("host").agg(
        F.count("*").cast("long").alias("n_pages")
    )
    # pairs are generated INSIDE one fingerprint's host set (array ops,
    # no self-join): collect_set is bounded by max_hosts_per_hash, and
    # `y > x` emits each unordered pair exactly once with host_a<host_b.
    buckets = (
        sigs.groupBy("chash")
        .agg(F.collect_set("host").alias("hosts"))
        .where(
            (F.size("hosts") >= 2) & (F.size("hosts") <= max_hosts_per_hash)
        )
    )
    hosts = F.col("hosts")
    pair_structs = F.flatten(
        F.transform(
            hosts,
            lambda x: F.transform(
                F.filter(hosts, lambda y: y > x),
                lambda y: F.struct(x.alias("host_a"), y.alias("host_b")),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.host_a", "p.host_b")
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("n_pages").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("n_pages").alias("n_b")
            ),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_shared * 1000000 DIV least(n_a, n_b) AS BIGINT)"
            ).alias("containment_e6"),
        )
    )
