"""Point-in-time (as-of) join and multi-resolution time rollup.

Operators Spark lacks natively but a training-data / analytics pipeline
needs for point-in-time correctness (feature attribution without
future leakage) and hypertable-style downsampling. The reference
engine's analogue is its time-ordered PendDB scan picking the most
recent eligible entry per host (SearchEngine/pendDB.h sleep-time
ordering); here the general operator is re-expressed as one
shuffle-per-key window — no per-row Python, no range explosion.

Scale notes (100 TB):
- ``asof_join`` is ONE hash shuffle of (left ∪ right) on the join key
  followed by a partitioned running ``last(ignorenulls)`` window — the
  union trick turns a range join (which Spark would otherwise plan as
  a broadcast-nested-loop or cartesian range join) into a linear scan
  per key partition. Skewed keys behave exactly like any groupBy key:
  AQE skew handling applies, and the window frame is running (no
  whole-partition buffering; Spark's WindowExec streams a running
  frame).
- ``rollup_time`` is a single pass with GROUPING SETS — Spark computes
  all resolutions in one shuffle (partial aggregation map-side), vs
  one job per resolution for the naive loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``key`` group
    (backward, inclusive — DuckDB ``ASOF LEFT JOIN`` semantics, which
    the oracle twin uses as an independent implementation).

    ``right_payload`` columns come back suffixed ``_r``; left rows with
    no eligible right row keep them NULL. ``tiebreak`` (a right
    column, e.g. an event id) makes the winner deterministic when two
    right rows share (key, right_ts) — pass it whenever right
    timestamps are not unique per key.

    Plan shape: tag-union of both sides -> one Exchange on ``key`` ->
    running last(ignorenulls) window ordered by (ts, side, tiebreak)
    with right rows sorting before left rows at equal ts (inclusive
    match) -> filter back to left rows. No join node at all, so no
    range-join fallback to nested-loop.
    """
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("__r")
    tb: Column = (
        F.col(tiebreak).cast("string") if tiebreak else F.lit("")
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        payload,
    )
    left_cols = left.columns
    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit("").alias("__tb"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l2.unionByName(r2, allowMissingColumns=True)
    matched = matched.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = matched.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[
            F.col("__match").getField(c).alias(f"{c}_r")
            for c in right_payload
        ],
    )
    return out


def rollup_time(
    events: DataFrame,
    ts: str,
    group: str,
    value: str,
) -> DataFrame:
    """Hypertable-style multi-resolution rollup in ONE pass: per
    (group, day) and per (group, day, hour) aggregates via GROUPING
    SETS, tagged by a ``resolution`` column. One shuffle computes both
    resolutions (Spark expands grouping sets before the partial
    aggregate, so the map-side combine still applies).

    ``value`` should already be an exact (integer) measure — callers
    doing float sums pass a fixed-point-scaled column so both engines
    sum exactly (the repo-wide ``_e`` convention)."""
    day = F.date_trunc("day", F.col(ts)).alias("day")
    hour = F.date_trunc("hour", F.col(ts)).alias("hour")
    base = events.select(F.col(group).alias("g"), day, hour, F.col(value).alias("v"))
    base.createOrReplaceTempView("__rollup_base")
    return base.sparkSession.sql(
        """
        SELECT g, day, hour,
               CASE WHEN GROUPING(hour) = 1 THEN 'day' ELSE 'hour' END
                 AS resolution,
               CAST(count(v) AS BIGINT) AS n_events,
               CAST(sum(v) AS BIGINT) AS sum_value
        FROM __rollup_base
        GROUP BY GROUPING SETS ((g, day), (g, day, hour))
        """
    )


def band_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_val: str,
    right_val: str,
    max_dist: int,
) -> DataFrame:
    """All (left, right) pairs sharing `keys` with
    |left_val - right_val| <= max_dist — the NEAR / interval-proximity
    join — WITHOUT a per-key cartesian product.

    Naive form is `JOIN ON keys AND abs(l-r) <= d`: Spark plans the
    inequality as a row-pair filter after a key-equi join, which
    degenerates on hot keys (a doc/sensor with n rows costs n^2). The
    banded form buckets both sides into width-`max_dist` bands
    (band = value div max_dist); a qualifying pair can only differ by
    at most one band index, so the LEFT side explodes to its 3
    candidate bands and the join key becomes (keys, band) — exact
    equi-join, hash-shuffled, hot keys now spread across bands. Each
    true pair appears exactly once (the right row owns one band).
    Cost: 3x left rows through the shuffle in exchange for bounded
    reducers — the standard interval-join banding (e.g. Flink's
    interval join, GeoSpark grid join).

    Values must be NON-NEGATIVE integrals (positions, epoch units) —
    banding uses truncating `div`, which equals floor-division only at
    >= 0. Returns the joined frame with both value columns; caller
    projects/aggregates.
    """
    assert max_dist >= 1
    lb = F.expr(f"cast({left_val} div {max_dist} as bigint)")
    rb = F.expr(f"cast({right_val} div {max_dist} as bigint)")
    lx = left.withColumn(
        "_band", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rx = right.withColumn("_band", rb)
    out = lx.join(rx, keys + ["_band"]).where(
        F.abs(F.col(left_val) - F.col(right_val)) <= max_dist
    )
    return out.drop("_band")
