"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the deterministic frontier scheduling round
                (the engine's core operator) at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                the training-data pipeline ops), each (spark, sf_dir)
                -> DataFrame via searchengine_spark.queries.
oracle_sql()  — the DuckDB SQL twins (same column names; derived
                universes regenerated in SQL from the same portable
                md5-based hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.queries import ORACLE_SQL, QUERIES


def _pin_session(spark: SparkSession) -> None:
    """The engine's semantics assume classic-mode SQL + UTC (oracle SQL
    twins are written against them); pin the runtime confs in case the
    harness built the session with different defaults."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session(spark)
    return QUERIES["schedule_round"](spark, "/root/testdata/sf0.001")


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
