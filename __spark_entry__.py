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
        # The driver runs the whole catalog through ONE session, each
        # query followed by its DuckDB oracle in the same VM. Drop any
        # storage left by a previous query and nudge the JVM to return
        # heap to the OS so the oracle's allocator has headroom.
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        return fn(spark, sf_dir)

    return run


# DuckDB runs multi-statement SQL through execute(); cap its appetite so
# it never competes with the Spark JVM for the sandbox's commit limit.
_ORACLE_PREFIX = "SET memory_limit='1GB'; SET threads=2;\n"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: _ORACLE_PREFIX + sql for name, sql in ORACLE_SQL.items()}
