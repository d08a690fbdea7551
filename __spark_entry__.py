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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["schedule_round"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
