"""Oracle-authoring rules, enforced (see queries._materialize_ctes docstring).

Rule 1: the CTE rewrite must be literal-safe — a quoted string containing
an unbalanced paren or the word SELECT must not desynchronize the scan.
Rule 2: no oracle twin may emit a HUGEINT output column. DuckDB types
sum(BIGINT) as HUGEINT -> Arrow decimal128(38,0), which hash-mismatches
Spark's int64 even for identical values (the whole round-3 red surface:
total_tf, fetched_ok/fetch_failed/admitted, session_no, total_bytes).
Enforced with DESCRIBE (binder-only, no execution) over the sf0.001 views.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from searchengine_spark.queries import ORACLE_SQL, _materialize_ctes
from searchengine_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_materialize_rewrites_ctes_not_window_clause():
    sql = (
        "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a)\n"
        "SELECT x, sum(x) OVER w AS s FROM b\n"
        "WINDOW w AS (ORDER BY x), v AS (ORDER BY x DESC)"
    )
    out = _materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out
    assert "b AS MATERIALIZED (" in out
    # the WINDOW clause entries are past the top-level SELECT: untouched
    assert "w AS (ORDER BY x)" in out
    assert "v AS (ORDER BY x DESC)" in out


def test_materialize_skips_string_literals():
    # literal contains an unbalanced ')' and the word SELECT: neither may
    # desync the depth scan that finds the top-level SELECT cut point
    sql = (
        "WITH a AS (SELECT ') SELECT bogus' AS s, 1 AS x),\n"
        "b AS (SELECT x FROM a)\n"
        "SELECT x FROM b"
    )
    out = _materialize_ctes(sql)
    assert out.count("AS MATERIALIZED (") == 2
    assert "') SELECT bogus'" in out  # literal untouched


def test_materialize_skips_cte_opener_inside_literal():
    # a literal whose CONTENT looks like a CTE opener (", x AS (")
    # must survive the substitution byte-identical
    sql = (
        "WITH a AS (SELECT ', x AS (' AS s, 1 AS n),\n"
        "b AS (SELECT n FROM a)\n"
        "SELECT n FROM b"
    )
    out = _materialize_ctes(sql)
    assert out.count("AS MATERIALIZED (") == 2
    assert "', x AS ('" in out  # literal untouched


def test_materialize_handles_escaped_quote():
    sql = "WITH a AS (SELECT 'it''s (' AS s, 1 AS x)\nSELECT x FROM a"
    out = _materialize_ctes(sql)
    assert out.count("AS MATERIALIZED (") == 1
    assert out.endswith("SELECT x FROM a")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no testdata")
def test_no_hugeint_output_columns():
    con = duckdb.connect()
    try:
        con.execute("SET memory_limit='1GB'; SET threads=1;")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        offenders = []
        for name, sql in sorted(ORACLE_SQL.items()):
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
            for col, ctype, *_ in cols:
                if "HUGEINT" in ctype.upper():
                    offenders.append(f"{name}.{col}: {ctype}")
        assert not offenders, (
            "uncast integer aggregate(s) — wrap in CAST(... AS BIGINT): "
            + "; ".join(offenders)
        )
    finally:
        con.close()
