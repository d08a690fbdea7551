"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet dir, compare row count, column names, and
order-insensitive values (rounded).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]

--json additionally writes a machine-readable per-query ledger
({name: {"pass": bool, "rows": int, "err": str|null}}) — the
committed CORRECTNESS_SELF artifact the round-5 verdict asked for.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from searchengine_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from searchengine_spark.session import get_spark  # noqa: E402
from searchengine_spark.sources.tables import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 3)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark(
        "correctness",
        master="local[8]",
        shuffle_partitions=8,
        # small footprint: the sandbox VM sporadically reclaims memory
        # (CommitLimit 66G, heuristic overcommit) — keep JVM + DuckDB
        # reservations low so transient pressure can't fail allocations
        extra_conf={"spark.driver.memory": "4g"},
    )

    def fresh_con():
        c = duckdb.connect()
        c.execute("SET memory_limit='2GB'; SET threads=2;")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    def run_oracle(sql):
        # the sandbox microVM sporadically reclaims guest memory
        # (balloon): tiny DuckDB allocations fail transiently with the
        # whole machine idle — retry with a pause, fresh connection
        import time as _t

        for attempt in range(4):
            c = fresh_con()
            try:
                res = c.execute(sql)
                return [d[0] for d in res.description], res.fetchall()
            except duckdb.OutOfMemoryException:
                if attempt == 3:
                    raise
                _t.sleep(2 * (attempt + 1))
            finally:
                c.close()
    n_pass = n_fail = n_rowsonly = 0
    ledger: dict = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            ledger[name] = {"pass": False, "rows": None, "err": f"spark: {e}"[:200]}
            n_fail += 1
            continue
        if name not in ORACLE_SQL:
            print(f"rows-only {name}: {len(srows)} rows")
            ledger[name] = {"pass": None, "rows": len(srows), "err": None}
            n_rowsonly += 1
            continue
        try:
            dcols, drows = run_oracle(ORACLE_SQL[name])
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            ledger[name] = {"pass": False, "rows": None, "err": f"duckdb: {e}"[:200]}
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        err = None
        if sc != dc:
            err = f"columns {sc} != {dc}"
        elif len(sr) != len(dr):
            err = f"rowcount {len(sr)} != {len(dr)}"
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            err = f"values differ, e.g. {diffs}"
        if err:
            print(f"FAIL {name}: {err}")
            ledger[name] = {"pass": False, "rows": len(sr), "err": err[:200]}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows")
            ledger[name] = {"pass": True, "rows": len(sr), "err": None}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "queries": ledger},
                f, indent=1,
            )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
