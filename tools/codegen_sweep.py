"""Catalog sweep under spark.sql.codegen.fallback=false.

A whole-stage-codegen method that outgrows janino's 64 KB cap makes
Spark log ONE error and silently run the stage interpreted — correct
results, 2x+ walls (measured on search_anchor_boosted before its
Arrow-canonicalize fix). With fallback disabled the compile failure
RAISES instead, so this sweep turns the silent perf cliff into a loud
failure list. Run after adding catalog queries that fuse wide native
expression chains (URL exprs are the usual suspect — CLAUDE.md trap).

    python tools/codegen_sweep.py [sf_dir]

Exit 0 = every query executed with codegen intact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    from searchengine_spark.queries import QUERIES
    from searchengine_spark.session import get_spark

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("codegen_sweep")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    failures = []
    for name, fn in QUERIES.items():
        try:
            spark.catalog.clearCache()
            fn(spark, sf_dir).collect()
            print(f"ok   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            head = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
            failures.append((name, head))
            print(f"FAIL {name}: {head}", flush=True)
    print(f"\n{len(QUERIES) - len(failures)} ok, {len(failures)} codegen failures")
    for name, head in failures:
        print(f"  {name}: {head}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
