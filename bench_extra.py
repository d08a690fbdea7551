"""Optimization-round measurement harness (guide §1): noop-sink per-query
timing + explain("formatted") capture, WITHOUT touching the frozen
bench.py. Usage:

    python bench_extra.py time  q1 q2 ...     # noop-sink walls (cold+warm)
    python bench_extra.py plans q1 q2 ...     # write plans/r06/<q>_{when}.txt
    python bench_extra.py all                 # every catalog query, timed

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
BENCH_EXTRA_WHEN=before|after (plan file suffix, default 'before'),
BENCH_EXTRA_REPS (warm reps, default 2).

Timing methodology: df.write.format("noop") computes every column of
every row (bench.py's .count() lets the optimizer prune; these numbers
are therefore an upper bound on the bench's, useful for *relative*
before/after comparison of the same query). One cold run (plan+codegen)
then BENCH_EXTRA_REPS warm runs; report all.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WHEN = os.environ.get("BENCH_EXTRA_WHEN", "before")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def _spark():
    from searchengine_spark.session import get_spark

    return get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.local.dir": "/dev/shm/spark-bench"},
    )


SINK = os.environ.get("BENCH_EXTRA_SINK", "noop")


def _noop(df):
    # noop computes every column (guide §1.4) but runs the plan through
    # the V2 write path, where AQE exchange reuse does NOT fire (found
    # in r6: the same multi-consumer plan reuses its shared exchange
    # under collect()/count() and re-evaluates per branch under a noop
    # write). The frozen bench times with .count(), so reuse-dependent
    # queries must be measured with BENCH_EXTRA_SINK=count.
    if SINK == "count":
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()


def cmd_time(names: list[str]) -> None:
    from searchengine_spark.queries import QUERIES

    spark = _spark()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        for rep in range(1 + REPS):
            spark.catalog.clearCache()
            t0 = time.time()
            _noop(QUERIES[name](spark, SF_DIR))
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
        print(f"{name}: cold={walls[0]} warm={walls[1:]}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


def cmd_plans(names: list[str]) -> None:
    from searchengine_spark.queries import QUERIES

    spark = _spark()
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(REPO, "plans", "r06", f"{name}_{WHEN}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    mode, args = sys.argv[1], sys.argv[2:]
    if mode == "all":
        from searchengine_spark.queries import QUERIES

        args = sorted(QUERIES)
        mode = "time"
    if mode == "time":
        cmd_time(args)
    elif mode == "plans":
        cmd_plans(args)
    else:
        raise SystemExit(f"unknown mode {mode}")
