"""8->32-core ceiling probes (BENCH/SUITE_NOTES.md adjudication).

Three independent measurements that together apportion the suite's
8->32 scaling efficiency (~0.51-0.57 across sessions):

1. compute fabric: the bench's md5 canary worker at 8/16/24/32
   processes — linear scaling here rules out SMT sharing and
   scheduler caps;
2. memory bandwidth: a 128 MB pre-faulted numpy copy loop (read+write
   bytes counted) at 1..32 processes, repeat-3 max — per-process
   decay here bounds how much a shuffle/scan-heavy stage can lose to
   the shared bus;
3. same-work Spark telemetry: run bench.crawl_round_bench under
   local[8] and local[32] with spark.eventLog.enabled=true and compare
   the big fused stage's Executor CPU Time / JVM GC Time across
   widths (tools note: event logs land as zstd under the configured
   dir; sum Task Metrics per stage). Flat CPU across widths = no
   memory-stall inflation; the GC delta bounds the heap-contention
   contribution.

Usage: python tools/core_scaling_probe.py   (probes 1+2 only; run the
Spark telemetry half via bench.crawl_round_bench as described above —
it needs an otherwise idle box, CLAUDE.md bench hygiene.)
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _copy_worker(_i: int) -> float:
    a = np.empty(16 * 1024 * 1024, dtype=np.float64)  # 128 MB
    a[:] = 1.0
    b = np.empty_like(a)
    b[:] = 0.0  # pre-fault: first-touch page faults must not be timed
    t0 = time.time()
    n = 0
    while time.time() - t0 < 1.5:
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2 / (time.time() - t0) / 1e9  # GB/s read+write


def main() -> None:
    from bench import _canary_worker

    single = _canary_worker(0)
    print("== compute fabric (md5 canary worker) ==")
    for p in (8, 16, 24, 32):
        with ProcessPoolExecutor(max_workers=p) as ex:
            rates = list(ex.map(_canary_worker, range(p)))
        print(f"procs={p:2d}: {sum(rates) / single:5.2f}x single")

    print("== memory bandwidth (128 MB copy, repeat-3 max) ==")
    for p in (1, 2, 4, 8, 16, 32):
        best = 0.0
        for _ in range(3):
            with ProcessPoolExecutor(max_workers=p) as ex:
                best = max(best, sum(ex.map(_copy_worker, range(p))))
        print(
            f"procs={p:2d}: aggregate {best:6.1f} GB/s, "
            f"per-proc {best / p:5.1f} GB/s"
        )


if __name__ == "__main__":
    main()
