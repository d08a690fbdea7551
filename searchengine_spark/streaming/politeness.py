"""Streaming politeness gate — the reference's per-host 15 s delay
(DDOSDELAY, SearchEngine.h:21; enforcement SearchEngine.cpp:685-701)
as a custom stateful streaming operator.

The batch crawl loop enforces politeness relationally (hosts table +
eligibility join); this module is the Structured-Streaming form for
deployments that feed fetch *requests* through a stream: per-host
state (last granted tick) lives in the state store, and each incoming
request is granted or deferred — `applyInPandasWithState` over
groupBy(host), Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

POLITENESS_TICKS = 15  # ≙ 15 s at 1 tick/s

OUT_SCHEMA = "host string, url string, tick long, decision string"
STATE_SCHEMA = "last_granted long"


def politeness_gate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Grant at most one fetch per host per POLITENESS_TICKS ticks;
    later requests within the window are deferred (deterministic: rows
    are processed in (tick, url) order)."""
    (host,) = key
    last = state.get[0] if state.exists else -(10**9)
    for pdf in pdfs:
        pdf = pdf.sort_values(["tick", "url"])
        # the grant recurrence is data-dependent (each grant moves the
        # window anchor), so it cannot be a cummax-style vector op; the
        # scan is a tight loop over a numpy array (no iterrows), and a
        # group = one host's requests within one trigger — small by
        # construction, so O(rows) python-int work is not the hot path
        ticks = pdf["tick"].to_numpy()
        decisions = []
        for t in ticks:
            if t - last >= POLITENESS_TICKS:
                decisions.append("grant")
                last = int(t)
            else:
                decisions.append("defer")
        yield pd.DataFrame(
            {
                "host": host,
                "url": pdf["url"].values,
                "tick": ticks,
                "decision": decisions,
            }
        )
    state.update((int(last),))


def gate_requests_stream(requests_stream):
    """requests(host, url, tick) stream -> decisions stream."""
    return (
        requests_stream.groupBy("host")
        .applyInPandasWithState(
            politeness_gate,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def gate_requests_batch(requests_df) -> "pd.DataFrame":
    """Batch twin (same rules) for oracle-style verification in tests."""
    out = []
    for host, grp in requests_df.toPandas().groupby("host"):
        last = -(10**9)
        grp = grp.sort_values(["tick", "url"])
        for url, tick in zip(grp["url"].to_numpy(), grp["tick"].to_numpy()):
            if tick - last >= POLITENESS_TICKS:
                out.append((host, url, int(tick), "grant"))
                last = int(tick)
            else:
                out.append((host, url, int(tick), "defer"))
    return pd.DataFrame(out, columns=["host", "url", "tick", "decision"])
