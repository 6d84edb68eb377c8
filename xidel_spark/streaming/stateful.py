"""Custom stateful streaming operator: per-host politeness rate limiting.

The batch engine schedules fetches with window functions + a cross-wave
watermark (crawl/politeness.py). The STREAMING form keeps the per-host
clock as managed state: fetch requests arrive as a stream, are grouped by
host (the politeness bucket == the state key == the shuffle partition),
and `applyInPandasWithState` assigns each request the earliest allowed
fetch time >= wait_ms after the host's previous one — the clock survives
across micro-batches in the state store, exactly the invariant the batch
watermark provides across waves.

This is the brief's `applyInPandasWithState` custom-stateful-operator
pattern; the state schema is one (last_ms, n_scheduled) row per host.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.StringType()),
    ]
)

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("scheduled_ms", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_scheduled", T.LongType()),
    ]
)


def _limiter(wait_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last_ms, n = state.get if state.exists else (-wait_ms, 0)
        out = {"host": [], "url": [], "scheduled_ms": []}
        for pdf in pdfs:
            for _, row in pdf.sort_values("rank").iterrows():
                last_ms = last_ms + wait_ms
                n += 1
                out["host"].append(host)
                out["url"].append(row["url"])
                out["scheduled_ms"].append(last_ms)
        state.update((int(last_ms), int(n)))
        yield pd.DataFrame(out)

    return fn


def politeness_rate_limiter(requests: DataFrame, wait_ms: int) -> DataFrame:
    """streaming (host, url, rank) → (host, url, scheduled_ms) with the
    per-host >= wait_ms spacing enforced ACROSS micro-batches via managed
    state (one state row per host; the groupBy key is the politeness
    bucket, so state access is partition-local)."""
    return requests.groupBy("host").applyInPandasWithState(
        _limiter(wait_ms),
        outputStructType=SCHEDULE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
