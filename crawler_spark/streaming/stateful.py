"""Custom stateful streaming operator: the cross-batch politeness gate.

SURVEY §2.7 C1: the reference gets per-host request spacing for free from a
single-threaded loop (/root/reference/plugin/public/tools.go:51,58).  Under
parallel streaming execution the per-host clock must be explicit state.
``politeness_gate`` is that operator, built on
``applyInPandasWithState``:

- stream is keyed by ``host``;
- state per host = ``next_allowed_ts`` (one double — politeness state is
  O(hosts), never O(urls));
- each micro-batch's requests for the host are ordered deterministically
  (url_hash asc) and scheduled ``min_delay_ms`` apart starting at
  ``max(state, batch event time)``;
- the updated clock carries to the next micro-batch via the state store,
  surviving restarts with the checkpoint.

This is the streaming twin of the batch ``operators.politeness`` /
``next_host_state`` carryover — same semantics, state-store-backed.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "host string, url_hash long, sched_ts double"
STATE_SCHEMA = "next_allowed_ts double"


def politeness_gate(
    requests: DataFrame, min_delay_ms: int = 200
) -> DataFrame:
    """Gate a streaming DataFrame of fetch requests
    (host, url_hash, req_ts:double) into a politeness-spaced schedule.

    Output rows carry ``sched_ts`` (seconds, same clock as ``req_ts``);
    within a host consecutive scheds are ≥ min_delay_ms apart, across
    micro-batches too.
    """
    delay_s = min_delay_ms / 1000.0

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values("url_hash", kind="mergesort")
        clock = state.get[0] if state.exists else float("-inf")
        base = max(clock, float(rows["req_ts"].min()))
        sched = base + delay_s * pd.RangeIndex(len(rows)).to_numpy()
        state.update((float(sched[-1] + delay_s),))
        yield pd.DataFrame(
            {
                "host": host,
                "url_hash": rows["url_hash"].to_numpy(),
                "sched_ts": sched,
            }
        )

    return (
        requests.groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_politeness_stream(
    spark: Any,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_delay_ms: int = 200,
):
    """Wire the gate over a file-source stream of requests
    (json: {host, url_hash, req_ts}) and append the schedule to parquet."""
    req = (
        spark.readStream.schema("host string, url_hash long, req_ts double")
        .option("maxFilesPerTrigger", 4)
        .json(input_dir)
    )
    gated = politeness_gate(req, min_delay_ms)
    return (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
