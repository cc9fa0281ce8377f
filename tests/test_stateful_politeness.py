"""Cross-micro-batch politeness: per-host clocks live in streaming state, so
request spacing holds WITHIN a batch, ACROSS batches, and across restarts."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path


def _write(dir_: Path, name: str, rows: list[dict]) -> None:
    dir_.mkdir(parents=True, exist_ok=True)
    with open(dir_ / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_politeness_state_carries_across_batches(spark):
    from crawler_spark.streaming.stateful import start_politeness_stream

    root = Path(tempfile.mkdtemp(prefix="polite_"))
    inp, out, ckpt = root / "in", root / "out", root / "ckpt"

    _write(inp, "b1.json", [
        {"host": "a.test", "url_hash": h, "req_ts": 1000.0} for h in range(5)
    ] + [{"host": "b.test", "url_hash": 99, "req_ts": 1000.0}])
    q = start_politeness_stream(spark, str(inp), str(out), str(ckpt),
                                min_delay_ms=200)
    q.awaitTermination(120)

    # second batch, same host — restart the stream (state from checkpoint)
    _write(inp, "b2.json", [
        {"host": "a.test", "url_hash": h, "req_ts": 1000.1} for h in range(10, 13)
    ])
    q2 = start_politeness_stream(spark, str(inp), str(out), str(ckpt),
                                 min_delay_ms=200)
    q2.awaitTermination(120)

    rows = spark.read.parquet(str(out)).collect()
    by_host: dict[str, list[float]] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r.sched_ts)
    assert len(by_host["a.test"]) == 8
    scheds = sorted(by_host["a.test"])
    # C1 invariant: consecutive scheds per host spaced >= 200 ms,
    # including across the batch boundary
    for x, y in zip(scheds, scheds[1:]):
        assert y - x >= 0.2 - 1e-9, (x, y)
    # batch-2 rows must start after batch-1's clock, not at their req_ts
    assert min(by_host["a.test"][5:] or scheds[5:]) >= scheds[4] + 0.2 - 1e-9
