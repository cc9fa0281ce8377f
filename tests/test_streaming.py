"""Streaming frontier ingest: micro-batches share the batch operators'
semantics — novel URLs dequeued once, url_seen grows, restarts resume from
checkpoint without duplicating output."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

from pyspark.sql import functions as F


def _write_discovery(dir_: Path, name: str, urls: list[str]) -> None:
    dir_.mkdir(parents=True, exist_ok=True)
    with open(dir_ / name, "w") as f:
        for u in urls:
            f.write(json.dumps({"url": u, "discovered_ts": "2026-01-01T00:00:00"}))
            f.write("\n")


def _urls(lo: int, hi: int) -> list[str]:
    return [f"HTTP://Host-{i % 5}.Test:80/p/{i}#x" for i in range(lo, hi)]


def test_streaming_ingest_dedupes_and_resumes(spark):
    from crawler_spark.streaming.ingest import start_frontier_ingest

    root = Path(tempfile.mkdtemp(prefix="stream_test_"))
    inp, state, ckpt = root / "in", root / "state", root / "ckpt"

    # batch 1: 40 urls with internal dups
    _write_discovery(inp, "b1.json", _urls(0, 40) + _urls(0, 10))
    q = start_frontier_ingest(
        spark, str(inp), str(state), str(ckpt), num_buckets=4
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(state / "frontier_out"))
    got1 = {r.url_hash for r in out.collect()}
    assert out.count() == len(got1) == 40  # deduped, all novel

    # batch 2 (restart the stream): 20 overlapping + 20 new
    _write_discovery(inp, "b2.json", _urls(20, 60))
    q2 = start_frontier_ingest(
        spark, str(inp), str(state), str(ckpt), num_buckets=4
    )
    q2.awaitTermination(120)

    out2 = spark.read.parquet(str(state / "frontier_out"))
    assert out2.count() == 60  # only the 20 new urls were appended
    seen = spark.read.parquet(str(state / "url_seen"))
    assert seen.count() == 60
    # every appended row carries canonical form + politeness schedule
    row = out2.filter(F.col("rank") > 1).first()
    assert row is None or row.sched_offset_ms >= 200
    canon = out2.select("canonical_url").first().canonical_url
    assert canon.startswith("http://host-") and "#" not in canon
