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


def _gate_model(batches, delay=0.2):
    """Pure-Python mirror of the stateful gate's math: per host, per batch,
    rows sort by url_hash, sched = max(state, min req_ts) + delay*i, state
    advances to last sched + delay.  Keyed state — partitioning-invariant
    by construction."""
    state: dict[str, float] = {}
    out = []
    for batch in batches:
        by_host: dict[str, list] = {}
        for h, u, t in batch:
            by_host.setdefault(h, []).append((u, t))
        for h, rows in by_host.items():
            rows.sort(key=lambda r: r[0])
            base = max(state.get(h, float("-inf")), min(t for _, t in rows))
            for i, (u, _t) in enumerate(rows):
                out.append((h, u, base + delay * i))
            state[h] = base + delay * len(rows)
    return out


def test_gate_model_properties_two_host_adversarial():
    """Property (VERDICT-r4 #8): for ANY 2-host schedule and ANY micro-batch
    split, (a) per-host consecutive scheds stay >= min_delay apart across
    batch boundaries, and (b) host B's schedule is bit-identical with or
    without host A's rows present — per-host state means no physical
    co-location (AQE coalescing, single-partition shuffles) can let one
    host's queue delay or reorder another's."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    reqs = st.lists(
        st.tuples(
            st.sampled_from(["a.test", "b.test"]),
            st.integers(0, 50),  # url_hash (dups allowed)
            st.floats(1000.0, 1010.0, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=200, deadline=None)
    @given(reqs=reqs, cut=st.integers(0, 40))
    def run(reqs, cut):
        # de-dup (host, url_hash) within a batch half: a real frontier batch
        # carries distinct urls per host
        def dedup(rows):
            seen, out = set(), []
            for r in rows:
                if (r[0], r[1]) not in seen:
                    seen.add((r[0], r[1]))
                    out.append(r)
            return out

        b1, b2 = dedup(reqs[:cut]), dedup(reqs[cut:])
        batches = [b for b in (b1, b2) if b]
        got = _gate_model(batches)
        # (a) per-host spacing >= delay, across batches
        by_host: dict[str, list[float]] = {}
        for h, _u, s in got:
            by_host.setdefault(h, []).append(s)
        for scheds in by_host.values():
            scheds.sort()
            for x, y in zip(scheds, scheds[1:]):
                assert y - x >= 0.2 - 1e-9, (x, y)
        # (b) host independence: B's schedule identical without A's rows
        only_b = [
            b2f for b2f in (
                [r for r in b if r[0] == "b.test"] for b in batches
            ) if b2f
        ]
        want_b = sorted(r for r in _gate_model(only_b))
        got_b = sorted(r for r in got if r[0] == "b.test")
        assert got_b == want_b

    run()


def test_gate_single_partition_cannot_merge_hosts(spark):
    """Physical-merge adversary: run the REAL stream with
    spark.sql.shuffle.partitions=1 — the superset of any AQE partition
    coalescing, both hosts' rows land in the SAME task — on a 2-host
    adversarial schedule (A floods 20 requests, B sends 3 at the same
    instant, across two micro-batches).  Output must match the keyed-state
    model EXACTLY: B is scheduled from its own clock, never queued behind
    A's flood (C1 parity with the reference's per-host loop,
    tools.go:51,58)."""
    from crawler_spark.streaming.stateful import start_politeness_stream

    root = Path(tempfile.mkdtemp(prefix="polite_aqe_"))
    inp, out, ckpt = root / "in", root / "out", root / "ckpt"
    b1 = [("a.test", h, 1000.0) for h in range(20)] + [
        ("b.test", 99, 1000.0), ("b.test", 7, 1000.0)]
    b2 = [("a.test", h, 1000.05) for h in range(30, 35)] + [
        ("b.test", 3, 1000.05)]

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        _write(inp, "b1.json", [
            {"host": h, "url_hash": u, "req_ts": t} for h, u, t in b1])
        q = start_politeness_stream(spark, str(inp), str(out), str(ckpt),
                                    min_delay_ms=200)
        q.awaitTermination(120)
        _write(inp, "b2.json", [
            {"host": h, "url_hash": u, "req_ts": t} for h, u, t in b2])
        q2 = start_politeness_stream(spark, str(inp), str(out), str(ckpt),
                                     min_delay_ms=200)
        q2.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = sorted(
        (r.host, r.url_hash, round(r.sched_ts, 6))
        for r in spark.read.parquet(str(out)).collect()
    )
    want = sorted((h, u, round(s, 6)) for h, u, s in _gate_model([b1, b2]))
    assert got == want
    # B's first request fires at its req_ts — not after A's 20-deep queue
    b_scheds = [s for h, _u, s in got if h == "b.test"]
    assert min(b_scheds) == 1000.0
