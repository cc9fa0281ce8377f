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


def test_streaming_session_windows_emit_on_watermark(spark):
    """Native session windows on a stream: append mode emits a session only
    once the watermark passes its end, merged across micro-batches, and the
    rollup matches the batch session_stats over the same events."""
    from crawler_spark.streaming.sessions import session_stats

    root = Path(tempfile.mkdtemp(prefix="sess_stream_"))
    inp, ckpt = root / "in", root / "ckpt"
    inp.mkdir(parents=True)
    schema = "user_id long, event_id long, ts timestamp, value double"

    def write(name, rows):
        with open(inp / name, "w") as f:
            for uid, eid, ts, v in rows:
                f.write(json.dumps(
                    {"user_id": uid, "event_id": eid, "ts": ts, "value": v}
                ) + "\n")

    def run_trigger():
        stream = spark.readStream.schema(schema).json(str(inp))
        out = session_stats(stream, gap="30 minutes", watermark="10 minutes")
        q = (
            out.writeStream.format("parquet")
            .option("path", str(root / "out"))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: user 1 has an exactly-30-min gap (merge-on-touch => SAME
    # session) then a >30-min gap (split); user 2 one event
    write("b1.json", [
        (1, 1, "2026-01-01T00:00:00", 1.5),
        (1, 2, "2026-01-01T00:10:00", 2.0),
        (1, 3, "2026-01-01T00:40:00", 0.25),   # exactly gap after e2 → merges
        (1, 4, "2026-01-01T01:40:00", 0.5),    # 60 min after e3 → new session
        (2, 1, "2026-01-01T00:05:00", 4.0),
    ])
    run_trigger()
    # batch 2: an event 10 h later pushes the watermark past every earlier
    # session end AND a late-but-in-horizon event extends nothing
    write("b2.json", [(3, 1, "2026-01-01T10:00:00", 9.0)])
    run_trigger()

    got = {
        (r.user_id, r.start_ms, r.end_ms): (r.n_events, r.total_value_e4)
        for r in spark.read.parquet(str(root / "out")).collect()
    }
    day = 1767225600000  # 2026-01-01T00:00:00Z in epoch ms
    m = 60_000
    # session 1a: e1+e2+e3 (the exact-gap event MERGES — Spark's
    # merge-on-touch), ends 00:40+gap; 1b: the 01:40 event; 2: one event.
    # All finalized; user 3's session is still open (watermark hasn't
    # passed 10:00+gap) so it must NOT be emitted
    assert got == {
        (1, day, day + 70 * m): (3, 37500),
        (1, day + 100 * m, day + 130 * m): (1, 5000),
        (2, day + 5 * m, day + 35 * m): (1, 40000),
    }

    # batch parity: the same operator in batch mode over all closed events
    batch = spark.createDataFrame(
        [(1, 1, "2026-01-01 00:00:00", 1.5), (1, 2, "2026-01-01 00:10:00", 2.0),
         (1, 3, "2026-01-01 00:40:00", 0.25), (1, 4, "2026-01-01 01:40:00", 0.5),
         (2, 1, "2026-01-01 00:05:00", 4.0)],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bgot = {
        (r.user_id, r.start_ms, r.end_ms): (r.n_events, r.total_value_e4)
        for r in session_stats(batch, gap="30 minutes").collect()
    }
    assert bgot == got


def test_streaming_dedupe_within_watermark(spark):
    """dropDuplicatesWithinWatermark over the ingest stream: duplicates
    arriving within the delay are dropped exactly once across micro-batches
    (state is eviction-bounded, not history-bounded), and the batch-mode
    fallback gives plain dropDuplicates semantics."""
    from crawler_spark.streaming.dedup import dedupe_within_watermark

    root = Path(tempfile.mkdtemp(prefix="dedup_stream_"))
    inp, ckpt = root / "in", root / "ckpt"
    inp.mkdir(parents=True)
    schema = "url string, ts timestamp"

    def write(name, rows):
        with open(inp / name, "w") as f:
            for url, ts in rows:
                f.write(json.dumps({"url": url, "ts": ts}) + "\n")

    def run_trigger():
        stream = spark.readStream.schema(schema).json(str(inp))
        out = dedupe_within_watermark(
            stream, ["url"], ts_col="ts", delay="10 minutes"
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", str(root / "out"))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: a has an in-batch duplicate 1 min apart -> one survivor
    write("b1.json", [
        ("http://a/1", "2026-01-01T00:00:00"),
        ("http://a/1", "2026-01-01T00:01:00"),
        ("http://b/2", "2026-01-01T00:02:00"),
    ])
    run_trigger()
    # batch 2: a re-arrives within the watermark window -> still dropped;
    # c is new -> kept
    write("b2.json", [
        ("http://a/1", "2026-01-01T00:05:00"),
        ("http://c/3", "2026-01-01T00:06:00"),
    ])
    run_trigger()

    got = sorted(r.url for r in spark.read.parquet(str(root / "out")).collect())
    assert got == ["http://a/1", "http://b/2", "http://c/3"]

    # batch-mode fallback: same operator, plain dedup semantics
    batch = spark.createDataFrame(
        [("u", "2026-01-01 00:00:00"), ("u", "2026-01-01 00:09:00"),
         ("v", "2026-01-01 00:01:00")],
        "url string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert dedupe_within_watermark(batch, ["url"]).count() == 2


def _write_images(dir_: Path, name: str, rows: list[tuple[str, int]]) -> None:
    dir_.mkdir(parents=True, exist_ok=True)
    with open(dir_ / name, "w") as f:
        for iid, ph in rows:
            f.write(
                json.dumps(
                    {
                        "image_id": iid,
                        "phash": ph,
                        "fetched_ts": "2026-01-01T00:00:00",
                    }
                )
            )
            f.write("\n")


def test_streaming_image_dedup_matches_batch_operator(spark):
    """Two micro-batch rounds (with a stream restart between them) emit
    exactly the pairs the BATCH phash_near_pairs finds on the union,
    because both paths share phash_incremental_pairs; redelivered image_ids
    are dropped so replays don't duplicate state."""
    from crawler_spark.operators.multimodal import phash_near_pairs
    from crawler_spark.streaming.image_dedup import start_image_dedup_stream

    root = Path(tempfile.mkdtemp(prefix="img_stream_"))
    inp, state, ckpt = root / "in", root / "state", root / "ckpt"

    # batch 1: two exact dups + one 2-bit variant + singletons
    b1 = [
        ("img-a", 0b111000111000),
        ("img-a2", 0b111000111000),
        ("img-b", 0b111000111011),
        ("img-c", 0b000111000111),
    ]
    _write_images(inp, "b1.json", b1)
    q = start_image_dedup_stream(
        spark, str(inp), str(state), str(ckpt), bits=60, chunks=10,
        max_hamming=4,
    )
    q.awaitTermination(120)

    # batch 2 (restart): a near-dup of img-c, a redelivery of img-a
    # (must be a no-op), and a fresh singleton
    b2 = [
        ("img-d", 0b000111000110),
        ("img-a", 0b111000111000),
        ("img-e", 0b101010101010101),
    ]
    _write_images(inp, "b2.json", b2)
    q2 = start_image_dedup_stream(
        spark, str(inp), str(state), str(ckpt), bits=60, chunks=10,
        max_hamming=4,
    )
    q2.awaitTermination(120)

    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in spark.read.parquet(str(state / "near_pairs")).collect()
    }
    union_rows = [(i, p) for i, p in dict(b1 + b2).items()]
    want_df = phash_near_pairs(
        spark.createDataFrame(union_rows, "image_id string, phash long"),
        bits=60, chunks=10, max_hamming=4,
    )
    want = {(r.a_id, r.b_id, r.hamming) for r in want_df.collect()}
    assert got == want and ("img-a", "img-a2", 0) in got

    members = spark.read.parquet(str(state / "members"))
    assert members.count() == 6  # the redelivered img-a was dropped
    idx_vals = spark.read.parquet(str(state / "phash_index")).select(
        "phash"
    ).distinct()
    assert idx_vals.count() == 5  # one shared phash between a and a2
