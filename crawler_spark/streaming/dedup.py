"""Streaming URL dedup — bounded-state dropDuplicates for the ingest path.

The batch engine dedupes in-generation with ``dropDuplicates`` and
cross-generation with the seen-set anti-join (membership.py).  On the
STREAMING ingest path (streaming/ingest.py) neither works as-is: a plain
``dropDuplicates`` on a stream keeps every key ever seen (state grows
without bound — at 10^10 URLs that is the whole frontier in executor
memory), and the seen-set join runs per micro-batch inside foreachBatch.

``dropDuplicatesWithinWatermark`` is the Spark-native middle layer: exact
dedup for any two duplicates arriving within the watermark delay of each
other, with state bounded by (keys seen within the delay window), evicted
as the watermark advances.  That matches crawl reality — duplicate URL
discoveries cluster in time (the same page is re-linked across a listing
sweep) — and the durable seen-set join downstream stays the correctness
backstop for late duplicates, exactly like the bloom-prefilter + exact-join
layering of the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First-wins dedup of ``key_cols`` for duplicates within ``delay``.

    State per live key is one row; eviction follows the watermark, so state
    size is bounded by the duplicate-arrival horizon, not history.  Works on
    batch DataFrames too (falls back to plain dropDuplicates semantics),
    keeping the one-operator-two-modes contract of streaming/sessions.py.
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(key_cols)
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
