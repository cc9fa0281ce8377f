"""Fixed StructTypes for the engine tables (FIXTURES.md §A1-A6).

The reference's schemas are compile-time Go structs
(/root/reference/plugin/public/tools.go:26-51); here they are explicit
StructTypes so every read/write is inference-free.
"""

from __future__ import annotations

from pyspark.sql import types as T

# A1. images — the authoritative input/output table (BASELINE.json#input_hint).
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# A2. frontier — one row per URL awaiting fetch.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("judge", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # listing | problem | asset
        T.StructField("pid", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("generation", T.IntegerType(), False),
        T.StructField("listing_pos", T.IntegerType(), True),
    ]
)

# A3. url_seen — checkpoint state (reference analog: problemlist.json read
# back by the hub, /root/reference/main.go:132-153).
URL_SEEN = T.StructType(
    [
        T.StructField("judge", T.StringType(), False),
        T.StructField("pid", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("last_generation", T.IntegerType(), False),
    ]
)

# A4. host_state — politeness + robots cache.
HOST_STATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("min_delay_ms", T.IntegerType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_ms", T.IntegerType(), True),
        T.StructField("next_allowed_ts", T.DoubleType(), True),  # epoch seconds
    ]
)

# A5. problems — normalized output (reference analog: main.json +
# description.md, tools.go:296-324).
PROBLEMS = T.StructType(
    [
        T.StructField("judge", T.StringType(), False),
        T.StructField("pid", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("time_ms", T.IntegerType(), True),
        T.StructField("memory_mb", T.IntegerType(), True),
        T.StructField("judge_type", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("description_type", T.StringType(), True),
        T.StructField("status", T.StringType(), False),  # ok | error
    ]
)

# A6a. fetch_log — one row per fetch attempt outcome.
FETCH_LOG = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("fetched_at", T.DoubleType(), False),
        T.StructField("generation", T.IntegerType(), False),
    ]
)

# A6b. lineage — per-partition per-generation metrics (resume + audit).
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("generation", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("urls_in", T.LongType(), False),
        T.StructField("deduped", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("bytes_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# Fetch stage output (synthetic fetcher / HTTP adapter) — SURVEY §2.1 S1-S6.
FETCH_RESULT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # ok | error
        T.StructField("http_code", T.IntegerType(), True),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("body_bytes", T.BinaryType(), True),
        T.StructField("fetched_at", T.DoubleType(), False),  # epoch seconds
    ]
)

# Listing rows extracted from listing pages — SURVEY §2.1 S7-S10.
LISTING = T.StructType(
    [
        T.StructField("judge", T.StringType(), False),
        T.StructField("pid", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("listing_pos", T.IntegerType(), False),
    ]
)
