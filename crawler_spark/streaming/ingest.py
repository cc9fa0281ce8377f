"""Structured-Streaming frontier ingest.

The reference's crawl loop is batch-incremental (one ``Update()`` per run —
SURVEY §1.5), and the engine's primary driver is the iterative generation
loop in plans/run.py.  This module is the *continuous* variant of the same
semantics for deployments where discovered URLs arrive as a stream:

    readStream (json/text files of discovered URLs)
      → Arrow canonicalize (operators/arrow_frontier.canonicalize_stage —
        mapInArrow works unchanged on streaming DataFrames)
      → watermarked streaming dedup (dropDuplicatesWithinWatermark on
        url_hash: bounded state, the streaming analog of the in-generation
        dedupe)
      → foreachBatch: each micro-batch runs the SAME batch dequeue
        (dequeue_keys cogroup vs the url_seen table) and appends the novel
        batch to the frontier store + MERGEs url_seen — so the exactly-once
        commit protocol and all operator semantics are shared with the
        batch path rather than reimplemented.

Scale notes: streaming state is only the watermark-bounded dedup map of
(url_hash → ts); membership vs the full 10^10 url_seen set stays in the
foreachBatch cogroup (disk-backed table + partition-local blooms), NOT in
streaming state — keeping state small is what makes the stream restartable
from checkpoint in seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.operators.arrow_frontier import canonicalize_stage, dequeue_keys

DISCOVERY_SCHEMA = "url string, discovered_ts timestamp"


def read_discovery_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of discovered URLs (json lines:
    {url, discovered_ts}).  File source = replayable, exactly-once with the
    checkpoint; swap for Kafka via ``readStream.format('kafka')`` with the
    same downstream plan."""
    return (
        spark.readStream.schema(DISCOVERY_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )


def start_frontier_ingest(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    budget_per_host: int = 10_000,
    num_buckets: int = 16,
    watermark: str = "10 minutes",
):
    """Wire the stream end-to-end and start it.

    Each micro-batch:
      1. canonicalize+hash (Arrow kernels, map-side);
      2. streaming-dedup within the watermark;
      3. foreachBatch: batch dequeue vs ``{state_dir}/url_seen`` (parquet,
         MERGE-updated), append novel keys to ``{state_dir}/frontier_out``
         and upsert them into url_seen — the micro-batch is the generation.

    Returns the StreamingQuery (caller awaits/stops).
    """
    from pathlib import Path

    seen_path = f"{state_dir}/url_seen"
    out_path = f"{state_dir}/frontier_out"
    Path(state_dir).mkdir(parents=True, exist_ok=True)

    discovered = read_discovery_stream(spark, input_dir)
    canon = canonicalize_stage(discovered, "url")
    keys = (
        canon.select(
            "url_hash",
            F.xxhash64("host").alias("host_hash"),
            "canonical_url",
            "host",
        )
        .withColumn("event_ts", F.current_timestamp())
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        try:
            seen = spark_b.read.parquet(seen_path)
        except Exception:
            seen = spark_b.createDataFrame([], "url_hash long, host_hash long")
        novel = dequeue_keys(
            batch_df.select("url_hash", "host_hash"),
            seen.select("url_hash", "host_hash"),
            budget_per_host=budget_per_host,
            num_buckets=num_buckets,
        )
        # join canonical strings back (batch-local, map-side vs the bounded
        # micro-batch) and append the dequeued batch
        enriched = novel.join(
            batch_df.select("url_hash", "canonical_url", "host"), "url_hash"
        ).withColumn("batch_id", F.lit(batch_id))
        enriched.write.mode("append").parquet(out_path)
        # MERGE url_seen (append-only parquet upsert: new keys only)
        new_keys = novel.select("url_hash", "host_hash").join(
            seen.select("url_hash"), "url_hash", "left_anti"
        )
        new_keys.write.mode("append").parquet(seen_path)

    return (
        keys.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
