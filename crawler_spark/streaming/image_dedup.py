"""Streaming image near-dup detection — the crawl-time image round as a
Structured Streaming job.

Each micro-batch of newly fetched images probes the PERSISTED value-level
phash index (operators.multimodal.phash_value_index — chunk rows over
DISTINCT hash values, the only thing worth storing at 10^10 images) and
emits every near-pair the batch creates, then appends the batch's novel
hash values to the index and its members to the membership table.  Per-batch
cost is O(new·chunks) — the streaming analog of the batch
``image_phash_incremental`` query, sharing the same operator
(phash_incremental_pairs), so batch and streaming agree by construction.

Idempotence under micro-batch replay (a foreachBatch retry after a crash
re-runs the same batch_id): near-pairs land in a ``batch_id=<id>`` partition
with dynamic partition overwrite, so a replay overwrites its own output
instead of duplicating it; index and member appends are anti-joined against
the stored state first, so re-appending is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_SCHEMA = "image_id string, phash long, fetched_ts timestamp"


def read_image_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of fetched images (json lines: {image_id, phash,
    fetched_ts}) — the fetch stage's output feed.  File source =
    replayable, exactly-once with the checkpoint; swap for Kafka with the
    same downstream plan."""
    return (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )


def start_image_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    bits: int = 60,
    chunks: int = 10,
    max_hamming: int = 4,
    max_chunk_df: int | None = None,
    watermark: str = "10 minutes",
):
    """Wire the stream end-to-end and start it.

    Each micro-batch:
      1. watermarked dedup on image_id (re-fetches of the same image within
         the delay collapse; state stays bounded);
      2. foreachBatch: probe ``{state_dir}/phash_index`` +
         ``{state_dir}/members`` with the batch via phash_incremental_pairs,
         write pairs to ``{state_dir}/near_pairs/batch_id=<id>`` (replay
         overwrites), anti-join-append novel values to the index and novel
         image_ids to members.

    Returns the StreamingQuery (caller awaits/stops).
    """
    from pathlib import Path

    from crawler_spark.operators.multimodal import (
        phash_incremental_pairs,
        phash_value_index,
    )

    index_path = f"{state_dir}/phash_index"
    members_path = f"{state_dir}/members"
    pairs_path = f"{state_dir}/near_pairs"
    Path(state_dir).mkdir(parents=True, exist_ok=True)

    stream = (
        read_image_stream(spark, input_dir)
        .withWatermark("fetched_ts", watermark)
        .dropDuplicatesWithinWatermark(["image_id"])
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        batch = batch_df.select("image_id", "phash")
        try:
            members = spark_b.read.parquet(members_path)
        except Exception:
            members = spark_b.createDataFrame(
                [], "image_id string, phash long"
            )
        try:
            index = spark_b.read.parquet(index_path)
        except Exception:
            index = spark_b.createDataFrame(
                [], "phash long, chunk_id int, chunk_val long"
            )
        # replay safety: a redelivered image_id is already a member — drop
        # it from the batch so pairs/index/members all stay idempotent
        novel = batch.join(
            members.select("image_id"), "image_id", "left_anti"
        )
        pairs = phash_incremental_pairs(
            index,
            members,
            novel,
            bits=bits,
            chunks=chunks,
            max_hamming=max_hamming,
            max_chunk_df=max_chunk_df,
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_path)
        )
        new_vals = (
            novel.select("phash")
            .distinct()
            .join(index.select("phash").distinct(), "phash", "left_anti")
        )
        phash_value_index(new_vals, bits=bits, chunks=chunks).write.mode(
            "append"
        ).parquet(index_path)
        novel.write.mode("append").parquet(members_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
