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
re-runs the same batch_id): ALL THREE state tables — near_pairs, members,
and the value index — are written as ``batch_id=<id>`` partitions with
dynamic partition overwrite, and the recomputation reads prior state as
``batch_id != current`` only.  A crashed attempt's partial partitions are
therefore invisible to the replay (it recomputes the FULL batch, not just
the not-yet-appended remainder) and are overwritten wholesale — plain
appends would make a half-written members table shrink the replay's novel
set and silently drop the missing images' pairs.
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

    def _overwrite_partition(df: DataFrame, batch_id: int, path: str) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        batch = batch_df.select("image_id", "phash")
        # First-batch detection is an explicit path-existence check, NOT a
        # bare except: a transient/corruption read failure on prior state
        # must fail the micro-batch visibly (and be retried from the
        # checkpoint), never be silently treated as "no prior members" —
        # that would emit wrong pairs and re-append already-indexed values.
        prior = F.col("batch_id") != batch_id
        if Path(members_path).exists():
            members = (
                spark_b.read.parquet(members_path)
                .filter(prior)
                .select("image_id", "phash")
            )
        else:
            members = spark_b.createDataFrame(
                [], "image_id string, phash long"
            )
        if Path(index_path).exists():
            index = (
                spark_b.read.parquet(index_path)
                .filter(prior)
                .select("phash", "chunk_id", "chunk_val")
            )
        else:
            index = spark_b.createDataFrame(
                [], "phash long, chunk_id int, chunk_val long"
            )
        # only COMMITTED prior batches count as members (the batch_id !=
        # current filter above hides a crashed attempt's partial state);
        # a cross-batch redelivery is already a member and drops out here
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
        _overwrite_partition(pairs, batch_id, pairs_path)
        new_vals = (
            novel.select("phash")
            .distinct()
            .join(index.select("phash").distinct(), "phash", "left_anti")
        )
        _overwrite_partition(
            phash_value_index(new_vals, bits=bits, chunks=chunks),
            batch_id,
            index_path,
        )
        _overwrite_partition(novel, batch_id, members_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
