"""Multimodal (binary-column) plumbing for the training-data pipeline.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(the `BASELINE.json#input_hint` table shape: image_id, bytes, w, h, fmt,
caption, phash).  This module provides:

- a deterministic synthesizer that derives a binary payload column from the
  driver testdata (bytes = unhex(md5(text)) — 16 bytes, engine-portable so
  the DuckDB oracle can mirror it byte-for-byte);
- ``decode_features`` — the real Arrow plumbing: ``mapInPandas`` over binary
  batches, numpy-vectorized byte statistics, fixed output StructType.  This
  is the template every real decoder (PIL / libvips / ffmpeg) drops into;
- resize / frame-sample stubs with real signatures, gated behind import-try
  (the heavy media libs are not in this container) — the Spark-side schema,
  partitioning and batch shape are real and tested; only the codec call
  raises ``NotImplementedError``.

Scale notes: binary columns must stay OUT of shuffles — synthesize/decode is
a single map stage (no exchange); downstream joins carry only (image_id,
feature) columns.  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
the per-batch byte volume; for real multi-MB payloads drop it to ~256.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "image_id string, n_bytes int, byte_sum long, byte_min int, byte_max int, "
    "mean_millis long"
)


def synthesize_images(docs: DataFrame) -> DataFrame:
    """Deterministic fake image rows over documents.

    bytes = unhex(md5(text)) (16-byte payload), fmt cycles png/jpeg/webp,
    w/h from the first md5 nibbles — all portable column exprs (the DuckDB
    oracle reproduces every byte).
    """
    h = F.md5("text")
    return docs.select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias("image_id"),
        F.unhex(h).alias("bytes"),
        (F.expr("instr('0123456789abcdef', substring(md5(text), 1, 1))") * 16 + 16)
        .cast("int")
        .alias("w"),
        (F.expr("instr('0123456789abcdef', substring(md5(text), 2, 1))") * 16 + 16)
        .cast("int")
        .alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        F.substring("text", 1, 40).alias("caption"),
    )


def decode_features(images: DataFrame) -> DataFrame:
    """Arrow-batched byte statistics over the binary column — the decode
    stage's plumbing, with a deterministic "decoder" (byte stats) standing in
    for the codec.  numpy over the whole batch; zero per-row Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            raw = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bytes"]]
            arr = np.stack(raw)  # payloads are fixed 16 bytes
            s = arr.sum(axis=1, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "n_bytes": np.full(len(pdf), arr.shape[1], dtype=np.int32),
                    "byte_sum": s,
                    "byte_min": arr.min(axis=1).astype(np.int32),
                    "byte_max": arr.max(axis=1).astype(np.int32),
                    # mean scaled to int to avoid float-format drift
                    "mean_millis": (s * 1000 // arr.shape[1]).astype(np.int64),
                }
            )

    return images.select("image_id", "bytes").mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# real decode / resize / frame-sample stages, backed by the internal codecs
# (crawler_spark.sources.codecs: real PNG, deterministic lossy LJPG).
# External libs (PIL / ffmpeg) are NOT in this container — codecs.py already
# falls back to PIL when present, so these stages ARE the production shape;
# only exotic formats raise.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, status string"
)


def _nn_resize(rgb, max_side: int):
    """Nearest-neighbor thumbnail to max_side, aspect preserved (numpy)."""
    h, w, _ = rgb.shape
    scale = max(h, w) / max_side
    if scale <= 1:
        return rgb
    nh, nw = max(int(round(h / scale)), 1), max(int(round(w / scale)), 1)
    yi = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
    return rgb[yi][:, xi]


def resize_images(images: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage: decode → nearest-neighbor thumbnail → re-encode, per
    Arrow batch.  Per-row failure isolation (C3): a row that fails to decode
    keeps its id with status='error' and null bytes — never a task failure."""
    from crawler_spark.sources import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [],
                   "fmt": [], "status": []}
            for row in pdf.itertuples():
                try:
                    rgb = codecs.decode_image(bytes(row.bytes), row.fmt)
                    small = _nn_resize(rgb, max_side)
                    enc = (
                        codecs.encode_png(small)
                        if row.fmt == "png"
                        else codecs.encode_jpeg(small)
                    )
                    out["bytes"].append(enc)
                    out["h"].append(small.shape[0])
                    out["w"].append(small.shape[1])
                    out["status"].append("ok")
                except Exception:
                    out["bytes"].append(None)
                    out["h"].append(None)
                    out["w"].append(None)
                    out["status"].append("error")
                out["image_id"].append(row.image_id)
                out["fmt"].append(row.fmt)
            yield pd.DataFrame(out)

    return images.select(
        "image_id", "bytes", "w", "h", "fmt"
    ).mapInPandas(run, RESIZE_SCHEMA)


PHASH_SCHEMA = "image_id string, phash long, status string"


def ahash_images(images: DataFrame) -> DataFrame:
    """Perceptual-hash stage: decode → ``codecs.phash64`` (64-bit aHash,
    integral-image box means), per Arrow batch — fills the ``phash`` column
    of the input_hint table (image_id, bytes, w, h, fmt, caption,
    **phash:int64**) from real decoded pixels.  aHash is resize /
    re-encode-robust: a thumbnail or a lossy re-encode of the same image
    lands within a few bits (pinned by tests/test_codecs.py), which is what
    makes hamming-bucketed image dedup work downstream.  Per-row failure
    isolation (C3): undecodable rows keep their id with status='error' and
    null phash."""
    from crawler_spark.sources import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "phash": [], "status": []}
            for row in pdf.itertuples():
                try:
                    rgb = codecs.decode_image(bytes(row.bytes), row.fmt)
                    out["phash"].append(codecs.phash64(rgb))
                    out["status"].append("ok")
                except Exception:
                    out["phash"].append(None)
                    out["status"].append("error")
                out["image_id"].append(row.image_id)
            yield pd.DataFrame(
                {
                    "image_id": out["image_id"],
                    # object dtype, NOT default inference: a mixed
                    # [int, None] list coerces to float64, which silently
                    # rounds int64 hashes past 2^53 (observed: low ~10 bits
                    # zeroed whenever a batch held one undecodable row)
                    "phash": pd.Series(out["phash"], dtype="object"),
                    "status": out["status"],
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, PHASH_SCHEMA
    )


def phash_value_pairs(
    images: DataFrame,
    bits: int = 64,
    chunks: int = 8,
    max_hamming: int = 6,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Near pairs over DISTINCT phash values: (a_hash, b_hash, hamming≥1).

    The candidate-generation stage of :func:`phash_near_pairs`, exposed so
    its cost model is testable: the pigeonhole chunk join runs over
    ``images.select("phash").distinct()``, so its size depends only on the
    number of distinct hash values — never on how many images share one.
    """
    from crawler_spark.operators.dedup import hamming_near_pairs

    vals = (
        images.select("phash").distinct()
        .withColumn("__v", F.col("phash"))
    )
    return hamming_near_pairs(
        vals, "__v", "phash", bits=bits, chunks=chunks,
        max_hamming=max_hamming, max_chunk_df=max_chunk_df,
    ).select(
        F.col("a_id").alias("a_hash"),
        F.col("b_id").alias("b_hash"),
        "hamming",
    )


def phash_near_pairs(
    images: DataFrame,
    bits: int = 64,
    chunks: int = 8,
    max_hamming: int = 6,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance — the
    image-payload analog of text SimHash dedup, sharing the pigeonhole
    machinery (operators.dedup.hamming_near_pairs): any pair within
    ``max_hamming ≤ chunks−1`` shares at least one exact chunk, so the
    chunk-equality inverted-index join is a complete candidate generator and
    ``bit_count(xor)`` verifies exactly.  At 10^10 images the chunk value is
    a partition key of the image store; candidates stay bucket-local.

    Skew-safe by construction: aHash values are NOT uniform (flat images
    cluster near all-0/all-1 hashes, and exact duplicates are the mass of
    any crawl corpus), so the operator first COLLAPSES to one row per
    distinct phash value, runs the chunk join over values only
    (:func:`phash_value_pairs` — cost independent of duplicate
    multiplicity), then expands back through two equi-joins:
    value-pair × members for cross-value pairs, and a per-value member
    self-join emitting the hamming-0 pairs.  Output is identical to the
    naive per-image chunk join (pinned by tests/test_analytics.py).

    Chunk sizing is still geometry: the value-level join is
    Σ_values n_v² per chunk position over DISTINCT values, so the
    chunk-value space 2^(bits/chunks) must dwarf the distinct-value count —
    at 10^10 images prefer chunks=4 (16-bit values, max_hamming ≤ 3) over
    the default 8, and/or set ``max_chunk_df`` to cap any residual hot
    chunk-value list (lower-bound semantics, see
    ``dedup.hamming_near_pairs``).

    Input needs (image_id, phash); compose with :func:`ahash_images` when
    the phash column is not materialized yet.
    """
    members = images.select("image_id", "phash")
    vp = phash_value_pairs(
        members, bits=bits, chunks=chunks, max_hamming=max_hamming,
        max_chunk_df=max_chunk_df,
    )
    cross = (
        vp.join(members.alias("ma"), F.col("a_hash") == F.col("ma.phash"))
        .join(members.alias("mb"), F.col("b_hash") == F.col("mb.phash"))
        .select(
            F.least("ma.image_id", "mb.image_id").alias("a_id"),
            F.greatest("ma.image_id", "mb.image_id").alias("b_id"),
            "hamming",
        )
    )
    intra = (
        members.alias("x")
        .join(
            members.alias("y"),
            (F.col("x.phash") == F.col("y.phash"))
            & (F.col("x.image_id") < F.col("y.image_id")),
        )
        .select(
            F.col("x.image_id").alias("a_id"),
            F.col("y.image_id").alias("b_id"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


def phash_value_index(
    images: DataFrame, bits: int = 64, chunks: int = 8
) -> DataFrame:
    """The persisted incremental-dedup index for image perceptual hashes:
    chunk rows (phash, chunk_id, chunk_val) over the corpus's DISTINCT
    phash values — the image analog of ``dedup.lsh_band_rows``.

    Value-level on purpose: the index grows with distinct hash values, not
    with images (exact crawl duplicates — the mass of any image corpus —
    add nothing), and each row is three small ints, so at 10^10 images the
    index is a compact chunk-partitionable table appended per crawl batch.
    Image membership (image_id → phash) needs no extra storage — it is the
    image store itself."""
    from crawler_spark.operators.dedup import hash_chunk_rows

    vals = images.select("phash").distinct()
    return hash_chunk_rows(vals, [], "phash", bits, chunks)


def phash_incremental_pairs(
    index: DataFrame,
    old_members: DataFrame,
    new_images: DataFrame,
    bits: int = 64,
    chunks: int = 8,
    max_hamming: int = 6,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Incremental image near-dup detection: pairs involving at least one
    NEW image, by probing a persisted :func:`phash_value_index` — the
    production shape of :func:`phash_near_pairs` at corpus scale, where
    re-joining all 10^10 stored hashes per crawl batch is the cost you must
    not pay.  Image analog of ``dedup.lsh_incremental_pairs``.

    ``index``: phash_value_index over the EXISTING corpus (a stored table;
    appended per batch).  ``old_members``/``new_images``: (image_id, phash)
    of the existing corpus and the new batch; image_ids must be globally
    unique.  Per-batch cost is O(new·chunks) chunking plus a join whose
    probe side is the new batch's distinct values — a new image whose phash
    was already seen still probes correctly because the probe side carries
    every value the new batch touches.  Equals phash_near_pairs(old ∪ new)
    restricted to pairs with a new side (pinned by tests/test_analytics.py);
    inherits the value-level skew safety and the ``max_chunk_df`` cap
    (lower-bound semantics, applied to the combined value lists)."""
    from crawler_spark.operators.dedup import hash_chunk_rows

    new_members = new_images.select("image_id", "phash")
    new_chunks = hash_chunk_rows(
        new_members.select("phash").distinct(), [], "phash", bits, chunks
    )
    all_chunks = index.unionByName(new_chunks).distinct()
    if max_chunk_df is not None:
        cold = (
            all_chunks.groupBy("chunk_id", "chunk_val")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_chunk_df)
            .select("chunk_id", "chunk_val")
        )
        all_chunks = all_chunks.join(
            cold, on=["chunk_id", "chunk_val"], how="left_semi"
        )
        new_chunks = new_chunks.join(
            cold, on=["chunk_id", "chunk_val"], how="left_semi"
        )
    a, b = new_chunks.alias("a"), all_chunks.alias("b")
    vp = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.phash") != F.col("b.phash")),
        )
        .select(
            F.least("a.phash", "b.phash").alias("a_hash"),
            F.greatest("a.phash", "b.phash").alias("b_hash"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    members = old_members.select("image_id", "phash").withColumn(
        "is_new", F.lit(False)
    ).unionByName(new_members.withColumn("is_new", F.lit(True)))
    cross = (
        vp.join(members.alias("ma"), F.col("a_hash") == F.col("ma.phash"))
        .join(members.alias("mb"), F.col("b_hash") == F.col("mb.phash"))
        .filter(F.col("ma.is_new") | F.col("mb.is_new"))
        .select(
            F.least("ma.image_id", "mb.image_id").alias("a_id"),
            F.greatest("ma.image_id", "mb.image_id").alias("b_id"),
            "hamming",
        )
    )
    intra = (
        members.alias("x")
        .join(
            members.alias("y"),
            (F.col("x.phash") == F.col("y.phash"))
            & (F.col("x.image_id") < F.col("y.image_id"))
            & (F.col("x.is_new") | F.col("y.is_new")),
        )
        .select(
            F.col("x.image_id").alias("a_id"),
            F.col("y.image_id").alias("b_id"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


# video container for the frame pipeline: "VID0" + u32 n + n×(u32 len ‖ PNG)
_VID_MAGIC = b"VID0"


def encode_video(frames: list) -> bytes:
    """Pack RGB frames into the internal container (PNG per frame)."""
    import struct

    from crawler_spark.sources import codecs

    blobs = [codecs.encode_png(f) for f in frames]
    out = [_VID_MAGIC, struct.pack(">I", len(blobs))]
    for b in blobs:
        out.append(struct.pack(">I", len(b)))
        out.append(b)
    return b"".join(out)


def iter_frames(data: bytes):
    """Yield (frame_idx, png_bytes) from the internal container."""
    import struct

    assert data[:4] == _VID_MAGIC, "unknown video container"
    (n,) = struct.unpack(">I", data[4:8])
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        yield i, data[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


FRAME_SCHEMA = "video_id string, frame_idx int, bytes binary"


def sample_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling: one output row per kept frame (idx % every_n
    == 0).  Real container parsing per Arrow batch; a real deployment swaps
    ``iter_frames`` for ffmpeg bindings behind the same row contract.
    Videos that fail to parse are skipped (failure isolation), surfacing in
    the row-count delta rather than a task failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "bytes": []}
            for row in pdf.itertuples():
                try:
                    for idx, png in iter_frames(bytes(row.bytes)):
                        if idx % every_n == 0:
                            out["video_id"].append(row.video_id)
                            out["frame_idx"].append(idx)
                            out["bytes"].append(png)
                except Exception:
                    continue
            yield pd.DataFrame(out) if out["video_id"] else pd.DataFrame(
                {"video_id": pd.Series([], dtype="object"),
                 "frame_idx": pd.Series([], dtype="int32"),
                 "bytes": pd.Series([], dtype="object")}
            )

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SCHEMA)


# SDXL/NaViT-style aspect-ratio buckets: (name, bw, bh) ratio targets.  The
# CASE chain below assigns each image to the bucket minimizing
# |w/h − bw/bh| with EXACT integer arithmetic: the pairwise comparison
# |w·bh_i − h·bw_i| / bh_i is cross-multiplied by the product of all bh so
# every score is a small BIGINT — identical in any engine, no float ratios.
ASPECT_BUCKETS: tuple[tuple[str, int, int], ...] = (
    ("square_1_1", 1, 1),
    ("landscape_4_3", 4, 3),
    ("portrait_3_4", 3, 4),
    ("wide_16_9", 16, 9),
    ("tall_9_16", 9, 16),
)


def aspect_bucket_case(
    w: str = "w",
    h: str = "h",
    buckets: tuple[tuple[str, int, int], ...] = ASPECT_BUCKETS,
) -> str:
    """ANSI-SQL CASE expression assigning (w, h) to its nearest
    aspect-ratio bucket (ties → earliest bucket in the list).

    The string is valid in BOTH Spark SQL and DuckDB, so the oracle runs
    the LITERAL same expression — the assignment cannot drift between
    engines.  Pure integer codegen arithmetic: no shuffle, no UDF.
    """
    import math

    prod_bh = math.prod(bh for _, _, bh in buckets)
    scores = [
        f"(abs({w} * {bh} - {h} * {bw}) * {prod_bh // bh})"
        for _, bw, bh in buckets
    ]
    arms = []
    for i, (name, _, _) in enumerate(buckets[:-1]):
        conds = " AND ".join(
            f"{scores[i]} <= {scores[j]}" for j in range(i + 1, len(buckets))
        )
        arms.append(f"WHEN {conds} THEN '{name}'")
    return (
        "CASE " + " ".join(arms) + f" ELSE '{buckets[-1][0]}' END"
    )


def aspect_bucket_rollup(images: DataFrame) -> DataFrame:
    """Per-aspect-bucket batching stats (the SDXL/NaViT bucketing table):
    n_images, total decoded pixels, and the w/h envelope per bucket.  The
    bucket column is a map-side integer expression; one groupBy on a
    5-value key — broadcast-sized output at any corpus scale."""
    return (
        images.withColumn("bucket", F.expr(aspect_bucket_case()))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum(F.col("w").cast("long") * F.col("h")).cast("long").alias(
                "total_pixels"
            ),
            F.min("w").cast("int").alias("min_w"),
            F.max("w").cast("int").alias("max_w"),
            F.min("h").cast("int").alias("min_h"),
            F.max("h").cast("int").alias("max_h"),
        )
    )


def pack_image_shards(
    images: DataFrame, budget_bytes: int = 1_000_000, part_col: str = "fmt"
) -> DataFrame:
    """WebDataset-style shard packing: within each ``part_col`` group (the
    parallel packing unit — shards are homogeneous per format), images in
    image_id order are packed into shards whose DECODED size (w·h·3 RGB
    bytes — the batch-memory cost, not the on-disk envelope) stays within
    ``budget_bytes`` via a running sum: shard_idx = floor((cumsum − est) /
    budget).  One window shuffle on the bounded part_col key; an oversized
    single image still lands alone in its own shard (the floor rule), never
    stalls the packer."""
    from pyspark.sql import Window

    est = (F.col("w").cast("long") * F.col("h") * 3).alias("est_bytes")
    d = images.select("image_id", part_col, est)
    w = (
        Window.partitionBy(part_col)
        .orderBy("image_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer `div`, not float floor: a 100-TB corpus's per-group byte
    # cumsum exceeds the 2^53 exact-double range, where floor(x/b) on a
    # rounded double could mis-assign a boundary image
    return d.withColumn("__cum", F.sum("est_bytes").over(w)).select(
        "image_id",
        part_col,
        F.col("est_bytes").cast("long").alias("est_bytes"),
        F.expr(f"CAST((__cum - est_bytes) div {budget_bytes} AS BIGINT)").alias(
            "shard_idx"
        ),
    )


def caption_negatives(
    images: DataFrame,
    k: int = 2,
    buckets: int = 16,
    salt: str = "neg1",
) -> DataFrame:
    """Deterministic in-shard negative mining for contrastive image-caption
    training: every image gets ``k`` mismatched captions drawn from OTHER
    images in its hash shard (the explicit-materialization analog of
    in-batch negatives — reproducible across reruns, unlike batch order).

    Shuffle-safe shape: shard = md5 bucket of the image_id (uniform by
    construction), negatives are the next-``k`` neighbours in the shard's
    seeded hash order via ``lead`` — ONE window shuffle on the bounded
    shard key, no self-join, no N² pair stage.  The last ``k`` rows of a
    shard see fewer negatives (no wraparound); with shards ≫ k the loss is
    negligible and the non-cyclic rule keeps the oracle trivial.

    Returns (image_id, neg_rank 1..k, neg_image_id, neg_caption_md5).
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("image_id"))), 1, 15),
        16,
        10,
    ).cast("long")
    d = images.select(
        "image_id", F.md5("caption").alias("__cap_md5"), h.alias("__h")
    ).withColumn("__shard", (F.col("__h") % buckets).cast("int"))
    w = Window.partitionBy("__shard").orderBy(
        F.col("__h").asc(), F.col("image_id").asc()
    )
    # window exprs may not sit inside a generator: materialize the lead
    # columns first, then explode plain structs over them
    led = d.select(
        "image_id",
        *[
            c
            for i in range(1, k + 1)
            for c in (
                F.lead("image_id", i).over(w).alias(f"__nid{i}"),
                F.lead("__cap_md5", i).over(w).alias(f"__nmd{i}"),
            )
        ],
    )
    picks = [
        F.struct(
            F.lit(i).alias("neg_rank"),
            F.col(f"__nid{i}").alias("neg_image_id"),
            F.col(f"__nmd{i}").alias("neg_caption_md5"),
        )
        for i in range(1, k + 1)
    ]
    return (
        led.select("image_id", F.explode(F.array(*picks)).alias("n"))
        .select(
            "image_id",
            F.col("n.neg_rank").cast("int").alias("neg_rank"),
            F.col("n.neg_image_id").alias("neg_image_id"),
            F.col("n.neg_caption_md5").alias("neg_caption_md5"),
        )
        .filter(F.col("neg_image_id").isNotNull())
    )


def caption_embedding(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "caption",
    dims: int = 16,
) -> DataFrame:
    """Hashed ±1 bag-of-words caption embedding — the deterministic
    stand-in for the CLIP text encoder (same stub contract as the codec
    stubs in this module: the encoder is fake, the Spark-side plumbing —
    tokenize → embed → aggregate — is the real shape a CLIP-scoring
    pipeline runs).  Dim ``d`` of a token's contribution is ±1 from bit
    ``d`` of the token's 60-bit md5 prefix; the caption embedding is the
    integer SUM over its tokens, so the vector is integer-exact in any
    engine (no float enters until a downstream cosine).

    Shape: explode → ONE hash aggregate keyed by ``key_col`` with ``dims``
    map-side-combinable sum partials; output (key, array<long> emb).
    Rows whose text has no tokens produce no output row (callers join
    inner or left as their semantics require).
    """
    if not 1 <= dims <= 60:
        raise ValueError(f"dims must be in [1, 60], got {dims}")
    toks = df.select(
        key_col,
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("__tok"),
    ).filter(F.col("__tok") != "")
    h = F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10).cast("long")
    sums = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright(__h, {d}) & 1) = 1 "
                   "THEN 1 ELSE -1 END")
        )
        .cast("long")
        .alias(f"__s{d}")
        for d in range(dims)
    ]
    agg = toks.withColumn("__h", h).groupBy(key_col).agg(*sums)
    return agg.select(
        key_col,
        F.array(*[F.col(f"__s{d}") for d in range(dims)]).alias("emb"),
    )


def alignment_gate(
    pairs: DataFrame,
    img_col: str = "img_emb",
    txt_col: str = "txt_emb",
    threshold_e4: int = 2800,
) -> DataFrame:
    """LAION-style CLIP-score gate (Schuhmann et al. 2021 kept pairs with
    CLIP cosine ≥ 0.28): score every (image embedding, caption embedding)
    row by cosine similarity and gate at ``threshold_e4``/10⁴.

    Exactness: dot products and squared norms are integer aggregates over
    the integer embeddings (order-free); the only float ops are two
    correctly-rounded sqrts, one multiply, one divide and the ×10⁴
    half-away-from-zero round — a fixed single-op chain, identical in any
    engine.  Zero-norm vectors (a caption whose token signs cancel) score
    0 rather than dividing by zero.  Pure map stage — no shuffle.

    Returns the input plus (alignment_e4 BIGINT, keep BOOLEAN).
    """
    dot = (
        f"aggregate(zip_with({img_col}, {txt_col}, (x, y) -> x * y), "
        "0L, (acc, v) -> acc + v)"
    )
    sq = "aggregate(zip_with({c}, {c}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    na, nb = sq.format(c=img_col), sq.format(c=txt_col)
    cos = (
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN CAST(0 AS DOUBLE) "
        f"ELSE CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * "
        f"sqrt(CAST({nb} AS DOUBLE))) END"
    )
    return pairs.withColumn(
        "alignment_e4",
        F.expr(f"CAST(round(({cos}) * 10000, 0) AS BIGINT)"),
    ).withColumn("keep", F.col("alignment_e4") >= F.lit(threshold_e4))


def augmentation_params(
    images: DataFrame,
    crop_pct: int = 80,
    salt: str = "aug1",
) -> DataFrame:
    """Deterministic augmentation parameters per image: a seeded
    ``crop_pct``% crop box and a horizontal-flip bit, derived from md5 of
    (salt, image_id) — the reproducible-augmentation table that lets a
    training run (and its replay) see the identical augmented view of
    every sample without storing augmented pixels.

    Integer-only math (floor crops via ``div``, offsets via hash mod the
    valid range), purely map-side — at any corpus scale this is a free
    column projection next to the decode stage.
    """
    if not 0 < crop_pct <= 100:
        raise ValueError(f"crop_pct must be in (0, 100], got {crop_pct}")

    def h(tag: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:{tag}:"), F.col("image_id"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    cw = F.expr(f"greatest(CAST(w * {crop_pct} div 100 AS INT), 1)")
    ch = F.expr(f"greatest(CAST(h * {crop_pct} div 100 AS INT), 1)")
    d = images.select("image_id", "w", "h").withColumn("crop_w", cw).withColumn(
        "crop_h", ch
    )
    return d.select(
        "image_id",
        F.col("crop_w").cast("int").alias("crop_w"),
        F.col("crop_h").cast("int").alias("crop_h"),
        (h("cx") % (F.col("w") - F.col("crop_w") + 1)).cast("int").alias("x0"),
        (h("cy") % (F.col("h") - F.col("crop_h") + 1)).cast("int").alias("y0"),
        (h("fl") % 2 == 1).alias("flip"),
    )
