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
# real-codec stubs (media libs not installed in this container)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize_images(images: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage: real mapInPandas plumbing, stubbed codec.

    With PIL present this decodes, thumbnails to ``max_side`` and re-encodes;
    here the codec call raises so the stage fails loudly rather than lying.
    The internal PNG codec (crawler_spark.sources.codecs) covers the tested
    crawl-side path; this stub marks where a production codec plugs in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "resize_images requires a real image codec (PIL/libvips); "
                "not available in this environment"
            ) from exc
        raise NotImplementedError("real resize path not wired in-sandbox")

    return images.select(
        "image_id", "bytes", "w", "h", "fmt"
    ).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "video_id string, frame_idx int, bytes binary"


def sample_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling stage (stub): one row per sampled frame.

    Schema/explode shape is the real contract; the decoder (ffmpeg) is not
    available in-container so the UDF raises.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "sample_frames requires ffmpeg bindings; not available in-sandbox"
        )

    return videos.mapInPandas(run, FRAME_SCHEMA)
