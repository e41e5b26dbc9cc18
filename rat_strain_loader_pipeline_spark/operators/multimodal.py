"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

Design for 100 TB training-data pipelines:
- media rows carry ``content binary`` + typed metadata (mime, width,
  height, duration_ms, sample_rate) — Spark's binary type stores the
  payload in parquet pages, so scans that only touch metadata NEVER
  read the payload bytes (column pruning);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — one Python worker round-trip per batch, not
  per row;
- the actual codec work (PIL/opencv/torchaudio) is NOT available in
  this container, so the decode core is STUBBED: ``decode_stub`` raises
  NotImplementedError unless ``deterministic_fake=True``, which produces
  a seeded, content-hash-derived fake feature vector — the Spark-side
  plumbing (schema, batching, partitioning, UDF signatures) is real and
  tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, mime string, content binary, width int, height int, "
    "duration_ms int, sample_rate int"
)

FEATURE_SCHEMA = "media_id long, mime string, feature array<float>, decode_error string"


def media_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_stub(content: bytes, mime: str, deterministic_fake: bool, dim: int = 16) -> np.ndarray:
    """Decode stub. Real deployments replace this with PIL/av/torchaudio.

    With ``deterministic_fake`` the 'feature' is derived from the
    content's sha256 — stable across runs/partitionings, so tests can
    assert exact values.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass deterministic_fake=True or plug a real decoder"
        )
    digest = hashlib.sha256(content if content is not None else b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(
    media: DataFrame,
    deterministic_fake: bool = True,
    dim: int = 16,
) -> DataFrame:
    """Decode + feature-extract as one mapInPandas stage.

    Per-batch vectorization; decode failures are captured per row in
    ``decode_error`` instead of failing the task (poison-pill isolation —
    mandatory at 100 TB where some payloads are always corrupt).
    """
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    vec = decode_stub(row.content, row.mime, deterministic_fake, dim)
                    out.append((row.media_id, row.mime, [float(x) for x in vec], None))
                except Exception as e:  # poison-pill isolation
                    out.append((row.media_id, row.mime, None, str(e)[:200]))
            yield pd.DataFrame(out, columns=["media_id", "mime", "feature", "decode_error"])

    return media.select("media_id", "mime", "content").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode (media_id, frame_ts_ms)
    WITHOUT decoding — pure metadata arithmetic, so the planner stage
    shuffles only (id, ts) pairs and the decode stage can be partitioned
    independently of source file sizes."""
    return (
        media.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def audio_segment_plan(
    media: DataFrame, window_ms: int = 5000, hop_ms: int | None = None
) -> DataFrame:
    """Audio segmentation plan: explode audio rows into
    (media_id, seg_start_ms, seg_end_ms, n_samples) windows WITHOUT
    decoding — metadata arithmetic only, the audio twin of
    ``frame_sample_plan``. ``hop_ms`` < ``window_ms`` gives overlapping
    windows (STFT-style); default is back-to-back. The final partial
    window is kept (clamped end), matching feature extractors that pad.
    """
    hop = hop_ms or window_ms
    dur = F.coalesce(F.col("duration_ms"), F.lit(0))
    starts = F.sequence(
        F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(hop)
    )
    out = (
        media.filter(F.col("mime").startswith("audio/"))
        .select(
            "media_id",
            "sample_rate",
            dur.alias("__dur"),
            F.explode(starts).alias("seg_start_ms"),
        )
        .withColumn("seg_end_ms", F.least(F.col("seg_start_ms") + window_ms, F.col("__dur")))
        .filter(F.col("seg_end_ms") > F.col("seg_start_ms"))
    )
    n_samples = (
        (F.col("seg_end_ms") - F.col("seg_start_ms"))
        * F.coalesce(F.col("sample_rate"), F.lit(0))
        / 1000
    )
    return out.select(
        "media_id",
        "seg_start_ms",
        "seg_end_ms",
        F.floor(n_samples).cast("long").alias("n_samples"),
    )


def resize_metadata(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning: target dimensions preserving aspect ratio —
    metadata-only (the pixel work belongs to the decode stage)."""
    w, h = F.col("width"), F.col("height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.withColumn("target_width", F.floor(w * scale).cast("int")).withColumn(
        "target_height", F.floor(h * scale).cast("int")
    )
