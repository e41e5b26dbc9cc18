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
import struct
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

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_channels int, "
    "sample_rate int, bits_per_sample int, n_frames long, content_sum long, "
    "payload_len int, decode_error string"
)


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


# --------------------------------------------------------------------------
# Real stdlib decoders: uncompressed BMP and PCM WAV via `struct`.
#
# The container has no media codecs (PIL/cv2/soundfile absent), so the two
# formats whose byte layout the stdlib can parse completely — BI_RGB BMP and
# PCM16 RIFF/WAVE — get REAL decoders: header fields, pixel-array stride
# handling (row padding to 4 bytes) and sample parsing are all exercised
# against bytes we did not shortcut. `synth_bmp`/`synth_wav` are the fixture
# generators (at scale the bytes come from object storage); padding bytes are
# deliberately 0xFF so a stride bug changes the pixel sum loudly.
# --------------------------------------------------------------------------


def synth_bmp(width: int, height: int, pixel_value: int) -> bytes:
    """24bpp bottom-up BI_RGB BMP with every pixel byte == pixel_value."""
    row = bytes([pixel_value & 0xFF]) * (width * 3)
    pad = (-len(row)) % 4
    row += b"\xff" * pad  # non-zero padding: stride bugs corrupt the sum
    pixels = row * height
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def synth_bmp_textured(
    width: int,
    height: int,
    seed: int,
    hot_x: int | None = None,
    hot_y: int | None = None,
    bump: int = 9,
) -> bytes:
    """24bpp bottom-up BI_RGB BMP with a deterministic pseudo-random
    texture: pixel (x, y) has all three channel bytes ==
    ((2·seed+1)·(7x² + 5y² + 3xy + 11x + 13y) + seed) % 256. The
    quadratic mixing makes adjacent-sample comparisons ~uniform bits
    (unrelated images sit at hamming ≈ n_bits/2); the seed multiplies
    (odd, hence invertible mod 256) so different seeds change the
    DIFFERENCES a dHash sees, not just an additive offset that would
    cancel out of every comparison. ``bump`` perturbs the single
    optional hot pixel — the near-duplicate perturbation for
    perceptual-hash tests (a one-pixel edit moves at most 2 dHash
    bits). Formula is oracle-rebuildable in SQL."""
    rows = []
    pad = (-(width * 3)) % 4
    m = (2 * seed + 1) % 256
    for y in range(height):
        row = bytearray()
        for x in range(width):
            g = (m * (7 * x * x + 5 * y * y + 3 * x * y + 11 * x + 13 * y) + seed) % 256
            if hot_x == x and hot_y == y:
                g = (g + bump) % 256
            row += bytes([g]) * 3
        row += b"\xff" * pad
        rows.append(bytes(row))
    pixels = b"".join(rows)
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def synth_wav(sample_rate: int, n_channels: int, n_frames: int, amplitude: int) -> bytes:
    """Canonical 44-byte-header PCM16 WAV with every sample == amplitude."""
    data = struct.pack("<h", amplitude) * (n_frames * n_channels)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * n_channels * 2, n_channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_media(content: bytes) -> dict:
    """Parse BMP or WAV bytes (dispatch on magic) into typed fields.

    BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp BI_RGB only; walks
    the pixel array row-by-row honoring the 4-byte stride, summing pixel
    bytes and skipping padding. WAV: walks RIFF chunks (no fixed-offset
    assumption) to `fmt ` and `data`, PCM16 only; sums int16 samples.
    Anything else raises — callers poison-pill-isolate per row.
    """
    if content is None or len(content) < 12:
        raise ValueError("payload too short for any supported container")
    if content[:2] == b"BM":
        if len(content) < 54:
            raise ValueError("BMP truncated before BITMAPINFOHEADER")
        _, _file_size, _, _, data_offset = struct.unpack_from("<2sIHHI", content, 0)
        hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", content, 14
        )
        if bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
        abs_h = abs(height)
        stride = ((width * 3 + 3) // 4) * 4
        if data_offset + stride * abs_h > len(content):
            raise ValueError("BMP pixel array truncated")
        arr = np.frombuffer(content, dtype=np.uint8, offset=data_offset, count=stride * abs_h)
        rows = arr.reshape(abs_h, stride)[:, : width * 3]  # drop per-row padding
        return {
            "kind": "bmp",
            "width": width,
            "height": abs_h,
            "n_channels": None,
            "sample_rate": None,
            "bits_per_sample": bpp,
            "n_frames": None,
            "content_sum": int(rows.astype(np.int64).sum()),
            "payload_len": len(content),
        }
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(content):
            cid, size = struct.unpack_from("<4sI", content, pos)
            body = content[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt or data chunk")
        audio_format, n_channels, sample_rate, _, _, bits = fmt
        if audio_format != 1 or bits != 16:
            raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
        samples = np.frombuffer(data, dtype="<i2")
        return {
            "kind": "wav",
            "width": None,
            "height": None,
            "n_channels": n_channels,
            "sample_rate": sample_rate,
            "bits_per_sample": bits,
            "n_frames": len(samples) // n_channels,
            "content_sum": int(samples.astype(np.int64).sum()),
            "payload_len": len(content),
        }
    raise ValueError("unrecognized magic (supported: BMP, RIFF/WAVE)")


def decode_media_columns(media: DataFrame) -> DataFrame:
    """Real decode as one Arrow-batched mapInPandas stage over
    (media_id, content): BMP/WAV headers + payload aggregates, decode
    failures captured per row in ``decode_error`` (poison-pill isolation,
    same policy as ``extract_features``)."""
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(media.sparkSession)
    fields = [
        "kind", "width", "height", "n_channels", "sample_rate",
        "bits_per_sample", "n_frames", "content_sum", "payload_len",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    d = decode_media(row.content)
                    out.append((row.media_id, *[d[f] for f in fields], None))
                except Exception as e:  # poison-pill isolation
                    out.append((row.media_id, *[None] * len(fields), str(e)[:200]))
            yield pd.DataFrame(out, columns=["media_id", *fields, "decode_error"])

    return media.select("media_id", "content").mapInPandas(run, schema=DECODED_SCHEMA)


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
        F.col("seg_start_ms").cast("long").alias("seg_start_ms"),
        F.col("seg_end_ms").cast("long").alias("seg_end_ms"),
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


# --------------------------------------------------------------------------
# Perceptual hashing — the image near-dup stage of a multimodal corpus
# build. dHash (difference hash): sample the decoded grayscale image on a
# fixed 8x8 grid (nearest-neighbor — exact integer picks, no averaging, so
# a SQL oracle can rebuild every sample from the generator formulas), then
# one bit per horizontal neighbor comparison: 8 rows x 7 comparisons = 56
# bits, packed little-endian into a non-negative int64. Near-dup pairs
# then come from the SAME pigeonhole banding machinery as text simhash
# (operators/dedup.py simhash_near_dup_pairs, sigs= path): any pair within
# hamming distance k matches exactly in >= 1 of k+1 bit-bands, so the
# equi-join on (band, band_value) has guaranteed recall — never all-pairs.
# --------------------------------------------------------------------------

PHASH_BITS = 56
PHASH_GRID = 8


def dhash56(content: bytes) -> int:
    """56-bit dHash of a 24bpp BI_RGB BMP payload (grayscale = blue
    channel byte — callers feed gray BMPs where all three channel bytes
    are equal). Raises on non-BMP input (poison-pill isolate per row)."""
    if content is None or len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, data_offset) = struct.unpack_from("<2sIHHI", content, 0)
    _, width, height, _, bpp, compression = struct.unpack_from("<IiiHHI", content, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    if height < 0:
        # Top-down BMPs store rows in the opposite file order; sampling
        # them as-is would hash the same image differently from its
        # bottom-up twin and silently miss the near-dup. Poison-pill
        # like other unsupported variants rather than guess.
        raise ValueError("unsupported BMP: top-down (negative height)")
    abs_h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    if data_offset + stride * abs_h > len(content):
        raise ValueError("BMP pixel array truncated")
    arr = np.frombuffer(content, dtype=np.uint8, offset=data_offset, count=stride * abs_h)
    rows = arr.reshape(abs_h, stride)
    xs = [(i * width) // PHASH_GRID for i in range(PHASH_GRID)]
    ys = [(j * abs_h) // PHASH_GRID for j in range(PHASH_GRID)]
    h = 0
    for j, y in enumerate(ys):
        for i in range(PHASH_GRID - 1):
            if rows[y, xs[i + 1] * 3] > rows[y, xs[i] * 3]:
                h |= 1 << (j * (PHASH_GRID - 1) + i)
    return h


def image_dhash_sigs(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, simhash) dHash signatures for BMP payloads — one Arrow-batched
    mapInPandas pass, map-only at any scale; decode failures drop the row
    (poison-pill isolation, same policy as decode_media_columns). The
    output column is named ``simhash`` so it feeds straight into
    simhash_near_dup_pairs(sigs=...)."""
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for row in pdf.itertuples(index=False):
                try:
                    sigs.append(dhash56(row.content))
                    ids.append(row[0])
                except Exception:
                    continue
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(sigs, dtype="int64")})

    return media.select(id_col, "content").mapInPandas(
        run, schema=f"{id_col} long, simhash long"
    )


def media_phash_pairs(
    media: DataFrame,
    max_hamming: int = 4,
    id_col: str = "media_id",
) -> DataFrame:
    """Image near-duplicate pairs by dHash hamming distance: map-only
    signatures, then the text-simhash pigeonhole banded join (guaranteed
    recall at <= max_hamming) + exact bit_count(xor) verify. Returns
    (id_a, id_b, hamming), id_a < id_b.

    The signature table is STAGED to parquet before the self-join —
    both join sides would otherwise recompute the decode+hash lineage;
    at corpus scale the staged (id, simhash) table is also exactly what
    an incremental pipeline persists between runs."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    sigs = stage_to_parquet(image_dhash_sigs(media, id_col=id_col), "phash-sigs")
    return simhash_near_dup_pairs(
        None,
        max_hamming=max_hamming,
        id_col=id_col,
        n_bits=PHASH_BITS,
        sigs=sigs,
    )


# --------------------------------------------------------------------------
# Audio spectral hash — the PCM counterpart of the image dHash: window the
# decoded sample stream into AUDIO_WINDOWS equal blocks (floor-bound
# partition ⌊w·n/K⌋ — tiles [0, n) exactly for every n), take each
# block's integer energy (sum of |sample|), and emit one bit per adjacent
# energy comparison (local by construction: a short edit perturbs <= a
# couple of windows, so near-identical audio sits within a small hamming
# radius while unrelated streams land at ~n_bits/2). Same pigeonhole
# banding downstream as images and text.
# --------------------------------------------------------------------------

AUDIO_WINDOWS = 56
AUDIO_BITS = AUDIO_WINDOWS - 1  # adjacent-energy comparisons


def synth_wav_samples(samples, sample_rate: int = 8000) -> bytes:
    """Canonical-header mono PCM16 WAV around an explicit sample list —
    the textured fixture generator for spectral-hash tests."""
    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def audio_dhash55(content: bytes) -> int:
    """55-bit adjacent-window-energy hash of a PCM16 WAV payload.
    Raises on non-WAV/PCM16 input (poison-pill isolate per row)."""
    if content is None or len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or fmt[0] != 1 or fmt[5] != 16:
        raise ValueError("unsupported WAV (PCM16 required)")
    x = np.abs(np.frombuffer(data, dtype="<i2").astype(np.int64))
    n = len(x)
    k = AUDIO_WINDOWS
    e = [int(x[(w * n) // k : ((w + 1) * n) // k].sum()) for w in range(k)]
    h = 0
    for w in range(k - 1):
        if e[w + 1] > e[w]:
            h |= 1 << w
    return h


def audio_spectral_sigs(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, simhash) spectral signatures for WAV payloads — one
    Arrow-batched mapInPandas pass, map-only; decode failures drop the
    row (poison-pill isolation)."""
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for row in pdf.itertuples(index=False):
                try:
                    sigs.append(audio_dhash55(row.content))
                    ids.append(row[0])
                except Exception:
                    continue
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(sigs, dtype="int64")})

    return media.select(id_col, "content").mapInPandas(
        run, schema=f"{id_col} long, simhash long"
    )


def media_audio_pairs(
    media: DataFrame,
    max_hamming: int = 4,
    id_col: str = "media_id",
) -> DataFrame:
    """Audio near-duplicate pairs by spectral-hash hamming distance —
    staged signature table + the shared pigeonhole banded join
    (guaranteed recall at <= max_hamming) + exact bit_count(xor)
    verify. Returns (id_a, id_b, hamming), id_a < id_b."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    sigs = stage_to_parquet(audio_spectral_sigs(media, id_col=id_col), "audio-sigs")
    return simhash_near_dup_pairs(
        None,
        max_hamming=max_hamming,
        id_col=id_col,
        n_bits=AUDIO_BITS,
        sigs=sigs,
    )
