"""Multimodal-column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decode/feature-extract as Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode kernels are STUBS
(deterministic fakes clearly marked below) — but the Spark-side contract is
real and tested: schemas, batch shapes, partition sizing, and the pattern a
production deployment drops a real decoder into.

Scale notes:
- Binary payloads ride in the same rows as metadata; Parquet stores them as
  byte arrays with page compression. Partition target: keep
  ``spark.sql.files.maxPartitionBytes`` at/below executor-memory/cores so a
  batch of decoded frames fits in memory.
- mapInPandas streams Arrow batches — decode never materializes a whole
  partition of decoded tensors; each yielded batch is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
    ]
)


def docs_as_media(docs: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Adapt the documents table into the media model (utf-8 payloads stand in
    for media bytes — the driver testdata has no real binaries)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata: size, content digest, magic-byte sniff.
    No Python, no decode — this is the 100 TB-sweep-friendly pass."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("sha256"),
        F.hex(F.substring(F.col("payload"), 1, 4)).alias("magic"),
    )


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode kernel. A real deployment replaces this body with e.g.
    PIL/torchvision; everything around it (Arrow batching, schema, partition
    shape) is production-real. The fake is deterministic on payload bytes so
    tests pin the plumbing."""
    n = payloads.str.len().fillna(0).astype("int64")
    first = payloads.str[0:1].apply(lambda b: b[0] if isinstance(b, bytes) and b else 0)
    return pd.DataFrame(
        {
            "width": (64 + (n % 64)).astype("int32"),
            "height": (64 + (first % 64)).astype("int32"),
            "mean_luma": (first.astype("float64") / 255.0),
        }
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode → features. Arrow-batched; one Python worker per
    task, bounded batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            out = pd.DataFrame({"media_id": pdf["media_id"]})
            yield pd.concat([out, feats], axis=1)

    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def _decode_wav(payload) -> tuple[int, float, float] | None:
    """REAL audio decode for RIFF/WAVE payloads via the stdlib ``wave``
    module (PCM 8/16/32-bit, any channel count — channels fold into one RMS).
    Returns (sample_rate, duration_s, rms in [0,1]) or None when the payload
    is not decodable WAV — the caller falls back to the deterministic fake,
    the same optional-decoder pattern the image kernel documents."""
    import io
    import wave

    import numpy as np

    if (
        not isinstance(payload, (bytes, bytearray))
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            rate = w.getframerate()
            n_frames = w.getnframes()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, OSError):
        return None
    if not rate:
        return None
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, midpoint 128
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return int(rate), n_frames / float(rate), rms


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio decode → features over ``kind == 'audio'`` rows; same
    Arrow-batched mapInPandas shape as images. RIFF/WAVE payloads get a REAL
    stdlib-``wave`` decode (rate/duration/RMS from the actual samples);
    anything else falls back to the deterministic fake so the plumbing stays
    pinned without audio libraries in the container (a production build adds
    soundfile/torchaudio for compressed formats in ``_decode_wav``'s place).
    The per-payload Python loop is inherent to decode — batches stay
    Arrow-bounded, the decoded samples never outlive one payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates: list[int] = []
            durs: list[float] = []
            rmss: list[float] = []
            for payload in pdf["payload"]:
                dec = _decode_wav(payload)
                if dec is None:
                    # deterministic fake: rate from the first byte
                    # (8/16/24/32 kHz), duration as fake PCM16 mono
                    b0 = (
                        payload[0]
                        if isinstance(payload, (bytes, bytearray)) and payload
                        else 0
                    )
                    rate = 8000 + (b0 % 4) * 8000
                    n = len(payload) if isinstance(payload, (bytes, bytearray)) else 0
                    dec = (rate, n / (2.0 * rate), b0 / 255.0)
                rates.append(dec[0])
                durs.append(dec[1])
                rmss.append(dec[2])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: Arrow-batched mapInPandas emitting fixed-dimension
    payloads. The resample kernel is a STUB (deterministically truncates/pads
    the payload to width*height bytes); a real build calls PIL/torchvision
    here. Partition sizing note: output rows are exactly width*height bytes,
    so executor memory per batch is bounded by maxRecordsPerBatch * W * H."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].apply(
                        lambda b: (b or b"").ljust(target, b"\0")[:target]
                    ),
                }
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id, frame_idx,
    frame_payload) rows. The splitter is a STUB (slices the payload bytes);
    a real build calls a demuxer here.

    Raises NotImplementedError for kinds it cannot fake deterministically.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_payload", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    raise NotImplementedError(
                        f"frame sampling for kind={r['kind']!r} requires a real demuxer"
                    )
                payload = r["payload"] or b""
                for i in range(0, max(len(payload) // every_n, 1)):
                    rows.append(
                        (r["media_id"], i, payload[i * every_n : (i + 1) * every_n])
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return media.mapInPandas(run, schema=schema)
