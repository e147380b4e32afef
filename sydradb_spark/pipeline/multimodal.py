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


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio decode → features over ``kind == 'audio'`` rows; same
    Arrow-batched mapInPandas shape as images. The decode kernel is a STUB
    (sample rate / duration / RMS derived deterministically from the payload
    bytes — a real build calls soundfile/torchaudio here); the schema, batch
    flow and partition sizing are production-real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].str.len().fillna(0).astype("int64")
            first = pdf["payload"].str[0:1].apply(
                lambda b: b[0] if isinstance(b, bytes) and b else 0
            )
            rate = (8000 + (first % 4) * 8000).astype("int32")  # 8/16/24/32 kHz
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rate,
                    # fake PCM16 mono: n_bytes / (2 * rate) seconds
                    "duration_s": n / (2.0 * rate),
                    "rms": first.astype("float64") / 255.0,
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
