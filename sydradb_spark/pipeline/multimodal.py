"""Multimodal-column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decode/feature-extract as Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so every kernel is pure
stdlib+numpy — and REAL where the stdlib reaches: PNG decode (zlib inflate +
full filter reconstruction), PNG encode, nearest-neighbor resize, WAV decode
(``wave``), and MJPEG/concatenated-PNG frame splitting. Payloads outside
those formats fall back to deterministic fakes (clearly marked per kernel)
so the Spark-side contract — schemas, batch shapes, partition sizing — stays
pinned; a production deployment swaps PIL/torchaudio/PyAV into the same
seams without touching the plumbing.

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

_pickle_by_value_registered = False


def _register_pickle_by_value() -> None:
    """Ship this module's code with UDF closures (same pattern as
    pipeline.events, r10): the decode kernels reference module-level
    helpers (_decode_png_pixels, _split_frames, ...) which cloudpickle
    otherwise serializes BY REFERENCE — working only while the Python
    worker's sys.path can resolve sydradb_spark (driver cwd == repo root).
    Registration removes that deployment assumption for every multimodal
    kernel at once. Guarded process-global side effect, runs once."""
    global _pickle_by_value_registered
    if _pickle_by_value_registered:
        return
    from pyspark import cloudpickle

    import sydradb_spark.pipeline.multimodal as _mod

    cloudpickle.register_pickle_by_value(_mod)
    _pickle_by_value_registered = True


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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_pixels(payload):
    """REAL PNG decode using only the stdlib (zlib) — chunk parse, IDAT
    inflate, full filter reconstruction (None/Sub/Up/Average/Paeth) for
    8-bit gray/RGB/RGBA, non-interlaced. Returns ``(width, height,
    channels, pixels)`` with ``pixels`` an (h, w, channels) uint8 ndarray,
    or None when the payload is not decodable PNG — callers fall back to
    their deterministic fakes, the same optional-decoder pattern as WAV
    audio. A production build swaps in PIL/torchvision for the full format
    zoo; this proves the kernel seam with real bytes."""
    import zlib

    import numpy as np

    if not isinstance(payload, (bytes, bytearray)) or not bytes(payload).startswith(
        _PNG_SIG
    ):
        return None
    data = bytes(payload)
    pos, idat, ihdr = 8, b"", None
    try:
        while pos + 8 <= len(data):
            ln = int.from_bytes(data[pos : pos + 4], "big")
            typ = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                ihdr = body
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            pos += 12 + ln  # len + type + crc
        if ihdr is None or len(ihdr) < 13:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
        channels = {0: 1, 2: 3, 6: 4}.get(color)
        if depth != 8 or channels is None or interlace != 0 or not w or not h:
            return None
        raw = zlib.decompress(idat)
        stride = w * channels
        if len(raw) < h * (stride + 1):
            return None
        img = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            off = y * (stride + 1)
            f = raw[off]
            line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
                np.int64
            )
            if f == 0:
                rec = line
            elif f == 2:  # Up
                rec = (line + prev) % 256
            else:  # Sub/Average/Paeth need the running left value
                rec = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = rec[x - channels] if x >= channels else 0
                    b = prev[x]
                    c = prev[x - channels] if x >= channels else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    elif f == 4:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    else:
                        return None
                    rec[x] = (line[x] + pred) % 256
            img[y] = rec
            prev = rec
        return w, h, channels, img.reshape(h, w, channels)
    except (zlib.error, ValueError, IndexError):
        return None


def _decode_png(payload) -> tuple[int, int, float] | None:
    """(width, height, mean_luma in [0,1]) from a real PNG decode, or None
    when not decodable (caller falls back to the deterministic fake)."""
    dec = _decode_png_pixels(payload)
    if dec is None:
        return None
    w, h, channels, img = dec
    px = img.astype("float64")
    if channels == 1:
        luma = px[:, :, 0]
    else:
        luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return w, h, float(luma.mean() / 255.0)


def _encode_png(img, channels: int) -> bytes:
    """Minimal stdlib PNG encoder (8-bit gray/RGB/RGBA, filter 0 rows) —
    the inverse of ``_decode_png_pixels``, so resize/frame kernels can emit
    payloads that any standards-compliant viewer (and our own decoder)
    reads back."""
    import struct
    import zlib

    h, w = img.shape[0], img.shape[1]
    color = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = img.reshape(h, w * channels).astype("uint8")
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    idat = zlib.compress(raw)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Image decode kernel: PNG payloads get a REAL stdlib decode
    (`_decode_png` — dimensions and mean luma from the actual pixels);
    anything else falls back to the deterministic fake so the Arrow
    batching/schema plumbing stays pinned without image libraries in the
    container (a production build adds PIL/torchvision in the same seam)."""
    widths: list[int] = []
    heights: list[int] = []
    lumas: list[float] = []
    for b in payloads:
        dec = _decode_png(b)
        if dec is None:
            n = len(b) if isinstance(b, (bytes, bytearray)) else 0
            first = b[0] if isinstance(b, (bytes, bytearray)) and b else 0
            dec = (64 + (n % 64), 64 + (first % 64), first / 255.0)
        widths.append(dec[0])
        heights.append(dec[1])
        lumas.append(dec[2])
    return pd.DataFrame(
        {
            "width": pd.Series(widths, dtype="int32"),
            "height": pd.Series(heights, dtype="int32"),
            "mean_luma": pd.Series(lumas, dtype="float64"),
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

    _register_pickle_by_value()
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

    _register_pickle_by_value()
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


def _resize_nearest(img, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, c) uint8 grid to (height,
    width, c) — pure numpy index maps (the PIL-free scale path; a
    production build swaps in a bilinear/Lanczos library kernel here
    without touching the Spark plumbing)."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = np.minimum((np.arange(height) * (h / height)).astype("int64"), h - 1)
    xs = np.minimum((np.arange(width) * (w / width)).astype("int64"), w - 1)
    return img[ys][:, xs]


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize: Arrow-batched mapInPandas emitting fixed-dimension payloads.
    Decodable PNG payloads get a REAL resample — stdlib decode →
    nearest-neighbor index-map → stdlib PNG re-encode, so the output
    payload is a standards-valid PNG of exactly (width, height). Payloads
    the stdlib decoder can't read fall back to the deterministic byte
    truncate/pad fake (raw width*height buffer), keeping the plumbing
    pinned without image libraries in the container. Partition sizing
    note: decoded grids are W*H*channels bytes per record, so executor
    memory per batch is bounded by maxRecordsPerBatch * W * H * 4."""
    target = width * height

    def one(b):
        dec = _decode_png_pixels(b)
        if dec is not None:
            _, _, channels, img = dec
            return _encode_png(_resize_nearest(img, width, height), channels)
        return (b or b"").ljust(target, b"\0")[:target]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].apply(one),
                }
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    _register_pickle_by_value()
    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def _split_frames(payload: bytes) -> list[bytes] | None:
    """Split an MJPEG-style concatenated-image stream into frames: PNG
    frames by walking chunks to each IEND (mirroring ``_jpeg_frame_end`` —
    a signature-byte scan would mis-split on the 8 signature bytes
    occurring inside IDAT zlib data and desynchronize every later frame
    boundary), JPEG frames by SOI/EOI marker-segment walk. Returns None
    when the payload is not a recognizable image stream (caller falls
    back to the byte-slice fake). This is the real demuxer seam — a
    production build swaps in PyAV/ffmpeg for true containers; frame
    iteration, sampling, and the Spark-side schema stay identical."""
    data = bytes(payload or b"")
    if len(data) >= 12 and data[4:8] == b"ftyp":
        # real MP4/ISO-BMFF demux: moov sample-table walk (stsz/stsc/
        # stco/stss) — each frame is one stored video access unit
        mp4 = _mp4_video_samples(data)
        if mp4 is not None:
            return mp4[0]
    if data.startswith(_PNG_SIG):
        frames = []
        pos = 0
        while pos < len(data) and data[pos : pos + 8] == _PNG_SIG:
            end = _png_frame_end(data, pos)
            if end is None:
                # structural walk failed (bogus chunk length, truncation,
                # lost chunk sync): fall back to the lenient signature
                # scan for THIS frame, preserving the pre-walker behavior
                # for non-conformant streams
                nxt = data.find(_PNG_SIG, pos + 8)
                end = nxt if nxt != -1 else len(data)
            frames.append(data[pos:end])
            pos = end
        if pos < len(data):
            # trailing bytes after the last IEND that are not another PNG
            # signature: fold into the last frame (the signature scan ran
            # frames to the next signature/end of data — keep that shape)
            frames[-1] = frames[-1] + data[pos:]
        return frames
    if data[:2] == b"\xff\xd8":  # JPEG SOI
        frames = []
        pos = 0
        while pos < len(data) and data[pos : pos + 2] == b"\xff\xd8":
            end = _jpeg_frame_end(data, pos)
            if end is None:
                # structural walk failed (non-conformant filler frame,
                # bogus segment length, truncation): fall back to the
                # lenient first-EOI byte scan for THIS frame, preserving
                # the pre-walker behavior for unstructured streams
                eoi = data.find(b"\xff\xd9", pos + 2)
                if eoi == -1:
                    frames.append(data[pos:])
                    break
                end = eoi + 2
            frames.append(data[pos:end])
            pos = end
        return frames
    return None


def _png_frame_end(data: bytes, start: int) -> int | None:
    """Index one past this PNG frame's IEND chunk (including its CRC), by
    walking the chunk chain — length + type + body + CRC per chunk — from
    the signature. Returns None on ANY structural anomaly (chunk running
    past the payload, non-ASCII chunk type = lost sync, no IEND), and the
    caller falls back to the lenient signature scan for that frame."""
    if data[start : start + 8] != _PNG_SIG:
        return None
    pos = start + 8
    n = len(data)
    while pos + 8 <= n:
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        # chunk type is four ASCII letters; anything else means lost sync
        if not all(65 <= b <= 90 or 97 <= b <= 122 for b in typ):
            return None
        end = pos + 12 + ln  # len(4) + type(4) + body + crc(4)
        if end > n:
            return None  # truncated / bogus declared length
        if typ == b"IEND":
            return end
        pos = end
    return None


def _jpeg_frame_end(data: bytes, start: int) -> int | None:
    """Index one past this JPEG frame's EOI, by walking marker segments —
    NOT by searching for the first ``FF D9`` anywhere: an EOI inside a
    length-delimited segment (the standard case is a complete thumbnail
    JPEG embedded in an APP1/EXIF segment) would truncate the frame
    mid-header and desynchronize every later frame boundary. APPn/DQT/SOF/
    DHT/COM segments are skipped by their declared length; after SOS the
    entropy-coded scan is skipped to the next real marker (``FF`` followed
    by anything but ``00`` stuffing or ``D0``-``D7`` restart marks).
    Returns None on ANY structural anomaly — lost marker sync, bogus
    segment length, truncation — and the caller falls back to the lenient
    first-EOI byte scan for that frame, so non-conformant streams keep
    the pre-walker splitting behavior."""
    i = start + 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            return None  # lost marker sync
        # fill bytes: FF FF ... FF <marker>
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            return None
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            return i + 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone markers
            i += 2
            continue
        if i + 3 >= n:
            return None
        seg_len = (data[i + 2] << 8) | data[i + 3]
        if seg_len < 2:
            return None
        i += 2 + seg_len
        if marker == 0xDA:  # SOS: skip entropy-coded data to next marker
            while i + 1 < n and not (
                data[i] == 0xFF
                and data[i + 1] != 0x00
                and not (0xD0 <= data[i + 1] <= 0xD7)
            ):
                i += 1
            if i + 1 >= n:
                return None
    return None


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO-BMFF box in
    data[start:end]. Handles size==1 (64-bit largesize) and size==0
    (box runs to the end of the enclosing container). Stops iterating on
    any structural anomaly (bogus size, truncation) — callers treat an
    incomplete walk as 'box not found' and fall back."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            return  # bogus declared size / truncation
        yield typ, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, path: list[bytes]):
    """Walk a box path (e.g. [b'moov', b'trak']) and yield the (start, end)
    body ranges of every box matching the FINAL path element."""
    if not path:
        return
    for typ, b0, b1 in _mp4_boxes(data, start, end):
        if typ != path[0]:
            continue
        if len(path) == 1:
            yield b0, b1
        else:
            yield from _mp4_find(data, b0, b1, path[1:])


def _mp4_video_samples(data: bytes) -> tuple[list[bytes], list[bool]] | None:
    """Demux an MP4/ISO-BMFF payload into its video-track samples by
    walking the moov sample tables — the same walk PyAV/ffmpeg's demux
    layer does, built from the public ISO 14496-12 box layout (no codec
    decode: each returned sample is one access unit exactly as stored in
    mdat, which is what a demuxer yields). Per track:

    - ``hdlr`` selects the video track (handler 'vide');
    - ``stsz`` gives per-sample sizes (or one uniform size);
    - ``stsc`` maps samples onto chunks (first_chunk, samples_per_chunk
      runs, 1-based, last run extends to the final chunk);
    - ``stco``/``co64`` give absolute chunk byte offsets; samples within
      a chunk are contiguous;
    - ``stss`` lists 1-based sync (key) samples; an ABSENT stss means
      every sample is a keyframe (ISO 14496-12 §8.6.2).

    Returns (samples, is_sync) or None on any structural anomaly
    (missing boxes, offsets past the payload, inconsistent counts) — the
    caller falls back to the byte-slice fake, never a partial split."""
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        return None
    moovs = list(_mp4_find(data, 0, n, [b"moov"]))
    if not moovs:
        return None
    for t0, t1 in _mp4_find(data, moovs[0][0], moovs[0][1], [b"trak"]):
        mdias = list(_mp4_find(data, t0, t1, [b"mdia"]))
        if not mdias:
            continue
        hdlrs = list(_mp4_find(data, mdias[0][0], mdias[0][1], [b"hdlr"]))
        # hdlr body: version/flags(4) pre_defined(4) handler_type(4)
        if not hdlrs or data[hdlrs[0][0] + 8 : hdlrs[0][0] + 12] != b"vide":
            continue
        stbls = list(
            _mp4_find(data, mdias[0][0], mdias[0][1], [b"minf", b"stbl"])
        )
        if not stbls:
            return None
        s0, s1 = stbls[0]

        def table(name: bytes):
            found = list(_mp4_find(data, s0, s1, [name]))
            return found[0] if found else None

        stsz, stsc, stss = table(b"stsz"), table(b"stsc"), table(b"stss")
        stco = table(b"stco") or table(b"co64")
        wide = table(b"stco") is None
        if stsz is None or stsc is None or stco is None:
            return None
        # stsz: version/flags(4) sample_size(4) sample_count(4) [sizes]
        uniform = int.from_bytes(data[stsz[0] + 4 : stsz[0] + 8], "big")
        count = int.from_bytes(data[stsz[0] + 8 : stsz[0] + 12], "big")
        if uniform:
            sizes = [uniform] * count
        else:
            if stsz[0] + 12 + 4 * count > stsz[1]:
                return None
            sizes = [
                int.from_bytes(data[stsz[0] + 12 + 4 * i : stsz[0] + 16 + 4 * i], "big")
                for i in range(count)
            ]
        # stco/co64: version/flags(4) entry_count(4) [offsets]
        w = 8 if wide else 4
        nch = int.from_bytes(data[stco[0] + 4 : stco[0] + 8], "big")
        if stco[0] + 8 + w * nch > stco[1]:
            return None
        chunk_offs = [
            int.from_bytes(data[stco[0] + 8 + w * i : stco[0] + 8 + w * (i + 1)], "big")
            for i in range(nch)
        ]
        # stsc: version/flags(4) entry_count(4) [first_chunk, spc, sdi]
        nsc = int.from_bytes(data[stsc[0] + 4 : stsc[0] + 8], "big")
        if stsc[0] + 8 + 12 * nsc > stsc[1] or nsc == 0:
            return None
        runs = [
            (
                int.from_bytes(data[stsc[0] + 8 + 12 * i : stsc[0] + 12 + 12 * i], "big"),
                int.from_bytes(data[stsc[0] + 12 + 12 * i : stsc[0] + 16 + 12 * i], "big"),
            )
            for i in range(nsc)
        ]
        # expand sample → absolute offset: chunks are 1-based; each stsc
        # run covers [first_chunk, next run's first_chunk)
        samples: list[bytes] = []
        si = 0
        for ri, (first, spc) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < nsc else nch
            for ch in range(first, last + 1):
                if ch < 1 or ch > nch:
                    return None
                off = chunk_offs[ch - 1]
                for _ in range(spc):
                    if si >= count:
                        break
                    sz = sizes[si]
                    if off + sz > n:
                        return None
                    samples.append(data[off : off + sz])
                    off += sz
                    si += 1
        if si != count:
            return None
        if stss is None:
            sync = [True] * count
        else:
            nss = int.from_bytes(data[stss[0] + 4 : stss[0] + 8], "big")
            if stss[0] + 8 + 4 * nss > stss[1]:
                return None
            marks = {
                int.from_bytes(data[stss[0] + 8 + 4 * i : stss[0] + 12 + 4 * i], "big")
                for i in range(nss)
            }
            sync = [(i + 1) in marks for i in range(count)]
        return samples, sync
    return None


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads: emits (media_id, frame_idx,
    frame_payload) rows for every ``every_n``-th frame, ``frame_idx`` the
    frame's index in the original stream.

    MP4/ISO-BMFF containers get a REAL demux (moov sample-table walk,
    ``_mp4_video_samples``) — each emitted frame is one stored video
    access unit. Concatenated-PNG and MJPEG (concatenated-JPEG) streams
    get a REAL split — each emitted frame is a complete, individually
    decodable image. Other opaque payloads fall back to the
    deterministic byte-slice fake so the plumbing stays pinned without a
    codec library in the container. Raises NotImplementedError for
    non-video kinds.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_payload", BinaryType(), True),
        ]
    )
    step = max(int(every_n), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    raise NotImplementedError(
                        f"frame sampling for kind={r['kind']!r} requires a real demuxer"
                    )
                payload = r["payload"] or b""
                frames = _split_frames(payload)
                if frames is not None:
                    for i in range(0, len(frames), step):
                        rows.append((r["media_id"], i, frames[i]))
                else:
                    # opaque payload: deterministic byte-slice fake
                    for i in range(0, max(len(payload) // step, 1)):
                        rows.append(
                            (r["media_id"], i, payload[i * step : (i + 1) * step])
                        )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    _register_pickle_by_value()
    return media.mapInPandas(run, schema=schema)


def extract_keyframes(media: DataFrame) -> DataFrame:
    """Keyframe extraction for video payloads: emits (media_id,
    frame_idx, frame_payload) for every SYNC sample only.

    MP4/ISO-BMFF: real — the stss sync-sample table marks the keyframes
    (absent stss ⇒ every sample is sync, ISO 14496-12 §8.6.2), and each
    emitted payload is the stored access unit from mdat. Concatenated
    PNG/MJPEG streams: every frame is intra-coded, so every frame is a
    keyframe. Opaque payloads that no walker recognizes yield NO rows —
    a keyframe of an undemuxable container is not fakeable, and silently
    emitting byte slices here would poison a downstream dedup/caption
    stage (sample_video_frames keeps the labeled byte-slice fake for
    plumbing tests; this operator is the honest subset).

    100-TB shape: mapInPandas over Arrow batches, one pass per payload,
    output bounded by the true keyframe count; no shuffle.
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
                        f"keyframe extraction for kind={r['kind']!r} requires a real demuxer"
                    )
                data = bytes(r["payload"] or b"")
                if len(data) >= 12 and data[4:8] == b"ftyp":
                    mp4 = _mp4_video_samples(data)
                    if mp4 is not None:
                        samples, sync = mp4
                        for i, (s, k) in enumerate(zip(samples, sync)):
                            if k:
                                rows.append((r["media_id"], i, s))
                        continue
                frames = _split_frames(data)
                if frames is not None:  # PNG/MJPEG: all frames intra
                    for i, fr in enumerate(frames):
                        rows.append((r["media_id"], i, fr))
                # else: opaque — no honest keyframes to emit
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    _register_pickle_by_value()
    return media.mapInPandas(run, schema=schema)
