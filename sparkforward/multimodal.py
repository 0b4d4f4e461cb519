"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; all
processing is Arrow-batched ``mapInPandas`` over byte payloads. The decode
kernels themselves are STUBS in this environment (no image/audio libraries
in the container — clearly marked below); the Spark-side plumbing — schema,
partitioning, UDF signatures, batch shapes — is real and tested:

* :func:`synthesize_media` — deterministic fake corpus (binary payloads with
  a parseable header), generated distributed.
* :func:`decode_media` — header parse + (stubbed) pixel decode; emits typed
  metadata (width/height/channels/byte size).
* :func:`extract_features` — fixed-dim feature vector per payload. The stub
  computes a deterministic byte-histogram embedding (a real deployment swaps
  in a model forward pass; the batch shape and contract are identical).
* :func:`sample_frames` — frame-sampling over "video" payloads: splits the
  payload into fixed-size frame chunks, emits one row per sampled frame
  (a flatMap-shaped mapInPandas — rows out > rows in).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
    ]
)

_HEADER_FMT = "<4sHHB"  # magic, width, height, channels
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def synthesize_media(
    spark: SparkSession, n_rows: int, num_partitions: int = 8, seed: int = 42
) -> DataFrame:
    """Deterministic fake media table: payload = header + seeded bytes."""
    base = spark.range(0, n_rows, 1, num_partitions)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed + i)
                w, h, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3
                body = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
                payload = struct.pack(_HEADER_FMT, b"FAKE", w, h, c) + body
                rows.append((i, kinds[i % 3], payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


#: JPEG start-of-frame markers that carry dimensions (all SOF variants)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)
#: PNG color type -> channel count
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the container header — pure Python.

    Real container formats are parsed from their headers directly (no
    image library needed for metadata): PNG (IHDR), JPEG (SOF segment
    scan), GIF (logical screen descriptor), plus the deterministic FAKE
    test container. Only PIXEL decoding remains stubbed in this
    environment (no PIL/ffmpeg) — see :func:`decode_media`.
    """
    b = bytes(payload)
    if b[:4] == b"FAKE":
        _magic, w, h, c = struct.unpack_from(_HEADER_FMT, b)
        return w, h, c
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26:
        w, h = struct.unpack(">II", b[16:24])
        return w, h, _PNG_CHANNELS.get(b[25], 3)
    if b[:3] == b"\xff\xd8\xff":  # JPEG: scan segments for a SOF marker
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, b[i + 9]
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            i += 2 + struct.unpack(">H", b[i + 2 : i + 4])[0]
        raise ValueError("JPEG payload has no SOF segment")
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, 3
    # STUB: pixel/codec decode for anything else would dispatch to
    # PIL / ffmpeg — not installed in this environment.
    raise NotImplementedError(
        "Unrecognized container: metadata parsing supports FAKE/PNG/JPEG/GIF "
        "headers; full pixel decode needs PIL/ffmpeg (not installed here)."
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Binary payload -> typed metadata (Arrow-batched; decode stubbed)."""

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                w, h, c = _parse_header(payload)
                rows.append((int(mid), kind, w, h, c, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "channels", "n_bytes"],
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """(media_id, feature:array<float>) — deterministic byte-histogram stub.

    Contract-identical to a model forward pass: fixed output dim, batched
    NumPy over the Arrow batch, no per-row Python at the Spark level.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload)[_HEADER_SIZE:], dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                v = hist.astype(np.float32)
                n = np.linalg.norm(v)
                ids.append(int(mid))
                vecs.append(v / n if n else v)
            yield pd.DataFrame({"media_id": ids, "feature": vecs})

    return media.mapInPandas(feats, schema=schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 1024, every_nth: int = 4
) -> DataFrame:
    """Video payloads -> one row per sampled frame (flatMap-shaped)."""
    videos = media.filter(F.col("kind") == "video")

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(payload)[_HEADER_SIZE:]
                n_frames = max(1, len(body) // frame_bytes)
                for fno in range(0, n_frames, every_nth):
                    ids.append(int(mid))
                    nos.append(fno)
                    blobs.append(body[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": blobs})

    return videos.mapInPandas(frames, schema=FRAME_SCHEMA)
