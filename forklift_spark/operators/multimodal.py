"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched `mapInPandas` stages.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernel is a clearly-marked deterministic STUB — but everything
Spark-side is real and tested: the schema contract, the batch iterator
signature, partition-preserving processing, and the metadata extraction
path (byte length, magic-byte sniffing) which needs no decoder at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("magic_hex", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_REAL_DECODERS_AVAILABLE = False
try:  # pragma: no cover - decoders are absent in this container by design
    import PIL  # noqa: F401

    _REAL_DECODERS_AVAILABLE = True
except ImportError:
    pass


def _decode_stub(payload: bytes, kind: str) -> tuple[int, int, int]:
    """STUB decode: deterministic fake dimensions derived from the payload
    bytes. Replace with PIL/ffmpeg when the libs exist; the Spark-side
    plumbing (schema, batching, partitioning) is identical either way."""
    if _REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real decoder wiring lands when libs are shipped")
    h = 0
    for b in payload[:16]:
        h = (h * 31 + b) & 0x7FFFFFFF
    if kind == "image":
        return 64 + h % 1024, 64 + (h >> 10) % 1024, 0
    return 0, 0, 1000 + h % 600_000


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out,
    partitioning preserved (no shuffle). Metadata (byte length, magic bytes)
    is real; decode dims come from the stub above."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            dims = [
                _decode_stub(p if p is not None else b"", k)
                for p, k in zip(payload, pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payload],
                    "magic_hex": [
                        (p[:4].hex() if p is not None else None) for p in payload
                    ],
                    "width": pd.array([d[0] or None for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] or None for d in dims], dtype="Int32"),
                    "duration_ms": pd.array(
                        [d[2] or None for d in dims], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage: mapInPandas over image rows, one output row per
    input (partition-preserving, no shuffle). The RE-ENCODE kernel is the
    stub (no PIL in this container): output payload = deterministic
    truncation proportional to the area ratio, output dims = the real
    aspect-preserving fit of the stub-decoded dims into `max_side` — the
    arithmetic a real PIL.thumbnail call performs, so swapping the kernel
    changes no schema, batching, or partitioning."""
    side = int(max_side)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            out_w, out_h, out_p = [], [], []
            for p in pdf["payload"]:
                raw = p if p is not None else b""
                w, h, _ = _decode_stub(raw, "image")
                scale = min(1.0, side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(8, int(len(raw) * (nw * nh) / max(w * h, 1)))
                out_w.append(nw)
                out_h.append(nh)
                out_p.append(raw[:keep])  # stub re-encode
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_p,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Video frame sampling: one video row fans out to one row per sampled
    timestamp (every `every_ms`, capped at `max_frames`) — the 1->N
    explode shape of a real ffmpeg frame grab, via mapInPandas (Arrow
    batches, partition-preserving; fan-out bounded per row so batch memory
    is bounded). The FRAME-DECODE kernel is the stub: payload = a
    deterministic slice keyed by (media bytes, ts); duration comes from
    the same stub decode feature extraction uses."""
    step, cap = int(every_ms), int(max_frames)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue
            ids, idxs, tss, payloads = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = p if p is not None else b""
                _, _, dur = _decode_stub(raw, "video")
                n = min(cap, max(1, dur // step))
                for i in range(int(n)):
                    ts = i * step
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    off = (ts // max(step, 1) * 7) % max(len(raw), 1)
                    payloads.append(raw[off : off + 32])  # stub frame bytes
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_index": pd.array(idxs, dtype="Int32"),
                    "ts_ms": pd.array(tss, dtype="Int64"),
                    "payload": payloads,
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-bytes with a
    real magic prefix, so the plumbing is testable without decoders."""
    magic = {"image": b"\x89PNG", "audio": b"RIFF", "video": b"\x00\x00\x00\x18"}
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        body = bytes(((i * 131 + j * 17) % 251) for j in range(128 + i % 64))
        rows.append((i, kind, magic[kind] + body, f"{kind}/x-synthetic"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
