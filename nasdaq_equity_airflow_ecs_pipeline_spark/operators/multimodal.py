"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, batch iteration, partition sizing) is
real and tested; the actual media decode is STUBBED — the image/audio
libraries are not in this container. ``decode_fn`` is the injection
point: swap ``deterministic_fake_decode`` for a Pillow/torchaudio-backed
callable in production and nothing else changes.

Scale notes: binary payloads ride the columnar format untouched until the
decode stage; mapInPandas streams Arrow batches so peak memory is one
batch per core, and ``spark.sql.files.maxPartitionBytes`` bounds how much
binary a task holds. Metadata-only plans (filter on width/duration)
never touch the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "content_id bigint, media_type string, byte_len int, "
    "sha256 string, feat_mean double, feat_dim int"
)


def deterministic_fake_decode(payload: bytes) -> dict[str, Any]:
    """Stand-in decoder: derives a deterministic fake feature vector from
    the bytes. Real decoders (PIL.Image.open, soundfile.read) go here."""
    if payload is None:
        raise NotImplementedError("media decode of NULL payload")
    dim = 8
    feats = [payload[i % len(payload)] / 255.0 if payload else 0.0 for i in range(dim)]
    return {"feat_mean": sum(feats) / dim, "feat_dim": dim}


def extract_media_features(
    df: DataFrame,
    id_col: str = "content_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    decode_fn: Callable[[bytes], dict[str, Any]] = deterministic_fake_decode,
    batch_meta_only: bool = False,
) -> DataFrame:
    """binary payloads -> typed feature/metadata rows via mapInPandas.

    ``batch_meta_only=True`` skips the decode entirely (pure column
    expressions; payload column never deserialized in Python)."""
    import hashlib

    if batch_meta_only:
        return df.select(
            F.col(id_col).alias("content_id"),
            F.col(type_col).alias("media_type"),
            F.octet_length(payload_col).alias("byte_len"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
            F.lit(None).cast("double").alias("feat_mean"),
            F.lit(None).cast("int").alias("feat_dim"),
        )

    names = {"id": id_col, "payload": payload_col, "type": type_col}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row[names["payload"]]
                feats = decode_fn(payload)
                out.append(
                    {
                        "content_id": row[names["id"]],
                        "media_type": row[names["type"]],
                        "byte_len": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        **feats,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = "content_id bigint, width int, height int, resized binary"


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Stand-in for PIL Image.resize: deterministic byte resample (cycle
    the payload to width*height bytes). Swap for a real decoder; the
    Spark plumbing (schema, batching) does not change."""
    if not payload:
        raise NotImplementedError("resize of empty payload")
    n = width * height
    return bytes(payload[i % len(payload)] for i in range(n))


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "content_id",
    payload_col: str = "payload",
    resize_fn: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Batch image resize via mapInPandas: binary in, fixed-shape binary
    out. Output size is width*height per row — size maxRecordsPerBatch /
    maxPartitionBytes so one Arrow batch of resized payloads fits in
    executor memory at production resolutions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "content_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": [
                        resize_fn(bytes(p), width, height) for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "content_id bigint, frame_idx int, frame_sha256 string"


def fake_frame_iter(payload: bytes, n_frames: int) -> list[bytes]:
    """Stand-in for a video demuxer: split the payload into n_frames even
    slices (deterministic). Real implementation: pyav/ffmpeg keyframe
    iterator."""
    if not payload:
        raise NotImplementedError("frame sampling of empty payload")
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step:(i + 1) * step] or payload[-step:] for i in range(n_frames)]


def sample_frames(
    df: DataFrame,
    every_nth: int = 2,
    n_frames: int = 8,
    id_col: str = "content_id",
    payload_col: str = "payload",
    frame_fn: Callable[[bytes, int], list[bytes]] = fake_frame_iter,
) -> DataFrame:
    """Video frame sampling via mapInPandas: one row per sampled frame
    (table-generating — output rows > input rows, which a scalar UDF
    cannot express). Frames are hashed, not materialized, in this
    metadata pass; swap the projection to return bytes when the
    downstream featurizer needs pixels."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for _, row in pdf.iterrows():
                frames = frame_fn(bytes(row[payload_col]), n_frames)
                for i in range(0, len(frames), every_nth):
                    ids.append(row[id_col])
                    idxs.append(i)
                    hashes.append(hashlib.sha256(frames[i]).hexdigest())
            yield pd.DataFrame(
                {"content_id": ids, "frame_idx": idxs, "frame_sha256": hashes}
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)
