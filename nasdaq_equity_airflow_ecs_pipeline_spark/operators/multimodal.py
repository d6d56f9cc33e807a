"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, batch iteration, partition sizing) is
real and tested. Decoding is layered (``real_decode``):

1. PNG — decoded for real, in-container, by a pure zlib+numpy decoder
   (``decode_png``: IHDR/IDAT parse, scanline unfilter, pixel stats).
2. WAV — decoded for real by the stdlib ``wave`` module
   (``decode_wav``: PCM frames -> amplitude stats).
3. JPEG & everything else — ``PIL`` when importable (not in this
   container), else the deterministic stub so the pipeline shape stays
   testable. ``decode_fn`` remains the injection point for
   torchaudio/pyav-class decoders in production.

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


def decode_png(payload: bytes) -> dict[str, Any]:
    """Real PNG decode with zlib + numpy only (no Pillow): parses IHDR,
    inflates the IDAT stream, reverses the five scanline filters
    (None/Sub/Up/Average/Paeth, PNG spec §9), and reports pixel stats.
    Supports the common cases: 8-bit grayscale / gray+alpha / RGB / RGBA,
    non-interlaced. feat_mean = mean sample value scaled to [0,1];
    feat_dim = channels. Raises ValueError on anything else."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros_like(lines)
    bpp = channels
    for y in range(height):
        line = lines[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: left neighbor, sequential within the row
            for x in range(stride):
                line[x] = (line[x] + (line[x - bpp] if x >= bpp else 0)) & 0xFF
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"bad PNG filter {f}")
    pixels = out.reshape(height, width, channels)
    return {
        "feat_mean": float(pixels.mean() / 255.0),
        "feat_dim": int(channels),
        "width": int(width),
        "height": int(height),
    }


def decode_wav(payload: bytes) -> dict[str, Any]:
    """Real WAV decode via the stdlib ``wave`` module: PCM frames ->
    normalized mean-absolute amplitude. feat_dim = channel count."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        frames = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    samples = np.frombuffer(frames, dtype=dtype).astype(np.float64)
    if sampwidth == 1:
        samples -= 128.0
    full_scale = float(2 ** (8 * sampwidth - 1))
    mean_abs = float(np.abs(samples).mean() / full_scale) if samples.size else 0.0
    return {
        "feat_mean": mean_abs,
        "feat_dim": int(n_channels),
        "sample_rate": int(framerate),
    }


def real_decode(payload: bytes) -> dict[str, Any]:
    """Magic-byte-sniffing decoder: PNG and WAV decode for real with the
    stdlib-only decoders above; JPEG (and other PIL formats) decode when
    Pillow is importable; anything unrecognized falls back to the
    deterministic stub so the pipeline never dies on opaque bytes.
    Always returns the MEDIA_META_SCHEMA feature keys."""
    if payload is None:
        raise NotImplementedError("media decode of NULL payload")
    feats: dict[str, Any] | None = None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        feats = decode_png(payload)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        feats = decode_wav(payload)
    else:
        try:  # PIL path: real when the lib exists (not in this container)
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                import numpy as np

                arr = np.asarray(img.convert("RGB"), dtype=np.float64)
                feats = {
                    "feat_mean": float(arr.mean() / 255.0),
                    "feat_dim": 3,
                    "width": int(img.width),
                    "height": int(img.height),
                }
        except ImportError:
            feats = None
        except Exception as exc:  # PIL present but payload unreadable
            raise ValueError(f"undecodable media payload: {exc}") from None
    if feats is None:
        feats = deterministic_fake_decode(payload)
    return {"feat_mean": feats["feat_mean"], "feat_dim": feats["feat_dim"]}


def extract_media_features(
    df: DataFrame,
    id_col: str = "content_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    decode_fn: Callable[[bytes], dict[str, Any]] | None = None,
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

    if decode_fn is None:
        decode_fn = real_decode
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
