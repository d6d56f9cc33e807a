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
