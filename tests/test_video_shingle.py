"""Order-aware video near-dup (operators/multimodal.py
video_shingle_fingerprints/video_shingle_pairs): the honest-contrast
test the CDC-vs-aligned chunking suite models — a planted SHIFTED clip
that the majority-vote signature path provably misses and the
frame-sequence winnowing path catches."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.multimodal import (
    image_neardup_pairs,
    video_shingle_pairs,
    video_signature,
)


def _fh(t: int) -> int:
    """Deterministic 60-bit pseudo-random frame hash of global time t."""
    return int(hashlib.md5(f"frame:{t}".encode()).hexdigest()[:15], 16)


def _frames(spark, specs):
    """specs: [(content_id, t_start, n_frames)] — each video samples the
    global stream at consecutive times."""
    rows = [
        (cid, i, _fh(t0 + i))
        for cid, t0, n in specs
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "content_id bigint, frame_idx int, fhash bigint"
    )


def test_shifted_clip_contrast(spark):
    """Video 1 = frames t0..t15; video 2 = the same clip trimmed, frames
    t4..t19 (12 shared frames at an offset). The majority vote is taken
    over different frame sets of an effectively random stream, so the
    signatures land far apart in hamming; the winnowing guarantee forces
    a shared fingerprint for any shared run >= w+k-1 = 4 frames."""
    fr = _frames(spark, [(1, 0, 16), (2, 4, 16)])

    sigs = video_signature(fr, id_col="content_id")
    hamming = (
        sigs.alias("a")
        .join(sigs.alias("b"), F.col("a.content_id") < F.col("b.content_id"))
        .select(
            F.bit_count(
                F.col("a.vhash").bitwiseXOR(F.col("b.vhash"))
            ).alias("h")
        )
        .collect()[0]["h"]
    )
    # the majority-vote path at its q_video_neardup threshold (3) misses
    assert hamming > 3, hamming
    maj_pairs = image_neardup_pairs(
        sigs, max_hamming=3, n_bands=4, id_col="content_id", hash_col="vhash"
    ).collect()
    assert maj_pairs == []

    # the shingle path catches the shared run
    sh_pairs = video_shingle_pairs(fr, k=2, w=3, min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in sh_pairs] == [(1, 2)]
    # 12 shared frames -> 11 shared 2-grams -> several shared selections
    assert sh_pairs[0]["n_shared"] >= 2


def test_unrelated_clips_no_pair(spark):
    """Disjoint stream segments share no frames — no shingle pair."""
    fr = _frames(spark, [(1, 0, 12), (2, 1000, 12)])
    assert video_shingle_pairs(fr, k=2, w=3, min_shared=1).collect() == []


def test_shingle_guarantee_minimal_run(spark):
    """Exactly w+k-1 = 4 shared frames (the guarantee boundary) still
    pairs; 3 shared frames (below the boundary) may not — and with
    disjoint surroundings of random hashes, does not here."""
    # videos share frames t=100..103 (4 frames)
    rows = (
        [(1, i, _fh(i)) for i in range(8)]
        + [(1, 8 + j, _fh(100 + j)) for j in range(4)]
        + [(2, j, _fh(100 + j)) for j in range(4)]
        + [(2, 4 + i, _fh(500 + i)) for i in range(8)]
    )
    fr = spark.createDataFrame(
        rows, "content_id bigint, frame_idx int, fhash bigint"
    )
    pairs = video_shingle_pairs(fr, k=2, w=3, min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
