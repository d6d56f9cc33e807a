"""Trimmed/shifted-clip audio near-dup: per-window fingerprint
sequences + sequence winnowing vs the offset-blind whole-clip hash
(operators/multimodal.py audio_window_fingerprints; pairs via the
hash-agnostic video_shingle_pairs). The honest-contrast twin of the
video shingle test: the whole-clip fingerprint MISSES a hop-aligned
trim that the window-sequence path catches, and a NON-hop-aligned trim
is the documented granularity bound (windows realign, no catch)."""

import io
import struct
import wave

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.multimodal import (
    audio_fingerprint,
    audio_window_fingerprints,
    video_shingle_pairs,
)

WINDOW = 4096
HOP = 1024


def _make_wav(samples, framerate=8000, sampwidth=2, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        w.writeframes(b"".join(struct.pack("<h", int(s)) for s in samples))
    return buf.getvalue()


def _signal(n, seed=0):
    # deterministic, structure-rich (no np.random: bit-reproducible)
    return [((i * i * 31 + i * 7 + seed * 911) % 4001) - 2000 for i in range(n)]


def _pairs(spark, clips):
    df = spark.createDataFrame(
        [(cid, bytearray(p) if p is not None else None) for cid, p in clips],
        "content_id bigint, payload binary",
    )
    wf = audio_window_fingerprints(
        df, window_samples=WINDOW, hop_samples=HOP
    )
    return (
        wf,
        video_shingle_pairs(
            wf, k=2, w=3, min_shared=1, idx_col="window_idx",
            hash_col="whash",
        ),
    )


def test_hop_aligned_trim_caught_whole_clip_hash_misses(spark):
    base = _signal(WINDOW + 8 * HOP)  # 9 windows
    trimmed = base[2 * HOP :]  # hop-aligned trim: 7 windows, all shared
    other = _signal(WINDOW + 8 * HOP, seed=5)
    wav_a, wav_b, wav_c = _make_wav(base), _make_wav(trimmed), _make_wav(other)

    # the offset-blind whole-clip hash diverges on the trim...
    fa, fb = audio_fingerprint(wav_a), audio_fingerprint(wav_b)
    assert fa is not None and fb is not None and fa != fb

    wf, pairs = _pairs(
        spark, [(1, wav_a), (2, wav_b), (3, wav_c), (4, None), (5, b"junk")]
    )
    rows = wf.collect()
    # undecodable payloads yield NO window rows (honest absence)
    assert {r["content_id"] for r in rows} == {1, 2, 3}
    by = {
        cid: [
            r["whash"]
            for r in sorted(rows, key=lambda r: r["window_idx"])
            if r["content_id"] == cid
        ]
        for cid in (1, 2)
    }
    assert len(by[1]) == 9 and len(by[2]) == 7
    # hop-aligned trim shares every interior window verbatim
    assert by[2] == by[1][2:]

    got = {(r[0], r[1]) for r in pairs.select("id_a", "id_b").collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_non_hop_aligned_trim_is_the_documented_miss(spark):
    """Trim by HOP//2: every window realigns, no shared fingerprints —
    the granularity bound the operator docstring declares (tighten by
    shrinking hop), kept as a measured negative, not hidden."""
    base = _signal(WINDOW + 8 * HOP)
    misaligned = base[HOP // 2 :]
    _, pairs = _pairs(spark, [(1, _make_wav(base)), (2, _make_wav(misaligned))])
    assert pairs.count() == 0
