"""Deterministic synthetic audio clip + transcript table and PCM codec.

The north-rule input (BASELINE.json ``input_hint``) is a Lance/Parquet
table with columns ``(clip_id:string, bytes:binary, sr_hz:int32,
dur_ms:int32, codec:string, transcript:string)``. This module synthesizes
that table deterministically (seeded) at any scale — no external data —
and provides the REAL decode path: clips are PCM16 sine mixtures, so
``decode_pcm`` is an actual byte->waveform decode and ``snr_db`` measures
reconstruction fidelity against the analytically regenerated waveform
(per-row invariant: SNR >= 30 dB + transcript equality).

Skew: a configurable fraction of clips share a small set of hot
``clip_id`` prefixes (mirroring hot-key skew at 10^12 scale) so salted
repartitioning has something real to fix.

Event time: each clip belongs to a speaker stream; its event timestamp is
the cumulative duration of that speaker's preceding clips (dur_ms-based
timestamps per the north star). Transcripts arrive LATE by a deterministic
per-row lag, which is what watermarks + allowed lateness must absorb.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "the quick brown fox jumps over lazy dog alpha bravo charlie delta echo "
    "foxtrot golf hotel india juliet kilo lima mike november oscar papa"
).split()

AUDIO_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("codec", pa.string()),
    ("transcript", pa.string()),
    ("speaker", pa.string()),
    ("event_ms", pa.int64()),
    ("transcript_event_ms", pa.int64()),
])


def _clip_wave(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    """A mixture of 2 sines with deterministic params; float in [-1, 1]."""
    n = int(sr_hz * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr_hz
    f1 = 100.0 + float(rng.integers(0, 2000))
    f2 = 100.0 + float(rng.integers(0, 2000))
    a2 = 0.3 + 0.4 * float(rng.random())
    w = 0.6 * np.sin(2 * np.pi * f1 * t) + a2 * 0.4 * np.sin(2 * np.pi * f2 * t)
    return w / max(1.0, np.abs(w).max() * 1.001)


def encode_pcm16(wave: np.ndarray) -> bytes:
    return (wave * 32767.0).astype("<i2").tobytes()


def decode_pcm(raw: bytes, codec: str = "pcm16") -> np.ndarray:
    """Decode clip bytes to a float waveform in [-1, 1]. Only ``pcm16`` is
    implemented for real; other codecs (opus/flac/mp3) are stubbed — the
    decode libraries are not in this environment — but the Ray-side
    plumbing (binary column in, float array out) is identical."""
    if codec == "pcm16":
        return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    raise NotImplementedError(
        f"codec {codec!r}: decoder not available in this environment; "
        "pcm16 is the reference codec")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    noise = reference - decoded
    p_sig = float(np.mean(reference ** 2))
    p_noise = float(np.mean(noise ** 2)) or 1e-30
    return 10.0 * np.log10(p_sig / p_noise)


def synth_clip_batch(start: int, count: int, seed: int = 42,
                     n_speakers: int = 50, hot_fraction: float = 0.2,
                     sr_hz: int = 16000) -> pa.Table:
    """Generate clips [start, start+count) deterministically.

    Every field of clip ``i`` depends only on (seed, i): generation is
    embarrassingly parallel and identical across runs/partitions — the
    property that lets each Ray task synthesize its own shard at scale.
    """
    rows: Dict[str, list] = {name: [] for name in AUDIO_SCHEMA.names}
    for i in range(start, start + count):
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        # hot-prefix skew: hot_fraction of clips land on 2 hot speakers
        if rng.random() < hot_fraction:
            speaker = f"spk_{int(rng.integers(0, 2)):04d}"
        else:
            speaker = f"spk_{int(rng.integers(2, n_speakers)):04d}"
        dur_ms = int(rng.integers(200, 1500))
        wave = _clip_wave(rng, sr_hz, dur_ms)
        n_words = int(rng.integers(3, 12))
        words = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(n_words)]
        clip_id = f"{speaker}-clip-{i:012d}"
        # event time: deterministic per-speaker virtual timeline
        event_ms = int(rng.integers(0, 3_600_000))
        lag_ms = int(rng.integers(0, 30_000))  # transcript lateness
        rows["clip_id"].append(clip_id)
        rows["bytes"].append(encode_pcm16(wave))
        rows["sr_hz"].append(sr_hz)
        rows["dur_ms"].append(dur_ms)
        rows["codec"].append("pcm16")
        rows["transcript"].append(" ".join(words))
        rows["speaker"].append(speaker)
        rows["event_ms"].append(event_ms)
        rows["transcript_event_ms"].append(event_ms + lag_ms)
    return pa.Table.from_pydict(rows, schema=AUDIO_SCHEMA)


def regen_clip(i: int, seed: int = 42, sr_hz: int = 16000) -> Dict:
    """Regenerate clip ``i`` fully (the per-row invariant oracle)."""
    t = synth_clip_batch(i, 1, seed=seed, sr_hz=sr_hz)
    return t.to_pylist()[0]


def write_audio_dataset(path: str, n_clips: int, seed: int = 42,
                        rows_per_file: int = 20_000, **kw) -> None:
    """Write the synthetic table as partitioned parquet (driver-side loop,
    one file per shard; used for tests/bench at small scale)."""
    os.makedirs(path, exist_ok=True)
    start = 0
    part = 0
    while start < n_clips:
        count = min(rows_per_file, n_clips - start)
        tbl = synth_clip_batch(start, count, seed=seed, **kw)
        pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"))
        start += count
        part += 1


def write_audio_dataset_ray(path: str, n_clips: int, seed: int = 42,
                            rows_per_file: int = 10_000, **kw) -> None:
    """Parallel synthesis: each Ray task generates one shard from its
    (seed, range) — clip ``i`` is identical no matter which worker makes
    it, so the corpus is deterministic at any parallelism. This is how a
    10^12-clip corpus would be built: shard specs are metadata; generation
    and write scale with the cluster."""
    import ray

    os.makedirs(path, exist_ok=True)

    @ray.remote
    def make_shard(part: int, start: int, count: int) -> int:
        tbl = synth_clip_batch(start, count, seed=seed, **kw)
        tmp = os.path.join(path, f".part-{part:05d}.parquet.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(path, f"part-{part:05d}.parquet"))
        return count

    refs = []
    part = 0
    start = 0
    while start < n_clips:
        count = min(rows_per_file, n_clips - start)
        refs.append(make_shard.remote(part, start, count))
        start += count
        part += 1
    ray.get(refs)
