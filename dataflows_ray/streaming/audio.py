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


# --- G.711 µ-law / A-law (classic segment algorithm, fully vectorized) ---
# Encode follows the canonical public-domain g711 segment search; decode is
# the exact inverse formula, precomputed into 256-entry int16 lookup tables
# so decoding a clip is ONE fancy-index over its byte array.

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635
# segment upper edges for the (biased) µ-law magnitude and 13-bit A-law value
_MULAW_SEG_EDGES = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF,
                             0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32)
_ALAW_SEG_EDGES = np.array([0x1F, 0x3F, 0x7F, 0xFF,
                            0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32)


def encode_mulaw(wave: np.ndarray) -> bytes:
    """float [-1,1] -> G.711 µ-law bytes (8 bits/sample).

    Negative handling note: the canonical Sun/CCITT ``linear2ulaw``
    computes ``BIAS - pcm_val`` for negatives, which equals
    ``BIAS + |pcm_val|`` — so abs() here IS the canonical 16-bit path
    (the ITU STL variant differs only in its 14-bit one's-complement
    front end)."""
    pcm = np.clip((wave * 32767.0).round(), -32768, 32767).astype(np.int32)
    sign = np.where(pcm < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(pcm), _MULAW_CLIP) + _MULAW_BIAS
    exp = np.searchsorted(_MULAW_SEG_EDGES, mag, side="left").astype(np.int32)
    mantissa = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mantissa) & 0xFF).astype(np.uint8).tobytes()


def encode_alaw(wave: np.ndarray) -> bytes:
    """float [-1,1] -> G.711 A-law bytes (8 bits/sample).

    Canonical Sun/CCITT ``linear2alaw`` negative handling: arithmetic
    shift to 13 bits FIRST, then one's complement (``-v - 1``) for
    negative values — bit-exact against standard G.711 encoders
    (round-2 ADVICE: abs() was one quantization step off on negatives)."""
    pcm = np.clip((wave * 32767.0).round(), -32768, 32767).astype(np.int32)
    v = pcm >> 3                                 # arithmetic shift, 13-bit
    mask = np.where(v >= 0, 0xD5, 0x55)          # A-law sign: 0x80 set = +
    mag = np.where(v >= 0, v, -v - 1)            # one's complement
    seg = np.searchsorted(_ALAW_SEG_EDGES, mag, side="left").astype(np.int32)
    low = (mag >> 1) & 0x0F                      # segment 0-1: linear
    high = (mag >> np.maximum(seg, 1)) & 0x0F    # segment 2+: log
    aval = np.where(seg >= 8, 0x7F,
                    (np.minimum(seg, 7) << 4) | np.where(seg < 2, low, high))
    return ((aval ^ mask) & 0xFF).astype(np.uint8).tobytes()


def _build_mulaw_table() -> np.ndarray:
    b = np.arange(256, dtype=np.int32)
    u = ~b & 0xFF
    exp = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    b = np.arange(256, dtype=np.int32)
    a = b ^ 0x55
    exp = (a >> 4) & 0x07
    mantissa = a & 0x0F
    mag = np.where(exp == 0, (mantissa << 4) + 8,
                   ((mantissa << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


MULAW_DECODE_TABLE = _build_mulaw_table()
ALAW_DECODE_TABLE = _build_alaw_table()


def decode_mulaw_bytes(u8: np.ndarray) -> np.ndarray:
    """uint8 sample array -> float waveform (one table gather)."""
    return MULAW_DECODE_TABLE[u8].astype(np.float64) / 32767.0


def decode_alaw_bytes(u8: np.ndarray) -> np.ndarray:
    return ALAW_DECODE_TABLE[u8].astype(np.float64) / 32767.0


# --- WAV / RIFF container (PCM16, µ-law and A-law payloads; mono) ---

def encode_wav(wave: np.ndarray, sr_hz: int) -> bytes:
    """Canonical 44-byte-header mono PCM16 RIFF/WAVE file."""
    import struct
    data = (np.clip(wave * 32767.0, -32768, 32767)).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16,
        b"data", len(data))
    return hdr + data


def parse_wav(raw: bytes):
    """RIFF chunk walk -> (float waveform, sr_hz). Accepts format codes
    1 (PCM16), 6 (A-law), 7 (µ-law); skips unknown chunks (LIST etc.)."""
    import struct
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(raw)
    fmt_code = sr_hz = bits = None
    data = None
    while pos + 8 <= end:
        cid, size = raw[pos:pos + 4], struct.unpack(
            "<I", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, _ch, sr_hz = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_code is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        wave = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    elif fmt_code == 7 and bits == 8:
        wave = decode_mulaw_bytes(np.frombuffer(data, dtype=np.uint8))
    elif fmt_code == 6 and bits == 8:
        wave = decode_alaw_bytes(np.frombuffer(data, dtype=np.uint8))
    else:
        raise NotImplementedError(
            f"WAV format code {fmt_code}/{bits}-bit not supported "
            "(PCM16, G.711 u-law/A-law are)")
    return wave, sr_hz


CODECS = ("pcm16", "mulaw", "alaw", "wav", "flac", "adpcm")


def encode_flac_clip(wave: np.ndarray, sr_hz: int) -> bytes:
    """float [-1,1] -> FLAC stream (functions/flac.py, from-scratch RFC
    9639 subset). Quantization matches encode_pcm16 exactly, so FLAC
    being lossless means decode_pcm('flac') == decode_pcm('pcm16')
    bit-for-bit for the same waveform."""
    from ..functions.flac import encode_flac
    return encode_flac((wave * 32767.0).astype("<i2").astype(np.int64),
                       sr_hz)


def encode_clip(wave: np.ndarray, codec: str, sr_hz: int = 16000) -> bytes:
    if codec == "pcm16":
        return encode_pcm16(wave)
    if codec == "mulaw":
        return encode_mulaw(wave)
    if codec == "alaw":
        return encode_alaw(wave)
    if codec == "wav":
        return encode_wav(wave, sr_hz)
    if codec == "flac":
        return encode_flac_clip(wave, sr_hz)
    if codec == "adpcm":
        from ..functions.adpcm import encode_ima_adpcm
        return encode_ima_adpcm((wave * 32767.0).astype("<i2"))
    raise NotImplementedError(f"codec {codec!r}: encoder not available")


def decode_pcm(raw: bytes, codec: str = "pcm16") -> np.ndarray:
    """Decode clip bytes to a float waveform in [-1, 1]. Implemented for
    real: ``pcm16`` (little-endian int16), ``mulaw``/``alaw`` (G.711,
    table-driven), ``wav`` (RIFF container with PCM16/G.711 payloads)
    and ``flac`` (from-scratch RFC 9639 codec, functions/flac.py, with
    CRC-8/CRC-16/MD5 verification), plus ``adpcm`` (IMA/DVI4 4-bit,
    functions/adpcm.py — lossy 4:1, holds ~20-32 dB SNR on wideband
    content, so it carries its OWN QC bar in q106 rather than the
    corpus 30 dB invariant). Perceptual codecs (opus/mp3) remain
    stubbed — lossy decode references are not reproducible without the
    external libraries — but the Ray-side plumbing (binary column in,
    float array out) is identical."""
    if codec == "pcm16":
        return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if codec == "mulaw":
        return decode_mulaw_bytes(np.frombuffer(raw, dtype=np.uint8))
    if codec == "alaw":
        return decode_alaw_bytes(np.frombuffer(raw, dtype=np.uint8))
    if codec == "wav":
        return parse_wav(raw)[0]
    if codec == "flac":
        from ..functions.flac import decode_flac
        samples, _info = decode_flac(bytes(raw))
        return samples.astype(np.float64) / 32767.0
    if codec == "adpcm":
        from ..functions.adpcm import decode_ima_adpcm
        return decode_ima_adpcm(bytes(raw)).astype(np.float64) / 32767.0
    raise NotImplementedError(
        f"codec {codec!r}: decoder not available in this environment; "
        f"implemented codecs: {CODECS}")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    noise = reference - decoded
    p_sig = float(np.mean(reference ** 2))
    p_noise = float(np.mean(noise ** 2)) or 1e-30
    return 10.0 * np.log10(p_sig / p_noise)


def synth_clip_batch(start: int, count: int, seed: int = 42,
                     n_speakers: int = 50, hot_fraction: float = 0.2,
                     sr_hz: int = 16000,
                     codec_mix: Optional[tuple] = None) -> pa.Table:
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
        # codec draw LAST: with codec_mix=None the rng sequence (hence the
        # whole corpus) is byte-identical to the single-codec generator,
        # and with a mix the clip CONTENT stays the same — only its
        # encoding varies, so decode invariants compare like-for-like.
        codec = "pcm16" if not codec_mix else \
            codec_mix[int(rng.integers(0, len(codec_mix)))]
        rows["clip_id"].append(clip_id)
        rows["bytes"].append(encode_clip(wave, codec, sr_hz))
        rows["sr_hz"].append(sr_hz)
        rows["dur_ms"].append(dur_ms)
        rows["codec"].append(codec)
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
