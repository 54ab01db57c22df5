"""IMA (DVI4) ADPCM codec — from scratch, public-spec only.

Algorithm per the IMA Digital Audio Technical Working Group
recommendation (the same 89-entry step table / 16-entry index-adaptation
table published in RFC 3551 §4.5.1 for the DVI4 payload and used by WAV
format tag 0x0011). 4 bits per sample, fixed 4:1 compression over int16
PCM. No reference counterpart (the reference delegates codecs to
external libraries); this extends the engine's codec family
(``streaming/audio.py``) with a ubiquitous real-world COMPRESSED format
so multicodec corpora exercise a lossy non-G.711 path.

Container: a minimal self-describing frame (magic, sample count,
initial predictor/index) followed by packed nibbles, low nibble first —
the per-clip analogue of one IMA WAV block.

Performance shape: encoding is the spec's inherently sequential
feedback loop (like FLAC's LPC synthesis, ``flac.py``). Decoding is
mostly vectorized: nibble unpack, the (step,nibble)->diff lookup, and
the predictor reconstruction run as numpy kernels; the one per-sample
Python loop is the 3-ops/sample step-index walk (its state adaptation
depends only on the nibble stream, not the samples). The cumulative-sum
fast path is exact whenever the UNCLAMPED predictor trajectory stays in
int16 range; frames where the encoder clamped (near-full-scale content,
corrupt input) take an exact per-sample fallback. Typical corpus clips
(synth_clip_batch peaks well under full scale) stay on the fast path.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"IMA1"

INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64)

STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767], dtype=np.int64)


def _build_diff_lut() -> np.ndarray:
    """diff[(index, nibble)] — the signed predictor delta the spec
    reconstructs from a nibble at a given step index (exact integer
    form: diff = (step>>3) + conditional step>>2 / step>>1 / step)."""
    lut = np.empty((89, 16), dtype=np.int64)
    for idx in range(89):
        step = int(STEP_TABLE[idx])
        for nib in range(16):
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            lut[idx, nib] = -d if nib & 8 else d
    return lut


_DIFF_LUT = _build_diff_lut()


def encode_ima_adpcm(samples: np.ndarray) -> bytes:
    """int16 PCM -> IMA ADPCM frame. ``samples`` any integer/float array
    already in int16 range; the first sample seeds the predictor (as in
    an IMA WAV block header) and the rest become nibbles."""
    x = np.asarray(samples).astype(np.int64)
    n = len(x)
    if n == 0:
        return _MAGIC + struct.pack("<IhBx", 0, 0, 0)
    pred = int(x[0])
    index = 0
    header = _MAGIC + struct.pack("<IhBx", n, pred, index)
    step_table = STEP_TABLE.tolist()
    index_table = INDEX_TABLE.tolist()
    nibs = bytearray()
    for t in range(1, n):
        step = step_table[index]
        delta = int(x[t]) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        # 3-bit magnitude quantization (spec's successive halving)
        diff = step >> 3
        if delta >= step:
            nib |= 4
            delta -= step
            diff += step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
            diff += step >> 1
        if delta >= step >> 2:
            nib |= 1
            diff += step >> 2
        # decoder-mirrored state update
        pred = pred - diff if nib & 8 else pred + diff
        pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
        index += index_table[nib]
        index = 0 if index < 0 else (88 if index > 88 else index)
        nibs.append(nib)
    # pack low nibble first
    if len(nibs) % 2:
        nibs.append(0)
    arr = np.frombuffer(bytes(nibs), dtype=np.uint8)
    packed = (arr[0::2] | (arr[1::2] << 4)).astype(np.uint8)
    return header + packed.tobytes()


def decode_ima_adpcm(raw: bytes) -> np.ndarray:
    """IMA ADPCM frame -> int16 PCM. Vectorized except the step-index
    walk (see module docstring). Corrupt frames (bad magic, truncated
    header/body, out-of-range step index) raise ValueError."""
    if raw[:4] != _MAGIC:
        raise ValueError("not an IMA ADPCM frame (bad magic)")
    if len(raw) < 12:
        raise ValueError("truncated IMA ADPCM frame (header)")
    n, pred0, index0 = struct.unpack_from("<IhBx", raw, 4)
    if index0 > 88:
        raise ValueError(f"corrupt IMA ADPCM frame: step index {index0} > 88")
    if n == 0:
        return np.empty(0, dtype=np.int16)
    body = np.frombuffer(raw, dtype=np.uint8, offset=12)
    nibs = np.empty(len(body) * 2, dtype=np.uint8)
    nibs[0::2] = body & 0x0F
    nibs[1::2] = body >> 4
    nibs = nibs[:n - 1]
    if len(nibs) != n - 1:
        raise ValueError("truncated IMA ADPCM frame")
    if n == 1:
        return np.array([pred0], dtype=np.int16)
    # step-index trajectory: depends only on the nibble stream
    idx = np.empty(n - 1, dtype=np.int64)
    cur = int(index0)
    index_table = INDEX_TABLE.tolist()
    for t, nb in enumerate(nibs.tolist()):
        idx[t] = cur
        cur += index_table[nb]
        cur = 0 if cur < 0 else (88 if cur > 88 else cur)
    diffs = _DIFF_LUT[idx, nibs.astype(np.int64)]
    pred = pred0 + np.cumsum(diffs)
    if pred.min() >= -32768 and pred.max() <= 32767:
        out = np.empty(n, dtype=np.int16)
        out[0] = pred0
        out[1:] = pred.astype(np.int16)
        return out
    # exact sequential fallback: a clamp event breaks cumsum linearity
    out = np.empty(n, dtype=np.int16)
    out[0] = pred0
    p = int(pred0)
    dl = diffs.tolist()
    for t in range(n - 1):
        p += dl[t]
        p = -32768 if p < -32768 else (32767 if p > 32767 else p)
        out[t + 1] = p
    return out
