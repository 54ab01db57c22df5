"""IMA ADPCM codec (functions/adpcm.py): round-trip quality, exactness
of the vectorized decode against a straight sequential reference
decoder, container validation, and the codec-dispatch wiring."""

import numpy as np
import pytest

from dataflows_ray.functions.adpcm import (
    INDEX_TABLE, STEP_TABLE, decode_ima_adpcm, encode_ima_adpcm)
from dataflows_ray.streaming.audio import (
    decode_pcm, encode_clip, snr_db, synth_clip_batch)


def _reference_decode(raw: bytes) -> np.ndarray:
    """Straight per-sample spec transcription (no vectorization, no
    cumsum fast path) — the oracle for the production decoder."""
    import struct
    assert raw[:4] == b"IMA1"
    n, pred, index = struct.unpack_from("<IhBx", raw, 4)
    out = [pred]
    body = raw[12:]
    it, st = INDEX_TABLE.tolist(), STEP_TABLE.tolist()
    for t in range(n - 1):
        b = body[t // 2]
        nib = (b & 0x0F) if t % 2 == 0 else (b >> 4)
        step = st[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + it[nib]))
        out.append(pred)
    return np.array(out[:n], dtype=np.int16)


def test_roundtrip_quality_and_ratio():
    t = synth_clip_batch(0, 8)
    for row in t.to_pylist():
        ref = np.frombuffer(row["bytes"], dtype="<i2")
        enc = encode_ima_adpcm(ref)
        dec = decode_ima_adpcm(enc)
        assert len(dec) == len(ref)
        s = snr_db(ref.astype(np.float64) / 32767.0,
                   dec.astype(np.float64) / 32767.0)
        assert s >= 20                      # the documented ADPCM bar
        assert abs(len(enc) / (2 * len(ref)) - 0.25) < 0.01


def test_vectorized_decode_matches_sequential_reference():
    rng = np.random.default_rng(7)
    cases = [
        (rng.normal(0, 3000, 5000)).astype(np.int16),       # smooth path
        (rng.normal(0, 20000, 5000)).clip(-32768, 32767)
        .astype(np.int16),                                   # loud
        np.tile([32767, -32768], 2500).astype(np.int16),     # clamp storm
        (32767 * np.sin(np.arange(3000) / 5)).astype(np.int16),
    ]
    for x in cases:
        enc = encode_ima_adpcm(x)
        assert np.array_equal(decode_ima_adpcm(enc), _reference_decode(enc))


def test_container_validation_and_edges():
    assert len(decode_ima_adpcm(
        encode_ima_adpcm(np.array([], dtype=np.int16)))) == 0
    one = decode_ima_adpcm(encode_ima_adpcm(np.array([123], np.int16)))
    assert list(one) == [123]
    with pytest.raises(ValueError, match="magic"):
        decode_ima_adpcm(b"RIFF" + bytes(20))
    good = encode_ima_adpcm(np.arange(100, dtype=np.int16))
    with pytest.raises(ValueError, match="truncated"):
        decode_ima_adpcm(good[:-10])


def test_codec_dispatch_wiring():
    w = decode_pcm(synth_clip_batch(3, 1)["bytes"][0].as_py(), "pcm16")
    enc = encode_clip(w, "adpcm")
    w2 = decode_pcm(enc, "adpcm")
    assert len(w2) == len(w)
    assert snr_db(w, w2) >= 20
