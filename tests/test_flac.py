"""FLAC codec (functions/flac.py) — round-trip, integrity, integration.

FLAC is lossless, so the contract is EXACT int sample equality (not the
SNR bar the lossy codecs get). No Ray needed here: the codec is plain
numpy; the PcmDecoder integration test calls the batch transform
directly on an Arrow table.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from dataflows_ray.functions.flac import (
    crc8, crc16, decode_flac, encode_flac,
    _encode_coded_number, _read_coded_number, _BitReader)


def roundtrip(x, sr=16000, bps=16, **kw):
    raw = encode_flac(x, sr, bps=bps, **kw)
    y, info = decode_flac(raw)
    assert info.sample_rate == sr
    assert info.bps == bps
    np.testing.assert_array_equal(y, np.asarray(x, dtype=np.int64))
    return raw


def test_crc_known_vectors():
    # CRC-8/SMBUS and CRC-16/UMTS published check values
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc16(b"") == 0
    # odd/even length parity against the bytewise definition
    from dataflows_ray.functions.flac import _CRC16_LIST
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 10, 101):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        c = 0
        for b in d:
            c = ((c << 8) & 0xFFFF) ^ _CRC16_LIST[(c >> 8) ^ b]
        assert crc16(d) == c


def test_roundtrip_lengths_and_frame_boundaries():
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 3, 5, 100, 4095, 4096, 4097, 8192, 8193, 12345):
        roundtrip(rng.integers(-32768, 32768, n))


def test_roundtrip_constant_and_extremes():
    roundtrip(np.zeros(5000, dtype=np.int64))
    roundtrip(np.full(5000, -32768, dtype=np.int64))
    roundtrip(np.full(5000, 32767, dtype=np.int64))
    roundtrip(np.array([32767, -32768] * 2048, dtype=np.int64))


def test_roundtrip_wasted_bits():
    rng = np.random.default_rng(1)
    x = rng.integers(-2048, 2048, 9000) * 16     # 4 shared trailing zeros
    raw = roundtrip(x)
    # wasted-bits detection should beat encoding at full width
    plain = encode_flac(rng.integers(-32768, 32768, 9000), 16000)
    assert len(raw) < len(plain)


def test_roundtrip_sine_uses_lpc_and_compresses():
    t = np.arange(16000) / 16000
    x = np.floor(20000 * np.sin(2 * np.pi * 523 * t)).astype(np.int64)
    raw = roundtrip(x)
    assert len(raw) < 0.45 * 2 * len(x)          # LPC must engage


def test_roundtrip_stereo_modes():
    rng = np.random.default_rng(2)
    t = np.arange(16000) / 16000
    left = np.floor(15000 * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
    # strongly correlated channels: a side-coded assignment must win
    right = left + rng.integers(-40, 40, len(t))
    raw_corr = roundtrip(np.stack([left, right], axis=1))
    both = np.stack([rng.integers(-32768, 32768, 16000),
                     rng.integers(-32768, 32768, 16000)], axis=1)
    raw_ind = roundtrip(both)
    assert len(raw_corr) < 0.7 * len(raw_ind)


def test_roundtrip_other_bps_and_blocksizes():
    rng = np.random.default_rng(3)
    roundtrip(rng.integers(-128, 128, 5000), bps=8)
    roundtrip(rng.integers(-(1 << 23), 1 << 23, 5000), bps=24)
    roundtrip(rng.integers(-1000, 1000, 1000), blocksize=192)
    roundtrip(rng.integers(-1000, 1000, 1000), blocksize=300)


def test_corruption_detected():
    rng = np.random.default_rng(4)
    x = rng.integers(-20000, 20000, 6000)
    raw = bytearray(encode_flac(x, 16000))
    # frame-body bit flips -> CRC-16 (or parse error)
    for at in (60, 200, len(raw) - 3):
        bad = bytearray(raw)
        bad[at] ^= 0x40
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))
    # STREAMINFO MD5 tamper: frames decode, stream check fails
    bad = bytearray(raw)
    bad[30] ^= 0x01          # inside the 16-byte MD5 field (bytes 26..42)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # verify=False skips the checks and still decodes the samples
    y, _ = decode_flac(bytes(bad), verify=False)
    np.testing.assert_array_equal(y, x)


def test_coded_number_roundtrip():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 65536,
              (1 << 31) - 1, (1 << 36) - 1):
        enc = _encode_coded_number(v)
        br = _BitReader(enc)
        assert _read_coded_number(br) == v
    with pytest.raises(ValueError):
        _encode_coded_number(1 << 36)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=600))
def test_roundtrip_property(samples):
    x = np.array(samples, dtype=np.int64)
    raw = encode_flac(x, 8000)
    y, _ = decode_flac(raw)
    np.testing.assert_array_equal(y, x)


def test_encode_clip_decode_pcm_integration():
    """flac wave round-trip through the engine codec registry equals the
    pcm16 path bit-for-bit (shared quantization + losslessness)."""
    from dataflows_ray.streaming.audio import (
        encode_clip, decode_pcm, synth_clip_batch)
    b = synth_clip_batch(0, 3)
    for r in b["bytes"]:
        wave = decode_pcm(r.as_py(), "pcm16")
        raw = encode_clip(wave, "flac", 16000)
        assert raw[:4] == b"fLaC"
        np.testing.assert_array_equal(decode_pcm(raw, "flac"), wave)


def test_pcm_decoder_mixed_batch_with_flac():
    """PcmDecoder handles a batch mixing flac with the other codecs and
    the per-clip SNR invariant holds (flac hits the quantization floor,
    far above the 30 dB bar)."""
    from dataflows_ray.pipelines.audio import PcmDecoder
    from dataflows_ray.streaming.audio import synth_clip_batch
    tbl = synth_clip_batch(0, 12, codec_mix=("pcm16", "mulaw", "alaw",
                                             "wav", "flac"))
    assert "flac" in set(tbl["codec"].to_pylist())
    out = PcmDecoder(validate_snr=True)(tbl)
    snrs = np.array(out["snr_db"].to_pylist())
    assert (snrs >= 30).all()
    flac_rows = [i for i, c in enumerate(out["codec"].to_pylist())
                 if c == "flac"]
    assert (snrs[flac_rows] > 100).all()
