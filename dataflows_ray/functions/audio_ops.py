"""Audio signal operators over binary PCM columns: resampling and
energy-based voice-activity detection (VAD).

Engine-defined operators for audio training-data pipelines (the
reference datahq/dataflows has no audio surface; these extend the
codec/decode family in ``streaming/audio.py``). Both run as stateless
``map_batches`` stages over zero-copy Arrow binary columns — no shuffle,
embarrassingly parallel, the 100-TB shape for per-clip transforms.

Determinism contract: all arithmetic is elementwise float64/int64 with a
fixed formula (no reductions whose order varies with partitioning), so a
distributed run is bit-identical to a sequential one — the q68/q69
fixtures rely on this.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import ray.data

from ..streaming.audio import decode_pcm


def _decode_int16(raw: bytes, codec: str) -> np.ndarray:
    """Integer-domain decode: pcm16 bytes map straight to int16 samples
    (zero-copy); other codecs come back from the float decoder and are
    re-quantized with the same floor(y*32767+0.5) rule used throughout
    this module."""
    if codec == "pcm16":
        return np.frombuffer(raw, dtype="<i2")
    wave = decode_pcm(raw, codec)
    return np.floor(wave * 32767.0 + 0.5).astype(np.int16)


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample of one int16 clip to ``sr_out``.

    Output sample j sits at input position ``j * sr_in / sr_out``;
    n_out = floor((n_in - 1) * sr_out / sr_in) + 1 keeps every position
    inside the input (no edge extrapolation). Values round to int16 via
    ``floor(y + 0.5)`` — a tie rule that is identical in any
    implementation (unlike banker's rounding on exact .5 floats)."""
    n_in = len(x)
    if n_in == 0:
        return np.empty(0, dtype=np.int16)
    if n_in == 1 or sr_in == sr_out:
        return x.astype(np.int16)
    n_out = (n_in - 1) * sr_out // sr_in + 1
    pos = np.arange(n_out, dtype=np.float64) * (float(sr_in) / float(sr_out))
    idx = np.minimum(pos.astype(np.int64), n_in - 2)
    frac = pos - idx
    xf = x.astype(np.float64)
    y = xf[idx] + (xf[idx + 1] - xf[idx]) * frac
    return np.floor(y + 0.5).astype(np.int16)


def vad_segments(x: np.ndarray, sr_hz: int, frame_ms: int = 20,
                 rel_threshold: float = 0.5) -> List[tuple]:
    """Energy VAD over one int16 clip: frame energies are exact int64
    sums of squares over full ``frame_ms`` frames (partial tail frame
    dropped); a frame is voiced when its energy exceeds
    ``rel_threshold * max_frame_energy``; consecutive voiced frames merge
    into ``(start_ms, end_ms)`` segments."""
    spf = sr_hz * frame_ms // 1000
    n_frames = len(x) // spf
    if n_frames == 0:
        return []
    frames = x[:n_frames * spf].astype(np.int64).reshape(n_frames, spf)
    energy = (frames * frames).sum(axis=1)
    thresh = rel_threshold * float(energy.max())
    voiced = energy.astype(np.float64) > thresh
    segs = []
    start = None
    for i, v in enumerate(voiced):
        if v and start is None:
            start = i
        elif not v and start is not None:
            segs.append((start * frame_ms, i * frame_ms))
            start = None
    if start is not None:
        segs.append((start * frame_ms, n_frames * frame_ms))
    return segs


class ResampleTransform:
    """Picklable batch transform (usable both as a ``map_batches`` fn and
    as a ``StreamingMapEngine`` transform): decode -> linear resample ->
    summary columns (n_out, rms of the resampled int16 signal). The
    resampled payload is re-emitted as pcm16 bytes so downstream stages
    keep streaming."""

    def __init__(self, sr_out: int, bytes_col: str = "bytes",
                 codec_col: str = "codec", sr_col: str = "sr_hz"):
        self.sr_out = sr_out
        self.bytes_col = bytes_col
        self.codec_col = codec_col
        self.sr_col = sr_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch[self.bytes_col].to_pylist()
        codecs = batch[self.codec_col].to_pylist() if self.codec_col in \
            batch.column_names else ["pcm16"] * len(raws)
        srs = batch[self.sr_col].to_pylist()
        out_bytes, n_out, rms = [], [], []
        for raw, codec, sr in zip(raws, codecs, srs):
            pcm = _decode_int16(raw, codec or "pcm16")
            y = resample_linear(pcm, int(sr), self.sr_out)
            out_bytes.append(y.tobytes())
            n_out.append(len(y))
            ss = float((y.astype(np.int64) ** 2).sum())
            rms.append(round(float(np.sqrt(ss / max(1, len(y)))), 6))
        batch = batch.drop_columns([self.bytes_col])
        batch = batch.append_column("bytes_out", pa.array(
            out_bytes, type=pa.large_binary()))
        batch = batch.append_column("sr_out", pa.array(
            [self.sr_out] * len(n_out), type=pa.int32()))
        batch = batch.append_column("n_out", pa.array(n_out, pa.int64()))
        return batch.append_column("rms_out", pa.array(rms, pa.float64()))


def resample_stage(ds: ray.data.Dataset, sr_out: int,
                   bytes_col: str = "bytes", codec_col: str = "codec",
                   sr_col: str = "sr_hz") -> ray.data.Dataset:
    """Per-clip resample as a stateless Dataset stage."""
    return ds.map_batches(
        ResampleTransform(sr_out, bytes_col, codec_col, sr_col),
        batch_format="pyarrow", batch_size=None)


def vad_stage(ds: ray.data.Dataset, frame_ms: int = 20,
              rel_threshold: float = 0.5, id_col: str = "clip_id",
              bytes_col: str = "bytes", codec_col: str = "codec",
              sr_col: str = "sr_hz") -> ray.data.Dataset:
    """Exploded VAD: one output row per voiced segment
    (clip_id, seg_idx, seg_start_ms, seg_end_ms)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        raws = batch[bytes_col].to_pylist()
        codecs = batch[codec_col].to_pylist() if codec_col in \
            batch.column_names else ["pcm16"] * len(raws)
        srs = batch[sr_col].to_pylist()
        out_id, out_idx, out_s, out_e = [], [], [], []
        for cid, raw, codec, sr in zip(ids, raws, codecs, srs):
            pcm = _decode_int16(raw, codec or "pcm16")
            for j, (s, e) in enumerate(vad_segments(
                    pcm, int(sr), frame_ms, rel_threshold)):
                out_id.append(cid)
                out_idx.append(j)
                out_s.append(s)
                out_e.append(e)
        return pa.table({
            id_col: pa.array(out_id, type=pa.string()),
            "seg_idx": pa.array(out_idx, type=pa.int64()),
            "seg_start_ms": pa.array(out_s, type=pa.int64()),
            "seg_end_ms": pa.array(out_e, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def loudness_normalize(x: np.ndarray, target_rms: float) -> tuple:
    """Normalize one int16 clip to ``target_rms``: gain =
    target_rms / rms_in (1.0 for silent clips), output samples
    ``clamp(floor(x * gain + 0.5), -32768, 32767)`` — the same explicit
    tie rule as :func:`resample_linear`, so any implementation agrees
    bit-for-bit. Returns (y, rms_in, gain, rms_out)."""
    n = len(x)
    if n == 0:
        return np.empty(0, dtype=np.int16), 0.0, 1.0, 0.0
    xf = x.astype(np.float64)
    rms_in = float(np.sqrt((xf * xf).sum() / n))
    gain = (target_rms / rms_in) if rms_in > 0 else 1.0
    y = np.clip(np.floor(xf * gain + 0.5), -32768, 32767).astype(np.int16)
    yf = y.astype(np.float64)
    rms_out = float(np.sqrt((yf * yf).sum() / n))
    return y, rms_in, gain, rms_out


class LoudnessNormalizeTransform:
    """Picklable batch transform (map_batches fn AND StreamingMapEngine
    transform): decode -> gain to target RMS -> summary columns. The
    normalized payload is re-emitted as pcm16 bytes so downstream stages
    keep streaming. Per-clip numpy kernels (a clip IS the vector unit);
    no shuffle, no state."""

    def __init__(self, target_rms: float = 3000.0, bytes_col: str = "bytes",
                 codec_col: str = "codec"):
        self.target_rms = target_rms
        self.bytes_col = bytes_col
        self.codec_col = codec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch[self.bytes_col].to_pylist()
        codecs = batch[self.codec_col].to_pylist() if self.codec_col in \
            batch.column_names else ["pcm16"] * len(raws)
        out_b, n_s, r_in, g, r_out = [], [], [], [], []
        for raw, codec in zip(raws, codecs):
            x = _decode_int16(raw, codec or "pcm16")
            y, rin, gain, rout = loudness_normalize(x, self.target_rms)
            out_b.append(y.tobytes())
            n_s.append(len(y))
            r_in.append(round(rin, 6))
            g.append(round(gain, 6))
            r_out.append(round(rout, 6))
        batch = batch.drop_columns([self.bytes_col])
        batch = batch.append_column("bytes_out",
                                    pa.array(out_b, pa.large_binary()))
        batch = batch.append_column("n_samples", pa.array(n_s, pa.int64()))
        batch = batch.append_column("rms_in", pa.array(r_in, pa.float64()))
        batch = batch.append_column("gain", pa.array(g, pa.float64()))
        return batch.append_column("rms_out", pa.array(r_out, pa.float64()))


def loudness_normalize_stage(ds: ray.data.Dataset,
                             target_rms: float = 3000.0,
                             bytes_col: str = "bytes",
                             codec_col: str = "codec") -> ray.data.Dataset:
    """Per-clip loudness normalization as a stateless Dataset stage."""
    return ds.map_batches(
        LoudnessNormalizeTransform(target_rms, bytes_col, codec_col),
        batch_format="pyarrow", batch_size=None)


def audio_qc(x: np.ndarray, sr_hz: int, frame_ms: int = 20,
             rel_threshold: float = 0.5) -> tuple:
    """QC metrics for one int16 clip:

    - ``peak`` = max |sample| (int; |-32768| = 32768),
    - ``n_clipped`` = samples with |x| >= 32767 (both rails),
    - edge-silence trim: frame energies exactly as
      :func:`vad_segments` (full ``frame_ms`` frames, int64 sums of
      squares, ``rel_threshold * max`` cutoff); ``trim_start_ms`` /
      ``trim_end_ms`` bound the first..last voiced frame. No voiced
      frames (or no full frame) => 0/0.

    Returns (peak, n_clipped, trim_start_ms, trim_end_ms)."""
    n = len(x)
    if n == 0:
        return 0, 0, 0, 0
    ax = np.abs(x.astype(np.int64))
    peak = int(ax.max())
    n_clipped = int((ax >= 32767).sum())
    spf = sr_hz * frame_ms // 1000
    n_frames = n // spf if spf > 0 else 0
    if n_frames == 0:
        return peak, n_clipped, 0, 0
    frames = x[:n_frames * spf].astype(np.int64).reshape(n_frames, spf)
    energy = (frames * frames).sum(axis=1)
    thresh = rel_threshold * float(energy.max())
    voiced = np.nonzero(energy.astype(np.float64) > thresh)[0]
    if len(voiced) == 0:
        return peak, n_clipped, 0, 0
    return (peak, n_clipped, int(voiced[0]) * frame_ms,
            (int(voiced[-1]) + 1) * frame_ms)


class AudioQcTransform:
    """The q86 QC kernel as a picklable batch transform — the ONE
    implementation shared by the batch stage and the streaming q101
    ETL (their row-for-row agreement is what the shared fixture
    oracle gates)."""

    def __init__(self, frame_ms: int = 20, rel_threshold: float = 0.5,
                 id_col: str = "clip_id", bytes_col: str = "bytes",
                 codec_col: str = "codec", sr_col: str = "sr_hz"):
        self.frame_ms = frame_ms
        self.rel_threshold = rel_threshold
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.codec_col = codec_col
        self.sr_col = sr_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        raws = batch[self.bytes_col].to_pylist()
        codecs = batch[self.codec_col].to_pylist() if self.codec_col in \
            batch.column_names else ["pcm16"] * len(raws)
        srs = batch[self.sr_col].to_pylist()
        cols = {k: [] for k in ("n_samples", "peak", "n_clipped",
                                "clip_frac", "trim_start_ms",
                                "trim_end_ms")}
        for raw, codec, sr in zip(raws, codecs, srs):
            x = _decode_int16(raw, codec or "pcm16")
            peak, ncl, ts, te = audio_qc(x, int(sr), self.frame_ms,
                                         self.rel_threshold)
            cols["n_samples"].append(len(x))
            cols["peak"].append(peak)
            cols["n_clipped"].append(ncl)
            cols["clip_frac"].append(round(ncl / len(x), 6) if len(x)
                                     else 0.0)
            cols["trim_start_ms"].append(ts)
            cols["trim_end_ms"].append(te)
        return pa.table({
            self.id_col: pa.array(ids, pa.string()),
            "n_samples": pa.array(cols["n_samples"], pa.int64()),
            "peak": pa.array(cols["peak"], pa.int64()),
            "n_clipped": pa.array(cols["n_clipped"], pa.int64()),
            "clip_frac": pa.array(cols["clip_frac"], pa.float64()),
            "trim_start_ms": pa.array(cols["trim_start_ms"], pa.int64()),
            "trim_end_ms": pa.array(cols["trim_end_ms"], pa.int64()),
            "trimmed_dur_ms": pa.array(
                [e - s for s, e in zip(cols["trim_start_ms"],
                                       cols["trim_end_ms"])], pa.int64()),
        })


def audio_qc_stage(ds: ray.data.Dataset, frame_ms: int = 20,
                   rel_threshold: float = 0.5, id_col: str = "clip_id",
                   bytes_col: str = "bytes", codec_col: str = "codec",
                   sr_col: str = "sr_hz") -> ray.data.Dataset:
    """Per-clip QC row: (clip_id, n_samples, peak, n_clipped, clip_frac,
    trim_start_ms, trim_end_ms, trimmed_dur_ms). Stateless map_batches —
    the corpus-health scan every audio ingestion runs before training."""
    return ds.map_batches(
        AudioQcTransform(frame_ms, rel_threshold, id_col, bytes_col,
                         codec_col, sr_col),
        batch_format="pyarrow", batch_size=None)


def synth_stereo(x: np.ndarray) -> bytes:
    """Deterministic stereo payload from a mono int16 clip: L = x,
    R = floor(3x/4) (int32 intermediate, exact), interleaved LRLR...
    as little-endian int16 bytes — the fixture generator for the
    multichannel plumbing (a real corpus would carry stereo natively)."""
    r = ((x.astype(np.int32) * 3) // 4).astype(np.int16)
    inter = np.empty(2 * len(x), dtype=np.int16)
    inter[0::2] = x
    inter[1::2] = r
    return inter.tobytes()


class StereoSynthTransform:
    """Batch stage emitting a stereo interleaved ``bytes_stereo`` column
    from mono pcm16 clips (picklable)."""

    def __init__(self, bytes_col: str = "bytes", codec_col: str = "codec"):
        self.bytes_col = bytes_col
        self.codec_col = codec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch[self.bytes_col].to_pylist()
        codecs = batch[self.codec_col].to_pylist() if self.codec_col in \
            batch.column_names else ["pcm16"] * len(raws)
        out = [synth_stereo(_decode_int16(raw, c or "pcm16"))
               for raw, c in zip(raws, codecs)]
        batch = batch.drop_columns([self.bytes_col])
        return batch.append_column("bytes_stereo",
                                   pa.array(out, pa.large_binary()))


def mixdown(inter: np.ndarray) -> tuple:
    """Stereo interleaved int16 -> (mono, L, R): mono frame =
    floor((L+R)/2) (int32 sum, floor division — exact and
    sign-consistent in any implementation)."""
    L = inter[0::2]
    R = inter[1::2]
    mono = ((L.astype(np.int32) + R.astype(np.int32)) // 2).astype(np.int16)
    return mono, L, R


def mixdown_stage(ds: ray.data.Dataset, id_col: str = "clip_id",
                  stereo_col: str = "bytes_stereo") -> ray.data.Dataset:
    """Channel mixdown over a stereo interleaved binary column — the
    multichannel-ingestion stage (deinterleave, downmix, per-channel
    QC stats). Stateless map_batches; per-clip numpy slicing (stride
    views, no copy until the int32 sum). Emits n_frames and the
    rms of mono/L/R (round 6, exact integer sums of squares)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        raws = batch[stereo_col].to_pylist()
        cols = {k: [] for k in ("n_frames", "rms_mono", "rms_l", "rms_r")}
        for raw in raws:
            inter = np.frombuffer(raw, dtype="<i2")
            mono, L, R = mixdown(inter)
            n = len(mono)
            cols["n_frames"].append(n)
            for key, sig in (("rms_mono", mono), ("rms_l", L),
                             ("rms_r", R)):
                ss = float((sig.astype(np.int64) ** 2).sum())
                cols[key].append(round(float(np.sqrt(ss / max(1, n))), 6))
        return pa.table({
            id_col: pa.array(ids, pa.string()),
            "n_frames": pa.array(cols["n_frames"], pa.int64()),
            "rms_mono": pa.array(cols["rms_mono"], pa.float64()),
            "rms_l": pa.array(cols["rms_l"], pa.float64()),
            "rms_r": pa.array(cols["rms_r"], pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
