"""Audio pipeline stages: PCM decode actor pool + windowed aggregation.

The flagship north-rule pipeline: read audio table -> decode PCM (actor
pool ``map_batches`` over zero-copy Arrow binary) -> stateful
stream-stream join (``streaming/engine.py``) -> tumbling-window aggregate
per speaker -> exactly-once sink. This module holds the Dataset-API
stages; the stateful join lives in the engine.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..streaming.audio import decode_pcm, snr_db, synth_clip_batch
from ..streaming.windows import assign_tumbling, WINDOW_START


class PcmDecoder:
    """Actor-pool decode stage: binary PCM -> per-clip audio features.

    Stateful-stage shape per the brief: setup in ``__init__`` (once per
    actor), vectorized-ish work per ``__call__``. Emits rms/peak/n_samples
    (the features a real ASR feature extractor would compute) and drops
    the raw bytes so downstream shuffles move features, not audio.
    """

    def __init__(self, validate_snr: bool = False, seed: int = 42,
                 spectral: bool = False, n_fft: int = 512, hop: int = 160,
                 frame: int = 400, n_mels: int = 64):
        self.validate_snr = validate_snr
        self.seed = seed
        self.spectral = spectral
        self.n_fft = n_fft
        self.hop = hop
        self.frame = frame
        # mel-ish projection built ONCE per actor (triangular bank)
        if spectral:
            bins = n_fft // 2 + 1
            centers = np.linspace(0, bins - 1, n_mels + 2)
            bank = np.zeros((bins, n_mels), dtype=np.float32)
            for m in range(n_mels):
                lo, c, hi = centers[m], centers[m + 1], centers[m + 2]
                idx = np.arange(bins)
                up = np.clip((idx - lo) / max(c - lo, 1e-9), 0, 1)
                down = np.clip((hi - idx) / max(hi - c, 1e-9), 0, 1)
                bank[:, m] = np.minimum(up, down)
            self.mel_bank = bank
            self.window = np.hanning(frame).astype(np.float32)

    def _spectral_features(self, wave: np.ndarray):
        """Framed FFT -> mel-ish log energies; returns (mean_vec, centroid).
        The real compute an ASR feature extractor would do per clip."""
        n = len(wave)
        if n < self.frame:
            wave = np.pad(wave, (0, self.frame - n))
            n = len(wave)
        n_frames = 1 + (n - self.frame) // self.hop
        idx = (np.arange(self.frame)[None, :]
               + self.hop * np.arange(n_frames)[:, None])
        frames = wave[idx] * self.window
        spec = np.abs(np.fft.rfft(frames, n=self.n_fft, axis=1)) ** 2
        mel = np.log1p(spec.astype(np.float32) @ self.mel_bank)
        freqs = np.arange(spec.shape[1], dtype=np.float32)
        centroid = float((spec @ freqs).sum() / max(spec.sum(), 1e-9))
        return mel.mean(axis=0), centroid

    def _decode_mixed(self, col, byte_offsets, codec_list):
        """Per-codec decode for mixed batches: µ-law/A-law are single
        table gathers over the row's byte range, WAV is a container parse,
        PCM16 an int16 view — each row's decode is one vectorized numpy
        op; the Python loop is per CLIP, not per sample."""
        from ..streaming.audio import (decode_mulaw_bytes, decode_alaw_bytes,
                                       parse_wav)
        values_u8 = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        waves = []
        for i, codec in enumerate(codec_list):
            s, e = int(byte_offsets[i]), int(byte_offsets[i + 1])
            seg = values_u8[s:e]
            if codec == "pcm16":
                if s % 2:  # odd start: copy to a 2-byte-viewable buffer
                    seg = seg.copy()
                w = seg.view("<i2").astype(np.float32) / np.float32(32767.0)
            elif codec == "mulaw":
                w = decode_mulaw_bytes(seg).astype(np.float32)
            elif codec == "alaw":
                w = decode_alaw_bytes(seg).astype(np.float32)
            elif codec == "wav":
                w = parse_wav(seg.tobytes())[0].astype(np.float32)
            elif codec == "flac":
                from ..functions.flac import decode_flac
                samples, _ = decode_flac(seg.tobytes())
                w = samples.astype(np.float32) / np.float32(32767.0)
            else:
                raise NotImplementedError(f"codec {codec!r} not available")
            waves.append(w)
        lengths = np.array([len(w) for w in waves], dtype=np.int64)
        wave_all = (np.concatenate(waves) if waves
                    else np.zeros(0, dtype=np.float32))
        sample_offsets = np.concatenate([[0], np.cumsum(lengths)])
        return wave_all, sample_offsets

    def __call__(self, batch: pa.Table) -> pa.Table:
        codecs = set(batch["codec"].to_pylist())
        col = batch["bytes"].combine_chunks()
        off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        byte_offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
            col.offset:col.offset + len(col) + 1].astype(np.int64)
        if codecs <= {"pcm16"} and byte_offsets[0] % 2 == 0:
            # ZERO-COPY batch decode: view the Arrow binary column's value
            # buffer as int16 directly — no Python bytes, no join copy.
            # (odd start offset — a slice out of a mixed-codec block —
            # falls through to the copying per-row path below)
            values = np.frombuffer(col.buffers()[2], dtype="<i2")
            wave_all = (values[byte_offsets[0] // 2:byte_offsets[-1] // 2]
                        .astype(np.float32) / 32767.0)
            sample_offsets = (byte_offsets - byte_offsets[0]) // 2
        else:
            wave_all, sample_offsets = self._decode_mixed(
                col, byte_offsets, batch["codec"].to_pylist())
        lengths = np.diff(sample_offsets)
        n_samples = lengths
        offsets = sample_offsets[:-1]
        n_clips = len(batch)
        safe_len = np.maximum(lengths, 1)
        sq_sums = np.add.reduceat(wave_all ** 2, offsets) if len(wave_all) \
            else np.zeros(n_clips)
        rms = np.sqrt(sq_sums / safe_len)
        peak = (np.maximum.reduceat(np.abs(wave_all), offsets)
                if len(wave_all) else np.zeros(n_clips))
        snrs = np.empty(n_clips) if self.validate_snr else None
        if self.validate_snr:
            codec_list = batch["codec"].to_pylist()
            for i in range(n_clips):
                wave = decode_pcm(col[i].as_py(), codec_list[i])
                clip_idx = int(batch["clip_id"][i].as_py().rsplit("-", 1)[1])
                ref = synth_clip_batch(clip_idx, 1, seed=self.seed)
                ref_wave = decode_pcm(ref["bytes"][0].as_py(), "pcm16")
                snrs[i] = snr_db(ref_wave, wave)
        mels = None
        centroids = None
        if self.spectral:
            mels = []
            centroids = np.empty(n_clips, dtype=np.float32)
            ends = sample_offsets[1:]
            for i in range(n_clips):
                clip_wave = wave_all[offsets[i]:ends[i]]
                mvec, cent = self._spectral_features(clip_wave)
                mels.append(mvec)
                centroids[i] = cent
        out = batch.drop_columns(["bytes"])
        out = out.append_column("rms", pa.array(rms))
        out = out.append_column("peak", pa.array(peak))
        out = out.append_column("n_samples", pa.array(n_samples))
        if self.validate_snr:
            out = out.append_column("snr_db", pa.array(snrs))
        if self.spectral:
            out = out.append_column(
                "mel_mean", pa.array([m.tolist() for m in mels],
                                     type=pa.list_(pa.float32())))
            out = out.append_column("spectral_centroid", pa.array(centroids))
        return out


import functools


@functools.lru_cache(maxsize=8)
def _cached_decoder(validate_snr: bool, spectral: bool) -> "PcmDecoder":
    return PcmDecoder(validate_snr=validate_snr, spectral=spectral)


def decode_stage(ds: ray.data.Dataset, concurrency: int = None,
                 batch_size=None, validate_snr: bool = False,
                 spectral: bool = False) -> ray.data.Dataset:
    """Decode stage. Default is STATELESS tasks with a per-process cached
    decoder: tasks share CPUs elastically with the read stage (an actor
    pool that reserves most CPUs starves the reads and caps scaling).
    Pass ``concurrency`` to pin an actor pool instead (useful when setup
    is genuinely heavy, e.g. a real model load).

    Small batches for wide binary rows (SURVEY §7.5)."""
    if concurrency is not None:
        return ds.map_batches(
            PcmDecoder,
            fn_constructor_kwargs={"validate_snr": validate_snr,
                                   "spectral": spectral},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1)

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_decoder(validate_snr, spectral)(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def windowed_speaker_aggregate(ds: ray.data.Dataset, window_ms: int = 60_000
                               ) -> ray.data.Dataset:
    """Tumbling-window per-speaker aggregate via the engine's combining
    aggregate path (``stages.agg.grouped_aggregate``): stage 1 is a
    per-batch vectorized combiner — which IS the hot-key/skew mitigation:
    a hot speaker collapses to one partial row per batch before any
    shuffle — stage 2 merges partials in a hash-partitioned vectorized
    reduce. No per-group Python anywhere."""
    from ..stages.agg import grouped_aggregate

    ds = assign_tumbling(ds, "event_ms", window_ms)
    return grouped_aggregate(ds, ["speaker", WINDOW_START], [
        {"target": "total_dur_ms", "source": "dur_ms", "aggregate": "sum"},
        {"target": "n_clips", "aggregate": "count"},
        {"target": "max_event_ms", "source": "event_ms", "aggregate": "max"},
        # known upstream schema: skips the lazy-plan probe that would
        # otherwise execute the decode stage just to look for ROW_ID
    ], input_columns=["speaker", "event_ms", "dur_ms", WINDOW_START])


class CodecRoundtripQC:
    """Per-clip decode + LOSSLESS verification (q103).

    Lossless codecs (pcm16 / wav / flac) must reproduce the reference
    quantized int16 samples EXACTLY — a stronger bar than the SNR>=30dB
    invariant the lossy G.711 paths are held to. The reference is
    regenerated analytically from the clip index (synth_clip_batch is
    deterministic per (seed, i)), so validation needs no side input —
    each clip verifies independently inside map_batches, the 100-TB
    shape. Emits one row per clip: codec, n_samples, enc_bytes, snr_db,
    exact (1 = bit-exact round-trip).
    """

    LOSSLESS = frozenset({"pcm16", "wav", "flac"})

    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..streaming.audio import decode_pcm, snr_db, synth_clip_batch
        n = len(batch)
        raws = batch["bytes"].to_pylist()
        codecs = batch["codec"].to_pylist()
        clip_ids = batch["clip_id"].to_pylist()
        n_samples = np.empty(n, dtype=np.int64)
        enc_bytes = np.empty(n, dtype=np.int64)
        snrs = np.empty(n, dtype=np.float64)
        exact = np.zeros(n, dtype=np.int64)
        for i in range(n):
            w = decode_pcm(raws[i], codecs[i])
            idx = int(clip_ids[i].rsplit("-", 1)[1])
            ref = synth_clip_batch(idx, 1, seed=self.seed)
            ref_i16 = np.frombuffer(ref["bytes"][0].as_py(), dtype="<i2")
            ref_wave = ref_i16.astype(np.float64) / 32767.0
            n_samples[i] = len(w)
            enc_bytes[i] = len(raws[i])
            snrs[i] = snr_db(ref_wave, w)
            if codecs[i] in self.LOSSLESS:
                dec_i16 = np.round(w * 32767.0).astype(np.int64)
                exact[i] = int(len(w) == len(ref_i16)
                               and np.array_equal(
                                   dec_i16, ref_i16.astype(np.int64)))
        return pa.table({
            "clip_id": batch["clip_id"],
            "codec": batch["codec"],
            "n_samples": pa.array(n_samples),
            "enc_bytes": pa.array(enc_bytes),
            "snr_db": pa.array(snrs),
            "exact": pa.array(exact),
        })
