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

    def __init__(self, validate_snr: bool = False, seed: int = 42):
        self.validate_snr = validate_snr
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch["bytes"].to_pylist()
        codecs = batch["codec"].to_pylist()
        rms = np.empty(len(raws))
        peak = np.empty(len(raws))
        n_samples = np.empty(len(raws), dtype=np.int64)
        snrs = np.empty(len(raws)) if self.validate_snr else None
        for i, (raw, codec) in enumerate(zip(raws, codecs)):
            wave = decode_pcm(raw, codec)
            rms[i] = float(np.sqrt(np.mean(wave ** 2))) if len(wave) else 0.0
            peak[i] = float(np.abs(wave).max()) if len(wave) else 0.0
            n_samples[i] = len(wave)
            if self.validate_snr:
                clip_idx = int(batch["clip_id"][i].as_py().rsplit("-", 1)[1])
                ref = synth_clip_batch(clip_idx, 1, seed=self.seed)
                ref_wave = decode_pcm(ref["bytes"][0].as_py(), "pcm16")
                snrs[i] = snr_db(ref_wave, wave)
        out = batch.drop_columns(["bytes"])
        out = out.append_column("rms", pa.array(rms))
        out = out.append_column("peak", pa.array(peak))
        out = out.append_column("n_samples", pa.array(n_samples))
        if self.validate_snr:
            out = out.append_column("snr_db", pa.array(snrs))
        return out


def decode_stage(ds: ray.data.Dataset, concurrency: int = 4,
                 batch_size: int = 256, validate_snr: bool = False
                 ) -> ray.data.Dataset:
    """Small batches for wide binary rows (SURVEY §7.5)."""
    return ds.map_batches(
        PcmDecoder, fn_constructor_kwargs={"validate_snr": validate_snr},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def windowed_speaker_aggregate(ds: ray.data.Dataset, window_ms: int = 60_000,
                               salt_buckets: int = 8) -> ray.data.Dataset:
    """Tumbling-window per-speaker aggregate with SALTED two-stage
    aggregation for hot speaker keys (the skew lever): stage 1 aggregates
    (speaker, window, salt) — hot keys spread over ``salt_buckets``
    reducers — stage 2 merges the partials per (speaker, window)."""
    ds = assign_tumbling(ds, "event_ms", window_ms)

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(len(batch), dtype=np.int64) % salt_buckets
        return batch.append_column("__salt__", pa.array(salt))

    ds = ds.map_batches(add_salt, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Sum
    partial = ds.groupby(["speaker", WINDOW_START, "__salt__"]).aggregate(
        Sum("dur_ms", alias_name="total_dur_ms"),
        Count(alias_name="n_clips"),
        Max("event_ms", alias_name="max_event_ms"),
    )
    final = partial.groupby(["speaker", WINDOW_START]).aggregate(
        Sum("total_dur_ms", alias_name="total_dur_ms"),
        Sum("n_clips", alias_name="n_clips"),
        Max("max_event_ms", alias_name="max_event_ms"),
    )
    return final
