"""Event-time windows over Arrow batches: tumbling, sliding, session.

The reference (datahq/dataflows) has NO window operators — windows are
engine-defined per the north rule (BASELINE.json: "tumbling/sliding/session
windows keyed by clip_id with event-time watermarks"). Semantics follow the
standard structured-streaming model:

- tumbling(size): window_start = floor(ts / size) * size; each event in
  exactly one window.
- sliding(size, slide): event at ts belongs to every window with
  start in ( ts-size, ts ] stepped by slide — emitted via flat_map-style
  row replication (size/slide rows per event).
- session(gap): per-key windows; events whose gaps are < gap merge into
  one window [min_ts, max_ts + gap). Implemented as a per-key sorted scan
  inside ``groupby(key).map_groups`` — the partitioning assumption is that
  one key's events fit in one group (documented; keys are speakers/clip
  prefixes, bounded per key).

All assignment is vectorized numpy over ``map_batches`` (zero-copy Arrow
in); only session windows shuffle (by key).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

WINDOW_START = "window_start"
WINDOW_END = "window_end"


def assign_tumbling(ds: ray.data.Dataset, ts_col: str, size_ms: int,
                    batch_size=None) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        start = (ts // size_ms) * size_ms
        batch = batch.append_column(WINDOW_START, pa.array(start))
        return batch.append_column(WINDOW_END, pa.array(start + size_ms))
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def assign_sliding(ds: ray.data.Dataset, ts_col: str, size_ms: int,
                   slide_ms: int, batch_size=None) -> ray.data.Dataset:
    assert size_ms % slide_ms == 0, "size must be a multiple of slide"
    n_windows = size_ms // slide_ms

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ts)
        # replicate each row n_windows times; compute its window starts
        idx = np.repeat(np.arange(n), n_windows)
        k = np.tile(np.arange(n_windows), n)
        first_start = ((ts // slide_ms) * slide_ms)  # newest window start
        starts = first_start[idx] - k * slide_ms
        valid = starts + size_ms > ts[idx]
        valid &= starts >= 0
        out = batch.take(pa.array(idx[valid]))
        out = out.append_column(WINDOW_START, pa.array(starts[valid]))
        return out.append_column(WINDOW_END, pa.array(starts[valid] + size_ms))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def assign_session(ds: ray.data.Dataset, key_cols: List[str], ts_col: str,
                   gap_ms: int) -> ray.data.Dataset:
    """Per-key gap-merge: shuffle by key, sort each group by ts, split at
    gaps >= gap_ms. Window = [min_ts, max_ts + gap)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy(dtype=np.int64)
        new_session = np.zeros(len(ts), dtype=bool)
        if len(ts):
            new_session[0] = True
            new_session[1:] = (ts[1:] - ts[:-1]) >= gap_ms
        session_id = np.cumsum(new_session) - 1
        start = pd.Series(ts).groupby(session_id).transform("min").to_numpy()
        end = pd.Series(ts).groupby(session_id).transform("max").to_numpy() + gap_ms
        g = g.copy()
        g[WINDOW_START] = start
        g[WINDOW_END] = end
        return g

    return ds.groupby(key_cols).map_groups(per_group, batch_format="pandas")
