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
  one window [min_ts, max_ts + gap). Implemented as hash-repartition by
  key + ONE vectorized boundary scan per partition (``keyed_merge``) —
  the partitioning assumption is that one key's events fit in one
  partition (documented; keys are speakers/clip prefixes, bounded per
  key).

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
    """Per-key gap-merge: hash-repartition by key (equal keys co-located),
    then ONE vectorized scan per partition: sort by (key, ts), find
    session boundaries (key change OR gap >= gap_ms), broadcast each
    session's min/max via ``repeat`` — no per-group Python at all.
    Window = [min_ts, max_ts + gap). Partitioning assumption (documented):
    one key's events fit in one partition block."""
    from ..stages.agg import keyed_merge

    def per_block(df: pd.DataFrame, key_cols=key_cols, ts_col=ts_col,
                  gap_ms=gap_ms) -> pa.Table:
        n = len(df)
        if n == 0:
            df = df.copy()
            df[WINDOW_START] = np.empty(0, dtype=np.int64)
            df[WINDOW_END] = np.empty(0, dtype=np.int64)
            return pa.Table.from_pandas(df, preserve_index=False) \
                           .replace_schema_metadata(None)
        df = df.sort_values(key_cols + [ts_col], kind="mergesort") \
               .reset_index(drop=True)
        ts = df[ts_col].to_numpy(dtype=np.int64)
        boundary = np.zeros(n, dtype=bool)
        boundary[0] = True
        for k in key_cols:
            v = df[k].to_numpy()
            boundary[1:] |= v[1:] != v[:-1]
        boundary[1:] |= (ts[1:] - ts[:-1]) >= gap_ms
        firsts = np.flatnonzero(boundary)
        counts = np.diff(np.append(firsts, n))
        lasts = np.append(firsts[1:], n) - 1
        df[WINDOW_START] = np.repeat(ts[firsts], counts)
        df[WINDOW_END] = np.repeat(ts[lasts] + gap_ms, counts)
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)

    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=None)
    return keyed_merge(arrow, key_cols, per_block)
