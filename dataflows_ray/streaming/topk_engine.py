"""Streaming windowed top-k (heavy hitters per tumbling window):
micro-batch epochs -> per-partition window-count state ->
watermark-triggered exact top-k emission, exactly-once, resumable.

The streaming counterpart of the batch ``stages.setops.grouped_top_k``
over window assignment (SQL ``row_number() OVER (PARTITION BY window
ORDER BY count DESC) <= k``), on the shared ``MicroBatchEngine``
skeleton (see ``window_engine.py``). No reference equivalent — the
reference's closest shape is sort_rows + head per group
(reference processors/sort_rows.py:28-43 semantics, reused here only as
the ordering contract).

Scale shape — the partition key is the WINDOW, not the group key:
- ``derive`` adds ``__window_idx__ = event_ms // window_ms`` inside the
  split task; routing on the window INDEX (not window_start, whose
  multiples-of-window_ms values would alias mod P) spreads consecutive
  windows round-robin over the P state partitions, so each partition
  owns complete windows and can emit its windows' EXACT top-k locally —
  no cross-partition merge, no second exchange.
- the split-task combiner collapses rows to (window, key, n) count
  partials, so shuffle volume and state-actor load are O(distinct keys
  per window per chunk), not O(rows); a hot key's rows are counted in
  every split task in parallel.
- per-partition state is one (window_start, key, n_clips) frame over
  OPEN windows only; emission at watermark close removes the window.
- watermark lag: a partition's max-event report only advances when a
  row routes to it, so with in-order arrival the min-of-maxes watermark
  trails by ~P windows — windows close a few epochs late (bounded), and
  the final +inf flush drains the tail. Emission remains exactly-once
  and byte-identical to the batch operator for an in-order stream.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .join_state import _serialize, _deserialize
from .sink import sink_for
from .window_engine import MicroBatchEngine

_WIDX = "__window_idx__"


def _add_window_idx(tbl: pa.Table, ts_col: str, window_ms: int) -> pa.Table:
    ts = tbl[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return tbl.append_column(_WIDX, pa.array(ts // window_ms))


def _count_partials(tbl: pa.Table, key: str, window_ms: int) -> pa.Table:
    """Combiner: raw rows -> one (window_start, key, n_clips) count
    partial per pair present in the chunk."""
    df = pd.DataFrame({
        "window_start": tbl[_WIDX].to_numpy(zero_copy_only=False)
        * np.int64(window_ms),
        key: tbl[key].to_numpy(zero_copy_only=False),
    })
    out = df.groupby(["window_start", key], sort=False) \
        .size().rename("n_clips").reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
class TopKStateActor:
    """Per-partition windowed top-k state: open-window (window_start,
    key, n_clips) counts. Folds COMBINED count partials from the split
    tasks; when the watermark closes a window, emits that window's
    top-k rows ranked (n desc, key asc) — one vectorized sort +
    cumcount across all closing windows, no per-window Python."""

    def __init__(self, partition: int, key: str, window_ms: int, k: int):
        self.partition = partition
        self.key = key
        self.window_ms = window_ms
        self.k = k
        self.state: Optional[pd.DataFrame] = None

    def _fold(self, df: pd.DataFrame) -> None:
        frames = [df] if self.state is None else [self.state, df]
        allf = pd.concat(frames, ignore_index=True)
        self.state = allf.groupby(["window_start", self.key], sort=False) \
            ["n_clips"].sum().reset_index()

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        n_late = 0
        if tables:
            df = pa.concat_tables(tables).to_pandas()
            # partials for an already-emitted window are late: dropped
            # and counted (row-weighted), never re-emitted
            if watermark_ms >= 0:
                late = df["window_start"] + self.window_ms <= watermark_ms
                n_late = int(df.loc[late, "n_clips"].sum())
                df = df[~late]
            if len(df):
                self._fold(df)

        emitted = pd.DataFrame()
        if self.state is not None and len(self.state):
            closed = self.state["window_start"] + self.window_ms \
                <= watermark_ms
            if closed.any():
                c = self.state[closed].sort_values(
                    ["window_start", "n_clips", self.key],
                    ascending=[True, False, True], kind="stable")
                pos = c.groupby("window_start", sort=False).cumcount()
                emitted = c[pos < self.k].assign(
                    rank=(pos[pos < self.k] + 1).to_numpy())
                self.state = self.state[~closed].reset_index(drop=True)

        sink = sink_for(sink_dir)
        if len(emitted):
            out = emitted[["window_start", self.key, "n_clips", "rank"]]
            stats = sink.stage(epoch, self.partition,
                               pa.Table.from_pandas(out.reset_index(drop=True),
                                                    preserve_index=False))
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms, "late_dropped": n_late,
                      "open_windows": 0 if self.state is None
                      else int(self.state["window_start"].nunique())})
        return stats

    def snapshot(self) -> Dict:
        return {"state": _serialize(self.state)}

    def restore(self, snap: Dict) -> None:
        self.state = _deserialize(snap.get("state"))


class StreamingTopKEngine(MicroBatchEngine):
    """Exactly-once streaming top-k keys per tumbling window over
    micro-batch epochs of a time-ordered stream."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, window_ms: int = 60_000,
                 k: int = 5, allowed_lateness_ms: int = 60_000,
                 group_col: str = "speaker", ts_col: str = "event_ms"):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms,
                         key=_WIDX, ts_col=ts_col)
        self.window_ms = window_ms
        self.k = k
        self.group_col = group_col

    def columns(self) -> List[str]:
        return [self.group_col, self.ts_col]

    def make_actor(self, partition: int):
        return TopKStateActor.remote(partition, self.group_col,
                                     self.window_ms, self.k)

    def derive(self):
        return functools.partial(_add_window_idx, ts_col=self.ts_col,
                                 window_ms=self.window_ms)

    def precombine(self):
        return functools.partial(_count_partials, key=self.group_col,
                                 window_ms=self.window_ms)
