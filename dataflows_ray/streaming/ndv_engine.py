"""Streaming windowed approximate distinct count: per-window HyperLogLog
registers as the operator state, exactly-once NDV emission at watermark
close, resumable.

The streaming counterpart of ``functions.sketch.grouped_approx_count_
distinct`` over tumbling windows, on the shared ``MicroBatchEngine``
skeleton. HLL registers are the IDEAL streaming state: fixed 2^p bytes
per open window, merged by elementwise max (commutative + idempotent),
so the emitted estimate is independent of epoch boundaries, partition
layout, and replay — a crashed epoch re-ingested after resume folds to
the same registers.

Scale shape (same window-index partitioning as ``topk_engine``):
- ``derive`` adds ``__window_idx__ = ts // window_ms``; routing on the
  window index gives each partition whole windows — its NDV emission is
  final locally, no cross-partition merge;
- the split-task combiner reduces each partition chunk to ONE register
  row per window present in the chunk (the sketch IS the combiner —
  hot windows collapse before the exchange);
- actor state is {window_start: uint8[2^p]} over OPEN windows only.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.sketch import _estimate, _hash_column, _registers
from .sink import sink_for
from .topk_engine import _WIDX, _add_window_idx
from .window_engine import MicroBatchEngine


def _hll_partials(tbl: pa.Table, col: str, window_ms: int,
                  p: int) -> pa.Table:
    """Combiner: raw rows -> one (window_start, hll registers) row per
    window present in the chunk."""
    widx = tbl[_WIDX].to_numpy(zero_copy_only=False)
    col_arr = tbl[col]
    if isinstance(col_arr, pa.ChunkedArray):
        col_arr = col_arr.combine_chunks()
    h = _hash_column(col_arr)
    starts, regs = [], []
    for w in np.unique(widx):
        starts.append(int(w) * window_ms)
        regs.append(_registers(h[widx == w], p).tobytes())
    return pa.table({
        "window_start": pa.array(starts, type=pa.int64()),
        "__hll__": pa.array(regs, type=pa.binary()),
    })


@ray.remote
class NdvStateActor:
    """Per-partition windowed-HLL state: {window_start: registers}.
    Folding a partial is one vectorized ``np.maximum``; emission at
    watermark close finalizes the estimate and frees the window."""

    def __init__(self, partition: int, window_ms: int, p: int):
        self.partition = partition
        self.window_ms = window_ms
        self.p = p
        self.state: Dict[int, np.ndarray] = {}

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        n_late = 0
        for t in tables:
            for ws, raw in zip(t["window_start"].to_pylist(),
                               t["__hll__"].to_pylist()):
                if watermark_ms >= 0 and ws + self.window_ms <= watermark_ms:
                    n_late += 1  # register partial for a closed window
                    continue
                reg = np.frombuffer(raw, dtype=np.uint8)
                cur = self.state.get(ws)
                if cur is None:
                    self.state[ws] = reg.copy()
                else:
                    np.maximum(cur, reg, out=cur)

        closed = sorted(ws for ws in self.state
                        if ws + self.window_ms <= watermark_ms)
        sink = sink_for(sink_dir)
        if closed:
            out = pa.table({
                "window_start": pa.array(closed, type=pa.int64()),
                "approx_ndv": pa.array(
                    [int(round(_estimate(self.state.pop(ws))))
                     for ws in closed], type=pa.int64()),
            })
            stats = sink.stage(epoch, self.partition, out)
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms, "late_dropped": n_late,
                      "open_windows": len(self.state)})
        return stats

    def snapshot(self) -> Dict:
        return {ws: reg.tobytes() for ws, reg in self.state.items()}

    def restore(self, snap: Dict) -> None:
        self.state = {int(ws): np.frombuffer(raw, dtype=np.uint8).copy()
                      for ws, raw in snap.items()}


class StreamingNdvEngine(MicroBatchEngine):
    """Exactly-once streaming approx-distinct-count per tumbling window
    over micro-batch epochs of a time-ordered stream."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, window_ms: int = 600_000,
                 p: int = 12, allowed_lateness_ms: int = 60_000,
                 value_col: str = "speaker", ts_col: str = "event_ms"):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms,
                         key=_WIDX, ts_col=ts_col)
        self.window_ms = window_ms
        self.p = p
        self.value_col = value_col

    def columns(self) -> List[str]:
        return [self.value_col, self.ts_col]

    def make_actor(self, partition: int):
        return NdvStateActor.remote(partition, self.window_ms, self.p)

    def derive(self):
        return functools.partial(_add_window_idx, ts_col=self.ts_col,
                                 window_ms=self.window_ms)

    def precombine(self):
        return functools.partial(_hll_partials, col=self.value_col,
                                 window_ms=self.window_ms, p=self.p)
