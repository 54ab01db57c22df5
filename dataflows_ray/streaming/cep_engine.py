"""Streaming CEP: "A followed by B within T" sequence detection over
micro-batch epochs with event-time watermarks and exactly-once pair
emission.

The batch operator (``stages.setops.detect_sequence``) computes the
pattern over a bounded table via the range-join exchange; THIS engine
computes the same pairs over an unbounded stream (the north star's
"structured-streaming / CEP engine" component):

- Per-partition state = the in-flight pattern buffers: A events still
  matchable by a future B (``ts_a + within > watermark``) and B events
  not yet finalizable (``ts_b > watermark``).
- A B event finalizes when the watermark passes its timestamp — at that
  point every matching A (``ts_a <= ts_b``) with bounded disorder has
  arrived — and is matched against the A buffer with the same per-key
  ``searchsorted`` window kernel the batch range join uses. Each B
  finalizes exactly once, so each (A, B) pair is emitted exactly once.
- A events expire from state when no future B can match them; A events
  ARRIVING already-expired are late (dropped + counted). Output parity
  with the batch operator holds whenever per-partition disorder <=
  allowed_lateness.

Runs on the shared ``MicroBatchEngine`` epoch loop (split -> stateful
actors -> 2PC sink commit with state snapshots, crash/resume).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .join_state import _serialize, _deserialize
from .sink import sink_for
from .window_engine import MicroBatchEngine


def _match_pairs(a: pd.DataFrame, b: pd.DataFrame, within: int,
                 ) -> pd.DataFrame:
    """All (a, b) row pairs with equal ``__key__`` and
    ``ts_a <= ts_b <= ts_a + within``. Both frames sorted by
    (__key__, ts) first; per-key contiguous slices matched with two
    vectorized ``searchsorted`` calls per key group (loop count = number
    of distinct keys in the B side, not rows) — same kernel shape as
    ``stages.rangejoin``."""
    if len(a) == 0 or len(b) == 0:
        return pd.DataFrame({"a_idx": np.empty(0, dtype=np.int64),
                             "b_idx": np.empty(0, dtype=np.int64)})
    a = a.sort_values(["__key__", "__ts__"], kind="mergesort")
    b = b.sort_values(["__key__", "__ts__"], kind="mergesort")
    ak = a["__key__"].to_numpy()
    bk = b["__key__"].to_numpy()
    a_ts = a["__ts__"].to_numpy()
    b_ts = b["__ts__"].to_numpy()
    a_starts = np.flatnonzero(np.concatenate([[True], ak[1:] != ak[:-1]]))
    a_ends = np.append(a_starts[1:], len(a))
    a_slice = {ak[s]: (s, e) for s, e in zip(a_starts, a_ends)}
    b_starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
    b_ends = np.append(b_starts[1:], len(b))
    lo = np.zeros(len(b), dtype=np.int64)
    hi = np.zeros(len(b), dtype=np.int64)
    for bs, be in zip(b_starts, b_ends):
        sl = a_slice.get(bk[bs])
        if sl is None:
            continue
        s, e = sl
        lo[bs:be] = s + np.searchsorted(a_ts[s:e], b_ts[bs:be] - within,
                                        side="left")
        hi[bs:be] = s + np.searchsorted(a_ts[s:e], b_ts[bs:be],
                                        side="right")
    counts = np.maximum(hi - lo, 0)
    b_take = np.repeat(np.arange(len(b)), counts)
    a_take = (np.repeat(lo, counts)
              + (np.arange(counts.sum())
                 - np.repeat(np.cumsum(counts) - counts, counts)))
    return pd.DataFrame({
        "a_idx": a.index.to_numpy()[a_take],
        "b_idx": b.index.to_numpy()[b_take]})


@ray.remote
class CepStateActor:
    """Per-partition sequence-pattern state: pending A and B event
    buffers keyed by the partition key, matched and pruned against the
    watermark each epoch."""

    def __init__(self, partition: int, key: str, ts_col: str,
                 type_col: str, id_col: str, first_type, second_type,
                 within: int):
        self.partition = partition
        self.key = key
        self.ts_col = ts_col
        self.type_col = type_col
        self.id_col = id_col
        self.first_type = first_type
        self.second_type = second_type
        self.within = within
        self.a: Optional[pd.DataFrame] = None  # __key__, __ts__, __id__
        self.b: Optional[pd.DataFrame] = None

    def _frame(self, tbl: pa.Table, mask: np.ndarray) -> pd.DataFrame:
        return pd.DataFrame({
            "__key__": tbl[self.key].to_numpy(zero_copy_only=False)[mask],
            "__ts__": tbl[self.ts_col].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask],
            "__id__": tbl[self.id_col].to_numpy(
                zero_copy_only=False)[mask],
        })

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        n_late = 0
        if tables:
            tbl = pa.concat_tables(tables)
            types = tbl[self.type_col].to_numpy(zero_copy_only=False)
            ts = tbl[self.ts_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
            is_a = types == self.first_type
            # an arriving A that no future B can match is late
            if watermark_ms >= 0:
                a_late = is_a & (ts + self.within <= watermark_ms)
                n_late = int(a_late.sum())
                is_a &= ~a_late
            new_a = self._frame(tbl, is_a)
            new_b = self._frame(tbl, types == self.second_type)
            self.a = pd.concat([f for f in (self.a, new_a) if f is not None
                                and len(f)], ignore_index=True) \
                if len(new_a) else self.a
            self.b = pd.concat([f for f in (self.b, new_b) if f is not None
                                and len(f)], ignore_index=True) \
                if len(new_b) else self.b

        emitted = pd.DataFrame()
        if self.b is not None and len(self.b):
            final = self.b["__ts__"] <= watermark_ms
            fb = self.b[final].reset_index(drop=True)
            self.b = self.b[~final].reset_index(drop=True)
            if len(fb) and self.a is not None and len(self.a):
                a = self.a.reset_index(drop=True)
                pairs = _match_pairs(a, fb, self.within)
                if len(pairs):
                    emitted = pd.DataFrame({
                        self.id_col: a["__id__"].to_numpy()[pairs["a_idx"]],
                        self.key: a["__key__"].to_numpy()[pairs["a_idx"]],
                        self.ts_col: a["__ts__"].to_numpy()[pairs["a_idx"]],
                        self.id_col + "_r":
                            fb["__id__"].to_numpy()[pairs["b_idx"]],
                        self.ts_col + "_r":
                            fb["__ts__"].to_numpy()[pairs["b_idx"]],
                    })
        # expire A events no future B can match (AFTER matching this
        # epoch's finalized Bs, which may reach further back)
        if self.a is not None and len(self.a):
            keep = self.a["__ts__"] + self.within > watermark_ms
            self.a = self.a[keep].reset_index(drop=True)

        sink = sink_for(sink_dir)
        if len(emitted):
            stats = sink.stage(epoch, self.partition,
                               pa.Table.from_pandas(emitted,
                                                    preserve_index=False))
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms, "late_dropped": n_late,
                      "pending_a": 0 if self.a is None else len(self.a),
                      "pending_b": 0 if self.b is None else len(self.b)})
        return stats

    def snapshot(self) -> Dict:
        return {"a": _serialize(self.a), "b": _serialize(self.b)}

    def restore(self, snap: Dict) -> None:
        self.a = _deserialize(snap.get("a"))
        self.b = _deserialize(snap.get("b"))


class StreamingCepEngine(MicroBatchEngine):
    """"A followed by B within T" over micro-batch epochs, keyed,
    exactly-once, resumable — the streaming counterpart of the batch
    ``detect_sequence`` operator. Timestamps are integer event time
    (any unit, ``within`` in the same unit)."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, *, key: str, ts_col: str,
                 type_col: str, id_col: str, first_type, second_type,
                 within: int, allowed_lateness_ms: int = 60_000):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms, key,
                         ts_col)
        self.type_col = type_col
        self.id_col = id_col
        self.first_type = first_type
        self.second_type = second_type
        self.within = within

    def columns(self) -> List[str]:
        return [self.key, self.ts_col, self.type_col, self.id_col]

    def make_actor(self, partition: int):
        return CepStateActor.remote(partition, self.key, self.ts_col,
                                    self.type_col, self.id_col,
                                    self.first_type, self.second_type,
                                    self.within)
