"""Per-partition hash state store for the stateful stream-stream join.

North-rule component (no reference equivalent — the reference ``join``
processor at ``dataflows/processors/join.py:174-392`` is a batch build/
probe; this generalizes it to two unbounded streams): clip and transcript
substreams are hash-partitioned on ``clip_id``; each partition's state
lives in one actor holding Arrow-backed buffers (a changelog of
not-yet-matched rows per side). On every micro-batch the actor:

1. appends the incoming rows of each side to its buffer;
2. emits inner-join matches (clip + transcript for the same clip_id) and
   removes the matched rows from both buffers;
3. on watermark advance, expires buffered rows whose event time is below
   the watermark — unmatched expired rows are emitted null-padded when
   ``emit_unmatched`` (outer-join semantics) else dropped — which bounds
   state size.

Matching is vectorized (pandas merge on the buffered frames), not a
Python row loop. Raw actors are justified here: the state must persist
ACROSS micro-batches, which stateless ``map_batches`` / ``map_groups``
cannot express (the documented Dataset-API exception).

State checkpointing: ``snapshot()`` returns the buffers as Arrow IPC
bytes; the engine persists them per epoch so a resumed run restores the
exact state (exactly-once together with the 2PC sink).
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _serialize(df: Optional[pd.DataFrame]) -> Optional[bytes]:
    if df is None or df.empty:
        return None
    sink = io.BytesIO()
    table = pa.Table.from_pandas(df, preserve_index=False)
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def _deserialize(raw: Optional[bytes]) -> Optional[pd.DataFrame]:
    if raw is None:
        return None
    with pa.ipc.open_stream(io.BytesIO(raw)) as r:
        return r.read_all().to_pandas()


@ray.remote
class JoinStateActor:
    """One hash partition of the stream-stream join state."""

    def __init__(self, partition: int, key: str = "clip_id",
                 left_ts: str = "event_ms", right_ts: str = "event_ms",
                 emit_unmatched: bool = False):
        self.partition = partition
        self.key = key
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.emit_unmatched = emit_unmatched
        self.left_buf: Optional[pd.DataFrame] = None
        self.right_buf: Optional[pd.DataFrame] = None
        self.left_cols: Optional[List[str]] = None
        self.right_cols: Optional[List[str]] = None

    def _append(self, buf: Optional[pd.DataFrame], df: pd.DataFrame) -> pd.DataFrame:
        if df is None or df.empty:
            return buf
        return df if buf is None else pd.concat([buf, df], ignore_index=True)

    def process(self, left: Optional[pa.Table], right: Optional[pa.Table],
                watermark_ms: int) -> Tuple[bytes, Dict]:
        """Ingest one micro-batch for this partition; return (joined rows
        as Arrow IPC bytes, metrics dict)."""
        df, metrics = self._process(left, right, watermark_ms)
        return _serialize(df), metrics

    def _canonical_columns(self) -> Optional[List[str]]:
        if self.left_cols is None or self.right_cols is None:
            return None
        out = list(self.left_cols)
        for c in self.right_cols:
            if c == self.key:
                continue
            out.append(f"{c}_r" if c in self.left_cols else c)
        return out

    def _process(self, left: Optional[pa.Table], right: Optional[pa.Table],
                 watermark_ms: int) -> Tuple[pd.DataFrame, Dict]:
        if left is not None and len(left):
            if self.left_cols is None:
                self.left_cols = list(left.column_names)
            self.left_buf = self._append(self.left_buf, left.to_pandas())
        if right is not None and len(right):
            if self.right_cols is None:
                self.right_cols = list(right.column_names)
            self.right_buf = self._append(self.right_buf, right.to_pandas())

        out_frames: List[pd.DataFrame] = []
        n_matched = 0
        if self.left_buf is not None and self.right_buf is not None \
                and not self.left_buf.empty and not self.right_buf.empty:
            matched = self.left_buf.merge(
                self.right_buf, on=self.key, how="inner",
                suffixes=("", "_r"))
            if not matched.empty:
                n_matched = len(matched)
                out_frames.append(matched)
                matched_keys = set(matched[self.key])
                self.left_buf = self.left_buf[
                    ~self.left_buf[self.key].isin(matched_keys)]
                self.right_buf = self.right_buf[
                    ~self.right_buf[self.key].isin(matched_keys)]

        n_expired = 0
        if watermark_ms >= 0:
            for side, ts_col in (("left_buf", self.left_ts),
                                 ("right_buf", self.right_ts)):
                buf = getattr(self, side)
                if buf is None or buf.empty:
                    continue
                expired_mask = buf[ts_col] < watermark_ms
                if expired_mask.any():
                    expired = buf[expired_mask]
                    n_expired += len(expired)
                    if self.emit_unmatched:
                        out_frames.append(expired)
                    setattr(self, side, buf[~expired_mask])

        metrics = {
            "partition": self.partition,
            "matched": n_matched,
            "expired": n_expired,
            "left_state": 0 if self.left_buf is None else len(self.left_buf),
            "right_state": 0 if self.right_buf is None else len(self.right_buf),
        }
        if out_frames:
            out = pd.concat(out_frames, ignore_index=True)
        else:
            out = pd.DataFrame()
        canon = self._canonical_columns()
        if canon is not None and not out.empty:
            out = out.reindex(columns=canon)
        return out, metrics

    def process_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                          sink_dir: str) -> Dict:
        """Engine entry point: ingest this partition's split objects for one
        epoch, join/expire against the watermark, and STAGE the output
        parquet (phase 1 of the 2PC sink). Returns lineage metrics."""
        from .sink import ExactlyOnceSink

        tuples = ray.get(list(refs)) if refs else []
        lefts = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        rights = [t[1] for t in tuples if t[1] is not None and len(t[1])]
        max_ms = max([t[2] for t in tuples], default=-1)
        left = pa.concat_tables(lefts) if lefts else None
        right = pa.concat_tables(rights) if rights else None
        out, metrics = self._process(left, right, watermark_ms)
        sink = ExactlyOnceSink(sink_dir)
        if not out.empty:
            table = pa.Table.from_pandas(out, preserve_index=False)
            stats = sink.stage(epoch, self.partition, table)
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        metrics.update(stats)
        metrics["max_event_ms"] = max_ms
        return metrics

    # -- state checkpoint --------------------------------------------------
    def snapshot(self) -> Dict:
        return {"left": _serialize(self.left_buf),
                "right": _serialize(self.right_buf),
                "left_cols": self.left_cols, "right_cols": self.right_cols}

    def restore(self, snap: Dict) -> None:
        self.left_buf = _deserialize(snap.get("left"))
        self.right_buf = _deserialize(snap.get("right"))
        self.left_cols = snap.get("left_cols")
        self.right_cols = snap.get("right_cols")

    def state_sizes(self) -> Tuple[int, int]:
        return (0 if self.left_buf is None else len(self.left_buf),
                0 if self.right_buf is None else len(self.right_buf))
