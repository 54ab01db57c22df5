"""Streaming changelog compaction (materialized-view maintenance):
micro-batch epochs of a keyed changelog -> per-partition latest-row
state -> the compacted snapshot emitted exactly-once at stream flush.

The streaming counterpart of the batch q95 composition: each key's
LATEST version (max (ts, version_id)) wins and tombstoned keys vanish.
Keep-max is ORDER-INDEPENDENT, so the committed snapshot equals the
batch result for any epoch arrival order — one SQL oracle covers both
(streaming ≡ batch).

Scale shape (on the shared ``MicroBatchEngine`` skeleton):
- rows hash-exchange on the key, so a key's versions always meet the
  same state partition;
- the split-task combiner keeps ONE row per key per chunk (vectorized
  sort + drop_duplicates), so shuffle volume is O(distinct keys per
  chunk), not O(rows) — the hot-key mitigation;
- per-partition state is one row per LIVE key (the compacted view
  itself), folded per epoch with the same vectorized keep-max kernel;
- intermediate epochs stage nothing (a later version may override), so
  emission happens once, in the flush epoch, through the same 2PC
  commit — crash/resume restores the state snapshot and never
  double-emits.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .sink import sink_for
from .window_engine import MicroBatchEngine

_FLUSH_WM = 2 ** 61  # watermark at/above this means "stream drained"


def _keep_latest(df: pd.DataFrame, key: str, order: List[str]
                 ) -> pd.DataFrame:
    """One row per key: the max-(order) row (vectorized; stable sort
    makes ties impossible when ``order`` ends in a unique version id)."""
    return df.sort_values(order, kind="mergesort") \
             .drop_duplicates([key], keep="last")


@ray.remote
class UpsertStateActor:
    """Per-partition latest-row state = the live compacted view."""

    def __init__(self, partition: int, key: str, order: List[str],
                 tombstone_col: str, tombstone_value):
        self.partition = partition
        self.key = key
        self.order = list(order)
        self.tombstone_col = tombstone_col
        self.tombstone_value = tombstone_value
        self.state: Optional[pd.DataFrame] = None

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        if tables:
            df = pa.concat_tables(tables).to_pandas()
            frames = [df] if self.state is None else [self.state, df]
            self.state = _keep_latest(pd.concat(frames, ignore_index=True),
                                      self.key, self.order)

        sink = sink_for(sink_dir)
        if watermark_ms >= _FLUSH_WM and self.state is not None \
                and len(self.state):
            # Kleene semantics to match the batch path (pc.not_equal ->
            # null -> filtered) and the SQL oracle (`<> 'error'`): a
            # NULL tombstone column DROPS the row; pandas `!=` alone
            # would keep it.
            tomb = self.state[self.tombstone_col]
            live = self.state[tomb.ne(self.tombstone_value) & tomb.notna()]
            live = live.drop(columns=["__ts_int__"], errors="ignore")
            out = pa.Table.from_pandas(live.reset_index(drop=True),
                                       preserve_index=False)
            stats = sink.stage(epoch, self.partition, out)
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms,
                      "live_keys": 0 if self.state is None
                      else len(self.state)})
        return stats

    def snapshot(self) -> Dict:
        from .join_state import _serialize
        return {"state": _serialize(self.state)}

    def restore(self, snap: Dict) -> None:
        from .join_state import _deserialize
        self.state = _deserialize(snap.get("state"))


class StreamingUpsertEngine(MicroBatchEngine):
    """Changelog stream -> exactly-once compacted snapshot."""

    def __init__(self, input_path: str, out_dir: str,
                 num_partitions: int = 4, rowgroups_per_epoch: int = 2,
                 key: str = "user_id", ts_col: str = "ts",
                 version_col: str = "event_id",
                 payload_cols: Optional[List[str]] = None,
                 tombstone_col: str = "event_type",
                 tombstone_value="error"):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms=0,
                         key=key, ts_col="__ts_int__")
        self.raw_ts_col = ts_col
        self.version_col = version_col
        self.payload_cols = payload_cols or []
        self.tombstone_col = tombstone_col
        self.tombstone_value = tombstone_value

    def columns(self) -> List[str]:
        cols = [self.key, self.raw_ts_col, self.version_col,
                self.tombstone_col] + self.payload_cols
        return list(dict.fromkeys(cols))

    def derive(self):
        raw = self.raw_ts_col

        def fn(tbl: pa.Table) -> pa.Table:
            # timestamp columns cast to their epoch integer (unit
            # preserved: us stays us); plain ints pass through — only
            # ORDER matters for keep-max, not the unit
            as_int = pa.compute.cast(tbl[raw], pa.int64())
            return tbl.append_column("__ts_int__", as_int)
        return fn

    def precombine(self):
        key, order = self.key, ["__ts_int__", self.version_col]

        def fn(tbl: pa.Table) -> pa.Table:
            df = _keep_latest(tbl.to_pandas(), key, order)
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    def make_actor(self, partition: int):
        return UpsertStateActor.remote(
            partition, self.key, ["__ts_int__", self.version_col],
            self.tombstone_col, self.tombstone_value)

    def read_snapshot(self):
        """The CURRENT compacted view = the newest committed flush
        epoch's files ONLY. Each run of a GROWN changelog commits a new
        complete snapshot under a new flush-epoch id (state persists
        across flushes, so the newest snapshot folds everything);
        earlier snapshots stay in the sink as history but must not be
        unioned with the newest — use this reader, not the sink's raw
        ``read_output``, for the live table."""
        import os

        import ray.data
        # a compact() re-keys entries but records the covered ids in
        # "compacted_from" (flush epochs are never merged with others,
        # so the newest flush's files stay in their own directory whose
        # key is the flush id itself)
        flushes = []
        for e in self.sink.read_manifest()["epochs"]:
            covered = e.get("compacted_from", [e["epoch"]])
            if any(c >= self.FLUSH_BASE for c in covered):
                flushes.append(e["epoch"])
        if not flushes:
            return ray.data.from_items([])
        newest = max(flushes)
        d = os.path.join(self.sink.data_dir, f"epoch={newest}")
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.startswith("part-") and f.endswith(".parquet")] \
            if os.path.isdir(d) else []
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files, partitioning=None)
