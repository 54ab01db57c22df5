"""Streaming windowed aggregation: micro-batch epochs -> per-partition
window state -> watermark-triggered exactly-once emission.

North-rule component ("tumbling windows keyed by speaker/clip prefix with
event-time watermarks"): the batch operator (`streaming.windows` +
`stages.agg`) computes windows over a bounded table; THIS engine computes
the same result over an unbounded stream of micro-batches, emitting each
window exactly once — when the event-time watermark passes its end — and
committing per epoch through the 2PC sink with state snapshots for
crash/resume.

Topology per epoch (same skeleton as the stream-stream join engine):

1. SPLIT: one Ray task per row group hash-partitions its rows by the
   window KEY (speaker) and returns P objects + the partition max event
   time (``num_returns=P`` shuffle routing, no driver materialization).
2. ACCUMULATE: partition p's ``WindowStateActor`` assigns tumbling
   windows vectorized, folds the rows into its per-(key, window) partial
   state (sum/count/max — a combiner, so state size is O(open windows),
   not O(rows)).
3. EMIT: windows with ``window_end <= watermark`` finalize, are staged
   for the epoch (phase 1 of 2PC) and leave the state.
4. COMMIT: the driver commits the epoch with per-partition lineage
   metrics + state snapshots. A resumed run restores state and skips
   committed epochs; the final flush (watermark = +inf) drains all
   remaining windows and is itself a committed epoch.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .engine import _hash_partition
from .join_state import _serialize, _deserialize
from .sink import ExactlyOnceSink
from .watermark import WatermarkTracker


@ray.remote
def _split_by_key(path: str, row_group: int, num_partitions: int,
                  key: str, columns: List[str], ts_col: str):
    pf = pq.ParquetFile(path)
    tbl = pf.read_row_group(row_group, columns=columns)
    parts = _hash_partition(tbl[key].combine_chunks(), num_partitions)
    out = []
    for p in range(num_partitions):
        sub = tbl.filter(pa.array(parts == p))
        max_ms = int(pa.compute.max(sub[ts_col]).as_py()) if len(sub) else -1
        out.append((sub, max_ms))
    return tuple(out) if num_partitions > 1 else out[0]


@ray.remote
class WindowStateActor:
    """Per-partition tumbling-window partial state: one row per open
    (key, window_start) with combinable partials."""

    def __init__(self, partition: int, key: str, ts_col: str,
                 dur_col: str, window_ms: int):
        self.partition = partition
        self.key = key
        self.ts_col = ts_col
        self.dur_col = dur_col
        self.window_ms = window_ms
        self.state: Optional[pd.DataFrame] = None

    def _fold(self, df: pd.DataFrame) -> None:
        frames = [df] if self.state is None else [self.state, df]
        allf = pd.concat(frames, ignore_index=True)
        g = allf.groupby([self.key, "window_start"], sort=False)
        self.state = pd.DataFrame({
            "total_dur_ms": g["total_dur_ms"].sum(),
            "n_clips": g["n_clips"].sum(),
            "max_event_ms": g["max_event_ms"].max(),
        }).reset_index()

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        if tables:
            tbl = pa.concat_tables(tables)
            ts = tbl[self.ts_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
            start = (ts // self.window_ms) * self.window_ms
            df = pd.DataFrame({
                self.key: tbl[self.key].to_numpy(zero_copy_only=False),
                "window_start": start,
                "total_dur_ms": tbl[self.dur_col].to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "n_clips": np.ones(len(ts), dtype=np.int64),
                "max_event_ms": ts,
            })
            # standard watermark semantics: rows whose window is already
            # closed are LATE — dropped and counted, never re-emitted (a
            # closed window stays emitted exactly once)
            late_mask = (df["window_start"] + self.window_ms
                         <= watermark_ms) if watermark_ms >= 0 else \
                pd.Series(False, index=df.index)
            n_late = int(late_mask.sum())
            df = df[~late_mask]
            if len(df):
                # pre-combine the batch before folding into state
                g = df.groupby([self.key, "window_start"], sort=False)
                df = pd.DataFrame({
                    "total_dur_ms": g["total_dur_ms"].sum(),
                    "n_clips": g["n_clips"].sum(),
                    "max_event_ms": g["max_event_ms"].max(),
                }).reset_index()
                self._fold(df)
        else:
            n_late = 0

        emitted = pd.DataFrame()
        if self.state is not None and len(self.state):
            closed = self.state["window_start"] + self.window_ms <= watermark_ms
            if closed.any():
                emitted = self.state[closed].reset_index(drop=True)
                self.state = self.state[~closed].reset_index(drop=True)

        sink = ExactlyOnceSink(sink_dir)
        if len(emitted):
            stats = sink.stage(epoch, self.partition,
                               pa.Table.from_pandas(emitted,
                                                    preserve_index=False))
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms,
                      "late_dropped": n_late,
                      "open_windows": 0 if self.state is None
                      else len(self.state)})
        return stats

    def snapshot(self) -> Dict:
        return {"state": _serialize(self.state)}

    def restore(self, snap: Dict) -> None:
        self.state = _deserialize(snap.get("state"))


class StreamingWindowEngine:
    """Tumbling windowed aggregate over micro-batch epochs of the audio
    table, keyed by speaker, exactly-once, resumable."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, window_ms: int = 600_000,
                 allowed_lateness_ms: int = 60_000, key: str = "speaker",
                 ts_col: str = "event_ms", dur_col: str = "dur_ms"):
        self.input_path = input_path
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.rowgroups_per_epoch = rowgroups_per_epoch
        self.window_ms = window_ms
        self.allowed_lateness_ms = allowed_lateness_ms
        self.key = key
        self.ts_col = ts_col
        self.dur_col = dur_col
        self.sink = ExactlyOnceSink(out_dir)

    def plan_epochs(self) -> List[List[Dict]]:
        paths = []
        if os.path.isdir(self.input_path):
            for root, _d, files in os.walk(self.input_path):
                paths.extend(os.path.join(root, f)
                             for f in sorted(files) if f.endswith(".parquet"))
            paths.sort()
        else:
            paths = [self.input_path]
        tasks = []
        for p in paths:
            meta = pq.read_metadata(p)
            for rg in range(meta.num_row_groups):
                tasks.append({"path": p, "row_group": rg})
        return [tasks[i:i + self.rowgroups_per_epoch]
                for i in range(0, len(tasks), self.rowgroups_per_epoch)]

    def run(self, crash_after_stage_of_epoch: Optional[int] = None) -> Dict:
        P = self.num_partitions
        cols = [self.key, self.ts_col, self.dur_col]
        actors = [WindowStateActor.remote(
            p, self.key, self.ts_col, self.dur_col, self.window_ms)
            for p in range(P)]
        tracker = WatermarkTracker.remote(P, self.allowed_lateness_ms)

        committed = set(self.sink.committed_epochs())
        state = self.sink.latest_state()
        if state is not None:
            ray.get([actors[p].restore.remote(state["actors"][p])
                     for p in range(P)])
            ray.get(tracker.restore.remote(state["watermark"]))

        epochs = self.plan_epochs()
        total_rows = 0
        n_done = 0
        for epoch_id, tasks in enumerate(epochs):
            if epoch_id in committed:
                continue
            wm = ray.get(tracker.watermark.remote())
            split_refs = [
                _split_by_key.options(num_returns=P if P > 1 else 1).remote(
                    t["path"], t["row_group"], P, self.key, cols, self.ts_col)
                for t in tasks]
            per_part = ([split_refs] if P == 1 else
                        [[r[p] for r in split_refs] for p in range(P)])
            stats = ray.get([actors[p].ingest_and_stage.remote(
                epoch_id, per_part[p], wm, self.out_dir) for p in range(P)])
            for s in stats:
                ray.get(tracker.report.remote(s["partition"],
                                              s["max_event_ms"]))
            new_wm = ray.get(tracker.watermark.remote())
            if crash_after_stage_of_epoch == epoch_id:
                raise RuntimeError(
                    f"injected crash after staging epoch {epoch_id}")
            snaps = ray.get([a.snapshot.remote() for a in actors])
            wm_snap = ray.get(tracker.snapshot.remote())
            self.sink.commit(
                epoch_id,
                [{"partition": s["partition"], "rows": s["rows"],
                  "bytes": s["bytes"], "late_dropped": s["late_dropped"],
                  "open_windows": s["open_windows"]} for s in stats],
                new_wm, state_snapshots={"actors": snaps,
                                         "watermark": wm_snap})
            total_rows += sum(s["rows"] for s in stats)
            n_done += 1

        # final flush: +inf watermark closes every remaining window
        flush_epoch = len(epochs)
        if flush_epoch not in committed:
            stats = ray.get([actors[p].ingest_and_stage.remote(
                flush_epoch, [], 2 ** 62, self.out_dir) for p in range(P)])
            snaps = ray.get([a.snapshot.remote() for a in actors])
            wm_snap = ray.get(tracker.snapshot.remote())
            self.sink.commit(
                flush_epoch,
                [{"partition": s["partition"], "rows": s["rows"],
                  "bytes": s["bytes"],
                  "open_windows": s["open_windows"]} for s in stats],
                2 ** 62, state_snapshots={"actors": snaps,
                                          "watermark": wm_snap})
            total_rows += sum(s["rows"] for s in stats)
        for a in actors:
            ray.kill(a)
        ray.kill(tracker)
        return {"epochs_processed": n_done, "rows_emitted": total_rows,
                "committed_rows": self.sink.committed_row_count()}
