"""Streaming windowed aggregation: micro-batch epochs -> per-partition
window state -> watermark-triggered exactly-once emission.

North-rule component ("tumbling/sliding/session windows keyed by
speaker/clip prefix with event-time watermarks"): the batch operators
(`streaming.windows` + `stages.agg`) compute windows over a bounded
table; the engines here compute the same result over an unbounded stream
of micro-batches, emitting each window exactly once — when the
event-time watermark passes its end — and committing per epoch through
the 2PC sink with state snapshots for crash/resume.

Shared topology per epoch (``MicroBatchEngine``, also used by the CEP
engine in ``cep_engine.py``; same skeleton as the stream-stream join
engine in ``engine.py``):

1. SPLIT: one Ray task per row group hash-partitions its rows by the
   stream KEY and returns P objects + the partition max event time
   (``num_returns=P`` shuffle routing, no driver materialization).
2. ACCUMULATE: partition p's state actor folds its rows into per-key
   operator state (a combiner — state size is O(open windows / open
   sessions / in-flight events), not O(rows)).
3. EMIT: results finalized by the current watermark are staged for the
   epoch (phase 1 of 2PC) and leave the state.
4. COMMIT: the driver commits the epoch with per-partition lineage
   metrics + state snapshots. A resumed run restores state and skips
   committed epochs; the final flush (watermark = +inf) drains all
   remaining state and is itself a committed epoch.

Late data: each actor counts and drops rows that can only belong to
already-emitted results (``late_dropped`` in the lineage metrics) —
standard watermark semantics: output parity with the batch operator
holds whenever per-partition disorder <= allowed_lateness (an in-order
stream is always exact).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .join_state import _serialize, _deserialize
from .sink import ExactlyOnceSink, sink_for
from .watermark import WatermarkTracker
from ..core.strhash import hash_string_array


def _hash_partition(keys: pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic hash partitioning of a string key column — fully
    vectorized over the Arrow buffers (``core.strhash``), no Python per
    row, stable across processes (unlike Python's seeded ``hash()``)."""
    return (hash_string_array(keys)
            % np.uint64(num_partitions)).astype(np.int64)


def _partition_on(keys: pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Hash-partition a key column of any type: strings through the
    vectorized Arrow-buffer hash, integers directly."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
        return _hash_partition(keys, num_partitions)
    vals = keys.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.abs(vals) % num_partitions


@ray.remote
def _split_by_key(path: str, row_group: int, num_partitions: int,
                  key: str, columns: List[str], ts_col: str,
                  precombine=None, derive=None):
    """Split one row group by key hash. ``precombine`` (optional) is the
    engine's COMBINER: applied per partition chunk BEFORE the exchange,
    it collapses rows into combinable partials (per-window sums, merged
    session intervals), so shuffle volume and hot-key state-actor load
    scale with O(open windows / sessions) per chunk — not O(rows). This
    is the salted-repartition alternative for skewed keys: a hot key's
    rows are reduced in every split task in parallel; only tiny partials
    converge on its state partition. Watermarks are computed on the RAW
    event times before combining.

    ``derive`` (optional) maps the raw table to one with derived columns
    BEFORE partitioning — for engines whose partition key is computed
    (e.g. the dedup engine's content hash), not a file column.

    ``row_group`` is an epoch-unit descriptor: an int (parquet row
    group) or a dict from ``sources.lance_io.plan_stream_epochs`` (a
    Lance fragment when the library is present)."""
    from ..sources.lance_io import read_stream_unit
    if isinstance(row_group, dict):
        tbl = read_stream_unit(row_group, columns=columns)
    else:
        pf = pq.ParquetFile(path)
        tbl = pf.read_row_group(row_group, columns=columns)
    if derive is not None:
        tbl = derive(tbl)
    parts = _partition_on(tbl[key], num_partitions)
    out = []
    for p in range(num_partitions):
        sub = tbl.filter(pa.array(parts == p))
        # pc.max of an all-null column is a null scalar (None) — rows
        # with no event time contribute nothing to the watermark
        m = pa.compute.max(sub[ts_col]).as_py() if len(sub) else None
        max_ms = -1 if m is None else int(m)
        if precombine is not None and len(sub):
            sub = precombine(sub)
        out.append((sub, max_ms))
    return tuple(out) if num_partitions > 1 else out[0]


def plan_pending_epochs(input_path: str, units_per_epoch: int,
                        manifest_epochs: List[Dict]):
    """Plan the UNCOMMITTED epochs over a possibly-grown input.

    Committed data-epoch manifest entries record ``n_units`` (how many
    source units each consumed), so new epochs are chunked from the
    uncommitted unit SUFFIX with fresh ids. Positional re-chunking —
    the pre-round-5 scheme — silently dropped units that the grown
    chunking re-assigned into an already-committed epoch id (e.g.
    rowgroups_per_epoch=2 over 5 units commits epoch 2 = [unit4];
    appending 2 units re-chunks epoch 2 to [unit4, unit5], and unit5
    was never processed by any run).

    Manifests whose data epochs lack ``n_units`` (pre-fix commits) fall
    back to positional chunking — exactly the old behavior, correct for
    unchanged inputs. Returns ``(pending, flush_epoch_id)`` where
    ``pending`` is ``[(epoch_id, unit_tasks)]`` for uncommitted data
    epochs in order.
    """
    from ..sources.lance_io import plan_stream_units
    units = plan_stream_units(input_path)
    u = units_per_epoch
    flush_epoch = MicroBatchEngine.FLUSH_BASE + len(units)
    data_entries = [e for e in manifest_epochs
                    if e["epoch"] < MicroBatchEngine.FLUSH_BASE]
    committed_ids = {x for e in data_entries
                     for x in e.get("compacted_from", [e["epoch"]])}
    if data_entries and all(isinstance(e.get("n_units"), int)
                            for e in data_entries):
        consumed = min(sum(e["n_units"] for e in data_entries), len(units))
        next_id = max(committed_ids) + 1
        tail = units[consumed:]
        pending = [(next_id + j, tail[j * u:(j + 1) * u])
                   for j in range(-(-len(tail) // u))]
    else:
        chunks = [units[i:i + u] for i in range(0, len(units), u)]
        pending = [(eid, tasks) for eid, tasks in enumerate(chunks)
                   if eid not in committed_ids]
    return pending, flush_epoch


class MicroBatchEngine:
    """Shared micro-batch epoch loop: plan epochs from parquet row
    groups, split by key hash, feed per-partition state actors,
    watermark-gated emission, 2PC commit with state snapshots, resume.

    Subclasses define ``columns()`` (what the split reads) and
    ``make_actor(p)`` (the per-partition state actor); the actor
    protocol is ``ingest_and_stage(epoch, refs, watermark, sink_dir) ->
    stats dict`` (must include ``max_event_ms``), ``snapshot()``,
    ``restore(snap)``.
    """

    # flush epochs commit in their own id range so data epochs of a
    # grown input can never collide with an earlier run's flush
    FLUSH_BASE = 1 << 40

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2,
                 allowed_lateness_ms: int = 60_000,
                 key: str = "speaker", ts_col: str = "event_ms"):
        self.input_path = input_path
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.rowgroups_per_epoch = rowgroups_per_epoch
        self.allowed_lateness_ms = allowed_lateness_ms
        self.key = key
        self.ts_col = ts_col
        self.sink = ExactlyOnceSink(out_dir)

    # -- subclass hooks ----------------------------------------------------
    def columns(self) -> List[str]:
        raise NotImplementedError

    def make_actor(self, partition: int):
        raise NotImplementedError

    def precombine(self):
        """Optional combiner applied to each partition chunk inside the
        split task (see ``_split_by_key``); None = ship raw rows."""
        return None

    def derive(self):
        """Optional derived-column map applied to the raw row group
        before partitioning (see ``_split_by_key``); None = raw table."""
        return None

    # -- epoch planning ----------------------------------------------------
    def plan_epochs(self) -> List[List[Dict]]:
        """Epoch units are parquet row groups, or Lance fragments when
        the input is a Lance dataset (``sources.lance_io``)."""
        from ..sources.lance_io import plan_stream_epochs
        return plan_stream_epochs(self.input_path, self.rowgroups_per_epoch)

    # -- run loop ----------------------------------------------------------
    @staticmethod
    def _lineage(stats: List[Dict]) -> List[Dict]:
        return [{k: v for k, v in s.items() if k != "max_event_ms"}
                for s in stats]

    # split tasks for this many epochs ahead run concurrently with the
    # current epoch's ingest + the previous epoch's commit (object-store
    # footprint: PREFETCH x rowgroups_per_epoch x combined-partial size)
    PREFETCH_EPOCHS = int(os.environ.get("STREAM_PREFETCH_EPOCHS", "2"))

    def _launch_split(self, tasks: List[Dict], P: int, cols) -> List:
        """Launch the SPLIT tasks for one epoch (overridable: the join
        engine substitutes its two-substream splitter)."""
        return [
            _split_by_key.options(num_returns=P if P > 1 else 1).remote(
                t["path"], t, P, self.key, cols,
                self.ts_col, self.precombine(), self.derive())
            for t in tasks]

    def plan_pending(self, manifest_epochs: List[Dict]):
        """Plan the uncommitted epochs (overridable: the two-source join
        engine zips units from both of its inputs)."""
        return plan_pending_epochs(
            self.input_path, self.rowgroups_per_epoch, manifest_epochs)

    @staticmethod
    def _n_units(tasks) -> object:
        """Source-unit consumption recorded with each epoch's commit
        (overridable: multi-source engines record a per-source list)."""
        return len(tasks)

    def run(self, crash_after_stage_of_epoch: Optional[int] = None,
            max_epochs: Optional[int] = None) -> Dict:
        """Process all (or ``max_epochs``) uncommitted epochs; returns
        metrics. ``crash_after_stage_of_epoch``: test hook — raise after
        phase 1 of that epoch, before commit, to exercise exactly-once
        recovery. With ``max_epochs`` set the final flush is skipped
        (the stream is treated as still open)."""
        P = self.num_partitions
        cols = self.columns()
        actors = [self.make_actor(p) for p in range(P)]
        tracker = WatermarkTracker.remote(P, self.allowed_lateness_ms)
        try:
            return self._run(P, cols, actors, tracker,
                             crash_after_stage_of_epoch, max_epochs)
        finally:
            # kill on EVERY exit (incl. injected crashes / errors): a
            # driver that catches and re-runs must not leak P+1 actors
            # holding buffered Arrow state per failed attempt
            for a in actors:
                ray.kill(a)
            ray.kill(tracker)

    def _run(self, P, cols, actors, tracker,
             crash_after_stage_of_epoch, max_epochs=None) -> Dict:
        manifest_epochs = self.sink.read_manifest()["epochs"]
        committed = {x for e in manifest_epochs
                     for x in e.get("compacted_from", [e["epoch"]])}
        state = self.sink.latest_state()
        if state is not None:
            if len(state["actors"]) != P:
                raise ValueError(
                    f"resume with num_partitions={P} but the committed "
                    f"snapshot has {len(state['actors'])} partitions — "
                    "state is hash-partitioned; resume with the same "
                    "num_partitions")
            ray.get([actors[p].restore.remote(state["actors"][p])
                     for p in range(P)])
            ray.get(tracker.restore.remote(state["watermark"]))

        pending, flush_epoch = self.plan_pending(manifest_epochs)
        if max_epochs is not None:
            pending = pending[:max_epochs]
        total_rows = 0
        n_done = 0

        # ---- pipelined epoch loop -----------------------------------
        # Overlap without changing exactly-once semantics:
        # - SPLIT tasks (pure functions of the input files) are launched
        #   PREFETCH_EPOCHS ahead, so reads/combines run while the state
        #   actors ingest the current epoch;
        # - epoch N's COMMIT (driver-side manifest/snapshot write) is
        #   DEFERRED until after epoch N+1's ingest has been submitted,
        #   overlapping it with remote compute. Correctness: snapshot(N)
        #   is submitted to each actor BEFORE ingest(N+1) — per-caller
        #   FIFO actor ordering guarantees the snapshot captures
        #   post-N/pre-N+1 state — and a crash between commit(N) and
        #   commit(N+1) resumes from N's snapshot and replays N+1's
        #   idempotent staging, exactly as in the serial loop.
        inflight: Dict[int, List] = {}
        for j in range(min(self.PREFETCH_EPOCHS + 1, len(pending))):
            inflight[j] = self._launch_split(pending[j][1], P, cols)

        deferred = None  # (epoch_id, n_units, stats, snaps, wm_snap, wm)
        for i, (epoch_id, tasks) in enumerate(pending):
            split_refs = inflight.pop(i)
            nxt = i + self.PREFETCH_EPOCHS + 1
            if nxt < len(pending):
                inflight[nxt] = self._launch_split(pending[nxt][1], P, cols)
            per_part = ([split_refs] if P == 1 else
                        [[r[p] for r in split_refs] for p in range(P)])
            wm = ray.get(tracker.watermark.remote())
            stage_refs = [actors[p].ingest_and_stage.remote(
                epoch_id, per_part[p], wm, self.out_dir) for p in range(P)]
            if deferred is not None:  # commit N-1 while N ingests
                d_eid, d_nu, d_stats, d_snaps, d_wm_snap, d_wm = deferred
                self.sink.commit(
                    d_eid, self._lineage(d_stats), d_wm,
                    state_snapshots={"actors": ray.get(d_snaps),
                                     "watermark": ray.get(d_wm_snap)},
                    n_units=d_nu)
                total_rows += sum(s["rows"] for s in d_stats)
                n_done += 1
                deferred = None
            stats = ray.get(stage_refs)
            ray.get([tracker.report.remote(s["partition"],
                                           s["max_event_ms"])
                     for s in stats])
            new_wm = ray.get(tracker.watermark.remote())
            if crash_after_stage_of_epoch == epoch_id:
                raise RuntimeError(
                    f"injected crash after staging epoch {epoch_id}")
            snap_refs = [a.snapshot.remote() for a in actors]
            wm_snap_ref = tracker.snapshot.remote()
            deferred = (epoch_id, self._n_units(tasks), stats, snap_refs,
                        wm_snap_ref, new_wm)
        if deferred is not None:
            d_eid, d_nu, d_stats, d_snaps, d_wm_snap, d_wm = deferred
            self.sink.commit(d_eid, self._lineage(d_stats), d_wm,
                             state_snapshots={"actors": ray.get(d_snaps),
                                              "watermark": ray.get(d_wm_snap)},
                             n_units=d_nu)
            total_rows += sum(s["rows"] for s in d_stats)
            n_done += 1

        # final flush: +inf watermark drains all remaining state. The
        # flush id lives in its own range (FLUSH_BASE + #units) so a
        # GROWN input's new data epochs can never collide with a
        # previously committed flush — appended files become new epochs
        # on the next run and only they are processed (incremental
        # backfill; exact for engines whose state survives the flush —
        # map/dedup. A windowed engine re-run after its final flush
        # treats post-flush data as a fresh stream for still-open
        # windows). With max_epochs the stream is still OPEN: buffered
        # state must survive for the next run, so no flush.
        if max_epochs is None and flush_epoch not in committed:
            stats = ray.get([actors[p].ingest_and_stage.remote(
                flush_epoch, [], 2 ** 62, self.out_dir) for p in range(P)])
            snaps = ray.get([a.snapshot.remote() for a in actors])
            wm_snap = ray.get(tracker.snapshot.remote())
            self.sink.commit(flush_epoch, self._lineage(stats), 2 ** 62,
                             state_snapshots={"actors": snaps,
                                              "watermark": wm_snap})
            total_rows += sum(s["rows"] for s in stats)
        return {"epochs_processed": n_done, "rows_emitted": total_rows,
                "committed_rows": self.sink.committed_row_count()}


def _window_partials(tbl: pa.Table, key: str, ts_col: str, dur_col: str,
                     window_ms: int) -> pa.Table:
    """Combiner for tumbling windows: raw rows -> one combinable partial
    per (key, window_start) present in the chunk."""
    ts = tbl[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame({
        key: tbl[key].to_numpy(zero_copy_only=False),
        "window_start": (ts // window_ms) * window_ms,
        "total_dur_ms": tbl[dur_col].to_numpy(
            zero_copy_only=False).astype(np.int64),
        "n_clips": np.ones(len(ts), dtype=np.int64),
        "max_event_ms": ts,
    })
    g = df.groupby([key, "window_start"], sort=False)
    out = pd.DataFrame({
        "total_dur_ms": g["total_dur_ms"].sum(),
        "n_clips": g["n_clips"].sum(),
        "max_event_ms": g["max_event_ms"].max(),
    }).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
class WindowStateActor:
    """Per-partition tumbling-window state: one row per open
    (key, window_start). Receives COMBINED partials from the split tasks
    (see ``_window_partials``) and folds them in — hot-key load on this
    actor is O(open windows), not O(rows)."""

    def __init__(self, partition: int, key: str, window_ms: int):
        self.partition = partition
        self.key = key
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
            df = pa.concat_tables(tables).to_pandas()
            # standard watermark semantics: partials whose window is
            # already closed are LATE — dropped and counted (row-weighted
            # by n_clips), never re-emitted (a closed window stays
            # emitted exactly once)
            late_mask = (df["window_start"] + self.window_ms
                         <= watermark_ms) if watermark_ms >= 0 else \
                pd.Series(False, index=df.index)
            n_late = int(df.loc[late_mask, "n_clips"].sum())
            late_df = df[late_mask].reset_index(drop=True)
            df = df[~late_mask]
            if len(df):
                self._fold(df)
        else:
            n_late = 0
            late_df = pd.DataFrame()

        emitted = pd.DataFrame()
        if self.state is not None and len(self.state):
            closed = self.state["window_start"] + self.window_ms <= watermark_ms
            if closed.any():
                emitted = self.state[closed].reset_index(drop=True)
                self.state = self.state[~closed].reset_index(drop=True)

        sink = sink_for(sink_dir)
        if len(emitted):
            stats = sink.stage(epoch, self.partition,
                               pa.Table.from_pandas(emitted,
                                                    preserve_index=False))
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        if len(late_df):
            # dead-letter side output: late partials ride the SAME 2PC
            # commit as the main stream (exactly-once, resume-safe) so a
            # downstream backfill/audit can consume them — dropped rows
            # are counted AND kept, never silently lost
            sink.stage_side(epoch, self.partition,
                            pa.Table.from_pandas(late_df,
                                                 preserve_index=False))
        stats.update({"max_event_ms": max_ms,
                      "late_dropped": n_late,
                      "open_windows": 0 if self.state is None
                      else len(self.state)})
        return stats

    def snapshot(self) -> Dict:
        return {"state": _serialize(self.state)}

    def restore(self, snap: Dict) -> None:
        self.state = _deserialize(snap.get("state"))


class StreamingWindowEngine(MicroBatchEngine):
    """Tumbling windowed aggregate over micro-batch epochs of the audio
    table, keyed by speaker, exactly-once, resumable."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, window_ms: int = 600_000,
                 allowed_lateness_ms: int = 60_000, key: str = "speaker",
                 ts_col: str = "event_ms", dur_col: str = "dur_ms"):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms, key, ts_col)
        self.window_ms = window_ms
        self.dur_col = dur_col

    def columns(self) -> List[str]:
        return [self.key, self.ts_col, self.dur_col]

    def make_actor(self, partition: int):
        return WindowStateActor.remote(partition, self.key, self.window_ms)

    def precombine(self):
        import functools
        return functools.partial(
            _window_partials, key=self.key, ts_col=self.ts_col,
            dur_col=self.dur_col, window_ms=self.window_ms)


def _sliding_partials(tbl: pa.Table, key: str, ts_col: str, dur_col: str,
                      size_ms: int, slide_ms: int) -> pa.Table:
    """Combiner for sliding windows: replicate each event into its
    size/slide overlapping windows (clipped at t=0, matching the batch
    ``assign_sliding``), then combine per (key, window_start) — the
    replication never leaves the split task."""
    ts = tbl[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dur = tbl[dur_col].to_numpy(zero_copy_only=False).astype(np.int64)
    keys = tbl[key].to_numpy(zero_copy_only=False)
    n, n_w = len(ts), size_ms // slide_ms
    idx = np.repeat(np.arange(n), n_w)
    k = np.tile(np.arange(n_w), n)
    starts = (ts // slide_ms) * slide_ms
    rep_starts = starts[idx] - k * slide_ms
    valid = rep_starts >= 0
    df = pd.DataFrame({
        key: keys[idx[valid]],
        "window_start": rep_starts[valid],
        "total_dur_ms": dur[idx[valid]],
        "n_clips": np.ones(int(valid.sum()), dtype=np.int64),
        "max_event_ms": ts[idx[valid]],
    })
    g = df.groupby([key, "window_start"], sort=False)
    out = pd.DataFrame({
        "total_dur_ms": g["total_dur_ms"].sum(),
        "n_clips": g["n_clips"].sum(),
        "max_event_ms": g["max_event_ms"].max(),
    }).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def _interval_merge(df: pd.DataFrame, gap_ms: int) -> pd.DataFrame:
    """Interval-merge sessions/events sharing a ``__key__`` when the gap
    between them is < gap_ms. Vectorized: mergesort + per-key cummax of
    end + boundary scan; no per-key Python. Closed under composition:
    merging partials merged elsewhere gives the same sessions as merging
    the raw events (what makes the split-task combiner sound)."""
    df = df.sort_values(["__key__", "start_ms"],
                        kind="mergesort").reset_index(drop=True)
    n = len(df)
    key_change = np.zeros(n, dtype=bool)
    key_change[0] = True
    kv = df["__key__"].to_numpy()
    key_change[1:] = kv[1:] != kv[:-1]
    kseg = np.cumsum(key_change)
    run_end = df.groupby(kseg)["end_ms"].cummax().to_numpy()
    start = df["start_ms"].to_numpy()
    boundary = key_change.copy()
    boundary[1:] |= start[1:] >= run_end[:-1] + gap_ms
    sess = np.cumsum(boundary)
    g = df.groupby(sess, sort=False)
    return pd.DataFrame({
        "__key__": g["__key__"].first(),
        "start_ms": g["start_ms"].min(),
        "end_ms": g["end_ms"].max(),
        "total_dur_ms": g["total_dur_ms"].sum(),
        "n_clips": g["n_clips"].sum(),
    }).reset_index(drop=True)


def _session_partials(tbl: pa.Table, key: str, ts_col: str, dur_col: str,
                      gap_ms: int) -> pa.Table:
    """Combiner for session windows: raw rows -> partial sessions
    interval-merged within the chunk."""
    ts = tbl[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame({
        "__key__": tbl[key].to_numpy(zero_copy_only=False),
        "start_ms": ts,
        "end_ms": ts,
        "total_dur_ms": tbl[dur_col].to_numpy(
            zero_copy_only=False).astype(np.int64),
        "n_clips": np.ones(len(ts), dtype=np.int64),
    })
    return pa.Table.from_pandas(_interval_merge(df, gap_ms),
                                preserve_index=False)


@ray.remote
class SessionStateActor:
    """Per-partition session-window state: one row per OPEN session
    (key, start_ms, end_ms, total_dur_ms, n_clips). Receives partial
    sessions pre-merged in the split tasks (``_session_partials``) and
    folds them in with one vectorized interval-merge scan per epoch —
    the streaming counterpart of ``streaming.windows.assign_session``'s
    boundary scan, with hot-key actor load O(open sessions) not O(rows).

    A session finalizes when ``end_ms + gap <= watermark`` (no future
    event can extend it); emission carries ``window_end = end_ms + gap``,
    matching the batch operator. Partials that could only extend an
    already-closed session (``end_ms + gap <= watermark``) are late:
    dropped and counted (row-weighted by n_clips).
    """

    _COLS = ["__key__", "start_ms", "end_ms", "total_dur_ms", "n_clips"]

    def __init__(self, partition: int, key: str, gap_ms: int):
        self.partition = partition
        self.key = key
        self.gap_ms = gap_ms
        self.state: Optional[pd.DataFrame] = None

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        n_late = 0
        frames = [] if self.state is None else [self.state]
        if tables:
            df = pa.concat_tables(tables).to_pandas()
            if watermark_ms >= 0:
                late = df["end_ms"] + self.gap_ms <= watermark_ms
                n_late = int(df.loc[late, "n_clips"].sum())
                df = df[~late]
            if len(df):
                frames.append(df)
        merged = (_interval_merge(pd.concat(frames, ignore_index=True),
                                  self.gap_ms)
                  if frames else pd.DataFrame(columns=self._COLS))

        closed = (merged["end_ms"] + self.gap_ms <= watermark_ms
                  if len(merged) else pd.Series(dtype=bool))
        emitted = merged[closed] if len(merged) else merged
        self.state = (merged[~closed].reset_index(drop=True)
                      if len(merged) else None)

        sink = sink_for(sink_dir)
        if len(emitted):
            out = pd.DataFrame({
                self.key: emitted["__key__"].to_numpy(),
                "window_start": emitted["start_ms"].to_numpy(),
                "window_end": emitted["end_ms"].to_numpy() + self.gap_ms,
                "total_dur_ms": emitted["total_dur_ms"].to_numpy(),
                "n_clips": emitted["n_clips"].to_numpy(),
            })
            stats = sink.stage(epoch, self.partition,
                               pa.Table.from_pandas(out,
                                                    preserve_index=False))
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms, "late_dropped": n_late,
                      "open_sessions": 0 if self.state is None
                      else len(self.state)})
        return stats

    def snapshot(self) -> Dict:
        return {"state": _serialize(self.state)}

    def restore(self, snap: Dict) -> None:
        self.state = _deserialize(snap.get("state"))


class StreamingSlidingEngine(MicroBatchEngine):
    """Sliding windowed aggregate over micro-batch epochs: events are
    replicated into their size/slide overlapping windows INSIDE the
    split-task combiner (``_sliding_partials``), then the tumbling
    ``WindowStateActor`` machinery applies unchanged — a window closes
    when ``window_start + size <= watermark``. Completes the streaming
    tumbling/sliding/session trio."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, size_ms: int = 1_200_000,
                 slide_ms: int = 600_000, allowed_lateness_ms: int = 60_000,
                 key: str = "speaker", ts_col: str = "event_ms",
                 dur_col: str = "dur_ms"):
        assert size_ms % slide_ms == 0, "size must be a multiple of slide"
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms, key, ts_col)
        self.size_ms = size_ms
        self.slide_ms = slide_ms
        self.dur_col = dur_col

    def columns(self) -> List[str]:
        return [self.key, self.ts_col, self.dur_col]

    def make_actor(self, partition: int):
        return WindowStateActor.remote(partition, self.key, self.size_ms)

    def precombine(self):
        import functools
        return functools.partial(
            _sliding_partials, key=self.key, ts_col=self.ts_col,
            dur_col=self.dur_col, size_ms=self.size_ms,
            slide_ms=self.slide_ms)


class StreamingSessionEngine(MicroBatchEngine):
    """Session windowed aggregate over micro-batch epochs, keyed by
    speaker, exactly-once, resumable — the streaming counterpart of the
    batch ``assign_session`` operator."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, gap_ms: int = 120_000,
                 allowed_lateness_ms: int = 60_000, key: str = "speaker",
                 ts_col: str = "event_ms", dur_col: str = "dur_ms"):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms, key, ts_col)
        self.gap_ms = gap_ms
        self.dur_col = dur_col

    def columns(self) -> List[str]:
        return [self.key, self.ts_col, self.dur_col]

    def make_actor(self, partition: int):
        return SessionStateActor.remote(partition, self.key, self.gap_ms)

    def precombine(self):
        import functools
        return functools.partial(
            _session_partials, key=self.key, ts_col=self.ts_col,
            dur_col=self.dur_col, gap_ms=self.gap_ms)
