"""Micro-batch streaming engine: source epochs -> partitioned stateful
join -> watermark -> exactly-once sink.

North-rule pipeline (BASELINE.json): clip and transcript substreams from
the audio table are hash-partitioned on ``clip_id`` and joined statefully
with event-time watermarks; output is committed per epoch through the
2PC sink (``sink.py``) with per-partition lineage, resumable from the
manifest + state snapshots.

Topology per epoch:

1. SPLIT (shuffle map): one Ray task per input row-group reads its rows
   (parallel, metadata-scheduled) and splits them into P partition pairs
   ``(clips_table, transcripts_table, max_event_ms)`` returned as P
   separate objects (``num_returns=P``) — genuine shuffle routing, no
   driver materialization, no re-reads.
2. JOIN (reduce): partition p's ``JoinStateActor`` ingests its objects,
   emits matches + expirations against the current watermark, and stages
   its output parquet for the epoch (phase 1 of 2PC).
3. WATERMARK: actors report per-partition max event time; the tracker
   computes min-of-maxes - allowed_lateness for the NEXT epoch.
4. COMMIT: the driver commits the epoch (phase 2) with partition metrics
   and the actors' state snapshots.

Skew: hot ``clip_id`` prefixes are spread by hashing the FULL clip_id
(clip ids are unique; the hot dimension is the speaker prefix, which pure
clip_id hashing already spreads uniformly). Aggregations keyed by hot
speakers are skew-immune through the per-block COMBINER in
``stages/agg.py`` (a hot key collapses to one partial row per block
before any shuffle); operators that must ship raw rows per key offer
two-phase salted plans (``stages/dedup.py`` ``salt_buckets``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .join_state import JoinStateActor, _deserialize
from .sink import ExactlyOnceSink
from .watermark import WatermarkTracker

CLIP_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "speaker", "event_ms"]
TRANSCRIPT_COLS = ["clip_id", "transcript", "transcript_event_ms"]


from ..core.strhash import hash_string_array


def _hash_partition(keys: pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic hash partitioning of a string key column — fully
    vectorized over the Arrow buffers (``core.strhash``), no Python per
    row, stable across processes (unlike Python's seeded ``hash()``)."""
    return (hash_string_array(keys) % np.uint64(num_partitions)).astype(np.int64)


@ray.remote
def _split_rowgroup(path: str, row_group, num_partitions: int,
                    include_audio_bytes: bool):
    """Read one epoch unit (parquet row group, or Lance fragment via
    ``sources.lance_io``) and split into per-partition (clips,
    transcripts, max_event_ms) tuples — one return value per
    partition."""
    cols = CLIP_COLS + TRANSCRIPT_COLS[1:]
    if include_audio_bytes:
        cols = ["bytes"] + cols
    cols = list(dict.fromkeys(cols))
    if isinstance(row_group, dict):
        from ..sources.lance_io import read_stream_unit
        tbl = read_stream_unit(row_group, columns=cols)
    else:
        pf = pq.ParquetFile(path)
        tbl = pf.read_row_group(row_group, columns=cols)
    parts = _hash_partition(tbl["clip_id"].combine_chunks(), num_partitions)
    out = []
    clip_cols = (["bytes"] if include_audio_bytes else []) + CLIP_COLS
    for p in range(num_partitions):
        mask = pa.array(parts == p)
        sub = tbl.filter(mask)
        clips = sub.select(clip_cols)
        transcripts = sub.select(TRANSCRIPT_COLS).rename_columns(
            ["clip_id", "transcript", "event_ms"])
        max_ms = -1
        if len(sub):
            # pc.max over an all-null column yields None — rows with no
            # event time contribute nothing to the watermark
            cands = [pa.compute.max(sub["event_ms"]).as_py(),
                     pa.compute.max(sub["transcript_event_ms"]).as_py()]
            cands = [c for c in cands if c is not None]
            max_ms = max(cands) if cands else -1
        out.append((clips, transcripts, max_ms))
    return tuple(out) if num_partitions > 1 else out[0]


class StreamingJoinEngine:
    """Drives the clip<->transcript stateful join over epochs of the audio
    table with exactly-once output and checkpoint resume."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 8,
                 rowgroups_per_epoch: int = 4, allowed_lateness_ms: int = 60_000,
                 include_audio_bytes: bool = False, emit_unmatched: bool = True):
        self.input_path = input_path
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.rowgroups_per_epoch = rowgroups_per_epoch
        self.allowed_lateness_ms = allowed_lateness_ms
        self.include_audio_bytes = include_audio_bytes
        self.emit_unmatched = emit_unmatched
        self.sink = ExactlyOnceSink(out_dir)

    # -- source planning (metadata only) ----------------------------------
    def plan_epochs(self) -> List[List[Dict]]:
        """Epoch units are parquet row groups, or Lance fragments when
        the input is a Lance dataset (``sources.lance_io``)."""
        from ..sources.lance_io import plan_stream_epochs
        return plan_stream_epochs(self.input_path, self.rowgroups_per_epoch)

    def run(self, max_epochs: Optional[int] = None,
            crash_after_stage_of_epoch: Optional[int] = None) -> Dict:
        """Process all (or max_epochs) uncommitted epochs. Returns metrics.

        ``crash_after_stage_of_epoch``: test hook — raise after phase 1 of
        that epoch, before commit, to exercise exactly-once recovery.
        """
        P = self.num_partitions
        actors = [JoinStateActor.remote(
            p, emit_unmatched=self.emit_unmatched) for p in range(P)]
        tracker = WatermarkTracker.remote(P, self.allowed_lateness_ms)
        try:
            return self._run(P, actors, tracker, max_epochs,
                             crash_after_stage_of_epoch)
        finally:
            # kill on EVERY exit (incl. injected crashes): repeated
            # crash/resume cycles must not accumulate leaked actors
            for a in actors:
                ray.kill(a)
            ray.kill(tracker)

    def _run(self, P, actors, tracker, max_epochs,
             crash_after_stage_of_epoch) -> Dict:
        # -- resume: restore state + watermark from the committed manifest
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

        total_rows = 0
        n_done = 0

        # pipelined epoch loop — same overlap + correctness argument as
        # MicroBatchEngine.run (window_engine.py): split tasks prefetch
        # PREFETCH_EPOCHS ahead; epoch N's commit is deferred until after
        # epoch N+1's ingest is submitted (per-caller FIFO actor ordering
        # keeps snapshot(N) pre-N+1). Epoch planning (incl. grown-input
        # committed-unit accounting) is shared with MicroBatchEngine.
        from .window_engine import MicroBatchEngine, plan_pending_epochs
        prefetch = MicroBatchEngine.PREFETCH_EPOCHS
        pending, flush_epoch = plan_pending_epochs(
            self.input_path, self.rowgroups_per_epoch, manifest_epochs)
        if max_epochs is not None:
            pending = pending[:max_epochs]

        def launch_split(tasks):
            return [
                _split_rowgroup.options(num_returns=P if P > 1 else 1).remote(
                    t["path"], t, P, self.include_audio_bytes)
                for t in tasks]

        DIGESTS = ("file", "sha256", "md5")  # audit lineage, if staged

        def lineage(stats):
            return [{"partition": s["partition"], "rows": s["rows"],
                     "bytes": s["bytes"], "matched": s["matched"],
                     "expired": s["expired"],
                     **{k: s[k] for k in DIGESTS if k in s}}
                    for s in stats]

        inflight = {}
        for j in range(min(prefetch + 1, len(pending))):
            inflight[j] = launch_split(pending[j][1])

        deferred = None  # (epoch_id, n_units, stats, snaps, wm_snap, wm)
        for i, (epoch_id, tasks) in enumerate(pending):
            split_refs = inflight.pop(i)
            nxt = i + prefetch + 1
            if nxt < len(pending):
                inflight[nxt] = launch_split(pending[nxt][1])
            if P == 1:
                per_part = [split_refs]
            else:
                per_part = [[task_refs[p] for task_refs in split_refs]
                            for p in range(P)]
            wm = ray.get(tracker.watermark.remote())
            # join + stage (phase 1 of 2PC) in each partition actor
            stage_refs = [
                actors[p].process_and_stage.remote(
                    epoch_id, per_part[p], wm, self.out_dir)
                for p in range(P)]
            if deferred is not None:  # commit N-1 while N ingests
                d_eid, d_nu, d_stats, d_snaps, d_wm_snap, d_wm = deferred
                self.sink.commit(
                    d_eid, lineage(d_stats), d_wm,
                    state_snapshots={"actors": ray.get(d_snaps),
                                     "watermark": ray.get(d_wm_snap)},
                    n_units=d_nu)
                total_rows += sum(s["rows"] for s in d_stats)
                n_done += 1
                deferred = None
            stats = ray.get(stage_refs)
            # watermark advance from per-partition maxima
            ray.get([tracker.report.remote(s["partition"],
                                           s["max_event_ms"])
                     for s in stats])
            new_wm = ray.get(tracker.watermark.remote())
            if crash_after_stage_of_epoch == epoch_id:
                raise RuntimeError(f"injected crash after staging epoch {epoch_id}")
            snap_refs = [a.snapshot.remote() for a in actors]
            wm_snap_ref = tracker.snapshot.remote()
            deferred = (epoch_id, len(tasks), stats, snap_refs,
                        wm_snap_ref, new_wm)
        if deferred is not None:
            d_eid, d_nu, d_stats, d_snaps, d_wm_snap, d_wm = deferred
            self.sink.commit(d_eid, lineage(d_stats), d_wm,
                             state_snapshots={"actors": ray.get(d_snaps),
                                              "watermark": ray.get(d_wm_snap)},
                             n_units=d_nu)
            total_rows += sum(s["rows"] for s in d_stats)
            n_done += 1

        # final flush: end-of-stream watermark releases remaining state.
        # Gated ONLY on the flush epoch not being committed — a resumed run
        # whose data epochs were all already committed (crash between the
        # last commit and the flush) must still flush buffered unmatched
        # rows, or they are permanently lost. The flush id lives in its
        # own range (FLUSH_BASE + #units, from plan_pending_epochs) so a
        # grown input's new data epochs never collide with it.
        if max_epochs is None:
            if flush_epoch not in committed:
                stats = ray.get([
                    actors[p].process_and_stage.remote(
                        flush_epoch, [], 2**62, self.out_dir)
                    for p in range(P)])
                snaps = ray.get([a.snapshot.remote() for a in actors])
                wm_snap = ray.get(tracker.snapshot.remote())
                self.sink.commit(
                    flush_epoch, lineage(stats),
                    2**62, state_snapshots={"actors": snaps, "watermark": wm_snap})
                total_rows += sum(s["rows"] for s in stats)
        return {"epochs_processed": n_done, "rows_emitted": total_rows,
                "committed_rows": self.sink.committed_row_count()}
