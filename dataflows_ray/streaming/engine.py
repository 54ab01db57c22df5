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

from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .join_state import JoinStateActor
from .window_engine import MicroBatchEngine, _hash_partition

CLIP_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "speaker", "event_ms"]
TRANSCRIPT_COLS = ["clip_id", "transcript", "transcript_event_ms"]


@ray.remote
def _split_rowgroup(path: str, row_group, num_partitions: int,
                    cols: List[str]):
    """Read one epoch unit (parquet row group, or Lance fragment via
    ``sources.lance_io``) and split into per-partition (clips,
    transcripts, max_event_ms) tuples — one return value per
    partition. ``cols`` comes from the engine's ``columns()`` hook
    (single source of truth for the read set; contains ``bytes`` when
    the engine ships audio payloads)."""
    include_audio_bytes = "bytes" in cols
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


class StreamingJoinEngine(MicroBatchEngine):
    """Drives the clip<->transcript stateful join over epochs of the audio
    table with exactly-once output and checkpoint resume.

    Reuses the shared ``MicroBatchEngine`` pipelined epoch loop
    (prefetch splits, deferred commit, snapshot-before-next-ingest,
    grown-input planning, resume guards) — only the split task (two
    substreams per row group) and the per-partition actor (the stateful
    join) differ.
    """

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 8,
                 rowgroups_per_epoch: int = 4, allowed_lateness_ms: int = 60_000,
                 include_audio_bytes: bool = False, emit_unmatched: bool = True):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms,
                         key="clip_id", ts_col="event_ms")
        self.include_audio_bytes = include_audio_bytes
        self.emit_unmatched = emit_unmatched

    # -- MicroBatchEngine hooks --------------------------------------------
    def columns(self) -> List[str]:
        cols = CLIP_COLS + TRANSCRIPT_COLS[1:]
        if self.include_audio_bytes:
            cols = ["bytes"] + cols
        return list(dict.fromkeys(cols))

    def make_actor(self, partition: int):
        return JoinStateActor.remote(partition,
                                     emit_unmatched=self.emit_unmatched)

    def _launch_split(self, tasks, P, cols):
        # the join splitter emits TWO substreams (clips, transcripts)
        # per partition, so it replaces the generic single-table one
        return [
            _split_rowgroup.options(num_returns=P if P > 1 else 1).remote(
                t["path"], t, P, cols)
            for t in tasks]

    _LINEAGE_KEYS = ("partition", "rows", "bytes", "matched", "expired",
                     "file", "sha256", "md5")

    @staticmethod
    def _lineage(stats):
        keys = StreamingJoinEngine._LINEAGE_KEYS
        return [{k: s[k] for k in keys if k in s} for s in stats]

    def run(self, max_epochs: Optional[int] = None,
            crash_after_stage_of_epoch: Optional[int] = None) -> Dict:
        """Process all (or ``max_epochs``) uncommitted epochs. Returns
        metrics. (Same loop as ``MicroBatchEngine.run``; this override
        only preserves the original argument order.)"""
        return super().run(
            crash_after_stage_of_epoch=crash_after_stage_of_epoch,
            max_epochs=max_epochs)
