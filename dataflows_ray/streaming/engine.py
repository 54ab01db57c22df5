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
3. WATERMARK: actors report per-partition frontiers; the tracker
   computes min-of-maxes - allowed_lateness for the NEXT epoch. A join
   actor's frontier is min over its two SOURCES' running maxes, so the
   global rule is the multi-input min(min_p L_p, min_p R_p) — a
   fast/denser source can never race the watermark past a slower one
   (Flink/Dataflow multi-input semantics).
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


# -- two-source stream-stream join ------------------------------------------

@ray.remote
def _split_side(unit: Dict, num_partitions: int, side: str,
                cols: List[str], ts_col: str):
    """Split one unit of ONE substream source into per-partition
    (clips, transcripts, max_event_ms) tuples — the other side of each
    tuple is None. Shares the JoinStateActor ingest protocol with
    ``_split_rowgroup`` so the actor never knows which topology fed it.
    Units are always the dicts ``plan_stream_units`` produces, so the
    read dispatch is exactly ``read_stream_unit``."""
    from ..sources.lance_io import read_stream_unit
    tbl = read_stream_unit(unit, columns=cols)
    parts = _hash_partition(tbl["clip_id"].combine_chunks(), num_partitions)
    out = []
    for p in range(num_partitions):
        sub = tbl.filter(pa.array(parts == p))
        m = pa.compute.max(sub[ts_col]).as_py() if len(sub) else None
        max_ms = -1 if m is None else int(m)
        out.append((sub, None, max_ms) if side == "left"
                   else (None, sub, max_ms))
    return tuple(out) if num_partitions > 1 else out[0]


def plan_pending_epochs_two(left_path: str, right_path: str,
                            units_per_epoch: int,
                            manifest_epochs: List[Dict]):
    """Two-source analogue of ``window_engine.plan_pending_epochs``:
    each epoch zips up to ``units_per_epoch`` units from EACH source.
    Consumption is tracked PER SOURCE (``n_units = [left, right]``), so
    either source can grow independently — new epochs are chunked from
    each source's uncommitted suffix, never re-assigned into committed
    epoch ids."""
    from ..sources.lance_io import plan_stream_units
    from .window_engine import MicroBatchEngine
    lunits = plan_stream_units(left_path)
    runits = plan_stream_units(right_path)
    u = units_per_epoch
    flush_epoch = MicroBatchEngine.FLUSH_BASE + len(lunits) + len(runits)
    data_entries = [e for e in manifest_epochs
                    if e["epoch"] < MicroBatchEngine.FLUSH_BASE]
    committed_ids = {x for e in data_entries
                     for x in e.get("compacted_from", [e["epoch"]])}

    def chunk(ltail, rtail, first_id):
        n_ep = max(-(-len(ltail) // u), -(-len(rtail) // u))
        return [(first_id + j, {"left": ltail[j * u:(j + 1) * u],
                                "right": rtail[j * u:(j + 1) * u]})
                for j in range(n_ep)]

    if data_entries and all(
            isinstance(e.get("n_units"), list) and len(e["n_units"]) == 2
            for e in data_entries):
        consumed_l = min(sum(e["n_units"][0] for e in data_entries),
                         len(lunits))
        consumed_r = min(sum(e["n_units"][1] for e in data_entries),
                         len(runits))
        pending = chunk(lunits[consumed_l:], runits[consumed_r:],
                        max(committed_ids) + 1)
    else:
        pending = [(eid, tasks)
                   for eid, tasks in chunk(lunits, runits, 0)
                   if eid not in committed_ids]
    return pending, flush_epoch


class TwoStreamJoinEngine(StreamingJoinEngine):
    """Stateful stream-stream join over TWO independent sources — a clip
    table and a transcript table with their own files, arrival order and
    event-time distributions. Unlike ``StreamingJoinEngine`` (whose two
    substreams co-arrive row-for-row from one table), a row's partner
    here typically lands in a DIFFERENT epoch, so the per-partition
    Arrow state buffers, watermark expiry, and allowed-lateness policy
    do real cross-epoch work on every run.

    The transcript source must carry its event time in ``event_ms``
    (the engine-canonical name both substreams share).

    Watermarking follows the multi-input rule (see ``join_state``): each
    partition's frontier is the min of its two per-source running maxes,
    so sources with different rows-per-unit densities cannot race the
    watermark past each other's pending matches.

    Independent growth: appended units plan into NEW epochs from each
    source's uncommitted suffix. Appended rows whose event time is below
    the RESTORED watermark follow standard late-data semantics — they
    match partners that arrive in the same epoch (join runs before
    expiry within an epoch) but expire null-padded if the partner lands
    in a later epoch. Appends whose event times exceed the old maximum
    (the normal log-ingest case) are unaffected.
    """

    def __init__(self, left_path: str, right_path: str, out_dir: str,
                 num_partitions: int = 8, rowgroups_per_epoch: int = 4,
                 allowed_lateness_ms: int = 60_000,
                 emit_unmatched: bool = True):
        super().__init__(left_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms,
                         include_audio_bytes=False,
                         emit_unmatched=emit_unmatched)
        self.right_path = right_path

    RIGHT_COLS = ["clip_id", "transcript", "event_ms"]

    def columns(self) -> List[str]:
        """Read set of the LEFT source only — this engine's two sources
        have different schemas, so the inherited single-table read set
        (which fabricates ``transcript_event_ms``) does not apply;
        ``_launch_split`` passes each side its own column list
        (``CLIP_COLS`` / ``RIGHT_COLS``)."""
        return list(CLIP_COLS)

    def _schema_hint(self, path: str, cols: List[str]) -> Optional[bytes]:
        """Serialized Arrow schema of one source's selected columns (ONE
        footer/manifest read — not a full ``plan_stream_units`` metadata
        sweep) — lets every JoinStateActor canonicalize output from
        epoch 0, before it has ingested both sides."""
        from ..sources.lance_io import _is_lance_path
        if _is_lance_path(path):
            import lance
            full = lance.dataset(path).schema
        else:
            first = path
            if os.path.isdir(path):
                files = []
                for root, _d, names in os.walk(path):
                    files.extend(os.path.join(root, n)
                                 for n in names if n.endswith(".parquet"))
                if not files:
                    return None
                first = min(files)
            full = pq.ParquetFile(first).schema_arrow
        fields = [full.field(c) for c in cols]
        return pa.schema(fields).serialize().to_pybytes()

    def make_actor(self, partition: int):
        if not hasattr(self, "_hints"):
            self._hints = (self._schema_hint(self.input_path, CLIP_COLS),
                           self._schema_hint(self.right_path,
                                             self.RIGHT_COLS))
        return JoinStateActor.remote(
            partition, emit_unmatched=self.emit_unmatched,
            left_schema_ipc=self._hints[0], right_schema_ipc=self._hints[1])

    def plan_pending(self, manifest_epochs):
        return plan_pending_epochs_two(
            self.input_path, self.right_path,
            self.rowgroups_per_epoch, manifest_epochs)

    @staticmethod
    def _n_units(tasks) -> List[int]:
        return [len(tasks["left"]), len(tasks["right"])]

    def _launch_split(self, tasks, P, cols):
        opts = {"num_returns": P if P > 1 else 1}
        return [
            _split_side.options(**opts).remote(
                t, P, "left", CLIP_COLS, "event_ms")
            for t in tasks["left"]
        ] + [
            _split_side.options(**opts).remote(
                t, P, "right", self.RIGHT_COLS, "event_ms")
            for t in tasks["right"]
        ]
