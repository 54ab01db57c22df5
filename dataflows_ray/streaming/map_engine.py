"""Streaming stateless map (exactly-once ETL): micro-batch epochs ->
transform INSIDE the split tasks -> per-partition staging -> 2PC commit,
resumable.

The simplest and most common production streaming job: apply a pure
per-record transform (decode, feature-extract, cast, redact) to an
unbounded stream with exactly-once output and crash resume. On the
shared ``MicroBatchEngine`` skeleton: the transform runs as the
split-task ``precombine`` (data-parallel across row groups/fragments —
the actor never does per-row work), the per-partition actors only stage
the transformed rows idempotently, and a resumed run skips committed
epochs — re-decoding only the crashed epoch, never re-emitting.

This is the streaming counterpart of a batch ``map_batches`` +
``write_parquet``: same rows out, plus lineage metrics and the
restart-safety a 10^12-record decode job needs.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import pyarrow as pa
import ray

from .sink import sink_for
from .window_engine import MicroBatchEngine


@ray.remote
class StageOnlyActor:
    """Stateless per-partition stage: concat the epoch's transformed
    partials and stage them through the idempotent sink. No operator
    state — snapshot/restore are trivially empty."""

    def __init__(self, partition: int):
        self.partition = partition

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        sink = sink_for(sink_dir)
        if tables:
            stats = sink.stage(epoch, self.partition,
                               pa.concat_tables(tables))
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms})
        return stats

    def snapshot(self) -> Dict:
        return {}

    def restore(self, snap: Dict) -> None:
        pass


class StreamingMapEngine(MicroBatchEngine):
    """Exactly-once streaming map over micro-batch epochs.

    ``transform``: pa.Table -> pa.Table, applied inside each split task
    AFTER partitioning (so heavy decode work parallelizes across row
    groups x partitions). ``key`` routes rows to staging partitions
    (any roughly-uniform column); ``ts_col`` must survive the transform
    if you want meaningful watermark lineage — for streams without
    event time, point it at any monotone id column (as the dedup engine
    does with ``doc_id``)."""

    def __init__(self, input_path: str, out_dir: str,
                 transform: Callable[[pa.Table], pa.Table],
                 key: str, ts_col: str,
                 columns: Optional[List[str]] = None,
                 num_partitions: int = 4, rowgroups_per_epoch: int = 2,
                 derive: Optional[Callable[[pa.Table], pa.Table]] = None):
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms=0,
                         key=key, ts_col=ts_col)
        self.transform = transform
        self._columns = columns
        self._derive = derive

    def columns(self) -> Optional[List[str]]:
        return self._columns

    def make_actor(self, partition: int):
        return StageOnlyActor.remote(partition)

    def derive(self):
        return self._derive

    def precombine(self):
        return self.transform
