"""Watermark tracking across partitions.

Ray Data has no event-time notion; the watermark is engine metadata kept
in one small named actor (SURVEY §7.5 'Watermarks across partitions'):
each partition reports the max event time it has ingested per epoch, and
the global watermark is ``min over partitions of max_event_time -
allowed_lateness``. The min-of-maxes rule makes the watermark a lower
bound on what any partition may still produce, so state keyed below the
watermark is safe to finalize/expire (standard structured-streaming
semantics — public Dataflow/Flink model, no reference equivalent).

Multi-input operators (the stream-stream join) report min over their
PER-SOURCE running maxes as the partition value (``join_state``), so the
min-of-maxes here realizes the multi-input rule min over sources of min
over partitions — one source can never advance the watermark past data
the other source has yet to deliver.
"""

from __future__ import annotations

from typing import Dict

import ray


@ray.remote(num_cpus=0)
class WatermarkTracker:
    def __init__(self, num_partitions: int, allowed_lateness_ms: int):
        self.num_partitions = num_partitions
        self.allowed_lateness_ms = allowed_lateness_ms
        self.max_seen: Dict[int, int] = {}

    def report(self, partition: int, max_event_ms: int) -> int:
        cur = self.max_seen.get(partition, -1)
        if max_event_ms > cur:
            self.max_seen[partition] = max_event_ms
        return self.watermark()

    def watermark(self) -> int:
        if len(self.max_seen) < self.num_partitions:
            return -1  # not all partitions reported yet
        return min(self.max_seen.values()) - self.allowed_lateness_ms

    def snapshot(self) -> Dict:
        return {"max_seen": dict(self.max_seen),
                "watermark": self.watermark(),
                "allowed_lateness_ms": self.allowed_lateness_ms}

    def restore(self, snapshot: Dict) -> None:
        self.max_seen = {int(k): v for k, v in snapshot["max_seen"].items()}
