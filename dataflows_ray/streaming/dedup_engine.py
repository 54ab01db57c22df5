"""Streaming exact deduplication: micro-batch epochs -> per-partition
seen-content state -> first-seen emission, exactly-once, resumable.

The streaming counterpart of ``functions.dedup.exact_dedup`` (and the
north rule's "dedup the stream as it arrives" shape): documents arrive
as micro-batch epochs in id order; each epoch emits ONLY the documents
whose 128-bit content hash has never been seen, commits them through
the 2PC sink, and snapshots the seen-set so a crashed run resumes
without re-emitting or losing rows. Because the stream is id-ordered
and ties within an epoch keep the min id, the committed output equals
the batch operator's "min doc_id per distinct text" — one SQL oracle
covers both.

Scale shape (on the shared ``MicroBatchEngine`` skeleton):
- the content hash is computed INSIDE the split task (``derive`` hook,
  vectorized ``core.strhash`` over the Arrow buffers) and is also the
  partition key, so every copy of a given content lands on the same
  state partition — state actors never coordinate;
- the split-task combiner drops within-chunk duplicates before the
  exchange, so shuffle volume is O(distinct contents per chunk);
- per-partition state is two uint64 numpy arrays (16 bytes per distinct
  content) with O(1) membership via a pandas hash index — 1B distinct
  docs ~ 16 GB across ALL partitions, scaling out with P.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .sink import ExactlyOnceSink
from .window_engine import MicroBatchEngine

_HA, _HB = "__ch_a__", "__ch_b__"


def _add_content_hash(tbl: pa.Table, text_col: str) -> pa.Table:
    from ..core.strhash import content_hash_array
    from ..functions.dedup import _PRIME_B
    col = tbl[text_col]
    tbl = tbl.append_column(_HA, pa.array(content_hash_array(col),
                                          type=pa.uint64()))
    return tbl.append_column(_HB, pa.array(
        content_hash_array(col, prime=_PRIME_B), type=pa.uint64()))


def _first_per_hash(tbl: pa.Table, id_col: str) -> pa.Table:
    """Combiner: keep the min-``id_col`` row per content hash within the
    chunk (stable sort + drop_duplicates — no per-group Python)."""
    df = tbl.to_pandas()
    df = df.sort_values(id_col, kind="mergesort") \
           .drop_duplicates([_HA, _HB], keep="first")
    return pa.Table.from_pandas(df, preserve_index=False)


@ray.remote
class DedupStateActor:
    """Per-partition seen-content state. Ingest = concat the epoch's
    pre-deduped partials, keep min-id per hash within the epoch, drop
    rows whose hash is already in the seen-set (vectorized merge
    membership test), stage the survivors, extend the seen-set."""

    def __init__(self, partition: int, id_col: str):
        self.partition = partition
        self.id_col = id_col
        self.seen: Optional[pd.DataFrame] = None  # columns: _HA, _HB

    def ingest_and_stage(self, epoch: int, refs: List, watermark_ms: int,
                         sink_dir: str) -> Dict:
        tuples = ray.get(list(refs)) if refs else []
        tables = [t[0] for t in tuples if t[0] is not None and len(t[0])]
        max_ms = max([t[1] for t in tuples], default=-1)
        emitted = pd.DataFrame()
        n_dup = 0
        if tables:
            df = pa.concat_tables(tables).to_pandas()
            df = df.sort_values(self.id_col, kind="mergesort") \
                   .drop_duplicates([_HA, _HB], keep="first")
            if self.seen is not None and len(self.seen):
                merged = df.merge(self.seen, on=[_HA, _HB], how="left",
                                  indicator=True)
                fresh = merged["_merge"] == "left_only"
                n_dup = int((~fresh).sum())
                emitted = merged[fresh].drop(columns=["_merge"])
            else:
                emitted = df
            new_hashes = emitted[[_HA, _HB]]
            self.seen = (new_hashes if self.seen is None
                         else pd.concat([self.seen, new_hashes],
                                        ignore_index=True))

        sink = ExactlyOnceSink(sink_dir)
        if len(emitted):
            out = pa.Table.from_pandas(
                emitted.drop(columns=[_HA, _HB]), preserve_index=False)
            stats = sink.stage(epoch, self.partition, out)
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms, "dups_dropped": n_dup,
                      "seen_contents": 0 if self.seen is None
                      else len(self.seen)})
        return stats

    def snapshot(self) -> Dict:
        if self.seen is None:
            return {"a": None, "b": None}
        return {"a": self.seen[_HA].to_numpy().tobytes(),
                "b": self.seen[_HB].to_numpy().tobytes()}

    def restore(self, snap: Dict) -> None:
        if snap.get("a") is None:
            self.seen = None
            return
        self.seen = pd.DataFrame({
            _HA: np.frombuffer(snap["a"], dtype=np.uint64),
            _HB: np.frombuffer(snap["b"], dtype=np.uint64)})


class StreamingDedupEngine(MicroBatchEngine):
    """Exactly-once streaming exact-dedup over micro-batch epochs of an
    id-ordered document stream."""

    def __init__(self, input_path: str, out_dir: str, num_partitions: int = 4,
                 rowgroups_per_epoch: int = 2, text_col: str = "text",
                 id_col: str = "doc_id",
                 payload_cols: Optional[List[str]] = None):
        # the id doubles as event time: monotone in stream order, so the
        # watermark tracker's lineage metrics stay meaningful
        super().__init__(input_path, out_dir, num_partitions,
                         rowgroups_per_epoch, allowed_lateness_ms=0,
                         key=_HA, ts_col=id_col)
        self.text_col = text_col
        self.id_col = id_col
        self.payload_cols = payload_cols

    def columns(self) -> Optional[List[str]]:
        if self.payload_cols is None:
            return None  # all columns
        return list(dict.fromkeys(
            [self.id_col, self.text_col] + self.payload_cols))

    def make_actor(self, partition: int):
        return DedupStateActor.remote(partition, self.id_col)

    def derive(self):
        import functools
        return functools.partial(_add_content_hash, text_col=self.text_col)

    def precombine(self):
        import functools
        return functools.partial(_first_per_hash, id_col=self.id_col)
