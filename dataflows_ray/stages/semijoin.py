"""Distributed semi- / anti-join on a key column.

Engine-defined scale primitive (no reference equivalent — the reference's
join.py:200-260 only materializes full joins). Used wherever a pipeline
filters a big dataset by a set of ids:

- small id sets broadcast once (``ray.put`` of an Arrow array, zero-copy
  ``ray.get`` inside every filter task) — the data never moves;
- large id sets switch to a distributed hash join (``Dataset.join``
  hash-shuffles both sides on the key), so neither side ever lands on
  the driver. This is the 100-TB path the dedup family falls back to
  when the keeper/drop set exceeds driver memory.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# id sets up to this many rows broadcast as an Arrow value_set filter;
# beyond it the distributed hash-join path engages automatically
BROADCAST_ID_LIMIT = 50_000_000

_MARK = "__semi_mark__"


def _sized_partitions(num_partitions: Optional[int]) -> int:
    if num_partitions is not None:
        return num_partitions
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(32, ncpu))


def semi_join_ids(ds: ray.data.Dataset, ids: ray.data.Dataset,
                  col: str, id_col: Optional[str] = None,
                  anti: bool = False,
                  broadcast_limit: int = BROADCAST_ID_LIMIT,
                  num_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Rows of ``ds`` whose ``col`` is (``anti``: is not) present in the
    ``id_col`` column of ``ids``.

    ``ids`` MUST be distinct on ``id_col`` (the dedup producers guarantee
    this by construction: one keeper id per hash group); the inner-join
    fast path would duplicate matching rows otherwise.

    Adaptive: ``ids.count()`` (metadata-cheap after execution) picks the
    broadcast or the distributed-hash-join plan.
    """
    id_col = id_col or col
    n_ids = ids.count()
    if n_ids == 0:
        # Zero ids: semi-join is empty, anti-join is the identity. Short-
        # circuit rather than build an empty value_set whose type can't be
        # inferred (pc.is_in rejects a mistyped empty set, e.g. string
        # column vs int64 set).
        if anti:
            return ds
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow", batch_size=None)
    if n_ids <= broadcast_limit:
        chunks = [b[id_col] for b in ids.select_columns([id_col])
                  .iter_batches(batch_format="pyarrow", batch_size=None)]
        value_set = pa.concat_arrays([c.combine_chunks() if
                                      isinstance(c, pa.ChunkedArray) else c
                                      for c in chunks])
        ref = ray.put(value_set)

        def bfilter(batch: pa.Table, col=col, anti=anti) -> pa.Table:
            mask = pc.is_in(batch[col], value_set=ray.get(ref))
            if anti:
                mask = pc.invert(mask)
            return batch.filter(mask)

        return ds.map_batches(bfilter, batch_format="pyarrow",
                              batch_size=None)

    # distributed path: hash-join both sides on the key. Semi = inner join
    # against the distinct id column; anti = left-outer + null-marker
    # filter. Nothing touches the driver.
    nparts = _sized_partitions(num_partitions)
    import numpy as np
    marked = ids.select_columns([id_col]).map_batches(
        lambda t: t.append_column(
            _MARK, pa.array(np.ones(len(t), dtype=np.int8))),
        batch_format="pyarrow", batch_size=None)
    if anti:
        joined = ds.join(marked, join_type="left_outer",
                         num_partitions=nparts,
                         on=(col,), right_on=(id_col,),
                         left_suffix="__l", right_suffix="__r")

        def keep_miss(batch: pa.Table) -> pa.Table:
            out = batch.filter(pc.is_null(batch[_MARK]))
            drop = [c for c in (_MARK, id_col if id_col != col else None,
                                f"{id_col}__r")
                    if c and c in out.column_names]
            return out.drop_columns(drop)

        return joined.map_batches(keep_miss, batch_format="pyarrow",
                                  batch_size=None)
    joined = ds.join(marked, join_type="inner", num_partitions=nparts,
                     on=(col,), right_on=(id_col,),
                     left_suffix="__l", right_suffix="__r")

    def strip(batch: pa.Table) -> pa.Table:
        drop = [c for c in (_MARK, id_col if id_col != col else None,
                            f"{id_col}__r")
                if c and c in batch.column_names]
        return batch.drop_columns(drop)

    return joined.map_batches(strip, batch_format="pyarrow",
                              batch_size=None)
