"""Join / join_with_self: keyed aggregation + hash join.

Parity target: reference ``dataflows/processors/join.py:174-392``:
- ``KeyCalc`` (``join.py:13-26``): key = list of fields OR a format string
  over row fields; ``{#}`` is the 1-based row number (needs ``__row_id__``);
- per-key running aggregation of ``fields`` (see ``stages/agg.py``) with
  ``'*'`` expansion (``join.py:140-148``) and name/aggregate defaults
  (``join.py:128-137``);
- modes ``inner`` (drop unmatched target), ``half-outer`` (null-fill
  unmatched target), ``full-outer`` (also emit unmatched SOURCE keys with
  the target key fields restored from the source key values,
  ``join.py:216-217,251-255``);
- ``join_with_self`` / deduplication mode (``target_key=None``): emit one
  row per distinct source key with finalized aggregates — i.e. group-by
  (``join.py:223-235``).

Ray-Data mapping: compute an explicit key column on both sides
(vectorized for single-field keys, in-batch loop for format strings), run
``grouped_aggregate`` on the source, then either:
- ``strategy='shuffle'``: ``Dataset.join`` (hash-partitioned shuffle join,
  both sides large); or
- ``strategy='broadcast'``: ``ray.put`` the aggregated source once and
  probe it inside ``map_batches`` on the target — no shuffle of the big
  side. This is the 100-TB-correct plan when the aggregated (distinct-key)
  side fits in the object store, which is the common dims-into-facts case.
- ``strategy='auto'`` (default): materialize the aggregated source (its
  size is #distinct keys, already reduced), then pick broadcast if it is
  under ``broadcast_limit`` rows else shuffle.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream
from ..core.raycompat import cheap_columns
from ..sources.load import ROW_ID
from .agg import grouped_aggregate, HOLISTIC

JOIN_KEY = "__join_key__"
BROADCAST_LIMIT = 2_000_000  # rows of aggregated (distinct-key) source


def _attach_row_ids(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Global 0-based ``__row_id__`` over an existing Dataset: execute to
    block refs (they stay in the object store — only per-block row COUNTS
    reach the driver), then stamp each block with its offset. Row
    numbering is inherently sequential over the stream order; it is only
    used for the reference's small-data ``{#}`` join keys."""
    import numpy as np

    @ray.remote
    def nrows(block) -> int:
        return block.num_rows

    @ray.remote
    def stamp(block, offset: int):
        rid = pa.array(np.arange(offset, offset + block.num_rows,
                                 dtype=np.int64))
        return block.append_column(ROW_ID, rid)

    # Force ordered collection: the streaming executor defaults to
    # preserve_order=False, so on multi-block inputs to_arrow_refs() could
    # return blocks in COMPLETION order and mis-number rows (same pattern
    # as core/udf.py apply_stateful_rows).
    prev = ds.context.execution_options.preserve_order
    ds.context.execution_options.preserve_order = True
    try:
        refs = ds.to_arrow_refs()
    finally:
        ds.context.execution_options.preserve_order = prev
    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return ray.data.from_arrow_refs(
        [stamp.remote(r, int(offsets[i])) for i, r in enumerate(refs)])


class KeyCalc:
    """Reference ``join.py:13-26``: list-of-fields or format-string key."""

    def __init__(self, key_spec: Union[str, List[str]]):
        if isinstance(key_spec, list):
            self.key_list = list(key_spec)
            self.key_spec = ":".join("{%s}" % k for k in key_spec)
            self.simple = True
        else:
            self.key_spec = key_spec
            self.key_list = re.findall(r"\{(.*?)\}", key_spec)
            self.simple = False
        self.uses_row_number = "#" in self.key_list

    def add_key_column(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        spec, uses_rn = self.key_spec, self.uses_row_number

        def fn(batch: pa.Table) -> pa.Table:
            from ..core.strformat import try_vector_format
            if uses_rn and ROW_ID not in batch.column_names:
                raise ValueError(
                    "'{#}' row-number key requires a __row_id__ column "
                    "(load with row_ids=True)")
            # {#} is the 1-based row number == __row_id__ + 1
            extra = ({"#": pc.add(batch[ROW_ID], 1)} if uses_rn else None)
            keys = try_vector_format(batch, spec, extra=extra)
            if keys is None:  # exotic spec/types: exact row-loop fallback
                rows = batch.to_pylist()
                if uses_rn:
                    keys = pa.array(
                        [spec.format(**{**r, "#": int(r[ROW_ID]) + 1})
                         for r in rows], type=pa.string())
                else:
                    keys = pa.array([spec.format(**r) for r in rows],
                                    type=pa.string())
            return batch.append_column(JOIN_KEY, keys)

        return ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=DEFAULT_BATCH_SIZE)


def _fix_fields(fields: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    out: Dict[str, Dict[str, Any]] = {}
    for field in sorted(fields.keys()):
        spec = fields[field] or {}
        spec = dict(spec)
        spec.setdefault("name", field)
        spec.setdefault("aggregate", "any")
        out[field] = spec
    return out


def _expand_star(fields: Dict[str, Dict], source_cols: List[str]) -> Dict[str, Dict]:
    if "*" not in fields:
        return fields
    spec = fields.pop("*")
    existing = {s["name"] for s in fields.values()}
    for col in source_cols:
        if col not in existing and col not in (JOIN_KEY, ROW_ID):
            fields[col] = {**spec, "name": col}
    return fields


class join(Step):
    def __init__(self, source_name: str, source_key, target_name: str,
                 target_key, fields: Dict[str, Any] = None, mode: str = "half-outer",
                 source_delete: bool = True, full: Optional[bool] = None,
                 strategy: str = "auto", num_partitions: Optional[int] = None):
        if full is not None:  # deprecated flag (join.py:188-194)
            mode = "half-outer" if full else "inner"
        assert mode in ("inner", "half-outer", "full-outer")
        self.source_name = source_name
        self.source_key = KeyCalc(source_key)
        self.target_name = target_name
        self.target_key = KeyCalc(target_key) if target_key is not None else None
        self.fields = fields or {}
        self.mode = mode
        self.source_delete = source_delete
        self.strategy = strategy
        self.num_partitions = num_partitions
        self.name = f"join({source_name}->{target_name})"

    def _columnar(self) -> bool:
        """True when both keys are plain field lists (no format strings, no
        ``{#}`` row numbers): aggregate and join directly on the raw key
        COLUMNS — no per-row key formatting, native vectorized aggregates,
        and the grouped_aggregate key-alias fast path all apply. This is
        the hot path for every list-keyed join at scale."""
        if not self.source_key.simple or self.source_key.uses_row_number:
            return False
        if self.target_key is not None and (
                not self.target_key.simple or self.target_key.uses_row_number):
            return False
        return True

    # -- aggregation of the source side ----------------------------------
    def _aggregate_source(self, source: ray.data.Dataset, columnar: bool):
        fields = _expand_star(_fix_fields(dict(self.fields)), cheap_columns(source))
        # reference join.py (test_join_preserve_source_fields_order):
        # joined fields attach in SOURCE SCHEMA order, not spec order;
        # targets not mapped to a source column keep their order at the end
        src_order = {c: i for i, c in enumerate(cheap_columns(source))}
        fields = dict(sorted(
            fields.items(),
            key=lambda kv: src_order.get(kv[1]["name"], len(src_order))))
        specs = [{"target": tgt, "source": spec["name"], "aggregate": spec["aggregate"]}
                 for tgt, spec in fields.items()]
        if columnar:
            agg = grouped_aggregate(source, self.source_key.key_list, specs)
            return agg, fields
        keyed = self.source_key.add_key_column(source)
        if self.mode == "full-outer" and self.target_key is not None:
            # preserve source key field values for key restoration
            # (reference join.py:216-217,251-255)
            for i, kf in enumerate(self.source_key.key_list):
                specs.append({"target": f"__key_{i}__", "source": kf,
                              "aggregate": "first"})
        agg = grouped_aggregate(keyed, [JOIN_KEY], specs)
        return agg, fields

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        source = stream.get(self.source_name)
        target = stream.get(self.target_name) if self.target_key is not None else None
        # '{#}' (1-based row number) keys work transparently as in the
        # reference (join.py:19-22): attach a global __row_id__ if the
        # side doesn't carry one yet
        if self.source_key.uses_row_number and ROW_ID not in cheap_columns(source):
            source = _attach_row_ids(source)
        target_rid_attached = False
        if (target is not None and self.target_key is not None
                and self.target_key.uses_row_number
                and ROW_ID not in cheap_columns(target)):
            target = _attach_row_ids(target)
            target_rid_attached = True
        columnar = self._columnar()
        agg, fields = self._aggregate_source(source, columnar)
        field_names = list(fields.keys())

        if self.target_key is None:
            # deduplication / group-by mode: the aggregate IS the result
            if columnar:
                drop = [k for k in self.source_key.key_list
                        if k not in field_names]
            else:
                drop = [JOIN_KEY]
            result = agg.drop_columns(drop) if drop else agg
            stream.set(self.source_name, result)
            return stream

        strategy = self.strategy
        if strategy == "broadcast" and self.mode == "full-outer":
            # a broadcast probe only scans the target and can never emit
            # unmatched SOURCE keys (reference join.py:251-255); force the
            # shuffle plan rather than silently dropping right-only rows
            strategy = "shuffle"
        if strategy == "auto":
            agg = agg.materialize()
            strategy = ("broadcast"
                        if agg.count() <= BROADCAST_LIMIT and self.mode != "full-outer"
                        else "shuffle")

        if columnar:
            src_keys = self.source_key.key_list
            tgt_keys = self.target_key.key_list
            if strategy == "broadcast":
                result = _broadcast_join_cols(target, agg, field_names,
                                              self.mode, src_keys, tgt_keys)
            else:
                result = _shuffle_join_cols(target, agg, field_names,
                                            self.mode, src_keys, tgt_keys,
                                            self.num_partitions)
        else:
            keyed_target = self.target_key.add_key_column(target)
            if strategy == "broadcast":
                result = _broadcast_join(keyed_target, agg, field_names, self.mode)
            else:
                result = _shuffle_join(keyed_target, agg, field_names, self.mode,
                                       self.target_key, self.num_partitions)
        if target_rid_attached:
            # the auto-attached row-id column is key plumbing, not data
            result = result.drop_columns([ROW_ID])
        stream.set(self.target_name, result)
        if self.source_delete:
            stream.drop(self.source_name)
        return stream


def _broadcast_join(keyed_target: ray.data.Dataset, agg: ray.data.Dataset,
                    field_names: List[str], mode: str) -> ray.data.Dataset:
    """Broadcast join for format-string keys: both sides already carry the
    computed ``__join_key__`` column, so this is just the columnar
    vectorized probe keyed on it (pandas ``get_indexer``, no Python per
    row), followed by dropping the key column."""
    joined = _broadcast_join_cols(keyed_target, agg, field_names, mode,
                                  [JOIN_KEY], [JOIN_KEY])
    return joined.drop_columns([JOIN_KEY])


import functools


@functools.lru_cache(maxsize=64)
def _broadcast_lookup(ref, keys_tuple):
    """Per-process cached build of the broadcast lookup index: the ray.get
    is a zero-copy shared-memory read; set_index happens once per worker
    process, not per batch or per actor."""
    df = ray.get(ref)
    keys = list(keys_tuple)
    return df.set_index(keys if len(keys) > 1 else keys[0])


def _broadcast_join_cols(target: ray.data.Dataset, agg: ray.data.Dataset,
                         field_names: List[str], mode: str,
                         src_keys: List[str], tgt_keys: List[str]
                         ) -> ray.data.Dataset:
    """Columnar broadcast join: ``ray.put`` the aggregated source ONCE,
    probe per batch with a fully vectorized pandas merge on the raw key
    columns. No Python per row. STATELESS probe tasks (per-process cached
    lookup) share CPUs elastically with the upstream read — an actor pool
    here paid seconds of startup per query and capped parallelism."""
    agg_df = agg.to_pandas()
    ref = ray.put(agg_df)

    class Probe:
        def __init__(self):
            self.lookup = _broadcast_lookup(ref, tuple(src_keys))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            probe_key = (list(zip(*[df[k] for k in tgt_keys]))
                         if len(tgt_keys) > 1 else df[tgt_keys[0]].to_numpy())
            idx = self.lookup.index.get_indexer(probe_key)
            hit = idx >= 0
            if mode == "inner":
                df = df[hit].reset_index(drop=True)
                idx = idx[hit]
                hit = hit[hit]
            picked = self.lookup.iloc[np.where(idx >= 0, idx, 0)]
            for col in field_names:
                if col in self.lookup.columns:
                    vals = pd.Series(picked[col].to_numpy(), index=df.index)
                    if not hit.all():
                        # nulls (not NaN) for misses — only miss-batches
                        # pay the object-dtype cost
                        vals = vals.astype(object)
                        vals[~hit] = None
                else:
                    vals = pd.Series([None] * len(df), index=df.index)
                if col in df.columns:
                    # half-outer miss keeps the target's own value
                    # (reference join.py:245-249)
                    df[col] = vals.where(hit, df[col])
                else:
                    df[col] = vals
            return df

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        return Probe()(df)  # instance state cached per process

    return target.map_batches(probe, batch_format="pandas", batch_size=None)


def _shuffle_join_cols(target: ray.data.Dataset, agg: ray.data.Dataset,
                       field_names: List[str], mode: str,
                       src_keys: List[str], tgt_keys: List[str],
                       num_partitions: Optional[int]) -> ray.data.Dataset:
    """Columnar hash-shuffle join on the raw key columns.

    ``grouped_aggregate`` guarantees non-empty uniform-schema blocks (the
    round-1 column-less empty blocks that crashed Acero here are fixed at
    the root in ``stages/agg.py``), so no compaction is needed.
    """
    join_type = {"inner": "inner", "half-outer": "left_outer",
                 "full-outer": "full_outer"}[mode]
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(32, ncpu))
    tgt_cols = cheap_columns(target)
    clash = [c for c in field_names if c in tgt_cols]
    joined = target.join(agg, join_type=join_type,
                         num_partitions=num_partitions,
                         on=tuple(tgt_keys), right_on=tuple(src_keys),
                         left_suffix="__t", right_suffix="__s")

    def post(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for col in clash:
            s_col, t_col = f"{col}__s", f"{col}__t"
            if s_col in batch.column_names and t_col in batch.column_names:
                merged = pc.coalesce(batch[s_col], batch[t_col])
                batch = batch.drop_columns([s_col, t_col]).append_column(col, merged)
        if mode == "full-outer":
            # restore target key fields from the source key columns for
            # right-only rows (reference join.py:251-255)
            for tk, sk in zip(tgt_keys, src_keys):
                if tk in batch.column_names and sk in batch.column_names and tk != sk:
                    restored = pc.coalesce(batch[tk],
                                           pc.cast(batch[sk], batch[tk].type))
                    idx = batch.schema.get_field_index(tk)
                    batch = batch.set_column(idx, tk, restored)
        drop = [c for c in batch.column_names
                if c.endswith("__s") or c.endswith("__t")
                or (c in src_keys and c not in tgt_keys and c not in field_names)]
        return batch.drop_columns(drop) if drop else batch

    return joined.map_batches(post, batch_format="pyarrow",
                              batch_size=DEFAULT_BATCH_SIZE)


def _shuffle_join(keyed_target: ray.data.Dataset, agg: ray.data.Dataset,
                  field_names: List[str], mode: str, target_key: KeyCalc,
                  num_partitions: Optional[int]) -> ray.data.Dataset:
    join_type = {"inner": "inner", "half-outer": "left_outer",
                 "full-outer": "full_outer"}[mode]
    if num_partitions is None:
        # Size the join's aggregator pool to the session, not a constant:
        # Dataset.join spawns hash-aggregator actors per partition; asking
        # for more partitions than CPUs stalls small sessions and tests.
        import ray as _ray
        ncpu = int(_ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(32, ncpu))
    # Drop clashing non-key columns from the target (the source aggregate
    # wins for its field names — join.py:245 row.update(extra) semantics
    # apply only on hit; for shuffle path we suffix and coalesce).
    tgt_cols = cheap_columns(keyed_target)
    clash = [c for c in field_names if c in tgt_cols]
    joined = keyed_target.join(
        agg, join_type=join_type, num_partitions=num_partitions,
        on=(JOIN_KEY,), left_suffix="__t", right_suffix="__s")

    key_restore = [(f"__key_{i}__", kf) for i, kf in enumerate(target_key.key_list)] \
        if mode == "full-outer" else []

    def post(batch: pa.Table) -> pa.Table:
        # coalesce clashed columns: source value on hit else target value
        for col in clash:
            s_col, t_col = f"{col}__s", f"{col}__t"
            if s_col in batch.column_names and t_col in batch.column_names:
                import pyarrow.compute as pc
                merged = pc.coalesce(batch[s_col], batch[t_col])
                batch = batch.drop_columns([s_col, t_col]).append_column(col, merged)
        # full-outer: restore target key fields from preserved source keys
        for aux, kf in key_restore:
            if aux in batch.column_names and kf in batch.column_names:
                import pyarrow.compute as pc
                restored = pc.coalesce(batch[kf], pc.cast(batch[aux], batch[kf].type))
                idx = batch.schema.get_field_index(kf)
                batch = batch.set_column(idx, kf, restored)
        drop = [c for c in batch.column_names
                if c.startswith("__key_") or c == JOIN_KEY or c.endswith("__s") or c.endswith("__t")]
        return batch.drop_columns(drop) if drop else batch

    return joined.map_batches(post, batch_format="pyarrow",
                              batch_size=DEFAULT_BATCH_SIZE)


class join_with_self(Step):
    """Group-by: one output row per distinct key with finalized aggregates.

    Reference ``join.py:384-385`` (join_with_self = join with
    ``target_key=None``, ``source_delete=True``).
    """

    def __init__(self, resource_name: str, join_key, fields: Dict[str, Any],
                 resource_rename: Optional[str] = None):
        self.inner = join(resource_name, join_key, resource_name, None,
                          fields, source_delete=True)
        self.resource_rename = resource_rename
        self.name = f"join_with_self({resource_name})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        stream = self.inner.__flow_step__(stream)
        if self.resource_rename:
            src = self.inner.source_name
            ds = stream.get(src)
            stream.drop(src)
            stream.set(self.resource_rename, ds)
        return stream
