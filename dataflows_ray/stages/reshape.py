"""Reshape operators: unpivot, concatenate, duplicate, delete_resource,
sources, conditional, printer, update_stats, finalizer.

Parity targets:
- ``dataflows/processors/unpivot.py:13-88`` — wide->long melt: for each
  input row, emit one row per unpivot field in order (extra key values,
  kept fields, melted value). Regex field matching with ``\\1``-substituted
  key values.
- ``dataflows/processors/concatenate.py:6-121`` — union N matched
  resources into one target; source col -> target col mapping; unmapped
  target cols null; asserts at least one non-null mapped value per row.
- ``dataflows/processors/duplicate.py:24-71`` — copy a resource. Ray
  Datasets are immutable lazy plans, so this is plan aliasing (no buffer).
- ``dataflows/processors/delete_resource.py:7-24``,
  ``processors/sources.py:6-32``, ``processors/conditional.py:4-20``,
  ``processors/printer.py:38-88``, ``processors/update_stats.py:4-7``,
  ``processors/finalizer.py:6-22``.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..core.flow import Flow, Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream, select_resources
from ..core.raycompat import cheap_columns


class unpivot(Step):
    def __init__(self, unpivot_fields: Sequence[Dict], extra_keys: Sequence[Dict],
                 extra_value: Dict, regex: bool = True, resources=None):
        self.unpivot_fields = list(unpivot_fields)
        self.extra_keys = list(extra_keys)
        self.extra_value = dict(extra_value)
        self.regex = regex
        self.resources = resources
        self.name = "unpivot"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            cols = cheap_columns(ds)
            melt: List[Dict[str, Any]] = []  # [{'name': col, 'keys': {...}}]
            keep = list(cols)
            for u in self.unpivot_fields:
                if self.regex:
                    rx = re.compile(u["name"])
                    matched = [c for c in keep if rx.fullmatch(c)]
                else:
                    matched = [c for c in keep if c == u["name"]]
                keep = [c for c in keep if c not in matched]
                for col in matched:
                    keys = {}
                    for k, v in u["keys"].items():
                        if self.regex and isinstance(v, str):
                            v = re.sub(u["name"], v, col)
                        keys[k] = v
                    melt.append({"name": col, "keys": keys})
            value_name = self.extra_value["name"]
            key_names = [k["name"] for k in self.extra_keys]
            key_types = {k["name"]: k.get("type") for k in self.extra_keys}

            def fn(batch: pa.Table, melt=melt, keep=keep,
                   key_names=key_names, key_types=key_types,
                   value_name=value_name) -> pa.Table:
                # Row-major melt: for each input row, each melted field in
                # order (unpivot.py:13-21). Build per-melted-column slices
                # then interleave by original row index.
                # (per-resource state bound via default args: Ray serializes
                # UDFs lazily, so a loop-variable closure would melt every
                # resource with the LAST resource's settings)
                n = len(batch)
                vtype_any = self.extra_value.get("type") in (None, "any")
                mixed_any = (vtype_any and len(
                    {str(batch[m["name"]].type) for m in melt}) > 1)
                pieces = []
                for m in melt:
                    cols_out: Dict[str, Any] = {}
                    for kn in key_names:
                        kv = m["keys"].get(kn)
                        if key_types.get(kn) == "integer":
                            kv = int(kv)
                        elif key_types.get(kn) == "number":
                            kv = float(kv)
                        cols_out[kn] = pa.array([kv] * n)
                    for kc in keep:
                        cols_out[kc] = batch[kc]
                    vcol = batch[m["name"]]
                    vtype = self.extra_value.get("type")
                    if vtype in ("number", "integer"):
                        target = pa.float64() if vtype == "number" else pa.int64()
                        vcol = pa.compute.cast(vcol, target)
                    elif vtype == "string":
                        vcol = pa.compute.cast(vcol, pa.string())
                    elif mixed_any:
                        # type 'any' melting heterogeneous columns: keep
                        # each value's original Python type (reference
                        # test_lib.py:223 expects int 0 next to str "0")
                        # via the pickled-object extension column
                        from ray.data.extensions.object_extension import (
                            ArrowPythonObjectArray)
                        vcol = ArrowPythonObjectArray.from_objects(
                            vcol.to_pylist())
                    cols_out[value_name] = vcol
                    cols_out["__melt_row__"] = pa.array(range(n), type=pa.int64())
                    pieces.append(pa.table(cols_out))
                if not pieces:
                    return pa.table({})
                out = pa.concat_tables(pieces)
                # stable sort by original row index to get row-major order
                idx = pa.compute.sort_indices(
                    out, sort_keys=[("__melt_row__", "ascending")])
                return out.take(idx).drop_columns(["__melt_row__"])

            stream.set(rname, ds.map_batches(
                fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
        return stream


def _coalesce(col, nxt):
    """nxt-if-valid-else-col, tolerating alias columns of DIFFERENT Arrow
    types (the reference's per-row dict update coalesces any types —
    concatenate.py:9-19). Same-type fast path is one ``if_else`` kernel;
    mismatches try a permissive type promotion first and fall back to the
    pickled-object extension column used for 'any' elsewhere."""
    if col.type == nxt.type:
        return pc.if_else(pc.is_valid(nxt), nxt, col)
    try:
        unified = pa.unify_schemas(
            [pa.schema([("x", col.type)]), pa.schema([("x", nxt.type)])],
            promote_options="permissive").field("x").type
        return pc.if_else(pc.is_valid(nxt), nxt.cast(unified),
                          col.cast(unified))
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError,
            TypeError):
        from ray.data.extensions.object_extension import (
            ArrowPythonObjectArray)
        nv = nxt.to_pylist()
        cv = col.to_pylist()
        return ArrowPythonObjectArray.from_objects(
            [n if n is not None else c for n, c in zip(nv, cv)])


class concatenate(Step):
    def __init__(self, fields: Dict[str, Optional[List[str]]],
                 target: Optional[Dict] = None, resources=None):
        self.fields = dict(fields)
        self.target = dict(target or {})
        self.resources = resources
        self.name = "concatenate"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        target_name = self.target.get("name", "concat")
        # source col -> target col mapping (concatenate.py:38-52)
        mapping: Dict[str, str] = {}
        for tgt, srcs in self.fields.items():
            if srcs is not None:
                for s in srcs:
                    if s in mapping:
                        raise RuntimeError(f"Duplicate appearance of {s}")
                    mapping[s] = tgt
            if tgt in mapping:
                raise RuntimeError(f"Duplicate appearance of {tgt}")
            mapping[tgt] = tgt
        target_fields = list(self.fields.keys())

        matched = select_resources(stream, self.resources)
        parts = []
        for rname in matched:
            ds = stream.get(rname)
            cols = cheap_columns(ds)
            local_map = {c: mapping[c] for c in cols if c in mapping}

            def fn(batch: pa.Table, local_map=local_map) -> pa.Table:
                out: Dict[str, Any] = {}
                for tf in target_fields:
                    # ALL aliases present in this resource coalesce into
                    # the target; reference concatenator (concatenate.py:
                    # 9-19) dict-updates non-null values in row order, so
                    # the LAST non-null column wins (test_lib.py:472)
                    srcs = [s for s in batch.column_names
                            if local_map.get(s) == tf]
                    if srcs:
                        col = batch[srcs[0]]
                        for s in srcs[1:]:
                            nxt = batch[s]
                            if nxt.null_count == len(batch):
                                continue
                            if col.null_count == len(batch):
                                col = nxt
                                continue
                            col = _coalesce(col, nxt)
                        out[tf] = col
                    else:
                        out[tf] = pa.nulls(len(batch), type=pa.string())
                return pa.table(out)

            parts.append(ds.map_batches(fn, batch_format="pyarrow",
                                        batch_size=DEFAULT_BATCH_SIZE))
            stream.drop(rname)
        if not parts:
            raise ValueError("concatenate: no resources matched")
        result = parts[0]
        if len(parts) > 1:
            result = result.union(*parts[1:])
        stream.set(target_name, result)
        return stream


class duplicate(Step):
    """Plan aliasing: Datasets are immutable lazy plans — no buffering
    needed (unlike reference ``duplicate.py:24-47`` KVFile buffer)."""

    def __init__(self, source: str = None, target_name: str = None,
                 position: str = "after", duplicate_to_end: bool = False):
        # reference duplicate.py:30-34 defaults: source = first resource,
        # target = '<source>_copy' (resolved at plan time when None)
        self.source = source
        self.target_name = target_name
        # reference duplicate.py:27: copy emits right after the source
        # resource unless duplicate_to_end
        self.to_end = duplicate_to_end or position == "end"
        self.name = f"duplicate({source})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        if self.source is None:
            self.source = stream.resource_names()[0]
        if self.target_name is None:
            self.target_name = f"{self.source}_copy"
        stream.set(self.target_name, stream.get(self.source))
        if not self.to_end:
            # reorder: place the copy immediately after its source, in
            # both the descriptor map and the dataset map (results order)
            order = [n for n in stream.datasets if n != self.target_name]
            idx = order.index(self.source) + 1
            order = order[:idx] + [self.target_name] + order[idx:]
            stream.package.resources = {
                n: stream.package.resources[n] for n in order
                if n in stream.package.resources}
            stream.datasets = {n: stream.datasets[n] for n in order}
        return stream


class delete_resource(Step):
    def __init__(self, resources):
        self.resources = resources
        self.name = "delete_resource"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            stream.drop(rname)
        return stream


class sources(Step):
    """Run N sub-flows and append their resources (``sources.py:6-32``)."""

    def __init__(self, *flows):
        # reference sources.py accepts flows OR raw iterables/steps;
        # anything that isn't a Flow becomes a one-step Flow
        self.flows = [f if isinstance(f, Flow) else Flow(f) for f in flows]
        self.name = "sources"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for flow in self.flows:
            sub = flow._run()
            for rname in sub.resource_names():
                stream.set(rname, sub.get(rname))
                stream.package.resources[rname] = sub.package.resources.get(
                    rname, stream.descriptor(rname))
            stream.stats.extend(sub.stats)
        return stream


class conditional(Step):
    """If ``predicate(stream)`` then splice in ``flow`` (may be a callable
    building the flow from the stream) — ``conditional.py:4-20``."""

    def __init__(self, predicate: Callable, flow):
        self.predicate = predicate
        self.flow = flow
        self.name = "conditional"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        if self.predicate(stream):
            flow = self.flow(stream) if callable(self.flow) and not isinstance(self.flow, Flow) else self.flow
            return flow._run(initial=stream)
        return stream


class update_stats(Step):
    def __init__(self, stats: Dict[str, Any]):
        self.stats = dict(stats)
        self.name = "update_stats"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        stream.stats.append(self.stats)
        return stream


class finalizer(Step):
    """Register a callback to run after execution (``finalizer.py:6-22``).
    With lazy Datasets, callbacks fire when the flow is consumed
    (``results()`` / ``process()``) — we run it at plan end, passing the
    stream's merged stats lazily via a closure."""

    def __init__(self, callback: Callable):
        self.callback = callback
        self.name = "finalizer"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        import inspect
        params = list(inspect.signature(self.callback).parameters)
        if params:
            self.callback(stream.merged_stats())
        else:
            self.callback()
        return stream


class printer(Step):
    """Debug print of first N rows — ``printer.py:38-88``; bounded
    materialization via ``limit``."""

    def __init__(self, num_rows: int = 10, resources=None, **_kw):
        self.num_rows = num_rows
        self.resources = resources
        self.name = "printer"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            rows = stream.get(rname).limit(self.num_rows).take_all()
            print(f"{rname}:")
            for r in rows:
                print("  ", r)
        return stream


def unnest_list(ds: "ray.data.Dataset", list_col: str,
                pos_col: str = "pos", value_col: str = "val",
                drop_list: bool = True) -> "ray.data.Dataset":
    """Explode a list column to one row per element with its 1-based
    ordinality (SQL ``unnest ... WITH ORDINALITY``). Null/empty lists
    yield no rows (SQL semantics). Fully vectorized inside the batch:
    one flatten + offset diff + ``np.repeat`` of the scalar columns —
    the explode is per-block, so output blocks stay bounded by input
    block size x max list length."""
    import numpy as np
    import pyarrow as pa

    def fn(batch: pa.Table, list_col=list_col) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        counts = np.diff(offs)
        # null lists report their validity, not their length
        valid = np.asarray(pa.compute.is_valid(col))
        counts = np.where(valid, counts, 0)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        pos = (np.arange(int(counts.sum()), dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(counts)])[:-1],
                           counts) + 1)
        out = batch.drop_columns([list_col]) if drop_list else batch
        out = out.take(pa.array(idx))
        out = out.append_column(pos_col, pa.array(pos))
        return out.append_column(value_col, flat.take(pa.array(
            np.repeat(offs[:-1], counts)
            + (pos - 1))))
    import ray.data  # noqa: F401  (type hint only)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
