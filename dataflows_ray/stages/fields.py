"""Field-level operators: add / compute / select / delete / rename.

Parity targets:
- ``dataflows/processors/add_field.py:4-17``
- ``dataflows/processors/add_computed_field.py:8-100`` (ops
  sum/avg/max/min/multiply/constant/join/format over non-null source values,
  plus arbitrary callables; output-type rules at ``:22-34``)
- ``dataflows/processors/select_fields.py:18-55`` (regex expansion, error on
  no match), ``delete_fields.py:15-51``, ``rename_fields.py:14-61`` (regex
  rename with backrefs, collision assert).

Ray-Data mapping: numeric ops are vectorized numpy over the Arrow batch
(nan-aware to mirror the reference's 'skip None values' rule); string ops
(``join``/``format``) and callable ops run as an in-batch loop (the escape
hatch). Projections/renames are plan-time ``select_columns`` /
``drop_columns`` / ``rename_columns`` — no data movement.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream, select_resources
from ..core.raycompat import cheap_columns

_INT_TYPES = (pa.int8(), pa.int16(), pa.int32(), pa.int64(),
              pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64())


class add_field(Step):
    """Append a column with a constant or per-row default.

    Reference ``processors/add_field.py:4-17``.
    """

    def __init__(self, name: str, type: Optional[str] = None, default: Any = None,
                 resources=None, **options):
        self.field_name = name
        self.field_type = type
        self.default = default
        self.resources = resources
        self.options = options
        self.name = f"add_field({name})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        fname, default = self.field_name, self.default
        if callable(default):
            def fn(batch: pa.Table) -> pa.Table:
                rows = batch.to_pylist()
                values = [default(r) for r in rows]
                return batch.append_column(fname, pa.array(values))
        else:
            arrow_type = _frictionless_to_arrow(self.field_type)
            def fn(batch: pa.Table) -> pa.Table:
                if default is None:
                    col = pa.nulls(len(batch), type=arrow_type or pa.string())
                else:
                    col = pa.array([default] * len(batch), type=arrow_type)
                return batch.append_column(fname, col)
        for rname in select_resources(stream, self.resources):
            stream.set(rname, stream.get(rname).map_batches(
                fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
            stream.descriptor(rname).fields.append(
                {"name": fname, "type": self.field_type, **self.options})
        return stream


def _frictionless_to_arrow(t: Optional[str]):
    return {
        "integer": pa.int64(), "number": pa.float64(), "string": pa.string(),
        "boolean": pa.bool_(), "date": pa.date32(),
        "datetime": pa.timestamp("us"), "any": None, None: None,
    }.get(t)


def _numeric_matrix(batch: pa.Table, sources: Sequence[str]) -> np.ndarray:
    """Stack source columns as float64 with NaN for nulls (row-wise kernels)."""
    cols = []
    for s in sources:
        arr = batch[s].to_numpy(zero_copy_only=False)
        cols.append(np.asarray(arr, dtype=np.float64))
    return np.vstack(cols) if cols else np.zeros((0, len(batch)))


class add_computed_field(Step):
    """Append computed field(s): named op over source columns or callable.

    Ops (reference ``add_computed_field.py:8-25``): ``sum avg max min
    multiply`` (nulls skipped per row), ``constant`` (the ``with`` value),
    ``join`` (stringify + join with ``with`` separator), ``format``
    (``with``-string ``.format(**row)``); or ``operation=callable(row)``.
    """

    def __init__(self, *args, resources=None, **kw):
        assert len(args) < 2, "add_computed_field expects at most one positional arg"
        self.fields: List[Dict[str, Any]] = args[0] if args else [kw]
        self.resources = resources
        self.name = "add_computed_field"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        specs = []
        for f in self.fields:
            target = f["target"]
            tname = target if isinstance(target, str) else target["name"]
            specs.append({
                "target": tname,
                "operation": f["operation"],
                "source": list(f.get("source", [])),
                "with": f.get("with", f.get("with_", "")),
            })

        def fn(batch: pa.Table) -> pa.Table:
            for spec in specs:
                batch = _apply_computed(batch, spec)
            return batch

        for rname in select_resources(stream, self.resources):
            stream.set(rname, stream.get(rname).map_batches(
                fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
            # record dict targets (name/type/...) in the schema, as the
            # reference's process_datapackage does
            desc = stream.descriptor(rname)
            for f in self.fields:
                target = f["target"]
                if isinstance(target, dict):
                    fd = desc.field_descriptor(target["name"])
                    if fd is None:
                        desc.fields.append(dict(target))
                    else:
                        fd.update(target)
        return stream


def _apply_computed(batch: pa.Table, spec: Dict[str, Any]) -> pa.Table:
    op = spec["operation"]
    target, sources, with_ = spec["target"], spec["source"], spec["with"]
    n = len(batch)
    if callable(op):
        rows = batch.to_pylist()
        col = pa.array([op(r) for r in rows])
    elif op == "constant":
        col = pa.array([with_] * n)
    elif op in ("sum", "avg", "max", "min", "multiply"):
        m = _numeric_matrix(batch, sources)  # (k, n) with NaN for nulls
        if op == "sum":
            vals = np.nansum(m, axis=0)
        elif op == "avg":
            vals = np.nanmean(m, axis=0)
        elif op == "max":
            vals = np.nanmax(m, axis=0)
        elif op == "min":
            vals = np.nanmin(m, axis=0)
        else:
            vals = np.nanprod(m, axis=0)
        all_int = all(batch.schema.field(s).type in _INT_TYPES for s in sources)
        if all_int and op != "avg" and not np.isnan(vals).any():
            col = pa.array(vals.astype(np.int64))
        else:
            col = pa.array(vals, type=pa.float64())
    elif op == "join":
        from ..core.strformat import try_vector_join
        col = try_vector_join(batch, sources, with_)
        if col is None:  # non-int/string sources: exact row-loop fallback
            arrays = [batch[s].to_pylist() for s in sources]
            col = pa.array([
                with_.join(str(v) for v in vals if v is not None)
                for vals in zip(*arrays)
            ] if arrays else [""] * n, type=pa.string())
    elif op == "format":
        from ..core.strformat import try_vector_format
        col = try_vector_format(batch, with_)
        if col is None:  # format specs / exotic types: row-loop fallback
            rows = batch.to_pylist()
            col = pa.array([with_.format(**r) for r in rows],
                           type=pa.string())
    else:
        raise ValueError(f"Unknown operation: {op}")
    if target in batch.column_names:
        batch = batch.drop_columns([target])
    return batch.append_column(target, col)


class derive(Step):
    """Engine extension (no reference equivalent): a VECTORIZED computed
    column — ``fn`` receives the Arrow batch and returns the new column
    (pa.Array / np.ndarray). This is the scale-correct alternative to
    ``add_computed_field(operation=callable)``'s per-row loop; use it in
    hot paths."""

    def __init__(self, name: str, fn: Callable[[pa.Table], Any], resources=None):
        self.field_name = name
        self.fn = fn
        self.resources = resources
        self.name = f"derive({name})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        fname, fn = self.field_name, self.fn

        def batch_fn(batch: pa.Table) -> pa.Table:
            col = fn(batch)
            if not isinstance(col, (pa.Array, pa.ChunkedArray)):
                col = pa.array(col)
            if fname in batch.column_names:
                batch = batch.drop_columns([fname])
            # stale pandas schema metadata would re-impose the OLD dtype on
            # a replaced column at to_pandas() time — drop it
            return batch.append_column(fname, col) \
                        .replace_schema_metadata(None)

        for rname in select_resources(stream, self.resources):
            stream.set(rname, stream.get(rname).map_batches(
                batch_fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
        return stream


def _expand_regex(patterns: Sequence[str], columns: List[str]) -> List[str]:
    out: List[str] = []
    for p in patterns:
        rx = re.compile("^" + p + "$")
        matched = [c for c in columns if rx.match(c)]
        out.extend(m for m in matched if m not in out)
    return out


class select_fields(Step):
    """Project + reorder columns by regex/name list; error if none match.

    Reference ``processors/select_fields.py:18-55``. Plan-time only.
    """

    def __init__(self, fields: Sequence[str], resources=None):
        self.patterns = list(fields)
        self.resources = resources
        self.name = f"select_fields({self.patterns})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            cols = cheap_columns(ds)
            keep = _expand_regex(self.patterns, cols)
            if not keep:
                raise ValueError(
                    f"select_fields: no fields match {self.patterns} in {cols}")
            stream.set(rname, ds.select_columns(keep))
        return stream


class delete_fields(Step):
    """Drop columns by regex/name (reference ``delete_fields.py:15-51``)."""

    def __init__(self, fields: Sequence[str], resources=None):
        self.patterns = list(fields)
        self.resources = resources
        self.name = f"delete_fields({self.patterns})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            drop = _expand_regex(self.patterns, cheap_columns(ds))
            if drop:
                stream.set(rname, ds.drop_columns(drop))
        return stream


class rename_fields(Step):
    """Regex-rename columns with backref support (``\\1``); collision check.

    Reference ``processors/rename_fields.py:14-61``. Plan-time only.
    """

    def __init__(self, fields: Dict[str, str], resources=None):
        self.mapping_patterns = dict(fields)
        self.resources = resources
        self.name = "rename_fields"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            cols = cheap_columns(ds)
            mapping: Dict[str, str] = {}
            for pattern, repl in self.mapping_patterns.items():
                rx = re.compile("^" + pattern + "$")
                for c in cols:
                    m = rx.match(c)
                    if m:
                        mapping[c] = rx.sub(repl, c)
            new_names = [mapping.get(c, c) for c in cols]
            assert len(set(new_names)) == len(new_names), \
                f"rename_fields collision: {new_names}"
            if mapping:
                stream.set(rname, ds.rename_columns(mapping))
        return stream
