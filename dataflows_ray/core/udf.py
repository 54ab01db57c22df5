"""User-function adapters: row / rows / package UDFs over Arrow batches.

Parity targets:
- ``dataflows/helpers/row_processor.py:9-14`` — a ``row`` function receives a
  dict and either mutates it in place (returns None) or returns a replacement.
- ``dataflows/helpers/rows_processor.py`` — a ``rows`` function receives an
  iterator of row dicts and yields rows (may add/drop rows).
- ``dataflows/helpers/datapackage_processor.py`` — a ``package`` function
  receives the package, yields the (possibly modified) package then each
  resource.

Ray-Data mapping: row/rows UDFs run INSIDE ``map_batches`` — the batch is
converted to a list of dicts, the user function applied, and the result
rebuilt into an Arrow table. This is the documented escape hatch for
arbitrary Python logic; vectorized operators in ``stages/`` should be
preferred in hot paths. A ``rows`` UDF is per-batch by default (stateless,
scales out); pass ``stateful=True`` to run it as a single ordered actor so
generator state spans the whole resource like the reference's
single-threaded chain.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, List, Optional

import pyarrow as pa


def dispatch_kind(fn: Callable) -> str:
    """Classify a plain function by its first parameter name, mirroring
    reference ``base/flow.py:38-53``: ``row`` / ``rows`` / ``package``."""
    try:
        params = list(inspect.signature(fn).parameters.keys())
    except (TypeError, ValueError):
        return "row"
    if not params:
        return "package"
    first = params[0]
    if first in ("row", "rows", "package"):
        return first
    # Fall back like the reference: unknown first param -> treat as row fn
    return "row"


def rows_to_table(rows: List[Dict[str, Any]], schema_hint: Optional[pa.Schema]) -> pa.Table:
    """Build an Arrow table from row dicts, widening the schema for any new
    columns the UDF introduced (reference allows out-of-schema fields until
    validation — SURVEY §7.5 'Mutable-row UDF contract')."""
    if not rows:
        if schema_hint is not None:
            return schema_hint.empty_table()
        return pa.table({})
    # Union of keys in first-seen order
    names: List[str] = []
    for r in rows:
        for k in r.keys():
            if k not in names:
                names.append(k)
    import datetime as _dt
    import pandas as _pd

    cols = {}
    for name in names:
        values = [r.get(name) for r in rows]
        # tz-aware datetimes: pa.array() misinterprets them (stores the
        # wall time as UTC, shifting the instant by the offset); going
        # through a pandas Series converts correctly
        if any(isinstance(v, _dt.datetime) and v.tzinfo is not None
               for v in values):
            if any(isinstance(v, _dt.datetime) and v.tzinfo is None
                   for v in values):
                # MIXED naive + aware datetimes in one column: a single
                # Arrow timestamp type cannot represent both (reference
                # rows are plain Python and keep each as-is —
                # test_lib.py:1276); store as a pickled-object extension
                # column, which round-trips parquet exactly
                from ray.data.extensions.object_extension import (
                    ArrowPythonObjectArray)
                cols[name] = ArrowPythonObjectArray.from_objects(values)
                continue
            try:
                cols[name] = pa.array(_pd.Series(values))
                continue
            except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError):
                pass
        # sets (and other arrow-lossy Python values) must not degrade to
        # lists: store as Ray's pickled-object extension column
        if any(isinstance(v, (set, frozenset)) for v in values):
            from ray.data.extensions.object_extension import ArrowPythonObjectArray
            cols[name] = ArrowPythonObjectArray.from_objects(values)
            continue
        typ = None
        if schema_hint is not None and schema_hint.get_field_index(name) >= 0:
            typ = schema_hint.field(name).type
        if typ is not None:
            try:
                cols[name] = pa.array(values, type=typ)
                continue
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                pass
        cols[name] = pa.array(values)
    return pa.table(cols)


def make_row_batch_fn(fn: Callable[[Dict[str, Any]], Any]) -> Callable[[pa.Table], pa.Table]:
    """Wrap a reference-style row function into a batch function."""

    def _apply(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out: List[Dict[str, Any]] = []
        for row in rows:
            result = fn(row)
            if result is None:
                out.append(row)  # mutated in place (row_processor.py:10-13)
            elif isinstance(result, dict):
                out.append(result)
            else:
                # generator-style row fn yielding rows
                try:
                    out.extend(result)
                except TypeError:
                    out.append(row)
        return rows_to_table(out, batch.schema)

    return _apply


def make_rows_batch_fn(fn: Callable) -> Callable[[pa.Table], pa.Table]:
    """Wrap a reference-style rows (iterator->iterator) function into a
    per-batch function. Cross-batch state is NOT carried (use
    ``stateful=True`` at the call site for that)."""

    def _apply(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = list(fn(iter(rows)))
        return rows_to_table(out, batch.schema)

    return _apply


def apply_stateful_rows(ds, fn: Callable):
    """Run a stateful ``rows`` UDF with reference whole-resource generator
    semantics (``rows_processor.py``): ONE persistent generator sees every
    row of the resource, in order, and may carry state (running totals,
    seen-sets) across the entire stream and emit trailing rows at the end.

    Mapping: the resource's blocks are collected as ORDERED refs (the
    library forces ``preserve_order`` for this collection — it does not
    rely on callers configuring it) and streamed through a single dynamic-
    generator Ray task that pulls one block at a time (bounded memory) and
    yields output tables as the generator produces them. Sequential by
    construction — exactly the semantics the reference's single-threaded
    chain has; use the stateless per-batch form to scale out.
    """
    import ray
    import ray.data

    prev = ds.context.execution_options.preserve_order
    ds.context.execution_options.preserve_order = True
    try:
        refs = [ref for bundle in ds.iter_internal_ref_bundles()
                for ref, _meta in bundle.blocks]
    finally:
        ds.context.execution_options.preserve_order = prev

    # NOTE refs are shipped inside a LIST on purpose: top-level ObjectRef
    # args would be auto-resolved (all blocks materialized at once); a list
    # of refs is not, so the task can ray.get one block at a time.
    @ray.remote(num_returns="dynamic")
    def _drive_list(fn, block_refs, schema):
        import pyarrow as _pa

        def row_iter():
            for r in block_refs:
                blk = ray.get(r)  # one block at a time — bounded memory
                if not isinstance(blk, _pa.Table):
                    blk = _pa.Table.from_pandas(blk, preserve_index=False)
                yield from blk.to_pylist()

        CHUNK = 8192
        buf: List[Dict[str, Any]] = []
        for out_row in fn(row_iter()):
            buf.append(out_row)
            if len(buf) >= CHUNK:
                yield rows_to_table(buf, schema)
                buf = []
        if buf or not block_refs:
            yield rows_to_table(buf, schema)

    schema = None
    try:
        sch = ds.schema(fetch_if_missing=True)
        schema = pa.schema(list(zip(sch.names, sch.types)))
    except Exception:
        pass
    out_gen = ray.get(_drive_list.remote(fn, refs, schema))
    out_refs = list(out_gen)
    if not out_refs:
        return ds.limit(0)
    return ray.data.from_arrow_refs(out_refs)
