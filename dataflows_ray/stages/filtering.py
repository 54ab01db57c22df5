"""Row filters and regex substitution.

Parity targets:
- ``dataflows/processors/filter_rows.py:4-37`` — keep rows matching a
  callable condition, or legacy ``equals`` (OR of per-key equality) /
  ``not_equals`` (OR of per-key inequality) dicts; the two legacy lists
  combine with OR.
- ``dataflows/processors/find_replace.py:6-28`` — chained ``re.sub`` per
  field; the reference coerces cell values to ``str`` first, so the output
  column is always string-typed.

Ray-Data mapping: legacy dict conditions compile to vectorized
``pyarrow.compute`` boolean masks (no Python per row); callable conditions
fall back to an in-batch row loop. ``find_replace`` is
``pc.replace_substring_regex`` chained per pattern after a string cast.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream, select_resources


class filter_rows(Step):
    def __init__(self, condition: Optional[Callable[[dict], bool]] = None,
                 equals: Sequence[Dict[str, Any]] = (),
                 not_equals: Sequence[Dict[str, Any]] = (),
                 batch_predicate: Optional[Callable[[pa.Table], Any]] = None,
                 resources=None):
        self.condition = condition
        self.equals = list(equals)
        self.not_equals = list(not_equals)
        # engine extension: vectorized predicate batch -> boolean mask
        # (the scale-correct path; `condition` is the per-row escape hatch)
        self.batch_predicate = batch_predicate
        self.resources = resources
        self.name = "filter_rows"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        if self.batch_predicate is not None:
            pred = self.batch_predicate

            def fn(batch: pa.Table) -> pa.Table:
                mask = pred(batch)
                if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
                    mask = pa.array(mask)
                return batch.filter(pc.fill_null(pc.cast(mask, pa.bool_()), False))
        elif self.condition is not None:
            cond = self.condition

            def fn(batch: pa.Table) -> pa.Table:
                mask = [bool(cond(r)) for r in batch.to_pylist()]
                return batch.filter(pa.array(mask, type=pa.bool_()))
        else:
            equals, not_equals = self.equals, self.not_equals

            def fn(batch: pa.Table) -> pa.Table:
                mask = pa.array([False] * len(batch), type=pa.bool_())
                # OR over every (key, value) in every equals dict
                for cond_dict in equals:
                    for k, v in cond_dict.items():
                        mask = pc.or_kleene(mask, pc.equal(batch[k], pa.scalar(v)))
                for cond_dict in not_equals:
                    for k, v in cond_dict.items():
                        mask = pc.or_kleene(mask, pc.not_equal(batch[k], pa.scalar(v)))
                return batch.filter(pc.fill_null(mask, False))
        for rname in select_resources(stream, self.resources):
            stream.set(rname, stream.get(rname).map_batches(
                fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
        return stream


class find_replace(Step):
    """fields = [{'name': col, 'patterns': [{'find': rx, 'replace': s}, ...]}]"""

    def __init__(self, fields: Sequence[Dict[str, Any]], resources=None):
        self.fields = list(fields)
        self.resources = resources
        self.name = "find_replace"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        fields = self.fields

        def fn(batch: pa.Table) -> pa.Table:
            for field in fields:
                col_name = field["name"]
                col = batch[col_name]
                if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
                    col = pc.cast(col, pa.string())
                for pattern in field.get("patterns", []):
                    col = pc.replace_substring_regex(
                        col, pattern=str(pattern["find"]),
                        replacement=str(pattern["replace"]))
                idx = batch.schema.get_field_index(col_name)
                batch = batch.set_column(idx, col_name, col)
            return batch

        for rname in select_resources(stream, self.resources):
            stream.set(rname, stream.get(rname).map_batches(
                fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
        return stream
