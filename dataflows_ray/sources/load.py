"""Sources: ``load`` (files -> resource) and ``iterable_loader``.

Parity target: reference ``dataflows/processors/load.py:40-302`` (format
dispatch, ``limit_rows``, name defaulting) and
``dataflows/helpers/iterable_loader.py:13-118`` (in-memory iterables become
resources; list rows become ``col0..colN``; schema inferred from a sample).

Ray-Data mapping: native ``read_parquet`` / ``read_csv`` / ``read_json``
with column pruning pushed into the read; ``limit_rows`` -> ``ds.limit``.
``row_ids=True`` assigns a deterministic global ``__row_id__`` so
order-sensitive operators (dedup keep-first, stable sort, first/last
aggregators) have a total order to anchor on in a parallel engine
(SURVEY §7.5 'Order-sensitive semantics'). For parquet this is done
scale-correctly: the driver reads only file/row-group METADATA to compute
global offsets, then each Ray task reads one row group and attaches
``offset + arange(n)`` — no serial pass over the data.
"""

from __future__ import annotations

import os
from typing import Any, Iterable, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..core.flow import Step
from ..core.package import PackageStream, ResourceDescriptor

ROW_ID = "__row_id__"


class _RowGroupReader:
    """Stateless batch fn: reads one parquet row group and attaches row ids."""

    def __init__(self, columns: Optional[List[str]] = None):
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for task in batch.to_pylist():
            pf = pq.ParquetFile(task["path"])
            tbl = pf.read_row_group(task["row_group"], columns=self.columns)
            rid = pa.array(
                np.arange(task["offset"], task["offset"] + len(tbl), dtype=np.int64))
            out.append(tbl.append_column(ROW_ID, rid))
        return pa.concat_tables(out) if out else batch.schema.empty_table()


def read_parquet_with_row_ids(
    path: str, columns: Optional[List[str]] = None
) -> ray.data.Dataset:
    """Parquet read with a deterministic global ``__row_id__`` column.

    Driver cost is metadata-only (row counts per row group); data is read in
    parallel, one task per row group.
    """
    paths: List[str] = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            paths.extend(
                os.path.join(root, f) for f in sorted(files) if f.endswith(".parquet"))
        paths.sort()
    else:
        paths = [path]
    tasks = []
    offset = 0
    for p in paths:
        meta = pq.read_metadata(p)
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            tasks.append({"path": p, "row_group": rg, "offset": offset})
            offset += n
    src = ray.data.from_items(tasks)
    return src.map_batches(
        _RowGroupReader(columns), batch_format="pyarrow", batch_size=1)


class load(Step):
    """Load a file (or glob/dir) as a named resource.

    Formats: parquet (default for ``.parquet``), csv, json (array), ndjson.
    ``columns`` prunes at the read (parquet). ``limit_rows`` limits lazily.
    """

    def __init__(
        self,
        source: str,
        name: Optional[str] = None,
        format: Optional[str] = None,
        limit_rows: Optional[int] = None,
        columns: Optional[List[str]] = None,
        row_ids: bool = False,
        override_num_blocks: Optional[int] = None,
    ):
        self.source = source
        self.format = format or self._guess_format(source)
        self.resource_name = name or self._default_name(source)
        self.name = f"load({self.resource_name})"
        self.limit_rows = limit_rows
        self.columns = columns
        self.row_ids = row_ids
        self.override_num_blocks = override_num_blocks

    @staticmethod
    def _guess_format(source: str) -> str:
        for ext, fmt in ((".parquet", "parquet"), (".csv", "csv"),
                         (".ndjson", "ndjson"), (".jsonl", "ndjson"),
                         (".json", "json"), (".tsv", "tsv")):
            if source.endswith(ext):
                return fmt
        return "parquet"

    @staticmethod
    def _default_name(source: str) -> str:
        base = os.path.basename(source.rstrip("/"))
        return os.path.splitext(base)[0] or "res"

    def _read(self) -> ray.data.Dataset:
        kwargs = {}
        if self.override_num_blocks:
            kwargs["override_num_blocks"] = self.override_num_blocks
        if self.format == "parquet":
            if self.row_ids:
                return read_parquet_with_row_ids(self.source, columns=self.columns)
            return ray.data.read_parquet(self.source, columns=self.columns, **kwargs)
        if self.format in ("csv", "tsv"):
            import pyarrow.csv as pacsv
            parse_options = pacsv.ParseOptions(
                delimiter="\t" if self.format == "tsv" else ",")
            ds = ray.data.read_csv(self.source, parse_options=parse_options, **kwargs)
        elif self.format == "ndjson":
            ds = ray.data.read_json(self.source, **kwargs)
        elif self.format == "json":
            # JSON array-of-objects: small config files; read driver-side.
            import json
            with open(self.source) as f:
                rows = json.load(f)
            ds = ray.data.from_items(rows)
        else:
            raise ValueError(f"Unsupported load format: {self.format}")
        if self.columns:
            ds = ds.select_columns(self.columns)
        return ds

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        ds = self._read()
        if self.limit_rows:
            ds = ds.limit(self.limit_rows)
        stream.set(self.resource_name, ds)
        stream.package.add(ResourceDescriptor(name=self.resource_name,
                                              metadata={"path": self.source}))
        return stream


class iterable_loader(Step):
    """Wrap an in-memory iterable of dicts (or lists) as a resource.

    Reference ``helpers/iterable_loader.py:81-118``: list rows become
    ``col0..colN``; dict rows keep keys. The iterable is drained driver-side
    (in-memory inputs are small by construction) and becomes Arrow blocks.
    """

    _counter = [0]

    def __init__(self, iterable: Iterable[Any], name: Optional[str] = None,
                 row_ids: bool = False):
        self.iterable = iterable
        if name is None:
            iterable_loader._counter[0] += 1
            name = f"res_{iterable_loader._counter[0]}"
        self.resource_name = name
        self.name = f"iterable_loader({name})"
        self.row_ids = row_ids

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        rows = []
        for i, item in enumerate(self.iterable):
            if isinstance(item, dict):
                row = dict(item)
            elif isinstance(item, (list, tuple)):
                row = {f"col{j}": v for j, v in enumerate(item)}
            else:
                row = {"col0": item}
            if self.row_ids:
                row[ROW_ID] = i
            rows.append(row)
        if rows:
            table = pa.Table.from_pylist(rows)
            ds = ray.data.from_arrow(table)
        else:
            ds = ray.data.from_items([])
        stream.set(self.resource_name, ds)
        return stream
