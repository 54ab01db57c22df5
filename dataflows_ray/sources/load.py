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
from typing import Any, Dict, Iterable, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..core.flow import Step, DEFAULT_BATCH_SIZE
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

    # reference load.py:42-48 strategy constants
    INFER_STRINGS = "strings"
    INFER_PYTHON_TYPES = "pytypes"
    INFER_FULL = "full"
    CAST_TO_STRINGS = "strings"
    CAST_DO_NOTHING = "nothing"
    CAST_WITH_SCHEMA = "schema"
    ERRORS_IGNORE = "ignore"
    ERRORS_DROP = "drop"
    ERRORS_RAISE = "raise"

    def __init__(
        self,
        source: str,
        name: Optional[str] = None,
        format: Optional[str] = None,
        limit_rows: Optional[int] = None,
        columns: Optional[List[str]] = None,
        row_ids: bool = False,
        override_num_blocks: Optional[int] = None,
        override_schema: Optional[dict] = None,
        extract_missing_values=None,
        deduplicate_headers: bool = False,
        deduplicate_headers_case_sensitive: bool = True,
        deduplicate_headers_format: str = " (%s)",
        table: Optional[str] = None,
        sheet: Optional[str] = None,
        strip: bool = True,
        infer_strategy: Optional[str] = None,
        cast_strategy: Optional[str] = None,
        on_error: Optional[str] = None,
        resources=None,
    ):
        if isinstance(source, str) and source.startswith("env://"):
            # reference load.py env:// source: the actual path (usually a
            # datapackage.json) is carried by an environment variable
            var = source[6:]
            source = os.environ.get(var)
            if source is None:
                raise ValueError(
                    f"load: environment variable {var!r} (env:// source) "
                    "is not set")
        self.source = source
        self.resources_sel = resources
        if isinstance(source, tuple):
            # reference load.py inline source: (datapackage_dict,
            # iterator-of-row-iterators) — possibly multiple resources
            self.format = "inline_package"
            self.resource_name = name or "inline"
        else:
            self.format = format or self._guess_format(source)
            if (self.format == "datapackage" and isinstance(source, str)
                    and source.endswith(".zip")):
                # reference load.py accepts format='datapackage' for a
                # zipped package (tests/test_lib.py:815-823)
                self.format = "datapackage_zip"
            self.resource_name = name or self._default_name(source)
        self.name = f"load({self.resource_name})"
        self.limit_rows = limit_rows
        self.columns = columns
        self.row_ids = row_ids
        self.override_num_blocks = override_num_blocks
        self.table = table
        self.sheet = sheet
        # reference load.py:57 strip=True: trim whitespace on string cells
        # of TEXT sources (csv/tsv/xml); typed columnar sources are clean
        self.strip = strip
        self.override_schema = override_schema
        # reference load.py:79-87: bool -> {}, source str -> [str], defaults
        if extract_missing_values is not None:
            if isinstance(extract_missing_values, bool):
                extract_missing_values = {}
            extract_missing_values = dict(extract_missing_values)
            extract_missing_values.setdefault("source", None)
            extract_missing_values.setdefault("target", "missingValues")
            extract_missing_values.setdefault(
                "values", (override_schema or {}).get("missingValues", []))
            if isinstance(extract_missing_values.get("source"), str):
                extract_missing_values["source"] = [extract_missing_values["source"]]
        self.extract_missing_values = extract_missing_values
        self.deduplicate_headers = deduplicate_headers
        self.dedup_case_sensitive = deduplicate_headers_case_sensitive
        self.dedup_format = deduplicate_headers_format
        # reference load.py:42-48 strategy matrix: how text sources infer
        # (full / pytypes / strings) x how values cast (schema / strings /
        # nothing). Defaults reproduce INFER_FULL + CAST_WITH_SCHEMA.
        self.infer_strategy = infer_strategy
        self.cast_strategy = cast_strategy
        self.on_error = on_error

    @staticmethod
    def _read_package_resource(base: str, res: Dict) -> ray.data.Dataset:
        """Read one dumped-datapackage resource and re-apply its recorded
        schema to text formats (csv loses types; the reference
        round-trips temporal formats this way —
        test_lib.py test_force_temporal_format)."""
        rpath = os.path.join(base, res.get("path", res.get("name")))
        fmt = res.get("format", "parquet")
        sub = load(rpath, name=res.get("name"), format=fmt)
        ds = sub._read()
        schema_fields = (res.get("schema") or {}).get("fields", [])
        casts = [{"name": f["name"], "type": f.get("type"),
                  "format": f.get("format")}
                 for f in schema_fields
                 if fmt in ("csv", "tsv", "json", "ndjson")
                 and f.get("type") not in (None, "string")]
        if casts:
            from ..stages.schema_ops import _CastKernel
            missing = (res.get("schema") or {}).get("missingValues", [])
            kernel = _CastKernel(casts, "raise", None)
            cast_cols = [c["name"] for c in casts]

            def apply_schema(df, kernel=kernel, missing=missing,
                             cast_cols=cast_cols):
                if missing:
                    for c in cast_cols:
                        if c in df.columns:
                            df[c] = df[c].where(~df[c].isin(missing), None)
                return kernel(df)

            ds = ds.map_batches(apply_schema, batch_format="pandas",
                                batch_size=None)
        return ds

    def _read_header(self, delimiter: str) -> List[str]:
        """Header row of the (first) csv/tsv file, read driver-side."""
        path = self.source
        if os.path.isdir(path):
            cands = sorted(os.path.join(path, f) for f in os.listdir(path)
                           if f.endswith((".csv", ".tsv")))
            path = cands[0]
        import csv as _csv
        with open(path, newline="") as f:
            return next(_csv.reader(f, delimiter=delimiter))

    @staticmethod
    def rename_duplicate_headers(headers_in: List[str], case_sensitive: bool = True,
                                 deduplicate_format: str = " (%s)") -> List[str]:
        """Reference load.py:285-302: first duplicate retroactively becomes
        'name (1)', later ones 'name (2)', 'name (3)', ..."""
        counter: Dict[str, int] = {}
        headers: List[str] = []
        header_keys: List[str] = []
        for header in headers_in:
            header_key = header if case_sensitive else header.lower()
            header_keys.append(header_key)
            counter.setdefault(header_key, 0)
            counter[header_key] += 1
            if counter[header_key] > 1:
                if counter[header_key] == 2:
                    prev_index = header_keys.index(header_key)
                    headers[prev_index] = ("%s" + deduplicate_format) % (
                        headers[prev_index], 1)
                header = ("%s" + deduplicate_format) % (header, counter[header_key])
            headers.append(header)
        return headers

    @staticmethod
    def _guess_format(source: str) -> str:
        if source.endswith("datapackage.json"):
            return "datapackage"
        if source.endswith(".zip"):
            return "datapackage_zip"
        if "docs.google.com/spreadsheets" in source:
            return "gsheet"
        for ext, fmt in ((".parquet", "parquet"), (".csv", "csv"),
                         (".ndjson", "ndjson"), (".jsonl", "ndjson"),
                         (".geojson", "geojson"), (".json", "json"),
                         (".tsv", "tsv"), (".xml", "xml"),
                         (".xlsx", "xlsx"), (".xls", "xls"),
                         (".ods", "ods"),
                         (".db", "sql"), (".sqlite", "sql")):
            if source.endswith(ext):
                return fmt
        return "parquet"

    @staticmethod
    def _default_name(source: str) -> str:
        base = os.path.basename(source.rstrip("/"))
        return os.path.splitext(base)[0] or "res"

    def _read_ragged_csv(self, delimiter: str) -> "pa.Table":
        """Normalize a CSV whose header has empty cells (reference
        ``tests/test_lib.py`` test_load_empty_headers): keep named
        columns, truncate extras, null-pad short rows, then let Arrow
        CSV re-infer types from the cleaned bytes."""
        import csv as _csv
        import io
        import pyarrow.csv as pacsv

        paths = [self.source]
        if os.path.isdir(self.source):
            paths = sorted(
                os.path.join(self.source, f)
                for f in os.listdir(self.source)
                if f.endswith((".csv", ".tsv")))
        buf = io.StringIO()
        writer = _csv.writer(buf)
        keep: List[int] = []
        names: List[str] = []
        for pi, path in enumerate(paths):
            with open(path, newline="") as f:
                reader = _csv.reader(f, delimiter=delimiter)
                header = next(reader)
                if pi == 0:
                    keep = [i for i, h in enumerate(header) if h.strip()]
                    names = [header[i] for i in keep]
                    writer.writerow(names)
                for row in reader:
                    if not any(c.strip() for c in row):
                        continue
                    writer.writerow([row[i] if i < len(row) else ""
                                     for i in keep])
        typed = (self.infer_strategy in (None, self.INFER_FULL)
                 and self.cast_strategy in (None, self.CAST_WITH_SCHEMA))
        convert = (None if typed else pacsv.ConvertOptions(
            column_types={h: pa.string() for h in names}))
        return pacsv.read_csv(
            io.BytesIO(buf.getvalue().encode("utf-8")),
            **({"convert_options": convert} if convert else {}))

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
            header = self._read_header(parse_options.delimiter)
            if any(h.strip() == "" for h in header):
                # reference behavior (tabulator): empty header cells mean
                # the file is ragged — keep only the named columns,
                # truncate extra cells, null-pad short rows. Arrow CSV
                # rejects ragged rows, so normalize driver-side (this is
                # a small-dirty-file path, not the scale path) and hand
                # the CLEAN bytes back to Arrow for typed inference.
                return ray.data.from_arrow(self._read_ragged_csv(
                    parse_options.delimiter))
            # strategy matrix (reference load.py:88-110): a text source
            # produces TYPED columns only under INFER_FULL+CAST_WITH_SCHEMA
            # (the default); every other combination yields raw strings
            typed = (self.infer_strategy in (None, self.INFER_FULL)
                     and self.cast_strategy in (None, self.CAST_WITH_SCHEMA))
            read_options = None
            if self.deduplicate_headers:
                # read the header line driver-side (first file of a glob),
                # rename duplicates, re-read with explicit column names
                path = self.source
                if os.path.isdir(path):
                    cands = sorted(
                        os.path.join(path, f) for f in os.listdir(path)
                        if f.endswith((".csv", ".tsv")))
                    path = cands[0]
                with open(path, newline="") as f:
                    import csv as _csv
                    raw = next(_csv.reader(
                        f, delimiter=parse_options.delimiter))
                renamed = self.rename_duplicate_headers(
                    raw, self.dedup_case_sensitive, self.dedup_format)
                read_options = pacsv.ReadOptions(column_names=renamed,
                                                 skip_rows=1)
            convert_options = None
            if not typed:
                names = (renamed if read_options is not None
                         else self._read_header(parse_options.delimiter))
                convert_options = pacsv.ConvertOptions(
                    column_types={h: pa.string() for h in names})
            ds = ray.data.read_csv(self.source, parse_options=parse_options,
                                   **({"read_options": read_options}
                                      if read_options else {}),
                                   **({"convert_options": convert_options}
                                      if convert_options else {}), **kwargs)
        elif self.format == "ndjson":
            ds = ray.data.read_json(self.source, **kwargs)
        elif self.format == "json":
            # JSON array-of-objects: small config files; read driver-side.
            import json
            with open(self.source) as f:
                rows = json.load(f)
            # native-typed source: values become strings when the infer
            # or cast strategy says strings (reference strategy matrix)
            if (self.infer_strategy == self.INFER_STRINGS
                    or self.cast_strategy == self.CAST_TO_STRINGS):
                rows = [{k: (None if v is None else str(v))
                         for k, v in r.items()} for r in rows]
            ds = ray.data.from_items(rows)
        elif self.format == "geojson":
            # reference parsers/geojson_parser.py:15-29: one row per
            # feature = properties + '__geometry' (geometry as JSON string)
            import json
            with open(self.source) as f:
                doc = json.load(f)
            rows = []
            for feat in doc.get("features", []):
                row = dict(feat.get("properties") or {})
                row["__geometry"] = json.dumps(feat.get("geometry"))
                rows.append(row)
            from ..core.udf import rows_to_table
            ds = (ray.data.from_arrow(rows_to_table(rows, None))
                  if rows else ray.data.from_items([]))
        elif self.format == "xml":
            # reference parsers/xml_parser.py (xmljson 'parker'): rows =
            # the repeated child elements of the root; cells = subelement
            # text keyed by tag
            import xml.etree.ElementTree as ET
            root = ET.parse(self.source).getroot()
            rows = []
            for el in root:
                rows.append({child.tag: child.text for child in el})
            from ..core.udf import rows_to_table
            ds = (ray.data.from_arrow(rows_to_table(rows, None))
                  if rows else ray.data.from_items([]))
        elif self.format == "sql":
            # sqlite source (reference parsers/sql_parser.py uses
            # SQLAlchemy; stdlib sqlite3 covers the in-container case).
            # Table name: `table=` arg, else the single user table.
            import sqlite3
            con = sqlite3.connect(self.source)
            try:
                table = self.table
                if table is None:
                    names = [r[0] for r in con.execute(
                        "SELECT name FROM sqlite_master WHERE type='table' "
                        "AND name NOT LIKE 'sqlite_%'")]
                    if len(names) != 1:
                        raise ValueError(
                            f"sql load: pass table= (found tables {names})")
                    table = names[0]
                cur = con.execute(f'SELECT * FROM "{table}"')
                cols = [d[0] for d in cur.description]
                rows = [dict(zip(cols, r)) for r in cur.fetchall()]
            finally:
                con.close()
            from ..core.udf import rows_to_table
            ds = (ray.data.from_arrow(rows_to_table(rows, None))
                  if rows else ray.data.from_items([]))
        elif self.format == "datapackage_zip":
            # zipped datapackage (reference test_lib.py:815): extract to a
            # temp dir, then load like a plain datapackage
            import tempfile
            import zipfile
            tmp = tempfile.mkdtemp(prefix="dfray_pkg_")
            with zipfile.ZipFile(self.source) as zf:
                zf.extractall(tmp)
            inner = os.path.join(tmp, "datapackage.json")
            if not os.path.exists(inner):
                for root, _d, files in os.walk(tmp):
                    if "datapackage.json" in files:
                        inner = os.path.join(root, "datapackage.json")
                        break
            sub = load(inner, name=self.resource_name, format="datapackage",
                       table=self.table)
            ds = sub._read()
            self.resource_name = sub.resource_name
        elif self.format == "datapackage":
            # load resource(s) of a dumped datapackage (dump_to_path
            # manifest: {"resources": [{"name", "path", "format"}]});
            # `table=` (or name=) selects one resource, default the first
            import json
            base = os.path.dirname(os.path.abspath(self.source))
            with open(self.source) as f:
                manifest = json.load(f)
            resources = manifest.get("resources", [])
            if not resources:
                raise ValueError("datapackage has no resources")
            want = self.table or self.resource_name
            match = [r for r in resources if r.get("name") == want]
            res = match[0] if match else resources[0]
            self.resource_name = res.get("name", self.resource_name)
            ds = self._read_package_resource(base, res)
        elif self.format in ("xlsx", "xls", "ods", "excel-xml", "gsheet"):
            # spreadsheet family — from-scratch public-spec codecs
            # (sources/spreadsheet.py); reference parity:
            # /root/reference/dataflows/processors/load.py:96-140 registers
            # these as tabulator formats / custom parsers
            from . import spreadsheet as ss
            if self.format == "xlsx":
                grid = ss.read_xlsx(self.source, sheet=self.sheet)
            elif self.format == "xls":
                grid = ss.read_xls(self.source, sheet=self.sheet)
            elif self.format == "ods":
                grid = ss.read_ods(self.source, sheet=self.sheet)
            elif self.format == "excel-xml":
                grid = ss.read_excel_xml(self.source, sheet=self.sheet)
            else:  # gsheet: fetch the CSV export, delegate to the csv path
                import tempfile
                csv_bytes = ss.fetch_gsheet_csv(self.source)
                tmp = tempfile.NamedTemporaryFile(
                    mode="wb", suffix=".csv", delete=False)
                tmp.write(csv_bytes)
                tmp.close()
                try:
                    sub = load(tmp.name, name=self.resource_name,
                               format="csv",
                               infer_strategy=self.infer_strategy,
                               cast_strategy=self.cast_strategy)
                    # ray.data.read_csv is LAZY (it would re-open the
                    # file at execution time) — materialize while the
                    # temp file still exists, then delete it; a sheet is
                    # driver-memory sized by definition
                    return sub._read().materialize()
                finally:
                    os.unlink(tmp.name)
            rows = []
            if grid:
                header = [str(h) for h in grid[0]]
                rows = [dict(zip(header, r + [None] * (len(header) - len(r))))
                        for r in grid[1:]]
            from ..core.udf import rows_to_table
            ds = (ray.data.from_arrow(rows_to_table(rows, None))
                  if rows else ray.data.from_items([]))
        else:
            raise ValueError(f"Unsupported load format: {self.format}")
        if self.columns:
            ds = ds.select_columns(self.columns)
        return ds

    def _apply_schema(self, ds: ray.data.Dataset):
        """override_schema missing-value nulling + casts, and the
        extract_missing_values row mapping (reference load.py:258-270 +
        schema_validator missingValues handling)."""
        schema = self.override_schema or {}
        missing = list(schema.get("missingValues", []))
        emv = self.extract_missing_values
        fields = schema.get("fields", [])

        if emv:
            import pandas as pd

            def extract(df: "pd.DataFrame", emv=emv, missing=missing):
                src_cols = emv["source"]
                values = set(emv["values"])
                cols = [c for c in df.columns
                        if (not src_cols or c in src_cols)]
                maps = []
                for _i, row in df[cols].iterrows():
                    maps.append({c: v for c, v in row.items()
                                 if v in values})
                df[emv["target"]] = maps
                if missing:
                    value_cols = [c for c in df.columns
                                  if c != emv["target"]]
                    for c in value_cols:
                        df[c] = df[c].where(~df[c].isin(missing), None)
                return df

            ds = ds.map_batches(extract, batch_format="pandas",
                                batch_size=DEFAULT_BATCH_SIZE)
        elif missing:
            import pyarrow.compute as pc

            def null_missing(batch: pa.Table, missing=missing) -> pa.Table:
                # vectorized, Arrow-native (a pandas round-trip would
                # degrade int64-with-null columns to float64/NaN): compare
                # each column's STRING form against the missing set
                vs = pa.array(missing, type=pa.string())
                for i, c in enumerate(batch.column_names):
                    col = batch[i]
                    try:
                        as_str = pc.cast(col, pa.string())
                    except pa.ArrowInvalid:
                        continue
                    mask = pc.is_in(as_str, value_set=vs)
                    if pc.any(mask).as_py():
                        batch = batch.set_column(
                            i, c, pc.if_else(mask, pa.nulls(
                                len(batch), type=col.type), col))
                return batch

            ds = ds.map_batches(null_missing, batch_format="pyarrow",
                                batch_size=DEFAULT_BATCH_SIZE)
        if fields:
            from ..stages.schema_ops import _CastKernel
            casts = [{"name": f["name"], "type": f.get("type"),
                      "format": None if f.get("format") in (None, "default")
                      else f.get("format")} for f in fields]
            ds = ds.map_batches(_CastKernel(casts, "raise"),
                                batch_format="pandas",
                                batch_size=DEFAULT_BATCH_SIZE)
        return ds

    def _apply_strip(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        import pyarrow.compute as pc

        def strip_fn(batch: pa.Table) -> pa.Table:
            for i, field in enumerate(batch.schema):
                if pa.types.is_string(field.type) or pa.types.is_large_string(
                        field.type):
                    batch = batch.set_column(
                        i, field.name,
                        pc.utf8_trim_whitespace(batch[field.name]))
            return batch

        return ds.map_batches(strip_fn, batch_format="pyarrow",
                              batch_size=None)

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        if self.format == "datapackage" and self.resources_sel is not None:
            # reference load(resources=[...]): add EVERY selected
            # resource of the package (test_load_from_package_resource_
            # matching / test_load_from_package_resources)
            import json
            base = os.path.dirname(os.path.abspath(self.source))
            with open(self.source) as f:
                manifest = json.load(f)
            for res in manifest.get("resources", []):
                rname = res.get("name")
                if rname not in self.resources_sel:
                    continue
                ds = self._read_package_resource(base, res)
                stream.set(rname, ds)
                desc = ResourceDescriptor(
                    name=rname,
                    metadata={"path": res.get("path", rname)},
                    fields=[dict(f) for f in
                            (res.get("schema") or {}).get("fields", [])])
                stream.package.add(desc)
            return stream
        if self.format == "inline_package":
            # (datapackage dict, iterator of per-resource row iterators):
            # add every SELECTED resource (reference load.py inline form)
            from ..core.udf import rows_to_table
            dp, res_iters = self.source
            sel = self.resources_sel
            for rdesc, rows_iter in zip(dp.get("resources", []), res_iters):
                rname = rdesc.get("name", "res")
                if sel is not None and rname not in sel:
                    continue
                rows = list(rows_iter)
                ds = (ray.data.from_arrow(rows_to_table(rows, None))
                      if rows else ray.data.from_items([]))
                stream.set(rname, ds)
                desc = ResourceDescriptor(
                    name=rname,
                    metadata={"path": rdesc.get("path", rname)},
                    fields=[dict(f) for f in
                            rdesc.get("schema", {}).get("fields", [])])
                stream.package.add(desc)
            return stream
        ds = self._read()
        if self.strip and self.format in ("csv", "tsv", "xml"):
            ds = self._apply_strip(ds)
        if self.limit_rows:
            ds = ds.limit(self.limit_rows)
        if self.override_schema or self.extract_missing_values:
            ds = self._apply_schema(ds)
        stream.set(self.resource_name, ds)
        # reference load.py descriptor path: '<name>.<ext>' when a name
        # override is given, else the source basename (test_load_name_path)
        if isinstance(self.source, str):
            ext = os.path.splitext(self.source)[1]
            rel_path = (f"{self.resource_name}{ext}"
                        if self.resource_name != self._default_name(self.source)
                        else os.path.basename(self.source.rstrip("/")))
        else:  # non-path sources (file objects etc.)
            rel_path = f"{self.resource_name}.csv"
        desc = ResourceDescriptor(name=self.resource_name,
                                  metadata={"path": rel_path,
                                            "source": self.source
                                            if isinstance(self.source, str)
                                            else None})
        schema = self.override_schema or {}
        if schema.get("missingValues"):
            desc.missing_values = list(schema["missingValues"])
        if schema.get("fields"):
            desc.fields = [dict(f) for f in schema["fields"]]
        if self.extract_missing_values:
            desc.fields.append({
                "name": self.extract_missing_values["target"],
                "type": "object", "format": "default",
                "values": list(self.extract_missing_values["values"])})
        stream.package.add(desc)
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
            # rows_to_table (not pa.Table.from_pylist): handles tz-aware
            # datetimes correctly and widens ragged keys
            from ..core.udf import rows_to_table
            table = rows_to_table(rows, None)
            ds = ray.data.from_arrow(table)
        else:
            ds = ray.data.from_items([])
        stream.set(self.resource_name, ds)
        return stream
