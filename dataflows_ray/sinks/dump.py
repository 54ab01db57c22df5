"""dump_to_path: write resources + a datapackage manifest with counters.

Parity target: reference ``dataflows/dumpers/to_path.py:7-26`` +
``dumpers/file_dumper.py:30-161`` + ``dumpers/dumper_base.py:9-116``
(row counts, byte sizes, optional content hashes accumulated into the
package descriptor; temp-file-then-copy writes).

Ray-Data mapping: each resource is written as a DIRECTORY of part files
(``write_parquet`` / ``write_csv`` / ``write_json``) — partitioned output
is the resumable/scale-correct layout (never one giant file). Counters
come from the written parquet FILE METADATA (rows) and the filesystem
(bytes) — no second pass over data. Hashes are per-output-file md5,
computed only when ``add_filehash=True`` (a full re-read; off by default
at scale). The dumped resource is replaced by a read-back of the output,
so downstream steps never recompute the upstream pipeline.

A dump step is a CONSUMPTION point: the write executes when the step is
applied (the reference's equivalent drain happens at ``results()``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Dict, List, Optional

import pyarrow.parquet as pq
import ray.data

from ..core.flow import Step
from ..core.package import PackageStream, select_resources
from ..core.raycompat import cheap_columns


def _xlsx_cell(v):
    """Python value -> spreadsheet cell value: numbers/bools/strings pass
    through, temporals and Decimals serialize to their canonical text."""
    import datetime
    import decimal
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    return str(v)


def _dir_stats(path: str, fmt: str, add_filehash: bool) -> Dict:
    n_rows = 0
    n_bytes = 0
    hashes = {}
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            fp = os.path.join(root, f)
            n_bytes += os.path.getsize(fp)
            if fmt == "parquet" and f.endswith(".parquet"):
                n_rows += pq.read_metadata(fp).num_rows
            if add_filehash:
                h = hashlib.md5()
                with open(fp, "rb") as fh:
                    for chunk in iter(lambda: fh.read(1 << 20), b""):
                        h.update(chunk)
                hashes[os.path.relpath(fp, path)] = h.hexdigest()
    out = {"bytes": n_bytes}
    if fmt == "parquet":
        out["count_of_rows"] = n_rows
    if add_filehash:
        out["hashes"] = hashes
    return out


class dump_to_path(Step):
    def __init__(self, out_path: str = ".", format: str = "parquet",
                 resources=None, add_filehash: bool = False,
                 min_rows_per_file: Optional[int] = None, readback: bool = True,
                 temporal_format_property: Optional[str] = None,
                 use_titles: bool = False,
                 partition_by: Optional[list] = None):
        self.out_path = out_path
        self.format = format
        self.resources = resources
        self.add_filehash = add_filehash
        self.min_rows_per_file = min_rows_per_file
        self.readback = readback
        # hive-style partitioned parquet output (one directory per
        # partition value): the resumable-output shape for 100-TB runs —
        # a failed run skips finished partitions, consumers prune at read
        self.partition_by = list(partition_by) if partition_by else None
        # reference dumpers/file_dumper.py:34-35 + formats/base.py:43-46:
        # serialize temporal fields with the strftime format stored under
        # this field-descriptor property, and record it as the dumped
        # schema 'format'; use_titles writes CSV headers from field titles
        self.temporal_format_property = temporal_format_property
        self.use_titles = use_titles
        self.name = f"dump_to_path({out_path})"

    def _temporal_map(self, fields) -> Dict[str, tuple]:
        out = {}
        if not self.temporal_format_property:
            return out
        for f in fields:
            fmt = f.get(self.temporal_format_property)
            if fmt and f.get("type") in ("datetime", "date", "time"):
                out[f["name"]] = (f["type"], fmt)
                f["format"] = fmt  # recorded in the dumped schema
        return out

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        os.makedirs(self.out_path, exist_ok=True)
        manifest: Dict = {"name": stream.package.metadata.get("name", "datapackage"),
                          "resources": []}
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            desc = stream.descriptor(rname)
            known = {f.get("name"): dict(f) for f in (desc.fields or [])}
            fields = [known.get(c, {"name": c}) for c in cheap_columns(ds)]
            tmap = self._temporal_map(fields)
            if tmap and self.format in ("csv", "json"):
                import pandas as pd

                def fmt_temporals(df: "pd.DataFrame", tmap=tmap):
                    for col, (_t, fmt) in tmap.items():
                        if col in df.columns:
                            df[col] = df[col].map(
                                lambda v: "" if v is None or v != v
                                else v.strftime(fmt))
                    return df

                ds = ds.map_batches(fmt_temporals, batch_format="pandas",
                                    batch_size=None)
            if self.use_titles and self.format == "csv":
                titles = {f["name"]: f["title"] for f in fields
                          if f.get("title")}
                if titles:
                    ds = ds.rename_columns(titles)
            res_dir = os.path.join(self.out_path, rname)
            staged = res_dir + ".staged"
            if os.path.exists(staged):
                shutil.rmtree(staged)
            if self.format == "parquet":
                kwargs = {}
                if self.min_rows_per_file:
                    kwargs["min_rows_per_file"] = self.min_rows_per_file
                if self.partition_by:
                    kwargs["partition_cols"] = self.partition_by
                ds.write_parquet(staged, **kwargs)
            elif self.format == "csv":
                ds.write_csv(staged)
            elif self.format == "json":
                ds.write_json(staged)
            elif self.format == "geojson":
                # reference dumpers/formats/format_geojson.py:5-41: one
                # FeatureCollection; geometry from geopoint/geojson-typed
                # fields (or a '__geometry' column), other fields become
                # properties. A GeoJSON document is a single JSON object,
                # so this writer streams batches into one file.
                desc = stream.descriptor(rname)
                geo_fields = {f["name"]: f.get("type") for f in desc.fields
                              if f.get("type") in ("geopoint", "geojson")}
                os.makedirs(staged, exist_ok=True)
                out_file = os.path.join(staged, f"{rname}.geojson")
                with open(out_file, "w") as f:
                    f.write('{"type": "FeatureCollection","features":[')
                    first = True
                    for batch in ds.iter_batches(batch_format="pyarrow",
                                                 batch_size=4096):
                        for row in batch.to_pylist():
                            geometry = None
                            props = {}
                            for k, v in row.items():
                                ftype = geo_fields.get(k)
                                if ftype == "geopoint":
                                    # reference format_geojson.py: a
                                    # geopoint is "lat, lon" string OR a
                                    # [lat, lon] pair — coordinates are
                                    # numeric either way
                                    coords = ([float(x) for x in
                                               v.split(",")]
                                              if isinstance(v, str)
                                              else [float(x) for x in v])
                                    geometry = {"type": "Point",
                                                "coordinates": coords}
                                elif ftype == "geojson":
                                    geometry = (json.loads(v)
                                                if isinstance(v, str) else v)
                                elif k == "__geometry":
                                    geometry = (json.loads(v)
                                                if isinstance(v, str) else v)
                                else:
                                    props[k] = v
                            feature = {"geometry": geometry,
                                       "type": "Feature",
                                       "properties": props}
                            f.write(("" if first else ",")
                                    + json.dumps(feature, default=str))
                            first = False
                    f.write("]}")
            elif self.format in ("xlsx", "ods", "xls"):
                # from-scratch public-spec writers (sources/spreadsheet.py)
                # — no openpyxl in this container. Streamed via
                # iter_batches; the grid lives only long enough to zip.
                from ..sources import spreadsheet as ss
                cols = cheap_columns(ds)
                grid = [list(cols)]
                for b in ds.iter_batches(batch_format="pyarrow",
                                         batch_size=4096):
                    for row in b.to_pylist():
                        grid.append([_xlsx_cell(row.get(c)) for c in cols])
                os.makedirs(staged, exist_ok=True)
                writer = {"xlsx": ss.write_xlsx, "ods": ss.write_ods,
                          "xls": ss.write_xls}[self.format]
                writer(os.path.join(staged, f"{rname}.{self.format}"),
                       grid, sheet_name=rname)
            else:
                raise ValueError(f"Unsupported dump format: {self.format}")
            # atomic commit per resource (reference stream.py:33-36 pattern)
            if os.path.exists(res_dir):
                shutil.rmtree(res_dir)
            os.replace(staged, res_dir)
            stats = _dir_stats(res_dir, self.format, self.add_filehash)
            manifest["resources"].append({
                "name": rname, "path": rname, "format": self.format,
                "schema": {"fields": fields, "missingValues": [""]},
                **stats})
            stream.stats.append(
                {f"{k}__{rname}": v for k, v in stats.items() if k != "hashes"})
            if self.format == "parquet" and self.readback:
                # read back: downstream consumers don't recompute upstream
                rb = ray.data.read_parquet(res_dir)
                if self.partition_by:
                    # hive partition columns read back as strings; restore
                    # the original Arrow types from the pre-dump schema
                    types = {}
                    sch = ds.schema(fetch_if_missing=False)
                    if sch is not None:
                        base = getattr(sch, "base_schema", None)
                        if base is not None:
                            types = {n: t for n, t in zip(base.names,
                                                          base.types)}

                    part_cols = list(self.partition_by)

                    def restore(batch, types=types, cols=part_cols):
                        import pyarrow.compute as _pc
                        for c in cols:
                            if c in types and c in batch.column_names and \
                                    batch.schema.field(c).type != types[c]:
                                i = batch.column_names.index(c)
                                batch = batch.set_column(
                                    i, c, _pc.cast(batch[c], types[c]))
                        return batch

                    if types:
                        rb = rb.map_batches(restore, batch_format="pyarrow",
                                            batch_size=None)
                stream.set(rname, rb)
        # atomic manifest write
        tmp = os.path.join(self.out_path, "datapackage.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        os.replace(tmp, os.path.join(self.out_path, "datapackage.json"))
        return stream


class dump_to_zip(Step):
    """Reference ``dumpers/to_zip.py:6-21``: dump then zip the directory."""

    def __init__(self, out_file: str, format: str = "parquet", resources=None):
        self.out_file = out_file
        self.format = format
        self.resources = resources
        self.name = f"dump_to_zip({out_file})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        import tempfile
        import zipfile

        with tempfile.TemporaryDirectory() as tmpdir:
            inner = dump_to_path(tmpdir, format=self.format,
                                 resources=self.resources, readback=False)
            stream = inner.__flow_step__(stream)
            with zipfile.ZipFile(self.out_file, "w") as zf:
                for root, _dirs, files in os.walk(tmpdir):
                    for f in files:
                        fp = os.path.join(root, f)
                        zf.write(fp, os.path.relpath(fp, tmpdir))
        return stream
