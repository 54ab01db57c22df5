"""stream / unstream: serialize the whole datastream to one file + read
it back; and parallelize (API-parity shim).

Parity targets:
- ``dataflows/processors/stream.py:9-38`` — descriptor line, then NDJSON
  rows per resource with blank-line separators, written to
  ``<file>.active`` and atomically renamed on success (the reference's
  idempotent-commit primitive);
- ``dataflows/processors/unstream.py:8-33`` — the inverse;
- ``dataflows/helpers/extended_json.py:28-109`` — type-tagged JSON for
  non-JSON types (datetime/date/time/duration); we tag the same classes.
- ``dataflows/processors/parallelize.py:100-113`` — fan a row func over
  worker processes. SUBSUMED by Ray Data: our shim is a documented alias
  for ``map_batches(row_fn, concurrency=N)``; unlike the reference,
  ordering IS preserved (Ray tracks block order).

The single-file NDJSON format is inherently driver-side (it exists for
parity and small checkpoint interchange); the scale checkpoint path is
``sinks/checkpoint.py`` (partitioned parquet + manifest).
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Any, Callable, Dict, Optional

import pyarrow as pa
import ray.data

from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream
from ..core.udf import make_row_batch_fn
from ..core.package import select_resources

ACTIVE_SUFFIX = ".active"


def _encode(obj: Any) -> Any:
    # tag names mirror reference helpers/extended_json.py:41-106 (decimal /
    # time / datetime-with-tz / date / duration / set), plus bytes
    if isinstance(obj, datetime.datetime):
        ofs = obj.utcoffset()
        return {"type{datetime}": [
            obj.replace(tzinfo=None).isoformat(),
            int(ofs.total_seconds()) if ofs is not None else None,
            obj.tzname()]}
    if isinstance(obj, datetime.date):
        return {"type{date}": obj.isoformat()}
    if isinstance(obj, datetime.time):
        return {"type{time}": obj.isoformat()}
    if isinstance(obj, datetime.timedelta):
        from ..stages.schema_ops import format_iso_duration
        return {"type{duration}": format_iso_duration(obj)}
    if isinstance(obj, bytes):
        import base64
        return {"type{bytes}": base64.b64encode(obj).decode()}
    import decimal
    if isinstance(obj, decimal.Decimal):
        return {"type{decimal}": str(obj)}
    if isinstance(obj, (set, frozenset)):
        return {"type{set}": sorted(obj, key=repr)}
    raise TypeError(f"not ejson-serializable: {type(obj)}")


def _decode_row(row: Dict) -> Dict:
    out = {}
    for k, v in row.items():
        if isinstance(v, dict) and len(v) == 1:
            key = next(iter(v))
            if key.startswith("type{") and key.endswith("}"):
                t, val = key[5:-1], v[key]
                if t == "datetime":
                    if isinstance(val, list):  # [iso, tz_offset_s, tzname]
                        iso, ofs, tzname = val
                        dt = datetime.datetime.fromisoformat(iso)
                        if ofs is not None:
                            tz = (datetime.timezone(
                                      datetime.timedelta(seconds=ofs), tzname)
                                  if tzname is not None else
                                  datetime.timezone(
                                      datetime.timedelta(seconds=ofs)))
                            dt = dt.replace(tzinfo=tz)
                        out[k] = dt
                    else:
                        out[k] = datetime.datetime.fromisoformat(val)
                elif t == "date":
                    out[k] = datetime.date.fromisoformat(val)
                elif t == "time":
                    out[k] = datetime.time.fromisoformat(val)
                elif t == "duration":
                    from ..stages.schema_ops import parse_iso_duration
                    out[k] = parse_iso_duration(val)
                elif t == "decimal":
                    import decimal
                    out[k] = decimal.Decimal(val)
                elif t == "set":
                    out[k] = set(val)
                elif t == "bytes":
                    import base64
                    out[k] = base64.b64decode(val)
                else:
                    out[k] = val
                continue
        out[k] = v
    return out


class stream(Step):
    """``file``: a path (written via ``.active`` + atomic rename) or an
    already-open text file object (reference signature —
    ``stream(open(path, 'w'))``; no rename possible, written directly)."""

    def __init__(self, file):
        self.file = file
        self.name = f"stream({file})"

    def _write(self, f, s: PackageStream) -> None:
        descriptor = {
            "resources": [{"name": n,
                           "primaryKey": s.descriptor(n).primary_key}
                          for n in s.resource_names()]}
        f.write(json.dumps(descriptor, sort_keys=True) + "\n")
        for rname in s.resource_names():
            for batch in s.get(rname).iter_batches(
                    batch_size=DEFAULT_BATCH_SIZE, batch_format="pyarrow"):
                for row in batch.to_pylist():
                    f.write(json.dumps(row, sort_keys=True,
                                       ensure_ascii=True,
                                       default=_encode) + "\n")
            f.write("\n")

    def __flow_step__(self, s: PackageStream) -> PackageStream:
        if not isinstance(self.file, str):
            self._write(self.file, s)
            self.file.flush()
            self.file.close()
            return s
        filename = self.file + ACTIVE_SUFFIX
        basedir = os.path.dirname(filename)
        if basedir:
            os.makedirs(basedir, exist_ok=True)
        with open(filename, "w") as f:
            self._write(f, s)
        os.rename(filename, self.file)  # atomic commit (stream.py:33-36)
        return s


class unstream(Step):
    def __init__(self, file):
        self.file = file
        self.name = f"unstream({file})"

    def __flow_step__(self, s: PackageStream) -> PackageStream:
        import contextlib
        ctx = (open(self.file) if isinstance(self.file, str)
               else contextlib.nullcontext(self.file))
        with ctx as f:
            descriptor = json.loads(f.readline())
            for res in descriptor["resources"]:
                rows = []
                for line in f:
                    line = line.strip()
                    if not line:
                        break
                    rows.append(_decode_row(json.loads(line)))
                if rows:
                    from ..core.udf import rows_to_table  # tz-safe build
                    ds = ray.data.from_arrow(rows_to_table(rows, None))
                else:
                    ds = ray.data.from_items([])
                s.set(res["name"], ds)
                s.descriptor(res["name"]).primary_key = res.get("primaryKey", [])
        return s


class parallelize(Step):
    """API-parity shim for reference ``parallelize``: fan ``row_func``
    over ``num_processors`` workers. Ray Data parallelizes every stage
    already; this maps to an actor-pool ``map_batches`` with the row-fn
    shim. ``predicate`` rows bypass the function unchanged."""

    def __init__(self, row_func: Callable, num_processors: Optional[int] = None,
                 resources=None, predicate: Optional[Callable] = None):
        self.row_func = row_func
        self.num_processors = num_processors or 4
        self.resources = resources
        self.predicate = predicate
        self.name = "parallelize"

    def __flow_step__(self, s: PackageStream) -> PackageStream:
        fn, pred = self.row_func, self.predicate

        def row_fn(row):
            if pred is not None and not pred(row):
                return row
            result = fn(row)
            return row if result is None else result

        batch_fn = make_row_batch_fn(row_fn)
        for rname in select_resources(s, self.resources):
            s.set(rname, s.get(rname).map_batches(
                batch_fn, batch_format="pyarrow",
                batch_size=DEFAULT_BATCH_SIZE,
                concurrency=self.num_processors))
        return s
