"""Type casting, validation and descriptor mutation.

Parity targets:
- ``dataflows/processors/set_type.py:10-72`` — update field descriptor by
  name regex + re-cast the stream under an error policy; optional
  ``transform(v, field_name, row)`` pre-cast hook.
- ``dataflows/base/schema_validator.py:53-84`` — error policies ``raise``
  (default) / ``ignore`` (keep bad value) / ``drop`` (drop row) / ``clear``
  (null the cell).
- ``dataflows/processors/validate.py:9-61`` — schema-cast validation,
  field-predicate and row-predicate forms.
- ``dataflows/processors/update_package.py:4-18``, ``update_resource.py``,
  ``update_schema.py``, ``set_primary_key.py:5-24`` — metadata-only.

Ray-Data mapping: casts are vectorized per batch (pandas ``to_numeric`` /
``to_datetime`` for error LOCATION, Arrow cast for the clean fast path);
policies become mask-filter (drop), null-fill (clear), passthrough
(ignore), or a raised ``ValidationError`` surfaced through the consuming
call. Decimal policy (SURVEY §1.2): frictionless ``number`` maps to
float64; oracles compare with tolerance.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.exceptions import ValidationError
from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream, select_resources
from ..core.raycompat import cheap_columns

_BOOL_TRUE = {"true", "True", "TRUE", "1", "yes", "t"}
_BOOL_FALSE = {"false", "False", "FALSE", "0", "no", "f"}

# ISO-8601 duration <-> timedelta (weeks/days/time components; the
# reference's isodate additionally models calendar years/months, which
# have no fixed length — the engine rejects those, documented policy)
_DURATION_RE = re.compile(
    r"^(?P<sign>-)?P(?:(?P<weeks>\d+(?:\.\d+)?)W)?"
    r"(?:(?P<days>\d+(?:\.\d+)?)D)?"
    r"(?:T(?:(?P<hours>\d+(?:\.\d+)?)H)?"
    r"(?:(?P<minutes>\d+(?:\.\d+)?)M)?"
    r"(?:(?P<seconds>\d+(?:\.\d+)?)S)?)?$")


def parse_iso_duration(v):
    """ISO-8601 duration string -> datetime.timedelta (or passthrough)."""
    import datetime as _dt
    if isinstance(v, _dt.timedelta):
        return v
    m = _DURATION_RE.match(str(v).strip())
    if not m or m.group(0) in ("P", "-P"):
        raise ValueError(f"not an ISO duration: {v!r}")
    g = {k: float(x) if x else 0.0 for k, x in m.groupdict().items()
         if k != "sign"}
    td = _dt.timedelta(weeks=g["weeks"], days=g["days"], hours=g["hours"],
                       minutes=g["minutes"], seconds=g["seconds"])
    return -td if m.group("sign") else td


def format_iso_duration(td) -> str:
    """datetime.timedelta -> ISO-8601 duration string (PnDTnHnMnS)."""
    total = td.total_seconds()
    sign = "-" if total < 0 else ""
    total = abs(total)
    days, rem = divmod(total, 86400)
    hours, rem = divmod(rem, 3600)
    minutes, secs = divmod(rem, 60)
    out = f"{sign}P"
    if days:
        out += f"{int(days)}D"
    if hours or minutes or secs or not days:
        out += "T"
        if hours:
            out += f"{int(hours)}H"
        if minutes:
            out += f"{int(minutes)}M"
        if secs or not (hours or minutes or days):
            s = f"{secs:.6f}".rstrip("0").rstrip(".")
            out += f"{s}S"
    return out


def _cast_series(s: pd.Series, ftype: str, fmt: Optional[str]):
    """Return (cast_series, failure_mask). Failures = non-null values that
    could not be cast."""
    notnull = s.notna()
    if ftype == "integer":
        out = pd.to_numeric(s, errors="coerce")
        fail = notnull & out.isna()
        # non-integral floats are cast failures for 'integer'
        fail |= notnull & out.notna() & (out % 1 != 0)
        out = out.where(~fail)
        return out.astype("Int64"), fail
    if ftype == "number":
        out = pd.to_numeric(s, errors="coerce").astype("float64")
        return out, notnull & out.isna()
    if ftype == "string":
        out = s.astype("object").where(~notnull, None)
        out = out.where(~notnull, None)
        out[notnull] = s[notnull].astype(str)
        return out, pd.Series(False, index=s.index)
    if ftype == "boolean":
        def conv(v):
            if isinstance(v, bool):
                return v
            if str(v) in _BOOL_TRUE:
                return True
            if str(v) in _BOOL_FALSE:
                return False
            return None
        out = s.map(lambda v: conv(v) if v is not None and v == v else None)
        return out.astype("boolean"), notnull & out.isna()
    if ftype in ("date", "datetime"):
        out = pd.to_datetime(s, format=fmt, errors="coerce")
        fail = notnull & out.isna()
        bad_sep = None
        if ftype == "datetime" and fmt is None:
            # reference default datetime format is STRICT ISO-8601 with a
            # 'T' separator (tableschema '%Y-%m-%dT%H:%M:%S'); str(dt)
            # uses a space and must fail (test_lib.py test_load_dates)
            import re as _re
            iso_t = _re.compile(
                r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
                r"(\.\d+)?([+-]\d{2}:?\d{2}|Z)?$")
            bad_sep = s.map(lambda v: isinstance(v, str)
                            and not iso_t.match(v))
            out = out.where(~bad_sep, pd.NaT)
            fail = fail | (notnull & bad_sep)
        if fail.any():
            # pandas Timestamp bounds (1677-2262) are narrower than the
            # date/datetime types (year 1-9999): retry failures with
            # Python strptime and return an object series when any
            # out-of-bounds value is real (reference test_stream_bad_dates)
            import datetime as _dt
            retried = {}
            for idx in s.index[fail]:
                if bad_sep is not None and bad_sep.loc[idx]:
                    continue  # strict-ISO rejection is final
                v = s.loc[idx]
                try:
                    dt = (_dt.datetime.strptime(str(v), fmt) if fmt
                          else _dt.datetime.fromisoformat(str(v)))
                    retried[idx] = dt
                except (ValueError, TypeError):
                    pass
            if retried:
                final, still_fail = [], []
                for idx in s.index:
                    if idx in retried:
                        dt = retried[idx]
                        final.append(dt if ftype == "datetime"
                                     else dt.date())
                        still_fail.append(False)
                    elif pd.isna(out.loc[idx]):
                        final.append(None)
                        still_fail.append(bool(notnull.loc[idx]))
                    else:
                        t = out.loc[idx]
                        final.append(t.to_pydatetime()
                                     if ftype == "datetime" else t.date())
                        still_fail.append(False)
                return (pd.Series(final, index=s.index, dtype="object"),
                        pd.Series(still_fail, index=s.index))
        if ftype == "date":
            out = out.dt.date.where(out.notna(), None)
        return out, fail
    if ftype == "time":
        out = pd.to_datetime(s, format=fmt or "%H:%M:%S", errors="coerce")
        fail = notnull & out.isna()
        out = pd.Series([t.time() if t is not pd.NaT and t == t else None
                         for t in out], index=s.index, dtype="object")
        return out, fail
    if ftype == "duration":
        vals, fails = [], []
        for v in s:
            if v is None or v != v:
                vals.append(None)
                fails.append(False)
                continue
            try:
                vals.append(parse_iso_duration(v))
                fails.append(False)
            except (ValueError, TypeError):
                vals.append(None)
                fails.append(True)
        return (pd.Series(vals, index=s.index, dtype="object"),
                pd.Series(fails, index=s.index))
    if ftype == "year":
        out = pd.to_numeric(s, errors="coerce")
        fail = notnull & (out.isna() | (out % 1 != 0))
        return out.where(~fail).astype("Int64"), fail
    if ftype == "yearmonth":
        # -> [year, month] pairs (reference: (year, month) named tuple)
        rx = re.compile(r"^(\d{4})-(\d{1,2})$")
        vals, fails = [], []
        for v in s:
            if v is None or v != v:
                vals.append(None); fails.append(False); continue
            m = rx.match(str(v).strip())
            if m and 1 <= int(m.group(2)) <= 12:
                vals.append([int(m.group(1)), int(m.group(2))]); fails.append(False)
            else:
                vals.append(None); fails.append(True)
        return (pd.Series(vals, index=s.index, dtype="object"),
                pd.Series(fails, index=s.index))
    if ftype == "geopoint":
        # "lon,lat" string or [lon, lat] -> [lon, lat] float pair
        vals, fails = [], []
        for v in s:
            if v is None or (isinstance(v, float) and v != v):
                vals.append(None); fails.append(False); continue
            try:
                if isinstance(v, (list, tuple)) and len(v) == 2:
                    vals.append([float(v[0]), float(v[1])]); fails.append(False)
                else:
                    lon, lat = str(v).split(",")
                    vals.append([float(lon), float(lat)]); fails.append(False)
            except (ValueError, TypeError):
                vals.append(None); fails.append(True)
        return (pd.Series(vals, index=s.index, dtype="object"),
                pd.Series(fails, index=s.index))
    if ftype == "decimal":
        # exact-decimal opt-in (reference maps frictionless 'number' to
        # Decimal everywhere; engine default is float64 — SURVEY §1.2)
        import decimal as _decimal
        vals, fails = [], []
        for v in s:
            if v is None or (isinstance(v, float) and v != v):
                vals.append(None); fails.append(False); continue
            try:
                vals.append(_decimal.Decimal(str(v))); fails.append(False)
            except _decimal.InvalidOperation:
                vals.append(None); fails.append(True)
        return (pd.Series(vals, index=s.index, dtype="object"),
                pd.Series(fails, index=s.index))
    if ftype == "any" or ftype is None:
        return s, pd.Series(False, index=s.index)
    raise ValueError(f"Unsupported cast type: {ftype}")


class _CastKernel:
    """Batch fn casting a set of (column, type, format) with a policy."""

    def __init__(self, casts: List[Dict[str, Any]], on_error: str,
                 transform: Optional[Callable] = None):
        self.casts = casts
        self.on_error = on_error
        # reference set_type.py:22-35 wrap_transformer: only pass the
        # kwargs (field_name / row) the user's callable actually accepts
        if transform is not None:
            from inspect import signature
            params = signature(transform).parameters
            accepted = {k for k in ("field_name", "row") if k in params}
            if accepted != {"field_name", "row"}:
                inner = transform

                def transform(v, field_name=None, row=None,
                              _inner=inner, _accepted=accepted):
                    kw = {}
                    if "field_name" in _accepted:
                        kw["field_name"] = field_name
                    if "row" in _accepted:
                        kw["row"] = row
                    return _inner(v, **kw)
        self.transform = transform

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        drop_mask = pd.Series(False, index=df.index)
        for cast in self.casts:
            col, ftype, fmt = cast["name"], cast["type"], cast.get("format")
            if col not in df.columns:
                continue
            src = df[col]
            if self.transform is not None:
                rows = df.to_dict("records")
                src = pd.Series(
                    [self.transform(v, field_name=col, row=r)
                     for v, r in zip(src.tolist(), rows)], index=df.index)
            out, fail = _cast_series(src, ftype, fmt)
            if fail.any():
                if self.on_error == "raise":
                    bad = src[fail].iloc[0]
                    raise ValidationError(
                        f"Failed to cast value {bad!r} to {ftype} in field '{col}'",
                        field=col)
                if self.on_error == "drop":
                    drop_mask |= fail
                elif self.on_error == "ignore":
                    # keep the original (uncast) column entirely — Arrow
                    # columns are homogeneous, so partial non-cast is
                    # represented by leaving the column unchanged
                    continue
                # 'clear': failures already null in `out`
            df[col] = out
        if drop_mask.any():
            df = df[~drop_mask]
        return df


class set_type(Step):
    """Reference ``processors/set_type.py:10-72``."""

    def __init__(self, name: str, resources=None, regex: bool = True,
                 on_error: str = "raise", transform: Optional[Callable] = None,
                 **options):
        self.pattern = name
        self.regex = regex
        self.resources = resources
        self.on_error = on_error
        self.transform = transform
        self.options = options
        self.name = f"set_type({name})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        ftype = self.options.get("type")
        fmt = self.options.get("format")
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            cols = cheap_columns(ds)
            if self.regex:
                rx = re.compile("^" + self.pattern + "$")
                matched = [c for c in cols if rx.match(c)]
            else:
                matched = [c for c in cols if c == self.pattern]
            if not matched:
                raise ValueError(f"set_type: no field matches {self.pattern}")
            if ftype is not None or self.transform is not None:
                casts = [{"name": c, "type": ftype, "format": fmt}
                         for c in matched]
                kernel = _CastKernel(casts, self.on_error, self.transform)
                stream.set(rname, ds.map_batches(
                    kernel, batch_format="pandas",
                    batch_size=DEFAULT_BATCH_SIZE))
            # descriptor-only updates (e.g. title=) skip the cast kernel
            desc = stream.descriptor(rname)
            for c in matched:
                fd = desc.field_descriptor(c)
                if fd is None:
                    desc.fields.append({"name": c, **self.options})
                else:
                    fd.update(self.options)
        return stream


class validate(Step):
    """Reference ``processors/validate.py:9-61``: field-predicate
    (``validate(col, fn)``), row-predicate (``validate(fn)``), or
    schema-cast (no args: re-cast per descriptor fields)."""

    def __init__(self, *args, resources=None, on_error: str = "raise"):
        self.args = args
        self.resources = resources
        self.on_error = on_error
        self.name = "validate"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        on_error = self.on_error
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            if len(self.args) == 2:
                col, pred = self.args

                def fn(df: pd.DataFrame) -> pd.DataFrame:
                    ok = df[col].map(lambda v: bool(pred(v)))
                    return _route(df, ok, on_error, col)
            elif len(self.args) == 1:
                pred = self.args[0]

                def fn(df: pd.DataFrame) -> pd.DataFrame:
                    ok = pd.Series([bool(pred(r)) for r in df.to_dict("records")],
                                   index=df.index)
                    return _route(df, ok, on_error, None)
            else:
                desc = stream.descriptor(rname)
                casts = [f for f in desc.fields if f.get("type")]
                kernel = _CastKernel(casts, on_error)
                fn = kernel
            stream.set(rname, ds.map_batches(
                fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE))
        return stream


def _route(df: pd.DataFrame, ok: pd.Series, on_error: str, col: Optional[str]):
    if ok.all():
        return df
    if on_error == "raise":
        bad = df[~ok].iloc[0].to_dict()
        raise ValidationError(f"Row failed validation: {bad}", field=col)
    if on_error == "drop":
        return df[ok]
    return df  # 'ignore'


class update_package(Step):
    def __init__(self, **metadata):
        self.metadata = metadata
        self.name = "update_package"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        stream.package.metadata.update(self.metadata)
        return stream


add_metadata = update_package  # reference alias (add_metadata.py)


class update_resource(Step):
    def __init__(self, resources, **props):
        self.resources = resources
        self.props = props
        self.name = "update_resource"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            desc = stream.descriptor(rname)
            new_name = self.props.get("name")
            desc.metadata.update(self.props)
            if new_name and new_name != rname:
                ds = stream.get(rname)
                stream.drop(rname)
                desc.name = new_name
                stream.set(new_name, ds)
                stream.package.resources[new_name] = desc
        return stream


class update_schema(Step):
    def __init__(self, resources, **props):
        self.resources = resources
        self.props = props
        self.name = "update_schema"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            desc = stream.descriptor(rname)
            if "missingValues" in self.props:
                desc.missing_values = self.props["missingValues"]
            if "primaryKey" in self.props:
                desc.primary_key = list(self.props["primaryKey"])
            desc.metadata.setdefault("schema", {}).update(self.props)
        return stream


class set_primary_key(Step):
    def __init__(self, primary_key: List[str], resources=None):
        self.primary_key = list(primary_key)
        self.resources = resources
        self.name = "set_primary_key"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            stream.descriptor(rname).primary_key = list(self.primary_key)
        return stream
