"""Extended-type parity + CSV load fidelity.

Mirrors reference behaviors:
- decimal casts (tests/test_lib.py:1648-1653 expects Decimal values),
- duration / tz-aware datetime / set ejson round-trip
  (helpers/extended_json.py:41-106),
- year / yearmonth / geopoint casts (frictionless extended types),
- CSV duplicate-header renaming (processors/load.py:285-302),
- extract_missing_values (processors/load.py:258-270,
  tests/test_lib.py:2076-2160).
"""

import datetime
import os
from decimal import Decimal

import pytest

from dataflows_ray import Flow, iterable_loader, load, set_type, stream, unstream
from dataflows_ray.stages.schema_ops import (
    parse_iso_duration, format_iso_duration)


def test_decimal_cast():
    data = [{"v": "31.5"}, {"v": "2"}, {"v": None}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        set_type("v", type="decimal"),
    ).results()
    rows = results[0]
    assert rows[0]["v"] == Decimal("31.5")
    assert isinstance(rows[0]["v"], Decimal)
    assert rows[1]["v"] == Decimal("2")
    assert rows[2]["v"] is None


def test_duration_cast_and_helpers():
    td = parse_iso_duration("P2DT3H4M5.5S")
    assert td == datetime.timedelta(days=2, hours=3, minutes=4, seconds=5.5)
    assert parse_iso_duration(format_iso_duration(td)) == td
    # negative + weeks
    assert parse_iso_duration("-P1W") == -datetime.timedelta(weeks=1)
    with pytest.raises(ValueError):
        parse_iso_duration("not-a-duration")

    data = [{"d": "PT90S"}, {"d": "P1D"}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        set_type("d", type="duration"),
    ).results()
    assert results[0][0]["d"] == datetime.timedelta(seconds=90)
    assert results[0][1]["d"] == datetime.timedelta(days=1)


def test_year_yearmonth_geopoint_casts():
    data = [{"y": "2020", "ym": "2020-03", "gp": "34.7,32.1"}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        set_type("y", type="year"),
        set_type("ym", type="yearmonth"),
        set_type("gp", type="geopoint"),
    ).results()
    row = results[0][0]
    assert row["y"] == 2020
    assert list(row["ym"]) == [2020, 3]
    assert list(row["gp"]) == [34.7, 32.1]


def test_stream_roundtrip_extended_types(tmp_path):
    tz = datetime.timezone(datetime.timedelta(hours=2), "IST")
    data = [{
        "dec": Decimal("1.25"),
        "dur": datetime.timedelta(hours=1, seconds=30),
        "dt_tz": datetime.datetime(2020, 1, 2, 3, 4, 5, tzinfo=tz),
        "dt": datetime.datetime(2021, 6, 7, 8, 9, 10),
        "s": {"a", "b"},
    }]
    path = str(tmp_path / "stream.ndjson")
    Flow(iterable_loader(data, name="t"), stream(path)).process()
    results, _, _ = Flow(unstream(path)).results()
    row = results[0][0]
    assert row["dec"] == Decimal("1.25")
    assert row["dur"] == datetime.timedelta(hours=1, seconds=30)
    assert row["dt_tz"] == datetime.datetime(2020, 1, 2, 3, 4, 5, tzinfo=tz)
    assert row["dt_tz"].utcoffset() == datetime.timedelta(hours=2)
    assert row["dt"] == datetime.datetime(2021, 6, 7, 8, 9, 10)
    assert row["s"] == {"a", "b"}


def test_csv_deduplicate_headers(tmp_path):
    p = str(tmp_path / "dup.csv")
    with open(p, "w") as f:
        f.write("a,b,a,a\n1,2,3,4\n")
    results, pkg, _ = Flow(
        load(p, name="t", deduplicate_headers=True),
    ).results()
    row = results[0][0]
    # reference renaming: first dup retroactively 'a (1)', then 'a (2)'...
    assert set(row.keys()) == {"a (1)", "b", "a (2)", "a (3)"}
    assert row["a (1)"] == 1 and row["a (2)"] == 3 and row["a (3)"] == 4


def test_csv_duplicate_headers_without_flag_fails_or_renames(tmp_path):
    p = str(tmp_path / "dup2.csv")
    with open(p, "w") as f:
        f.write("x,x\n1,2\n")
    with pytest.raises(Exception):
        Flow(load(p, name="t")).results()


MISSING_CSV = "col1,col2\n1,1\nerr1,2\n3,3\n4,err2\n5,5\nmis1,mis2\n7,7\n"
SCHEMA = {
    "missingValues": ["err1", "err2", "mis1", "mis2"],
    "fields": [
        {"name": "col1", "type": "number", "format": "default"},
        {"name": "col2", "type": "number", "format": "default"},
    ],
}


def _norm(row):
    """NaN -> None (engine 'number' policy is float64; nulls surface as
    NaN from pandas blocks). Int/float equality covers the rest."""
    return {k: (None if isinstance(v, float) and v != v else v)
            for k, v in row.items()}


def _write_missing_csv(tmp_path):
    p = str(tmp_path / "missing_values.csv")
    with open(p, "w") as f:
        f.write(MISSING_CSV)
    return p


def test_extract_missing_values(tmp_path):
    p = _write_missing_csv(tmp_path)
    results, pkg, _ = Flow(
        load(p, name="t", override_schema=SCHEMA, extract_missing_values=True),
    ).results()
    desc = pkg.descriptor("t")
    assert desc.fields[2] == {
        "name": "missingValues", "type": "object", "format": "default",
        "values": SCHEMA["missingValues"]}
    rows = [_norm({k: r[k] for k in ("col1", "col2", "missingValues")})
            for r in results[0]]
    assert rows == [
        {"col1": 1, "col2": 1, "missingValues": {}},
        {"col1": None, "col2": 2, "missingValues": {"col1": "err1"}},
        {"col1": 3, "col2": 3, "missingValues": {}},
        {"col1": 4, "col2": None, "missingValues": {"col2": "err2"}},
        {"col1": 5, "col2": 5, "missingValues": {}},
        {"col1": None, "col2": None,
         "missingValues": {"col1": "mis1", "col2": "mis2"}},
        {"col1": 7, "col2": 7, "missingValues": {}},
    ]


def test_extract_missing_values_options(tmp_path):
    p = _write_missing_csv(tmp_path)
    results, pkg, _ = Flow(
        load(p, name="t", override_schema=SCHEMA,
             extract_missing_values={"source": "col1", "target": "notes"}),
    ).results()
    rows = [_norm({k: r[k] for k in ("col1", "col2", "notes")})
            for r in results[0]]
    assert rows == [
        {"col1": 1, "col2": 1, "notes": {}},
        {"col1": None, "col2": 2, "notes": {"col1": "err1"}},
        {"col1": 3, "col2": 3, "notes": {}},
        {"col1": 4, "col2": None, "notes": {}},
        {"col1": 5, "col2": 5, "notes": {}},
        {"col1": None, "col2": None, "notes": {"col1": "mis1"}},
        {"col1": 7, "col2": 7, "notes": {}},
    ]
