"""set_type/validate error policies, checkpoint memoization,
dump_to_path counters, stream/unstream round-trip, dump_to_sql,
parallelize — conformance ports of reference tests/test_lib.py."""

import datetime
import json
import os
import sqlite3

import pytest

from dataflows_ray import (
    Flow, iterable_loader, set_type, validate, update_resource,
    set_primary_key, checkpoint, dump_to_path, stream, unstream,
    dump_to_sql, parallelize, StepError, load,
)


def test_set_type_integer_cast():
    data = [{"a": "1"}, {"a": "2"}]
    results, _, _ = Flow(data, set_type("a", type="integer")).results()
    assert results == [[{"a": 1}, {"a": 2}]]


def test_set_type_regex_matches_multiple():
    data = [{"n1": "1", "n2": "2", "s": "x"}]
    results, _, _ = Flow(data, set_type("n.*", type="integer")).results()
    assert results == [[{"n1": 1, "n2": 2, "s": "x"}]]


def test_set_type_on_error_raise():
    data = [{"a": "1"}, {"a": "nope"}]
    with pytest.raises(StepError):
        Flow(data, set_type("a", type="integer")).results()


def test_set_type_on_error_drop():
    data = [{"a": "1"}, {"a": "nope"}, {"a": "3"}]
    results, _, _ = Flow(
        data, set_type("a", type="integer", on_error="drop")).results()
    assert [r["a"] for r in results[0]] == [1, 3]


def test_set_type_on_error_clear():
    data = [{"a": "1"}, {"a": "nope"}]
    results, _, _ = Flow(
        data, set_type("a", type="integer", on_error="clear")).results()
    assert [r["a"] for r in results[0]] == [1, None]


def test_set_type_datetime_format():
    # reference test_lib.py:1475-1493 (set_type with format)
    data = [{"d": "2000/01/01"}]
    results, _, _ = Flow(
        data, set_type("d", type="date", format="%Y/%m/%d")).results()
    assert results[0][0]["d"] == datetime.date(2000, 1, 1)


def test_set_type_transform_hook():
    data = [{"a": "x1"}]
    results, _, _ = Flow(
        data,
        set_type("a", type="integer",
                 transform=lambda v, field_name, row: v.lstrip("x")),
    ).results()
    assert results[0][0]["a"] == 1


def test_validate_field_predicate_drop():
    data = [{"a": 1}, {"a": -5}, {"a": 3}]
    results, _, _ = Flow(
        data, validate("a", lambda v: v > 0, on_error="drop")).results()
    assert [r["a"] for r in results[0]] == [1, 3]


def test_validate_row_predicate_raise():
    data = [{"a": 1, "b": 2}]
    with pytest.raises(StepError):
        Flow(data, validate(lambda row: row["a"] > row["b"])).results()


def test_update_resource_rename():
    results, stream_out, _ = Flow(
        iterable_loader([{"x": 1}], name="old"),
        update_resource(["old"], name="new"),
    ).results()
    assert stream_out.resource_names() == ["new"]


def test_checkpoint_producer_runs_once(tmp_path):
    # reference tests/test_lib.py:961-990: producer invoked exactly once
    calls = []

    def producer():
        # generator: body runs only when drained (mirrors the reference's
        # lazy source in tests/test_lib.py:961-990)
        calls.append(1)
        yield {"x": 1}
        yield {"x": 2}

    def flow():
        return Flow(
            iterable_loader(producer(), name="t"),
            checkpoint("cp1", checkpoint_path=str(tmp_path)),
        )

    r1, _, _ = flow().results()
    r2, _, _ = flow().results()
    r3, _, _ = flow().results()
    assert r1 == r2 == r3 == [[{"x": 1}, {"x": 2}]]
    assert len(calls) == 1  # runs 2 and 3 loaded from the checkpoint


def test_dump_to_path_counters(tmp_path):
    out = str(tmp_path / "out")
    _, stats = Flow(
        iterable_loader([{"x": i} for i in range(100)], name="t"),
        dump_to_path(out),
    ).process()
    manifest = json.load(open(os.path.join(out, "datapackage.json")))
    res = manifest["resources"][0]
    assert res["name"] == "t" and res["count_of_rows"] == 100
    assert res["bytes"] > 0
    assert stats["count_of_rows__t"] == 100


def test_dump_to_path_csv(tmp_path):
    out = str(tmp_path / "outcsv")
    Flow(
        iterable_loader([{"x": 1, "y": "a"}], name="t"),
        dump_to_path(out, format="csv"),
    ).process()
    files = os.listdir(os.path.join(out, "t"))
    assert any(f.endswith(".csv") for f in files)


def test_stream_unstream_roundtrip(tmp_path):
    # reference test_lib.py:1449-1493
    f = str(tmp_path / "s.ndjson")
    data = [{"x": 1, "d": datetime.datetime(2020, 1, 2, 3, 4, 5),
             "b": b"\x00\x01"},
            {"x": 2, "d": datetime.datetime(2021, 6, 7, 8, 9), "b": b"zz"}]
    Flow(iterable_loader(data, name="t"), stream(f)).process()
    assert os.path.exists(f) and not os.path.exists(f + ".active")
    results, _, _ = Flow(unstream(f)).results()
    assert results == [data]


def test_dump_to_sql_roundtrip(tmp_path):
    db = str(tmp_path / "t.db")
    Flow(
        iterable_loader([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}], name="t"),
        set_primary_key(["k"]),
        dump_to_sql({"mytable": {"resource-name": "t"}},
                    engine=f"sqlite:///{db}"),
    ).process()
    rows = sqlite3.connect(db).execute(
        "SELECT k, v FROM mytable ORDER BY k").fetchall()
    assert rows == [(1, "a"), (2, "b")]


def test_dump_to_sql_update_mode(tmp_path):
    db = str(tmp_path / "u.db")

    def write(rows, mode):
        Flow(
            iterable_loader(rows, name="t"),
            set_primary_key(["k"]),
            dump_to_sql({"m": {"resource-name": "t", "mode": mode}},
                        engine=f"sqlite:///{db}"),
        ).process()

    write([{"k": 1, "v": "a"}], "update")
    write([{"k": 1, "v": "B"}, {"k": 2, "v": "c"}], "update")
    rows = sqlite3.connect(db).execute(
        "SELECT k, v FROM m ORDER BY k").fetchall()
    assert rows == [(1, "B"), (2, "c")]


def test_parallelize_shim():
    def slow_double(row):
        row["y"] = row["x"] * 2

    results, _, _ = Flow(
        iterable_loader([{"x": i} for i in range(50)], name="t"),
        parallelize(slow_double, num_processors=2),
    ).results()
    assert [r["y"] for r in results[0]] == [2 * i for i in range(50)]


def test_force_temporal_format_roundtrip(tmp_path):
    """Port of reference test_lib.py test_force_temporal_format: dump
    temporal fields with a custom strftime format taken from a field
    property, record it in the dumped schema, and round-trip through a
    datapackage load back to typed values."""
    out = str(tmp_path / "force_temporal_format")
    data = [
        {"event": "start",
         "when": datetime.datetime(2015, 1, 2, 15, 30, 45),
         "day": datetime.date(2015, 1, 2),
         "tod": datetime.time(15, 30, 45)},
        {"event": "end",
         "when": datetime.datetime(2016, 6, 25, 8, 10, 4),
         "day": datetime.date(2016, 6, 25),
         "tod": datetime.time(8, 10, 4)},
    ]
    Flow(
        iterable_loader(data, name="temporal"),
        set_type("when", type="datetime",
                 outputFormat="%y|%m|%d %H|%M|%S"),
        set_type("day", type="date", outputFormat="%y|%m|%d"),
        set_type("tod", type="time", outputFormat="%H|%M|%S"),
        dump_to_path(out, format="csv",
                     temporal_format_property="outputFormat"),
    ).process()

    # the CSV really contains the custom format
    csv_dir = os.path.join(out, "temporal")
    csv_text = "".join(open(os.path.join(csv_dir, f)).read()
                       for f in sorted(os.listdir(csv_dir)))
    assert "15|01|02 15|30|45" in csv_text
    assert "16|06|25" in csv_text
    # the dumped schema records the format
    manifest = json.load(open(os.path.join(out, "datapackage.json")))
    fields = {f["name"]: f for f in manifest["resources"][0]["schema"]["fields"]}
    assert fields["when"]["format"] == "%y|%m|%d %H|%M|%S"
    assert fields["day"]["format"] == "%y|%m|%d"

    # reload through the datapackage: typed values come back
    results, _, _ = Flow(
        load(os.path.join(out, "datapackage.json"))).results()
    rows = sorted(results[0], key=lambda r: r["event"])
    assert rows[1]["when"] == datetime.datetime(2015, 1, 2, 15, 30, 45)
    assert rows[1]["day"] == datetime.date(2015, 1, 2)
    assert rows[1]["tod"] == datetime.time(15, 30, 45)
    assert rows[0]["when"] == datetime.datetime(2016, 6, 25, 8, 10, 4)


def test_dump_to_path_use_titles(tmp_path):
    """Port of reference test_lib.py test_dump_to_path_use_titles: CSV
    headers come from field titles."""
    out = str(tmp_path / "dump_with_titles")
    Flow(
        iterable_loader([{"hello": "world", "hola": "mundo"}], name="res_1"),
        set_type("hello", title="shalom"),
        set_type("hola", title="aloha"),
        dump_to_path(out, format="csv", use_titles=True),
    ).process()
    csv_dir = os.path.join(out, "res_1")
    text = "".join(open(os.path.join(csv_dir, f)).read()
                   for f in sorted(os.listdir(csv_dir)))
    header = text.strip().splitlines()[0]
    assert "shalom" in header and "aloha" in header
    assert "world" in text and "mundo" in text


def _geojson_of(out, rname):
    return json.load(open(os.path.join(out, rname, rname + ".geojson")))


def test_dump_to_geopoint_format_string(tmp_path):
    """Port of reference test_dump_to_geopoint: a geopoint built by the
    format computed-field op ("lat, long" string) dumps as numeric Point
    coordinates."""
    from dataflows_ray import add_computed_field, delete_fields
    out = str(tmp_path / "geo")
    data = [{"id": 1, "city": "london", "lat": 51.509865, "long": -0.118092},
            {"id": 2, "city": "paris", "lat": 48.8566, "long": 2.3522}]
    Flow(
        iterable_loader(data, name="cities_location"),
        add_computed_field(target={"name": "Location", "type": "geopoint"},
                           operation="format", with_="{lat}, {long}"),
        delete_fields(["lat", "long"]),
        dump_to_path(out, format="geojson"),
    ).process()
    doc = _geojson_of(out, "cities_location")
    assert doc["type"] == "FeatureCollection"
    feats = sorted(doc["features"], key=lambda f: f["properties"]["id"])
    assert feats[0]["geometry"] == {
        "type": "Point", "coordinates": [51.509865, -0.118092]}
    assert feats[0]["properties"] == {"id": 1, "city": "london"}


def test_dump_to_geopoint_array(tmp_path):
    """Port of reference test_dump_to_geopoint_array: a [lat, long] list
    geopoint dumps identically."""
    from dataflows_ray import add_field, delete_fields
    out = str(tmp_path / "geo2")
    data = [{"id": 1, "city": "rome", "lat": 41.9028, "long": 2.4964}]
    Flow(
        iterable_loader(data, name="cities_location"),
        add_field("Location", "geopoint",
                  default=lambda row: [row["lat"], row["long"]]),
        delete_fields(["lat", "long"]),
        dump_to_path(out, format="geojson"),
    ).process()
    doc = _geojson_of(out, "cities_location")
    assert doc["features"][0]["geometry"] == {
        "type": "Point", "coordinates": [41.9028, 2.4964]}


def test_dump_to_json_objects(tmp_path):
    """Port of reference test_dump_to_json_objects: object-typed fields
    survive a json dump."""
    import glob
    from dataflows_ray import add_field
    out = str(tmp_path / "json_objects")
    data = [dict(a=i / 100, b=i / 10) for i in range(20)]
    Flow(
        iterable_loader(data, name="res_1"),
        add_field("c", "object", default=lambda r: dict(a=r["a"], b=r["b"])),
        dump_to_path(out, format="json"),
    ).process()
    rows = []
    for f in sorted(glob.glob(os.path.join(out, "res_1", "*"))):
        rows += [json.loads(line) for line in open(f) if line.strip()]
    rows.sort(key=lambda r: r["a"])
    assert rows[5]["c"] == {"a": rows[5]["a"], "b": rows[5]["b"]}
    assert len(rows) == 20


def test_stream_bad_dates_file_object(tmp_path):
    """Port of reference test_stream_bad_dates: a year-1 date (outside
    pandas Timestamp bounds) survives cast + stream/unstream round trip,
    with stream/unstream taking OPEN FILE objects like the reference."""
    from dataflows_ray import set_type as _set_type
    p = str(tmp_path / "bad_dates.stream")
    Flow(
        iterable_loader([{"a": "0001/1/1"}], name="t"),
        _set_type("a", type="date", format="%Y/%m/%d"),
        stream(open(p, "w")),
    ).process()
    results, _, _ = Flow(unstream(open(p))).results()
    assert results[0][0]["a"] == datetime.date(1, 1, 1)


def test_dump_to_sql_with_indexes(tmp_path):
    """Port of reference test_dump_to_sql_with_indexes."""
    db = str(tmp_path / "idx.db")
    Flow(
        iterable_loader([{"id": 1, "name": "Paul"}, {"id": 2, "name": "John"}],
                        name="res_1"),
        dump_to_sql({"output_table": {"resource-name": "res_1",
                                      "indexes_fields": [["id"]]}},
                    engine=f"sqlite:///{db}"),
    ).process()
    con = sqlite3.connect(db)
    idx = con.execute(
        "SELECT name FROM sqlite_master WHERE type='index' "
        "AND tbl_name='output_table'").fetchall()
    assert idx
    assert con.execute("SELECT count(*) FROM output_table").fetchone()[0] == 2


def test_dump_to_path_partition_by(tmp_path):
    import os
    import duckdb
    from dataflows_ray import Flow, iterable_loader, dump_to_path
    rows = [{"k": i % 3, "v": i} for i in range(30)]
    out = str(tmp_path / "part_out")
    Flow(
        iterable_loader(rows, name="t"),
        dump_to_path(out, format="parquet", partition_by=["k"]),
    ).process()
    # hive layout: one directory per k value
    dirs = sorted(d for d in os.listdir(os.path.join(out, "t"))
                  if d.startswith("k="))
    assert dirs == ["k=0", "k=1", "k=2"]
    got = duckdb.sql(
        f"SELECT CAST(k AS BIGINT) k, v FROM read_parquet('{out}/t/*/*.parquet', hive_partitioning=1) ORDER BY v"
    ).fetchdf()
    assert got["v"].tolist() == list(range(30))
    assert got["k"].tolist() == [i % 3 for i in range(30)]


def test_dump_to_path_partition_by_readback_types(tmp_path):
    from dataflows_ray import Flow, iterable_loader, dump_to_path
    rows = [{"k": i % 2, "v": float(i)} for i in range(10)]
    out = str(tmp_path / "part_rb")
    dss = Flow(
        iterable_loader(rows, name="t"),
        dump_to_path(out, format="parquet", partition_by=["k"]),
    ).datasets()
    df = dss.get("t").to_pandas().sort_values("v").reset_index(drop=True)
    # readback restored the partition column's integer type
    assert df["k"].tolist() == [i % 2 for i in range(10)]
    assert str(df["k"].dtype).startswith("int")
