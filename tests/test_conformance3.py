"""Conformance ports, round 3 — remaining reference behaviors from
``/root/reference/tests/test_lib.py`` / ``test_examples.py`` not yet
covered by the earlier port files:

- duplicate() default args + many rows   (test_lib.py:740-760)
- Flow used as a step                    (test_lib.py:785-796)
- set_type same field across resources   (test_lib.py:1203-1221)
- load(name=...) name/path descriptor    (test_lib.py:925-940)
- update_resource(None, name=...)        (test_examples.py:281-291)
- rename_fields double-rename collision  (test_lib.py:2476-2503)
- empty/ragged CSV headers               (test_lib.py:1356-1380)
- set_type datetime format + round trip  (test_lib.py:1240-1273)
- 1M-row load+cast profile               (test_lib.py:2599-2625)
"""

import csv
import datetime
import os

import numpy as np
import pytest

from dataflows_ray import (
    Flow, load, set_type, concatenate, validate, duplicate, rename_fields,
    update_resource, dump_to_path, StepError,
)


def test_duplicate_default_args_many_rows():
    results, _, _ = Flow(
        ({"a": i, "b": i} for i in range(10000)),
        duplicate(),
    ).results()
    assert len(results[0]) == 10000
    assert len(results[1]) == 10000
    assert results[0] == results[1]


def test_flow_as_step():
    def upper(row):
        for k in row:
            row[k] = row[k].upper()

    def lower_first_letter(row):
        for k in row:
            row[k] = row[k][0].lower() + row[k][1:]

    text_processing_flow = Flow(upper, lower_first_letter)
    results, _, _ = Flow([{"foo": "bar"}], text_processing_flow).results()
    assert results == [[{"foo": "bAR"}]]


def test_set_type_same_field_multi_resource():
    data1 = [dict(a=[i, 2]) for i in range(5)]
    data2 = [dict(a=[i, 2]) for i in range(5)]
    res = Flow(
        data1, data2,
        set_type("a", type="integer", transform=lambda v: v[0],
                 resources=None),
        concatenate(dict(a=[])),
        validate(),
    ).results()[0][0]
    assert res == [dict(a=i) for i in [0, 1, 2, 3, 4] * 2]


def test_load_name_path(tmp_path):
    import json
    rows = [{"name": "john", "age": 37}, {"name": "paul", "age": 36}]
    jpath = tmp_path / "beatles_age.json"
    jpath.write_text(json.dumps(rows))
    cpath = tmp_path / "beatles_age.csv"
    with open(cpath, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name", "age"])
        w.writeheader()
        w.writerows(rows)

    _, stream, _ = Flow(
        load(str(jpath), name="foo"),
        load(str(cpath)),
    ).results()
    names = stream.resource_names()
    assert names == ["foo", "beatles_age"]
    assert stream.descriptor("foo").metadata["path"] == "foo.json"
    assert stream.descriptor("beatles_age").metadata["path"] == \
        "beatles_age.csv"


def test_update_resource_rename():
    _, stream, _ = Flow(
        ({"a": x} for x in range(10)),
        update_resource(None, name="renamed"),
    ).results()
    assert stream.resource_names() == ["renamed"]
    assert stream.descriptor("renamed").name == "renamed"


def test_rename_fields_double_rename_collision_raises():
    data = [dict(a1=i, a2=i, c=i) for i in range(5)]
    with pytest.raises((StepError, Exception)):
        Flow(data, rename_fields({r"a(\d)": r"A"})).results()


def test_rename_fields_double_rename_different_resources():
    data1 = [dict(a1=i, b=i, c=i) for i in range(5)]
    data2 = [dict(a2=i, b=i, c=i) for i in range(5)]
    res = Flow(
        data1, data2,
        rename_fields({r"a(\d)": r"A"}),
    ).results()[0]
    assert res == [
        [dict(A=i, b=i, c=i) for i in range(5)],
        [dict(A=i, b=i, c=i) for i in range(5)],
    ]


def test_load_empty_headers(tmp_path):
    # header has trailing empty cells; data rows are ragged
    p = tmp_path / "empty_headers.csv"
    p.write_text("a,b,,,\n1,2,,,,,\n2,3\n3,4,,\n5,6,,,")
    results, stream, _ = Flow(load(str(p))).results()
    assert results[0] == [
        {"a": 1, "b": 2},
        {"a": 2, "b": 3},
        {"a": 3, "b": 4},
        {"a": 5, "b": 6},
    ]
    schema = stream.get("empty_headers").schema()
    assert schema.names == ["a", "b"]


def test_load_dates_format_and_roundtrip(tmp_path):
    _today = datetime.date(2021, 3, 4)
    _now = datetime.datetime(2021, 3, 4, 5, 6, 7, 890123)

    def run_flow(datetime_format=None):
        return Flow(
            [{"today": str(_today), "now": str(_now)}],
            set_type("today", type="date"),
            set_type("now", type="datetime", format=datetime_format),
            dump_to_path(str(tmp_path / "dump_dates"), format="csv"),
        ).process()

    # str(datetime) is not isoformat — default parse must fail
    with pytest.raises((StepError, Exception)):
        run_flow()

    run_flow(datetime_format="%Y-%m-%d %H:%M:%S.%f")
    results, _, _ = Flow(
        load(str(tmp_path / "dump_dates" / "datapackage.json")),
    ).results()
    row = results[0][0]
    assert row["today"] == _today
    got = row["now"]
    assert (got.year, got.month, got.day, got.hour, got.minute,
            got.second) == (2021, 3, 4, 5, 6, 7)


def test_profile_1m_rows(tmp_path):
    """Port of the reference's only perf-adjacent workload
    (test_lib.py:2599-2625): 1M-row CSV, full load+cast, correctness
    asserted. Vectorized verification (the reference loops rows)."""
    NUM = 1_000_000
    filename = tmp_path / "test.csv"
    ids = np.arange(NUM)
    import pyarrow as pa
    import pyarrow.csv as pacsv
    tbl = pa.table({
        "id": ids,
        "name": pa.array([f"name is {i}" for i in range(NUM)]),
        "age": ids % 100,
        "percent": ids / 100,
    })
    pacsv.write_csv(tbl, str(filename))

    stream = Flow(load(str(filename))).datasets()
    df = stream.get("test").to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df) == NUM
    assert (df["id"].to_numpy() == ids).all()
    assert (df["age"].to_numpy() == ids % 100).all()
    assert np.allclose(df["percent"].to_numpy(), ids / 100)
    assert df["name"].iloc[123456] == "name is 123456"


def test_load_from_env_var(tmp_path, monkeypatch):
    """Port of reference test_lib.py test_load_from_env_var: an env://VAR
    source resolves the real path from the environment."""
    Flow(
        [{"foo": "bar"}],
        dump_to_path(str(tmp_path / "pkg"), format="csv"),
    ).process()
    monkeypatch.setenv("MY_DATAPACKAGE",
                       str(tmp_path / "pkg" / "datapackage.json"))
    results, dp, _ = Flow(load("env://MY_DATAPACKAGE")).results()
    assert len(results) == 1
    assert results[0] == [{"foo": "bar"}]
    with pytest.raises(ValueError):
        load("env://NOT_SET_VARIABLE_XYZ")


def test_load_dates_timezones(tmp_path):
    """Port of reference test_lib.py:1276 test_load_dates_timezones: naive
    and tz-aware datetimes (and their dates) survive a checkpoint
    round-trip."""
    from dataflows_ray import checkpoint
    dates = [
        datetime.datetime(2024, 5, 6, 7, 8, 9),
        datetime.datetime(2024, 5, 6, 7, 8, 9,
                          tzinfo=datetime.timezone.utc).astimezone(
            datetime.timezone(datetime.timedelta(hours=3))),
    ]
    ckpt = str(tmp_path / "ckpt")
    Flow(
        [{"date": d.date(), "datetime": d} for d in dates],
        checkpoint("tzdates", ckpt),
    ).process()
    results, _, _ = Flow(checkpoint("tzdates", ckpt)).results()
    assert [r["date"] for r in results[0]] == [d.date() for d in dates]
    assert [r["datetime"] for r in results[0]] == dates


def test_concatenate_multifield():
    """Port of reference test_lib.py:472: several aliases of the same
    target within ONE resource coalesce per row (last non-null wins)."""
    results, _, _ = Flow(
        [
            {"a": 1, "b": 2, "c": None},
            {"a": 2, "b": None, "c": 3},
            {"a": 3, "c": 4},
            {"a": 3, "b": 6, "c": 4},
        ],
        concatenate({
            "f1": ["a"],
            "f2": ["b", "c"],
        }),
    ).results()
    assert results[0] == [
        {"f1": 1, "f2": 2},
        {"f1": 2, "f2": 3},
        {"f1": 3, "f2": 4},
        {"f1": 3, "f2": 4},
    ]


def test_concatenate_mixed_type_aliases():
    """Aliases of one target with DIFFERENT types (int vs str) coalesce
    like the reference's per-row dict update — values keep their own
    types instead of raising in the Arrow if_else kernel."""
    results, _, _ = Flow(
        [
            {"a": 1, "b": None, "c": "x"},
            {"a": 2, "b": 5, "c": None},
            {"a": 3, "b": None, "c": None},
        ],
        concatenate({
            "f1": ["a"],
            "f2": ["b", "c"],
        }),
    ).results()
    assert results[0] == [
        {"f1": 1, "f2": "x"},
        {"f1": 2, "f2": 5},
        {"f1": 3, "f2": None},
    ]


def test_unpivot_no_regex():
    """Port of reference test_lib.py:223: regex=False treats unpivot field
    names literally, even when they are invalid regexes."""
    from dataflows_ray import unpivot
    data = [dict([("[.]", i), ("[,+", str(i))]) for i in range(3)]
    results, _, _ = Flow(
        data,
        unpivot(
            [dict(name="[.]", keys=dict(field="x")),
             dict(name="[,+", keys=dict(field="y"))],
            [dict(name="field", type="string")],
            dict(name="the-value", type="any"),
            regex=False,
        ),
    ).results()
    assert results[0] == [
        {"field": "x", "the-value": 0}, {"field": "y", "the-value": "0"},
        {"field": "x", "the-value": 1}, {"field": "y", "the-value": "1"},
        {"field": "x", "the-value": 2}, {"field": "y", "the-value": "2"},
    ]


def test_unpivot_any_resources():
    """Port of reference test_lib.py:355: one unpivot step applied to ALL
    resources, each with its own year columns."""
    from dataflows_ray import unpivot
    data1 = [dict([("name", f"ike{i}")]
                  + [(str(y), y + i) for y in range(1990, 2020, 10)])
             for i in range(5)]
    data2 = [dict([("city", f"mike{i}")]
                  + [(str(y), y + i) for y in range(2050, 2080, 10)])
             for i in range(5)]
    results, _, _ = Flow(
        data1,
        data2,
        unpivot(
            [dict(name="([0-9]+)", keys=dict(year="\\1"))],
            [dict(name="year", type="integer")],
            dict(name="amount", type="integer"),
        ),
    ).results()
    assert len(results[0]) == 15 and len(results[1]) == 15
    assert {"name": "ike0", "year": 1990, "amount": 1990} in results[0]
    assert {"city": "mike4", "year": 2070, "amount": 2074} in results[1]


def test_join_row_number_format_string(tmp_path):
    """Port of reference test_lib.py:1899: a format-string source key that
    embeds the 1-based row number ({#}) joined against a text column."""
    from dataflows_ray import join
    pop = tmp_path / "population.csv"
    pop.write_text("id,population\n1,8\n2,2\n4,3\n")
    cities = tmp_path / "cities_comment.csv"
    cities.write_text("city,comment\nparis,city with population in row 2\n"
                      "london,city with population in row 1\n"
                      "rome,city with population in row 3\n")
    results, _, _ = Flow(
        load(str(pop)),
        load(str(cities)),
        join(
            source_name="population",
            source_key="city with population in row {#}",
            target_name="cities_comment",
            target_key="{comment}",
            fields={"population": {"name": "population"}},
        ),
    ).results()
    assert results[0] == [
        {"city": "paris", "population": 2,
         "comment": "city with population in row 2"},
        {"city": "london", "population": 8,
         "comment": "city with population in row 1"},
        {"city": "rome", "population": 3,
         "comment": "city with population in row 3"},
    ]


def test_load_override_schema_title_and_missing(tmp_path):
    """Port of reference test_lib.py:1746: override_schema merges onto the
    inferred schema — title recorded, missingValues applied to the data."""
    p = tmp_path / "beatles_drumkits.csv"
    p.write_text("name,# drum kits\nRingo,2\nPete,N/A\n")
    results, stream, _ = Flow(
        load(str(p), override_schema={
            "title": "title",
            "missingValues": ["N/A"],
        }),
    ).results()
    assert results[0] == [
        {"name": "Ringo", "# drum kits": 2},
        {"name": "Pete", "# drum kits": None},
    ]


def test_load_limit_rows(tmp_path):
    """Port of reference test_lib.py:1718: limit_rows truncates the
    loaded resource to the first N rows."""
    p = tmp_path / "beatles.csv"
    p.write_text("name,instrument\njohn,guitar\npaul,bass\n"
                 "george,guitar\nringo,drums\n")
    results, _, _ = Flow(load(str(p), limit_rows=3)).results()
    assert results[0] == [
        {"name": "john", "instrument": "guitar"},
        {"name": "paul", "instrument": "bass"},
        {"name": "george", "instrument": "guitar"},
    ]


def test_load_from_package_zip(tmp_path):
    """Port of reference test_lib.py:815: load a zipped datapackage with
    an EXPLICIT format='datapackage' (extension says zip)."""
    from dataflows_ray import dump_to_zip, iterable_loader

    zpath = str(tmp_path / "pkg.zip")
    Flow(
        iterable_loader([{"foo": "bar", "moo": 12}], name="data"),
        dump_to_zip(zpath, format="parquet"),
    ).process()
    results, _, _ = Flow(load(zpath, format="datapackage")).results()
    assert results[0] == [{"foo": "bar", "moo": 12}]


def test_load_from_checkpoint_alone(tmp_path):
    """Port of reference test_lib.py:993: a Flow whose ONLY step is an
    existing checkpoint loads the saved package."""
    from dataflows_ray import checkpoint, iterable_loader

    cp = str(tmp_path / "cps")
    Flow(
        iterable_loader([{"foo": "bar"}], name="t"),
        checkpoint("only_step", checkpoint_path=cp),
    ).process()
    results, _, _ = Flow(
        checkpoint("only_step", checkpoint_path=cp),
    ).results()
    assert results[0] == [{"foo": "bar"}]


class _GenExc(Exception):
    pass


def test_exception_in_generator_source():
    """Port of reference test_edge_cases.py:8-18: an exception raised
    inside a generator source surfaces as StepError with .cause set to
    the original exception."""
    from dataflows_ray import printer

    def gen():
        for i in range(5):
            raise _GenExc()
            yield {"i": i}

    with pytest.raises(StepError) as excinfo:
        Flow(gen(), printer()).process()
    assert isinstance(excinfo.value.cause, _GenExc)


def test_exception_information_bad_load_path():
    """Port of reference test_edge_cases.py:21-32: a failing load carries
    the cause, the step name and the chain position (ours is 0-based;
    the reference's processor_position is 1-based)."""
    with pytest.raises(StepError) as excinfo:
        Flow(load("/nonexistent/bad-path1.csv")).results()
    e = excinfo.value
    assert isinstance(e.cause, FileNotFoundError)
    assert e.step_name.startswith("load")
    assert e.position == 0


def test_exception_information_second_load_errored():
    """Port of reference test_edge_cases.py:50-61: when the SECOND load
    fails, attribution points at it, not the first."""
    import pyarrow.parquet as _pq

    with pytest.raises(StepError) as excinfo:
        Flow(
            load("/root/testdata/sf0.001/region.parquet"),
            load("/nonexistent/bad-path2.csv"),
        ).results()
    e = excinfo.value
    assert isinstance(e.cause, FileNotFoundError)
    assert "bad-path2" in e.step_name or e.position == 1
