"""Core Flow composition + stateless ops — conformance ports of the
reference's end-to-end flow assertions (tests/test_lib.py patterns)."""

import pyarrow as pa
import pytest

from dataflows_ray import (
    Flow, add_field, add_computed_field, filter_rows, find_replace,
    select_fields, delete_fields, rename_fields, iterable_loader, load,
    StepError,
)


def data3():
    return [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}, {"x": 3, "y": "c"}]


def test_iterable_loader_and_results():
    results, stream, stats = Flow(data3()).results()
    assert results == [data3()]


def test_list_rows_become_colN():
    results, _, _ = Flow(iterable_loader([[1, 2], [3, 4]], name="t")).results()
    assert results == [[{"col0": 1, "col1": 2}, {"col0": 3, "col1": 4}]]


def test_row_udf_mutate_in_place():
    def double(row):
        row["x"] = row["x"] * 2
    results, _, _ = Flow(data3(), double).results()
    assert [r["x"] for r in results[0]] == [2, 4, 6]


def test_row_udf_new_field():
    def add(row):
        row["z"] = row["x"] + 10
    results, _, _ = Flow(data3(), add).results()
    assert [r["z"] for r in results[0]] == [11, 12, 13]


def test_rows_udf():
    def evens(rows):
        for row in rows:
            if row["x"] % 2 == 0:
                yield row
    results, _, _ = Flow(data3(), evens).results()
    assert [r["x"] for r in results[0]] == [2]


def test_nested_flow_splice():
    inner = Flow(data3(), filter_rows(equals=[{"x": 1}, {"x": 3}]))
    results, _, _ = Flow(inner).results()
    assert [r["x"] for r in results[0]] == [1, 3]


def test_filter_rows_equals_or_semantics():
    results, _, _ = Flow(data3(), filter_rows(equals=[{"x": 1}], not_equals=[{"y": "c"}])).results()
    # OR across equals and not_equals (reference filter_rows.py:4-16)
    assert [r["x"] for r in results[0]] == [1, 2]


def test_filter_rows_callable():
    results, _, _ = Flow(data3(), filter_rows(lambda row: row["y"] != "b")).results()
    assert [r["y"] for r in results[0]] == ["a", "c"]


def test_add_field_constant_and_callable():
    results, _, _ = Flow(
        data3(),
        add_field("k", "integer", 5),
        add_field("m", "integer", lambda row: row["x"] + row["k"]),
    ).results()
    assert [(r["k"], r["m"]) for r in results[0]] == [(5, 6), (5, 7), (5, 8)]


def test_add_computed_field_ops():
    data = [{"a": 1, "b": 2}, {"a": 3, "b": None}]
    results, _, _ = Flow(
        data,
        add_computed_field([
            {"target": "s", "operation": "sum", "source": ["a", "b"]},
            {"target": "m", "operation": "multiply", "source": ["a", "b"]},
            {"target": "avg", "operation": "avg", "source": ["a", "b"]},
            {"target": "j", "operation": "join", "source": ["a", "b"], "with": "-"},
            {"target": "f", "operation": "format", "with": "a={a}"},
            {"target": "c", "operation": "constant", "with": "k"},
        ]),
    ).results()
    r0, r1 = results[0]
    assert r0["s"] == 3 and r1["s"] == 3        # nulls skipped
    assert r0["m"] == 2 and r1["m"] == 3
    assert r0["avg"] == 1.5 and r1["avg"] == 3
    assert r0["j"] == "1-2" and r1["j"] == "3"  # null dropped from join
    assert r0["f"] == "a=1" and r0["c"] == "k"


def test_add_computed_field_callable():
    results, _, _ = Flow(
        data3(), add_computed_field(target="d", operation=lambda row: row["x"] * 100),
    ).results()
    assert [r["d"] for r in results[0]] == [100, 200, 300]


def test_find_replace():
    data = [{"y": "2000-01-01"}, {"y": "2001-03-04"}]
    results, _, _ = Flow(
        data,
        find_replace([{"name": "y", "patterns": [
            {"find": "-", "replace": "/"},
        ]}]),
    ).results()
    assert [r["y"] for r in results[0]] == ["2000/01/01", "2001/03/04"]


def test_select_delete_rename():
    data = [{"aa": 1, "ab": 2, "b": 3}]
    results, _, _ = Flow(data, select_fields(["a.*"])).results()
    assert results == [[{"aa": 1, "ab": 2}]]
    results, _, _ = Flow(data, delete_fields(["a.*"])).results()
    assert results == [[{"b": 3}]]
    results, _, _ = Flow(data, rename_fields({"a(.*)": r"x\1"})).results()
    assert results == [[{"xa": 1, "xb": 2, "b": 3}]]


def test_select_fields_no_match_raises():
    with pytest.raises(StepError):
        Flow(data3(), select_fields(["nope"])).results()


def test_error_provenance():
    def boom(row):
        raise RuntimeError("bad row")
    with pytest.raises(StepError):
        Flow(data3(), boom).results()


def test_load_parquet_sf0001():
    results, stream, _ = Flow(
        load("/root/testdata/sf0.001/region.parquet"),
        select_fields(["r_name"]),
    ).results()
    assert len(results[0]) == 5
    assert set(results[0][0].keys()) == {"r_name"}


def test_package_generator_udf_cross_resource():
    """Port of reference test_examples.py test_example_8: a
    generator-style package UDF consumes one resource to build a lookup,
    removes it from the package, and filters another resource with it."""
    from dataflows_ray import Flow, iterable_loader

    emmy = [{"nominee": "a", "winner": True}, {"nominee": "b", "winner": False},
            {"nominee": "c", "winner": True}]
    oscars = [{"Name": "a", "Winner": True}, {"Name": "b", "Winner": True},
              {"Name": "c", "Winner": False}, {"Name": "d", "Winner": True}]

    def find_double_winners(package):
        package.pkg.remove_resource("emmies")
        yield package.pkg
        resources = iter(package)
        emmy_rows = next(resources)
        emmy_winners = {r["nominee"] for r in emmy_rows if r["winner"]}
        academy = next(resources)
        yield filter(lambda row: row["Winner"] and row["Name"] in emmy_winners,
                     academy)

    results, pkg, _ = Flow(
        iterable_loader(emmy, name="emmies"),
        iterable_loader(oscars, name="oscars"),
        find_double_winners,
    ).results()
    assert pkg.resource_names() == ["oscars"]
    assert results == [[{"Name": "a", "Winner": True}]]


def test_package_generator_udf_add_column():
    """Port of reference test_examples.py test_example_75: a package UDF
    extends the schema, then per-row code fills the new column."""
    from dataflows_ray import Flow, iterable_loader

    beatles = [{"name": "john", "instrument": "guitar"},
               {"name": "ringo", "instrument": "drums"}]

    def add_is_guitarist_column_to_schema(package):
        package.pkg.resources["beatles"].fields.append(
            {"name": "is_guitarist", "type": "boolean"})
        yield package.pkg
        yield from package

    def add_is_guitarist_column(row):
        row["is_guitarist"] = row["instrument"] == "guitar"
        return row

    results, pkg, _ = Flow(
        iterable_loader(beatles, name="beatles"),
        add_is_guitarist_column_to_schema,
        add_is_guitarist_column,
    ).results()
    assert results == [[
        {"name": "john", "instrument": "guitar", "is_guitarist": True},
        {"name": "ringo", "instrument": "drums", "is_guitarist": False},
    ]]
    fd = pkg.package.resources["beatles"].field_descriptor("is_guitarist")
    assert fd == {"name": "is_guitarist", "type": "boolean"}
