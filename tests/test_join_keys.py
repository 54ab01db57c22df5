"""KeyCalc edge cases: format-string keys, {#} row-number keys, callable
sort keys, non-regex unpivot — conformance ports of reference
tests/test_lib.py:1858-1917 (row-number join) and related scenarios."""

import pytest

from dataflows_ray import (
    Flow, iterable_loader, join, sort_rows, unpivot, dump_to_zip,
)


def test_join_format_string_key():
    source = [{"a": "x", "b": 1, "v": 10}, {"a": "y", "b": 2, "v": 20}]
    target = [{"aa": "x", "bb": 1}, {"aa": "y", "bb": 2}, {"aa": "z", "bb": 3}]
    results, _, _ = Flow(
        iterable_loader(source, name="s"),
        iterable_loader(target, name="t"),
        join("s", "{a}:{b}", "t", "{aa}:{bb}",
             {"v": {"aggregate": "sum"}}, mode="half-outer"),
    ).results()
    rows = {r["aa"]: r["v"] for r in results[0]}
    assert rows == {"x": 10, "y": 20, "z": None}


def test_join_row_number_key():
    # reference join.py:24-25: '{#}' = 1-based row number
    source = [{"v": "a"}, {"v": "b"}, {"v": "c"}]
    target = [{"t": 10}, {"t": 20}, {"t": 30}]
    results, _, _ = Flow(
        iterable_loader(source, name="s", row_ids=True),
        iterable_loader(target, name="t", row_ids=True),
        join("s", "{#}", "t", "{#}", {"v": {"aggregate": "any"}}),
    ).results()
    rows = sorted(results[0], key=lambda r: r["t"])
    assert [(r["t"], r["v"]) for r in rows] == [(10, "a"), (20, "b"), (30, "c")]


def test_join_row_number_auto_row_ids():
    # {#} keys attach a global __row_id__ transparently (reference
    # join.py:19-22 semantics; no explicit row_ids=True needed)
    source = [{"v": "a"}, {"v": "b"}]
    target = [{"t": 10}, {"t": 20}]
    results, _, _ = Flow(
        iterable_loader(source, name="s"),  # no row_ids
        iterable_loader(target, name="t"),
        join("s", "{#}", "t", "{#}", {"v": {"aggregate": "any"}}),
    ).results()
    assert results[0] == [{"t": 10, "v": "a"}, {"t": 20, "v": "b"}]


def test_attach_row_ids_multiblock_order():
    """Regression: _attach_row_ids must collect blocks in STREAM order even
    when the streaming executor completes them out of order (it forces
    preserve_order around to_arrow_refs). Early blocks sleep longer so a
    completion-order collection would mis-number them."""
    import time
    import pyarrow as pa
    import ray.data
    from dataflows_ray.stages.join import _attach_row_ids
    from dataflows_ray.sources.load import ROW_ID

    def slow_early(batch: pa.Table) -> pa.Table:
        v = batch.column("id")[0].as_py()
        time.sleep(0.3 if v < 4 else 0.0)
        return batch

    ds = (ray.data.range(8).repartition(8)
          .map_batches(slow_early, batch_format="pyarrow", batch_size=None))
    out = _attach_row_ids(ds).to_pandas().sort_values("id")
    assert list(out["id"]) == list(out[ROW_ID]) == list(range(8))


def test_join_row_number_multiblock():
    """{#} keys stay correct when each resource spans multiple blocks."""
    n = 12
    source = [{"v": f"v{i}"} for i in range(n)]
    target = [{"t": i * 10} for i in range(n)]
    results, _, _ = Flow(
        iterable_loader(source, name="s"),
        iterable_loader(target, name="t"),
        join("s", "{#}", "t", "{#}", {"v": {"aggregate": "any"}}),
    ).results()
    rows = sorted(results[0], key=lambda r: r["t"])
    assert [(r["t"], r["v"]) for r in rows] == \
        [(i * 10, f"v{i}") for i in range(n)]


def test_sort_rows_callable_key():
    data = [{"x": 5}, {"x": -3}, {"x": 1}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        sort_rows(lambda row: abs(row["x"])),
    ).results()
    assert [r["x"] for r in results[0]] == [1, -3, 5]


def test_unpivot_non_regex():
    data = [{"name": "r", "jan": 1, "feb": 2}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        unpivot(
            [{"name": "jan", "keys": {"month": "january"}},
             {"name": "feb", "keys": {"month": "february"}}],
            [{"name": "month", "type": "string"}],
            {"name": "value", "type": "integer"},
            regex=False,
        ),
    ).results()
    assert results[0] == [
        {"month": "january", "name": "r", "value": 1},
        {"month": "february", "name": "r", "value": 2},
    ]


def test_dump_to_zip(tmp_path):
    import zipfile
    out = str(tmp_path / "o.zip")
    Flow(
        iterable_loader([{"x": 1}], name="t"),
        dump_to_zip(out),
    ).process()
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert any("datapackage.json" in n for n in names)
    assert any(n.startswith("t/") for n in names)


def test_join_preserves_source_field_order():
    """Port of reference test_join_preserve_source_fields_order: joined
    fields attach in SOURCE SCHEMA order (key2 before key1 when the
    source lists them that way), regardless of the fields-dict order."""
    from dataflows_ray import Flow, iterable_loader, join
    meta = [{"id": 1, "key2": "v2", "key1": "v1"},
            {"id": 2, "key2": "v2", "key1": "v1"}]
    cities = [{"id": 1, "city": "london"}, {"id": 2, "city": "paris"}]
    results, _pkg, _ = Flow(
        iterable_loader(meta, name="cities_metadata"),
        iterable_loader(cities, name="cities"),
        join("cities_metadata", "{id}", "cities", "{id}",
             fields={"key1": {"name": "key1"}, "key2": {"name": "key2"}}),
    ).results()
    assert [list(r.keys()) for r in results[0]][0] == \
        ["id", "city", "key2", "key1"]
    assert sorted(results[0], key=lambda r: r["id"])[0] == {
        "id": 1, "city": "london", "key2": "v2", "key1": "v1"}


def test_fullouter_join_different_key_names():
    """Port of reference test_edge_cases.py
    test_fullouter_join_dump_different_keys: full-outer with differently
    named keys on each side and a mixed-type column (engine number
    policy: float64 instead of Decimal, documented)."""
    from dataflows_ray import Flow, iterable_loader, join
    data1 = [{"col1": 1.531, "col2": "hello"},
             {"col1": 1.132, "col2": "goodbye"}]
    data2 = [{"colA": 1.531, "colB": "123"},
             {"colA": 1.132, "colB": "1.132"}]
    results, _, _ = Flow(
        iterable_loader(data1, name="res_1"),
        iterable_loader(data2, name="res_2"),
        join("res_1", ["col1"], "res_2", ["colA"],
             {"col2": {"name": "col2", "aggregate": "first"}},
             mode="full-outer"),
    ).results()
    rows = sorted(results[0], key=lambda r: r["colA"])
    assert rows == [
        {"colA": 1.132, "colB": "1.132", "col2": "goodbye"},
        {"colA": 1.531, "colB": "123", "col2": "hello"},
    ]
