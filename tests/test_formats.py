"""Load/dump format coverage: geojson (parser + dumper), xml, sqlite
source, xlsx gating.

Parity targets: reference ``processors/parsers/geojson_parser.py:15-29``
(features -> properties + ``__geometry`` JSON string),
``parsers/xml_parser.py`` (repeated child elements of the root),
``parsers/sql_parser.py`` (database table as a resource),
``dumpers/formats/format_geojson.py:5-41`` (FeatureCollection with
geometry from geopoint/geojson fields).
"""

import json
import os
import sqlite3

import pytest

from dataflows_ray import Flow, iterable_loader, load, set_type, dump_to_path


GEOJSON_DOC = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [34.0, 32.0]},
         "properties": {"name": "a", "pop": 10}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [35.0, 31.0]},
         "properties": {"name": "b", "pop": 20}},
    ],
}


def test_load_geojson(tmp_path):
    p = str(tmp_path / "places.geojson")
    with open(p, "w") as f:
        json.dump(GEOJSON_DOC, f)
    results, _, _ = Flow(load(p, name="places")).results()
    rows = sorted(results[0], key=lambda r: r["name"])
    assert rows[0]["name"] == "a" and rows[0]["pop"] == 10
    assert json.loads(rows[0]["__geometry"]) == {
        "type": "Point", "coordinates": [34.0, 32.0]}


def test_dump_geojson_roundtrip(tmp_path):
    data = [{"name": "a", "gp": "34.0,32.0"}, {"name": "b", "gp": "35.0,31.0"}]
    out = str(tmp_path / "out")
    Flow(
        iterable_loader(data, name="places"),
        set_type("gp", type="geopoint"),
        dump_to_path(out, format="geojson"),
    ).process()
    path = os.path.join(out, "places", "places.geojson")
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection"
    feats = sorted(doc["features"], key=lambda f: f["properties"]["name"])
    assert feats[0]["geometry"] == {"type": "Point", "coordinates": [34.0, 32.0]}
    assert feats[0]["properties"] == {"name": "a"}
    # round-trip back through the geojson loader
    results, _, _ = Flow(load(path, name="back")).results()
    back = sorted(results[0], key=lambda r: r["name"])
    assert back[0]["name"] == "a"
    assert json.loads(back[0]["__geometry"])["coordinates"] == [34.0, 32.0]


def test_load_xml(tmp_path):
    p = str(tmp_path / "rows.xml")
    with open(p, "w") as f:
        f.write("""<root>
  <row><name>x</name><n>1</n></row>
  <row><name>y</name><n>2</n></row>
</root>""")
    results, _, _ = Flow(load(p, name="t")).results()
    rows = sorted(results[0], key=lambda r: r["name"])
    assert rows == [{"name": "x", "n": "1"}, {"name": "y", "n": "2"}]


def test_load_sqlite(tmp_path):
    p = str(tmp_path / "data.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE people (name TEXT, age INTEGER)")
    con.executemany("INSERT INTO people VALUES (?, ?)",
                    [("ann", 30), ("bob", 25)])
    con.commit()
    con.close()
    results, _, _ = Flow(load(p, name="people")).results()
    rows = sorted(results[0], key=lambda r: r["name"])
    assert rows == [{"name": "ann", "age": 30}, {"name": "bob", "age": 25}]
    # explicit table name
    results2, _, _ = Flow(load(p, name="p2", table="people")).results()
    assert len(results2[0]) == 2


SS_ROWS = [{"name": "ann", "age": 30, "score": 1.5},
           {"name": "bob", "age": 25, "score": 2.25}]


def _ss_roundtrip(tmp_path, fmt):
    """dump_to_path(format=fmt) then load() the produced file; returns
    the loaded rows sorted by name."""
    out = str(tmp_path / f"out_{fmt}")
    Flow(iterable_loader(SS_ROWS, name="people"),
         dump_to_path(out, format=fmt)).process()
    path = os.path.join(out, "people", f"people.{fmt}")
    assert os.path.exists(path)
    results, _, _ = Flow(load(path, name="back")).results()
    return sorted(results[0], key=lambda r: r["name"])


@pytest.mark.parametrize("fmt", ["xlsx", "ods", "xls"])
def test_spreadsheet_dump_load_roundtrip(tmp_path, fmt):
    """Real from-scratch spreadsheet codecs (no openpyxl/xlrd in this
    container): dump -> load preserves values and types."""
    rows = _ss_roundtrip(tmp_path, fmt)
    assert rows == [{"name": "ann", "age": 30, "score": 1.5},
                    {"name": "bob", "age": 25, "score": 2.25}]


def test_xlsx_shared_strings_and_sparse_cells(tmp_path):
    """Reader handles sharedStrings parts and sparse cell references
    (gap columns -> None), which our writer never emits."""
    import zipfile
    from dataflows_ray.sources.spreadsheet import read_xlsx, _NS_MAIN
    p = str(tmp_path / "s.xlsx")
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{_NS_MAIN}">'
             '<sheetData>'
             '<row r="1"><c r="A1" t="s"><v>0</v></c>'
             '<c r="C1" t="s"><v>1</v></c></row>'
             '<row r="2"><c r="A2"><v>7</v></c>'
             '<c r="C2" t="b"><v>1</v></c></row>'
             "</sheetData></worksheet>")
    sst = (f'<?xml version="1.0"?><sst xmlns="{_NS_MAIN}" count="2" '
           'uniqueCount="2"><si><t>alpha</t></si><si><t>gamma</t></si></sst>')
    wb = (f'<?xml version="1.0"?><workbook xmlns="{_NS_MAIN}" xmlns:r='
          '"http://schemas.openxmlformats.org/officeDocument/2006/relation'
          'ships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
          "</workbook>")
    rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
            'xmlformats.org/package/2006/relationships"><Relationship Id='
            '"rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>')
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    assert read_xlsx(p) == [["alpha", None, "gamma"], [7, None, True]]


def test_load_excel_xml(tmp_path):
    """SpreadsheetML 2003 parser — parity with reference
    parsers/excel_xml_parser.py:5-79 (first row = headers)."""
    p = str(tmp_path / "book.xml")
    ns = "urn:schemas-microsoft-com:office:spreadsheet"
    with open(p, "w") as f:
        f.write(f"""<?xml version="1.0"?>
<Workbook xmlns="{ns}" xmlns:ss="{ns}">
 <Worksheet ss:Name="Sheet1"><Table>
  <Row><Cell><Data ss:Type="String">name</Data></Cell>
       <Cell><Data ss:Type="String">n</Data></Cell></Row>
  <Row><Cell><Data ss:Type="String">x</Data></Cell>
       <Cell><Data ss:Type="Number">1</Data></Cell></Row>
  <Row><Cell><Data ss:Type="String">y</Data></Cell>
       <Cell><Data ss:Type="Number">2.5</Data></Cell></Row>
 </Table></Worksheet>
</Workbook>""")
    results, _, _ = Flow(load(p, name="t", format="excel-xml")).results()
    rows = sorted(results[0], key=lambda r: r["name"])
    assert rows == [{"name": "x", "n": 1}, {"name": "y", "n": 2.5}]


def test_gsheet_url_translation_and_file_fetch(tmp_path):
    """gsheet loads translate share URLs to the public CSV export
    endpoint; the fetch path is exercised offline via file://."""
    from dataflows_ray.sources.spreadsheet import gsheet_export_url
    url = ("https://docs.google.com/spreadsheets/d/KEY123/edit#gid=77")
    assert gsheet_export_url(url) == \
        ("https://docs.google.com/spreadsheets/d/KEY123/export"
         "?format=csv&gid=77")
    assert gsheet_export_url(
        "https://docs.google.com/spreadsheets/d/KEY123/") == \
        "https://docs.google.com/spreadsheets/d/KEY123/export?format=csv"
    # offline fetch through the same code path
    csv_path = tmp_path / "sheet.csv"
    csv_path.write_text("name,n\nx,1\ny,2\n")
    results, _, _ = Flow(
        load(f"file://{csv_path}", name="t", format="gsheet")).results()
    rows = sorted(results[0], key=lambda r: r["name"])
    assert rows == [{"name": "x", "n": 1}, {"name": "y", "n": 2}]


def test_load_datapackage_roundtrip(tmp_path):
    data = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    out = str(tmp_path / "pkg")
    Flow(iterable_loader(data, name="t"),
         dump_to_path(out, format="parquet")).process()
    results, _, _ = Flow(
        load(os.path.join(out, "datapackage.json"), name="t"),
    ).results()
    rows = sorted(results[0], key=lambda r: r["a"])
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "y")]


def test_csv_strip_whitespace(tmp_path):
    p = str(tmp_path / "ws.csv")
    with open(p, "w") as f:
        f.write('name,age\n"  ann  ",30\n"bob ",25\n')
    results, _, _ = Flow(load(p, name="t")).results()
    rows = sorted(results[0], key=lambda r: r["age"])
    # reference load strip=True trims whitespace on string cells
    assert rows[0]["name"] == "bob" and rows[1]["name"] == "ann"
    # strip=False keeps them
    results2, _, _ = Flow(load(p, name="t", strip=False)).results()
    assert sorted(r["name"] for r in results2[0]) == ["  ann  ", "bob "]


def test_load_datapackage_zip(tmp_path):
    from dataflows_ray import dump_to_zip
    data = [{"a": 1}, {"a": 2}]
    zpath = str(tmp_path / "pkg.zip")
    Flow(iterable_loader(data, name="t"),
         dump_to_zip(zpath, format="parquet")).process()
    results, _, _ = Flow(load(zpath, name="t")).results()
    assert sorted(r["a"] for r in results[0]) == [1, 2]


def test_load_strategies_matrix(tmp_path):
    """Port of reference test_lib.py test_load_strategies: the
    infer/cast strategy matrix over a native-typed source (json) and a
    text source (csv). Typed csv output requires INFER_FULL +
    CAST_WITH_SCHEMA; strings-anything forces strings."""
    import json as _json
    from dataflows_ray import Flow, load

    rows_t = [{"age": 18, "name": "john"}, {"age": 16, "name": "paul"}]
    rows_s = [{"age": "18", "name": "john"}, {"age": "16", "name": "paul"}]
    jpath = str(tmp_path / "beatles.json")
    cpath = str(tmp_path / "beatles.csv")
    with open(jpath, "w") as f:
        _json.dump(rows_t, f)
    with open(cpath, "w") as f:
        f.write("age,name\n18,john\n16,paul\n")

    def run(path, i_s, c_s):
        results, _, _ = Flow(
            load(path, infer_strategy=i_s, cast_strategy=c_s,
                 on_error=load.ERRORS_DROP)).results()
        return sorted(results[0], key=lambda r: r["name"])

    exp = {
        ("full", "nothing"): (rows_t, rows_s),
        ("full", "schema"): (rows_t, rows_t),
        ("full", "strings"): (rows_s, rows_s),
        ("pytypes", "nothing"): (rows_t, rows_s),
        ("pytypes", "schema"): (rows_t, rows_s),
        ("pytypes", "strings"): (rows_s, rows_s),
        ("strings", "nothing"): (rows_s, rows_s),
        ("strings", "schema"): (rows_s, rows_s),
        ("strings", "strings"): (rows_s, rows_s),
    }
    for (i_s, c_s), (want_json, want_csv) in exp.items():
        assert run(jpath, i_s, c_s) == want_json, ("json", i_s, c_s)
        assert run(cpath, i_s, c_s) == want_csv, ("csv", i_s, c_s)


def test_load_strategy_infer_strings_from_native_types(tmp_path):
    """Port of reference test: INFER_STRINGS over a native-typed json
    source stringifies the values."""
    import json as _json
    from dataflows_ray import Flow, load
    p = str(tmp_path / "b.json")
    with open(p, "w") as f:
        _json.dump([{"age": 18, "name": "john"}], f)
    results, _, _ = Flow(load(p, infer_strategy="strings")).results()
    assert results[0] == [{"age": "18", "name": "john"}]


def test_load_from_package_resources_inline():
    """Port of reference test_load_from_package_resources: the inline
    (datapackage dict, row-iterators) source form with a resource
    selector."""
    from dataflows_ray import Flow, load

    datapackage = {"resources": [
        {"name": f"my-resource-{i}", "path": f"my-resource-{i}.csv",
         "schema": {"fields": [{"name": "foo", "type": "string"}]}}
        for i in range(2)]}
    resources = ((row for row in [{"foo": f"bar{i}"}, {"foo": f"baz{i}"}])
                 for i in range(2))
    data, pkg, _ = Flow(
        load((datapackage, resources), resources=["my-resource-1"]),
    ).results()
    assert pkg.resource_names() == ["my-resource-1"]
    assert pkg.package.resources["my-resource-1"].metadata["path"] == \
        "my-resource-1.csv"
    assert data[0][1] == {"foo": "baz1"}


def test_load_from_package_resource_matching(tmp_path):
    """Port of reference test_load_from_package_resource_matching: a
    resources=[...] selector on a dumped datapackage loads only the
    matched resource(s)."""
    from dataflows_ray import Flow, load
    out = str(tmp_path / "pkg")
    Flow(
        iterable_loader([{"foo": "bar"}], name="res_1"),
        iterable_loader([{"foo": "baz"}], name="res_2"),
        dump_to_path(out, format="parquet"),
    ).process()
    results, pkg, _ = Flow(
        load(os.path.join(out, "datapackage.json"), resources=["res_2"]),
    ).results()
    assert pkg.resource_names() == ["res_2"]
    assert results == [[{"foo": "baz"}]]
