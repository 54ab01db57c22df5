"""CLI scaffold (`python -m dataflows_ray init`) — reference cli.py
parity: format sniffing, scaffold rendering, file emission. Generated
sources are compile()d; the hello-world end-to-end run is covered by
the module's own __main__ path (exercised manually / via driver), not
here — no subprocess Ray sessions in unit tests."""

import os

from dataflows_ray.cli import (cmd_init, extract_format, render, slugify,
                               HELLO_WORLD, PROCESSING, OUTPUTS)


def test_slugify_and_format_sniff():
    assert slugify("My Data-Flow!") == "my_data_flow"
    assert slugify("---") == "flow"
    assert extract_format("http://x/y/data.csv") == "csv"
    assert extract_format("a/b.XLSX") == "xlsx"
    assert extract_format("nope.bin") is None
    assert extract_format("noext") is None


def test_render_all_processing_and_outputs_compile():
    for out in OUTPUTS.values():
        src = render({
            "slug": "t_flow", "title": "T", "input": "file",
            "input_url": "d.csv", "format": "csv",
            "processing": list(PROCESSING.values()),
            "output": out,
            "output_url": "sqlite:///x.db", "output_db_table": "t",
        })
        compile(src, "<scaffold>", "exec")   # syntax-valid as written
        assert "load('d.csv', format='csv')" in src
        if out == "sql":
            assert "dump_to_sql" in src
    # sql source + sheet-carrying spreadsheet
    src = render({"slug": "s", "title": "S", "input": "sql",
                  "input_url": "sqlite:///in.db", "input_db_table": "tab",
                  "processing": [], "output": "print"})
    compile(src, "<scaffold>", "exec")
    assert "table='tab'" in src


def test_cmd_init_writes_files(tmp_path):
    p = cmd_init("hello-world", run=False, out_dir=str(tmp_path))
    assert os.path.basename(p) == "hello_world.py"
    assert open(p).read() == HELLO_WORLD
    compile(HELLO_WORLD, "<hello>", "exec")
    p2 = cmd_init("/data/some file.csv", run=False, out_dir=str(tmp_path))
    src = open(p2).read()
    compile(src, "<scaffold>", "exec")
    assert "format='csv'" in src and "printer()" in src
    p3 = cmd_init("https://example.org/table.xlsx", run=False,
                  out_dir=str(tmp_path))
    assert "table_xlsx" in os.path.basename(p3)
