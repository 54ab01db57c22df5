"""dump_to_sql: write resources to a SQL database.

Parity target: reference ``dataflows/dumpers/to_sql.py:46-155`` — modes
``rewrite`` (drop + recreate), ``append``, ``update`` (upsert on
primaryKey). The reference uses SQLAlchemy; this environment has no DB
server, so the implementation targets DBAPI connections (sqlite3 by
default — stdlib, file-backed) with per-actor connections. For a real
warehouse the same batch loop runs against any DBAPI driver.

Scale note: each Ray task opens its own connection and writes its
batches; sqlite serializes writers, so for the sqlite backend we write
from the driver via ``iter_batches`` (streaming, bounded memory).
"""

from __future__ import annotations

import sqlite3
from typing import Any, Dict, List, Optional

import pyarrow as pa

from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream, select_resources


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    return "TEXT"


class dump_to_sql(Step):
    def __init__(self, tables: Dict[str, Dict[str, Any]],
                 engine: str = "sqlite:///dataflows.db",
                 mode: str = "rewrite", batch_size: int = DEFAULT_BATCH_SIZE):
        """``tables``: {table_name: {"resource-name": name, "mode": ...}}."""
        self.tables = tables
        assert engine.startswith("sqlite:///"), \
            "only sqlite is available in this environment"
        self.db_path = engine[len("sqlite:///"):]
        self.mode = mode
        self.batch_size = batch_size
        self.name = f"dump_to_sql({self.db_path})"

    def __flow_step__(self, s: PackageStream) -> PackageStream:
        con = sqlite3.connect(self.db_path)
        try:
            for table_name, spec in self.tables.items():
                rname = spec.get("resource-name", table_name)
                mode = spec.get("mode", self.mode)
                ds = s.get(rname)
                pk = s.descriptor(rname).primary_key
                if mode == "rewrite":
                    con.execute(f'DROP TABLE IF EXISTS "{table_name}"')
                created = False
                sql = None
                # driver-side streaming write (sqlite single-writer);
                # table schema taken from the first Arrow batch
                for batch in ds.iter_batches(batch_size=self.batch_size,
                                             batch_format="pyarrow"):
                    if not created:
                        cols = list(batch.schema.names)
                        types = [_sql_type(f.type) for f in batch.schema]
                        col_defs = ", ".join(
                            f'"{c}" {t}' for c, t in zip(cols, types))
                        if pk:
                            col_defs += ", PRIMARY KEY (" + ", ".join(
                                f'"{c}"' for c in pk) + ")"
                        con.execute(f'CREATE TABLE IF NOT EXISTS '
                                    f'"{table_name}" ({col_defs})')
                        # reference dump_to_sql indexes_fields: one index
                        # per listed field tuple
                        for i, idx_cols in enumerate(
                                spec.get("indexes_fields") or []):
                            cols_sql = ", ".join(f'"{c}"' for c in idx_cols)
                            con.execute(
                                f'CREATE INDEX IF NOT EXISTS '
                                f'"{table_name}_idx_{i}" ON '
                                f'"{table_name}" ({cols_sql})')
                        placeholders = ", ".join("?" for _ in cols)
                        verb = ("INSERT OR REPLACE" if mode == "update"
                                else "INSERT")
                        sql = (f'{verb} INTO "{table_name}" '
                               f'({", ".join(chr(34)+c+chr(34) for c in cols)}) '
                               f'VALUES ({placeholders})')
                        created = True
                    rows = [tuple(r.get(c) for c in cols)
                            for r in batch.to_pylist()]
                    con.executemany(sql, rows)
                con.commit()
        finally:
            con.close()
        return s
