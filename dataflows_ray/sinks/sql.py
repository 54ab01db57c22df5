"""dump_to_sql: write resources to a SQL database.

Parity target: reference ``dataflows/dumpers/to_sql.py:46-155`` — modes
``rewrite`` (drop + recreate), ``append``, ``update`` (upsert on
primaryKey / ``update_keys``), ``env://VAR`` engine resolution
(to_sql.py:56-62), per-dialect object/array fixers (OBJECT_FIXERS,
to_sql.py:28-44), ``indexes_fields``.

The reference reaches warehouses through SQLAlchemy; this environment
has no DB server and no SQLAlchemy, so the engine targets the DBAPI
level directly: ``engine`` may be a ``sqlite:///path`` URL (stdlib
default), an ``env://VAR`` indirection, or — the pluggable path — a
zero-arg CONNECTION FACTORY returning any DBAPI-2.0 connection
(psycopg2/mysqlclient/...), with the matching ``dialect`` name picking
the upsert statement, the parameter style, and the object/array fixers
from a small strategy table. New dialects are one `_Dialect` row.

Scale note: DBAPI writes are inherently a single ordered stream per
table, so the sink streams ``iter_batches`` on the driver (bounded
memory); the upstream pipeline still executes distributed. A warehouse
bulk-load (COPY, multi-connection partition writes) belongs in a
dedicated sink, not behind this API.
"""

from __future__ import annotations

import json
import os
import sqlite3
from typing import Any, Callable, Dict, List, Optional

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


def _jsonize(v: Any) -> Any:
    """Reference OBJECT_FIXERS 'jsonize': arrays/objects -> JSON text."""
    return json.dumps(v) if isinstance(v, (list, dict)) else v


def _strize(v: Any) -> Any:
    """Reference OBJECT_FIXERS 'strize': arrays/objects -> str()."""
    return str(v) if isinstance(v, (list, dict)) else v


class _Dialect:
    """One row of the dialect strategy table: how to parameterize,
    upsert, and fix object/array values for a DBAPI family."""

    def __init__(self, name: str, paramstyle: str = "qmark",
                 object_fixer: Optional[Callable[[Any], Any]] = _jsonize,
                 upsert: str = "delete_insert"):
        self.name = name
        self.paramstyle = paramstyle  # qmark '?' | format '%s'
        self.object_fixer = object_fixer
        self.upsert = upsert  # or_replace | on_conflict | delete_insert

    def placeholder(self, i: int) -> str:
        return "?" if self.paramstyle == "qmark" else "%s"

    def insert_sql(self, table: str, cols: List[str],
                   mode: str, pk: List[str]) -> str:
        collist = ", ".join(f'"{c}"' for c in cols)
        values = ", ".join(self.placeholder(i) for i in range(len(cols)))
        if mode != "update" or not pk:
            return f'INSERT INTO "{table}" ({collist}) VALUES ({values})'
        if self.upsert == "or_replace":
            return (f'INSERT OR REPLACE INTO "{table}" ({collist}) '
                    f'VALUES ({values})')
        if self.upsert == "on_conflict":
            conflict = ", ".join(f'"{c}"' for c in pk)
            sets = ", ".join(f'"{c}" = EXCLUDED."{c}"'
                             for c in cols if c not in pk)
            if not sets:  # pure-key table: nothing to update
                return (f'INSERT INTO "{table}" ({collist}) VALUES '
                        f'({values}) ON CONFLICT ({conflict}) DO NOTHING')
            return (f'INSERT INTO "{table}" ({collist}) VALUES ({values}) '
                    f'ON CONFLICT ({conflict}) DO UPDATE SET {sets}')
        # delete_insert: handled by the writer (pre-delete per batch)
        return f'INSERT INTO "{table}" ({collist}) VALUES ({values})'

    def pre_delete_sql(self, table: str, pk: List[str]) -> Optional[str]:
        """For the generic upsert: DELETE matching keys before INSERT."""
        if self.upsert != "delete_insert" or not pk:
            return None
        cond = " AND ".join(f'"{c}" = {self.placeholder(i)}'
                            for i, c in enumerate(pk))
        return f'DELETE FROM "{table}" WHERE {cond}'


# reference OBJECT_FIXERS (to_sql.py:28-32): sqlite [strize, jsonize]
# collapses to jsonize (it already stringifies); postgresql [strize]
DIALECTS: Dict[str, _Dialect] = {
    "sqlite": _Dialect("sqlite", "qmark", _jsonize, "or_replace"),
    "postgresql": _Dialect("postgresql", "format", _strize, "on_conflict"),
    "mysql": _Dialect("mysql", "format", _jsonize, "delete_insert"),
    "generic": _Dialect("generic", "qmark", _jsonize, "delete_insert"),
}


class dump_to_sql(Step):
    def __init__(self, tables: Dict[str, Dict[str, Any]],
                 engine: Any = "sqlite:///dataflows.db",
                 mode: str = "rewrite", batch_size: int = DEFAULT_BATCH_SIZE,
                 dialect: Optional[str] = None):
        """``tables``: {table_name: {"resource-name": name, "mode": ...,
        "update_keys": [...], "indexes_fields": [[...], ...]}}.

        ``engine``: a ``sqlite:///path`` URL, an ``env://VAR`` holding
        one (reference parity), or a zero-arg callable returning a
        DBAPI-2.0 connection. With a callable, pass ``dialect`` to pick
        the strategy row ("sqlite" / "postgresql" / "mysql"); unknown or
        omitted names use "generic" (qmark params, delete+insert
        upsert)."""
        self.tables = tables
        if isinstance(engine, str) and engine.startswith("env://"):
            var = engine[len("env://"):]
            engine = os.environ.get(var)
            if engine is None:
                raise ValueError(
                    "Couldn't connect to DB - Please set your '%s' "
                    "environment variable" % var)
        if callable(engine):
            self.connection_factory = engine
            self.dialect = DIALECTS.get(dialect or "generic",
                                        DIALECTS["generic"])
            label = f"factory:{self.dialect.name}"
        elif isinstance(engine, str) and engine.startswith("sqlite:///"):
            db_path = engine[len("sqlite:///"):]
            self.connection_factory = lambda: sqlite3.connect(db_path)
            self.dialect = DIALECTS[dialect or "sqlite"]
            label = db_path
        else:
            raise ValueError(
                f"engine must be a sqlite:/// URL, env://VAR, or a DBAPI "
                f"connection factory; got {engine!r}")
        self.mode = mode
        self.batch_size = batch_size
        self.name = f"dump_to_sql({label})"

    def __flow_step__(self, s: PackageStream) -> PackageStream:
        con = self.connection_factory()
        d = self.dialect
        try:
            for table_name, spec in self.tables.items():
                rname = spec.get("resource-name", table_name)
                mode = spec.get("mode", self.mode)
                ds = s.get(rname)
                pk = (spec.get("update_keys")
                      or s.descriptor(rname).primary_key or [])
                if mode == "rewrite":
                    con.execute(f'DROP TABLE IF EXISTS "{table_name}"')
                created = False
                cols: List[str] = []
                obj_cols: List[str] = []
                insert_sql = ""
                pre_delete = None
                # driver-side streaming write (DBAPI single stream);
                # table schema taken from the first Arrow batch
                for batch in ds.iter_batches(batch_size=self.batch_size,
                                             batch_format="pyarrow"):
                    if not created:
                        cols = list(batch.schema.names)
                        types = [_sql_type(f.type) for f in batch.schema]
                        obj_cols = [f.name for f in batch.schema
                                    if pa.types.is_list(f.type)
                                    or pa.types.is_large_list(f.type)
                                    or pa.types.is_struct(f.type)
                                    or pa.types.is_map(f.type)]
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
                        insert_sql = d.insert_sql(table_name, cols, mode, pk)
                        if mode == "update":
                            pre_delete = d.pre_delete_sql(table_name, pk)
                        created = True
                    fixer = d.object_fixer
                    rows = [tuple(fixer(r.get(c)) if c in obj_cols
                                  else r.get(c) for c in cols)
                            for r in batch.to_pylist()]
                    if pre_delete is not None and rows:
                        pk_idx = [cols.index(c) for c in pk]
                        con.executemany(
                            pre_delete,
                            [tuple(row[i] for i in pk_idx) for row in rows])
                    con.executemany(insert_sql, rows)
                con.commit()
        finally:
            con.close()
        return s
