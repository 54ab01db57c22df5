"""Lance table support, gated behind an import-try.

The north-star deployment reads the clip+transcript stream from Lance
tables (``ray.data.read_lance``) and consumes Lance *fragments* as
micro-batch epochs. The ``lance`` package is not available in this
container, so every entry point degrades to the parquet stand-in
(identical schema, row groups as epochs) — the engine code paths,
partitioning, and epoch semantics are the same either way.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def _is_lance_path(path: str) -> bool:
    return path.rstrip("/").endswith(".lance") or \
        os.path.isdir(os.path.join(path, "_versions"))


def read_table_auto(path: str, columns: Optional[List[str]] = None):
    """``ray.data.read_lance`` for Lance datasets when the library is
    present; ``ray.data.read_parquet`` otherwise."""
    import ray.data
    if _is_lance_path(path):
        if not lance_available():
            raise ImportError(
                "path looks like a Lance dataset but the 'lance' package "
                "is not installed in this environment")
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def plan_stream_units(input_path: str) -> List[Dict]:
    """The flat, ordered list of stream units for a table path.

    - Lance dataset: one unit per FRAGMENT (``{"path", "fragment"}``) —
      fragments are Lance's append unit, so unit order is ingest order.
    - Parquet file/dir: one unit per row group (``{"path", "row_group"}``)
      in (file, row group) order.

    Appends extend the list; existing units keep their positions — the
    property the engines' committed-unit accounting relies on.
    """
    if _is_lance_path(input_path):
        if not lance_available():
            raise ImportError("Lance dataset requires the 'lance' package")
        import lance
        ds = lance.dataset(input_path)
        return [{"path": input_path, "fragment": f.fragment_id}
                for f in ds.get_fragments()]
    paths = []
    if os.path.isdir(input_path):
        for root, _d, files in os.walk(input_path):
            paths.extend(os.path.join(root, f)
                         for f in sorted(files) if f.endswith(".parquet"))
        paths.sort()
    else:
        paths = [input_path]
    units: List[Dict] = []
    for p in paths:
        meta = pq.read_metadata(p)
        units.extend({"path": p, "row_group": rg}
                     for rg in range(meta.num_row_groups))
    return units


def plan_stream_epochs(input_path: str, units_per_epoch: int
                       ) -> List[List[Dict]]:
    """Plan micro-batch epochs over a table path (positional chunking
    of :func:`plan_stream_units`)."""
    units = plan_stream_units(input_path)
    return [units[i:i + units_per_epoch]
            for i in range(0, len(units), units_per_epoch)]


def read_stream_unit(task: Dict, columns: Optional[List[str]] = None
                     ) -> pa.Table:
    """Read one epoch unit (a Lance fragment or a parquet row group)."""
    if "fragment" in task:
        import lance
        ds = lance.dataset(task["path"])
        frag = ds.get_fragment(task["fragment"])
        return frag.to_table(columns=columns)
    pf = pq.ParquetFile(task["path"])
    return pf.read_row_group(task["row_group"], columns=columns)
