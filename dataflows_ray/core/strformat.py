"""Vectorized ``str.format`` / string-join over Arrow batches.

The reference expresses many keys as Python format strings over row
dicts (``join.py:13-26`` KeyCalc, ``sort_rows.py:49-60``,
``add_computed_field.py:20-23``). A per-row ``spec.format(**row)`` loop
is the natural port but is the classic hot-path row loop; this module
compiles the COMMON shape — plain ``{name}`` placeholders over integer
or string columns — into one ``pc.binary_join_element_wise`` call
(literal fragments broadcast as scalars). Anything the compiler can't
prove equivalent (format specs ``{x:>5}``, conversions ``{x!r}``,
attribute/index access, float/bool/temporal columns whose Python
``str()`` differs from Arrow's cast) returns ``None`` and the caller
keeps its exact row-loop fallback — vectorization never changes
results, it only accelerates the provable subset.
"""

from __future__ import annotations

from string import Formatter
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc


def _as_str_array(col) -> Optional[pa.Array]:
    """Column -> string array equal to per-row ``str(v)`` (nulls ->
    "None", as ``str(None)``), or None when that equality can't be
    guaranteed (floats/bools/temporals format differently)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        s = col
    elif pa.types.is_integer(t):
        s = pc.cast(col, pa.string())
    else:
        return None
    return pc.fill_null(s, "None")


def try_vector_format(batch: pa.Table, spec: str,
                      extra: Optional[Dict[str, pa.Array]] = None
                      ) -> Optional[pa.Array]:
    """``[spec.format(**row) for row in batch]`` as one Arrow kernel, or
    None when the spec needs the row-loop fallback. ``extra`` supplies
    virtual fields (e.g. ``{"#": row_number}``) as Arrow arrays."""
    n = len(batch)
    try:
        parsed = list(Formatter().parse(spec))
    except ValueError:
        return None
    pieces: List = []
    any_array = False
    for literal, field, fmt, conv in parsed:
        if literal:
            pieces.append(literal)
        if field is None:
            continue
        if fmt or conv:
            return None  # format spec / conversion: not vectorizable
        if "." in field or "[" in field:
            return None  # attribute / index access
        if extra is not None and field in extra:
            col = extra[field]
        elif field in batch.column_names:
            col = batch[field]
        else:
            return None
        s = _as_str_array(col)
        if s is None:
            return None
        pieces.append(s)
        any_array = True
    if not any_array:  # pure literal (or empty) spec — parse() already
        # unescaped {{ }} into the literal fragments
        return pa.array(["".join(pieces)] * n, pa.string())
    if len(pieces) == 1:
        return pieces[0]
    return pc.binary_join_element_wise(*pieces, "")


def try_vector_join(batch: pa.Table, sources: List[str],
                    sep: str) -> Optional[pa.Array]:
    """``[sep.join(str(v) for v in row_vals if v is not None) for row]``
    as one Arrow kernel (null_handling="skip" matches the skip-nulls
    contract), or None when a source column isn't int/string."""
    n = len(batch)
    if not sources:
        return pa.array([""] * n, pa.string())
    arrays: List[pa.Array] = []
    for name in sources:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            arrays.append(col)
        elif pa.types.is_integer(t):
            arrays.append(pc.cast(col, pa.string()))
        else:
            return None
    if len(arrays) == 1:
        return pc.fill_null(arrays[0], "")
    return pc.binary_join_element_wise(*arrays, sep,
                                       null_handling="skip")
