"""Distributed top-k and set operations (INTERSECT / EXCEPT).

Engine-defined (SURVEY §2.4 notes the reference has union only, and top-k
is only expressible there as full sort + head).

- ``top_k``: per-block vectorized partial top-k (each block contributes
  at most k rows), then one final top-k over the <= k * n_blocks
  survivors in a single task — no global sort, no all-to-all shuffle.
  THE way to take heads at 100 TB.
- ``set_intersect`` / ``set_except``: SQL distinct-set semantics. Both
  sides are tagged and unioned; one hash exchange on ALL columns
  co-locates equal rows; each partition reduces with a vectorized
  side-flag min/max groupby.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .agg import keyed_merge, _collect_nonempty_refs
from ..core.raycompat import cheap_columns

_SIDE = "__setop_side__"


def top_k(ds: ray.data.Dataset, cols: List[str], k: int,
          descending: Union[bool, List[bool]] = True) -> ray.data.Dataset:
    """Global top-k rows by ``cols`` without a global sort."""
    if isinstance(descending, bool):
        asc = [not descending] * len(cols)
    else:
        asc = [not d for d in descending]

    def partial(df: pd.DataFrame) -> pa.Table:
        out = df.sort_values(cols, ascending=asc, kind="stable").head(k)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    refs, rows, _b, first = _collect_nonempty_refs(parts)
    if not refs:
        return parts
    merged = ray.data.from_arrow_refs(refs).repartition(1)
    return merged.map_batches(partial, batch_format="pandas",
                              batch_size=None)


def grouped_top_k(ds: ray.data.Dataset, group_cols: List[str],
                  order_cols: List[str], k: int,
                  descending: Union[bool, List[bool]] = True,
                  rank_col: Optional[str] = None) -> ray.data.Dataset:
    """Top-k rows PER GROUP — SQL ``row_number() OVER (PARTITION BY
    group_cols ORDER BY order_cols) <= k``.

    Scale shape: each block first keeps at most k rows per group it sees
    (one vectorized sort + cumcount — no per-group Python), so the hash
    exchange on ``group_cols`` ships O(k x groups-per-block), not O(rows);
    each partition then finalizes with the same kernel and (optionally)
    emits a 1-based ``rank_col``. Determinism requires ``order_cols`` to
    totally order rows within a group (include a tie-break column, as SQL
    row_number users do)."""
    if isinstance(descending, bool):
        asc = [not descending] * len(order_cols)
    else:
        asc = [not d for d in descending]

    def head_per_group(df: pd.DataFrame, final: bool) -> pa.Table:
        if len(df):
            df = df.sort_values(
                list(group_cols) + list(order_cols),
                ascending=[True] * len(group_cols) + asc, kind="stable")
            pos = df.groupby(list(group_cols), sort=False).cumcount()
            df = df[pos < k]
            if final and rank_col is not None:
                df = df.assign(**{rank_col: (pos[pos < k] + 1).to_numpy()})
        elif final and rank_col is not None:
            df = df.assign(**{rank_col: np.array([], dtype=np.int64)})
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False) \
                       .replace_schema_metadata(None)

    parts = ds.map_batches(lambda df: head_per_group(df, final=False),
                           batch_format="pandas", batch_size=None)
    return keyed_merge(parts, list(group_cols),
                       lambda df: head_per_group(df, final=True))


def _set_op(left: ray.data.Dataset, right: ray.data.Dataset,
            op: str) -> ray.data.Dataset:
    cols = cheap_columns(left)
    if cheap_columns(right) != cols:
        raise ValueError(f"set op requires identical schemas: "
                         f"{cols} vs {cheap_columns(right)}")

    def tag(side: int):
        def fn(t: pa.Table, side=side) -> pa.Table:
            return t.append_column(
                _SIDE, pa.array(np.full(len(t), side, dtype=np.int8)))
        return fn

    union = left.map_batches(tag(0), batch_format="pyarrow",
                             batch_size=None).union(
        right.map_batches(tag(1), batch_format="pyarrow", batch_size=None))

    def merge(df: pd.DataFrame, cols=cols, op=op) -> pa.Table:
        if len(df) == 0:
            out = df.reindex(columns=cols)
        else:
            g = df.groupby(cols, sort=False, dropna=False)[_SIDE]
            flags = g.agg(["min", "max"]).reset_index()
            if op == "intersect":
                keep = (flags["min"] == 0) & (flags["max"] == 1)
            else:  # except
                keep = flags["max"] == 0
            out = flags[keep][cols].reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    return keyed_merge(union, cols, merge)


def set_intersect(left: ray.data.Dataset, right: ray.data.Dataset
                  ) -> ray.data.Dataset:
    """Distinct rows present in BOTH datasets (SQL INTERSECT)."""
    return _set_op(left, right, "intersect")


def set_except(left: ray.data.Dataset, right: ray.data.Dataset
               ) -> ray.data.Dataset:
    """Distinct rows of ``left`` absent from ``right`` (SQL EXCEPT)."""
    return _set_op(left, right, "except")


def pivot_table(ds: ray.data.Dataset, index: List[str], key_col: str,
                value_col: str, agg: str = "sum") -> ray.data.Dataset:
    """Long -> wide (inverse of ``unpivot``): one output row per distinct
    ``index`` tuple, one column per distinct ``key_col`` value, cells
    aggregated by ``agg``. Output columns are the SORTED distinct key
    values (discovered with a tiny distinct scan — group-count-sized).

    One hash exchange on ``index``; each partition pivots vectorized
    (``pandas.pivot_table``)."""
    import pandas as pd
    from .agg import grouped_aggregate

    distinct = grouped_aggregate(ds.select_columns([key_col]), [key_col], [])
    key_values = sorted(
        v for b in distinct.iter_batches(batch_format="pyarrow",
                                         batch_size=None)
        for v in b[key_col].to_pylist())
    out_cols = [str(v) for v in key_values]

    def merge(df: pd.DataFrame, index=list(index), key_col=key_col,
              value_col=value_col, agg=agg) -> pa.Table:
        if len(df) == 0:
            out = pd.DataFrame(columns=index + out_cols)
        else:
            piv = pd.pivot_table(df, index=index, columns=key_col,
                                 values=value_col, aggfunc=agg)
            piv.columns = [str(c) for c in piv.columns]
            piv = piv.reindex(columns=out_cols)
            out = piv.reset_index()
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    projected = ds.select_columns(list(index) + [key_col, value_col])
    arrow = projected.map_batches(lambda t: t, batch_format="pyarrow",
                                  batch_size=None)
    return keyed_merge(arrow, list(index), merge)


def detect_sequence(events: ray.data.Dataset, key_cols: List[str],
                    ts_col: str, first_type, second_type,
                    within, type_col: str = "event_type"
                    ) -> ray.data.Dataset:
    """CEP primitive: emit (first, second) event pairs where a
    ``second_type`` event follows a ``first_type`` event of the same key
    within ``within`` (timedelta). Built on the range-join exchange: one
    hash shuffle, per-key-group vectorized window matching — the standard
    "A followed by B within T" pattern (funnel steps, error-after-deploy,
    purchase-after-click)."""
    import pyarrow.compute as _pc
    from .rangejoin import range_join

    a = events.map_batches(
        lambda t, ft=first_type: t.filter(_pc.equal(t[type_col], ft)),
        batch_format="pyarrow", batch_size=None)
    b = events.map_batches(
        lambda t, st=second_type: t.filter(_pc.equal(t[type_col], st)),
        batch_format="pyarrow", batch_size=None)
    # second event in [first_ts, first_ts + within]
    joined = range_join(a, b, key_cols, key_cols, ts_col, ts_col,
                        before=0 if not hasattr(within, "total_seconds")
                        else type(within)(0), after=within)
    return joined
