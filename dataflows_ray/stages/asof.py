"""As-of (temporal) join — an operator Ray Data lacks natively.

For every left row, attach the single right row with the same key whose
timestamp is the closest at-or-before (``direction='backward'``, the
default) or at-or-after (``'forward'``) the left timestamp. This is the
point-in-time join used for "latest state as of event time" enrichment
(market data, CDC snapshots, latest-transcript-for-clip).

Ray-Data mapping: both sides are tagged, null-padded to a common schema
and unioned, so ONE hash shuffle co-locates each key's left and right
rows; each partition then runs a single vectorized ``pd.merge_asof``
(sorted-merge with ``by=`` keys — no per-key Python). Partitioning
assumption: one key's rows fit in one partition (same as every keyed
operator here); the small-input path coalesces instead of shuffling.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .agg import keyed_merge

_SIDE = "__asof_side__"


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              left_by: List[str], right_by: List[str],
              left_ts: str, right_ts: str,
              direction: str = "backward",
              right_suffix: str = "_r") -> ray.data.Dataset:
    """Left as-of join on ``left_by[i] == right_by[i]``. Right key columns
    surface under the LEFT key names; other right columns clashing with
    left names get ``right_suffix``. Ties on the right timestamp resolve
    to the row that sorts LAST by the remaining right columns
    (deterministic)."""
    assert direction in ("backward", "forward")
    assert len(left_by) == len(right_by)
    lschema = left.schema()
    rschema = right.schema()
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    key_cols = list(left_by)
    r2l = dict(zip(right_by, left_by))

    # non-key right columns renamed on clash with left names
    ren = {c: (c + right_suffix if c in lnames else c)
           for c in rnames if c not in r2l}
    out_rcols = [ren[c] for c in rnames if c not in r2l]
    all_cols = lnames + [c for c in out_rcols if c not in lnames]

    def pad_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in lnames}
        for c in rnames:
            if c in r2l:
                continue
            cols[ren[c]] = pa.nulls(len(t), type=rtypes[c])
        cols[_SIDE] = pa.array(np.zeros(len(t), dtype=np.int8))
        return pa.table(cols).select(all_cols + [_SIDE])

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in lnames:
            if c in key_cols:
                # key columns surface under the left names
                rk = right_by[key_cols.index(c)]
                cols[c] = pa.compute.cast(t[rk], ltypes[c])
            else:
                cols[c] = pa.nulls(len(t), type=ltypes[c])
        for c in rnames:
            if c in r2l:
                continue
            cols[ren[c]] = t[c]
        cols[_SIDE] = pa.array(np.ones(len(t), dtype=np.int8))
        return pa.table(cols).select(all_cols + [_SIDE])

    lt = left.map_batches(pad_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(pad_right, batch_format="pyarrow",
                           batch_size=None)
    union = lt.union(rt)

    r_ts_out = ren.get(right_ts, right_ts)
    # null-padding pushes int columns through pandas float64; restore the
    # source types on the way out
    out_types = dict(ltypes)
    for c in rnames:
        if c not in r2l:
            out_types[ren[c]] = rtypes[c]

    def merge(df: pd.DataFrame) -> pa.Table:
        l = df[df[_SIDE] == 0].drop(columns=[_SIDE])
        r = df[df[_SIDE] == 1].drop(columns=[_SIDE])
        l = l.drop(columns=[c for c in out_rcols if c in l.columns])
        rr = r[key_cols + out_rcols]
        # deterministic tie resolution: merge_asof keeps the LAST row among
        # equal timestamps; sort the remaining columns so "last" is defined
        sort_cols = [r_ts_out] + [c for c in out_rcols if c != r_ts_out]
        rr = rr.sort_values(sort_cols, kind="stable")
        l = l.sort_values(left_ts, kind="stable")
        if len(l) == 0:
            out = l.reindex(columns=all_cols)
        elif len(rr) == 0:
            out = l.reindex(columns=all_cols)
        else:
            out = pd.merge_asof(l, rr, left_on=left_ts, right_on=r_ts_out,
                                by=key_cols, direction=direction)
            out = out.reindex(columns=all_cols)
        arrays = []
        for c in all_cols:
            typ = out_types.get(c)
            try:
                arrays.append(pa.array(out[c], type=typ, from_pandas=True))
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                arrays.append(pa.array(out[c], from_pandas=True))
        return pa.Table.from_arrays(arrays, names=list(all_cols))

    return keyed_merge(union, key_cols, merge)
