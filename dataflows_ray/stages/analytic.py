"""SQL analytic (window) functions over the keyed exchange.

Engine-defined (no reference equivalent; the reference can only express
running state through its whole-resource rows generators —
reference processors' stateful iteration is the ordering contract).

``keyed_window`` computes the classic per-key ordered analytics —
running sum, lag, row_number — in one hash exchange: equal keys
co-locate (``stages.agg.keyed_merge``), each partition sorts its rows
by (keys, order_cols) once and computes ALL requested functions with
vectorized pandas groupby kernels (cumsum / shift / cumcount — no
per-group Python, no global sort). The partitioning assumption is the
standard SQL-window one: a single key's rows fit one partition.

Determinism: ``order_cols`` must totally order rows within a key (SQL
users include a unique tie-break column for the same reason). For
floating-point running sums the summation ORDER is fixed by the sort,
but engines may still associate differently — use integer value columns
when byte-identical cross-engine parity matters.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
import pyarrow as pa
import ray.data

from .agg import keyed_merge


def keyed_window(ds: ray.data.Dataset, keys: List[str],
                 order_cols: List[str], value_col: str,
                 running_sum: Optional[str] = "running_sum",
                 lag: Optional[str] = "prev_value",
                 row_number: Optional[str] = "rn") -> ray.data.Dataset:
    """Append per-key ordered analytics of ``value_col``: cumulative sum
    (``running_sum``), previous row's value (``lag``, NULL on each key's
    first row), and 1-based position (``row_number``). Pass None to skip
    an output."""

    def merge(df: pd.DataFrame) -> pa.Table:
        out_cols = {}
        if len(df):
            df = df.sort_values(list(keys) + list(order_cols),
                                kind="mergesort").reset_index(drop=True)
            g = df.groupby(list(keys), sort=False)
            if running_sum is not None:
                out_cols[running_sum] = g[value_col].cumsum()
            if lag is not None:
                shifted = g[value_col].shift(1)
                if pd.api.types.is_integer_dtype(df[value_col]):
                    shifted = shifted.astype("Int64")
                out_cols[lag] = shifted
            if row_number is not None:
                out_cols[row_number] = g.cumcount() + 1
        else:
            for name in (running_sum, lag, row_number):
                if name is not None:
                    out_cols[name] = pd.Series([], dtype="Int64")
        out = df.assign(**out_cols)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    prepped = ds.map_batches(lambda t: t, batch_format="pyarrow",
                             batch_size=None)
    return keyed_merge(prepped, list(keys), merge)
