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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .agg import keyed_merge


def keyed_window(ds: ray.data.Dataset, keys: List[str],
                 order_cols: List[str], value_col: str,
                 running_sum: Optional[str] = "running_sum",
                 lag: Optional[str] = "prev_value",
                 row_number: Optional[str] = "rn",
                 dense_rank: Optional[str] = None,
                 ntile: Optional[int] = None,
                 ntile_col: str = "ntile",
                 lead: Optional[str] = None,
                 first_value: Optional[str] = None,
                 last_value: Optional[str] = None,
                 rolling_window: Optional[int] = None,
                 rolling_sum: Optional[str] = None,
                 rolling_avg: Optional[str] = None,
                 rolling_min: Optional[str] = None,
                 rolling_max: Optional[str] = None) -> ray.data.Dataset:
    """Append per-key ordered analytics of ``value_col``: cumulative sum
    (``running_sum``), previous row's value (``lag``, NULL on each key's
    first row), 1-based position (``row_number``), SQL ``dense_rank``
    over ``order_cols`` (ties share a rank, no gaps), and SQL
    ``ntile(N)`` buckets, next row's value (``lead``), and the
    whole-partition-frame ``first_value`` / ``last_value``. Pass None
    to skip an output.

    ``rolling_window=k`` adds sliding-frame analytics (SQL ``ROWS BETWEEN
    k-1 PRECEDING AND CURRENT ROW``): ``rolling_sum`` / ``rolling_avg`` /
    ``rolling_min`` / ``rolling_max``. Computed with pandas' vectorized
    grouped rolling kernels inside the same single exchange — no extra
    shuffle, no per-group Python tasks."""

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
            if dense_rank is not None:
                # new (key, order) tuple -> rank bump; ties share ranks
                changed = pd.Series(True, index=df.index)
                cols = list(keys) + list(order_cols)
                same = (df[cols] == df[cols].shift(1)).all(axis=1)
                changed[same] = False
                within = g.cumcount() == 0
                bump = changed & ~within
                out_cols[dense_rank] = bump.groupby(
                    [df[k] for k in keys], sort=False).cumsum() + 1
            if lead is not None:
                shifted = g[value_col].shift(-1)
                if pd.api.types.is_integer_dtype(df[value_col]):
                    shifted = shifted.astype("Int64")
                out_cols[lead] = shifted
            if first_value is not None:
                out_cols[first_value] = g[value_col].transform("first")
            if last_value is not None:
                out_cols[last_value] = g[value_col].transform("last")
            if rolling_window is not None:
                r = g[value_col].rolling(rolling_window, min_periods=1)
                for name, agg in ((rolling_sum, "sum"), (rolling_avg, "mean"),
                                  (rolling_min, "min"), (rolling_max, "max")):
                    if name is None:
                        continue
                    s = getattr(r, agg)()
                    # groupby.rolling returns a (keys..., orig_index)
                    # MultiIndex; drop the key levels so assignment
                    # realigns on the original row index
                    s.index = s.index.droplevel(list(range(len(keys))))
                    out_cols[name] = s
            if ntile is not None:
                pos = g.cumcount()
                size = g[value_col].transform("size")
                # SQL ntile: first (size % n) buckets get the extra row
                big = size // ntile + 1
                n_big = size % ntile
                cut = n_big * big
                in_big = pos < cut
                small = (size // ntile).where(size // ntile > 0, 1)
                tile = np.where(
                    in_big, pos // big.where(big > 0, 1),
                    n_big + (pos - cut) // small)
                out_cols[ntile_col] = tile.astype(np.int64) + 1
        else:
            for name in (running_sum, lag, row_number, dense_rank,
                         lead, first_value, last_value,
                         rolling_sum, rolling_avg, rolling_min, rolling_max,
                         ntile_col if ntile is not None else None):
                if name is not None:
                    out_cols[name] = pd.Series([], dtype="Int64")
        out = df.assign(**out_cols)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    prepped = ds.map_batches(lambda t: t, batch_format="pyarrow",
                             batch_size=None)
    return keyed_merge(prepped, list(keys), merge)


def ordered_prefix_sum(ds: ray.data.Dataset, order_col: str, val_col: str,
                       bucket_width: int = 1024,
                       out_col: str = "cum_before") -> ray.data.Dataset:
    """EXCLUSIVE prefix sum over a globally ordered dataset — SQL
    ``sum(val) OVER (ORDER BY order_col ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — without a global sort:

    1. bucket = ``order_col // bucket_width``; one combining
       ``grouped_aggregate`` computes per-bucket totals (a
       bucket-count-sized result),
    2. the driver exclusive-scans the bucket totals in bucket order
       (#buckets integers — the only driver-side state) and broadcasts
       the offsets in the task closure,
    3. ONE keyed exchange on bucket co-locates each bucket's rows;
       each partition sorts (bucket, order_col) once and computes the
       within-bucket exclusive cumsum + bucket offset vectorized.

    ``order_col`` must be a unique NON-NEGATIVE integer key (SQL needs
    uniqueness for a deterministic frame; non-negative keeps the
    truncating bucket division order-preserving). Integer ``val_col`` sums are exact, so the
    result is bit-identical at any parallelism and to any SQL engine.
    ``bucket_width`` is the parallelism knob: #buckets ≈ key-range /
    width must fit the driver (ints only), each bucket's rows must fit
    a partition."""
    import pyarrow.compute as pc

    from .agg import grouped_aggregate

    B = "__psum_bucket__"

    def with_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t[order_col], bucket_width)
        return t.append_column(B, pc.cast(b, pa.int64()))

    proj = ds.select_columns([order_col, val_col]).map_batches(
        with_bucket, batch_format="pyarrow", batch_size=None)
    totals = grouped_aggregate(proj, [B], [
        {"target": "__t__", "source": val_col, "aggregate": "sum"}])
    pairs = []
    for b in totals.iter_batches(batch_format="pyarrow", batch_size=None):
        pairs.extend(zip(b[B].to_pylist(), b["__t__"].to_pylist()))
    pairs.sort()
    offsets = {}
    run = 0
    for bk, tot in pairs:
        offsets[bk] = run
        run += int(tot)

    def merge(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.table({
                order_col: pa.array([], pa.int64()),
                val_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64()),
            })
        df = df.sort_values([B, order_col], kind="mergesort")
        within = df.groupby(B, sort=False)[val_col].cumsum() - df[val_col]
        cum = within.to_numpy() + df[B].map(offsets).to_numpy()
        return pa.table({
            order_col: pa.array(df[order_col].to_numpy(), pa.int64()),
            val_col: pa.array(df[val_col].to_numpy(), pa.int64()),
            out_col: pa.array(cum.astype(np.int64)),
        })

    return keyed_merge(proj, [B], merge)
