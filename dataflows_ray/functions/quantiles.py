"""Exact distributed quantiles by iterative histogram refinement.

Engine-defined (no reference equivalent); the classic multi-pass
distributed selection algorithm (bisection over the value domain with
mergeable per-block histograms — the shape BigQuery/Spark use for
APPROX_QUANTILES' exact cousin). Every pass is a streaming single-column
scan whose per-block output is a KB-sized count vector, merged on the
driver by vectorized addition — layout-independent (integer adds
commute), so results are identical at any parallelism, and nothing
corpus-sized ever moves.

Passes over the column (each a projected ``map_batches`` scan):
1. stats: (non-null count, min, max) per block -> fold.
2. histogram (repeated, usually once): for every still-active quantile
   target, B bin counts over its current [lo, hi] range; the driver
   locates the bin holding the target rank and narrows the range B-fold.
   Repeats only while the bin still holds > ``collect_limit`` values.
3. collect: gather the (<= collect_limit) values inside each resolved
   bin, sort the tiny array, pick the exact rank element.

Rank semantics match SQL ``quantile_disc`` / ``percentile_disc``
(verified against DuckDB): the 0-indexed element ``ceil(q * n) - 1`` of
the sorted column. Values are processed as float64 (exact for doubles
and for integers up to 2^53).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _col_values(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    c = c.drop_null()
    return c.to_numpy(zero_copy_only=False).astype(np.float64)


def exact_quantiles(ds: ray.data.Dataset, col: str, qs: List[float],
                    bins: int = 4096, collect_limit: int = 262_144,
                    max_iters: int = 24) -> pa.Table:
    """(q, value) rows: the exact ``quantile_disc`` of ``col`` at each
    ``q``, computed without any global sort or shuffle."""
    proj = ds.select_columns([col])

    def stats(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, col)
        return pa.table({
            "n": pa.array([len(v)], type=pa.int64()),
            "mn": pa.array([float(v.min()) if len(v) else math.inf]),
            "mx": pa.array([float(v.max()) if len(v) else -math.inf]),
        })

    n, mn, mx = 0, math.inf, -math.inf
    for b in proj.map_batches(stats, batch_format="pyarrow",
                              batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None):
        n += int(pc.sum(b["n"]).as_py())
        mn = min(mn, pc.min(b["mn"]).as_py())
        mx = max(mx, pc.max(b["mx"]).as_py())

    if n == 0:
        return pa.table({"q": pa.array(qs, type=pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           type=pa.float64())})

    # SQL quantile_disc rank rule (same double arithmetic as the engines)
    ranks = [min(n - 1, max(0, math.ceil(q * n) - 1)) for q in qs]
    targets = [{"rank": r, "lo": mn, "hi": mx, "below": 0,
                "value": mn if mn == mx else None} for r in ranks]

    def active(t) -> bool:
        return t["value"] is None and not t.get("collect")

    for _ in range(max_iters):
        act = [t for t in targets if active(t)]
        if not act:
            break
        edge_list = [np.linspace(t["lo"], t["hi"], bins + 1) for t in act]

        def hist(batch: pa.Table, edge_list=edge_list) -> pa.Table:
            v = _col_values(batch, col)
            counts = [np.histogram(v, bins=e)[0] if len(v)
                      else np.zeros(len(e) - 1, dtype=np.int64)
                      for e in edge_list]
            return pa.table({"h": pa.array(
                [np.concatenate(counts).astype(np.int64).tobytes()],
                type=pa.binary())})

        merged = np.zeros(bins * len(act), dtype=np.int64)
        for b in proj.map_batches(hist, batch_format="pyarrow",
                                  batch_size=None).iter_batches(
                batch_format="pyarrow", batch_size=None):
            for raw in b["h"].to_pylist():
                merged += np.frombuffer(raw, dtype=np.int64)

        for i, t in enumerate(act):
            c = merged[i * bins:(i + 1) * bins]
            edges = edge_list[i]
            prefix = np.concatenate([[0], np.cumsum(c)])
            local_rank = t["rank"] - t["below"]
            j = int(np.searchsorted(prefix, local_rank, side="right") - 1)
            j = min(j, bins - 1)
            t["below"] += int(prefix[j])
            t["lo"], t["hi"] = float(edges[j]), float(edges[j + 1])
            in_bin = int(c[j])
            if t["lo"] == t["hi"] or not math.isfinite(t["hi"] - t["lo"]) \
                    or np.nextafter(t["lo"], t["hi"]) >= t["hi"]:
                t["value"] = t["lo"]
            elif in_bin <= collect_limit:
                t["collect"] = True

    need = [t for t in targets if t["value"] is None]
    if need:
        ranges = [(t["lo"], t["hi"]) for t in need]

        def grab(batch: pa.Table, ranges=ranges) -> pa.Table:
            v = _col_values(batch, col)
            idx_out, val_out = [], []
            for i, (lo, hi) in enumerate(ranges):
                sel = v[(v >= lo) & (v <= hi)]
                idx_out.append(np.full(len(sel), i, dtype=np.int32))
                val_out.append(sel)
            return pa.table({
                "i": np.concatenate(idx_out) if idx_out
                else np.zeros(0, dtype=np.int32),
                "v": np.concatenate(val_out) if val_out
                else np.zeros(0, dtype=np.float64)})

        parts = [[] for _ in need]
        for b in proj.map_batches(grab, batch_format="pyarrow",
                                  batch_size=None).iter_batches(
                batch_format="pyarrow", batch_size=None):
            iarr = b["i"].to_numpy(zero_copy_only=False)
            varr = b["v"].to_numpy(zero_copy_only=False)
            for i in range(len(need)):
                parts[i].append(varr[iarr == i])
        for i, t in enumerate(need):
            vals = np.sort(np.concatenate(parts[i]))
            # the closed-interval grab may include next-bin values equal
            # to hi; they sort after the target element, which sits at
            # the local rank inside [lo, hi)
            t["value"] = float(vals[t["rank"] - t["below"]])

    return pa.table({"q": pa.array(qs, type=pa.float64()),
                     "value": pa.array([t["value"] for t in targets],
                                       type=pa.float64())})


def grouped_exact_quantile(ds: ray.data.Dataset, keys: List[str], col: str,
                           q: float) -> ray.data.Dataset:
    """Per-group exact ``quantile_disc`` via the keyed exchange: one hash
    shuffle of the (keys, col) projection, then a vectorized per-partition
    sorted-prefix selection (no per-group Python loops). Use when group
    count is large and per-group rows are modest — the complement of the
    global ``exact_quantiles`` refinement (which never shuffles)."""
    import pandas as pd
    from ..stages.agg import keyed_merge

    def merge(df: pd.DataFrame, keys=list(keys), col=col, q=q) -> pa.Table:
        if len(df) == 0:
            out = df.reindex(columns=keys + [col])
            return pa.Table.from_pandas(out, preserve_index=False) \
                           .replace_schema_metadata(None)
        df = df.dropna(subset=[col]).sort_values(
            keys + [col], kind="mergesort")
        sizes = df.groupby(keys, sort=False)[col].transform("size")
        pos = df.groupby(keys, sort=False).cumcount()
        pick = pos == np.maximum(
            0, np.minimum(sizes - 1, np.ceil(q * sizes) - 1))
        out = df[pick][keys + [col]].reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    proj = ds.select_columns(list(keys) + [col]).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=None)
    return keyed_merge(proj, list(keys), merge)


def quantile_bucket_stats(ds: "ray.data.Dataset", col: str,
                          qs: List[float],
                          int_edges: bool = True) -> "ray.data.Dataset":
    """Quantile-bucketed batching stats — the length-bucketing step of a
    padded-batch training pipeline (group clips/sequences of similar
    length so per-batch padding waste stays small): bucket edges are the
    exact ``quantile_disc`` values of ``col`` at ``qs`` (computed by the
    shuffle-free :func:`exact_quantiles` refinement), each row lands in
    ``bucket = first edge index with value <= edge`` (ties go DOWN,
    matching the SQL ``CASE WHEN value <= q1 ... `` chain — coincident
    edges leave their in-between bucket id empty, identically on both
    sides), and per bucket we
    emit ``n_rows``, ``sum_val``, ``max_val`` and the padding waste
    ``n_rows * max_val - sum_val`` (the cost of padding every row to the
    bucket max).

    Scale shape: the quantile pass is 3-4 streaming scans of one column
    with KB-sized mergeable partials; the edges (len(qs) scalars)
    broadcast in the task closure; bucketing is one vectorized
    ``searchsorted`` per batch; the final aggregate moves one partial
    row per (block, bucket). No sort, no wide shuffle."""
    import numpy as np

    from ..stages.agg import grouped_aggregate

    qt = exact_quantiles(ds, col, list(qs))
    vals = qt["value"].to_pylist()
    if any(v is None for v in vals):
        raise ValueError(f"quantile_bucket_stats: empty input column {col}")
    # KEEP coincident edges (skewed data can repeat a quantile): with
    # duplicates, searchsorted(side='left') lands on the FIRST matching
    # edge, which is exactly the SQL CASE chain's semantics — the bucket
    # id between two equal edges is simply unreachable on both sides.
    # Deduping would renumber buckets and diverge from the oracle.
    edges = np.array(sorted(int(v) if int_edges else float(v)
                            for v in vals))

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        arr = v.to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, arr, side="left")
        return pa.table({"bucket": pa.array(b.astype(np.int64)),
                         col: v})

    bucketed = ds.select_columns([col]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=None)
    agg = grouped_aggregate(bucketed, ["bucket"], [
        {"target": "n_rows", "source": col, "aggregate": "count"},
        {"target": "sum_val", "source": col, "aggregate": "sum"},
        {"target": "max_val", "source": col, "aggregate": "max"},
    ])

    def pad(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.cast(batch["n_rows"], pa.int64())
        s = pc.cast(batch["sum_val"], pa.int64())
        m = pc.cast(batch["max_val"], pa.int64())
        return pa.table({
            "bucket": batch["bucket"],
            "n_rows": n,
            "sum_val": s,
            "max_val": m,
            "padding": pc.subtract(pc.multiply(n, m), s),
        })

    return agg.map_batches(pad, batch_format="pyarrow", batch_size=None)
