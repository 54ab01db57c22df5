"""Histogram-sketch approximate quantiles: constant-memory,
order-insensitive, exactly mergeable.

Engine-defined scale primitive. The exact distributed quantiles in
``functions/quantiles.py`` shuffle value partitions; at 100 TB the
standard alternative is a fixed-bin histogram sketch: every block emits
one (nbins,) int64 count vector, merge is elementwise addition
(commutative + associative ⇒ the distributed result is BIT-IDENTICAL to
a sequential pass, unlike KLL/t-digest whose compactions depend on
arrival order), and any quantile reads off the cumulative counts with
error bounded by one bin width. The whole reduction is nbins * 8 bytes
per block — nothing else moves.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data


def histogram_counts(ds: ray.data.Dataset, col: str, lo: float, hi: float,
                     nbins: int = 4096) -> np.ndarray:
    """(nbins,) int64 counts of ``col`` over [lo, hi); values are clipped
    into the first/last bin (bin = min(max(floor((x-lo)/w), 0), nbins-1),
    the same arithmetic a SQL oracle spells out)."""
    w = (hi - lo) / nbins

    def partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        x = x[~np.isnan(x)]
        bins = np.clip(np.floor((x - lo) / w).astype(np.int64), 0,
                       nbins - 1)
        counts = np.bincount(bins, minlength=nbins).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()],
                                            type=pa.large_binary())})

    def add_merge(batch: pa.Table) -> pa.Table:
        # per-partition pre-reduce: the driver merges at most
        # num_partitions count vectors, not one per block
        acc = np.zeros(nbins, dtype=np.int64)
        for raw in batch["counts"].to_pylist():
            acc += np.frombuffer(raw, dtype=np.int64)
        return pa.table({"counts": pa.array([acc.tobytes()],
                                            type=pa.large_binary())})

    reduced = (ds.select_columns([col])
               .map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
               .repartition(8)
               .map_batches(add_merge, batch_format="pyarrow",
                            batch_size=None))
    total = np.zeros(nbins, dtype=np.int64)
    for b in reduced.iter_batches(batch_format="pyarrow", batch_size=None):
        for raw in b["counts"].to_pylist():
            total += np.frombuffer(raw, dtype=np.int64)
    return total


def hist_quantiles(ds: ray.data.Dataset, col: str, lo: float, hi: float,
                   qs: Sequence[float], nbins: int = 4096
                   ) -> List[Tuple[float, float]]:
    """[(q, approx_value)] where approx_value is the LOWER EDGE of the
    first bin whose cumulative count reaches ceil(q * N) — deterministic,
    and exactly what the SQL-oracle formulation computes."""
    counts = histogram_counts(ds, col, lo, hi, nbins)
    n = int(counts.sum())
    w = (hi - lo) / nbins
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        b = int(np.searchsorted(cum, rank, side="left"))
        out.append((float(q), lo + b * w))
    return out
