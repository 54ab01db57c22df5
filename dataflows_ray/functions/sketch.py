"""Approximate/sketch aggregates: HyperLogLog distinct counting.

Engine-defined (the reference has no sketch aggregates; SURVEY §2.4 notes
them absent). Algorithm: Flajolet et al. 2007 (HyperLogLog) with the
standard small-range (linear counting) correction.

Scale design: an HLL sketch is a tiny fixed-size register array (2^p
bytes) that merges by elementwise max — the ideal shape for this engine's
combiner + keyed_merge architecture: each block reduces to one register
row per key BEFORE any shuffle (hot keys collapse per block, same skew
immunity as the numeric combiner), and the merge is a vectorized
``np.maximum`` fold. Values hash through ``core.strhash`` (process-stable)
so results are deterministic across runs and parallelism levels.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..core.strhash import hash_string_array

_TWO64 = float(2 ** 64)


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche: HLL needs uniform HIGH bits, which the
    polynomial string hash alone does not guarantee."""
    with np.errstate(over="ignore"):
        h = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _hash_column(col) -> np.ndarray:
    """uint64 hashes for an Arrow column (strings via the buffer kernel;
    numerics via their bit pattern), avalanched for uniform bucket/rho
    distribution."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        v = hash_string_array(col)
    else:
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            v = v.view(np.uint64) if v.dtype == np.float64 else v.astype(
                np.float64).view(np.uint64)
        else:
            v = v.astype(np.int64).view(np.uint64)
    return _mix64(v)


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (uint8[2^p]) for a batch of value hashes.
    Fully vectorized: bucket = top p bits; rho = leading zeros of the
    remaining (64-p) bits + 1 (bit length via frexp — exact because
    64 - p <= 52 bits for p >= 12)."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return reg
    bucket = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes & np.uint64((1 << (64 - p)) - 1)
    # bit length of `rest` via frexp on exact float64 (values < 2^52)
    _mant, exp = np.frexp(rest.astype(np.float64))
    rho = (64 - p) - exp + 1  # exp == bit_length; rest==0 -> exp 0 -> max
    np.maximum.at(reg, bucket, rho.astype(np.uint8))
    return reg


def _estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range correction."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_count_distinct(ds: ray.data.Dataset, col: str, p: int = 14) -> int:
    """Global approximate NDV of ``col`` (typical error ~1.04/sqrt(2^p),
    ~0.8% at p=14). One pass; only 2^p-byte sketches leave each block."""

    def sketch(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch[col])
        valid = np.asarray(pa.compute.is_valid(
            batch[col].combine_chunks() if isinstance(batch[col],
                                                      pa.ChunkedArray)
            else batch[col]))
        reg = _registers(h[valid], p)
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        sketch, batch_format="pyarrow", batch_size=None)
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for raw in b["reg"].to_pylist():
            np.maximum(merged, np.frombuffer(raw, dtype=np.uint8),
                       out=merged)
    return int(round(_estimate(merged)))


def grouped_approx_count_distinct(ds: ray.data.Dataset, keys: List[str],
                                  col: str, p: int = 12,
                                  target: str = "approx_ndv"
                                  ) -> ray.data.Dataset:
    """Per-key approximate NDV: one register row per (block, key) leaves
    each block (the sketch IS the combiner), keyed_merge folds them with
    vectorized np.maximum, finalize estimates per key."""
    from ..stages.agg import keyed_merge

    m = 1 << p

    def combine(df: pd.DataFrame) -> pa.Table:
        regs = []
        key_rows = {k: [] for k in keys}
        for key_vals, idx in df.groupby(keys, sort=False).indices.items():
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            h = _hash_column(pa.array(df[col].to_numpy()[idx]))
            regs.append(_registers(h, p).tobytes())
            for k, v in zip(keys, key_vals):
                key_rows[k].append(v)
        out = {k: pa.array(v) for k, v in key_rows.items()}
        out["__hll__"] = pa.array(regs, type=pa.binary())
        return pa.table(out)

    def merge(df: pd.DataFrame) -> pa.Table:
        rows = {k: [] for k in keys}
        ndv = []
        for key_vals, idx in df.groupby(keys, sort=False).indices.items():
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            acc = np.zeros(m, dtype=np.uint8)
            for raw in df["__hll__"].to_numpy()[idx]:
                np.maximum(acc, np.frombuffer(raw, dtype=np.uint8), out=acc)
            ndv.append(int(round(_estimate(acc))))
            for k, v in zip(keys, key_vals):
                rows[k].append(v)
        out = {k: pa.array(v) for k, v in rows.items()}
        out[target] = pa.array(ndv, type=pa.int64())
        return pa.table(out)

    combined = ds.select_columns(keys + [col]).map_batches(
        combine, batch_format="pandas", batch_size=None)
    return keyed_merge(combined, keys, merge)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): fixed d x w integer
# register matrix, merged by elementwise SUM — like the HLL above it is
# a combiner-shaped aggregate (one tiny matrix per block leaves the
# block; the merge is one vectorized add), and its estimates are
# batch-layout-independent because integer addition commutes.
# ---------------------------------------------------------------------------

_CM_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=np.uint64)


def _cm_rows(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) register column indices for a batch of value hashes."""
    idx = np.empty((depth, len(hashes)), dtype=np.int64)
    for d in range(depth):
        idx[d] = (_mix64(hashes ^ _CM_SEEDS[d]) % np.uint64(width)) \
            .astype(np.int64)
    return idx


def _cm_sketch(hashes: np.ndarray, depth: int, width: int,
               weights: Optional[np.ndarray] = None) -> np.ndarray:
    """``weights`` adds n per hash instead of 1 — integer adds commute,
    so a weighted sketch over (value, count) aggregates is bit-identical
    to the row-at-a-time sketch over the raw stream."""
    reg = np.zeros((depth, width), dtype=np.int64)
    if len(hashes):
        idx = _cm_rows(hashes, depth, width)
        w = np.ones(len(hashes), dtype=np.int64) if weights is None \
            else np.asarray(weights, dtype=np.int64)
        for d in range(depth):
            np.add.at(reg[d], idx[d], w)
    return reg


def _cm_estimate(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates (min over depth rows) for the given value hashes."""
    depth, width = reg.shape
    if not len(hashes):
        return np.zeros(0, dtype=np.int64)
    idx = _cm_rows(hashes, depth, width)
    ests = np.stack([reg[d][idx[d]] for d in range(depth)])
    return ests.min(axis=0)


def count_min_sketch(ds: ray.data.Dataset, col: str, depth: int = 4,
                     width: int = 2048) -> np.ndarray:
    """Merged Count-Min sketch of ``col`` over the whole dataset: one
    (depth, width) int64 matrix per block leaves each block; the driver
    folds them with one vectorized add per block (the matrix is
    KB-sized — the same shape HLL uses)."""

    def sketch(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        valid = np.asarray(pa.compute.is_valid(c))
        h = _hash_column(c)[valid]
        reg = _cm_sketch(h, depth, width)
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        sketch, batch_format="pyarrow", batch_size=None)
    merged = np.zeros((depth, width), dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for raw in b["reg"].to_pylist():
            merged += np.frombuffer(raw, dtype=np.int64) \
                .reshape(depth, width)
    return merged


def heavy_hitters(ds: ray.data.Dataset, col: str, k: int = 20,
                  depth: int = 4, width: int = 2048) -> pa.Table:
    """Top-k values of ``col`` by exact count, annotated with the
    Count-Min estimate from ONE merged sketch (``cm_est >= n`` always —
    the sketch only overestimates). The exact counts come from the
    combining aggregate + shuffle-free top-k; the sketch pass
    demonstrates the mergeable-registers path a pure-streaming caller
    would use when exact counts are too expensive."""
    from ..stages.agg import grouped_aggregate
    from ..stages.setops import top_k

    counts = grouped_aggregate(ds.select_columns([col]), [col],
                               [{"target": "n", "aggregate": "count"}])
    # ONE pass over the raw data total: the sketch is built WEIGHTED from
    # the (value, count) aggregate (additions commute, so it is identical
    # to sketching the raw stream), and both the sketch fold and top-k
    # run over the group-count-sized counts table, not the corpus.
    merged = np.zeros((depth, width), dtype=np.int64)

    def sketch_counts(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        reg = _cm_sketch(_hash_column(c), depth, width,
                         weights=batch["n"].to_numpy(zero_copy_only=False))
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    for b in counts.map_batches(sketch_counts, batch_format="pyarrow",
                                batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for raw in b["reg"].to_pylist():
            merged += np.frombuffer(raw, dtype=np.int64) \
                .reshape(depth, width)
    top = top_k(counts, ["n", col], k,
                descending=[True, False]).to_pandas().head(k)
    h = _hash_column(pa.array(top[col].to_numpy()))
    top["cm_est"] = _cm_estimate(merged, h)
    return pa.Table.from_pandas(top.reset_index(drop=True),
                                preserve_index=False)
