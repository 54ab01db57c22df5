"""Distributed PCA over an embedding column.

Engine-defined operator (no reference equivalent; extends the embedding
family of ``functions/similarity.py`` / ``functions/kmeans.py``): fit
principal components with ONE streaming pass of mergeable moment
partials, then project every vector in a stateless ``map_batches`` with
the components broadcast in the task closure. The 100-TB shape: nothing
bigger than a (d, d) matrix moves or lives anywhere, and the corpus is
scanned exactly twice (fit pass + project pass).

Determinism contract (what lets a sequential oracle match bit-for-bit):
inputs are quantized to integers ``q = round(x * 1e6)`` and the moment
partials (``n``, ``sum q``, ``sum q qᵀ``) are accumulated in INTEGER
arithmetic — int64 inside a batch, arbitrary-precision Python ints
across partials — so the distributed reduction is EXACT and
order-independent (float partial sums would differ in the last bits
between parallelism levels and could flip a rounded digit). The
covariance is then formed per entry as ``(n*xtx_ij - s_i*s_j) /
(n*(n-1)*1e12)`` — one correctly-rounded float division of exact
integers — and ``numpy.linalg.eigh`` of an identical matrix is
identical. Component sign is canonicalized (largest-|entry| coordinate
made positive, first index on ties).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import ray.data

_SCALE = 1_000_000  # input quantization: q = round(x * 1e6)


def _quantized(batch: pa.Table, col: str) -> np.ndarray:
    emb = batch[col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    d = len(emb[0])
    x = flat.astype(np.float64).reshape(-1, d)
    return np.round(x * _SCALE).astype(np.int64)


def pca_fit(ds: ray.data.Dataset, col: str = "embedding",
            k: int = 4) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (mean, components, explained_var):
    mean (d,) float64, components (d, k) float64 — columns are the top-k
    eigenvectors of the sample covariance by descending eigenvalue —
    and the k eigenvalues. One streaming scan; partials are one
    (1 + d + d*d) integer row per block."""

    def moments(batch: pa.Table) -> pa.Table:
        q = _quantized(batch, col)
        s = q.sum(axis=0, dtype=np.int64)
        xtx = (q.T @ q).astype(np.int64)
        return pa.table({
            "n": pa.array([len(q)], pa.int64()),
            "s": pa.array([s.tobytes()], pa.binary()),
            "xtx": pa.array([xtx.tobytes()], pa.binary()),
        })

    n = 0
    s_total = None
    xtx_total = None
    for b in ds.select_columns([col]).map_batches(
            moments, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for i in range(len(b)):
            n += int(b["n"][i].as_py())
            s = np.frombuffer(b["s"][i].as_py(), dtype=np.int64)
            xtx = np.frombuffer(b["xtx"][i].as_py(), dtype=np.int64)
            if s_total is None:
                # Python-int accumulators: exact at any corpus size
                s_total = [int(v) for v in s]
                xtx_total = [int(v) for v in xtx]
            else:
                for j, v in enumerate(s):
                    s_total[j] += int(v)
                for j, v in enumerate(xtx):
                    xtx_total[j] += int(v)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    d = len(s_total)
    denom = n * (n - 1) * _SCALE * _SCALE
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        si = s_total[i]
        row = xtx_total[i * d:(i + 1) * d]
        for j in range(d):
            cov[i, j] = (n * row[j] - si * s_total[j]) / denom
    mean = np.array([v / (n * _SCALE) for v in s_total], dtype=np.float64)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    vals = w[order]
    # canonical sign: make the largest-|entry| coordinate positive
    for c in range(comps.shape[1]):
        idx = int(np.argmax(np.abs(comps[:, c])))
        if comps[idx, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps, vals


class PcaProjector:
    """Stateless projection transform: y = (q/1e6 - mean) @ components.
    Components/mean ride the closure (d*k floats); per-batch work is one
    matmul."""

    def __init__(self, mean: np.ndarray, comps: np.ndarray,
                 col: str = "embedding", id_col: str = "vec_id",
                 round_to: int = 6):
        self.mean = mean
        self.comps = comps
        self.col = col
        self.id_col = id_col
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = _quantized(batch, self.col)
        x = q.astype(np.float64) / _SCALE
        y = (x - self.mean) @ self.comps
        y = np.round(y, self.round_to)
        cols = {self.id_col: batch[self.id_col]}
        for c in range(y.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(y[:, c], pa.float64())
        return pa.table(cols)


def pca_project(ds: ray.data.Dataset, mean: np.ndarray, comps: np.ndarray,
                col: str = "embedding",
                id_col: str = "vec_id") -> ray.data.Dataset:
    """Project every embedding onto the fitted components."""
    return ds.map_batches(PcaProjector(mean, comps, col, id_col),
                          batch_format="pyarrow", batch_size=None)
