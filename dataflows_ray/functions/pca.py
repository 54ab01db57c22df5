"""Distributed PCA over an embedding column.

Engine-defined operator (no reference equivalent; extends the embedding
family of ``functions/similarity.py`` / ``functions/kmeans.py``): fit
principal components with ONE streaming pass of mergeable moment
partials, then project every vector in a stateless ``map_batches`` with
the components broadcast in the task closure. The 100-TB shape: nothing
bigger than a (d, d) matrix moves or lives anywhere, and the corpus is
scanned exactly twice (fit pass + project pass).

Determinism contract (what lets a sequential oracle match bit-for-bit):
inputs are quantized to integers ``q = floor(x * 1e6 + 0.5)`` and the moment
partials (``n``, ``sum q``, ``sum q qᵀ``) are accumulated in INTEGER
arithmetic — int64 inside a chunk sized so ``rows * max|q|^2 < 2^62``
(guaranteed overflow-free), arbitrary-precision Python ints across
partials — so the distributed reduction is EXACT and
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

_SCALE = 1_000_000  # input quantization: q = floor(x * 1e6 + 0.5)


def _quantized(batch: pa.Table, col: str) -> np.ndarray:
    """q = floor(x * 1e6 + 0.5) — the round-half-up tie rule used
    engine-wide (resample/loudness use the same form) because any SQL
    engine reproduces it verbatim (``CAST(floor(x*1e6 + 0.5) AS
    BIGINT)``), unlike banker's rounding."""
    emb = batch[col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if len(emb) == 0:
        # Ray delivers zero-row blocks to map tasks too; callers treat a
        # (0, 0) matrix as "no contribution"
        return np.empty((0, 0), dtype=np.int64)
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    d = len(emb[0])
    x = flat.astype(np.float64).reshape(-1, d)
    return np.floor(x * _SCALE + 0.5).astype(np.int64)


def pca_fit(ds: ray.data.Dataset, col: str = "embedding",
            k: int = 4) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (mean, components, explained_var):
    mean (d,) float64, components (d, k) float64 — columns are the top-k
    eigenvectors of the sample covariance by descending eigenvalue —
    and the k eigenvalues. One streaming scan; partials are one
    (1 + d + d*d) integer row per block."""

    def moments(batch: pa.Table) -> pa.Table:
        q = _quantized(batch, col)
        if q.size == 0:  # empty block: no contribution
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.binary()),
                             "xtx": pa.array([], pa.binary())})
        # Overflow guard: an int64 dot product over r rows is bounded by
        # r * max|q|^2, which wraps SILENTLY past 2^63 (a ~1M-row block of
        # |x|~3 embeddings is enough: 1e6 * (3e6)^2 ~ 1e19 > 9.2e18).
        # Split the block into chunks where r * max|q|^2 < 2^62 — each
        # chunk's int64 partial is then provably exact — and emit one
        # partial row per chunk; the driver merges them in Python ints.
        max_abs = int(np.abs(q).max())
        if max_abs == 0:
            chunk = len(q)
        else:
            if max_abs * max_abs > (1 << 62):
                # even a single q_i*q_j product would overflow int64 —
                # no chunk size can make the partial exact, so fail
                # LOUDLY instead of wrapping (|x| >= ~2147 quantized at
                # 1e6; real embeddings are O(1), so this is input
                # corruption, not scale)
                raise ValueError(
                    f"pca_fit: |quantized value| {max_abs} too large "
                    "for the exact int64 moment path; rescale the "
                    "embedding column")
            chunk = max(1, (1 << 62) // (max_abs * max_abs))
        ns, ss, xs = [], [], []
        for start in range(0, len(q), chunk):
            qc = q[start:start + chunk]
            ns.append(len(qc))
            ss.append(qc.sum(axis=0, dtype=np.int64).tobytes())
            xs.append((qc.T @ qc).tobytes())
        return pa.table({
            "n": pa.array(ns, pa.int64()),
            "s": pa.array(ss, pa.binary()),
            "xtx": pa.array(xs, pa.binary()),
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
        if len(batch) == 0:
            cols = {self.id_col: batch[self.id_col]}
            for c in range(self.comps.shape[1]):
                cols[f"pc{c + 1}"] = pa.array([], pa.float64())
            return pa.table(cols)
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


def grouped_embedding_mean(ds: ray.data.Dataset, label_col: str = "label",
                           col: str = "embedding") -> ray.data.Dataset:
    """Per-label embedding centroid, EXACTLY: one row per (label, dim)
    with the mean of the 1e-6-quantized coordinates — the class-centroid
    profile of an embedding table (cluster inspection, nearest-centroid
    classification, drift monitoring).

    Scale shape: each block reduces to (labels-in-block x d) integer
    partial rows inside ``map_batches`` (np.add.reduceat over a
    label-sorted view — no Python per row), then ONE combining keyed
    exchange of partials sums them per (label, dim). Integer sums make
    the result independent of partitioning and bit-equal to the SQL
    oracle, which reproduces the quantizer as
    ``CAST(floor(x*1e6 + 0.5) AS BIGINT)``."""
    import pyarrow.compute as pc

    from ..stages.agg import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantized(batch, col)
        if q.size == 0:  # empty block: emit the partial schema, no rows
            lab = batch[label_col]
            if isinstance(lab, pa.ChunkedArray):
                lab = lab.combine_chunks()
            return pa.table({label_col: lab.slice(0, 0),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = q.shape[1]
        labels = batch[label_col]
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        lab = labels.to_numpy(zero_copy_only=False)
        order = np.argsort(lab, kind="stable")
        lab_sorted = lab[order]
        q_sorted = q[order]
        uniq, starts = np.unique(lab_sorted, return_index=True)
        sums = np.add.reduceat(q_sorted, starts, axis=0)
        counts = np.diff(np.append(starts, len(lab_sorted)))
        n_lab = len(uniq)
        return pa.table({
            label_col: pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1), n_lab),
                            pa.int64()),
            "s": pa.array(sums.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, d).astype(np.int64)),
        })

    partials = ds.select_columns([label_col, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    agg = grouped_aggregate(partials, [label_col, "dim"], [
        {"target": "s", "source": "s", "aggregate": "sum"},
        {"target": "n", "source": "n", "aggregate": "sum"},
    ])

    def finalize(batch: pa.Table) -> pa.Table:
        # mean is the UNROUNDED float ratio of exact integers: one
        # correctly-rounded division that any engine reproduces
        # bit-for-bit (np.round-vs-SQL-round half-even/half-away
        # dialects would diverge on grid boundaries).
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s / (n * _SCALE)
        return pa.table({
            label_col: batch[label_col],
            "dim": batch["dim"],
            "n_vecs": pc.cast(batch["n"], pa.int64()),
            "mean_val": pa.array(mean, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)
