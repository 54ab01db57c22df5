"""Distributed k-means (Lloyd's algorithm) over an embedding column.

Engine-defined operator for corpus curation (cluster-balanced sampling,
near-dup cluster discovery, domain bucketing). No reference equivalent.

Scale shape: each Lloyd iteration is ONE streaming pass — every batch
computes its assignment locally against the broadcast centroid matrix
(k x d floats, tiny) and emits per-cluster partial sums + counts (k x d
again); the driver merges the partials and re-broadcasts. Nothing larger
than k x d ever leaves a task; the dataset itself never shuffles and is
re-read lazily per iteration (at 100 TB you pay iters sequential scans,
the standard distributed-kmeans cost).

Determinism contract (for the sequential fixture oracle): init is the
embeddings of the k smallest ids, iteration count is fixed, and the
updated centroids are quantized to 1e-6 each round so partial-sum
association order (which differs between a distributed and a sequential
run by ~1e-12) cannot leak into the assignments.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _matrix(col) -> np.ndarray:
    """(n, d) float64 view of a list<float> column (zero-copy flatten of
    the Arrow child buffer; rows are equal-length by construction)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0))
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(n, len(flat) // n)


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 per row — one matmul against the (tiny)
    centroid matrix."""
    # ||x||^2 is constant per row; argmin needs only -2xC^T + ||c||^2
    d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    return d2.argmin(axis=1)


def kmeans_fit(ds: ray.data.Dataset, k: int = 8, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id"
               ) -> np.ndarray:
    """Fixed-iteration Lloyd's: returns the (k, d) centroid matrix."""
    import pyarrow.compute as pc

    # init = embeddings of the k smallest ids, WITHOUT a global sort:
    # each block contributes its local bottom-k (k rows per block move,
    # never the corpus), the driver merges k x blocks candidate rows
    def block_bottomk(batch: pa.Table) -> pa.Table:
        t = pa.table({id_col: batch[id_col], vec_col: batch[vec_col]})
        order = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        return t.take(order[:k])

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        block_bottomk, batch_format="pyarrow", batch_size=None)
    rows = sorted(cand.take_all(), key=lambda r: r[id_col])[:k]
    C = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    C = np.round(C, 6)

    for _ in range(iters):
        C_ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cb = ray.get(C_ref) if isinstance(C_ref, ray.ObjectRef) else C_ref
            X = _matrix(batch[vec_col])
            a = _assign(X, Cb)
            kk, d = Cb.shape
            sums = np.zeros((kk, d))
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.tobytes()], type=pa.large_binary()),
                "counts": pa.array([counts.tobytes()],
                                   type=pa.large_binary()),
            })

        kk, d = C.shape
        sums = np.zeros((kk, d))
        counts = np.zeros(kk, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None).iter_batches(
                                    batch_format="pyarrow", batch_size=None):
            for s_raw, c_raw in zip(b["sums"].to_pylist(),
                                    b["counts"].to_pylist()):
                sums += np.frombuffer(s_raw, dtype=np.float64).reshape(kk, d)
                counts += np.frombuffer(c_raw, dtype=np.int64)
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        C = np.round(C, 6)  # kill partial-sum order drift (~1e-12)
    return C


def kmeans_predict(ds: ray.data.Dataset, centroids: np.ndarray,
                   vec_col: str = "embedding", id_col: str = "vec_id"
                   ) -> ray.data.Dataset:
    """(id, cluster) per row against a fixed centroid matrix."""
    C_ref = ray.put(centroids)

    def fn(batch: pa.Table) -> pa.Table:
        Cb = ray.get(C_ref) if isinstance(C_ref, ray.ObjectRef) else C_ref
        a = _assign(_matrix(batch[vec_col]), Cb)
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(a, type=pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def kmeans_fit_predict(ds: ray.data.Dataset, k: int = 8, iters: int = 5,
                       vec_col: str = "embedding", id_col: str = "vec_id"
                       ) -> Tuple[np.ndarray, ray.data.Dataset]:
    C = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    return C, kmeans_predict(ds, C, vec_col=vec_col, id_col=id_col)
