"""Deterministic distributed sampling.

Engine-defined (SURVEY §2.4 lists sampling among the reference's
absences). Two shapes a training-data pipeline needs:

- ``hash_sample``: entity-consistent bernoulli — a row is kept iff the
  avalanched 64-bit hash of its KEY falls under ``fraction`` of the
  hash space. All rows of a key are kept or dropped TOGETHER (sample by
  document/user, not by row — the property that keeps grouped data
  coherent), the decision is pure per-row compute (no shuffle, no RNG
  state, reproducible at any parallelism), and two samples with the
  same seed are identical while disjoint seeds are independent.
- ``stratified_sample``: exactly ``n`` rows per stratum, the FIRST n by
  a deterministic order — a thin wrapper over
  ``stages.setops.grouped_top_k`` (ascending), so it inherits the
  per-block-partial + one-small-exchange scale shape.

Both are stateless ``map_batches``/keyed-exchange plans — nothing
driver-side.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.sketch import _hash_column, _mix64

_TWO64 = float(2 ** 64)


def hash_sample(ds: ray.data.Dataset, key_col: str, fraction: float,
                seed: int = 0) -> ray.data.Dataset:
    """Keep rows whose key hashes below ``fraction`` of the 64-bit hash
    space (expected ``fraction`` of KEYS, hence of rows when keys are
    unique). Deterministic, seed-salted, entity-consistent."""
    assert 0.0 <= fraction <= 1.0
    threshold = np.uint64(int(fraction * _TWO64)) if fraction < 1.0 \
        else np.uint64(2 ** 64 - 1)
    salt = np.uint64(seed * 0x9E3779B97F4A7C15 & (2 ** 64 - 1))

    def keep(batch: pa.Table) -> pa.Table:
        h = _mix64(_hash_column(batch[key_col]) ^ salt)
        if fraction >= 1.0:
            return batch
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def stratified_sample(ds: ray.data.Dataset, strata_cols: List[str],
                      n_per_stratum: int,
                      order_cols: List[str]) -> ray.data.Dataset:
    """The first ``n_per_stratum`` rows of each stratum by
    ``order_cols`` ascending (SQL ``row_number() OVER (PARTITION BY
    strata ORDER BY order) <= n``). ``order_cols`` must totally order
    rows within a stratum for a deterministic sample."""
    from .setops import grouped_top_k
    return grouped_top_k(ds, list(strata_cols), list(order_cols),
                         n_per_stratum, descending=False)


def hash_stratified_sample(ds, strata_cols: List[str], id_col: str,
                           k: int, rank_col: str = "__md5_rank__"):
    """Deterministic k-per-stratum sample with NO natural order column:
    rank rows inside each stratum by the md5 hex digest of their id (a
    reproducible uniform draw — same anchor as train_val_test_split,
    recomputable by any engine) and keep the k smallest. One vectorized
    rank pass + the grouped_top_k selection exchange; no RNG state, no
    global sort, stable under repartitioning."""
    import hashlib

    import pyarrow as pa

    from .setops import grouped_top_k

    def rank(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(str(v).encode()).hexdigest()
                   for v in batch[id_col].to_pylist()]
        return batch.append_column(rank_col, pa.array(digests, pa.string()))

    ranked = ds.map_batches(rank, batch_format="pyarrow", batch_size=None)
    picked = grouped_top_k(ranked, list(strata_cols), [rank_col, id_col],
                           k, descending=False)
    return picked.drop_columns([rank_col])


def weighted_source_sample(ds, rates: dict, source_col: str = "source",
                           id_col: str = "doc_id",
                           default_rate: float = 1.0):
    """Deterministic source/domain rebalancing — the corpus-mixture
    primitive (downsample over-represented domains, keep the rest):
    each row is kept iff its md5-anchored uniform draw (same anchor as
    :func:`train_val_test_split` — reproducible by ANY engine) is below
    its source's rate. Stateless per-batch filter, no shuffle, no RNG
    state; re-runs and repartitions keep exactly the same rows. Sources
    absent from ``rates`` use ``default_rate``."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        u = np.array([int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                      for v in ids], dtype=np.float64) / 4294967296.0
        srcs = batch[source_col].to_pylist()
        r = np.array([rates.get(s, default_rate) for s in srcs],
                     dtype=np.float64)
        return batch.filter(pa.array(u < r))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def train_val_test_split(ds, id_col: str = "doc_id",
                         weights=(0.8, 0.1, 0.1),
                         names=("train", "val", "test"),
                         target: str = "split"):
    """Deterministic hash-based dataset split — the standard
    train/val/test assignment for corpus curation: stable across runs,
    machines and languages (md5 of the stringified id, first 8 hex chars
    as a uniform draw in [0,1)), disjoint and exhaustive by construction,
    and requiring no shuffle or global state. The md5 anchor makes the
    assignment reproducible by ANY system (SQL, Spark, pandas) — unlike
    process-seeded RNGs or engine-private hashes."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    cum = np.cumsum(weights) / float(sum(weights))
    labels = list(names)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out = []
        for v in ids:
            u = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) \
                / 4294967296.0
            out.append(labels[int(np.searchsorted(cum, u, side="right"))])
        return batch.append_column(target, pa.array(out, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
