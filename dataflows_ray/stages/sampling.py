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

import hashlib
from typing import List, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.sketch import _hash_column, _mix64

_TWO64 = float(2 ** 64)


def _md5_strings(column) -> List[str]:
    """Stringified column values for the md5 anchor, via one vectorized
    Arrow cast (identical to per-row ``str(v)`` for int/string ids; nulls
    map to ``"None"`` for parity with the historical ``str(None)``).

    The ``md5(str(v))`` reproducibility contract only holds where the
    Arrow string cast equals Python ``str()`` — integer and string ids.
    For other types the two diverge silently (bool casts to ``"true"``
    but ``str(True)`` is ``"True"``; timestamps/decimals have their own
    formats), so anything else is REJECTED loudly rather than quietly
    sampling differently from the documented anchor."""
    t = column.type
    if not (pa.types.is_integer(t) or pa.types.is_string(t)
            or pa.types.is_large_string(t)):
        raise TypeError(
            f"md5-anchored sampling requires an integer or string id "
            f"column (Arrow cast == str(v) only there); got {t}")
    casted = pc.fill_null(pc.cast(column, pa.string()), "None")
    return casted.to_pylist()


def _md5_u01(column) -> np.ndarray:
    """Uniform draws in [0,1) from the md5 anchor: first 4 digest bytes
    big-endian / 2^32 — bit-identical to
    ``int(md5(str(v)).hexdigest()[:8], 16) / 2**32`` and to the DuckDB
    oracle's hex arithmetic. md5 itself is inherently per-value (one
    CPython→OpenSSL call per id — ~0.4 µs/row, parallel across tasks);
    everything around it (stringify, hex→int, divide) is vectorized:
    digests are joined into one buffer and decoded with a single
    ``np.frombuffer`` big-endian uint32 view."""
    md5 = hashlib.md5
    buf = b"".join(md5(s.encode()).digest()[:4] for s in _md5_strings(column))
    if not buf:
        return np.empty(0, dtype=np.float64)
    return np.frombuffer(buf, dtype=">u4").astype(np.float64) / 4294967296.0


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
    global sort, stable under repartitioning. Cost note: the md5 digest
    is the one per-value step (a single C call per id); stringify and
    column assembly are vectorized via :func:`_md5_strings`."""
    from .setops import grouped_top_k

    def rank(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        digests = [md5(s.encode()).hexdigest()
                   for s in _md5_strings(batch[id_col])]
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
    absent from ``rates`` use ``default_rate``. Vectorized: draws via
    :func:`_md5_u01` (md5 is the one per-value C call); the rate lookup
    dictionary-encodes the source column so ``rates`` is consulted once
    per DISTINCT source, then a numpy take fans it out per row."""
    def fn(batch: pa.Table) -> pa.Table:
        u = _md5_u01(batch[id_col])
        enc = pc.dictionary_encode(batch[source_col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        by_code = np.array(
            [rates.get(s, default_rate) for s in enc.dictionary.to_pylist()],
            dtype=np.float64)
        idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
        null_idx = idx < 0  # null sources fill to -1
        if len(by_code) == 0:  # every source in the batch is null
            r = np.full(len(idx), rates.get(None, default_rate))
        else:
            r = by_code[np.where(null_idx, 0, idx)]
            r[null_idx] = rates.get(None, default_rate)
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
    process-seeded RNGs or engine-private hashes. Vectorized: draws via
    :func:`_md5_u01`, then one ``np.searchsorted`` over the cumulative
    weights and a label take — no per-row Python beyond the md5 call."""
    cum = np.cumsum(weights) / float(sum(weights))
    label_arr = np.array(list(names), dtype=object)

    def fn(batch: pa.Table) -> pa.Table:
        u = _md5_u01(batch[id_col])
        out = label_arr[np.searchsorted(cum, u, side="right")]
        return batch.append_column(target, pa.array(out, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
