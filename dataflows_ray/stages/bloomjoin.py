"""Bloom-filter-accelerated semi-join.

Engine-defined scale primitive (no reference equivalent — the reference's
``join.py`` materializes the whole key set in a KVFile). At 100 TB the
exact ``semi_join_ids`` path either broadcasts the full id set or
hash-shuffles BOTH sides; a Bloom filter built from the small side is a
few MB regardless of key count, so the big side can be pre-filtered
in place — rows that fail the filter never enter the (exact) verify
join, cutting the shuffle volume by the selectivity of the join. The
result is still EXACT: the Bloom pass only removes definite non-members
(no false negatives by construction), and an exact semi-join over the
survivors removes the false positives.

Build shape: one partial filter per block (``map_batches`` emitting the
filter's set bit indices), OR-merged into the final bit array (bounded:
``num_bits/8`` bytes however many rows the small side has), shipped once
via ``ray.put`` and probed with vectorized double hashing
(Kirsch-Mitzenmacher 2006: h_i = h1 + i*h2) inside every filter task.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..core.strhash import hash_string_array

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hash_column(col) -> np.ndarray:
    """Two independent uint64 hash streams per key (splitmix64 finalizer
    over int keys, or the repo's string hash), vectorized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = hash_string_array(col)
    else:
        h = np.asarray(col.cast(pa.int64()), dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        z = h + _GOLD
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        z2 = h1 + _GOLD
        z2 = (z2 ^ (z2 >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z2 = (z2 ^ (z2 >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = (z2 ^ (z2 >> np.uint64(31))) | np.uint64(1)  # odd => full cycle
    return np.stack([h1, h2])


def _bit_positions(h: np.ndarray, k: int, num_bits: int) -> np.ndarray:
    """(k, n) bit indices via double hashing."""
    h1, h2 = h
    with np.errstate(over="ignore"):
        return np.stack([(h1 + np.uint64(i) * h2) % np.uint64(num_bits)
                         for i in range(k)])


def build_bloom(small: ray.data.Dataset, key: str,
                num_bits: int = 1 << 23, k: int = 4) -> np.ndarray:
    """Distributed Bloom build: each block contributes its set-bit
    indices; the driver ORs them into one uint8 bit array (num_bits/8
    bytes — a few MB — independent of the small side's row count)."""

    def partial(batch: pa.Table) -> pa.Table:
        pos = _bit_positions(_hash_column(batch[key]),
                             k, num_bits)
        uniq = np.unique(pos.ravel()).astype(np.uint64)
        return pa.table({"bits": pa.array([uniq.tobytes()],
                                          type=pa.large_binary())})

    def or_merge(batch: pa.Table) -> pa.Table:
        """Combine a partition's partials into ONE dense bit array, so
        the driver merges at most num_partitions arrays — not one per
        block (at 100-TB block counts a flat driver merge would move
        blocks x num_bits/8 bytes through the driver)."""
        acc = np.zeros(num_bits >> 3, dtype=np.uint8)
        for raw in batch["bits"].to_pylist():
            idx = np.frombuffer(raw, dtype=np.uint64)
            np.bitwise_or.at(acc, (idx >> np.uint64(3)).astype(np.int64),
                             (1 << (idx & np.uint64(7))).astype(np.uint8))
        return pa.table({"dense": pa.array([acc.tobytes()],
                                           type=pa.large_binary())})

    partials = (small.select_columns([key])
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=None))
    reduced = partials.repartition(8).map_batches(
        or_merge, batch_format="pyarrow", batch_size=None)
    filt = np.zeros(num_bits >> 3, dtype=np.uint8)
    for b in reduced.iter_batches(batch_format="pyarrow", batch_size=None):
        for raw in b["dense"].to_pylist():
            filt |= np.frombuffer(raw, dtype=np.uint8)
    return filt


def bloom_probe(ds: ray.data.Dataset, filt_ref, key: str,
                num_bits: int, k: int = 4) -> ray.data.Dataset:
    """Drop every row whose key definitely isn't in the filter (rows kept
    may still be false positives — follow with an exact verify)."""

    def probe(batch: pa.Table) -> pa.Table:
        filt = ray.get(filt_ref) if isinstance(
            filt_ref, ray.ObjectRef) else filt_ref
        pos = _bit_positions(_hash_column(batch[key]),
                             k, num_bits)
        hit = np.ones(len(batch), dtype=bool)
        for i in range(k):
            byte = filt[(pos[i] >> np.uint64(3)).astype(np.int64)]
            hit &= (((byte >> (pos[i] & np.uint64(7)).astype(np.uint8)) &
                     np.uint8(1)) == 1)
        return batch.filter(pa.array(hit))

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


def bloom_semi_join(big: ray.data.Dataset, small: ray.data.Dataset,
                    big_key: str, small_key: Optional[str] = None,
                    num_bits: int = 1 << 23, k: int = 4,
                    exact: bool = True) -> ray.data.Dataset:
    """Exact semi-join of ``big`` against ``small``'s key set with a Bloom
    pre-filter: build (distributed) -> broadcast once (``ray.put``) ->
    probe per batch -> exact verify of the survivors only.

    ``exact=False`` skips the verify join (accepting the filter's false
    positive rate ~ (1-e^{-kn/m})^k) — the approximate mode is for
    pre-filters feeding a later exact stage."""
    from .agg import grouped_aggregate
    from .semijoin import semi_join_ids

    small_key = small_key or big_key
    filt_ref = ray.put(build_bloom(small, small_key,
                                   num_bits=num_bits, k=k))
    survivors = bloom_probe(big, filt_ref, big_key, num_bits, k=k)
    if not exact:
        return survivors
    keys = grouped_aggregate(small.select_columns([small_key]),
                             [small_key], [])
    return semi_join_ids(survivors, keys, big_key, id_col=small_key)
