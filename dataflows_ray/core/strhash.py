"""Process-stable vectorized string hashing over Arrow buffers.

Python's ``hash()`` is salted per process (useless for cross-worker
bucketing) and per-row ``hashlib`` calls were the round-1 hot spot of the
MinHash kernel. This kernel hashes EVERY string of an Arrow array in a
handful of numpy passes over the array's value/offset buffers:

    h(s) = sum(byte[i] * FNV_PRIME**i) mod 2**64

(polynomial accumulation with natural uint64 wraparound — a bucketing /
fingerprint hash, not a cryptographic one).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_PRIME = np.uint64(1099511628211)

# position weights FNV_PRIME**i mod 2**64, up to 256-byte strings (longer
# strings reuse the last weight — fine for bucketing)
_POW = np.empty(256, dtype=np.uint64)
_POW[0] = 1
with np.errstate(over="ignore"):
    for _i in range(1, 256):
        _POW[_i] = _POW[_i - 1] * FNV_PRIME


def hash_string_array(keys) -> np.ndarray:
    """uint64 hash per element of a pyarrow string array (zero-copy over
    the Arrow buffers, no Python per row). Null and empty strings hash
    to 0."""
    if isinstance(keys, pa.ChunkedArray):
        if keys.num_chunks == 1:
            keys = keys.chunk(0)
        else:
            keys = keys.combine_chunks()
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype, off_w = ((np.int64, 8) if pa.types.is_large_string(keys.type)
                        else (np.int32, 4))
    offsets = np.frombuffer(keys.buffers()[1], dtype=off_dtype,
                            count=n + 1, offset=keys.offset * off_w)
    values = np.frombuffer(keys.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    span = values[offsets[0]:offsets[-1]].astype(np.uint64)
    if len(span) == 0:
        return np.zeros(n, dtype=np.uint64)
    # position of each byte within its own string, capped at 255
    rel_starts = starts - starts[0]
    pos = np.arange(len(span), dtype=np.int64) - np.repeat(rel_starts, lengths)
    np.minimum(pos, 255, out=pos)
    with np.errstate(over="ignore"):
        contrib = span * _POW[pos]
        # reduceat over an empty segment returns the element AT the index;
        # zero-length strings are masked to 0 below
        idx = np.minimum(rel_starts, len(span) - 1)
        sums = np.add.reduceat(contrib, idx)
    sums = np.where(lengths > 0, sums, np.uint64(0))
    return sums.astype(np.uint64)


_FULL_POW_CACHE: dict = {}  # prime -> growing uint64 weight table


def _full_weights(prime: int, n: int) -> np.ndarray:
    """P**i mod 2**64 for i in [0, n) — grown on demand, cached per prime."""
    arr = _FULL_POW_CACHE.get(prime)
    if arr is None or len(arr) < n:
        m = max(n, 1024)
        out = np.empty(m, dtype=np.uint64)
        out[0] = 1
        with np.errstate(over="ignore"):
            np.multiply.accumulate(
                np.full(m - 1, prime, dtype=np.uint64), out=out[1:])
        _FULL_POW_CACHE[prime] = arr = out
    return arr


def content_hash_array(keys, prime: int = int(FNV_PRIME)) -> np.ndarray:
    """Full-length polynomial content hash per element of a pyarrow string
    array: ``h(s) = len(s)*P**len(s) + sum(byte[i] * P**i) mod 2**64``.

    Unlike ``hash_string_array`` (bucketing hash, position weights capped
    at 255), every byte position gets a distinct weight — suitable as an
    exact-dedup content fingerprint (pair two primes for 128 bits).
    Vectorized over the Arrow buffers; nulls and empty strings hash to 0.
    """
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks() if keys.num_chunks != 1 else keys.chunk(0)
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype, off_w = ((np.int64, 8) if pa.types.is_large_string(keys.type)
                        else (np.int32, 4))
    offsets = np.frombuffer(keys.buffers()[1], dtype=off_dtype,
                            count=n + 1, offset=keys.offset * off_w)
    values = np.frombuffer(keys.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    span = values[offsets[0]:offsets[-1]].astype(np.uint64)
    if len(span) == 0:
        return np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    pow_tab = _full_weights(prime, maxlen + 1)
    rel_starts = starts - starts[0]
    pos = np.arange(len(span), dtype=np.int64) - np.repeat(rel_starts, lengths)
    with np.errstate(over="ignore"):
        contrib = span * pow_tab[pos]
        idx = np.minimum(rel_starts, len(span) - 1)
        sums = np.add.reduceat(contrib, idx)
        # mix the length in with its own weight so prefix-sums can't alias
        sums = sums + lengths.astype(np.uint64) * pow_tab[
            np.minimum(lengths, maxlen)]
    return np.where(lengths > 0, sums, np.uint64(0)).astype(np.uint64)


def combine_hash_cols(*cols: np.ndarray) -> np.ndarray:
    """Order-dependent combination of uint64 hash columns into one."""
    out = np.zeros_like(cols[0])
    with np.errstate(over="ignore"):
        for c in cols:
            out = out * FNV_PRIME + c.astype(np.uint64)
    return out
