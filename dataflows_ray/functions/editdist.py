"""Batched Levenshtein edit distance over Arrow string columns.

Engine-defined operator for transcript / OCR quality pipelines: edit
distance between two text columns (e.g. an ASR transcript vs a reference
transcript) is the standard WER-style signal for filtering mislabeled
audio pairs. No reference-equivalent (datahq/dataflows has no string
metrics); semantics follow the classic Wagner-Fischer DP, identical to
DuckDB's ``levenshtein`` (unit cost insert / delete / substitute).

Scale shape: the DP is inherently O(len_a * len_b) per pair, so the
kernel vectorizes across ONE string's DP row at a time with numpy
(per-pair work is numpy minimum-scans, not a Python double loop) and the
stage is an ordinary stateless ``map_batches`` — embarrassingly parallel
across blocks, no shuffle. Cap input lengths upstream (``max_len``) the
way every production WER job does.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data


def levenshtein_pair(a: str, b: str) -> int:
    """Edit distance between two strings — one numpy DP row per char of
    ``a``; the substitution/insert/delete minimum is vectorized, with the
    (inherently serial) prefix dependency handled by a running minimum
    scan over candidate values (Hyyro-style simplification)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(bv) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"),
                                         dtype=np.uint32)):
        # candidates independent of the serial scan
        cur[0] = i + 1
        sub = prev[:-1] + (bv != ca)          # substitution / match
        dele = prev[1:] + 1                   # deletion from a
        best = np.minimum(sub, dele)
        # insertion chain: cur[j] = min(best[j-1], cur[j-1] + 1) — a
        # prefix-min with +1 per step; numpy.minimum.accumulate over
        # (best - j) gives exactly that running minimum
        j = np.arange(1, len(bv) + 1, dtype=np.int64)
        shifted = np.minimum.accumulate(best - j)
        cur[1:] = np.minimum(best, shifted + j)
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance(ds: ray.data.Dataset, col_a: str, col_b: str,
                  target: str = "edit_dist",
                  max_len: Optional[int] = None) -> ray.data.Dataset:
    """Append ``levenshtein(col_a, col_b)`` per row (optionally truncating
    both sides to ``max_len`` chars first — do this for unbounded text)."""

    def fn(batch: pa.Table) -> pa.Table:
        av = batch[col_a].to_pylist()
        bv = batch[col_b].to_pylist()
        out = np.empty(len(av), dtype=np.int64)
        for i, (a, b) in enumerate(zip(av, bv)):
            a = (a or "")[:max_len] if max_len else (a or "")
            b = (b or "")[:max_len] if max_len else (b or "")
            out[i] = levenshtein_pair(a, b)
        return batch.append_column(target, pa.array(out, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
