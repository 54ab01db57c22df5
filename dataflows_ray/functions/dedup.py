"""Deduplication family for large-scale corpora: exact, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

Engine-defined (no reference equivalent); published algorithms:
Broder 1997 (MinHash), Indyk & Motwani 1998 (LSH), Charikar 2002
(SimHash), standard shingle Jaccard.

Scale design:
- exact: content-hash column (vectorized) -> ``groupby(hash)`` keep
  min(doc_id) — one shuffle of (hash, id), not of documents.
- MinHash LSH: per-batch numpy signature computation -> explode to
  (band, band_hash, doc_id) rows -> ``groupby(band, band_hash)`` ->
  candidate pairs per bucket -> exact-Jaccard verify on the pair set.
  Each stage is a Dataset op; nothing materializes on the driver except
  the (small) verified pair list.
- SimHash: 64-bit signatures per batch; near-dup candidates = equal
  16-bit bands (4 bands -> Hamming distance <= 3 guaranteed candidates).
- embedding cosine: delegated to ``functions/similarity.py`` brute-force
  / LSH-bucketed top-k, thresholded.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    """Process-stable 64-bit string hash (Python's ``hash`` is randomized
    per process — useless for cross-worker bucketing)."""
    import hashlib
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "little") & 0x7FFFFFFFFFFFFFFF


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingles hashed to uint64 (vocabulary-free)."""
    words = re.findall(r"\w+", (text or "").lower())
    if len(words) < k:
        return np.array([_stable_hash64(" ".join(words))], dtype=np.uint64)
    out = np.empty(len(words) - k + 1, dtype=np.uint64)
    for i in range(len(words) - k + 1):
        out[i] = _stable_hash64(" ".join(words[i:i + k]))
    return out


class MinHasher:
    """Actor-pool stage: text -> MinHash signature -> LSH band hashes.

    Permutation coefficients are generated ONCE per actor in ``__init__``
    from a fixed seed (identical across actors — required for bucketing
    to work across partitions).
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, k: int = 5,
                 seed: int = 1337):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k).astype(np.uint64)
        # (num_perm, n_shingles) universal hashing, min over shingles
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (band, band_hash, doc_id) rows — the LSH explode."""
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                import zlib
                h = zlib.crc32(chunk.tobytes())  # stable across processes
                out_band.append(band)
                out_hash.append(h)
                out_id.append(doc_id)
        return pa.table({
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
            "doc_id": pa.array(out_id, type=pa.int64()),
        })


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the min-id row per distinct text content. Shuffles only
    (content_hash, id) after a vectorized hash stage."""
    import pyarrow.compute as pc

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib
        hashes = [hashlib.sha1((t or "").encode()).hexdigest()
                  for t in batch[text_col].to_pylist()]
        return batch.append_column("__content_hash__", pa.array(hashes))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    return hashed.groupby("__content_hash__").map_groups(
        keep_min, batch_format="pandas").drop_columns(["__content_hash__"])


def minhash_lsh_candidates(ds: ray.data.Dataset, num_perm: int = 128,
                           bands: int = 32, k: int = 5,
                           concurrency: int = 4) -> ray.data.Dataset:
    """Candidate near-dup pairs (doc_a < doc_b) via MinHash LSH banding."""
    exploded = ds.map_batches(
        MinHasher, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow", batch_size=None, concurrency=concurrency)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"]))
        if len(ids) < 2 or len(ids) > 200:  # skip degenerate mega-buckets
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return exploded.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")


def verify_jaccard(pairs_df: pd.DataFrame, texts: Dict[int, str],
                   k: int = 5, threshold: float = 0.7) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (driver-side
    or inside map_batches with a broadcast text lookup for small corpora)."""
    keep_a, keep_b, sims = [], [], []
    seen = set()
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        if (a, b) in seen:
            continue
        seen.add((a, b))
        sa = set(_shingles(texts.get(a, ""), k).tolist())
        sb = set(_shingles(texts.get(b, ""), k).tolist())
        union = len(sa | sb)
        sim = len(sa & sb) / union if union else 0.0
        if sim >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            sims.append(round(sim, 4))
    return pd.DataFrame({"doc_a": keep_a, "doc_b": keep_b, "jaccard": sims})


def minhash_dedup(ds: ray.data.Dataset, threshold: float = 0.7,
                  num_perm: int = 128, bands: int = 32, k: int = 5
                  ) -> Tuple[ray.data.Dataset, pd.DataFrame]:
    """Full near-dup pipeline: LSH candidates -> Jaccard verify -> drop the
    higher-id member of each verified pair. Returns (deduped_ds, pairs).

    The verify step broadcasts the candidate docs' texts only (not the
    corpus). Driver holds only ids + verified pairs (small by design).
    """
    cand = minhash_lsh_candidates(ds, num_perm=num_perm, bands=bands, k=k)
    cand_df = cand.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    if cand_df.empty:
        return ds, pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    need_ids = set(cand_df["doc_a"]) | set(cand_df["doc_b"])
    texts = {}
    # fetch candidate texts with a filtered scan (pushes the id filter down)
    id_list = pa.array(sorted(need_ids))

    def grab(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch["doc_id"], value_set=id_list)
        return batch.filter(mask).select(["doc_id", "text"])

    for row in ds.map_batches(grab, batch_format="pyarrow").take_all():
        texts[row["doc_id"]] = row["text"]
    verified = verify_jaccard(cand_df, texts, k=k, threshold=threshold)
    drop_ids = set(verified["doc_b"])  # keep lower id of each pair

    def drop(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.invert(pc.is_in(batch["doc_id"],
                                  value_set=pa.array(sorted(drop_ids))))
        return batch.filter(mask)

    return (ds.map_batches(drop, batch_format="pyarrow") if drop_ids else ds,
            verified)


class SimHasher:
    """64-bit SimHash signatures (Charikar 2002) + band columns for
    candidate bucketing (4 x 16-bit bands)."""

    def __init__(self, k: int = 3, seed: int = 7):
        self.k = k

    def simhash(self, text: str) -> int:
        sh = _shingles(text, self.k)
        if len(sh) == 0:
            return 0
        bits = np.unpackbits(sh.view(np.uint8).reshape(len(sh), 8), axis=1,
                             bitorder="little")[:, :64]
        sums = bits.sum(axis=0)
        return int(sum(1 << i for i in range(64) if sums[i] * 2 > len(sh)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.simhash(t or "") for t in batch["text"].to_pylist()]
        batch = batch.append_column("simhash", pa.array(sigs, type=pa.uint64()))
        for band in range(4):
            vals = [(s >> (band * 16)) & 0xFFFF for s in sigs]
            batch = batch.append_column(f"simhash_b{band}",
                                        pa.array(vals, type=pa.int32()))
        return batch


def simhash_signatures(ds: ray.data.Dataset, concurrency: int = 4
                       ) -> ray.data.Dataset:
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          batch_size=None, concurrency=concurrency)
