"""Similarity search over an embedding column (``list<float>``).

Engine-defined (no reference equivalent). Two paths:

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  ONCE (``ray.put``) and each batch does one numpy matmul against it —
  the 100-TB-correct shape for small query sets (queries ship once, data
  never moves).
- ``lsh_topk``: random-hyperplane LSH bucketing (Charikar 2002): both
  corpus and queries get a b-bit signature; candidates are corpus rows
  whose bucket matches a query's bucket (or a 1-bit neighbor); exact
  cosine re-rank on candidates only. The scale path when queries are many
  or the corpus is huge: bucketing is a groupby, not an all-pairs scan.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # FixedSizeList / List of floats -> (n, d) float32, zero-copy-ish
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float32)


class _TopKScorer:
    """Actor-pool stage: per batch, cosine scores vs the broadcast query
    matrix; emits per-batch partial top-k (query_id, vec_id, score) rows."""

    def __init__(self, query_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(query_ref)
        self.qm = _normalize(np.asarray(q["matrix"], dtype=np.float32))
        self.query_ids = list(q["ids"])
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col)).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = m @ self.qm.T.astype(np.float64)  # (n, q) in float64
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            col = scores[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            for i in top:
                out_q.append(qid)
                out_id.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table({
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float32()),
        })


@functools.lru_cache(maxsize=32)
def _cached_scorer(query_ref, k: int, vec_col: str, id_col: str) -> _TopKScorer:
    return _TopKScorer(query_ref, k, vec_col, id_col)


def brute_force_topk(ds: ray.data.Dataset, queries: np.ndarray,
                     query_ids: List, k: int = 10, vec_col: str = "embedding",
                     id_col: str = "vec_id", concurrency: int = None
                     ) -> ray.data.Dataset:
    """Exact cosine top-k per query. Partial top-k per batch (stateless
    tasks, per-process cached scorer — queries ship once via the object
    store), merged per query by one vectorized pass through
    ``keyed_merge`` (k*n_batches rows move, not n)."""
    from ..stages.agg import keyed_merge

    ref = ray.put({"matrix": np.asarray(queries), "ids": list(query_ids)})

    def score(batch: pa.Table) -> pa.Table:
        return _cached_scorer(ref, k, vec_col, id_col)(batch)

    if concurrency is not None:  # pinned actor pool on request
        partial = ds.map_batches(
            _TopKScorer, fn_constructor_args=(ref, k, vec_col, id_col),
            batch_format="pyarrow", batch_size=None, concurrency=concurrency)
    else:
        partial = ds.map_batches(score, batch_format="pyarrow",
                                 batch_size=None)

    def merge(df: pd.DataFrame) -> pa.Table:
        # deterministic tie-break: score desc, then vec_id asc; one sort +
        # per-query head(k) via groupby.cumcount (vectorized)
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True], kind="stable")
        rank = df.groupby("query_id", sort=False).cumcount()
        out = df[rank < k].reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    return keyed_merge(partial, ["query_id"], merge)


@functools.lru_cache(maxsize=32)
def _cached_hasher(dim: int, bits: int, seed: int) -> "_HyperplaneHasher":
    return _HyperplaneHasher(dim, bits, seed)


class _HyperplaneHasher:
    """Shared random hyperplanes (fixed seed -> identical across actors)."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 99):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((dim, bits)).astype(np.float32)
        self.bits = bits

    def bucket(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) > 0
        weights = (1 << np.arange(self.bits, dtype=np.int64))
        return signs.astype(np.int64) @ weights


def lsh_bucket_column(ds: ray.data.Dataset, dim: int, bits: int = 12,
                      vec_col: str = "embedding", seed: int = 99
                      ) -> ray.data.Dataset:
    """Add an LSH bucket id column to the corpus (the IVF/LSH scale path)."""

    def bucketer(batch: pa.Table) -> pa.Table:
        h = _cached_hasher(dim, bits, seed)  # built once per process
        m = _normalize(_batch_matrix(batch, vec_col))
        return batch.append_column("lsh_bucket", pa.array(h.bucket(m)))

    return ds.map_batches(bucketer, batch_format="pyarrow", batch_size=None)


def lsh_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: List,
             k: int = 10, bits: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 99) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: scan only buckets matching a query
    bucket or differing in one bit (multi-probe)."""
    qm = _normalize(np.asarray(queries, dtype=np.float32))
    dim = qm.shape[1]
    hasher = _HyperplaneHasher(dim, bits, seed)
    qbuckets = hasher.bucket(qm)
    probe: set = set()
    for b in qbuckets:
        probe.add(int(b))
        for bit in range(bits):
            probe.add(int(b) ^ (1 << bit))
    bucketed = lsh_bucket_column(ds, dim, bits, vec_col, seed)
    probe_arr = pa.array(sorted(probe), type=pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["lsh_bucket"], value_set=probe_arr))

    candidates = bucketed.map_batches(keep, batch_format="pyarrow")
    topk = brute_force_topk(candidates, qm, query_ids, k=k,
                            vec_col=vec_col, id_col=id_col)
    return topk.to_pandas()


def cosine_neardup_pairs(ds: ray.data.Dataset, threshold: float = 0.9,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         corpus_limit: int = 2_000_000,
                         bucketed: Optional[bool] = None,
                         bands: int = 32, bits: int = 12,
                         seed: int = 99,
                         row_count_hint: Optional[int] = None
                         ) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine >= threshold).

    Routing (``bucketed=None``, the default): while the corpus fits
    ``corpus_limit`` rows, the EXACT all-pairs path runs — the normalized
    corpus matrix is broadcast once (``ray.put``) and every batch does one
    matmul against it, so the corpus streams through map_batches and only
    pairs move. Past the limit the call auto-routes to the LSH-bucketed
    path (``cosine_lsh_candidates`` + ``cosine_verify_pairs``): band
    signatures explode ids only, pairs are generated per bucket, and the
    exact-cosine verify is two distributed hash joins — nothing is ever
    broadcast or materialized on the driver. The bucketed path's verify
    is exact; its RECALL is probabilistic (>=1 band must collide —
    ~0.996 at cosine 0.9 with the default 32x12 bands). Pass
    ``bucketed=True/False`` to force a path, or ``row_count_hint`` (e.g.
    parquet metadata num_rows) to route without any probe.

    Auto-routing never runs a counting pass: with no hint it starts the
    broadcast collect and BAILS OUT to the bucketed path the moment the
    stream exceeds ``corpus_limit`` (dropping the iterator cancels the
    rest of the streaming execution) — so the small case executes the
    upstream exactly once, and the large case pays one partial scan of
    ~``corpus_limit`` rows instead of a full ``count()``."""
    if bucketed is None and row_count_hint is not None:
        bucketed = row_count_hint > corpus_limit
    rows = []
    ids = []
    n_seen = 0
    if not bucketed:  # False or None: try the broadcast collect
        it = ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=None)
        for b in it:
            rows.append(_batch_matrix(b, vec_col))
            ids.append(b[id_col].to_numpy(zero_copy_only=False))
            n_seen += len(b)
            if n_seen > corpus_limit:
                if bucketed is False:
                    raise NotImplementedError(
                        "corpus exceeds broadcast limit; use bucketed=True")
                del it  # cancel the rest of the streaming execution
                rows, ids = [], []
                bucketed = True
                break
        else:
            bucketed = False
    if bucketed:
        cand = cosine_lsh_candidates(ds, bands=bands, bits=bits,
                                     vec_col=vec_col, id_col=id_col,
                                     seed=seed)
        return cosine_verify_pairs(ds, cand, threshold=threshold,
                                   vec_col=vec_col, id_col=id_col)
    if not rows:  # empty corpus: no pairs, typed schema
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    corpus = _normalize(np.vstack(rows)).astype(np.float64)
    corpus_ids = np.concatenate(ids)
    ref = ray.put({"m": corpus, "ids": corpus_ids})

    def pairs(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)  # zero-copy shared-memory read
        m = _normalize(_batch_matrix(batch, vec_col)).astype(np.float64)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        scores = m @ c["m"].T  # (batch, corpus)
        hit_b, hit_c = np.nonzero(scores >= threshold)
        a = bids[hit_b]
        bb = c["ids"][hit_c]
        keep = a < bb
        return pa.table({
            "id_a": pa.array(a[keep], type=pa.int64()),
            "id_b": pa.array(bb[keep], type=pa.int64()),
            "cosine": pa.array(np.round(scores[hit_b, hit_c][keep], 4)),
        })

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# LSH-bucketed cosine near-dup: the scale path past the broadcast limit.
# Shape mirrors the MinHash-LSH near-dedup family in functions/dedup.py:
# band-signature explode moves (band, bucket, id) rows ONLY; pairs are
# generated inside each (band, bucket) group with the shared mega-bucket
# salting; verify is exact cosine via two distributed hash joins over
# packed unit vectors — zero driver materialization at any stage.
# ---------------------------------------------------------------------------

def cosine_lsh_candidates(ds: ray.data.Dataset, bands: int = 32,
                          bits: int = 12, vec_col: str = "embedding",
                          id_col: str = "vec_id", seed: int = 99
                          ) -> ray.data.Dataset:
    """Candidate near-dup id pairs (id_a < id_b) via random-hyperplane
    LSH banding (Charikar 2002). Each row gets ``bands`` independent
    ``bits``-bit sign signatures; two rows are candidates when >=1 band
    bucket matches. P(collide per band) = (1 - theta/pi)^bits, so at
    cosine 0.9 the 32x12 default gives ~0.996 recall while random pairs
    (cos~0 -> 0.5^bits per band) stay apart. Only (band, bucket, id)
    rows move — vectors never leave their blocks."""
    from ..stages.agg import keyed_merge
    from .dedup import MEGA_BUCKET_LIMIT, _emit_bucket_pairs, _log

    total_bits = bands * bits

    def explode(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        h = _cached_hasher(m.shape[1], total_bits, seed)  # once per process
        signs = (m @ h.planes) > 0                        # (n, bands*bits)
        codes = signs.reshape(len(m), bands, bits).astype(np.int64) \
            @ (1 << np.arange(bits, dtype=np.int64))      # (n, bands)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        band_idx = np.tile(np.arange(bands, dtype=np.int32), len(m))
        return pa.table({
            "band": pa.array(band_idx),
            "bucket": pa.array(codes.reshape(-1)),
            id_col: pa.array(np.repeat(ids, bands), type=pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              batch_size=None)

    def pairs_block(df: pd.DataFrame) -> pa.Table:
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        mega = 0
        for key, idx in df.groupby(["band", "bucket"],
                                   sort=False).indices.items():
            ids = np.unique(df[id_col].to_numpy()[idx])
            mega += _emit_bucket_pairs(ids, out_a, out_b,
                                       bucket_salt=int(key[1]) ^ int(key[0]))
        if mega:
            _log.warning(
                "cosine LSH: %d mega-bucket(s) (>%d ids) in this block "
                "were salted-rebucketed instead of all-paired", mega,
                MEGA_BUCKET_LIMIT)
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        return pa.table({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b)})

    return keyed_merge(exploded, ["band", "bucket"], pairs_block)


def _packed_unit_vectors(batch: pa.Table, vec_col: str, id_col: str,
                         suffix: str = "") -> pa.Table:
    """(id, __vec__ large_binary) — L2-normalized vectors packed as
    fixed-width float64 byte payloads (Acero hash joins carry binary
    payloads; list payloads they reject). Normalization is float32 then
    float64 — the SAME ladder as the exact broadcast path, so verified
    cosines match it bit-for-bit."""
    m = _normalize(_batch_matrix(batch, vec_col)).astype(np.float64)
    n, d = m.shape
    byte_offs = np.arange(n + 1, dtype=np.int64) * (d * 8)
    col = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(byte_offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(m).tobytes())])
    return pa.table({id_col + suffix: batch[id_col],
                     "__vec%s__" % suffix: col})


def _binary_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """Zero-copy (n, d) float64 view of a fixed-width large_binary
    column (every value the same length — guaranteed by the packer)."""
    arr = col.combine_chunks()
    n = len(arr)
    otype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=otype, count=n + 1,
                         offset=arr.offset * np.dtype(otype).itemsize)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    flat = data[offs[0]:offs[-1]].view(np.float64)
    return flat.reshape(n, -1)


def cosine_verify_pairs(ds: ray.data.Dataset, cand: ray.data.Dataset,
                        threshold: float = 0.9,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        num_partitions: Optional[int] = None
                        ) -> ray.data.Dataset:
    """Exact-cosine verification of a candidate id-pair Dataset WITHOUT
    driver materialization: distinct the pairs -> semi-join the corpus
    down to candidate ids -> pack unit vectors as binary -> two hash
    joins attach each side's vector -> one vectorized rowwise dot per
    batch. Every stage is a Dataset op; the driver never sees a pair."""
    from ..stages.agg import grouped_aggregate
    from ..stages.semijoin import semi_join_ids

    cand = grouped_aggregate(
        cand, ["id_a", "id_b"],
        [{"target": "__n__", "source": "id_a", "aggregate": "count"}]
    ).select_columns(["id_a", "id_b"]).materialize()

    if num_partitions is None:
        # sized from the ACTUAL candidate count (metadata-cheap after the
        # distinct aggregate): ~100k pairs per partition, capped at a
        # quarter of the CPUs (two joins run concurrently alongside their
        # upstream stages — larger pools deadlock the aggregator actors),
        # floor 2. Small candidate sets get 2-actor pools instead of
        # paying full-pool spin-up for a few rows.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_pairs = cand.count()
        num_partitions = max(2, min(cpus // 4, 1 + n_pairs // 100_000))
    ids_a = cand.select_columns(["id_a"]).rename_columns({"id_a": id_col})
    ids_b = cand.select_columns(["id_b"]).rename_columns({"id_b": id_col})
    cand_ids = grouped_aggregate(
        ids_a.union(ids_b), [id_col],
        [{"target": "__n__", "source": id_col, "aggregate": "count"}]
    ).select_columns([id_col])
    # materialized: both pack branches below consume `need`, and without
    # pinning it the whole semi-join lineage (corpus scan + distinct +
    # join) would execute twice — the dominant cost on the scale path
    need = semi_join_ids(ds.select_columns([id_col, vec_col]), cand_ids,
                         id_col).materialize()

    # two independent pack stages (not one + rename) so every block a
    # join consumes carries ONE schema
    def pack_a(batch: pa.Table) -> pa.Table:
        return _packed_unit_vectors(batch, vec_col, id_col)

    def pack_b(batch: pa.Table) -> pa.Table:
        return _packed_unit_vectors(batch, vec_col, id_col, suffix="_b")

    joined = cand.join(need.map_batches(pack_a, batch_format="pyarrow"),
                       join_type="inner", num_partitions=num_partitions,
                       on=("id_a",), right_on=(id_col,))
    joined = joined.join(need.map_batches(pack_b, batch_format="pyarrow"),
                         join_type="inner", num_partitions=num_partitions,
                         on=("id_b",), right_on=(id_col + "_b",))

    def verify(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        a = _binary_matrix(batch["__vec__"])
        b = _binary_matrix(batch["__vec_b__"])
        scores = np.einsum("ij,ij->i", a, b)
        keep = scores >= threshold
        return pa.table({
            "id_a": batch["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": batch["id_b"].combine_chunks().filter(pa.array(keep)),
            "cosine": pa.array(np.round(scores[keep], 4)),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse spherical k-means quantizer -> cell
# assignment -> per-query probe of the nprobe nearest cells -> exact
# re-rank inside probed cells only. The classic scale path (Sivic &
# Zisserman 2003 / FAISS IVF-Flat): at 100 TB the cell id is the
# partition key, so a query touches nprobe/n_cells of the corpus.
# ---------------------------------------------------------------------------

def kmeans_centroids(sample: np.ndarray, n_cells: int = 16,
                     iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means on a (n, d) sample: seeded
    kmeans++ init, fixed Lloyd iterations, assign by max dot product,
    centroids renormalized each step. Pure numpy — identical output in
    the driver trainer and the sequential fixture generator."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    n_cells = min(n_cells, n)
    rng = np.random.Generator(np.random.PCG64(seed))
    # kmeans++ seeding on cosine distance (1 - dot)
    centers = [x[int(rng.integers(n))]]
    for _ in range(1, n_cells):
        d = 1.0 - np.max(np.stack([x @ c for c in centers]), axis=0)
        d = np.clip(d, 1e-12, None)
        probs = d / d.sum()
        centers.append(x[int(rng.choice(n, p=probs))])
    c = np.stack(centers)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _normalize(c)
    return c


def _masked_partial_topk(m_norm: np.ndarray, ids: np.ndarray,
                         cells: np.ndarray, qm_norm: np.ndarray,
                         query_ids: List, allowed: np.ndarray, k: int
                         ) -> pa.Table:
    """Per-batch partial top-k where each query may only score rows whose
    cell is in its probe set (``allowed``: (n_cells, n_queries) bool).
    Shared by the distributed scorer and the sequential fixture path."""
    scores = m_norm @ qm_norm.T  # (n, q) float64
    mask = allowed[cells]        # (n, q)
    scores = np.where(mask, scores, -np.inf)
    out_q, out_id, out_s = [], [], []
    for qi, qid in enumerate(query_ids):
        col = scores[:, qi]
        finite = np.nonzero(np.isfinite(col))[0]
        if not len(finite):
            continue
        kk = min(k, len(finite))
        sub = finite[np.argpartition(-col[finite], kk - 1)[:kk]] \
            if kk < len(finite) else finite
        for i in sub:
            out_q.append(qid)
            out_id.append(int(ids[i]))
            out_s.append(float(col[i]))
    return pa.table({
        "query_id": pa.array(out_q),
        "vec_id": pa.array(out_id, type=pa.int64()),
        "score": pa.array(out_s, type=pa.float32()),
    })


def ivf_cell_column(ds: ray.data.Dataset, centroids: np.ndarray,
                    vec_col: str = "embedding",
                    cell_col: str = "ivf_cell") -> ray.data.Dataset:
    """Add the coarse-quantizer cell id to every row — at scale this is
    the hash-partition / parquet-partition key that makes probes touch
    only nprobe/n_cells of the data."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)  # zero-copy shared-memory read
        m = _normalize(_batch_matrix(batch, vec_col)).astype(np.float64)
        return batch.append_column(
            cell_col, pa.array(np.argmax(m @ c.T, axis=1).astype(np.int32)))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: List,
             k: int = 10, centroids: Optional[np.ndarray] = None,
             n_cells: int = 16, nprobe: int = 4,
             train_ids_below: int = 4096, vec_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 7) -> ray.data.Dataset:
    """IVF-Flat approximate top-k. ``centroids`` (trained offline) may be
    passed in; otherwise a deterministic sample (rows with
    ``id_col < train_ids_below`` — an explicit key range, reproducible
    under parallel reads) trains the coarse quantizer on the driver.
    Assignment + masked scoring is ONE fused map_batches pass (cells are
    computed per batch, never shuffled); the tiny partial-top-k merge is
    the only exchange."""
    from ..stages.agg import keyed_merge

    if centroids is None:
        import pyarrow.compute as _pc
        sample_rows = ds.select_columns([id_col, vec_col]).map_batches(
            lambda t: t.filter(_pc.less(t[id_col], train_ids_below)),
            batch_format="pyarrow", batch_size=None)
        mats, mids = [], []
        for b in sample_rows.iter_batches(batch_format="pyarrow",
                                          batch_size=None):
            if len(b):
                mats.append(_batch_matrix(b, vec_col))
                mids.append(b[id_col].to_numpy(zero_copy_only=False))
        sample = np.vstack(mats)
        # id-sorted: batch arrival order is nondeterministic, and k-means
        # float summation is order-sensitive — sorting pins the result
        sample = sample[np.argsort(np.concatenate(mids), kind="stable")]
        centroids = kmeans_centroids(sample, n_cells, seed=seed)
    centroids = np.asarray(centroids, dtype=np.float64)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    # per-query probe set: nprobe nearest centroids
    qc = qm @ centroids.T  # (q, n_cells)
    order = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
    allowed = np.zeros((len(centroids), len(query_ids)), dtype=bool)
    for qi in range(len(query_ids)):
        allowed[order[qi], qi] = True
    ref = ray.put({"c": centroids, "qm": qm, "qids": list(query_ids),
                   "allowed": allowed})

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        m = _normalize(_batch_matrix(batch, vec_col)).astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cells = np.argmax(m @ s["c"].T, axis=1)
        return _masked_partial_topk(m, ids, cells, s["qm"], s["qids"],
                                    s["allowed"], k)

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True], kind="stable")
        rank = df.groupby("query_id", sort=False).cumcount()
        out = df[rank < k].reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    return keyed_merge(partial, ["query_id"], merge)
