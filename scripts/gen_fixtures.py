"""Generate oracle fixtures for the engine-defined (non-SQL-expressible)
queries by applying the SAME kernels SEQUENTIALLY — single process, single
table, no Ray. The resulting parquet files pin the distributed execution
(batching, shuffles, actor pools, limits) to the sequential semantics:
CORRECTNESS then verifies that scaling the pipeline out changes nothing.

Run: python scripts/gen_fixtures.py [sf_dir ...]   (default /root/testdata/sf0.01)
Output: fixtures/<sf_name>/qXX_*.parquet (committed to the repo).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_q19(docs: pa.Table) -> pa.Table:
    from dataflows_ray.functions.text import TextAnalyzer
    out = TextAnalyzer()(docs)
    return out.select(["doc_id", "lang_pred", "quality", "n_tokens",
                       "fingerprint"])


def gen_q21(docs: pa.Table) -> pa.Table:
    from dataflows_ray.functions.dedup import SimHasher
    out = SimHasher()(docs)
    return out.select(["doc_id", "simhash"])


def gen_q20(docs: pa.Table) -> pa.Table:
    """Sequential mirror of functions.dedup.minhash_dedup (threshold 0.7):
    band explode -> per-bucket pairs (2..200) -> Jaccard verify -> drop the
    higher id of each verified pair; survivors ascending."""
    from dataflows_ray.functions.dedup import MinHasher, verify_jaccard
    mh = MinHasher()
    exploded = mh(docs).to_pandas()
    out_a, out_b = [], []
    for _key, idx in exploded.groupby(["band", "band_hash"],
                                      sort=False).indices.items():
        ids = np.unique(exploded["doc_id"].to_numpy()[idx])
        m = len(ids)
        if m < 2 or m > 200:
            continue
        iu, ju = np.triu_indices(m, 1)
        out_a.append(ids[iu])
        out_b.append(ids[ju])
    if out_a:
        pairs = pd.DataFrame({"doc_a": np.concatenate(out_a),
                              "doc_b": np.concatenate(out_b)}
                             ).drop_duplicates(["doc_a", "doc_b"])
    else:
        pairs = pd.DataFrame({"doc_a": [], "doc_b": []})
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    verified = verify_jaccard(pairs, texts, k=5, threshold=0.7)
    drop = set(verified["doc_b"])
    ids = sorted(set(texts.keys()) - drop)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64())})


def gen_q61(docs: pa.Table) -> pa.Table:
    """Sequential mirror of functions.dedup.ngram_jaccard_dedup
    (threshold 0.7, k=5, b=8): bottom-k sketch blocking -> per-bucket
    pairs (2..200) -> exact-Jaccard verify -> drop the higher id of each
    verified pair; survivors ascending."""
    from dataflows_ray.functions.dedup import _bottomk_explode, verify_jaccard
    exploded = _bottomk_explode(docs, b=8, k=5).to_pandas()
    out_a, out_b = [], []
    for _key, idx in exploded.groupby("block_hash", sort=False).indices.items():
        ids = np.unique(exploded["doc_id"].to_numpy()[idx])
        m = len(ids)
        if m < 2 or m > 200:
            continue
        iu, ju = np.triu_indices(m, 1)
        out_a.append(ids[iu])
        out_b.append(ids[ju])
    if out_a:
        pairs = pd.DataFrame({"doc_a": np.concatenate(out_a),
                              "doc_b": np.concatenate(out_b)}
                             ).drop_duplicates(["doc_a", "doc_b"])
    else:
        pairs = pd.DataFrame({"doc_a": [], "doc_b": []})
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    verified = verify_jaccard(pairs, texts, k=5, threshold=0.7)
    drop = set(verified["doc_b"])
    ids = sorted(set(texts.keys()) - drop)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64())})


def gen_q25(audio_path: str) -> pa.Table:
    """Clips with index < 200 decoded sequentially with the same decoder
    class (mirrors q25's deterministic clip-index filter)."""
    import pyarrow.compute as pc
    from dataflows_ray.pipelines.audio import PcmDecoder
    tbl = pq.read_table(audio_path)
    idx = pc.cast(pc.utf8_slice_codeunits(tbl["clip_id"], start=-12, stop=99),
                  pa.int64())
    tbl = tbl.filter(pc.less(idx, 200))
    out = PcmDecoder(validate_snr=True)(tbl)
    return out.select(["clip_id", "n_samples", "rms", "snr_db"])


def gen_q60(sf_dir: str) -> pa.Table:
    """Sequential mirror of q60: decode the WHOLE mixed-codec table as one
    batch (per-clip decode is independent, so batching cannot matter),
    then aggregate per codec with order-independent reducers. The per-row
    SNR against the analytically regenerated waveform is the
    codec-INDEPENDENT correctness signal: a wrong G.711 table or WAV parse
    collapses min_snr below the 30 dB invariant."""
    import glob
    from dataflows_ray.pipelines.audio import PcmDecoder
    from dataflows_ray.pipelines.relational import _multicodec_audio_path
    files = sorted(glob.glob(os.path.join(
        _multicodec_audio_path(sf_dir), "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    dec = PcmDecoder(validate_snr=True)(tbl).to_pandas()
    assert (dec["snr_db"] >= 30).all(), "SNR invariant violated in fixture"
    out = (dec.groupby("codec")
           .agg(n_clips=("codec", "size"),
                total_samples=("n_samples", "sum"),
                min_snr=("snr_db", "min"))
           .reset_index().sort_values("codec"))
    out["min_snr"] = out["min_snr"].round(4)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def gen_q103(sf_dir: str) -> pa.Table:
    """Sequential mirror of q103: decode + lossless-verify the whole
    five-codec table (incl. from-scratch FLAC) in one batch, aggregate
    per codec. Asserts the codec invariants here so a silently-broken
    codec fails fixture generation, not just the gate: lossless codecs
    must be bit-exact on every clip, lossy G.711 must clear 30 dB, and
    FLAC must actually compress (ratio < 1)."""
    import glob
    from dataflows_ray.pipelines.audio import CodecRoundtripQC
    from dataflows_ray.pipelines.relational import _flac_audio_path
    files = sorted(glob.glob(os.path.join(
        _flac_audio_path(sf_dir), "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    qc = CodecRoundtripQC()(tbl).to_pandas()
    out = (qc.groupby("codec")
           .agg(n_clips=("codec", "size"),
                n_exact=("exact", "sum"),
                total_samples=("n_samples", "sum"),
                total_enc_bytes=("enc_bytes", "sum"),
                min_snr=("snr_db", "min"))
           .reset_index().sort_values("codec"))
    out["min_snr"] = out["min_snr"].round(4)
    out["ratio"] = (out["total_enc_bytes"]
                    / (2.0 * out["total_samples"])).round(4)
    by = out.set_index("codec")
    for codec in ("pcm16", "wav", "flac"):
        assert by.loc[codec, "n_exact"] == by.loc[codec, "n_clips"], \
            f"{codec} round-trip not bit-exact"
    assert (out["min_snr"] >= 30).all(), "SNR invariant violated"
    assert by.loc["flac", "ratio"] < 1.0, "FLAC did not compress"
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def gen_q106(sf_dir: str) -> pa.Table:
    """Sequential mirror of q106: decode + verify the six-codec table
    (q103's five plus IMA ADPCM) in one batch, aggregate per codec.
    Asserts the codec bars at fixture time: lossless codecs bit-exact on
    every clip, G.711 >= 30 dB, ADPCM >= 20 dB at 4:1 (ratio 0.25) —
    IMA ADPCM's 4-bit quantization cannot reach the 30 dB corpus
    invariant on wideband content, so it carries its own bar."""
    import glob
    from dataflows_ray.pipelines.audio import CodecRoundtripQC
    from dataflows_ray.pipelines.relational import _adpcm_audio_path
    files = sorted(glob.glob(os.path.join(
        _adpcm_audio_path(sf_dir), "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    qc = CodecRoundtripQC()(tbl).to_pandas()
    out = (qc.groupby("codec")
           .agg(n_clips=("codec", "size"),
                n_exact=("exact", "sum"),
                total_samples=("n_samples", "sum"),
                total_enc_bytes=("enc_bytes", "sum"),
                min_snr=("snr_db", "min"))
           .reset_index().sort_values("codec"))
    out["min_snr"] = out["min_snr"].round(4)
    out["ratio"] = (out["total_enc_bytes"]
                    / (2.0 * out["total_samples"])).round(4)
    by = out.set_index("codec")
    assert set(by.index) == {"pcm16", "mulaw", "alaw", "wav", "flac",
                             "adpcm"}, "codec draw missing a codec"
    for codec in ("pcm16", "wav", "flac"):
        assert by.loc[codec, "n_exact"] == by.loc[codec, "n_clips"], \
            f"{codec} round-trip not bit-exact"
    for codec in ("mulaw", "alaw"):
        assert by.loc[codec, "min_snr"] >= 30, f"{codec} below 30 dB"
    assert by.loc["adpcm", "min_snr"] >= 20, "ADPCM below its 20 dB bar"
    assert abs(by.loc["adpcm", "ratio"] - 0.25) < 0.01, \
        "ADPCM is a fixed 4:1 codec"
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def gen_q104(sf_dir: str) -> pa.Table:
    """Sequential mirror of q104: every-4th-frame sampling over the
    mixed rawvideo + MJPEG/AVI table in one single-process pass.
    Asserts the container invariants at fixture time: both formats
    present, MJPEG payloads smaller than raw, and MJPEG brightness
    within JPEG-lossy tolerance of the identical-content raw layout."""
    import glob
    import numpy as np
    from dataflows_ray.functions.multimodal import VideoFrameSampler
    from dataflows_ray.pipelines.relational import _video_path
    files = sorted(glob.glob(os.path.join(_video_path(sf_dir),
                                          "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    fmts = set(tbl["format"].to_pylist())
    assert fmts == {"rawvideo", "mjpeg"}, f"format mix missing: {fmts}"
    df = VideoFrameSampler(every_n=4)(tbl).to_pandas()
    df["mean_brightness"] = df["frame_means"].map(
        lambda m: round(float(np.mean(m)), 4))
    # identical content either side of the container: lossy-bounded
    by = df.groupby("format")["mean_brightness"].mean()
    assert abs(by["mjpeg"] - by["rawvideo"]) < 16.0, by
    out = (df[["video_id", "format", "n_frames", "sampled_frames",
               "mean_brightness"]]
           .sort_values("video_id").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def gen_q105(sf_dir: str) -> pa.Table:
    """Sequential mirror of q105: FLAC-transcode the first-500-clip
    subset of the multicodec table in one single-process pass. Asserts
    the transcode invariants at fixture time: every clip's FLAC payload
    reproduces the source's decoded int16 waveform exactly, and the
    lossless normalization actually compresses the corpus."""
    import glob
    from dataflows_ray.pipelines.relational import (
        _FlacTranscode, _multicodec_audio_path)
    files = sorted(glob.glob(os.path.join(
        _multicodec_audio_path(sf_dir), "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    df = _FlacTranscode(500)(tbl).to_pandas()
    assert (df["exact"] == 1).all(), "FLAC transcode not lossless"
    assert df["flac_bytes"].sum() < 2 * df["n_samples"].sum(), \
        "FLAC normalization did not compress vs raw PCM16"
    out = (df[["clip_id", "src_codec", "n_samples", "src_bytes",
               "flac_bytes", "flac_sha256", "exact"]]
           .sort_values("clip_id").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def gen_q22(sf_dir: str) -> pa.Table:
    """Sequential mirror of functions.similarity.lsh_topk (bits=8, k=5,
    queries = vec_ids 0,1,2): bucket the corpus, multi-probe filter, exact
    re-rank — single process, single batch."""
    from dataflows_ray.functions.similarity import (
        _HyperplaneHasher, _TopKScorer, _normalize)
    import ray
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = np.vstack([np.asarray(v) for v in tbl["embedding"].to_pylist()])
    ids = tbl["vec_id"].to_numpy()
    qmask = np.isin(ids, [0, 1, 2])
    qm = _normalize(emb[qmask].astype(np.float32))
    hasher = _HyperplaneHasher(emb.shape[1], bits=8, seed=99)
    buckets = hasher.bucket(_normalize(emb.astype(np.float32)))
    probe = set()
    for b in hasher.bucket(qm):
        probe.add(int(b))
        for bit in range(8):
            probe.add(int(b) ^ (1 << bit))
    cand = np.isin(buckets, sorted(probe))
    cand_tbl = tbl.filter(pa.array(cand))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR")
    ref = ray.put({"matrix": qm, "ids": ids[qmask].tolist()})
    scored = _TopKScorer(ref, 5, "embedding", "vec_id")(cand_tbl)
    df = scored.to_pandas().sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True], kind="stable")
    df = df[df.groupby("query_id", sort=False).cumcount() < 5]
    df["score"] = df["score"].astype("float64").round(4)
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


def gen_q41(sf_dir: str) -> pa.Table:
    """Sequential mirror of functions.similarity.ivf_topk (n_cells=16,
    nprobe=4, k=5, queries = vec_ids 0,1,2): same deterministic k-means
    trainer, same masked scoring kernel, single batch."""
    from dataflows_ray.functions.similarity import (
        _masked_partial_topk, _normalize, kmeans_centroids)
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = np.vstack([np.asarray(v) for v in tbl["embedding"].to_pylist()])
    ids = tbl["vec_id"].to_numpy()
    qmask = np.isin(ids, [0, 1, 2])
    qm = _normalize(np.asarray(emb[qmask], dtype=np.float64))
    # float32 sample + float32 normalize-then-cast corpus: bit-identical
    # to the distributed path (_batch_matrix emits float32)
    sample = emb[ids < 4096][np.argsort(ids[ids < 4096], kind="stable")]
    centroids = kmeans_centroids(sample.astype(np.float32), n_cells=16,
                                 seed=7)
    qc = qm @ centroids.T
    order = np.argsort(-qc, axis=1, kind="stable")[:, :4]
    allowed = np.zeros((len(centroids), int(qmask.sum())), dtype=bool)
    for qi in range(int(qmask.sum())):
        allowed[order[qi], qi] = True
    m = _normalize(emb.astype(np.float32)).astype(np.float64)
    cells = np.argmax(m @ centroids.T, axis=1)
    scored = _masked_partial_topk(m, ids, cells, qm, ids[qmask].tolist(),
                                  allowed, 5)
    df = scored.to_pandas().sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True], kind="stable")
    df = df[df.groupby("query_id", sort=False).cumcount() < 5]
    df["score"] = df["score"].astype("float64").round(4)
    df = df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def gen_q28(sf_dir: str) -> pa.Table:
    """Sequential HLL per event_type (registers are merge-order-invariant,
    so this equals the distributed run exactly)."""
    from dataflows_ray.functions.sketch import _hash_column, _registers, _estimate
    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_type", "user_id"])
    df = tbl.to_pandas()
    types, ndv = [], []
    for et, idx in df.groupby("event_type", sort=False).indices.items():
        h = _hash_column(pa.array(df["user_id"].to_numpy()[idx]))
        reg = _registers(h, 12)
        types.append(et)
        ndv.append(int(round(_estimate(reg))))
    return pa.table({"event_type": pa.array(types),
                     "approx_ndv": pa.array(ndv, type=pa.int64())})


def gen_q42(sf_dir: str) -> pa.Table:
    """Sequential mirror of functions.sketch.heavy_hitters (k=20): exact
    pandas counts + one single-pass Count-Min sketch (register addition
    is commutative, so this equals the distributed merge exactly)."""
    from dataflows_ray.functions.sketch import (
        _cm_estimate, _cm_sketch, _hash_column)
    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    df = tbl.to_pandas()
    counts = df.groupby("user_id").size().reset_index(name="n")
    top = counts.sort_values(["n", "user_id"],
                             ascending=[False, True]).head(20)
    sketch = _cm_sketch(_hash_column(tbl["user_id"]), 4, 2048)
    top["cm_est"] = _cm_estimate(sketch,
                                 _hash_column(pa.array(top["user_id"]
                                                       .to_numpy())))
    return pa.Table.from_pandas(top.reset_index(drop=True),
                                preserve_index=False)


def gen_q50(sf_dir: str) -> pa.Table:
    """Sequential mirror of q50 cluster-aware near-dedup: same MinHash /
    LSH / Jaccard kernels run single-process over the whole table, then
    a plain union-find replaces the distributed min-label propagation —
    both compute min-id-per-connected-component, so outputs must match
    exactly."""
    import numpy as np
    from dataflows_ray.functions.dedup import (
        _cached_minhasher, verify_jaccard)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    mh = _cached_minhasher(128, 32, 5)
    exploded = mh(tbl).to_pandas()
    out_a, out_b = [], []
    for _k, idx in exploded.groupby(["band", "band_hash"],
                                    sort=False).indices.items():
        ids = np.unique(exploded["doc_id"].to_numpy()[idx])
        m = len(ids)
        if m < 2 or m > 200:  # same mega-bucket cap as the engine
            continue
        iu, ju = np.triu_indices(m, 1)
        out_a.append(ids[iu])
        out_b.append(ids[ju])
    import pandas as pd
    if out_a:
        pairs = pd.DataFrame({"doc_a": np.concatenate(out_a),
                              "doc_b": np.concatenate(out_b)}) \
            .drop_duplicates()
    else:
        pairs = pd.DataFrame({"doc_a": [], "doc_b": []})
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    verified = verify_jaccard(pairs, texts, k=5, threshold=0.7)

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(verified["doc_a"], verified["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {n for n in parent if find(n) != n}
    keep = sorted(d for d in tbl["doc_id"].to_pylist() if d not in drop)
    return pa.table({"doc_id": pa.array(keep, type=pa.int64())})


def gen_q51(sf_dir: str) -> pa.Table:
    """Sequential mirror of q51 image features: decode every PPM payload
    of the deterministic synthetic image table with the SAME kernel the
    distributed stage uses, single-process."""
    import glob
    import pandas as pd
    from dataflows_ray.functions.multimodal import ImageDecoder
    from dataflows_ray.pipelines.relational import _image_path
    dec = ImageDecoder(target_size=(16, 16))
    rows = []
    for f in sorted(glob.glob(os.path.join(_image_path(sf_dir),
                                           "*.parquet"))):
        t = pq.read_table(f)
        for raw, iid, fmt, w, h in zip(t["bytes"].to_pylist(),
                                       t["image_id"].to_pylist(),
                                       t["format"].to_pylist(),
                                       t["width"].to_pylist(),
                                       t["height"].to_pylist()):
            img = dec._resize(dec._decode(raw, fmt, w, h))
            rows.append({
                "image_id": iid,
                "mean_pixel": round(float(img.mean()), 6),
                "mean_r": round(float(img[:, :, 0].mean()), 6),
                "mean_g": round(float(img[:, :, 1].mean()), 6),
                "mean_b": round(float(img[:, :, 2].mean()), 6),
                "out_width": np.int32(img.shape[1]),
                "out_height": np.int32(img.shape[0]),
            })
    df = pd.DataFrame(rows).sort_values("image_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def gen_q62(sf_dir: str) -> pa.Table:
    """Sequential mirror of q62 JPEG features: decode every baseline-JPEG
    payload of the deterministic jpeg corpus single-process. (The codec
    itself is independently verified by the roundtrip/PSNR pytest suite;
    this fixture pins the DISTRIBUTION layer to sequential semantics.)"""
    import glob
    import pandas as pd
    from dataflows_ray.functions.multimodal import ImageDecoder
    from dataflows_ray.pipelines.relational import _jpeg_image_path
    dec = ImageDecoder()
    rows = []
    for f in sorted(glob.glob(os.path.join(_jpeg_image_path(sf_dir),
                                           "*.parquet"))):
        t = pq.read_table(f)
        for raw, iid, fmt, w, h in zip(t["bytes"].to_pylist(),
                                       t["image_id"].to_pylist(),
                                       t["format"].to_pylist(),
                                       t["width"].to_pylist(),
                                       t["height"].to_pylist()):
            img = dec._decode(raw, fmt, w, h)
            rows.append({
                "image_id": iid,
                "mean_pixel": round(float(img.mean()), 6),
                "mean_r": round(float(img[:, :, 0].mean()), 6),
                "mean_g": round(float(img[:, :, 1].mean()), 6),
                "mean_b": round(float(img[:, :, 2].mean()), 6),
                "out_width": np.int32(img.shape[1]),
                "out_height": np.int32(img.shape[0]),
            })
    df = pd.DataFrame(rows).sort_values("image_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def gen_q52(sf_dir: str) -> pa.Table:
    """Sequential mirror of q52 streaming windowed NDV: one single-pass
    HLL per 10-min window over the audio table (register max commutes,
    so this equals the streaming engine's merged registers exactly)."""
    import glob
    from dataflows_ray.functions.sketch import (
        _estimate, _hash_column, _registers)
    from dataflows_ray.pipelines.relational import _audio_path
    files = sorted(glob.glob(os.path.join(_audio_path(sf_dir),
                                          "*.parquet")))
    tbl = pa.concat_tables([
        pq.read_table(f, columns=["speaker", "event_ms"]) for f in files])
    ev = tbl["event_ms"].to_numpy(zero_copy_only=False)
    h = _hash_column(tbl["speaker"])
    widx = ev // 600_000
    starts, ndv = [], []
    for w in np.unique(widx):
        starts.append(int(w) * 600_000)
        ndv.append(int(round(_estimate(_registers(h[widx == w], 12)))))
    return pa.table({"window_start": pa.array(starts, type=pa.int64()),
                     "approx_ndv": pa.array(ndv, type=pa.int64())})


def gen_q56(sf_dir: str) -> pa.Table:
    """Sequential mirror of q56 hash sampling: the same avalanche +
    threshold decision over every doc_id, single-process."""
    from dataflows_ray.functions.sketch import _hash_column, _mix64
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"])
    salt = np.uint64(7 * 0x9E3779B97F4A7C15 & (2 ** 64 - 1))
    threshold = np.uint64(int(0.2 * float(2 ** 64)))
    h = _mix64(_hash_column(tbl["doc_id"]) ^ salt)
    out = tbl.filter(pa.array(h < threshold))
    return out.take(pa.compute.sort_indices(
        out, sort_keys=[("doc_id", "ascending")]))


def _decode_pcm16_py(raw: bytes) -> list:
    """Independent pcm16 decode (struct, no engine code)."""
    import struct
    return list(struct.unpack(f"<{len(raw) // 2}h", raw))


def _first_clip_rows(audio_path: str, n: int):
    tbl = pq.read_table(audio_path)
    rows = []
    for r in tbl.to_pylist():
        if int(r["clip_id"][-12:]) < n:
            rows.append(r)
    rows.sort(key=lambda r: r["clip_id"])
    return rows


def gen_q68(audio_path: str) -> pa.Table:
    """INDEPENDENT sequential oracle for q68: pure-Python per-sample
    linear interpolation over struct-unpacked PCM — shares no code with
    functions/audio_ops.py (ADVICE: at least one gate per kernel family
    must not share code with the engine)."""
    import math
    sr_out = 11025
    out = {"clip_id": [], "sr_out": [], "n_out": [], "rms_out": []}
    for r in _first_clip_rows(audio_path, 250):
        assert r["codec"] == "pcm16"
        x = _decode_pcm16_py(r["bytes"])
        sr_in = int(r["sr_hz"])
        n_in = len(x)
        if n_in <= 1 or sr_in == sr_out:
            y = list(x)
        else:
            n_out = (n_in - 1) * sr_out // sr_in + 1
            step = float(sr_in) / float(sr_out)
            y = []
            for j in range(n_out):
                pos = j * step
                i = min(int(math.floor(pos)), n_in - 2)
                frac = pos - i
                v = float(x[i]) + (float(x[i + 1]) - float(x[i])) * frac
                y.append(int(math.floor(v + 0.5)))
        ss = 0
        for v in y:
            ss += v * v
        out["clip_id"].append(r["clip_id"])
        out["sr_out"].append(sr_out)
        out["n_out"].append(len(y))
        out["rms_out"].append(round(math.sqrt(ss / max(1, len(y))), 6))
    return pa.table({"clip_id": pa.array(out["clip_id"]),
                     "sr_out": pa.array(out["sr_out"], pa.int32()),
                     "n_out": pa.array(out["n_out"], pa.int64()),
                     "rms_out": pa.array(out["rms_out"], pa.float64())})


def gen_q69(audio_path: str) -> pa.Table:
    """INDEPENDENT sequential oracle for q69: pure-Python frame-energy
    VAD (20 ms frames, exact integer energies, relative 0.5 threshold,
    adjacent-voiced merge)."""
    frame_ms = 20
    out = {"clip_id": [], "seg_idx": [], "seg_start_ms": [],
           "seg_end_ms": []}
    for r in _first_clip_rows(audio_path, 250):
        x = _decode_pcm16_py(r["bytes"])
        spf = int(r["sr_hz"]) * frame_ms // 1000
        n_frames = len(x) // spf
        if n_frames == 0:
            continue
        energies = []
        for f in range(n_frames):
            ss = 0
            for v in x[f * spf:(f + 1) * spf]:
                ss += v * v
            energies.append(ss)
        thresh = 0.5 * float(max(energies))
        segs, start = [], None
        for i, e in enumerate(energies):
            voiced = float(e) > thresh
            if voiced and start is None:
                start = i
            elif not voiced and start is not None:
                segs.append((start * frame_ms, i * frame_ms))
                start = None
        if start is not None:
            segs.append((start * frame_ms, n_frames * frame_ms))
        for j, (s, e) in enumerate(segs):
            out["clip_id"].append(r["clip_id"])
            out["seg_idx"].append(j)
            out["seg_start_ms"].append(s)
            out["seg_end_ms"].append(e)
    return pa.table({"clip_id": pa.array(out["clip_id"]),
                     "seg_idx": pa.array(out["seg_idx"], pa.int64()),
                     "seg_start_ms": pa.array(out["seg_start_ms"],
                                              pa.int64()),
                     "seg_end_ms": pa.array(out["seg_end_ms"], pa.int64())})


def gen_q85(audio_path: str) -> pa.Table:
    """INDEPENDENT sequential oracle for q85: pure-Python per-sample
    loudness normalization (struct-unpacked PCM, integer sums of squares
    — exact in float64 since they stay under 2^53 — gain =
    target/rms_in, floor(x*gain+0.5) clamped to int16). Shares no code
    with functions/audio_ops.py."""
    import math
    target = 3000.0
    out = {"clip_id": [], "n_samples": [], "rms_in": [], "gain": [],
           "rms_out": []}
    for r in _first_clip_rows(audio_path, 250):
        assert r["codec"] == "pcm16"
        x = _decode_pcm16_py(r["bytes"])
        n = len(x)
        if n == 0:
            rms_in, gain, rms_out = 0.0, 1.0, 0.0
        else:
            ss = 0
            for v in x:
                ss += v * v
            rms_in = math.sqrt(ss / n)
            gain = (target / rms_in) if rms_in > 0 else 1.0
            ss_out = 0
            for v in x:
                y = int(math.floor(float(v) * gain + 0.5))
                y = max(-32768, min(32767, y))
                ss_out += y * y
            rms_out = math.sqrt(ss_out / n)
        out["clip_id"].append(r["clip_id"])
        out["n_samples"].append(n)
        out["rms_in"].append(round(rms_in, 6))
        out["gain"].append(round(gain, 6))
        out["rms_out"].append(round(rms_out, 6))
    return pa.table({"clip_id": pa.array(out["clip_id"]),
                     "n_samples": pa.array(out["n_samples"], pa.int64()),
                     "rms_in": pa.array(out["rms_in"], pa.float64()),
                     "gain": pa.array(out["gain"], pa.float64()),
                     "rms_out": pa.array(out["rms_out"], pa.float64())})


def gen_q86(audio_path: str) -> pa.Table:
    """INDEPENDENT sequential oracle for q86: pure-Python QC loop —
    peak |sample| (|-32768| = 32768), clipped count (|x| >= 32767),
    edge-silence trim from exact integer 20 ms frame energies at the
    relative 0.5 threshold (first..last voiced frame bounds)."""
    frame_ms = 20
    out = {k: [] for k in ("clip_id", "n_samples", "peak", "n_clipped",
                           "clip_frac", "trim_start_ms", "trim_end_ms",
                           "trimmed_dur_ms")}
    for r in _first_clip_rows(audio_path, 250):
        x = _decode_pcm16_py(r["bytes"])
        n = len(x)
        peak = 0
        n_clipped = 0
        for v in x:
            a = -v if v < 0 else v
            if a > peak:
                peak = a
            if a >= 32767:
                n_clipped += 1
        spf = int(r["sr_hz"]) * frame_ms // 1000
        n_frames = n // spf if spf else 0
        ts = te = 0
        if n_frames:
            energies = []
            for f in range(n_frames):
                ss = 0
                for v in x[f * spf:(f + 1) * spf]:
                    ss += v * v
                energies.append(ss)
            thresh = 0.5 * float(max(energies))
            voiced = [i for i, e in enumerate(energies)
                      if float(e) > thresh]
            if voiced:
                ts = voiced[0] * frame_ms
                te = (voiced[-1] + 1) * frame_ms
        out["clip_id"].append(r["clip_id"])
        out["n_samples"].append(n)
        out["peak"].append(peak)
        out["n_clipped"].append(n_clipped)
        out["clip_frac"].append(round(n_clipped / n, 6) if n else 0.0)
        out["trim_start_ms"].append(ts)
        out["trim_end_ms"].append(te)
        out["trimmed_dur_ms"].append(te - ts)
    return pa.table({
        "clip_id": pa.array(out["clip_id"]),
        "n_samples": pa.array(out["n_samples"], pa.int64()),
        "peak": pa.array(out["peak"], pa.int64()),
        "n_clipped": pa.array(out["n_clipped"], pa.int64()),
        "clip_frac": pa.array(out["clip_frac"], pa.float64()),
        "trim_start_ms": pa.array(out["trim_start_ms"], pa.int64()),
        "trim_end_ms": pa.array(out["trim_end_ms"], pa.int64()),
        "trimmed_dur_ms": pa.array(out["trimmed_dur_ms"], pa.int64()),
    })


def _bpe_train_py(sf_dir: str, n_merges: int = 40,
                  vocab_limit: int = 50_000):
    """INDEPENDENT sequential BPE trainer: collections.Counter word
    counts over Python-re split (same explicit ASCII class), dict-based
    pair counting, min((-count, pair)) tie rule — no code shared with
    functions/bpe.py (different data structures: tuple-keyed word dict
    rebuilt per merge vs the engine's in-place symbol lists). The
    top-``vocab_limit`` truncation by (count desc, word asc) is PART of
    the learn_bpe contract and must be reproduced here (it only bites
    on corpora with more distinct words than the limit)."""
    import re as _re
    from collections import Counter
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    wc = Counter()
    for r in docs:
        for w in _re.split(r"[ \t\n\r\f\v]+", r["text"] or ""):
            if w:
                wc[w] += 1
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_limit]
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in top}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return docs, merges


def gen_q90(sf_dir: str) -> pa.Table:
    _, merges = _bpe_train_py(sf_dir)
    return pa.table({"rank": pa.array(range(len(merges)), pa.int64()),
                     "left": pa.array([m[0] for m in merges]),
                     "right": pa.array([m[1] for m in merges])})


def gen_q91(sf_dir: str) -> pa.Table:
    """Sequential encode with the trained ranks: repeatedly apply the
    LOWEST-rank applicable merge (standard BPE encode order)."""
    import re as _re
    docs, merges = _bpe_train_py(sf_dir)
    ranks = {m: i for i, m in enumerate(merges)}

    def enc(word):
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            cand = [(ranks[(a, b)], i) for i, (a, b)
                    in enumerate(zip(syms, syms[1:])) if (a, b) in ranks]
            if not cand:
                break
            _, i = min(cand)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        return len(syms)

    memo = {}
    ids, counts = [], []
    for r in docs:
        n = 0
        for w in _re.split(r"[ \t\n\r\f\v]+", r["text"] or ""):
            if not w:
                continue
            if w not in memo:
                memo[w] = enc(w)
            n += memo[w]
        ids.append(r["doc_id"])
        counts.append(n)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "n_bpe_tokens": pa.array(counts, pa.int64())})


def gen_q92(sf_dir: str) -> pa.Table:
    """INDEPENDENT sequential PCA oracle: per-row Python-int moment
    accumulation over the same 1e-6 quantization contract as
    functions/pca.py (no shared code, no vectorized partials), identical
    covariance by exact-integer construction, numpy eigh + the same
    sign canonicalization, per-row projection loop."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    rows = tbl.to_pylist()
    rows.sort(key=lambda r: r["vec_id"])
    d = len(rows[0]["embedding"])
    S = 1_000_000
    n = 0
    s = [0] * d
    xtx = [[0] * d for _ in range(d)]
    qs = []
    for r in rows:
        import math as _math
        q = [int(_math.floor(float(v) * S + 0.5)) for v in r["embedding"]]
        qs.append((r["vec_id"], q))
        n += 1
        for i in range(d):
            s[i] += q[i]
            qi = q[i]
            ri = xtx[i]
            for j in range(d):
                ri[j] += qi * q[j]
    denom = n * (n - 1) * S * S
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            cov[i, j] = (n * xtx[i][j] - s[i] * s[j]) / denom
    mean = np.array([v / (n * S) for v in s])
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    comps = v[:, order]
    for c in range(comps.shape[1]):
        idx = int(np.argmax(np.abs(comps[:, c])))
        if comps[idx, c] < 0:
            comps[:, c] = -comps[:, c]
    ids, pcs = [], [[] for _ in range(4)]
    for vid, q in qs:
        x = np.array(q, dtype=np.float64) / S
        y = np.round((x - mean) @ comps, 6)
        ids.append(vid)
        for c in range(4):
            pcs[c].append(float(y[c]))
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for c in range(4):
        cols[f"pc{c + 1}"] = pa.array(pcs[c], pa.float64())
    return pa.table(cols)


def gen_q96(audio_path: str) -> pa.Table:
    """INDEPENDENT sequential oracle for q96: pure-Python stereo
    interleave (L = x, R = (3x)//4) and downmix ((L+R)//2) loops over
    struct-unpacked PCM, exact integer sums of squares."""
    import math
    out = {k: [] for k in ("clip_id", "n_frames", "rms_mono", "rms_l",
                           "rms_r")}
    for r in _first_clip_rows(audio_path, 250):
        x = _decode_pcm16_py(r["bytes"])
        n = len(x)
        ss_m = ss_l = ss_r = 0
        for v in x:
            rch = (3 * v) // 4
            m = (v + rch) // 2
            ss_m += m * m
            ss_l += v * v
            ss_r += rch * rch
        out["clip_id"].append(r["clip_id"])
        out["n_frames"].append(n)
        out["rms_mono"].append(round(math.sqrt(ss_m / max(1, n)), 6))
        out["rms_l"].append(round(math.sqrt(ss_l / max(1, n)), 6))
        out["rms_r"].append(round(math.sqrt(ss_r / max(1, n)), 6))
    return pa.table({
        "clip_id": pa.array(out["clip_id"]),
        "n_frames": pa.array(out["n_frames"], pa.int64()),
        "rms_mono": pa.array(out["rms_mono"], pa.float64()),
        "rms_l": pa.array(out["rms_l"], pa.float64()),
        "rms_r": pa.array(out["rms_r"], pa.float64()),
    })


def gen_q70(sf_dir: str) -> pa.Table:
    """INDEPENDENT sequential k-means oracle: same contract as
    functions/kmeans.py (init = k smallest vec_ids, 5 iterations,
    centroids quantized to 1e-6 per round) but implemented with plain
    per-row numpy distance loops in vec_id order — no shared code, no
    matmul trick, sequential summation."""
    k, iters = 10, 5
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    df = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    C = np.round(X[:k].copy(), 6)
    for _ in range(iters):
        assign = np.empty(len(X), dtype=np.int64)
        for i in range(len(X)):
            dists = ((X[i] - C) ** 2).sum(axis=1)
            assign[i] = int(dists.argmin())
        newC = C.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                s = np.zeros(X.shape[1])
                for m in members:  # sequential, in vec_id order
                    s += m
                newC[c] = s / len(members)
        C = np.round(newC, 6)
    final = np.empty(len(X), dtype=np.int64)
    for i in range(len(X)):
        final[i] = int(((X[i] - C) ** 2).sum(axis=1).argmin())
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(final, pa.int64())})


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    for sf_dir in sf_dirs:
        name = os.path.basename(sf_dir.rstrip("/"))
        fdir = os.path.join(REPO, "fixtures", name)
        os.makedirs(fdir, exist_ok=True)
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        pq.write_table(gen_q19(docs), f"{fdir}/q19_text_analysis.parquet")
        print(f"{name}: q19 written")
        pq.write_table(gen_q20(docs), f"{fdir}/q20_minhash_dedup.parquet")
        print(f"{name}: q20 written")
        pq.write_table(gen_q21(docs), f"{fdir}/q21_simhash.parquet")
        print(f"{name}: q21 written")
        pq.write_table(gen_q61(docs), f"{fdir}/q61_ngram_jaccard_dedup.parquet")
        print(f"{name}: q61 written")
        from dataflows_ray.pipelines.relational import _audio_path
        audio = _audio_path(sf_dir)
        pq.write_table(gen_q25(audio), f"{fdir}/q25_audio_decode.parquet")
        print(f"{name}: q25 written")
        pq.write_table(gen_q22(sf_dir), f"{fdir}/q22_knn_lsh.parquet")
        print(f"{name}: q22 written")
        pq.write_table(gen_q60(sf_dir), f"{fdir}/q60_multicodec_decode.parquet")
        print(f"{name}: q60 written")
        pq.write_table(gen_q103(sf_dir),
                       f"{fdir}/q103_flac_lossless_qc.parquet")
        print(f"{name}: q103 written")
        pq.write_table(gen_q104(sf_dir),
                       f"{fdir}/q104_mjpeg_frame_sampling.parquet")
        print(f"{name}: q104 written")
        pq.write_table(gen_q106(sf_dir), f"{fdir}/q106_adpcm_qc.parquet")
        print(f"{name}: q106 written")
        pq.write_table(gen_q105(sf_dir),
                       f"{fdir}/q105_streaming_flac_transcode.parquet")
        print(f"{name}: q105 written")
        pq.write_table(gen_q28(sf_dir), f"{fdir}/q28_approx_ndv.parquet")
        print(f"{name}: q28 written")
        pq.write_table(gen_q41(sf_dir), f"{fdir}/q41_knn_ivf.parquet")
        print(f"{name}: q41 written")
        pq.write_table(gen_q42(sf_dir), f"{fdir}/q42_heavy_hitters.parquet")
        print(f"{name}: q42 written")
        pq.write_table(gen_q50(sf_dir), f"{fdir}/q50_cluster_dedup.parquet")
        print(f"{name}: q50 written")
        pq.write_table(gen_q51(sf_dir), f"{fdir}/q51_image_features.parquet")
        print(f"{name}: q51 written")
        pq.write_table(gen_q62(sf_dir),
                       f"{fdir}/q62_jpeg_image_features.parquet")
        print(f"{name}: q62 written")
        pq.write_table(gen_q52(sf_dir), f"{fdir}/q52_windowed_ndv.parquet")
        print(f"{name}: q52 written")
        pq.write_table(gen_q56(sf_dir), f"{fdir}/q56_hash_sample.parquet")
        print(f"{name}: q56 written")
        pq.write_table(gen_q68(audio), f"{fdir}/q68_audio_resample.parquet")
        print(f"{name}: q68 written")
        pq.write_table(gen_q69(audio), f"{fdir}/q69_vad_segments.parquet")
        print(f"{name}: q69 written")
        pq.write_table(gen_q70(sf_dir),
                       f"{fdir}/q70_kmeans_embeddings.parquet")
        print(f"{name}: q70 written")
        pq.write_table(gen_q85(audio), f"{fdir}/q85_loudness_normalize.parquet")
        print(f"{name}: q85 written")
        pq.write_table(gen_q86(audio), f"{fdir}/q86_audio_qc.parquet")
        print(f"{name}: q86 written")
        pq.write_table(gen_q90(sf_dir), f"{fdir}/q90_bpe_merges.parquet")
        print(f"{name}: q90 written")
        pq.write_table(gen_q91(sf_dir), f"{fdir}/q91_bpe_token_counts.parquet")
        print(f"{name}: q91 written")
        pq.write_table(gen_q92(sf_dir), f"{fdir}/q92_pca_projection.parquet")
        print(f"{name}: q92 written")
        pq.write_table(gen_q96(audio), f"{fdir}/q96_stereo_mixdown.parquet")
        print(f"{name}: q96 written")


if __name__ == "__main__":
    main()
