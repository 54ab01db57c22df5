"""Content fingerprinting + integrity-audit tests."""

import hashlib
import json
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dataflows_ray.functions.fingerprint import (
    audit_sink, build_integrity_manifest, content_fingerprint_stage,
    fingerprint_batch, hash_file, verify_integrity)
from dataflows_ray.streaming.sink import ExactlyOnceSink


def _clip_table(n=16, seed=3):
    import numpy as np
    rng = np.random.Generator(np.random.PCG64(seed))
    payloads = [rng.integers(0, 256, size=int(rng.integers(10, 4000)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "clip_id": [f"c{i:04d}" for i in range(n)],
        "bytes": pa.array(payloads, type=pa.binary()),
    })


def test_fingerprint_batch_matches_hashlib():
    t = _clip_table()
    out = fingerprint_batch(t)
    assert out.column_names == ["clip_id", "sha256_hex", "md5_hex", "n_bytes"]
    for i, payload in enumerate(t["bytes"].to_pylist()):
        assert out["sha256_hex"][i].as_py() == hashlib.sha256(payload).hexdigest()
        assert out["md5_hex"][i].as_py() == hashlib.md5(payload).hexdigest()
        assert out["n_bytes"][i].as_py() == len(payload)


def test_fingerprint_null_payloads_propagate_null():
    """NULL binary values must fingerprint as NULL (SQL semantics) —
    not as the empty-content digest, which would conflate NULL with
    genuinely empty clips in exact dedup."""
    t = pa.table({
        "clip_id": ["a", "b", "c"],
        "bytes": pa.array([b"xy", None, b""], type=pa.binary()),
    })
    out = fingerprint_batch(t)
    assert out["sha256_hex"][0].as_py() == hashlib.sha256(b"xy").hexdigest()
    assert out["sha256_hex"][1].as_py() is None
    assert out["md5_hex"][1].as_py() is None
    assert out["n_bytes"][1].as_py() is None
    # empty-but-present content still gets the empty digest
    assert out["sha256_hex"][2].as_py() == hashlib.sha256(b"").hexdigest()
    assert out["n_bytes"][2].as_py() == 0


def test_verify_integrity_many_mixed_algo_manifests(tmp_path):
    """Roots whose manifests record DIFFERENT algo sets must each be
    verified against their own set — and a tamper under the algo only
    one root records must still be caught whichever order the roots
    are passed in."""
    from dataflows_ray.functions.fingerprint import verify_integrity_many
    roots = []
    for i, algos in enumerate([("sha256", "md5"), ("sha256",)]):
        root = str(tmp_path / f"root{i}")
        os.makedirs(root)
        pq.write_table(_clip_table(n=4, seed=i),
                       os.path.join(root, "part-0.parquet"))
        build_integrity_manifest(root, algos=algos)
        roots.append(root)
    for order in (roots, roots[::-1]):
        assert verify_integrity_many(order)["ok"]
    # tamper root0's file: its manifest has md5, root1's does not —
    # the sweep must flag it regardless of root order
    victim = os.path.join(roots[0], "part-0.parquet")
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    for order in (roots, roots[::-1]):
        rep = verify_integrity_many(order)
        assert not rep["ok"] and rep["mismatched"] == ["part-0.parquet"]
    # requesting an algo a manifest lacks is a loud error, not a skip
    with pytest.raises(ValueError):
        verify_integrity_many(roots, algos=("md5",))


def test_fingerprint_hex_form_matches_duckdb():
    """hex_form digests must equal DuckDB's md5(hex(col)) / sha256(hex(col))
    — the canonical form the oracle-checked catalog query relies on."""
    t = _clip_table(n=8, seed=9)
    out = fingerprint_batch(t, hex_form=True)
    con = duckdb.connect()
    con.register("t", t)
    oracle = con.execute(
        "SELECT clip_id, md5(hex(bytes)) AS md5_hex, "
        "sha256(hex(bytes)) AS sha256_hex FROM t ORDER BY clip_id"
    ).fetch_arrow_table()
    assert out["md5_hex"].to_pylist() == oracle["md5_hex"].to_pylist()
    assert out["sha256_hex"].to_pylist() == oracle["sha256_hex"].to_pylist()


def test_fingerprint_stage_sliced_batches():
    """Digests must be correct on non-zero-offset Arrow slices (blocks
    mid-stream are slices of larger tables)."""
    t = _clip_table(n=32)
    ds = ray.data.from_arrow(t)
    out = content_fingerprint_stage(ds, batch_size=5).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    expected = fingerprint_batch(t).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    assert out.equals(expected)


def test_hash_file_and_manifest_roundtrip(tmp_path):
    root = str(tmp_path / "corpus")
    os.makedirs(root)
    for i in range(4):
        pq.write_table(_clip_table(n=8, seed=i),
                       os.path.join(root, f"part-{i}.parquet"))
    mpath = build_integrity_manifest(root)
    man = json.load(open(mpath))
    assert len(man["files"]) == 4
    # every digest matches an independent hashlib pass over file bytes
    for rel, exp in man["files"].items():
        raw = open(os.path.join(root, rel), "rb").read()
        assert exp["sha256"] == hashlib.sha256(raw).hexdigest()
        assert exp["bytes"] == len(raw)
    report = verify_integrity(root)
    assert report["ok"] and report["n_files"] == 4

    # tamper one byte -> flagged; delete one file -> missing
    victim = os.path.join(root, "part-2.parquet")
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    os.remove(os.path.join(root, "part-3.parquet"))
    report = verify_integrity(root)
    assert not report["ok"]
    assert report["mismatched"] == ["part-2.parquet"]
    assert report["missing"] == ["part-3.parquet"]


def test_sink_commit_records_digests_and_audit(tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceSink(out)
    stats = []
    for p in range(2):
        stats.append(sink.stage(0, p, _clip_table(n=6, seed=p)))
    sink.commit(0, stats, watermark_ms=100)
    man = sink.read_manifest()
    parts = man["epochs"][0]["partitions"]
    assert all("sha256" in p and "md5" in p and "file" in p for p in parts)
    report = audit_sink(out)
    assert report["ok"] and report["n_files"] == 2 and not report["unverifiable"]

    # bit-rot in a committed file is detected
    victim = os.path.join(out, "data", "epoch=0", parts[0]["file"])
    blob = bytearray(open(victim, "rb").read())
    blob[-1] ^= 0x01
    open(victim, "wb").write(bytes(blob))
    report = audit_sink(out)
    assert not report["ok"] and len(report["mismatched"]) == 1


def test_sink_compact_preserves_auditability(tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceSink(out)
    for e in range(5):
        st = sink.stage(e, 0, _clip_table(n=4, seed=e))
        sink.commit(e, [st], watermark_ms=e)
    sink.compact(target_epochs_per_file=2)
    report = audit_sink(out)
    assert report["ok"], report
    assert report["n_files"] == 3  # ceil(5/2) merged files
    assert not report["unverifiable"]
