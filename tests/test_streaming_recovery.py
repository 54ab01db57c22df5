"""Regression tests for the round-5 streaming exactly-once review:
grown-input epoch planning with misaligned unit counts, nested
re-compaction coverage, manifest/data pairing across compaction crashes,
the resume partition-count guard, all-null event-time watermarks, and
canonical column placement of expired unmatched join rows."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from dataflows_ray.streaming.join_state import (
    JoinStateActor, _deserialize_table)
from dataflows_ray.streaming.map_engine import StreamingMapEngine
from dataflows_ray.streaming.sink import ExactlyOnceSink


def _ids_table(start, n):
    return pa.table({
        "id": [f"id_{i:05d}" for i in range(start, start + n)],
        "seq": list(range(start, start + n)),
        "v": [float(i) for i in range(start, start + n)],
    })


def _map_engine(src, out, P=2):
    # lambda, not a module-level def: test modules aren't importable on
    # Ray workers, and cloudpickle ships lambdas by value
    return StreamingMapEngine(src, out, transform=lambda t: t,
                              key="id", ts_col="seq",
                              num_partitions=P, rowgroups_per_epoch=2)


def test_grown_input_misaligned_units_no_loss(tmp_path):
    """rowgroups_per_epoch=2 over 5 row groups commits a final 1-unit
    epoch; appending more units must NOT re-chunk that unit's neighbors
    into an already-committed epoch id (the pre-fix positional scheme
    silently dropped them). Every row lands exactly once."""
    src = str(tmp_path / "grow")
    os.makedirs(src)
    pq.write_table(_ids_table(0, 50),
                   os.path.join(src, "p000.parquet"), row_group_size=10)

    out = str(tmp_path / "sink")
    r1 = _map_engine(src, out).run()
    assert r1["committed_rows"] == 50

    # growth: 2 more row groups; unit 5 now shares a positional chunk
    # with committed unit 4
    pq.write_table(_ids_table(50, 20),
                   os.path.join(src, "p001.parquet"), row_group_size=10)
    r2 = _map_engine(src, out).run()
    assert r2["epochs_processed"] >= 1
    got = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(got) == 70
    assert got["id"].is_unique
    assert sorted(got["seq"]) == list(range(70))

    # a third run over the unchanged input is a pure no-op
    r3 = _map_engine(src, out).run()
    assert r3["epochs_processed"] == 0
    assert ExactlyOnceSink(out).committed_row_count() == 70


def _build_sink(out, n=8):
    s = ExactlyOnceSink(out)
    for e in range(n):
        st = s.stage(e, 0, pa.table({"k": [e], "v": [e * 10]}))
        s.commit(e, [st], watermark_ms=e, n_units=1)
    return s


def test_recompaction_preserves_covered_epochs(tmp_path):
    """compact() of an already-compacted manifest must keep EVERY
    original epoch id in compacted_from (and sum n_units), or a resumed
    run reprocesses the dropped ids."""
    out = str(tmp_path / "s")
    s = _build_sink(out, n=8)
    before = s.read_output().to_pandas().sort_values("k").reset_index(drop=True)
    s.compact(target_epochs_per_file=2)
    assert set(s.committed_epochs()) == set(range(8))
    s.compact(target_epochs_per_file=4)   # compaction of compactions
    assert set(s.committed_epochs()) == set(range(8))
    entries = s.read_manifest()["epochs"]
    assert sum(e["n_units"] for e in entries) == 8
    after = s.read_output().to_pandas().sort_values("k").reset_index(drop=True)
    assert after.equals(before)


def test_compact_crash_before_manifest_promote(tmp_path, monkeypatch):
    """Crash AFTER the data-dir swap but BEFORE the manifest rewrite
    lands: recovery must pair the surviving (compacted) data layout with
    the staged compacted manifest — digests in the manifest must match
    the files on disk."""
    from dataflows_ray.functions.fingerprint import audit_sink

    out = str(tmp_path / "s")
    s = _build_sink(out, n=6)
    before = s.read_output().to_pandas().sort_values("k").reset_index(drop=True)

    def boom(self):
        raise RuntimeError("injected crash before manifest promote")

    monkeypatch.setattr(ExactlyOnceSink, "_promote_compact_manifest", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        s.compact(target_epochs_per_file=3)
    monkeypatch.undo()

    s2 = ExactlyOnceSink(out)   # startup recovery
    after = s2.read_output().to_pandas().sort_values("k").reset_index(drop=True)
    assert after.equals(before)
    assert set(s2.committed_epochs()) == set(range(6))
    assert not os.path.exists(os.path.join(out, "manifest.json.compact"))
    assert not os.path.exists(os.path.join(out, "data.old"))
    rep = audit_sink(out)       # lineage digests match surviving files
    assert rep["ok"], rep


def test_stale_staged_manifest_discarded(tmp_path):
    """A staged compacted manifest with NO swap in progress (crash right
    after staging it) must be rolled back, leaving the committed
    manifest untouched."""
    out = str(tmp_path / "s")
    s = _build_sink(out, n=3)
    manifest_before = s.read_manifest()
    with open(os.path.join(out, "manifest.json.compact"), "w") as f:
        json.dump({"epochs": []}, f)
    s2 = ExactlyOnceSink(out)
    assert s2.read_manifest() == manifest_before
    assert not os.path.exists(os.path.join(out, "manifest.json.compact"))


def test_resume_partition_count_mismatch_raises(tmp_path):
    """Operator state is hash-partitioned: resuming a crashed run with a
    different num_partitions must fail loudly (silently dropping or
    mis-routing restored partitions corrupts exactly-once output)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(_ids_table(0, 40),
                   os.path.join(src, "p000.parquet"), row_group_size=10)
    out = str(tmp_path / "sink")
    with pytest.raises(RuntimeError, match="injected crash"):
        _map_engine(src, out, P=2).run(crash_after_stage_of_epoch=1)
    with pytest.raises(ValueError, match="num_partitions"):
        _map_engine(src, out, P=3).run()
    # resume with the ORIGINAL partition count completes exactly-once
    _map_engine(src, out, P=2).run()
    got = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(got) == 40 and got["id"].is_unique


def test_all_null_event_time_does_not_crash_split(tmp_path):
    """Rows whose event-time column is entirely null in some partition
    chunk must contribute nothing to the watermark — not raise
    TypeError (pc.max of an all-null column is a null scalar)."""
    from dataflows_ray.streaming.audio import synth_clip_batch
    from dataflows_ray.streaming.engine import StreamingJoinEngine

    t = synth_clip_batch(0, 30)
    idx = t.column_names.index("transcript_event_ms")
    t = t.set_column(idx, "transcript_event_ms",
                     pa.nulls(len(t), type=t["transcript_event_ms"].type))
    src = str(tmp_path / "audio")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "p000.parquet"), row_group_size=10)

    out = str(tmp_path / "sink")
    r = StreamingJoinEngine(src, out, num_partitions=2,
                            rowgroups_per_epoch=1, allowed_lateness_ms=0,
                            emit_unmatched=True).run()
    # clip and transcript of each row share a clip_id -> all match
    assert r["committed_rows"] == 30
    df = ExactlyOnceSink(out).read_output().to_pandas()
    assert df["clip_id"].nunique() == 30
    assert df["transcript"].notna().all()


def test_join_engine_grown_input_incremental(tmp_path):
    """The stream-stream join engine (now on the shared MicroBatchEngine
    loop) over a GROWN input: appended clips become new epochs, process
    incrementally, and every clip still emits exactly once."""
    from dataflows_ray.streaming.audio import synth_clip_batch
    from dataflows_ray.streaming.engine import StreamingJoinEngine

    src = str(tmp_path / "audio")
    os.makedirs(src)
    pq.write_table(synth_clip_batch(0, 30),
                   os.path.join(src, "p000.parquet"), row_group_size=10)
    out = str(tmp_path / "sink")

    def make():
        return StreamingJoinEngine(src, out, num_partitions=2,
                                   rowgroups_per_epoch=2,
                                   allowed_lateness_ms=0,
                                   emit_unmatched=True)

    r1 = make().run()
    assert ExactlyOnceSink(out).read_output().to_pandas()[
        "clip_id"].nunique() == 30

    # growth: 20 more clips, misaligned with rowgroups_per_epoch
    pq.write_table(synth_clip_batch(30, 20),
                   os.path.join(src, "p001.parquet"), row_group_size=10)
    r2 = make().run()
    assert r2["epochs_processed"] >= 1
    df = ExactlyOnceSink(out).read_output().to_pandas()
    # every clip surfaces; matched rows are unique per clip
    assert df["clip_id"].nunique() == 50
    matched = df[df["transcript"].notna() & df["speaker"].notna()]
    assert matched["clip_id"].is_unique


def test_join_engine_ships_audio_bytes_when_asked(tmp_path):
    """include_audio_bytes=True threads 'bytes' through the columns()
    hook into the split read — every committed row carries its payload."""
    from dataflows_ray.streaming.audio import synth_clip_batch
    from dataflows_ray.streaming.engine import StreamingJoinEngine

    src = str(tmp_path / "audio")
    os.makedirs(src)
    pq.write_table(synth_clip_batch(0, 20),
                   os.path.join(src, "p000.parquet"), row_group_size=10)
    out = str(tmp_path / "sink")
    StreamingJoinEngine(src, out, num_partitions=2, rowgroups_per_epoch=2,
                        include_audio_bytes=True).run()
    df = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(df) == 20 and df["bytes"].notna().all()


def test_unmatched_rows_canonical_side_placement(tmp_path):
    """Expired-unmatched LEFT rows keep their left columns; expired
    RIGHT rows land in transcript/event_ms_r with left columns null —
    even though both sides' ts columns share the name 'event_ms'."""
    actor = JoinStateActor.remote(0, emit_unmatched=True)
    left = pa.table({"clip_id": ["a"], "speaker": ["s1"],
                     "event_ms": pa.array([100], type=pa.int64())})
    right = pa.table({"clip_id": ["b"], "transcript": ["hello"],
                      "event_ms": pa.array([200], type=pa.int64())})
    raw, m = ray.get(actor.process.remote(left, right, -1))
    assert m["matched"] == 0
    raw, m = ray.get(actor.process.remote(None, None, 10_000))
    assert m["expired"] == 2
    out = _deserialize_table(raw).to_pandas().set_index("clip_id")
    assert list(out.columns) == ["speaker", "event_ms",
                                 "transcript", "event_ms_r"]
    l, r = out.loc["a"], out.loc["b"]
    assert l["speaker"] == "s1" and l["event_ms"] == 100
    assert pd.isna(l["transcript"]) and pd.isna(l["event_ms_r"])
    assert r["transcript"] == "hello" and r["event_ms_r"] == 200
    assert pd.isna(r["speaker"]) and pd.isna(r["event_ms"])
    ray.kill(actor)
