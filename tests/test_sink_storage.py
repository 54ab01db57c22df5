"""Sink storage abstraction: URI roots + prefix-swap resume.

The exactly-once sink assumed a shared POSIX path; on a real cluster
the root is an object-store prefix (or a shared mount seen at different
local paths per node). These tests drive the FULL sink lifecycle —
stage/commit, crash resume, snapshots, compaction, integrity audit —
through a `swapfs://` URI whose mount table is re-pointed mid-test,
simulating a resumed driver on a different node."""

import os
import shutil

import pyarrow as pa
import pytest

from dataflows_ray.functions.fingerprint import audit_sink
from dataflows_ray.streaming.audio import write_audio_dataset
from dataflows_ray.streaming.engine import StreamingJoinEngine
from dataflows_ray.streaming.sink import ExactlyOnceSink
from dataflows_ray.streaming.storage import (LocalStorage, RemappedStorage,
                                             SinkStorage)


def _table(n=5, seed=0):
    return pa.table({"k": list(range(seed, seed + n)),
                     "v": [f"r{seed}-{i}" for i in range(n)]})


def test_storage_resolve():
    st = SinkStorage.resolve("/tmp/x/y")
    assert isinstance(st, LocalStorage) and st.local_path("a/b") == "/tmp/x/y/a/b"
    st = SinkStorage.resolve("file:///tmp/x")
    assert isinstance(st, LocalStorage) and st.local_path("") == "/tmp/x"
    with pytest.raises(ValueError, match="no sink storage backend"):
        SinkStorage.resolve("s3://bucket/key")
    with pytest.raises(ValueError, match="not mounted"):
        SinkStorage.resolve("swapfs://nosuch/table")


def test_sink_lifecycle_through_uri(tmp_path):
    RemappedStorage.mount("bktA", str(tmp_path / "mountA"))
    try:
        uri = "swapfs://bktA/tables/t1"
        sink = ExactlyOnceSink(uri)
        for e in range(4):
            st = sink.stage(e, 0, _table(seed=e))
            sink.commit(e, [st], watermark_ms=e * 10,
                        state_snapshots={"epoch": e})
        assert sink.committed_epochs() == [0, 1, 2, 3]
        assert sink.committed_row_count() == 20
        assert sink.latest_state() == {"epoch": 3}
        assert sink.read_output().count() == 20
        assert audit_sink(uri)["ok"]
        # compaction + crash-recovery swap machinery through the backend
        rep = sink.compact(target_epochs_per_file=2)
        assert rep["files_after"] == 2
        sink2 = ExactlyOnceSink(uri)
        assert sink2.committed_epochs() == [0, 1, 2, 3]
        assert sink2.read_output().count() == 20
        assert audit_sink(uri)["ok"]
    finally:
        RemappedStorage.unmount("bktA")


def test_prefix_swap_resume(tmp_path):
    """Commit through mount A, re-point the bucket to mount B (the same
    bytes at a different local path — a different node's view of the
    shared store), and resume: committed epochs are visible, the rerun
    is a no-op, snapshots load, output and audit are intact."""
    audio = str(tmp_path / "audio")
    write_audio_dataset(audio, 600, rows_per_file=300)
    mount_a = str(tmp_path / "mountA")
    mount_b = str(tmp_path / "mountB")
    RemappedStorage.mount("bkt", mount_a)
    try:
        uri = "swapfs://bkt/stream/out"
        eng = StreamingJoinEngine(audio, uri, num_partitions=2,
                                  rowgroups_per_epoch=1)
        eng.run()
        rows = ExactlyOnceSink(uri).committed_row_count()
        assert rows == 600
        epochs_a = ExactlyOnceSink(uri).committed_epochs()

        # the swap: same bucket bytes now visible at a different mount
        shutil.move(mount_a, mount_b)
        RemappedStorage.mount("bkt", mount_b)

        sink_b = ExactlyOnceSink(uri)
        assert sink_b.committed_epochs() == epochs_a
        assert sink_b.committed_row_count() == 600
        assert sink_b.latest_state() is not None  # snapshot key resolves
        # resumed engine on the "other node": everything committed -> no-op
        eng2 = StreamingJoinEngine(audio, uri, num_partitions=2,
                                   rowgroups_per_epoch=1)
        eng2.run()
        df = sink_b.read_output().to_pandas()
        assert len(df) == 600 and df["clip_id"].nunique() == 600
        report = audit_sink(uri)
        assert report["ok"] and report["n_files"] > 0
    finally:
        RemappedStorage.unmount("bkt")
