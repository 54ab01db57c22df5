"""Streaming layer: synth determinism, PCM decode SNR, windows, the
stateful stream-stream join engine, and exactly-once crash/resume."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from dataflows_ray.streaming.audio import (
    decode_pcm, encode_pcm16, regen_clip, snr_db, synth_clip_batch,
    write_audio_dataset)
from dataflows_ray.streaming.engine import StreamingJoinEngine
from dataflows_ray.streaming.sink import ExactlyOnceSink
from dataflows_ray.streaming.windows import (
    assign_session, assign_sliding, assign_tumbling)
from dataflows_ray.pipelines.audio import decode_stage, windowed_speaker_aggregate


def test_synth_deterministic():
    a = synth_clip_batch(100, 5)
    b = synth_clip_batch(100, 5)
    assert a.equals(b)
    # shard-independence: generating [100,105) row-by-row matches the batch
    c = pa.concat_tables([synth_clip_batch(100 + i, 1) for i in range(5)])
    assert a.equals(c)


def test_pcm_decode_snr():
    t = synth_clip_batch(0, 10)
    for row in t.to_pylist():
        wave = decode_pcm(row["bytes"], row["codec"])
        # re-encode/decode round trip: SNR far above the 30 dB bar
        wave2 = decode_pcm(encode_pcm16(wave), "pcm16")
        assert snr_db(wave, wave2) >= 30
        assert len(wave) == int(row["sr_hz"] * row["dur_ms"] / 1000)


def test_per_row_invariant_vs_regenerated_reference():
    # input_hint invariant: decoded-PCM allclose (SNR>=30dB) + transcript eq
    t = synth_clip_batch(50, 5)
    for i, row in enumerate(t.to_pylist()):
        ref = regen_clip(50 + i)
        assert ref["transcript"] == row["transcript"]
        w1 = decode_pcm(row["bytes"], row["codec"])
        w2 = decode_pcm(ref["bytes"], ref["codec"])
        assert snr_db(w1, w2) >= 30


def _ts_ds(ts_list, key="k"):
    return ray.data.from_arrow(pa.table({
        "k": [key] * len(ts_list), "event_ms": ts_list}))


def test_tumbling_window():
    ds = assign_tumbling(_ts_ds([0, 500, 999, 1000, 2500]), "event_ms", 1000)
    rows = sorted(ds.take_all(), key=lambda r: r["event_ms"])
    assert [r["window_start"] for r in rows] == [0, 0, 0, 1000, 2000]
    assert [r["window_end"] for r in rows] == [1000, 1000, 1000, 2000, 3000]


def test_sliding_window():
    ds = assign_sliding(_ts_ds([0, 1500]), "event_ms", 2000, 1000)
    rows = ds.take_all()
    by_ts = {}
    for r in rows:
        by_ts.setdefault(r["event_ms"], []).append(r["window_start"])
    assert sorted(by_ts[0]) == [0]          # windows (-1000,0] clipped at 0
    assert sorted(by_ts[1500]) == [0, 1000]


def test_session_window():
    ds = _ts_ds([0, 100, 5000, 5100, 20000])
    out = assign_session(ds, ["k"], "event_ms", gap_ms=2000)
    rows = sorted(out.take_all(), key=lambda r: r["event_ms"])
    starts = [r["window_start"] for r in rows]
    assert starts == [0, 0, 5000, 5000, 20000]
    assert rows[0]["window_end"] == 100 + 2000


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("audio"))
    write_audio_dataset(d, 2000, rows_per_file=500)
    return d


def test_streaming_join_end_to_end(audio_dir, tmp_path):
    out = str(tmp_path / "sink")
    eng = StreamingJoinEngine(audio_dir, out, num_partitions=4,
                              rowgroups_per_epoch=1)
    metrics = eng.run()
    # every clip has exactly one transcript -> exactly n_clips joined rows
    sink = ExactlyOnceSink(out)
    res = sink.read_output()
    assert res.count() == 2000
    df = res.to_pandas()
    assert df["clip_id"].nunique() == 2000      # no dupes (exactly-once)
    assert df["transcript"].notna().all()        # all matched


def test_exactly_once_crash_resume(audio_dir, tmp_path):
    out = str(tmp_path / "sink2")
    eng = StreamingJoinEngine(audio_dir, out, num_partitions=2,
                              rowgroups_per_epoch=1)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.run(crash_after_stage_of_epoch=2)
    committed_before = set(ExactlyOnceSink(out).committed_epochs())
    assert 2 not in committed_before  # epoch 2 staged but not committed
    # resume: fresh engine instance (fresh actors) replays from manifest
    eng2 = StreamingJoinEngine(audio_dir, out, num_partitions=2,
                               rowgroups_per_epoch=1)
    eng2.run()
    sink = ExactlyOnceSink(out)
    df = sink.read_output().to_pandas()
    assert len(df) == 2000
    assert df["clip_id"].nunique() == 2000  # exactly-once: no dupes, no loss


def test_decode_stage_with_snr_validation(audio_dir):
    ds = ray.data.read_parquet(audio_dir).limit(50)
    out = decode_stage(ds, concurrency=2, batch_size=16, validate_snr=True)
    rows = out.take_all()
    assert all(r["snr_db"] >= 30 for r in rows)
    assert all(r["n_samples"] > 0 for r in rows)


def test_windowed_speaker_aggregate(audio_dir):
    ds = ray.data.read_parquet(
        audio_dir, columns=["speaker", "event_ms", "dur_ms"])
    agg = windowed_speaker_aggregate(ds, window_ms=600_000)
    df = agg.to_pandas()
    assert df["n_clips"].sum() == 2000
    # every (speaker, window) unique after the salt-merge stage
    assert not df.duplicated(["speaker", "window_start"]).any()


def test_exactly_once_crash_sweep(audio_dir, tmp_path):
    """Crash at EVERY epoch boundary; each resumed run must converge to
    the clean run's committed row count with unique clip_ids."""
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.engine import StreamingJoinEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    clean_dir = str(tmp_path / "clean")
    clean = StreamingJoinEngine(audio_dir, clean_dir, num_partitions=2,
                                rowgroups_per_epoch=1)
    clean_rows = clean.run()["committed_rows"]

    n_epochs = len(clean.plan_epochs())
    assert n_epochs >= 2
    for crash_at in range(n_epochs):
        out = str(tmp_path / f"crash_{crash_at}")
        eng = StreamingJoinEngine(audio_dir, out, num_partitions=2,
                                  rowgroups_per_epoch=1)
        try:
            eng.run(crash_after_stage_of_epoch=crash_at)
            assert False, "expected injected crash"
        except RuntimeError:
            pass
        resumed = StreamingJoinEngine(audio_dir, out, num_partitions=2,
                                      rowgroups_per_epoch=1)
        r = resumed.run()
        assert r["committed_rows"] == clean_rows, crash_at
        got = ExactlyOnceSink(out).read_output().to_pandas()
        assert got["clip_id"].is_unique


def test_tight_watermark_emits_unmatched_without_loss(audio_dir, tmp_path):
    """With allowed lateness below the transcript lag, some rows expire
    unmatched — but nothing is LOST: every clip_id still appears exactly
    once in the committed output (outer-join exactly-once)."""
    import ray.data
    from dataflows_ray.streaming.engine import StreamingJoinEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    out = str(tmp_path / "tight")
    eng = StreamingJoinEngine(audio_dir, out, num_partitions=2,
                              rowgroups_per_epoch=1,
                              allowed_lateness_ms=0, emit_unmatched=True)
    eng.run()
    df = ExactlyOnceSink(out).read_output().to_pandas()
    n_clips = ray.data.read_parquet(audio_dir).count()
    # no loss: every clip id surfaces (matched, or expired-unmatched on
    # either side — an unmatched clip and its late transcript may emit
    # separately, so we assert coverage, not row count)
    assert df["clip_id"].nunique() == n_clips


def _sorted_audio_copy(audio_dir, dest, rows_per_file=100):
    """Event-time-ordered copy of the audio table (a real stream arrives
    roughly time-ordered; the synthetic table is written in clip-id
    order)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    files = sorted(os.path.join(audio_dir, f) for f in os.listdir(audio_dir)
                   if f.endswith(".parquet"))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    tbl = tbl.take(pa.compute.sort_indices(
        tbl, sort_keys=[("event_ms", "ascending")]))
    os.makedirs(dest, exist_ok=True)
    for i in range(0, len(tbl), rows_per_file):
        pq.write_table(tbl.slice(i, rows_per_file),
                       os.path.join(dest, f"part-{i // rows_per_file:05d}.parquet"))
    return dest


def test_streaming_window_engine_matches_batch(audio_dir, tmp_path):
    """Over a time-ordered stream, the streaming windowed aggregate
    (watermark-triggered incremental emission) must produce exactly the
    batch operator's result, with zero late drops."""
    import ray.data
    from dataflows_ray.streaming.window_engine import StreamingWindowEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    from dataflows_ray.pipelines.audio import windowed_speaker_aggregate

    audio_dir = _sorted_audio_copy(audio_dir, str(tmp_path / "sorted"))
    out = str(tmp_path / "win")
    eng = StreamingWindowEngine(audio_dir, out, num_partitions=2,
                                rowgroups_per_epoch=1, window_ms=600_000)
    eng.run()
    # incremental emission really happened: >1 committed epoch has rows,
    # and the ordered stream produced zero late drops
    man = ExactlyOnceSink(out).read_manifest()
    epochs_with_rows = sum(
        1 for e in man["epochs"]
        if sum(p.get("rows", 0) for p in e.get("partitions", [])) > 0)
    assert epochs_with_rows > 1
    assert all(p.get("late_dropped", 0) == 0
               for e in man["epochs"] for p in e.get("partitions", []))
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values(["speaker", "window_start"]).reset_index(drop=True)

    batch = windowed_speaker_aggregate(
        ray.data.read_parquet(audio_dir).select_columns(
            ["speaker", "event_ms", "dur_ms"]),
        window_ms=600_000).to_pandas() \
        .sort_values(["speaker", "window_start"]).reset_index(drop=True)

    assert len(got) == len(batch)
    assert list(got["speaker"]) == list(batch["speaker"])
    assert list(got["window_start"]) == list(batch["window_start"])
    assert list(got["total_dur_ms"]) == list(batch["total_dur_ms"])
    assert list(got["n_clips"]) == list(batch["n_clips"])
    assert list(got["max_event_ms"]) == list(batch["max_event_ms"])


def test_streaming_window_engine_crash_resume(audio_dir, tmp_path):
    from dataflows_ray.streaming.window_engine import StreamingWindowEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    clean_out = str(tmp_path / "clean")
    clean = StreamingWindowEngine(audio_dir, clean_out, num_partitions=2,
                                  rowgroups_per_epoch=1)
    clean_rows = clean.run()["committed_rows"]

    out = str(tmp_path / "crash")
    eng = StreamingWindowEngine(audio_dir, out, num_partitions=2,
                                rowgroups_per_epoch=1)
    try:
        eng.run(crash_after_stage_of_epoch=1)
        assert False
    except RuntimeError:
        pass
    resumed = StreamingWindowEngine(audio_dir, out, num_partitions=2,
                                    rowgroups_per_epoch=1)
    r = resumed.run()
    assert r["committed_rows"] == clean_rows
    # rerun over the fully committed sink is a no-op
    again = StreamingWindowEngine(audio_dir, out, num_partitions=2,
                                  rowgroups_per_epoch=1)
    r2 = again.run()
    assert r2["epochs_processed"] == 0
    assert r2["committed_rows"] == clean_rows


def test_streaming_session_engine_matches_batch(audio_dir, tmp_path):
    """Over a time-ordered stream, the streaming session-window engine
    (gap merge in per-partition state, watermark finalization) must
    reproduce the batch gaps-and-islands result, with zero late drops."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.window_engine import StreamingSessionEngine

    GAP = 120_000
    sorted_dir = _sorted_audio_copy(audio_dir, str(tmp_path / "sorted"))
    out = str(tmp_path / "sess")
    eng = StreamingSessionEngine(sorted_dir, out, num_partitions=2,
                                 rowgroups_per_epoch=1, gap_ms=GAP)
    eng.run()
    man = ExactlyOnceSink(out).read_manifest()
    epochs_with_rows = sum(
        1 for e in man["epochs"]
        if sum(p.get("rows", 0) for p in e.get("partitions", [])) > 0)
    assert epochs_with_rows > 1  # incremental emission really happened
    assert all(p.get("late_dropped", 0) == 0
               for e in man["epochs"] for p in e.get("partitions", []))
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values(["speaker", "window_start"]).reset_index(drop=True)

    # ground truth: pandas gaps-and-islands over the same rows
    files = sorted(glob.glob(os.path.join(audio_dir, "*.parquet")))
    df = pa.concat_tables(
        [pq.read_table(f, columns=["speaker", "event_ms", "dur_ms"])
         for f in files]).to_pandas()
    df = df.sort_values(["speaker", "event_ms"]).reset_index(drop=True)
    new = (df["speaker"] != df["speaker"].shift()) | \
        (df["event_ms"] - df["event_ms"].shift() >= GAP)
    grp = new.cumsum()
    exp = df.groupby(grp).agg(
        speaker=("speaker", "first"), window_start=("event_ms", "min"),
        window_end=("event_ms", "max"), total_dur_ms=("dur_ms", "sum"),
        n_clips=("dur_ms", "count")).reset_index(drop=True)
    exp["window_end"] += GAP
    exp = exp.sort_values(["speaker", "window_start"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for c in ["speaker", "window_start", "window_end", "total_dur_ms",
              "n_clips"]:
        assert list(got[c]) == list(exp[c]), c


def test_streaming_session_engine_crash_resume(audio_dir, tmp_path):
    from dataflows_ray.streaming.window_engine import StreamingSessionEngine

    clean_out = str(tmp_path / "clean")
    clean = StreamingSessionEngine(audio_dir, clean_out, num_partitions=2,
                                   rowgroups_per_epoch=1)
    clean_rows = clean.run()["committed_rows"]

    out = str(tmp_path / "crash")
    eng = StreamingSessionEngine(audio_dir, out, num_partitions=2,
                                 rowgroups_per_epoch=1)
    with pytest.raises(RuntimeError):
        eng.run(crash_after_stage_of_epoch=1)
    resumed = StreamingSessionEngine(audio_dir, out, num_partitions=2,
                                     rowgroups_per_epoch=1)
    r = resumed.run()
    assert r["committed_rows"] == clean_rows
    again = StreamingSessionEngine(audio_dir, out, num_partitions=2,
                                   rowgroups_per_epoch=1)
    r2 = again.run()
    assert r2["epochs_processed"] == 0
    assert r2["committed_rows"] == clean_rows


@pytest.fixture(scope="module")
def cep_events_dir(tmp_path_factory):
    """Small time-ordered typed-event stream for the CEP engine."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 3000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "ms": pa.array(np.sort(rng.integers(0, 50_000_000, n))
                       .astype(np.int64)),
        "event_type": pa.array(
            rng.choice(["click", "purchase", "view"], n,
                       p=[0.4, 0.3, 0.3])),
    })
    d = str(tmp_path_factory.mktemp("cepev"))
    for i in range(0, n, 300):
        pq.write_table(tbl.slice(i, 300),
                       os.path.join(d, f"part-{i // 300:05d}.parquet"))
    return d


def test_streaming_cep_matches_bruteforce(cep_events_dir, tmp_path):
    """The streaming CEP engine must emit exactly the (click, purchase
    within T, same user) pairs a brute-force join produces — each pair
    exactly once — over an in-order stream with zero late drops."""
    import glob

    import pyarrow.parquet as pq
    from dataflows_ray.streaming.cep_engine import StreamingCepEngine

    WITHIN = 600_000
    out = str(tmp_path / "cep")
    eng = StreamingCepEngine(cep_events_dir, out, num_partitions=2,
                             rowgroups_per_epoch=1, key="user_id",
                             ts_col="ms", type_col="event_type",
                             id_col="event_id", first_type="click",
                             second_type="purchase", within=WITHIN)
    eng.run()
    man = ExactlyOnceSink(out).read_manifest()
    epochs_with_rows = sum(
        1 for e in man["epochs"]
        if sum(p.get("rows", 0) for p in e.get("partitions", [])) > 0)
    assert epochs_with_rows > 1
    assert all(p.get("late_dropped", 0) == 0
               for e in man["epochs"] for p in e.get("partitions", []))
    got = ExactlyOnceSink(out).read_output().to_pandas()

    files = sorted(glob.glob(os.path.join(cep_events_dir, "*.parquet")))
    df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    a = df[df["event_type"] == "click"]
    b = df[df["event_type"] == "purchase"]
    m = a.merge(b, on="user_id", suffixes=("", "_r"))
    m = m[(m["ms_r"] >= m["ms"]) & (m["ms_r"] <= m["ms"] + WITHIN)]

    assert len(got) == len(m)
    assert set(zip(got["event_id"], got["event_id_r"])) == \
        set(zip(m["event_id"], m["event_id_r"]))
    # emitted exactly once: no duplicate pairs
    assert len(got) == len(set(zip(got["event_id"], got["event_id_r"])))


def test_streaming_cep_crash_resume(cep_events_dir, tmp_path):
    from dataflows_ray.streaming.cep_engine import StreamingCepEngine

    kw = dict(num_partitions=2, rowgroups_per_epoch=1, key="user_id",
              ts_col="ms", type_col="event_type", id_col="event_id",
              first_type="click", second_type="purchase", within=600_000)
    clean_out = str(tmp_path / "clean")
    clean_rows = StreamingCepEngine(
        cep_events_dir, clean_out, **kw).run()["committed_rows"]

    out = str(tmp_path / "crash")
    eng = StreamingCepEngine(cep_events_dir, out, **kw)
    with pytest.raises(RuntimeError):
        eng.run(crash_after_stage_of_epoch=2)
    r = StreamingCepEngine(cep_events_dir, out, **kw).run()
    assert r["committed_rows"] == clean_rows
    r2 = StreamingCepEngine(cep_events_dir, out, **kw).run()
    assert r2["epochs_processed"] == 0
    assert r2["committed_rows"] == clean_rows


def test_streaming_sliding_engine_matches_batch(audio_dir, tmp_path):
    """Streaming sliding windows (replication in the split-task combiner)
    must reproduce the batch UNION-ALL replication result."""
    import glob

    import pyarrow.parquet as pq
    from dataflows_ray.streaming.window_engine import StreamingSlidingEngine

    SIZE, SLIDE = 1_200_000, 600_000
    sorted_dir = _sorted_audio_copy(audio_dir, str(tmp_path / "sorted"))
    out = str(tmp_path / "slide")
    eng = StreamingSlidingEngine(sorted_dir, out, num_partitions=2,
                                 rowgroups_per_epoch=1, size_ms=SIZE,
                                 slide_ms=SLIDE)
    eng.run()
    man = ExactlyOnceSink(out).read_manifest()
    assert all(p.get("late_dropped", 0) == 0
               for e in man["epochs"] for p in e.get("partitions", []))
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values(["speaker", "window_start"]).reset_index(drop=True)

    files = sorted(glob.glob(os.path.join(audio_dir, "*.parquet")))
    df = pa.concat_tables(
        [pq.read_table(f, columns=["speaker", "event_ms", "dur_ms"])
         for f in files]).to_pandas()
    import pandas as pd
    rep = pd.concat([
        df.assign(window_start=(df["event_ms"] // SLIDE) * SLIDE),
        df.assign(window_start=(df["event_ms"] // SLIDE) * SLIDE - SLIDE),
    ], ignore_index=True)
    rep = rep[rep["window_start"] >= 0]
    exp = rep.groupby(["speaker", "window_start"]).agg(
        total_dur_ms=("dur_ms", "sum"), n_clips=("dur_ms", "count"),
        max_event_ms=("event_ms", "max")).reset_index() \
        .sort_values(["speaker", "window_start"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for c in ["speaker", "window_start", "total_dur_ms", "n_clips",
              "max_event_ms"]:
        assert list(got[c]) == list(exp[c]), c


def _docs_stream_dir(dest: str, n_files: int = 4, per_file: int = 50):
    """Id-ordered document stream with duplicates planted both within a
    file and ACROSS files (later files repeat earlier content — the case
    that requires cross-epoch seen-state)."""
    import pyarrow.parquet as pq
    os.makedirs(dest, exist_ok=True)
    texts = [f"unique document number {i} with some filler words"
             for i in range(n_files * per_file)]
    doc_id = 0
    for f in range(n_files):
        rows_text, rows_id = [], []
        for j in range(per_file):
            i = f * per_file + j
            if j % 10 == 7 and f > 0:
                # duplicate of a doc from an EARLIER file
                rows_text.append(texts[(f - 1) * per_file + j])
            elif j % 10 == 8:
                # duplicate of the previous row (same file)
                rows_text.append(rows_text[-1])
            else:
                rows_text.append(texts[i])
            rows_id.append(doc_id)
            doc_id += 1
        tbl = pa.table({"doc_id": pa.array(rows_id, type=pa.int64()),
                        "text": pa.array(rows_text)})
        pq.write_table(tbl, os.path.join(dest, f"part-{f:05d}.parquet"),
                       row_group_size=25)
    return dest


def test_streaming_dedup_matches_batch(tmp_path):
    """First-seen streaming dedup over an id-ordered stream == batch
    min-doc_id-per-text; duplicates across epochs are caught by the
    persistent seen-state."""
    import glob
    from dataflows_ray.streaming.dedup_engine import StreamingDedupEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    src = _docs_stream_dir(str(tmp_path / "docs"))
    out = str(tmp_path / "dedup")
    eng = StreamingDedupEngine(src, out, num_partitions=2,
                               rowgroups_per_epoch=1)
    res = eng.run()
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    exp = df.loc[df.groupby("text")["doc_id"].idxmin()] \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["text"]) == list(exp["text"])
    assert res["committed_rows"] == len(exp)
    # duplicates were planted, so some must have been dropped
    assert len(exp) < len(df)


def test_streaming_dedup_crash_resume(tmp_path):
    """Crash at every epoch; a resumed run must neither re-emit (the
    seen-state snapshot restores) nor lose rows."""
    from dataflows_ray.streaming.dedup_engine import StreamingDedupEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    src = _docs_stream_dir(str(tmp_path / "docs"))
    clean_out = str(tmp_path / "clean")
    clean = StreamingDedupEngine(src, clean_out, num_partitions=2,
                                 rowgroups_per_epoch=1)
    clean_rows = clean.run()["committed_rows"]

    for crash_at in (0, 2):
        out = str(tmp_path / f"crash{crash_at}")
        eng = StreamingDedupEngine(src, out, num_partitions=2,
                                   rowgroups_per_epoch=1)
        try:
            eng.run(crash_after_stage_of_epoch=crash_at)
            assert False
        except RuntimeError:
            pass
        resumed = StreamingDedupEngine(src, out, num_partitions=2,
                                       rowgroups_per_epoch=1)
        r = resumed.run()
        assert r["committed_rows"] == clean_rows
        ids = ExactlyOnceSink(out).read_output().to_pandas()["doc_id"]
        assert ids.is_unique
        again = StreamingDedupEngine(src, out, num_partitions=2,
                                     rowgroups_per_epoch=1)
        r2 = again.run()
        assert r2["epochs_processed"] == 0
        assert r2["committed_rows"] == clean_rows


def test_lance_io_parquet_fallback(tmp_path):
    """Without the lance package, epoch planning and unit reads degrade
    to parquet row groups with identical semantics."""
    import pyarrow.parquet as pq
    from dataflows_ray.sources import lance_io

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    t = pa.table({"x": list(range(100))})
    pq.write_table(t, os.path.join(d, "a.parquet"), row_group_size=25)
    pq.write_table(t, os.path.join(d, "b.parquet"), row_group_size=50)

    epochs = lance_io.plan_stream_epochs(d, 2)
    units = [u for e in epochs for u in e]
    assert len(units) == 6  # 4 + 2 row groups
    assert all("row_group" in u for u in units)
    total = sum(len(lance_io.read_stream_unit(u)) for u in units)
    assert total == 200
    got = lance_io.read_stream_unit(units[0], columns=["x"])
    assert got.column_names == ["x"] and len(got) == 25
    # a lance-looking path without the library raises cleanly
    if not lance_io.lance_available():
        with pytest.raises(ImportError):
            lance_io.plan_stream_epochs("/nonexistent/tbl.lance", 1)


def test_streaming_topk_engine_matches_batch(audio_dir, tmp_path):
    """Over a time-ordered stream, the streaming windowed top-k must
    equal the batch row_number()-style ranking, emitted incrementally
    with zero late drops."""
    import pandas as pd
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.topk_engine import StreamingTopKEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    sorted_dir = _sorted_audio_copy(audio_dir, str(tmp_path / "sorted"))
    out = str(tmp_path / "topk")
    eng = StreamingTopKEngine(sorted_dir, out, num_partitions=3,
                              rowgroups_per_epoch=1, window_ms=60_000, k=5)
    eng.run()

    man = ExactlyOnceSink(out).read_manifest()
    epochs_with_rows = sum(
        1 for e in man["epochs"]
        if sum(p.get("rows", 0) for p in e.get("partitions", [])) > 0)
    assert epochs_with_rows > 1  # incremental emission really happened
    assert all(p.get("late_dropped", 0) == 0
               for e in man["epochs"] for p in e.get("partitions", []))

    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values(["window_start", "rank"]).reset_index(drop=True)

    files = sorted(os.path.join(sorted_dir, f)
                   for f in os.listdir(sorted_dir) if f.endswith(".parquet"))
    df = pa.concat_tables([pq.read_table(f, columns=["speaker", "event_ms"])
                           for f in files]).to_pandas()
    df["window_start"] = (df["event_ms"] // 60_000) * 60_000
    counts = df.groupby(["window_start", "speaker"]) \
        .size().rename("n_clips").reset_index() \
        .sort_values(["window_start", "n_clips", "speaker"],
                     ascending=[True, False, True], kind="stable")
    counts["rank"] = counts.groupby("window_start").cumcount() + 1
    exp = counts[counts["rank"] <= 5].reset_index(drop=True)

    pd.testing.assert_frame_equal(
        got[["window_start", "speaker", "n_clips", "rank"]],
        exp[["window_start", "speaker", "n_clips", "rank"]],
        check_dtype=False)


def test_streaming_topk_engine_crash_resume(audio_dir, tmp_path):
    from dataflows_ray.streaming.topk_engine import StreamingTopKEngine

    clean_out = str(tmp_path / "clean")
    clean = StreamingTopKEngine(audio_dir, clean_out, num_partitions=2,
                                rowgroups_per_epoch=1, window_ms=60_000, k=3)
    clean_rows = clean.run()["committed_rows"]
    assert clean_rows > 0

    out = str(tmp_path / "crash")
    eng = StreamingTopKEngine(audio_dir, out, num_partitions=2,
                              rowgroups_per_epoch=1, window_ms=60_000, k=3)
    try:
        eng.run(crash_after_stage_of_epoch=1)
        assert False
    except RuntimeError:
        pass
    resumed = StreamingTopKEngine(audio_dir, out, num_partitions=2,
                                  rowgroups_per_epoch=1, window_ms=60_000,
                                  k=3)
    assert resumed.run()["committed_rows"] == clean_rows
    again = StreamingTopKEngine(audio_dir, out, num_partitions=2,
                                rowgroups_per_epoch=1, window_ms=60_000, k=3)
    r2 = again.run()
    assert r2["epochs_processed"] == 0
    assert r2["committed_rows"] == clean_rows


def test_streaming_ndv_engine_matches_sequential_hll(audio_dir, tmp_path):
    """Per-window HLL registers merge by max (commutative/idempotent),
    so the streaming emission must equal a sequential single-pass HLL
    over the same windows, exactly."""
    import pandas as pd
    import pyarrow.parquet as pq
    from dataflows_ray.functions.sketch import (
        _estimate, _hash_column, _registers)
    from dataflows_ray.streaming.ndv_engine import StreamingNdvEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    sorted_dir = _sorted_audio_copy(audio_dir, str(tmp_path / "sorted"))
    out = str(tmp_path / "ndv")
    eng = StreamingNdvEngine(sorted_dir, out, num_partitions=3,
                             rowgroups_per_epoch=1, window_ms=300_000,
                             p=12)
    eng.run()
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values("window_start").reset_index(drop=True)

    files = sorted(os.path.join(sorted_dir, f)
                   for f in os.listdir(sorted_dir) if f.endswith(".parquet"))
    tbl = pa.concat_tables([pq.read_table(f, columns=["speaker", "event_ms"])
                            for f in files])
    ev = tbl["event_ms"].to_numpy(zero_copy_only=False)
    h = _hash_column(tbl["speaker"])
    import numpy as np
    widx = ev // 300_000
    exp = {}
    for w in np.unique(widx):
        exp[int(w) * 300_000] = int(round(_estimate(
            _registers(h[widx == w], 12))))
    assert dict(zip(got["window_start"], got["approx_ndv"])) == exp
    # estimates are close to exact distinct counts
    truth = pd.DataFrame({"w": widx, "s": tbl["speaker"].to_pylist()}) \
        .groupby("w")["s"].nunique()
    for w, nd in truth.items():
        est = exp[int(w) * 300_000]
        assert abs(est - nd) <= max(2, 0.1 * nd)


def test_streaming_ndv_engine_crash_resume(audio_dir, tmp_path):
    from dataflows_ray.streaming.ndv_engine import StreamingNdvEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    clean_out = str(tmp_path / "clean")
    clean = StreamingNdvEngine(audio_dir, clean_out, num_partitions=2,
                               rowgroups_per_epoch=1, window_ms=300_000)
    clean.run()
    clean_df = ExactlyOnceSink(clean_out).read_output().to_pandas() \
        .sort_values("window_start").reset_index(drop=True)

    out = str(tmp_path / "crash")
    eng = StreamingNdvEngine(audio_dir, out, num_partitions=2,
                             rowgroups_per_epoch=1, window_ms=300_000)
    try:
        eng.run(crash_after_stage_of_epoch=1)
        assert False
    except RuntimeError:
        pass
    StreamingNdvEngine(audio_dir, out, num_partitions=2,
                       rowgroups_per_epoch=1, window_ms=300_000).run()
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    # identical emissions, not just counts: registers are idempotent
    assert got.equals(clean_df)


def test_streaming_map_engine_exactly_once_crash_resume(tmp_path):
    """Stateless streaming ETL: crash mid-run, resume, rerun — rows out
    equal a clean run's, each input transformed exactly once."""
    import pyarrow.parquet as pq
    from dataflows_ray.functions.multimodal import synth_image_table, ImageDecoder
    from dataflows_ray.streaming.map_engine import StreamingMapEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    import pyarrow.compute as pc

    src = str(tmp_path / "imgs")
    os.makedirs(src)
    tbl = synth_image_table(120)
    for i in range(0, 120, 30):
        pq.write_table(tbl.slice(i, 30), os.path.join(src, f"p{i}.parquet"),
                       row_group_size=15)

    def derive(t):
        return t.append_column("__seq__", pc.cast(
            pc.utf8_slice_codeunits(t["image_id"], 4, 12), pa.int64()))

    def run(out, crash=None):
        eng = StreamingMapEngine(src, out, transform=ImageDecoder(),
                                 key="image_id", ts_col="__seq__",
                                 derive=derive, num_partitions=2,
                                 rowgroups_per_epoch=3)
        return eng.run(crash_after_stage_of_epoch=crash)

    clean_out = str(tmp_path / "clean")
    assert run(clean_out)["committed_rows"] == 120

    out = str(tmp_path / "crash")
    try:
        run(out, crash=1)
        assert False
    except RuntimeError:
        pass
    assert run(out)["committed_rows"] == 120
    got = ExactlyOnceSink(out).read_output().to_pandas()
    assert sorted(got["image_id"]) == sorted(tbl["image_id"].to_pylist())
    assert got["image_id"].is_unique
    r = run(out)  # rerun over committed sink is a no-op
    assert r["epochs_processed"] == 0 and r["committed_rows"] == 120


def test_streaming_flac_transcode_crash_resume(tmp_path):
    """q105's transcode transform through the exactly-once engine:
    crash mid-run, resume — every clip transcoded exactly once, FLAC
    payload hashes identical to a clean run (encoder determinism holds
    across the resume boundary)."""
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.audio import synth_clip_batch
    from dataflows_ray.streaming.map_engine import StreamingMapEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    from dataflows_ray.pipelines.relational import _FlacTranscode

    src = str(tmp_path / "clips")
    os.makedirs(src)
    tbl = synth_clip_batch(0, 80, codec_mix=("pcm16", "mulaw", "wav"))
    for i in range(0, 80, 20):
        pq.write_table(tbl.slice(i, 20), os.path.join(src, f"p{i}.parquet"),
                       row_group_size=10)

    def run(out, crash=None):
        eng = StreamingMapEngine(src, out, transform=_FlacTranscode(80),
                                 key="clip_id", ts_col="event_ms",
                                 num_partitions=2, rowgroups_per_epoch=3)
        return eng.run(crash_after_stage_of_epoch=crash)

    clean_out = str(tmp_path / "clean")
    assert run(clean_out)["committed_rows"] == 80
    clean = ExactlyOnceSink(clean_out).read_output().to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    assert (clean["exact"] == 1).all()

    out = str(tmp_path / "crash")
    try:
        run(out, crash=1)
        assert False
    except RuntimeError:
        pass
    assert run(out)["committed_rows"] == 80
    got = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    assert got["clip_id"].is_unique
    assert (got["flac_sha256"] == clean["flac_sha256"]).all()
    r = run(out)  # rerun over committed sink is a no-op
    assert r["epochs_processed"] == 0 and r["committed_rows"] == 80


def test_streaming_map_engine_incremental_append(tmp_path):
    """Growing input: files appended after a committed run become NEW
    epochs; a rerun processes only them (incremental backfill), totals
    and uniqueness hold."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    from dataflows_ray.functions.multimodal import (
        ImageDecoder, synth_image_table)
    from dataflows_ray.streaming.map_engine import StreamingMapEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    src = str(tmp_path / "grow")
    os.makedirs(src)
    tbl = synth_image_table(90)
    for i in range(0, 60, 30):
        pq.write_table(tbl.slice(i, 30), os.path.join(src, f"p{i:03d}.parquet"),
                       row_group_size=15)

    def derive(t):
        return t.append_column("__seq__", pc.cast(
            pc.utf8_slice_codeunits(t["image_id"], 4, 12), pa.int64()))

    def make(out):
        return StreamingMapEngine(src, out, transform=ImageDecoder(),
                                  key="image_id", ts_col="__seq__",
                                  derive=derive, num_partitions=2,
                                  rowgroups_per_epoch=2)

    out = str(tmp_path / "sink")
    r1 = make(out).run()
    assert r1["committed_rows"] == 60

    # stream grows: a new file lands (later in sort order -> new epochs)
    pq.write_table(tbl.slice(60, 30), os.path.join(src, "p060.parquet"),
                   row_group_size=15)
    r2 = make(out).run()
    assert r2["epochs_processed"] >= 1           # only the new epochs ran
    got = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(got) == 90
    assert got["image_id"].is_unique
    assert sorted(got["image_id"]) == sorted(tbl["image_id"].to_pylist())


def test_streaming_dedup_engine_incremental_growth(tmp_path):
    """Input grows after a committed run: new epochs dedupe against the
    RESTORED seen-state — a late copy of old content is dropped, fresh
    content is emitted, nothing re-emits."""
    import pandas as pd
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.dedup_engine import StreamingDedupEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    src = str(tmp_path / "docs")
    os.makedirs(src)
    first = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"text_{i % 30}" for i in range(40)],  # 10 in-batch dups
    })
    pq.write_table(pa.Table.from_pandas(first, preserve_index=False),
                   os.path.join(src, "p000.parquet"), row_group_size=10)

    out = str(tmp_path / "sink")

    def make():
        return StreamingDedupEngine(src, out, num_partitions=2,
                                    rowgroups_per_epoch=2)

    r1 = make().run()
    assert ExactlyOnceSink(out).committed_row_count() == 30

    # growth: 10 copies of OLD content + 10 genuinely new docs
    second = pd.DataFrame({
        "doc_id": range(40, 60),
        "text": [f"text_{i % 30}" for i in range(20, 30)]
                + [f"new_{i}" for i in range(10)],
    })
    pq.write_table(pa.Table.from_pandas(second, preserve_index=False),
                   os.path.join(src, "p001.parquet"), row_group_size=10)
    r2 = make().run()
    assert r2["epochs_processed"] >= 1
    got = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(got) == 40                      # 30 old + 10 new keepers
    assert got["text"].is_unique
    assert set(t for t in got["text"] if t.startswith("new_")) == \
        {f"new_{i}" for i in range(10)}
    # old content re-sent in the growth batch was deduped, not re-emitted
    assert got[got["text"] == "text_25"]["doc_id"].iloc[0] < 40


def test_streaming_map_engine_broadcast_enrichment(tmp_path):
    """Stream-table enrichment: the transform closes over a ray.put
    broadcast of a small dimension table (zero-copy ray.get in every
    split task) — the streaming counterpart of the batch broadcast
    join, exactly-once."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    from dataflows_ray.streaming.map_engine import StreamingMapEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    src = str(tmp_path / "events")
    os.makedirs(src)
    ev = pd.DataFrame({"event_id": range(80),
                       "code": [f"c{i % 4}" for i in range(80)]})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(src, "p0.parquet"), row_group_size=20)

    dim = {f"c{i}": f"name_{i}" for i in range(4)}
    dim_ref = ray.put(dim)

    def enrich(t: pa.Table, dim_ref=dim_ref) -> pa.Table:
        lookup = ray.get(dim_ref)  # zero-copy from the object store
        names = [lookup.get(c, "?") for c in t["code"].to_pylist()]
        return t.append_column("code_name", pa.array(names))

    eng = StreamingMapEngine(src, str(tmp_path / "sink"), transform=enrich,
                             key="code", ts_col="event_id",
                             num_partitions=2, rowgroups_per_epoch=2)
    eng.run()
    got = ExactlyOnceSink(str(tmp_path / "sink")).read_output().to_pandas()
    assert len(got) == 80 and got["event_id"].is_unique
    assert (got["code_name"] == got["code"].map(dim)).all()


@pytest.mark.parametrize("engine_name", ["topk", "ndv", "window"])
def test_crash_sweep_every_epoch_new_engines(engine_name, audio_dir,
                                             tmp_path):
    """Crash at EVERY epoch for each windowed engine; every resumed run
    must emit exactly the clean run's rows (not just counts)."""
    from dataflows_ray.streaming.ndv_engine import StreamingNdvEngine
    from dataflows_ray.streaming.topk_engine import StreamingTopKEngine
    from dataflows_ray.streaming.window_engine import StreamingWindowEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    def make(out):
        if engine_name == "topk":
            return StreamingTopKEngine(audio_dir, out, num_partitions=2,
                                       rowgroups_per_epoch=2,
                                       window_ms=300_000, k=3)
        if engine_name == "ndv":
            return StreamingNdvEngine(audio_dir, out, num_partitions=2,
                                      rowgroups_per_epoch=2,
                                      window_ms=300_000)
        return StreamingWindowEngine(audio_dir, out, num_partitions=2,
                                     rowgroups_per_epoch=2,
                                     window_ms=300_000)

    clean_out = str(tmp_path / "clean")
    clean = make(clean_out)
    clean.run()
    sort_cols = [c for c in ("window_start", "speaker")
                 if c in ExactlyOnceSink(clean_out).read_output().columns()]
    clean_df = ExactlyOnceSink(clean_out).read_output().to_pandas() \
        .sort_values(sort_cols).reset_index(drop=True)

    n_epochs = len(clean.plan_epochs())
    assert n_epochs >= 2
    for crash_at in range(n_epochs):
        out = str(tmp_path / f"crash_{crash_at}")
        try:
            make(out).run(crash_after_stage_of_epoch=crash_at)
            assert False, "expected injected crash"
        except RuntimeError:
            pass
        make(out).run()
        got = ExactlyOnceSink(out).read_output().to_pandas() \
            .sort_values(sort_cols).reset_index(drop=True)
        assert got.equals(clean_df), (engine_name, crash_at)


# --- multi-codec decode (G.711 µ-law / A-law, WAV container) --------------

def test_g711_known_values():
    """ITU G.711 table spot checks: µ-law 0xFF is zero, A-law 0x55/0xD5
    are the smallest-magnitude codes (±8 at 16-bit scale)."""
    from dataflows_ray.streaming.audio import (
        MULAW_DECODE_TABLE, ALAW_DECODE_TABLE)
    assert MULAW_DECODE_TABLE[0xFF] == 0
    assert MULAW_DECODE_TABLE[0x7F] == 0   # negative zero maps to 0
    assert ALAW_DECODE_TABLE[0xD5] == 8
    assert ALAW_DECODE_TABLE[0x55] == -8
    # decode tables are odd-symmetric around the sign bit
    assert MULAW_DECODE_TABLE[0x80] == -MULAW_DECODE_TABLE[0x00]
    assert ALAW_DECODE_TABLE[0x2A ^ 0x80] == -ALAW_DECODE_TABLE[0x2A]


def test_codec_roundtrip_snr_and_fixpoint():
    """Every implemented codec reconstructs the waveform above the 30 dB
    invariant, and the lossy G.711 quantizers are fixpoints (decode ∘
    encode is idempotent on already-quantized signals)."""
    from dataflows_ray.streaming.audio import _clip_wave, encode_clip
    rng = np.random.Generator(np.random.PCG64(3))
    w = _clip_wave(rng, 16000, 700)
    for codec in ("pcm16", "mulaw", "alaw", "wav"):
        dec = decode_pcm(encode_clip(w, codec, 16000), codec)
        assert len(dec) == len(w)
        assert snr_db(w, dec) >= 30, codec
    for codec in ("mulaw", "alaw"):
        d1 = decode_pcm(encode_clip(w, codec), codec)
        d2 = decode_pcm(encode_clip(d1, codec), codec)
        assert np.allclose(d1, d2), codec


def test_wav_container_parse():
    from dataflows_ray.streaming.audio import encode_wav, parse_wav
    w = np.sin(np.linspace(0, 20, 1600)) * 0.5
    raw = encode_wav(w, 8000)
    dec, sr = parse_wav(raw)
    assert sr == 8000 and snr_db(w, dec) >= 60
    # chunk walker skips unknown chunks (e.g. LIST metadata)
    import struct
    extra = raw[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + raw[12:]
    hdr = bytearray(extra)
    struct.pack_into("<I", hdr, 4, len(extra) - 8)
    dec2, sr2 = parse_wav(bytes(hdr))
    assert sr2 == 8000 and np.array_equal(dec, dec2)
    with pytest.raises(ValueError):
        parse_wav(b"nonsense-not-riff")


def test_mixed_codec_decoder_matches_per_row_decode():
    """PcmDecoder's batched per-codec dispatch must equal the scalar
    decode_pcm path row for row, including clips sliced at odd byte
    offsets (µ-law rows have odd byte lengths)."""
    from dataflows_ray.pipelines.audio import PcmDecoder
    t = synth_clip_batch(0, 40, codec_mix=("pcm16", "mulaw", "alaw", "wav"))
    out = PcmDecoder()(t).to_pandas()
    for i, row in enumerate(t.to_pylist()):
        w = decode_pcm(row["bytes"], row["codec"]).astype(np.float32)
        assert out["n_samples"][i] == len(w)
        assert abs(out["rms"][i] - np.sqrt(np.mean(w ** 2))) < 1e-4
    # the zero-copy pcm16 fast path agrees with the per-row reference too
    t16 = synth_clip_batch(0, 40)
    fast = PcmDecoder()(t16).to_pandas()
    for i, row in enumerate(t16.to_pylist()):
        w = decode_pcm(row["bytes"], "pcm16").astype(np.float32)
        assert abs(fast["rms"][i] - np.sqrt(np.mean(w ** 2))) < 1e-4


def test_mixed_codec_snr_invariant_distributed():
    """End-to-end over Ray: mixed-codec corpus decoded in the actor-pool
    stage with per-row validation against the regenerated reference —
    every clip's SNR must clear the 30 dB bar regardless of codec."""
    t = synth_clip_batch(0, 60, codec_mix=("pcm16", "mulaw", "alaw", "wav"))
    ds = ray.data.from_arrow(t)
    out = decode_stage(ds, batch_size=16, validate_snr=True).to_pandas()
    assert len(out) == 60
    assert (out["snr_db"] >= 30).all()
    by_codec = out.groupby("codec")["snr_db"].min()
    assert set(by_codec.index) == {"pcm16", "mulaw", "alaw", "wav"}


def test_streaming_normalize_crash_resume_matches_batch(tmp_path):
    """q84's engine: crash after staging epoch 0, resume, and the
    committed output must equal the batch normalize_text result
    exactly (exactly-once, no dupes / no loss)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from dataflows_ray.functions.text import normalize_text
    from dataflows_ray.pipelines.relational import _NormalizeTransform
    from dataflows_ray.streaming.map_engine import StreamingMapEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    texts = [f"doc\x01 {i}  body\t{'é' if i % 7 == 0 else 'x'}  tail"
             for i in range(120)]
    src = str(tmp_path / "docs.parquet")
    tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, src, row_group_size=20)  # 6 row groups -> epochs
    out = str(tmp_path / "sink")

    eng = StreamingMapEngine(src, out, transform=_NormalizeTransform(),
                             key="doc_id", ts_col="doc_id",
                             num_partitions=2, rowgroups_per_epoch=2)
    try:
        eng.run(crash_after_stage_of_epoch=0)
    except RuntimeError:
        pass
    eng2 = StreamingMapEngine(src, out, transform=_NormalizeTransform(),
                              key="doc_id", ts_col="doc_id",
                              num_partitions=2, rowgroups_per_epoch=2)
    eng2.run()
    got = (ExactlyOnceSink(out).read_output().to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (normalize_text(ray.data.from_arrow(tbl)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["norm_text"].tolist() == exp["norm_text"].tolist()
    assert got["norm_len"].tolist() == exp["norm_len"].tolist()


def test_late_data_side_output_exactly_once(tmp_path):
    """Late partials are counted AND preserved on the dead-letter side
    channel, which rides the same 2PC commit: re-running over the
    committed sink adds nothing to either stream."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.window_engine import StreamingWindowEngine
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "sink")
    # row group 0: fresh data at t=10M; row group 1: ancient data at t=0
    # whose window is closed by the watermark 10M - 60k by the time it
    # arrives -> late
    tbl = pa.Table.from_pandas(pd.DataFrame({
        "speaker": ["a", "a", "b", "b"],
        "event_ms": [10_000_000, 10_000_100, 0, 100],
        "dur_ms": [500, 600, 700, 800],
    }), preserve_index=False)
    pq.write_table(tbl, src, row_group_size=2)

    eng = StreamingWindowEngine(src, out, num_partitions=1,
                                rowgroups_per_epoch=1)
    r1 = eng.run()
    sink = ExactlyOnceSink(out)
    main = sink.read_output().to_pandas()
    late = sink.read_side("late").to_pandas()
    # main: only speaker a's window (b's rows were late partials)
    assert set(main["speaker"]) == {"a"}
    assert main["n_clips"].sum() == 2
    # side: b's dropped partial, content preserved
    assert set(late["speaker"]) == {"b"}
    assert late["n_clips"].sum() == 2 and late["total_dur_ms"].sum() == 1500
    # metric agrees with the side channel
    man = sink.read_manifest()
    n_late = sum(p.get("late_dropped", 0) for e in man["epochs"]
                 for p in e["partitions"])
    assert n_late == 2

    # exactly-once: a re-run over the committed sink is a no-op for BOTH
    r2 = StreamingWindowEngine(src, out, num_partitions=1,
                               rowgroups_per_epoch=1).run()
    assert r2["epochs_processed"] == 0
    assert len(sink.read_output().to_pandas()) == len(main)
    assert len(sink.read_side("late").to_pandas()) == len(late)


def test_streaming_upsert_crash_resume_and_exactly_once(tmp_path):
    """The upsert snapshot after a crash+resume equals a clean run's,
    and re-running over the committed sink is a no-op."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    from dataflows_ray.streaming.upsert_engine import StreamingUpsertEngine

    src = str(tmp_path / "chg.parquet")
    df = pd.DataFrame({
        "user_id": [1, 2, 3, 1, 2, 1, 3, 2],
        "ts": pd.to_datetime([10, 20, 30, 40, 50, 60, 70, 80], unit="s"),
        "event_id": range(8),
        "event_type": ["click", "click", "click", "error", "view",
                       "view", "view", "error"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src,
                   row_group_size=2)  # 4 row groups -> 4 epochs at rg=1

    def snap(out):
        t = ExactlyOnceSink(out).read_output().to_pandas()
        return t.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "event_type", "value"]]

    def make(out):
        return StreamingUpsertEngine(src, out, num_partitions=2,
                                     rowgroups_per_epoch=1,
                                     payload_cols=["value"])

    clean_out = str(tmp_path / "clean")
    make(clean_out).run()
    clean = snap(clean_out)
    # user 1: last=view@60 (value 6); user 2: last=error@80 -> tombstoned;
    # user 3: last=view@70 (value 7)
    assert clean["user_id"].tolist() == [1, 3]
    assert clean["value"].tolist() == [6.0, 7.0]

    crashed_out = str(tmp_path / "crashed")
    with _pytest.raises(RuntimeError):
        make(crashed_out).run(crash_after_stage_of_epoch=2)
    make(crashed_out).run()
    assert snap(crashed_out).equals(clean)

    # committed sink: a further run is a no-op
    r = make(crashed_out).run()
    assert r["epochs_processed"] == 0
    assert snap(crashed_out).equals(clean)


def test_sink_compaction_preserves_output_and_resume(tmp_path):
    """compact() merges committed epoch files, keeps main + side output
    byte-identical, and a resumed engine still sees every original
    epoch as committed (no reprocessing after compaction)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    from dataflows_ray.streaming.upsert_engine import StreamingUpsertEngine

    src = str(tmp_path / "chg.parquet")
    df = pd.DataFrame({
        "user_id": list(range(8)) * 2,
        "ts": pd.to_datetime(range(16), unit="s"),
        "event_id": range(16),
        "event_type": ["click"] * 16,
        "value": [float(i) for i in range(16)],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src,
                   row_group_size=2)
    out = str(tmp_path / "sink")
    eng = StreamingUpsertEngine(src, out, num_partitions=2,
                                rowgroups_per_epoch=1,
                                payload_cols=["value"])
    eng.run()
    sink = ExactlyOnceSink(out)
    before = sink.read_output().to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    epochs_before = sink.committed_epochs()
    stats = sink.compact(target_epochs_per_file=4)
    assert stats["files_after"] < stats["files_before"]
    after = sink.read_output().to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    assert after.equals(before)
    assert sink.committed_epochs() == epochs_before
    # engine re-run over the compacted sink: still a no-op
    r = StreamingUpsertEngine(src, out, num_partitions=2,
                              rowgroups_per_epoch=1,
                              payload_cols=["value"]).run()
    assert r["epochs_processed"] == 0
    final = sink.read_output().to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    assert final.equals(before)


def test_sink_compaction_crash_recovery(tmp_path):
    """A compact() interrupted mid-swap must be recoverable: whichever
    intermediate directory state a crash leaves, the next
    ExactlyOnceSink() rolls forward or back without losing a row."""
    import os
    import shutil
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.sink import ExactlyOnceSink

    def build(out):
        s = ExactlyOnceSink(out)
        for e in range(4):
            t = pa.table({"k": [e], "v": [e * 10]})
            st = s.stage(e, 0, t)
            s.commit(e, [st], watermark_ms=e)
        return s

    # simulate crash AFTER data -> data.old, BEFORE data.new -> data
    out = str(tmp_path / "s1")
    s = build(out)
    rows_before = s.read_output().to_pandas().sort_values("k")
    # hand-build the crash state: data.new complete, data renamed away
    shutil.copytree(s.data_dir, s.data_dir + ".new")
    os.replace(s.data_dir, s.data_dir + ".old")
    s2 = ExactlyOnceSink(out)  # recovery rolls FORWARD
    after = s2.read_output().to_pandas().sort_values("k")
    assert after.equals(rows_before)
    assert not os.path.exists(s.data_dir + ".old")
    assert not os.path.exists(s.data_dir + ".new")

    # simulate crash BEFORE promotion: only data.old exists
    out2 = str(tmp_path / "s2")
    s = build(out2)
    rows_before = s.read_output().to_pandas().sort_values("k")
    os.replace(s.data_dir, s.data_dir + ".old")
    s2 = ExactlyOnceSink(out2)  # recovery rolls BACK
    after = s2.read_output().to_pandas().sort_values("k")
    assert after.equals(rows_before)


def test_streaming_upsert_incremental_growth(tmp_path):
    """Appending new changelog files and re-running must yield a
    snapshot equal to a clean run over the full input — the newest
    flush epoch IS the live view; older snapshots never union in."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.upsert_engine import StreamingUpsertEngine

    src = str(tmp_path / "chg")
    os.makedirs(src)

    def write(name, rows):
        df = pd.DataFrame(rows)
        df["ts"] = pd.to_datetime(df["ts"], unit="s")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(src, name), row_group_size=2)

    write("part-0.parquet", {
        "user_id": [1, 2, 1, 3], "ts": [10, 20, 30, 40],
        "event_id": [0, 1, 2, 3],
        "event_type": ["click", "click", "view", "click"],
        "value": [1.0, 2.0, 3.0, 4.0]})
    out = str(tmp_path / "sink")

    def make():
        return StreamingUpsertEngine(src, out, num_partitions=2,
                                     rowgroups_per_epoch=1,
                                     payload_cols=["value"])

    make().run()
    snap1 = make().read_snapshot().to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    assert snap1["user_id"].tolist() == [1, 2, 3]
    assert snap1.loc[0, "value"] == 3.0  # user 1's latest = view@30

    # grow the changelog: user 1 tombstoned, user 2 updated, user 4 new
    write("part-1.parquet", {
        "user_id": [1, 2, 4], "ts": [50, 60, 70],
        "event_id": [4, 5, 6],
        "event_type": ["error", "view", "click"],
        "value": [9.0, 5.0, 6.0]})
    make().run()
    snap2 = make().read_snapshot().to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    assert snap2["user_id"].tolist() == [2, 3, 4]  # 1 tombstoned, no dups
    assert snap2.loc[0, "value"] == 5.0
    # duplicate-free: each key appears exactly once
    assert snap2["user_id"].is_unique

    # compaction must not hide the snapshot: flush epochs stay their own
    # groups and read_snapshot follows compacted_from
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    ExactlyOnceSink(out).compact(target_epochs_per_file=8)
    snap3 = make().read_snapshot().to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    assert snap3.equals(snap2)
