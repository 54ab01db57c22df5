"""Two-source stateful stream-stream join (TwoStreamJoinEngine):
cross-epoch state buffering, crash/resume exactly-once, independent
source growth, and uniform canonical schema under tight watermarks."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from dataflows_ray.streaming.audio import synth_clip_batch
from dataflows_ray.streaming.engine import TwoStreamJoinEngine
from dataflows_ray.streaming.sink import ExactlyOnceSink


def _write_streams(base, n, rows_per_file=50, start=0, append=False,
                   lag_scale=1):
    """Clip + transcript source dirs, each globally ordered by its OWN
    event time. ``lag_scale`` stretches the synthetic 0-30s transcript
    lag (a slower transcription service): rank displacement between the
    two streams is lag/inter-arrival-gap, so small corpora need a
    bigger lag for partners to land epochs apart."""
    clips_dir, tr_dir = f"{base}/clips", f"{base}/transcripts"
    os.makedirs(clips_dir, exist_ok=True)
    os.makedirs(tr_dir, exist_ok=True)
    full = synth_clip_batch(start, n).drop_columns(["bytes"])
    clips = full.select(["clip_id", "sr_hz", "dur_ms", "codec",
                         "speaker", "event_ms"])
    lagged = pc.add(full["event_ms"], pc.multiply(
        pc.subtract(full["transcript_event_ms"], full["event_ms"]),
        pa.scalar(lag_scale, pa.int64())))
    tr = pa.table({"clip_id": full["clip_id"],
                   "transcript": full["transcript"],
                   "event_ms": lagged})
    off = start // rows_per_file if append else 0
    for table, dest in ((clips, clips_dir), (tr, tr_dir)):
        table = table.take(pc.sort_indices(
            table, sort_keys=[("event_ms", "ascending")]))
        for i, s in enumerate(range(0, n, rows_per_file)):
            pq.write_table(table.slice(s, rows_per_file),
                           f"{dest}/part-{off + i:05d}.parquet",
                           row_group_size=rows_per_file)
    return clips_dir, tr_dir


def _engine(clips_dir, tr_dir, out, lateness=120_000):
    return TwoStreamJoinEngine(clips_dir, tr_dir, out, num_partitions=2,
                               rowgroups_per_epoch=1,
                               allowed_lateness_ms=lateness)


def test_cross_epoch_buffering_and_full_match(tmp_path):
    """Partners arrive in different epochs (divergent stream orders):
    mid-run state snapshots hold buffered rows, and the final result is
    the complete inner join."""
    clips_dir, tr_dir = _write_streams(str(tmp_path / "src"), 400,
                                       lag_scale=20)   # lag up to 600s
    out = str(tmp_path / "sink")
    lateness = 1_200_000                               # > max scaled lag
    # stop mid-stream (no flush): the committed snapshot must show real
    # buffered cross-epoch state on at least one side
    _engine(clips_dir, tr_dir, out, lateness=lateness).run(max_epochs=4)
    state = ExactlyOnceSink(out).latest_state()
    assert state is not None
    buffered = sum(
        (1 if a.get("left") else 0) + (1 if a.get("right") else 0)
        for a in state["actors"])
    assert buffered > 0
    # finish: everything matches (lateness > max lag)
    _engine(clips_dir, tr_dir, out, lateness=lateness).run()
    df = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(df) == 400
    assert df["clip_id"].is_unique
    assert df["transcript"].notna().all() and df["speaker"].notna().all()


def test_crash_resume_matches_clean_run(tmp_path):
    clips_dir, tr_dir = _write_streams(str(tmp_path / "src"), 150)
    clean_out = str(tmp_path / "clean")
    _engine(clips_dir, tr_dir, clean_out).run()
    clean = ExactlyOnceSink(clean_out).read_output().to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)

    out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected crash"):
        _engine(clips_dir, tr_dir, out).run(crash_after_stage_of_epoch=1)
    _engine(clips_dir, tr_dir, out).run()
    resumed = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    assert resumed.equals(clean)


def test_sources_grow_independently(tmp_path):
    """Appending files to EACH source after a committed run processes
    only the new units (per-source n_units accounting) and every clip
    still emits exactly once."""
    src = str(tmp_path / "src")
    clips_dir, tr_dir = _write_streams(src, 100)
    out = str(tmp_path / "sink")
    _engine(clips_dir, tr_dir, out).run()
    assert ExactlyOnceSink(out).committed_row_count() == 100

    _write_streams(src, 50, start=100, append=True)
    r2 = _engine(clips_dir, tr_dir, out).run()
    assert r2["epochs_processed"] >= 1
    df = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(df) == 150 and df["clip_id"].is_unique
    assert df["transcript"].notna().all()


def test_tight_watermark_uniform_schema(tmp_path):
    """With lateness below the transcript lag some rows expire
    unmatched — output must still be ONE canonical schema (the actors
    get schema hints at construction), and no clip is lost."""
    clips_dir, tr_dir = _write_streams(str(tmp_path / "src"), 200)
    out = str(tmp_path / "sink")
    _engine(clips_dir, tr_dir, out, lateness=0).run()
    df = ExactlyOnceSink(out).read_output().to_pandas()
    assert df["clip_id"].nunique() == 200          # coverage, no loss
    assert list(df.columns) == ["clip_id", "sr_hz", "dur_ms", "codec",
                                "speaker", "event_ms", "transcript",
                                "event_ms_r"]
    unmatched_right = df[df["speaker"].isna()]
    if len(unmatched_right):
        # expired transcripts carry their time in event_ms_r, never in
        # the clip-side event_ms column
        assert unmatched_right["event_ms_r"].notna().all()
        assert unmatched_right["event_ms"].isna().all()


def test_dense_source_cannot_race_watermark(tmp_path):
    """Multi-input watermark rule: the transcript source packs 500 rows
    per unit while clips carry 50, so ALL transcripts ingest within the
    first two epochs and clips trickle over twenty. With a single
    conflated frontier the transcript max would drag the watermark ~1h
    ahead of the clip frontier and expire nearly every pending match
    despite lateness (120s) >> lag (30s); the per-source min-frontier
    rule must hold the watermark back until the clips arrive."""
    src = str(tmp_path / "src")
    clips_dir, tr_dir = _write_streams(src, 1000, rows_per_file=50)
    # rewrite the transcript side alone at 10x unit density (same rows)
    tr = pa.concat_tables([
        pq.read_table(f"{tr_dir}/{f}")
        for f in sorted(os.listdir(tr_dir))])
    for f in os.listdir(tr_dir):
        os.remove(f"{tr_dir}/{f}")
    for i, s in enumerate(range(0, 1000, 500)):
        pq.write_table(tr.slice(s, 500), f"{tr_dir}/part-{i:05d}.parquet",
                       row_group_size=500)
    out = str(tmp_path / "sink")
    _engine(clips_dir, tr_dir, out).run()
    df = ExactlyOnceSink(out).read_output().to_pandas()
    assert len(df) == 1000 and df["clip_id"].is_unique
    assert df["transcript"].notna().all() and df["speaker"].notna().all()
