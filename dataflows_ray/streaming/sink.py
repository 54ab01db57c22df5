"""Idempotent two-phase-commit exactly-once sink with per-partition
lineage manifests.

North-rule component. The reference's commit primitive is the
``<file>.active`` -> atomic-rename in ``dataflows/processors/stream.py:33-36``
(all-or-nothing whole-stream commit); this generalizes it to
partition/epoch granularity:

- Phase 1 (stage): each partition of each epoch writes its output to
  ``<dir>/.staged/epoch=<e>/part-<p>.parquet``. Re-running a failed epoch
  overwrites its staged files — staging is idempotent by construction
  (deterministic path per (epoch, partition), no appends).
- Phase 2 (commit): the driver promotes the epoch's staged files into
  ``<dir>/data/epoch=<e>/`` and appends one record to ``manifest.json``
  (written tmp-file + atomic ``os.replace``) carrying per-partition
  lineage + metrics: rows, bytes, content digests, watermark,
  state-snapshot key.
- Resume: a restarted run reads the manifest, skips committed epochs,
  restores operator state from the newest committed snapshot, and resumes
  at the first uncommitted epoch. A crash between stage and commit leaves
  only ``.staged`` data, which the retry overwrites — never double-counts.

The sink root may be a plain path or a URI resolved through
``streaming/storage.py`` (``SinkStorage``): a shared POSIX dir today, an
object-store prefix on a real cluster — every filesystem touch goes
through the storage primitives, and the manifest records storage KEYS
(never absolute paths), so a resumed driver on a different node/mount
sees the same committed state.

Output format: parquet (the ``lance`` package is unavailable in this
environment; the manifest/commit layout is format-agnostic and would wrap
Lance fragments identically).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional

import pyarrow as pa

from .storage import SinkStorage


def sink_for(out_dir: str) -> "ExactlyOnceSink":
    """Per-process cached sink handle for STATE ACTORS.

    An actor's ``sink_dir`` never varies over its lifetime, but its
    ``ingest_and_stage`` runs once per epoch — constructing a fresh
    ``ExactlyOnceSink`` there re-runs compaction recovery plus three
    ``makedirs`` and storage resolution per epoch per partition (pure
    repeated I/O locally; several LIST/HEAD round trips each on an
    object-store backend). Actors only ever call ``stage``/``stage_side``
    (idempotent, stateless), so one handle per (process, out_dir) is
    safe. Drivers keep constructing their own sink directly: they own
    manifest commits and must observe recovery at startup.
    """
    s = _SINK_CACHE.get(out_dir)
    if s is None:
        s = _SINK_CACHE[out_dir] = ExactlyOnceSink(out_dir)
    return s


_SINK_CACHE: Dict[str, "ExactlyOnceSink"] = {}


class ExactlyOnceSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.st = SinkStorage.resolve(out_dir)
        self._recover_compaction()
        for d in (".staged", "data", "state"):
            self.st.makedirs(d)
        # concrete-path attributes for external readers (engines, tests,
        # audits) — resolved through the storage backend
        self.staged_dir = self.st.local_path(".staged")
        self.data_dir = self.st.local_path("data")
        self.state_dir = self.st.local_path("state")
        self.manifest_path = self.st.local_path("manifest.json")

    _COMPACT_MANIFEST = "manifest.json.compact"

    def _promote_compact_manifest(self) -> None:
        if self.st.exists(self._COMPACT_MANIFEST):
            self.st.write_bytes_atomic(
                "manifest.json", self.st.read_bytes(self._COMPACT_MANIFEST))
            self.st.delete(self._COMPACT_MANIFEST)

    def _recover_compaction(self) -> None:
        """Roll a compact() interrupted mid-swap forward or back BEFORE
        the empty data dir would be recreated: a crash can only leave
        (a) ``data.new`` fully written and ``data`` renamed away — roll
        FORWARD by promoting data.new; or (b) ``data`` renamed to
        ``data.old`` with no data.new promoted — roll BACK by restoring
        data.old. Either way no committed row is ever lost.

        The manifest rides the same protocol: compact() STAGES its
        rewritten manifest (``manifest.json.compact``) before touching
        the data dirs, so recovery can pair the surviving data layout
        with the MATCHING manifest — data.old still present after a
        completed swap means the manifest rewrite may not have landed
        (promote the staged one); no swap started means roll the staged
        manifest back. Without this, a crash between the swap and the
        manifest write would leave per-epoch lineage digests pointing at
        compacted files that no longer exist."""
        if not self.st.isdir("data"):
            if self.st.isdir("data.new"):
                self.st.replace("data.new", "data")   # roll FORWARD
                self._promote_compact_manifest()
            elif self.st.isdir("data.old"):
                self.st.replace("data.old", "data")   # roll BACK
                self.st.delete(self._COMPACT_MANIFEST)
        if self.st.isdir("data"):
            if self.st.exists(self._COMPACT_MANIFEST):
                if self.st.isdir("data.old"):
                    # swap completed (old layout renamed away): data IS
                    # the compacted layout — finish the manifest write
                    self._promote_compact_manifest()
                else:
                    # swap never started: data is the pre-compaction
                    # layout — discard the staged manifest
                    self.st.delete(self._COMPACT_MANIFEST)
            for leftover in ("data.new", "data.old"):
                if self.st.isdir(leftover):
                    self.st.rmtree(leftover)

    # -- manifest ----------------------------------------------------------
    def read_manifest(self) -> Dict:
        if not self.st.exists("manifest.json"):
            return {"epochs": []}
        return json.loads(self.st.read_bytes("manifest.json"))

    def committed_epochs(self) -> List[int]:
        # compacted manifest entries cover a RANGE of original epochs
        # ("compacted_from") — expand them so a resumed engine still
        # skips every committed epoch after a compact()
        out: List[int] = []
        for e in self.read_manifest()["epochs"]:
            out.extend(e.get("compacted_from", [e["epoch"]]))
        return sorted(out)

    def _write_manifest(self, manifest: Dict) -> None:
        self.st.write_bytes_atomic(
            "manifest.json", json.dumps(manifest, indent=1).encode())

    # -- phase 1: stage ----------------------------------------------------
    def stage(self, epoch: int, partition: int, table: pa.Table) -> Dict:
        """Write one partition's epoch output to the staged area.
        Deterministic path => idempotent under task retry."""
        key = SinkStorage.join(".staged", f"epoch={epoch}",
                               f"part-{partition:05d}.parquet")
        self.st.write_table_atomic(key, table)
        # content digests ride the lineage manifest so a later
        # integrity audit (functions/fingerprint.py:audit_sink) can
        # verify committed bytes without re-parsing rows; the file was
        # just written, so hashing re-reads it from page cache
        from ..functions.fingerprint import hash_file
        digests = hash_file(self.st.local_path(key))
        return {"partition": partition, "rows": len(table),
                "bytes": digests["bytes"],
                "file": key.rsplit("/", 1)[-1],
                "sha256": digests["sha256"], "md5": digests["md5"]}

    def stage_side(self, epoch: int, partition: int, table: pa.Table,
                   channel: str = "late") -> Dict:
        """Stage a SIDE-channel table (e.g. the late-data dead-letter
        stream) into the same epoch dir as the main output — it rides
        the identical two-phase commit, so side output is exactly-once
        too (skipped epochs on resume never re-emit it). Side files are
        named ``<channel>-part-*`` and excluded from ``read_output``;
        read them with :meth:`read_side`."""
        key = SinkStorage.join(".staged", f"epoch={epoch}",
                               f"{channel}-part-{partition:05d}.parquet")
        self.st.write_table_atomic(key, table)
        return {"partition": partition, f"{channel}_rows": len(table)}

    # -- phase 2: commit ---------------------------------------------------
    def commit(self, epoch: int, partition_stats: List[Dict],
               watermark_ms: int,
               state_snapshots: Optional[Dict[int, Dict]] = None,
               n_units: Optional[int] = None) -> None:
        """``n_units``: how many source units (row groups / fragments)
        this epoch consumed — recorded so a later run over a GROWN input
        can plan new epochs from the uncommitted unit suffix instead of
        re-chunking positionally (which silently drops units that land
        in an already-committed epoch id)."""
        manifest = self.read_manifest()
        if any(e["epoch"] == epoch for e in manifest["epochs"]):
            return  # already committed — idempotent
        staged = SinkStorage.join(".staged", f"epoch={epoch}")
        final = SinkStorage.join("data", f"epoch={epoch}")
        state_key = None
        if state_snapshots is not None:
            state_key = SinkStorage.join("state", f"epoch={epoch}.state")
            self.st.write_bytes_atomic(state_key,
                                       pickle.dumps(state_snapshots))
        if self.st.exists(final):
            self.st.rmtree(final)
        if self.st.exists(staged):
            self.st.replace(staged, final)
        else:
            self.st.makedirs(final)        # empty epoch
        entry = {
            "epoch": epoch,
            "watermark_ms": watermark_ms,
            "partitions": sorted(partition_stats, key=lambda s: s["partition"]),
            "rows": sum(s["rows"] for s in partition_stats),
            "state_snapshot": state_key,
        }
        if n_units is not None:
            entry["n_units"] = n_units
        manifest["epochs"].append(entry)
        self._write_manifest(manifest)

    # -- resume ------------------------------------------------------------
    def latest_state(self) -> Optional[Dict[int, Dict]]:
        epochs = self.read_manifest()["epochs"]
        for e in sorted(epochs, key=lambda x: -x["epoch"]):
            p = e.get("state_snapshot")
            if not p:
                continue
            # manifests record storage KEYS; tolerate pre-abstraction
            # manifests that stored absolute local paths
            if os.path.isabs(p):
                if os.path.exists(p):
                    with open(p, "rb") as f:
                        return pickle.load(f)
            elif self.st.exists(p):
                return pickle.loads(self.st.read_bytes(p))
        return None

    def latest_watermark(self) -> int:
        epochs = self.read_manifest()["epochs"]
        if not epochs:
            return -1
        return max(e["watermark_ms"] for e in epochs)

    def committed_row_count(self) -> int:
        return sum(e["rows"] for e in self.read_manifest()["epochs"])

    def _committed_files(self, prefix: str) -> List[str]:
        """Concrete paths of committed files (for Ray reads). Listing
        goes through the storage backend; on an object store this is
        one LIST per epoch prefix."""
        files = []
        for d in self.st.listdir("data"):
            key = SinkStorage.join("data", d)
            if self.st.isdir(key):
                files.extend(
                    self.st.local_path(SinkStorage.join(key, f))
                    for f in self.st.listdir(key)
                    if f.startswith(prefix) and f.endswith(".parquet"))
        return files

    def read_output(self):
        """All committed MAIN output as one lazy Dataset (skips staged
        data and side channels)."""
        import ray.data
        files = self._committed_files("part-")
        if not files:
            return ray.data.from_items([])
        # partitioning=None: the hive-style `epoch=<e>` directory names are
        # lineage bookkeeping, not data — without this, Ray's partition
        # inference attaches an `epoch` column to SOME read tasks only,
        # yielding a mixed-schema stream (RefBundle schema warnings).
        return ray.data.read_parquet(files, partitioning=None)

    def compact(self, target_epochs_per_file: int = 64) -> Dict:
        """Operational compaction: merge committed epoch directories into
        consolidated ``compacted=<i>`` directories of
        ``target_epochs_per_file`` epochs each, then rewrite the manifest
        in one atomic replace. Two-phase like everything else: the
        consolidated files are fully written under ``.staged/`` first, so
        a crash mid-compaction leaves the original epoch dirs and
        manifest untouched (re-running restarts cleanly). Preserves
        side-channel files per channel. Returns {files_before,
        files_after, epochs}. Run it OFFLINE (not concurrent with a
        writer)."""
        manifest = self.read_manifest()
        epochs = sorted(manifest["epochs"], key=lambda e: e["epoch"])
        if not epochs:
            return {"files_before": 0, "files_after": 0, "epochs": 0}
        files_before = len(self._committed_files(""))
        # flush-range epochs (snapshot semantics, e.g. the upsert
        # engine's compacted views) each stay their OWN group: merging
        # two snapshots into one file would make "newest flush only"
        # reads impossible, and a group of one keeps its epoch id
        FLUSH_BASE = 1 << 40
        data_epochs = [e for e in epochs if e["epoch"] < FLUSH_BASE]
        flush_epochs = [e for e in epochs if e["epoch"] >= FLUSH_BASE]
        groups = [data_epochs[i:i + target_epochs_per_file]
                  for i in range(0, len(data_epochs),
                                 target_epochs_per_file)]
        groups += [[e] for e in flush_epochs]
        staged_new = SinkStorage.join(".staged", "__compact__")
        if self.st.exists(staged_new):
            self.st.rmtree(staged_new)
        self.st.makedirs(staged_new)
        channels = set()
        for d in self.st.listdir("data"):
            key = SinkStorage.join("data", d)
            if self.st.isdir(key):
                for f in self.st.listdir(key):
                    if f.endswith(".parquet"):
                        pre = f.rsplit("part-", 1)[0].rstrip("-")
                        channels.add(pre)  # "" for main, else channel
        from ..functions.fingerprint import hash_file
        group_digests: Dict[int, Dict] = {}
        for gi, grp in enumerate(groups):
            gdir = SinkStorage.join(staged_new, f"epoch={grp[0]['epoch']}")
            self.st.makedirs(gdir)
            for ch in channels:
                prefix = f"{ch}-part-" if ch else "part-"
                tables = []
                for e in grp:
                    edir = SinkStorage.join("data", f"epoch={e['epoch']}")
                    if not self.st.isdir(edir):
                        continue
                    for f in self.st.listdir(edir):
                        if f.startswith(prefix) and f.endswith(".parquet"):
                            tables.append(self.st.read_table(
                                SinkStorage.join(edir, f)))
                if tables:
                    merged = SinkStorage.join(gdir, f"{prefix}00000.parquet")
                    self.st.write_table_atomic(merged,
                                               pa.concat_tables(tables))
                    if not ch:  # main channel: re-digest for the audit
                        d = hash_file(self.st.local_path(merged))
                        group_digests[grp[0]["epoch"]] = {
                            "file": f"{prefix}00000.parquet",
                            "sha256": d["sha256"], "md5": d["md5"],
                            "bytes": d["bytes"]}
        # commit: swap data dirs + rewrite manifest atomically
        new_epochs = []
        for grp in groups:
            entry = {
                "epoch": grp[0]["epoch"],
                "watermark_ms": max(e["watermark_ms"] for e in grp),
                "partitions": [{"partition": 0,
                                "rows": sum(e["rows"] for e in grp),
                                **group_digests.get(grp[0]["epoch"], {})}],
                "rows": sum(e["rows"] for e in grp),
                "state_snapshot": grp[-1].get("state_snapshot"),
                # expand nested coverage: re-compacting compacted
                # entries must keep EVERY original epoch id, or a
                # resumed run reprocesses the dropped ids (duplicates)
                "compacted_from": [x for e in grp for x in
                                   e.get("compacted_from", [e["epoch"]])],
            }
            if all("n_units" in e for e in grp):
                vals = [e["n_units"] for e in grp]
                if all(isinstance(v, list) for v in vals):
                    # multi-source engines record per-source consumption
                    # ([left, right]); sum element-wise
                    entry["n_units"] = [sum(col) for col in zip(*vals)]
                elif not any(isinstance(v, list) for v in vals):
                    entry["n_units"] = sum(vals)
                # mixed int/list (different engines wrote one sink):
                # drop n_units — planners fall back positionally
            new_epochs.append(entry)
        # crash-safe swap: STAGE the rewritten manifest first, then
        # promote via data.new — every intermediate state is
        # recoverable by _recover_compaction (roll forward when the
        # swap completed, roll back otherwise), and the surviving data
        # layout is always paired with its matching manifest. At no
        # point is the only copy of committed data in a directory the
        # next startup would delete.
        for leftover in ("data.new", "data.old"):
            if self.st.exists(leftover):
                self.st.rmtree(leftover)
        manifest["epochs"] = new_epochs
        self.st.write_bytes_atomic(
            self._COMPACT_MANIFEST, json.dumps(manifest, indent=1).encode())
        self.st.replace(staged_new, "data.new")
        self.st.replace("data", "data.old")
        self.st.replace("data.new", "data")
        self._promote_compact_manifest()
        self.st.rmtree("data.old")
        return {"files_before": files_before,
                "files_after": len(self._committed_files("")),
                "epochs": len(epochs)}

    def read_side(self, channel: str = "late"):
        """All committed SIDE-channel output (e.g. the late-data
        dead-letter stream) as one lazy Dataset."""
        import ray.data
        files = self._committed_files(f"{channel}-part-")
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files, partitioning=None)
