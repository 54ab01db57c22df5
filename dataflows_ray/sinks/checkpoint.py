"""Flow-level checkpoint memoization with atomic manifest commit.

Parity target: reference ``dataflows/processors/checkpoint.py:19-47`` +
``processors/stream.py:33-36``: on first run the upstream chain executes
and its output is committed atomically (``<file>.active`` -> rename); on
later runs the ENTIRE upstream chain is replaced by a read of the
checkpoint, so the producer runs exactly once across runs
(conformance: reference ``tests/test_lib.py:961-990``).

Ray-Data mapping: the checkpoint is a directory of per-resource parquet
part-file dirs plus a ``manifest.json`` written via tmp-file + atomic
``os.replace`` — the same all-or-nothing commit primitive the streaming
2PC sink (``streaming/sink.py``) applies per partition/epoch. A crashed
run leaves only staged data (no manifest) and is retried from scratch.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List

import ray.data

from ..core.flow import Step
from ..core.package import PackageStream, ResourceDescriptor

DEFAULT_CHECKPOINT_PATH = ".checkpoints"


class checkpoint(Step):
    def __init__(self, checkpoint_name: str,
                 checkpoint_path: str = DEFAULT_CHECKPOINT_PATH):
        self.checkpoint_name = checkpoint_name
        self.dir = os.path.join(checkpoint_path, checkpoint_name)
        self.name = f"checkpoint({checkpoint_name})"

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    # Flow._preprocess hook (core/flow.py): rewrite the chain.
    def preprocess_chain(self, chain: List[Step]) -> List[Step]:
        if self.exists():
            return [_CheckpointLoad(self.dir)]
        return list(chain) + [_CheckpointSave(self.dir)]


class _CheckpointLoad(Step):
    def __init__(self, cp_dir: str):
        self.dir = cp_dir
        self.name = f"checkpoint_load({cp_dir})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        with open(os.path.join(self.dir, "manifest.json")) as f:
            manifest = json.load(f)
        for res in manifest["resources"]:
            rname = res["name"]
            ds = ray.data.read_parquet(os.path.join(self.dir, "data", rname))
            stream.set(rname, ds)
            desc = ResourceDescriptor(name=rname,
                                      primary_key=res.get("primaryKey", []))
            stream.package.resources[rname] = desc
        return stream


class _CheckpointSave(Step):
    def __init__(self, cp_dir: str):
        self.dir = cp_dir
        self.name = f"checkpoint_save({cp_dir})"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        staged = os.path.join(self.dir, ".staged")
        if os.path.exists(staged):
            shutil.rmtree(staged)
        os.makedirs(staged, exist_ok=True)
        resources = []
        for rname in stream.resource_names():
            ds = stream.get(rname)
            out_dir = os.path.join(staged, rname)
            ds.write_parquet(out_dir)
            resources.append({
                "name": rname,
                "primaryKey": stream.descriptor(rname).primary_key,
            })
        # commit: move staged data into place, then atomic manifest write
        data_dir = os.path.join(self.dir, "data")
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)
        os.replace(staged, data_dir)
        tmp = os.path.join(self.dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"resources": resources}, f)
        os.replace(tmp, os.path.join(self.dir, "manifest.json"))
        # read back so downstream does not recompute upstream
        for res in resources:
            stream.set(res["name"], ray.data.read_parquet(
                os.path.join(data_dir, res["name"])))
        return stream
