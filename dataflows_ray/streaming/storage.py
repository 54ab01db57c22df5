"""Storage abstraction under the exactly-once sink.

The sink's 2PC layout (``.staged/`` -> ``data/`` promotion, atomic
manifest replace, state snapshots) assumed a shared POSIX path. On a
real multi-node cluster the sink root is an object-store prefix
(``s3://bucket/table``) or a shared mount seen at DIFFERENT local paths
per node. This module narrows everything the sink touches to a small
primitive set expressed against '/'-joined KEYS relative to the sink
root, so a backend is one class:

- ``LocalStorage`` — today's behavior; keys are paths under the root.
- ``RemappedStorage`` — test double registered under a URI scheme that
  maps a virtual prefix (``swapfs://bucket/table``) to a configurable
  local root; swapping the mapping between runs simulates a resumed job
  seeing the same shared store from a different mount point.

An S3-style backend implements the same primitives with object calls:
``write_bytes_atomic`` -> single PUT (atomic per object),
``replace_dir`` -> rename-free promotion (the manifest is the source of
truth for committed files — see ``ExactlyOnceSink._committed_files``,
which prefers manifest-recorded file names over listing), ``rmtree`` ->
batched delete, ``listdir`` -> LIST with prefix. Nothing in the sink
requires read-after-write listing consistency: readers resolve through
the manifest, which is a single atomically-replaced object.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Tuple


class SinkStorage:
    """Primitive ops over '/'-joined keys. The base class implements
    every op against ``local_path(key)`` — a POSIX-backed store only
    defines the key->path mapping; an object-store backend overrides
    the primitives themselves."""

    #: scheme -> constructor(netloc_and_path) for URI roots
    _registry: Dict[str, type] = {}

    @classmethod
    def register(cls, scheme: str, impl: type) -> None:
        cls._registry[scheme] = impl

    @classmethod
    def resolve(cls, root: str) -> "SinkStorage":
        """A plain path -> LocalStorage; ``scheme://...`` -> the
        registered backend for that scheme."""
        if "://" in root:
            scheme, rest = root.split("://", 1)
            if scheme in ("file", "local"):
                return LocalStorage("/" + rest.lstrip("/"))
            impl = cls._registry.get(scheme)
            if impl is None:
                raise ValueError(f"no sink storage backend for "
                                 f"{scheme}:// (registered: "
                                 f"{sorted(cls._registry)})")
            return impl(rest)
        return LocalStorage(root)

    # -- key space ----------------------------------------------------
    def local_path(self, key: str) -> str:
        """Concrete path for a key. Object-store backends raise for ops
        that must stream instead; POSIX backends map keys to paths."""
        raise NotImplementedError

    @staticmethod
    def join(*parts: str) -> str:
        return "/".join(p.strip("/") for p in parts if p != "")

    # -- primitives (POSIX default implementations) --------------------
    def exists(self, key: str) -> bool:
        return os.path.exists(self.local_path(key))

    def isdir(self, key: str) -> bool:
        return os.path.isdir(self.local_path(key))

    def makedirs(self, key: str) -> None:
        os.makedirs(self.local_path(key), exist_ok=True)

    def listdir(self, key: str) -> List[str]:
        return sorted(os.listdir(self.local_path(key)))

    def rmtree(self, key: str) -> None:
        shutil.rmtree(self.local_path(key))

    def delete(self, key: str) -> None:
        """Remove one small object (file); no-op if absent."""
        try:
            os.remove(self.local_path(key))
        except FileNotFoundError:
            pass

    def getsize(self, key: str) -> int:
        return os.path.getsize(self.local_path(key))

    def replace(self, src_key: str, dst_key: str) -> None:
        """Atomic rename (file or directory). Object-store backends
        implement file replace as PUT-to-final and do not support
        directory renames — the sink only dir-renames under the local
        backend's 2PC; with a manifest-pointer backend the staged keys
        are promoted by the manifest write alone."""
        os.replace(self.local_path(src_key), self.local_path(dst_key))

    def read_bytes(self, key: str) -> bytes:
        with open(self.local_path(key), "rb") as f:
            return f.read()

    def write_bytes_atomic(self, key: str, data: bytes) -> None:
        """All-or-nothing small-object write (manifests, snapshots):
        tmp + rename locally, single PUT on an object store."""
        path = self.local_path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def write_table_atomic(self, key: str, table) -> None:
        """Parquet write of one part file (tmp + rename locally; an
        object-store backend streams a multipart upload, which is
        atomic at complete-time)."""
        import pyarrow.parquet as pq
        path = self.local_path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    def read_table(self, key: str):
        import pyarrow.parquet as pq
        return pq.read_table(self.local_path(key))


class LocalStorage(SinkStorage):
    def __init__(self, root: str):
        self.root = root

    def local_path(self, key: str) -> str:
        return os.path.join(self.root, key) if key else self.root

    def __repr__(self) -> str:
        return f"LocalStorage({self.root!r})"


class RemappedStorage(SinkStorage):
    """Test double for a shared store mounted at a configurable local
    root: ``swapfs://<bucket>/<key...>`` resolves through a mount table.
    Re-pointing the mount between runs simulates a resumed driver on a
    different node seeing the same bucket.

    Like real object-store credentials/endpoint config, the mount table
    must be visible to EVERY process of the job (sink URIs are
    re-resolved inside Ray tasks and actors), so it is persisted in a
    well-known file; :func:`mount` / :func:`unmount` maintain it. The
    root is captured at construction — a pickled storage keeps the view
    it was resolved with."""

    MOUNTS_FILE = "/tmp/.dataflows_ray_swapfs_mounts.json"

    @classmethod
    def _mounts(cls) -> Dict[str, str]:
        import json
        try:
            with open(cls.MOUNTS_FILE) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    @classmethod
    def mount(cls, bucket: str, root: str) -> None:
        import json
        m = cls._mounts()
        m[bucket] = root
        tmp = cls.MOUNTS_FILE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, cls.MOUNTS_FILE)

    @classmethod
    def unmount(cls, bucket: str) -> None:
        import json
        m = cls._mounts()
        m.pop(bucket, None)
        tmp = cls.MOUNTS_FILE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, cls.MOUNTS_FILE)

    def __init__(self, rest: str):
        bucket, _, prefix = rest.partition("/")
        mounts = self._mounts()
        if bucket not in mounts:
            raise ValueError(f"swapfs bucket {bucket!r} not mounted")
        self.bucket = bucket
        self.prefix = prefix
        self.root = mounts[bucket]

    def local_path(self, key: str) -> str:
        base = os.path.join(self.root, self.prefix)
        return os.path.join(base, key) if key else base

    def __repr__(self) -> str:
        return (f"RemappedStorage({self.bucket!r} -> "
                f"{self.root!r}, {self.prefix!r})")


SinkStorage.register("swapfs", RemappedStorage)
