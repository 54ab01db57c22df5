"""Engine data model: resource descriptors + the value threaded between steps.

Parity targets (semantics only — the representation is Ray-Data-native):
- reference ``dataflows/base/datastream.py:4-14`` (DataStream = package +
  resource iterators + stats)
- reference ``dataflows/base/resource_wrapper.py:4-12`` (one resource = one
  logical table)

Here a resource is one ``ray.data.Dataset`` (blocks are Arrow tables); the
package is a lightweight descriptor dict (name, primaryKey, missingValues,
arbitrary metadata). Schemas live on the Dataset itself and are consulted
lazily; descriptor-level metadata that Ray Data has no notion of (primary
key, missing-value sentinels, error policy) lives here.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import ray.data


@dataclass
class ResourceDescriptor:
    """Descriptor metadata for one named resource (one Dataset)."""

    name: str
    primary_key: List[str] = field(default_factory=list)
    missing_values: List[str] = field(default_factory=lambda: [""])
    # Frictionless-style field descriptors: {"name":..., "type":..., "format":...}
    # Maintained best-effort; the authoritative physical schema is ds.schema().
    fields: List[Dict[str, Any]] = field(default_factory=list)
    metadata: Dict[str, Any] = field(default_factory=dict)

    def copy(self) -> "ResourceDescriptor":
        return copy.deepcopy(self)

    def field_descriptor(self, name: str) -> Optional[Dict[str, Any]]:
        for f in self.fields:
            if f.get("name") == name:
                return f
        return None


class EnginePackage:
    """Ordered set of resource descriptors + package-level metadata.

    Mirrors the reference's frictionless ``Package`` role
    (``datastream_processor.py:78-80``) without the frictionless dependency.
    """

    def __init__(self) -> None:
        self.resources: Dict[str, ResourceDescriptor] = {}
        self.metadata: Dict[str, Any] = {}

    def add(self, desc: ResourceDescriptor) -> None:
        self.resources[desc.name] = desc

    def remove_resource(self, name: str) -> None:
        """Reference frictionless ``Package.remove_resource`` shim: a
        package UDF drops a resource it has consumed."""
        self.resources.pop(name, None)

    def copy(self) -> "EnginePackage":
        pkg = EnginePackage()
        pkg.metadata = copy.deepcopy(self.metadata)
        for name, desc in self.resources.items():
            pkg.resources[name] = desc.copy()
        return pkg

    @property
    def resource_names(self) -> List[str]:
        return list(self.resources.keys())


class PackageStream:
    """The value threaded between flow steps.

    ``datasets`` maps resource name -> lazy ``ray.data.Dataset`` (the plan);
    ``package`` carries descriptors; ``stats`` is a list of per-step dicts
    merged at the end (reference ``datastream.py:10-14``).
    """

    def __init__(
        self,
        package: Optional[EnginePackage] = None,
        datasets: Optional[Dict[str, ray.data.Dataset]] = None,
        stats: Optional[List[Dict[str, Any]]] = None,
    ) -> None:
        self.package = package or EnginePackage()
        self.datasets: Dict[str, ray.data.Dataset] = datasets or {}
        self.stats: List[Dict[str, Any]] = stats if stats is not None else []

    # -- resource helpers -------------------------------------------------
    def resource_names(self) -> List[str]:
        return list(self.datasets.keys())

    def get(self, name: str) -> ray.data.Dataset:
        return self.datasets[name]

    def set(self, name: str, ds: ray.data.Dataset) -> None:
        self.datasets[name] = ds
        if name not in self.package.resources:
            self.package.add(ResourceDescriptor(name=name))

    def drop(self, name: str) -> None:
        self.datasets.pop(name, None)
        self.package.resources.pop(name, None)

    def descriptor(self, name: str) -> ResourceDescriptor:
        if name not in self.package.resources:
            self.package.add(ResourceDescriptor(name=name))
        return self.package.resources[name]

    def merged_stats(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for d in self.stats:
            out.update(d)
        return out

    def copy_shallow(self) -> "PackageStream":
        return PackageStream(
            package=self.package.copy(),
            datasets=dict(self.datasets),
            stats=list(self.stats),
        )


def select_resources(stream: PackageStream, resources) -> List[str]:
    """Resolve a resources selector (None = all, str name, int index,
    list of names) to resource names — reference helper
    ``dataflows/helpers/resource_matcher.py`` semantics (subset)."""
    names = stream.resource_names()
    if resources is None:
        return names
    if isinstance(resources, int):
        return [names[resources]]
    if isinstance(resources, str):
        import re

        rx = re.compile("^" + resources + "$")
        matched = [n for n in names if rx.match(n)]
        return matched if matched else []
    return [n for n in resources if n in names]
