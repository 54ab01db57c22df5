"""Exact deduplication on the resource's primary key.

Parity target: reference ``dataflows/processors/deduplicate.py:6-31`` —
keep the FIRST occurrence of each primaryKey tuple (in-memory seen-set over
a single-threaded stream).

Ray-Data mapping: 'first' in a parallel engine needs a total order; when a
``__row_id__`` column is present (see ``sources.load``), we keep the row
with the minimal row id per key — exact reference parity. Without it we
keep one arbitrary-but-deterministic row per key (min over all column
values), which equals reference behavior whenever duplicate rows are full
duplicates. Implementation is a hash-shuffle ``groupby(keys)`` +
per-group vectorized argmin — no driver-side state, scales with keys.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd

from ..core.flow import Step
from ..core.package import PackageStream, select_resources
from ..sources.load import ROW_ID


class deduplicate(Step):
    def __init__(self, resources=None, keys: Optional[Sequence[str]] = None):
        self.resources = resources
        self.keys = list(keys) if keys else None
        self.name = "deduplicate"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            keys = self.keys or stream.descriptor(rname).primary_key
            if not keys:
                raise ValueError(
                    f"deduplicate: resource '{rname}' has no primary key; "
                    "pass keys= or set_primary_key first")
            cols = ds.columns()
            order_col = ROW_ID if ROW_ID in cols else None

            def keep_first(group: pd.DataFrame) -> pd.DataFrame:
                if order_col is not None:
                    return group.nsmallest(1, order_col)
                return group.sort_values(list(group.columns)).head(1)

            stream.set(rname, ds.groupby(keys).map_groups(
                keep_first, batch_format="pandas"))
        return stream
