"""Exact deduplication on the resource's primary key.

Parity target: reference ``dataflows/processors/deduplicate.py:6-31`` —
keep the FIRST occurrence of each primaryKey tuple (in-memory seen-set over
a single-threaded stream).

Ray-Data mapping: 'first' in a parallel engine needs a total order; when a
``__row_id__`` column is present (see ``sources.load``), we keep the row
with the minimal row id per key — exact reference parity. Without it we
keep one arbitrary-but-deterministic row per key (lexicographic min row).

Implementation (round 2): hash-repartition by the key columns (equal keys
co-located), then ONE vectorized ``drop_duplicates`` per partition — no
``map_groups``, no per-group Python, no driver-side state; one shuffle of
the resource, fully parallel at any key cardinality.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
import pyarrow as pa

from ..core.flow import Step
from ..core.package import PackageStream, select_resources
from ..sources.load import ROW_ID
from .agg import keyed_merge


def dedup_dataset(ds, keys, order_col: Optional[str]):
    """Keep one row per distinct ``keys`` tuple (min ``order_col`` when
    given, else lexicographic-min row). Returns a Dataset with non-empty
    uniform-schema blocks."""
    keys = list(keys)

    def keep_first(df: pd.DataFrame, order_col=order_col, keys=keys) -> pa.Table:
        if order_col is not None:
            df = df.sort_values(order_col, kind="stable")
        else:
            df = df.sort_values(list(df.columns), kind="stable")
        out = df.drop_duplicates(keys, keep="first")
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=None)
    return keyed_merge(arrow, keys, keep_first)


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
            # NOTE dedup_dataset binds keys/order_col per call — no loop
            # closure capture (UDFs are serialized lazily; a closure over
            # the loop variable would apply the LAST resource's keys to all)
            stream.set(rname, dedup_dataset(ds, keys, order_col))
        return stream
