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

Skew: a HOT key (one key holding a large share of all rows) would overload
its single hash partition. ``salt_buckets=B`` switches to two-phase salted
dedup: phase 1 deduplicates within ``(keys, salt)`` — bounding any single
partition to ~1/B of the hot key's rows and collapsing it to at most B
survivors — phase 2 deduplicates the survivors on ``keys`` alone. min-of-
mins keeps exactly the reference's first occurrence.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.flow import Step
from ..core.package import PackageStream, select_resources
from ..sources.load import ROW_ID
from .agg import keyed_merge
from ..core.raycompat import cheap_columns

SALT = "__salt__"


def dedup_dataset(ds, keys, order_col: Optional[str], salt_buckets: int = 0):
    """Keep one row per distinct ``keys`` tuple (min ``order_col`` when
    given, else lexicographic-min row). Returns a Dataset with non-empty
    uniform-schema blocks. ``salt_buckets > 1`` enables the two-phase
    salted plan for hot-key skew."""
    keys = list(keys)

    def keep_first(df: pd.DataFrame, order_col=order_col, keys=keys,
                   drop_salt: bool = False) -> pa.Table:
        dedup_keys = keys if drop_salt or SALT not in df.columns \
            else keys + [SALT]
        if order_col is not None:
            df = df.sort_values(order_col, kind="stable")
        else:
            df = df.sort_values([c for c in df.columns if c != SALT],
                                kind="stable")
        out = df.drop_duplicates(dedup_keys, keep="first")
        if drop_salt and SALT in out.columns:
            out = out.drop(columns=[SALT])
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=None)
    if salt_buckets and salt_buckets > 1:
        B = int(salt_buckets)

        def add_salt(t: pa.Table, B=B) -> pa.Table:
            salt = (np.arange(len(t), dtype=np.int64) % B)
            return t.append_column(SALT, pa.array(salt))

        salted = arrow.map_batches(add_salt, batch_format="pyarrow",
                                   batch_size=None)
        # phase 1: first-per-(key, salt) — hot keys spread over B partitions
        phase1 = keyed_merge(salted, keys + [SALT], keep_first)
        # phase 2: first-per-key over the <=B survivors per key
        import functools
        final_fn = functools.partial(keep_first, drop_salt=True)
        return keyed_merge(phase1, keys, final_fn)
    return keyed_merge(arrow, keys, keep_first)


class deduplicate(Step):
    def __init__(self, resources=None, keys: Optional[Sequence[str]] = None,
                 salt_buckets: int = 0):
        self.resources = resources
        self.keys = list(keys) if keys else None
        self.salt_buckets = salt_buckets
        self.name = "deduplicate"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            keys = self.keys or stream.descriptor(rname).primary_key
            if not keys:
                raise ValueError(
                    f"deduplicate: resource '{rname}' has no primary key; "
                    "pass keys= or set_primary_key first")
            cols = cheap_columns(ds)
            order_col = ROW_ID if ROW_ID in cols else None
            # NOTE dedup_dataset binds keys/order_col per call — no loop
            # closure capture (UDFs are serialized lazily; a closure over
            # the loop variable would apply the LAST resource's keys to all)
            stream.set(rname, dedup_dataset(ds, keys, order_col,
                                salt_buckets=self.salt_buckets))
        return stream
