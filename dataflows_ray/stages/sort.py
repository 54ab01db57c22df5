"""Global stable sort.

Parity target: reference ``dataflows/processors/sort_rows.py:49-77`` —
sort by a format-string key (or list of fields / callable), stable via a
row-number suffix, ``reverse`` supported. The reference's IEEE-754
bit-trick encoding (``sort_rows.py:28-38``) exists only because its KVFile
compares byte strings; Ray's distributed range-partitioned sort compares
typed Arrow columns natively, so numeric keys sort directly.

Ray-Data mapping:
- list-of-fields key -> ``ds.sort(fields)`` (range-partitioned shuffle);
- format-string key -> compute a string key column in ``map_batches``,
  sort on it, drop it;
- stability -> append ``__row_id__`` as the final tiebreaker when present.
"""

from __future__ import annotations

import re
from typing import Callable, List, Union

import pyarrow as pa

from ..core.flow import Step, DEFAULT_BATCH_SIZE
from ..core.package import PackageStream, select_resources
from ..sources.load import ROW_ID
from ..core.raycompat import cheap_columns

SORT_KEY = "__sort_key__"


class sort_rows(Step):
    def __init__(self, key: Union[str, List[str], Callable], resources=None,
                 reverse: bool = False):
        self.key = key
        self.resources = resources
        self.reverse = reverse
        self.name = "sort_rows"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        for rname in select_resources(stream, self.resources):
            ds = stream.get(rname)
            cols = cheap_columns(ds)
            key = self.key
            if isinstance(key, str):
                fields = re.findall(r"\{(.*?)\}", key)
                # A format key over raw '{field}' formatters is a typed
                # multi-column sort whenever (a) there is no literal text,
                # or (b) any referenced column is numeric — the reference
                # bit-encodes int/float inside the key string precisely so
                # they sort numerically (sort_rows.py:28-43); sorting the
                # typed columns gives the same numeric order without the
                # encoding. Literal-text keys over pure strings keep the
                # formatted-string comparison.
                stripped = re.sub(r"\{.*?\}", "", key)
                raw_fields = (all(f in cols for f in fields)
                              and not re.search(r"\{[^}]*[:!][^}]*\}", key))
                numeric = False
                if raw_fields and stripped != "":
                    schema = ds.schema()
                    types = dict(zip(schema.names, schema.types))
                    numeric = any(
                        pa.types.is_integer(types[f]) or
                        pa.types.is_floating(types[f]) or
                        pa.types.is_decimal(types[f])
                        for f in fields if f in types)
                if raw_fields and (stripped == "" or numeric):
                    sort_cols = fields
                    computed = False
                else:
                    sort_cols = [SORT_KEY]
                    computed = True

                    def add_key(batch: pa.Table, spec=key) -> pa.Table:
                        from ..core.strformat import try_vector_format
                        arr = try_vector_format(batch, spec)
                        if arr is None:  # exotic spec/types: row loop
                            arr = pa.array(
                                [spec.format(**r)
                                 for r in batch.to_pylist()],
                                type=pa.string())
                        return batch.append_column(SORT_KEY, arr)

                    ds = ds.map_batches(add_key, batch_format="pyarrow",
                                        batch_size=DEFAULT_BATCH_SIZE)
            elif callable(key):
                sort_cols = [SORT_KEY]
                computed = True

                def add_key(batch: pa.Table, fn=key) -> pa.Table:
                    keys = [fn(r) for r in batch.to_pylist()]
                    return batch.append_column(SORT_KEY, pa.array(keys))

                ds = ds.map_batches(add_key, batch_format="pyarrow",
                                    batch_size=DEFAULT_BATCH_SIZE)
            else:
                sort_cols = list(key)
                computed = False
            if ROW_ID in cols and ROW_ID not in sort_cols:
                sort_cols = sort_cols + [ROW_ID]  # stability tiebreaker
            ds = ds.sort(sort_cols, descending=self.reverse)
            if computed:
                ds = ds.drop_columns([SORT_KEY])
            stream.set(rname, ds)
        return stream
