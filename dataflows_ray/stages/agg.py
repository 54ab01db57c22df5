"""Grouped aggregation with the reference's aggregator set.

Parity target: reference ``dataflows/processors/join.py:28-123`` —
aggregators ``sum avg median max min first last count any set array
counters`` with these semantics (``join.py:203-215`` indexer):

- every aggregator SKIPS null source values, EXCEPT ``count`` which counts
  all rows in the group;
- ``counters`` counts string values (or elements of list values) and
  finalizes to ``most_common()`` pairs;
- ``first``/``last``/``array`` are input-order-sensitive: in this parallel
  engine they anchor on the ``__row_id__`` column when present (see
  ``sources.load.read_parquet_with_row_ids``); without it the order is
  arbitrary-but-deterministic per run and documented as such;
- ``set`` finalizes to a SORTED list (the reference's ``list(set)`` order is
  CPython-arbitrary; we pin a deterministic order).

Ray-Data mapping: native builtin aggregates (Sum/Min/Max/Mean/Count) for
the distributive ops — Ray's sort-based shuffle partially aggregates per
block before the exchange, so shuffle volume is per-key not per-row — and
custom ``AggregateFn`` with vectorized ``accumulate_block`` for the
holistic ops (median/set/array/counters/first/last/any).
"""

from __future__ import annotations

import collections
from typing import Any, Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import AggregateFn, Count, Max, Mean, Min, Sum

from ..sources.load import ROW_ID

HOLISTIC = {"median", "set", "array", "counters", "first", "last", "any"}
DISTRIBUTIVE = {"sum", "avg", "max", "min", "count"}
ALL_AGGREGATORS = HOLISTIC | DISTRIBUTIVE


def _col_values(block, col: str) -> list:
    if isinstance(block, pa.Table):
        return block[col].to_pylist()
    return list(block[col])


def _median(values: list) -> Any:
    if not values:
        return None
    values = sorted(values)
    n = len(values)
    mid = n // 2
    if n % 2 == 0:
        return (values[mid - 1] + values[mid]) / 2
    return values[mid]


def _make_holistic(agg: str, source: str, target: str, has_row_id: bool) -> AggregateFn:
    """Build a custom AggregateFn for one holistic aggregator."""

    if agg in ("first", "last", "any"):
        # acc = (row_id, value) of the chosen element, or None
        pick_min = agg in ("first", "any")

        def acc_block(acc, block):
            vals = _col_values(block, source)
            rids = _col_values(block, ROW_ID) if has_row_id else list(range(len(vals)))
            for rid, v in zip(rids, vals):
                if v is None:
                    continue
                if acc is None or (rid < acc[0] if pick_min else rid > acc[0]):
                    acc = (rid, v)
            return acc

        def merge(a, b):
            if a is None:
                return b
            if b is None:
                return a
            if pick_min:
                return a if a[0] <= b[0] else b
            return a if a[0] >= b[0] else b

        return AggregateFn(init=lambda k: None, merge=merge, name=target,
                           accumulate_block=acc_block,
                           finalize=lambda acc: None if acc is None else acc[1])

    if agg in ("median", "array"):
        def acc_block(acc, block):
            vals = _col_values(block, source)
            rids = _col_values(block, ROW_ID) if has_row_id else [None] * len(vals)
            acc = list(acc)
            acc.extend((r, v) for r, v in zip(rids, vals) if v is not None)
            return acc

        if agg == "median":
            fin = lambda acc: _median([v for _r, v in acc])
        else:
            def fin(acc):
                if acc and acc[0][0] is not None:
                    acc = sorted(acc, key=lambda rv: rv[0])
                return [v for _r, v in acc]

        return AggregateFn(init=lambda k: [], merge=lambda a, b: a + b,
                           name=target, accumulate_block=acc_block, finalize=fin)

    if agg == "set":
        def acc_block(acc, block):
            s = set(acc)
            s.update(v for v in _col_values(block, source) if v is not None)
            return sorted(s)

        return AggregateFn(init=lambda k: [], merge=lambda a, b: sorted(set(a) | set(b)),
                           name=target, accumulate_block=acc_block,
                           finalize=lambda acc: list(acc))

    if agg == "counters":
        def acc_block(acc, block):
            c = collections.Counter(dict(acc))
            for v in _col_values(block, source):
                if v is None:
                    continue
                c.update([v] if isinstance(v, str) else v)
            return sorted(c.items())

        def merge(a, b):
            c = collections.Counter(dict(a))
            c.update(dict(b))
            return sorted(c.items())

        def fin(acc):
            # most_common(): count desc, insertion order tiebreak; we pin
            # (count desc, value asc) for determinism across partitions.
            pairs = sorted(acc, key=lambda kv: (-kv[1], str(kv[0])))
            return [list(p) for p in pairs]

        return AggregateFn(init=lambda k: [], merge=merge, name=target,
                           accumulate_block=acc_block, finalize=fin)

    raise ValueError(f"Unknown holistic aggregator {agg}")


def grouped_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    specs: Sequence[Dict[str, Any]],
) -> ray.data.Dataset:
    """``specs``: [{"target": out_col, "source": in_col, "aggregate": name}].

    Returns one row per distinct key tuple with finalized aggregates.
    """
    keys = list(keys)
    has_row_id = ROW_ID in ds.columns()
    aggs: List[Any] = []
    for spec in specs:
        target, source, agg = spec["target"], spec.get("source"), spec["aggregate"]
        if agg == "sum":
            aggs.append(Sum(source, alias_name=target, ignore_nulls=True))
        elif agg == "avg":
            aggs.append(Mean(source, alias_name=target, ignore_nulls=True))
        elif agg == "max":
            aggs.append(Max(source, alias_name=target, ignore_nulls=True))
        elif agg == "min":
            aggs.append(Min(source, alias_name=target, ignore_nulls=True))
        elif agg == "count":
            aggs.append(Count(alias_name=target))
        elif agg in HOLISTIC:
            aggs.append(_make_holistic(agg, source, target, has_row_id))
        else:
            raise ValueError(f"Unknown aggregator: {agg}")
    return ds.groupby(keys).aggregate(*aggs)
