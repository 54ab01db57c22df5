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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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

    # NOTE accumulator shapes: Ray shuffles accumulator state as blocks and
    # tries Arrow conversion first; mixed-type tuples fail that and hit an
    # expensive stringify-the-whole-column error fallback. Accumulators are
    # therefore dicts with named, homogeneous-ish fields ({"r": int,
    # "v": value}) which convert as Arrow structs.
    if agg in ("first", "last", "any"):
        # acc = {"r": row_id, "v": value} of the chosen element, or None
        pick_min = agg in ("first", "any")

        def acc_block(acc, block):
            # vectorized: one argmin/argmax per block, no per-row Python
            col = block[source]
            if isinstance(block, pa.Table):
                valid = np.asarray(pc.is_valid(col))
            else:
                valid = block[source].notna().to_numpy()
            if not valid.any():
                return acc
            if has_row_id:
                rids = (block[ROW_ID].to_numpy(zero_copy_only=False)
                        if isinstance(block, pa.Table)
                        else block[ROW_ID].to_numpy())
            else:
                rids = np.arange(len(valid))
            rids = np.where(valid, rids, np.iinfo(np.int64).max if pick_min
                            else np.iinfo(np.int64).min)
            i = int(np.argmin(rids) if pick_min else np.argmax(rids))
            rid = int(rids[i])
            v = col[i].as_py() if isinstance(block, pa.Table) else block[source].iloc[i]
            if acc is None or (rid < acc["r"] if pick_min else rid > acc["r"]):
                acc = {"r": rid, "v": v}
            return acc

        def merge(a, b):
            if a is None:
                return b
            if b is None:
                return a
            if pick_min:
                return a if a["r"] <= b["r"] else b
            return a if a["r"] >= b["r"] else b

        return AggregateFn(init=lambda k: None, merge=merge, name=target,
                           accumulate_block=acc_block,
                           finalize=lambda acc: None if acc is None else acc["v"])

    if agg in ("median", "array"):
        # acc = {"r": [row_ids], "v": [values]} — columnar, Arrow-friendly
        def acc_block(acc, block):
            vals = _col_values(block, source)
            rids = _col_values(block, ROW_ID) if has_row_id else [-1] * len(vals)
            out_r = list(acc["r"])
            out_v = list(acc["v"])
            for r, v in zip(rids, vals):
                if v is not None:
                    out_r.append(r)
                    out_v.append(v)
            return {"r": out_r, "v": out_v}

        def merge(a, b):
            return {"r": a["r"] + b["r"], "v": a["v"] + b["v"]}

        if agg == "median":
            fin = lambda acc: _median(acc["v"])
        else:
            def fin(acc):
                if acc["r"] and acc["r"][0] != -1:
                    order = np.argsort(np.asarray(acc["r"]), kind="stable")
                    return [acc["v"][i] for i in order]
                return list(acc["v"])

        return AggregateFn(init=lambda k: {"r": [], "v": []}, merge=merge,
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
        # acc = {"k": [keys], "n": [counts]} — Arrow-friendly parallel lists
        def acc_block(acc, block):
            c = collections.Counter(dict(zip(acc["k"], acc["n"])))
            for v in _col_values(block, source):
                if v is None:
                    continue
                c.update([v] if isinstance(v, str) else v)
            items = sorted(c.items())
            return {"k": [k for k, _ in items], "n": [n for _, n in items]}

        def merge(a, b):
            c = collections.Counter(dict(zip(a["k"], a["n"])))
            c.update(dict(zip(b["k"], b["n"])))
            items = sorted(c.items())
            return {"k": [k for k, _ in items], "n": [n for _, n in items]}

        def fin(acc):
            # most_common(): count desc, insertion order tiebreak; we pin
            # (count desc, value asc) for determinism across partitions.
            pairs = sorted(zip(acc["k"], acc["n"]),
                           key=lambda kv: (-kv[1], str(kv[0])))
            return [list(p) for p in pairs]

        return AggregateFn(init=lambda k: {"k": [], "n": []}, merge=merge,
                           name=target, accumulate_block=acc_block, finalize=fin)

    raise ValueError(f"Unknown holistic aggregator {agg}")


def _precombined_aggregate(ds: ray.data.Dataset, keys: List[str],
                           specs: Sequence[Dict[str, Any]]) -> ray.data.Dataset:
    """Two-stage distributive aggregation: per-batch pandas combiner ->
    tiny native groupby over the partials.

    The shuffle moves O(groups-per-batch x batches) partial rows instead of
    every input row — THE scale lever for low-cardinality group-bys
    (100 TB of rows, 5 return flags). All kernels vectorized."""

    plan = []  # (partial_col, src, pandas_agg, target, kind)
    for i, s in enumerate(specs):
        t, src, a = s["target"], s.get("source"), s["aggregate"]
        if a == "count":
            plan.append((f"__p{i}_cnt", None, "size", t, "count"))
        elif a == "avg":
            plan.append((f"__p{i}_sum", src, "sum", t, "avg_sum"))
            plan.append((f"__p{i}_nn", src, "count", t, "avg_cnt"))
        elif a in ("min", "any"):
            plan.append((f"__p{i}_min", src, "min", t, "min"))
        elif a == "max":
            plan.append((f"__p{i}_max", src, "max", t, "max"))
        else:  # sum
            plan.append((f"__p{i}_sum", src, "sum", t, "sum"))

    def combine(df: pd.DataFrame):
        g = df.groupby(keys, sort=False, dropna=False)
        # ADAPTIVE: when keys are near-unique in this batch, a per-group
        # aggregation reduces nothing but pays pandas per-group overhead
        # (object-dtype min over 100k groups is seconds per batch). Each
        # row is then its own partial — a vectorized column transform.
        if g.ngroups > 0.5 * len(df):
            parts = {k: df[k] for k in keys}
            for col, src, how, _t, kind in plan:
                if how == "size":
                    parts[col] = np.ones(len(df), dtype=np.int64)
                elif how == "count":
                    parts[col] = df[src].notna().astype(np.int64)
                else:
                    parts[col] = df[src]
            # Arrow out: keeps Ray's downstream sort/aggregate on the
            # vectorized Arrow path (pandas blocks with object dtypes put
            # the shuffle on a per-row Python path)
            return pa.Table.from_pandas(pd.DataFrame(parts),
                                        preserve_index=False)
        parts = {}
        for col, src, how, _t, _k in plan:
            if how == "size":
                parts[col] = g.size()
            elif how == "count":
                parts[col] = g[src].count()
            else:
                parts[col] = g[src].agg(how)
        out = pd.DataFrame(parts).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    # batch_size=None: combine per BLOCK. A large fixed batch_size here
    # would FUSE upstream (decode/map) stages into a handful of fat tasks
    # (Ray bundles the whole fused chain to the largest batch_size),
    # silently serializing the pipeline — measured 4 tasks for a 32-CPU
    # job before this was removed.
    partial = ds.map_batches(combine, batch_format="pandas", batch_size=None)

    # Merge partials with native vectorized aggregates. Two notes from
    # painful measurement:
    # - Coalesce first: an all-to-all over N tiny combiner outputs creates
    #   O(N^2) intermediate objects (240 blocks -> ~57k objects, ~1 min of
    #   pure scheduling); repartition to ~2x CPUs bounds the fan-in.
    # - The native reduce costs Python per GROUP (~1.5 ms); acceptable once
    #   partials are combined, and parallel across the reduce partitions.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(8, min(128, ncpu * 2))
    partial = partial.repartition(nparts)

    native = []
    for col, _src, _how, _t, kind in plan:
        if kind in ("count", "sum", "avg_sum", "avg_cnt"):
            native.append(Sum(col, alias_name=col, ignore_nulls=True))
        elif kind == "min":
            native.append(Min(col, alias_name=col, ignore_nulls=True))
        else:
            native.append(Max(col, alias_name=col, ignore_nulls=True))
    merged = partial.groupby(keys).aggregate(*native)

    def finalize(batch: pa.Table) -> pa.Table:
        by_target: Dict[str, Dict[str, str]] = {}
        for col, _src, _how, t, kind in plan:
            by_target.setdefault(t, {})[kind] = col
        for t, kinds in by_target.items():
            if "avg_sum" in kinds:
                col = pc.divide(
                    pc.cast(batch[kinds["avg_sum"]], pa.float64()),
                    pc.cast(batch[kinds["avg_cnt"]], pa.float64()))
            else:
                only = next(iter(kinds.values()))
                col = batch[only]
            if t in batch.column_names:
                batch = batch.drop_columns([t])
            batch = batch.append_column(t, col)
        drop = [c for c in batch.column_names if c.startswith("__p")]
        return batch.drop_columns(drop) if drop else batch

    return merged.map_batches(finalize, batch_format="pyarrow")


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
    # Fast path: an aggregate of a GROUP KEY column with a selection
    # aggregator is just the key itself — alias it instead of running a
    # holistic accumulator over every row (this is what makes pure
    # distributive group-bys run entirely on native vectorized aggregates).
    aliases: List[Any] = []  # (target, key_col)
    real_specs = []
    for spec in specs:
        src = spec.get("source")
        if (src in keys and spec["aggregate"] in ("first", "last", "any")):
            aliases.append((spec["target"], src))
        else:
            real_specs.append(spec)
    specs = real_specs
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
        elif agg == "any":
            # 'any' = any value of the group (assumed constant per key in
            # reference usage); native vectorized Min is a deterministic
            # valid choice and avoids per-group Python at high cardinality
            aggs.append(Min(source, alias_name=target, ignore_nulls=True))
        elif agg in HOLISTIC:
            aggs.append(_make_holistic(agg, source, target, has_row_id))
        else:
            raise ValueError(f"Unknown aggregator: {agg}")
    if not aggs and aliases:
        # pure key projection: distinct keys via a count we drop after
        aggs.append(Count(alias_name="__n__"))
    if specs and all(s["aggregate"] in ("sum", "count", "min", "max", "avg",
                                       "any") for s in specs):
        out = _precombined_aggregate(ds, keys, specs)
    else:
        out = ds.groupby(keys).aggregate(*aggs)
    if aliases:
        def post(batch: pa.Table) -> pa.Table:
            for target, key_col in aliases:
                if target != key_col:
                    batch = batch.append_column(target, batch[key_col])
            if "__n__" in batch.column_names:
                batch = batch.drop_columns(["__n__"])
            return batch
        out = out.map_batches(post, batch_format="pyarrow")
    return out
