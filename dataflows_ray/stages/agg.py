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

Ray-Data mapping (round 2 — the shuffle-merge design):

1. PROJECT to the needed columns only (keys + aggregate sources), so the
   shuffle moves nothing it doesn't have to;
2. for all-distributive specs, a per-block pandas COMBINER first reduces
   each input block to one partial row per (block, key) — the shuffle then
   moves O(groups-per-block x blocks) rows, not every input row: THE scale
   lever for low-cardinality group-bys (100 TB of rows, 5 return flags);
3. ``repartition(nparts, keys=keys)`` — Ray's HASH-SHUFFLE repartition
   co-locates equal keys. Unlike ``groupby().aggregate()`` its empty
   output partitions keep the input schema (no column-less degradation),
   and unlike the sort-shuffle reduce there is no per-GROUP Python
   (~1.5 ms/group measured in round 1);
4. ``compact_blocks`` drops the zero-row partitions at the ref level (the
   blocks never leave the object store) — downstream ops (``Dataset.join``
   in particular) never see an empty block;
5. one ``map_batches`` per partition merges + finalizes with vectorized
   pandas groupby kernels. Only the genuinely holistic aggregators
   (median/set/array/counters) pay a per-group ``apply``, bounded to the
   groups of one partition.

At scale the group count exceeds the partition count, so step 4 drops
nothing and every stage stays fully parallel; on tiny inputs it trims the
empty partitions that Ray mints when partitions > groups.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.load import ROW_ID

HOLISTIC = {"median", "set", "array", "counters", "first", "last", "any"}
DISTRIBUTIVE = {"sum", "avg", "max", "min", "count"}
ALL_AGGREGATORS = HOLISTIC | DISTRIBUTIVE

# aggregators whose result depends on input order (anchored on __row_id__)
ORDER_SENSITIVE = {"first", "last", "array"}


def shuffle_partitions() -> int:
    """Hash-shuffle partition count sized to the session: one aggregator
    actor per partition (Ray caps the pool at 64), so more partitions than
    CPUs just adds actors that contend."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(64, ncpu))


def _to_arrow(blk) -> pa.Table:
    if isinstance(blk, pa.Table):
        return blk
    return pa.Table.from_pandas(blk, preserve_index=False)


def _df_to_arrow(out: pd.DataFrame) -> pa.Table:
    """DataFrame -> Arrow with no pandas schema metadata; columns Arrow
    can't type natively (e.g. counters' mixed [value, count] pairs) fall
    back to Ray's pickled-object extension array, which round-trips back to
    Python objects in to_pandas()/to_pylist()."""
    arrays, names = [], []
    for c in out.columns:
        s = out[c]
        try:
            arr = pa.array(s, from_pandas=True)
        except (pa.ArrowTypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
            from ray.data.extensions.object_extension import ArrowPythonObjectArray
            arr = ArrowPythonObjectArray.from_objects(s.tolist())
        arrays.append(arr)
        names.append(str(c))
    return pa.Table.from_arrays(arrays, names=names)


def _collect_nonempty_refs(ds: ray.data.Dataset):
    """Execute ``ds`` and collect (nonempty_refs, rows, bytes, first_ref)
    from the ref bundles. Blocks never leave the object store — the driver
    handles O(#blocks) refs and metadata only."""
    refs: List[Any] = []
    rows = 0
    nbytes = 0
    first_ref = None
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if first_ref is None:
                first_ref = ref
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
                rows += meta.num_rows or 0
                nbytes += meta.size_bytes or 0
    return refs, rows, nbytes, first_ref


def compact_blocks(ds: ray.data.Dataset,
                   empty_fallback: Optional[Callable[[pa.Table], pa.Table]] = None
                   ) -> ray.data.Dataset:
    """Execute ``ds`` and drop its zero-row blocks WITHOUT pulling any data
    to the driver: iterate the ref bundles (block refs + metadata), keep the
    refs whose ``num_rows > 0``, and rebuild a Dataset from those refs. The
    blocks themselves stay in the object store, so this is cluster-safe at
    any key cardinality (the driver handles O(#blocks) refs, not rows).

    It IS an execution barrier — used only directly after an all-to-all
    (which is already a pipeline breaker).

    ``empty_fallback``: when every block is empty, called with one (empty)
    input block to produce a schema-correct empty output table; without it
    the first empty block is passed through as-is.
    """
    refs, _rows, _nbytes, first_ref = _collect_nonempty_refs(ds)
    if refs:
        return ray.data.from_arrow_refs(refs)
    if first_ref is None:
        return ds  # no blocks at all
    empty = _to_arrow(ray.get(first_ref))  # zero rows — tiny
    if empty_fallback is not None:
        empty = empty_fallback(empty)
    return ray.data.from_arrow(empty)


# below this many input rows a keyed merge runs as ONE coalesced task
# instead of spawning a hash-shuffle aggregator pool (pool startup is
# seconds of fixed cost — it only amortizes on real data volumes)
SMALL_MERGE_ROWS = 200_000
# target partition size for the large path, by bytes when known
TARGET_PARTITION_BYTES = 512 * 1024 * 1024


def keyed_merge(ds: ray.data.Dataset, keys: List[str],
                merge_fn: Callable[[pd.DataFrame], pa.Table],
                empty_prepare: Optional[Callable[[pa.Table], pa.Table]]
                = None) -> ray.data.Dataset:
    """The engine's keyed-exchange primitive: co-locate equal ``keys`` and
    apply ``merge_fn`` once per partition (vectorized pandas in, Arrow out).

    Adaptive plan, sized from real metadata (the upstream is executed to
    refs first — exactly what a sort/hash shuffle does anyway — so row and
    byte counts are known without touching data):

    - small input  -> coalesce the refs into one task-based partition and
      merge there: no aggregator actors, no shuffle;
    - large input  -> hash-shuffle ``repartition(keys=...)`` with the
      partition count derived from bytes (~512 MB each, at least one per
      CPU), then drop the empty partitions at the ref level and merge.

    Every output block is non-empty with the merge's uniform schema.
    """
    refs, rows, nbytes, first_ref = _collect_nonempty_refs(ds)

    def _empty_result() -> ray.data.Dataset:
        if first_ref is None:
            return ds
        raw = _to_arrow(ray.get(first_ref))
        # Ray Data may SKIP map tasks on zero-row blocks, so the first
        # (empty) ref can still carry the RAW upstream schema rather
        # than the prepped one; ``empty_prepare`` (e.g. the aggregate's
        # combiner) re-derives the schema merge_fn expects.
        empty_in = empty_prepare(raw) if empty_prepare is not None else raw
        merged = merge_fn(empty_in.to_pandas())
        # a 0-row pandas round-trip types object columns as Arrow NULL,
        # which poisons downstream joins/unions — restore the raw input's
        # type for any column it also carries
        fields = []
        for f in merged.schema:
            if pa.types.is_null(f.type) and \
                    raw.schema.get_field_index(f.name) != -1:
                fields.append(pa.field(
                    f.name, raw.schema.field(f.name).type))
            else:
                fields.append(f)
        return ray.data.from_arrow(merged.cast(pa.schema(fields)))

    if not refs:
        return _empty_result()
    compacted = ray.data.from_arrow_refs(refs)
    if rows > SMALL_MERGE_ROWS:
        nparts = max(shuffle_partitions(),
                     int(np.ceil(nbytes / TARGET_PARTITION_BYTES)))
        shuffled = compacted.repartition(min(nparts, 256), keys=keys)
        refs2, rows2, _b2, first2 = _collect_nonempty_refs(shuffled)
        if not refs2:  # cannot happen (rows > 0), defensive
            return _empty_result()
        compacted = ray.data.from_arrow_refs(refs2)
    else:
        # task-based coalesce (no actors); all keys land in the one block
        compacted = compacted.repartition(1)
    return compacted.map_batches(merge_fn, batch_format="pandas",
                                 batch_size=None)


def ordered_group_concat(ds: ray.data.Dataset, key: str,
                         order_by: Sequence[str], col: str,
                         sep: str = " ", out_col: str = "concat",
                         count_col: Optional[str] = None
                         ) -> ray.data.Dataset:
    """Ordered string aggregation (SQL ``string_agg(col, sep ORDER BY
    order_by)`` grouped by ``key``) in the keyed-exchange shape: ONE hash
    shuffle on ``key`` via :func:`keyed_merge`, then ONE vectorized pandas
    sort + groupby per partition — not one Python task per group (Ray's
    ``groupby().map_groups`` costs ~1.5 ms/group in its reduce, which is
    minutes at 150k groups; see BASELINE.md lesson 2).

    Ordered concat has no compressing combiner (the merge needs every
    (order_key, text) pair, so per-batch partials would carry the full
    payload anyway) — the single keyed exchange IS the minimal plan.
    """
    def merge(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            cols = {key: pd.Series([], dtype=df[key].dtype if key in df else object),
                    out_col: pd.Series([], dtype=str)}
            if count_col:
                cols[count_col] = pd.Series([], dtype="int64")
            return _df_to_arrow(pd.DataFrame(cols))
        df = df.sort_values([key, *order_by], kind="mergesort")
        g = df.groupby(key, sort=True)
        out = g[col].agg(sep.join).rename(out_col).to_frame()
        if count_col:
            out[count_col] = g.size()
        return _df_to_arrow(out.reset_index())

    return keyed_merge(ds, [key], merge)


def _median(values: list) -> Any:
    if not values:
        return None
    values = sorted(values)
    n = len(values)
    mid = n // 2
    if n % 2 == 0:
        return (values[mid - 1] + values[mid]) / 2
    return values[mid]


def _counters_finalize(values) -> list:
    """Counter.most_common() with a deterministic (count desc, value asc)
    tiebreak across partitions."""
    c: collections.Counter = collections.Counter()
    for v in values:
        if v is None:
            continue
        c.update([v] if isinstance(v, str) else v)
    return [[k, n] for k, n in sorted(c.items(), key=lambda kv: (-kv[1], str(kv[0])))]


def _hash_repartition(ds: ray.data.Dataset, keys: List[str]) -> ray.data.Dataset:
    """Hash-partition by ``keys`` (requires the engine's HASH_SHUFFLE
    context, set in ``dataflows_ray/__init__``)."""
    return ds.repartition(shuffle_partitions(), keys=keys)


# ---------------------------------------------------------------------------
# all-distributive path: per-block combiner -> shuffle partials -> merge
# ---------------------------------------------------------------------------

def _distributive_plan(specs: Sequence[Dict[str, Any]]):
    """[(partial_col, source, partial_how, target, kind)] — ``kind`` drives
    the merge ('sum' partials merge by sum, 'min' by min, ...)."""
    plan = []
    for i, s in enumerate(specs):
        t, src, a = s["target"], s.get("source"), s["aggregate"]
        if a == "count":
            plan.append((f"__p{i}_cnt", None, "size", t, "count"))
        elif a == "avg":
            plan.append((f"__p{i}_sum", src, "sum", t, "avg_sum"))
            plan.append((f"__p{i}_nn", src, "count", t, "avg_cnt"))
        elif a in ("min", "any"):
            # 'any' = any value of the group (assumed constant per key in
            # reference usage); min is a deterministic valid choice
            plan.append((f"__p{i}_min", src, "min", t, "min"))
        elif a == "max":
            plan.append((f"__p{i}_max", src, "max", t, "max"))
        else:  # sum
            plan.append((f"__p{i}_sum", src, "sum", t, "sum"))
    return plan


def _make_combiner(keys: List[str], plan):
    def combine(df: pd.DataFrame):
        g = df.groupby(keys, sort=False, dropna=False)
        # ADAPTIVE: when keys are near-unique in this batch, a per-group
        # aggregation reduces nothing but pays pandas per-group overhead
        # (object-dtype min over 100k groups is seconds per batch). Each
        # row is then its own partial — a vectorized column transform.
        # The empty batch MUST take this branch too: it emits the partial
        # SCHEMA (keyed_merge's empty-input path replays the merge over
        # the first empty block, which therefore needs the partial
        # columns, not the raw input ones).
        if len(df) == 0 or g.ngroups > 0.5 * len(df):
            parts = {k: df[k] for k in keys}
            for col, src, how, _t, _kind in plan:
                if how == "size":
                    parts[col] = np.ones(len(df), dtype=np.int64)
                elif how == "count":
                    parts[col] = df[src].notna().astype(np.int64)
                else:
                    parts[col] = df[src]
            out = pd.DataFrame(parts)
        else:
            parts = {}
            for col, src, how, _t, _k in plan:
                if how == "size":
                    parts[col] = g.size()
                elif how == "count":
                    parts[col] = g[src].count()
                elif how == "sum":
                    parts[col] = g[src].sum(min_count=1)
                else:
                    parts[col] = g[src].agg(how)
            out = pd.DataFrame(parts).reset_index()
        # Arrow out with NO pandas schema metadata: keeps the hash shuffle
        # on the zero-copy Arrow path and lets Ray dedupe identical schemas
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    return combine


def _selection_minmax(df: pd.DataFrame, keys: List[str], col: str,
                      want_max: bool) -> pd.Series:
    """min/max per key via sort + drop_duplicates — pandas' per-group agg
    on OBJECT dtype costs ~60us/group (9.6s for 150k near-unique string
    keys, measured); one stable sort + dedup is ~100x faster."""
    sub = df[keys + [col]].sort_values(col, ascending=not want_max,
                                       kind="stable", na_position="last")
    picked = sub.drop_duplicates(keys, keep="first")
    return picked.set_index(keys if len(keys) > 1 else keys[0])[col]


def _make_partial_merge(keys: List[str], plan):
    """Merge shuffled partials per hash partition: vectorized pandas
    groupby (sum/min/max over partial columns), then finalize targets.
    Non-numeric min/max route through the sort+dedup selection kernel."""

    merge_how = {"count": "sum", "sum": "sum", "avg_sum": "sum",
                 "avg_cnt": "sum", "min": "min", "max": "max"}
    by_target: Dict[str, Dict[str, str]] = {}
    for col, _src, _how, t, kind in plan:
        by_target.setdefault(t, {})[kind] = col

    def merge(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for col, _src, _how, _t, kind in plan:
            how = merge_how[kind]
            if how in ("min", "max") and not pd.api.types.is_numeric_dtype(
                    df[col]) and not pd.api.types.is_datetime64_any_dtype(
                    df[col]):
                parts[col] = _selection_minmax(df, keys, col, how == "max")
            elif kind in ("sum", "avg_sum"):
                # all-null groups must stay null (reference: a sum that
                # never saw a value is None), not become 0
                parts[col] = g[col].sum(min_count=1)
            else:
                parts[col] = g[col].agg(how)
        out = pd.concat(parts, axis=1).reset_index()
        out.columns = keys + [col for col, *_ in plan]
        for t, kinds in by_target.items():
            if "avg_sum" in kinds:
                cnt = out[kinds["avg_cnt"]].to_numpy(dtype=np.float64)
                out[t] = np.where(cnt > 0,
                                  out[kinds["avg_sum"]].to_numpy(dtype=np.float64)
                                  / np.where(cnt > 0, cnt, 1.0),
                                  np.nan)
            else:
                out[t] = out[next(iter(kinds.values()))]
        out = out[keys + list(by_target.keys())]
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    return merge


# ---------------------------------------------------------------------------
# general path (any holistic spec): shuffle raw projected rows -> merge
# ---------------------------------------------------------------------------

def _make_raw_merge(keys: List[str], specs: Sequence[Dict[str, Any]],
                    has_row_id: bool):
    """Per-partition merge over raw (projected) rows. Vectorized groupby
    kernels for the distributive + first/last/any aggregators; per-group
    ``apply`` only for median/set/array/counters (genuinely holistic)."""

    order_needed = has_row_id and any(s["aggregate"] in ORDER_SENSITIVE
                                      for s in specs)

    def merge(df: pd.DataFrame) -> pa.Table:
        if order_needed:
            df = df.sort_values(ROW_ID, kind="stable")
        g = df.groupby(keys, sort=False, dropna=False)
        series: Dict[str, pd.Series] = {}
        for s in specs:
            t, src, a = s["target"], s.get("source"), s["aggregate"]
            col = g[src] if (src is not None and a != "count") else None
            if a == "sum":
                series[t] = col.sum(min_count=1)
            elif a == "avg":
                series[t] = col.mean()
            elif a in ("min", "max"):
                if (pd.api.types.is_numeric_dtype(df[src])
                        or pd.api.types.is_datetime64_any_dtype(df[src])):
                    series[t] = col.min() if a == "min" else col.max()
                else:
                    series[t] = _selection_minmax(df, keys, src, a == "max")
            elif a == "count":
                series[t] = g.size()  # counts ALL rows incl. nulls
            elif a in ("first", "any"):
                # value at the smallest __row_id__ among NON-NULL values:
                # vectorized via drop_duplicates on the null-filtered frame
                nn = df[df[src].notna()]
                picked = nn.drop_duplicates(keys, keep="first") \
                           .set_index(keys)[src]
                series[t] = picked
            elif a == "last":
                nn = df[df[src].notna()]
                picked = nn.drop_duplicates(keys, keep="last") \
                           .set_index(keys)[src]
                series[t] = picked
            elif a == "median":
                series[t] = col.apply(
                    lambda v: _median(v.dropna().tolist()))
            elif a == "set":
                series[t] = col.apply(
                    lambda v: sorted(set(v.dropna().tolist())))
            elif a == "array":
                series[t] = col.apply(lambda v: v.dropna().tolist())
            elif a == "counters":
                series[t] = col.apply(lambda v: _counters_finalize(v))
            else:
                raise ValueError(f"Unknown aggregator: {a}")
        if series:
            out = pd.concat(series, axis=1)
            # concat aligns on the group index; groups a spec produced no
            # value for (all-null source) become NaN -> null in Arrow
            out = out.reset_index()
            out.columns = keys + [s["target"] for s in specs]
        else:  # pure distinct-keys projection
            out = df.drop_duplicates(keys)[keys].reset_index(drop=True)
        return _df_to_arrow(out)

    return merge


def grouped_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    specs: Sequence[Dict[str, Any]],
    input_columns: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """``specs``: [{"target": out_col, "source": in_col, "aggregate": name}].

    Returns one row per distinct key tuple with finalized aggregates.
    Output blocks are guaranteed non-empty with a uniform schema (the
    round-1 column-less-empty-block degradation is fixed here at the root).

    ``input_columns``: the upstream schema, when the caller knows it.
    Without it, the ROW_ID check below calls ``ds.columns()``, which on a
    lazy pipeline EXECUTES the upstream plan to its first output block —
    behind a heavy decode stage that probe alone can cost seconds and
    double-pays worker warmup. Callers on hot paths should pass it.
    """
    keys = list(keys)
    if input_columns is not None:
        has_row_id = ROW_ID in input_columns
    else:
        sch = ds.schema(fetch_if_missing=False)
        has_row_id = (ROW_ID in sch.names) if sch is not None \
            else ROW_ID in ds.columns()

    # Fast path: an aggregate of a GROUP KEY column with a selection
    # aggregator is just the key itself — alias it instead of aggregating.
    aliases: List[Any] = []  # (target, key_col)
    real_specs = []
    for spec in specs:
        src = spec.get("source")
        if src in keys and spec["aggregate"] in ("first", "last", "any"):
            aliases.append((spec["target"], src))
        else:
            real_specs.append(spec)
    specs = real_specs

    for spec in specs:
        if spec["aggregate"] not in ALL_AGGREGATORS:
            raise ValueError(f"Unknown aggregator: {spec['aggregate']}")

    distributive = bool(specs) and all(
        s["aggregate"] in ("sum", "count", "min", "max", "avg", "any")
        for s in specs)

    if distributive:
        plan = _distributive_plan(specs)
        need = list(dict.fromkeys(
            keys + [src for _c, src, _h, _t, _k in plan if src is not None]))
        prepped = ds.select_columns(need).map_batches(
            _make_combiner(keys, plan), batch_format="pandas",
            # batch_size=None: combine per BLOCK. A numeric batch_size here
            # would FUSE upstream stages to a handful of fat tasks
            batch_size=None)
        merge_fn = _make_partial_merge(keys, plan)
    else:
        order_needed = has_row_id and (
            not specs or any(s["aggregate"] in ORDER_SENSITIVE for s in specs))
        need = list(dict.fromkeys(
            keys + [s["source"] for s in specs
                    # count counts rows — its (defaulted) source need not exist
                    if s.get("source") is not None and s["aggregate"] != "count"]
            + ([ROW_ID] if order_needed else [])))
        merge_fn = _make_raw_merge(keys, specs, has_row_id)
        # normalize to Arrow blocks (zero-copy when already Arrow) so every
        # ref keyed_merge collects is a pa.Table
        prepped = ds.select_columns(need).map_batches(
            lambda t: t, batch_format="pyarrow", batch_size=None)

    if distributive:
        combiner = _make_combiner(keys, plan)

        def _prep_empty(t: pa.Table) -> pa.Table:
            names = set(t.column_names)
            if all(col in names for col, *_rest in plan):
                return t  # already combined (the map did run)
            return combiner(t.to_pandas().head(0))
        out = keyed_merge(prepped, keys, merge_fn,
                          empty_prepare=_prep_empty)
    else:
        out = keyed_merge(prepped, keys, merge_fn)

    if aliases:
        def post(batch: pa.Table) -> pa.Table:
            for target, key_col in aliases:
                if target != key_col:
                    batch = batch.append_column(target, batch[key_col])
            return batch
        out = out.map_batches(post, batch_format="pyarrow", batch_size=None)
    return out


# re-aggregation rule for combining a finer rollup level into a coarser
# one (only distributive aggregates roll up; count re-aggregates as sum)
_ROLLUP_REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _grand_total_fallback(count_targets):
    """``compact_blocks`` fallback for the empty grouping set ``()``:
    SQL GROUP BY ROLLUP/CUBE/GROUPING SETS emits exactly ONE grand-total
    row on empty input (count 0, NULL sums/mins/maxes), whereas a keyed
    aggregate over zero rows emits zero groups — this synthesizes that
    row with the level's own schema."""
    def fb(empty: pa.Table) -> pa.Table:
        arrays = []
        for f in empty.schema:
            if f.name in count_targets and not pa.types.is_null(f.type):
                arrays.append(pa.array([0], f.type))
            else:
                arrays.append(pa.nulls(1, f.type))
        return pa.Table.from_arrays(arrays, schema=empty.schema)
    return fb


def rollup_aggregate(ds: ray.data.Dataset, keys: Sequence[str],
                     specs: Sequence[Dict[str, Any]]) -> ray.data.Dataset:
    """SQL ``GROUP BY ROLLUP(keys)``: one result set per key-prefix level
    (``keys``, ``keys[:-1]``, ..., grand total), with the dropped key
    columns NULL-filled.

    Scale shape — the classic rollup optimization: the corpus is scanned
    ONCE (the finest level via ``grouped_aggregate``); every coarser
    level re-aggregates the previous level's GROUP-COUNT-SIZED output
    (sum->sum, count->sum, min->min, max->max), so each step is a tiny
    keyed exchange. Only distributive aggregates are supported."""
    keys = list(keys)
    for s in specs:
        if s["aggregate"] not in _ROLLUP_REAGG:
            raise ValueError(
                f"rollup supports {sorted(_ROLLUP_REAGG)} aggregates, "
                f"got {s['aggregate']!r}")
    targets = [s["target"] for s in specs]
    respecs = [{"target": s["target"], "source": s["target"],
                "aggregate": _ROLLUP_REAGG[s["aggregate"]]} for s in specs]

    finest = grouped_aggregate(ds, keys, specs)
    key_types = {f.name: f.type for f in
                 pa.schema([(k, t) for k, t in
                            zip(finest.schema().names,
                                finest.schema().types)])
                 if f.name in keys}

    def level_fill(level_keys: List[str]):
        """Append typed-NULL columns for the rolled-up keys and order
        columns uniformly as keys + targets."""
        def fn(batch: pa.Table, level_keys=list(level_keys)) -> pa.Table:
            for k in keys:
                if k not in level_keys:
                    batch = batch.append_column(
                        k, pa.nulls(len(batch), type=key_types[k]))
            return batch.select(keys + targets)
        return fn

    levels = [finest.map_batches(level_fill(keys), batch_format="pyarrow",
                                 batch_size=None)]
    prev = finest
    for depth in range(len(keys) - 1, -1, -1):
        lv_keys = keys[:depth]
        if lv_keys:
            lv = grouped_aggregate(prev, lv_keys, respecs)
        else:
            const = prev.map_batches(
                lambda t: t.append_column(
                    "__rollup_all__",
                    pa.array(np.zeros(len(t), dtype=np.int8))),
                batch_format="pyarrow", batch_size=None)
            lv = compact_blocks(
                grouped_aggregate(const, ["__rollup_all__"], respecs)
                .drop_columns(["__rollup_all__"]),
                empty_fallback=_grand_total_fallback(
                    {s["target"] for s in specs
                     if s["aggregate"] == "count"}))
        prev = lv
        levels.append(lv.map_batches(level_fill(lv_keys),
                                     batch_format="pyarrow",
                                     batch_size=None))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def grouping_sets_aggregate(ds: ray.data.Dataset, keys: Sequence[str],
                            sets: Sequence[Sequence[str]],
                            specs: Sequence[Dict[str, Any]],
                            ) -> ray.data.Dataset:
    """SQL ``GROUP BY GROUPING SETS(sets)`` over ``keys``: one result
    set per grouping set, dropped key columns NULL-filled (keys are
    assumed non-null in the data, as in SQL the NULL marker would
    otherwise be ambiguous).

    Scale shape — same as :func:`rollup_aggregate`: the corpus is
    scanned ONCE (the finest level over ALL ``keys`` via
    ``grouped_aggregate``); every requested set re-aggregates that
    group-count-sized result, so each extra set costs a tiny keyed
    exchange, never a second corpus scan. Only distributive aggregates
    (sum/count/min/max) re-aggregate correctly."""
    keys = list(keys)
    sets = [list(s) for s in sets]
    for s in sets:
        unknown = [k for k in s if k not in keys]
        if unknown:
            raise ValueError(f"grouping set {s} has keys {unknown} "
                             f"not in {keys}")
    for sp in specs:
        if sp["aggregate"] not in _ROLLUP_REAGG:
            raise ValueError(
                f"grouping sets support {sorted(_ROLLUP_REAGG)} "
                f"aggregates, got {sp['aggregate']!r}")
    targets = [sp["target"] for sp in specs]
    respecs = [{"target": sp["target"], "source": sp["target"],
                "aggregate": _ROLLUP_REAGG[sp["aggregate"]]}
               for sp in specs]

    finest = grouped_aggregate(ds, keys, specs)
    key_types = {n: t for n, t in zip(finest.schema().names,
                                      finest.schema().types) if n in keys}

    def level_fill(level_keys: List[str]):
        def fn(batch: pa.Table, level_keys=list(level_keys)) -> pa.Table:
            for k in keys:
                if k not in level_keys:
                    batch = batch.append_column(
                        k, pa.nulls(len(batch), type=key_types[k]))
            return batch.select(keys + targets)
        return fn

    levels = []
    for s in sets:
        if set(s) == set(keys):
            lv = finest
        elif s:
            lv = grouped_aggregate(finest, s, respecs)
        else:
            const = finest.map_batches(
                lambda t: t.append_column(
                    "__gs_all__",
                    pa.array(np.zeros(len(t), dtype=np.int8))),
                batch_format="pyarrow", batch_size=None)
            lv = compact_blocks(
                grouped_aggregate(const, ["__gs_all__"], respecs)
                .drop_columns(["__gs_all__"]),
                empty_fallback=_grand_total_fallback(
                    {sp["target"] for sp in specs
                     if sp["aggregate"] == "count"}))
        levels.append(lv.map_batches(level_fill(s), batch_format="pyarrow",
                                     batch_size=None))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_aggregate(ds: ray.data.Dataset, keys: Sequence[str],
                   specs: Sequence[Dict[str, Any]]) -> ray.data.Dataset:
    """SQL ``GROUP BY CUBE(keys)``: every subset of ``keys`` as a
    grouping set (2^k sets — keep ``keys`` short), via
    :func:`grouping_sets_aggregate`'s one-scan re-aggregation."""
    from itertools import combinations
    keys = list(keys)
    sets: List[List[str]] = []
    for r in range(len(keys), -1, -1):
        for c in combinations(keys, r):
            sets.append(list(c))
    return grouping_sets_aggregate(ds, keys, sets, specs)
