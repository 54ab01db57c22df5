"""Version-guarded compat shims for Ray Data 2.49 empty-block schema loss.

Two related warts in Ray's map path degrade zero-row blocks to
SCHEMA-LESS blocks, which then surface as
``Operator produced a RefBundle with a different schema`` warnings and
(round 1, q06) hard Acero failures when such blocks reach a join:

1. ``BlocksToBatchesMapTransformFn.__call__`` yields
   ``builder().build()`` — an EMPTY builder, i.e. a zero-COLUMN block —
   when every input block of a task is empty
   (``map_transformer.py:443,460``; zero-row blocks are minted
   legitimately by filters and aggregates whenever a partition matches
   nothing).
2. The ``map_batches`` transform skips the UDF entirely for zero-row
   batches (``plan_udf_map_op.py:456-462``, Ray's own
   ``TODO(hchen)`` acknowledges this is a workaround for wart 1), so a
   schema-CHANGING stage (unnest, aggregate finalize, projection)
   emits pass-through empties with the INPUT schema next to real
   blocks with the OUTPUT schema.

Both patches below are wrappers around the original callables — no Ray
code is copied or modified on disk — and are no-ops if the internals
move (attribute lookups are guarded). They run on the driver at plan
time; the patched closures ship to workers inside the serialized task,
so workers need no import-order care.

Patch 2 calls the user UDF on zero-row batches that DO carry a schema.
Every UDF in this engine is vectorized Arrow/pandas and zero-row-safe
(that is already required for correctness: Ray may slice any batch to
zero rows at block boundaries). If a UDF raises on an empty batch or
returns a dict batch, we fall back to Ray's original pass-through so
third-party UDFs keep old behavior.
"""
from __future__ import annotations

import collections.abc
import itertools
from types import GeneratorType

_APPLIED = False


def _has_columns(batch) -> bool:
    try:
        import pyarrow as pa
        import pandas as pd
        if isinstance(batch, pa.Table):
            return batch.num_columns > 0
        if isinstance(batch, pd.DataFrame):
            return len(batch.columns) > 0
    except Exception:
        pass
    return True  # unknown format: treat as schema-ful, never substitute


def _patch_blocks_to_batches() -> None:
    """Wart 1: make the all-empty-input fallback block schema-typed."""
    from ray.data._internal.execution.operators import map_transformer as mt
    from ray.data.block import BlockAccessor

    cls = mt.BlocksToBatchesMapTransformFn
    if getattr(cls, "_dfr_patched", False):
        return
    orig = cls.__call__

    def __call__(self, blocks, ctx):
        blocks = iter(blocks)
        first = next(blocks, None)
        if first is None:
            return []
        try:
            typed_empty = BlockAccessor.for_block(first).slice(0, 0, copy=True)
        except Exception:
            typed_empty = None
        out = orig(self, itertools.chain([first], blocks), ctx)

        def gen():
            for b in out:
                if (typed_empty is not None
                        and not isinstance(b, collections.abc.Mapping)
                        and not _has_columns(b)
                        and BlockAccessor.for_block(b).num_rows() == 0):
                    yield typed_empty
                else:
                    yield b

        return gen()

    cls.__call__ = __call__
    cls._dfr_patched = True


def _patch_map_batches_empty_skip() -> None:
    """Wart 2: run the UDF on schema-ful zero-row batches so empty
    blocks come out with the stage's OUTPUT schema, not its input's."""
    from ray.data._internal.planner import plan_udf_map_op as p
    from ray.data.block import BlockAccessor

    if getattr(p, "_dfr_patched", False):
        return
    orig_gen = p._generate_transform_fn_for_map_batches

    def gen_transform(fn):
        if p._is_async_udf(fn):
            return orig_gen(fn)
        inner = orig_gen(fn)

        def adapt(batches):
            # Substitute each schema-ful empty batch with fn(batch)'s
            # outputs BEFORE the inner transform sees it; the inner
            # skip then passes the (still zero-row) outputs through
            # without calling fn a second time.
            for batch in batches:
                if (not isinstance(batch, collections.abc.Mapping)
                        and _has_columns(batch)
                        and BlockAccessor.for_block(batch).num_rows() == 0):
                    try:
                        res = fn(batch)
                        outs = (list(res) if isinstance(res, GeneratorType)
                                else [res])
                        if all(not isinstance(o, collections.abc.Mapping)
                               and BlockAccessor.for_block(o).num_rows() == 0
                               for o in outs):
                            yield from outs
                            continue
                    except Exception:
                        pass  # zero-row-unsafe UDF: keep Ray's behavior
                yield batch

        def transform_fn(batches, ctx):
            return inner(adapt(batches), ctx)

        return transform_fn

    p._generate_transform_fn_for_map_batches = gen_transform
    p._dfr_patched = True


def apply() -> None:
    """Apply both shims (idempotent, exception-guarded).

    ``DFR_NO_RAYCOMPAT=1`` skips them (debug/bisection escape hatch)."""
    global _APPLIED
    import os
    if _APPLIED or os.environ.get("DFR_NO_RAYCOMPAT"):
        return
    for patch in (_patch_blocks_to_batches, _patch_map_batches_empty_skip):
        try:
            patch()
        except Exception:
            pass  # future Ray: internals moved; warnings return, not errors
    _APPLIED = True


def cheap_columns(ds):
    """Column names WITHOUT executing the plan when Ray can resolve the
    schema from metadata (parquet footers, propagated projections).

    ``Dataset.columns()`` on a lazy pipeline executes the upstream plan
    to its first output block — in a multi-step Flow every step that
    probes its input this way re-executes the whole upstream once, and
    behind a heavy stage a single probe can cost seconds. Falls back to
    the executing ``columns()`` only when the schema is genuinely
    unknown (e.g. behind a schema-changing ``map_batches``)."""
    sch = ds.schema(fetch_if_missing=False)
    return list(sch.names) if sch is not None else ds.columns()
