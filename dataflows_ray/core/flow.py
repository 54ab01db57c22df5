"""Flow: ordered chain of steps over ``{resource_name: ray.data.Dataset}``.

Parity target: reference ``dataflows/base/flow.py:8-55`` —
- ``Flow(*steps)`` holds the chain; nested Flows splice (``flow.py:16-19``);
- plain functions dispatch by first parameter name (``row``/``rows``/
  ``package``, ``flow.py:38-53``);
- bare iterables become loaders (``flow.py:44-45``);
- a checkpoint step captures and rewrites the upstream chain
  (``flow.py:21-28`` with ``processors/checkpoint.py:36-47``).

Ray-Data mapping: steps transform a ``PackageStream`` (descriptors + lazy
Datasets). Nothing executes until a consuming step (dump) or a consuming
call (``results()`` / ``process()``); Ray's streaming executor then runs the
whole plan with backpressure.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import ray.data

from .exceptions import StepError
from .package import PackageStream
from .udf import dispatch_kind, make_row_batch_fn, make_rows_batch_fn, apply_stateful_rows

# Batch size for map_batches stages: None = one batch per BLOCK.
# IMPORTANT: a numeric batch_size here is a TRAP — Ray fuses map chains
# and bundles inputs to the LARGEST batch_size in the chain, so one stage
# asking for 16k-row batches collapses a 240-block pipeline into ~12
# tasks and serializes the whole job (measured). Block sizing is governed
# globally by DataContext.target_max_block_size instead.
DEFAULT_BATCH_SIZE = None


class Step:
    """Base protocol: a step transforms a PackageStream.

    Mirrors reference ``DataStreamProcessor`` (``datastream_processor.py:24-128``)
    collapsed into one phase: descriptor mutation and Dataset-plan extension
    both happen in ``__flow_step__`` (plan time; data flows only on execution).
    """

    name: str = "step"

    def __flow_step__(self, stream: PackageStream) -> PackageStream:  # pragma: no cover
        raise NotImplementedError


class _FnStep(Step):
    """A plain user function dispatched by parameter name."""

    def __init__(self, fn: Callable, kind: str, resources=None, stateful: bool = False):
        self.fn = fn
        self.kind = kind
        self.resources = resources
        self.stateful = stateful
        self.name = getattr(fn, "__name__", "fn")

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        from .package import select_resources

        if self.kind == "package":
            import inspect
            if inspect.isgeneratorfunction(self.fn):
                # reference datapackage_processor.py protocol: the fn gets
                # a package wrapper, yields the (modified) package first,
                # then one row-iterable per resource KEPT in the package
                return _apply_package_generator(self.fn, stream)
            result = self.fn(stream)
            return result if isinstance(result, PackageStream) else stream
        names = select_resources(stream, self.resources)
        for name in names:
            ds = stream.get(name)
            if self.kind == "row":
                batch_fn = make_row_batch_fn(self.fn)
                stream.set(name, ds.map_batches(
                    batch_fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
            elif self.kind == "rows":
                if self.stateful:
                    # ONE persistent generator over the ordered resource:
                    # reference whole-resource semantics (rows_processor.py)
                    stream.set(name, apply_stateful_rows(ds, self.fn))
                else:
                    batch_fn = make_rows_batch_fn(self.fn)
                    stream.set(name, ds.map_batches(
                        batch_fn, batch_format="pyarrow", batch_size=DEFAULT_BATCH_SIZE))
        return stream


class PackageWrapper:
    """What a generator-style package UDF receives (reference
    ``helpers/datapackage_processor.py``): ``.pkg`` is the package
    descriptor (mutable — ``remove_resource`` etc.), and iterating
    yields one row-iterator per resource in ORIGINAL stream order
    (including resources the fn removes from the package — it may
    consume them). Row iteration streams batches to the driver; this is
    the row-level escape hatch, not the batch fast path."""

    def __init__(self, stream: PackageStream):
        self.pkg = stream.package
        self._pairs = [(n, stream.get(n)) for n in stream.resource_names()]
        self._idx = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._idx >= len(self._pairs):
            raise StopIteration
        _name, ds = self._pairs[self._idx]
        self._idx += 1

        def rows(ds=ds):
            for batch in ds.iter_batches(batch_format="pyarrow",
                                         batch_size=4096):
                yield from batch.to_pylist()

        return rows()


def _apply_package_generator(fn: Callable, stream: PackageStream
                             ) -> PackageStream:
    """Drive the reference package-UDF generator protocol: first yield =
    the (possibly modified) package; each further yield = the rows of
    the next resource still present in the package."""
    from .udf import rows_to_table

    wrapper = PackageWrapper(stream)
    gen = fn(wrapper)
    pkg = next(gen)
    if pkg is None:
        pkg = wrapper.pkg
    kept = list(pkg.resources.keys())
    new_datasets: Dict[str, ray.data.Dataset] = {}
    for name, rows_iter in zip(kept, gen):
        rows = list(rows_iter)
        new_datasets[name] = (
            ray.data.from_arrow(rows_to_table(rows, None)) if rows
            else stream.get(name).limit(0))
    missing = [n for n in kept if n not in new_datasets]
    for n in missing:  # fn yielded fewer iterables than kept resources
        new_datasets[n] = stream.get(n)
    stream.package = pkg
    stream.datasets = new_datasets
    return stream


class Flow:
    """Composable chain of steps; itself usable as a step (splices)."""

    def __init__(self, *chain: Any):
        self.chain: List[Any] = list(chain)

    # -- public API (reference flow.py results/process/datastream) -------
    def results(self, sort: bool = False) -> Tuple[List[List[dict]], PackageStream, Dict]:
        """Execute and collect all rows per resource (small data / tests
        only — this materializes; mirrors reference ``results()``)."""
        stream = self._run()
        results = []
        for name in stream.resource_names():
            rows = _execute(lambda ds=stream.get(name): ds.take_all(), name)
            if sort:
                rows = sorted(rows, key=lambda r: tuple(str(v) for v in r.values()))
            results.append(rows)
        return results, stream, stream.merged_stats()

    def process(self) -> Tuple[PackageStream, Dict]:
        """Execute for side effects (dumps); drains each resource."""
        stream = self._run()
        for name in stream.resource_names():
            ds = stream.get(name)
            # Consuming without collecting: count() executes the plan.
            n = _execute(lambda: ds.count(), name)
            stream.stats.append({f"count_of_rows__{name}": n})
        return stream, stream.merged_stats()

    def datasets(self) -> PackageStream:
        """Build the plan and return the PackageStream WITHOUT consuming.
        Lazy: downstream code can keep composing or write the datasets."""
        return self._run()

    # -- chain machinery --------------------------------------------------
    def _run(self, initial: Optional[PackageStream] = None) -> PackageStream:
        stream = initial or PackageStream()
        steps = self._preprocess(self._normalize(self.chain))
        for position, step in enumerate(steps):
            try:
                stream = step.__flow_step__(stream)
            except StepError:
                raise
            except Exception as exc:  # wrap with provenance (exceptions parity)
                raise StepError(exc, step_name=getattr(step, "name", type(step).__name__),
                                position=position) from exc
        return stream

    def _normalize(self, chain: List[Any]) -> List[Step]:
        steps: List[Step] = []
        for link in chain:
            if link is None:
                continue
            if isinstance(link, Flow):
                steps.extend(link._normalize(link.chain))  # splice (flow.py:16-19)
            elif isinstance(link, Step):
                steps.append(link)
            elif callable(link) and hasattr(link, "__flow_step__"):
                steps.append(link)
            elif callable(link):
                steps.append(_FnStep(link, dispatch_kind(link)))
            elif isinstance(link, ray.data.Dataset):
                steps.append(_DatasetStep(link))
            elif hasattr(link, "__iter__"):
                from ..sources.load import iterable_loader
                steps.append(iterable_loader(link))
            else:
                raise TypeError(f"Cannot use {link!r} as a flow step")
        return steps

    def _preprocess(self, steps: List[Step]) -> List[Step]:
        """checkpoint rewrite — reference ``flow.py:21-28`` +
        ``checkpoint.py:36-47``: a checkpoint step replaces the entire
        upstream chain on hit, or appends a checkpoint dump on miss."""
        out: List[Step] = []
        for step in steps:
            handler = getattr(step, "preprocess_chain", None)
            if handler is not None:
                out = handler(out)
            else:
                out.append(step)
        return out


def _execute(consume: Callable[[], Any], resource_name: str):
    """Run a consuming call, wrapping Ray-side execution failures in
    StepError so callers get reference-style error provenance
    (``datastream_processor.py:88-97``)."""
    import ray.exceptions

    try:
        return consume()
    except StepError:
        raise
    except ray.exceptions.RayError as exc:
        cause = getattr(exc, "cause", None) or exc
        raise StepError(cause, step_name=f"execution[{resource_name}]",
                        position=-1) from exc


class _DatasetStep(Step):
    """A bare ray.data.Dataset used as a flow link becomes a resource."""

    _counter = [0]

    def __init__(self, ds: ray.data.Dataset, name: Optional[str] = None):
        self.ds = ds
        if name is None:
            _DatasetStep._counter[0] += 1
            name = f"res_{_DatasetStep._counter[0]}"
        self.name = name

    def __flow_step__(self, stream: PackageStream) -> PackageStream:
        stream.set(self.name, self.ds)
        return stream


def row_fn(fn: Callable, resources=None) -> Step:
    """Explicit row-UDF step (bypass name dispatch)."""
    return _FnStep(fn, "row", resources=resources)


def rows_fn(fn: Callable, resources=None, stateful: bool = False) -> Step:
    """Explicit rows-UDF step; ``stateful=True`` runs one ordered actor."""
    return _FnStep(fn, "rows", resources=resources, stateful=stateful)


def package_fn(fn: Callable) -> Step:
    """Explicit package-UDF step: ``fn(stream) -> stream | None``."""
    return _FnStep(fn, "package")
