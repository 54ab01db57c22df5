"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (filter -> derive -> groupby-agg, TPC-H Q1 shape)
    on /root/testdata/sf0.001."""
    from dataflows_ray.pipelines.relational import q01_pricing_summary

    return q01_pricing_summary("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from dataflows_ray.pipelines.relational import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dataflows_ray.pipelines.relational import (
        ORACLES, _audio_path, _two_stream_paths)

    # the q23/q24 oracles read the deterministic synthetic audio table in
    # /tmp, and the q107 oracle reads the two-stream source tables; make
    # sure they exist even if the oracle runs before the query
    try:
        _audio_path("/root/testdata/sf0.01")
        _two_stream_paths("/root/testdata/sf0.01")
    except Exception:
        pass
    return dict(ORACLES)
