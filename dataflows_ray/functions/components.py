"""Distributed connected components by min-label propagation — the
clustering step of large-scale near-dedup (turn LSH/SimHash candidate
PAIRS into duplicate CLUSTERS, keep one representative per cluster).

Engine-defined; published algorithm family: iterative min-label
propagation / Hash-to-Min (Rastogi et al. 2013). No driver-side
union-find: labels and edges are Datasets throughout, each iteration is
ONE keyed exchange (``stages.agg.keyed_merge`` co-locates a node's
label row with its incident edges, the per-partition merge emits the
min label to every neighbor and keeps per-node minima — vectorized
pandas, no per-node Python).

Convergence: labels are monotonically non-increasing ints, so the
global label SUM is a fixpoint detector — one tiny streaming fold per
iteration, no join against the previous labels. Iteration count is the
graph diameter; near-dup graphs are unions of near-cliques (diameter a
few hops), so 3-5 iterations are typical — ``max_iters`` guards
pathological chains (for a 10^12-node chain-shaped graph, switch to the
doubling variants of the same published family).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.agg import grouped_aggregate, keyed_merge


def connected_components(edges: ray.data.Dataset, a: str = "doc_a",
                         b: str = "doc_b", max_iters: int = 50
                         ) -> ray.data.Dataset:
    """(node, label) rows: ``label`` is the MIN node id of each
    connected component over the undirected ``edges`` (isolated nodes
    absent from ``edges`` are not emitted)."""

    def bidir(t: pa.Table) -> pa.Table:
        na = t[a]
        nb = t[b]
        if isinstance(na, pa.ChunkedArray):
            na = na.combine_chunks()
        if isinstance(nb, pa.ChunkedArray):
            nb = nb.combine_chunks()
        return pa.table({"node": pa.concat_arrays([na, nb]),
                         "nbr": pa.concat_arrays([nb, na])})

    edges2 = edges.select_columns([a, b]).map_batches(
        bidir, batch_format="pyarrow", batch_size=None)

    labels = grouped_aggregate(
        edges2.select_columns(["node"]), ["node"], []).map_batches(
        lambda t: t.append_column("label", t["node"]),
        batch_format="pyarrow", batch_size=None)

    def label_sum(lbl: ray.data.Dataset) -> int:
        total = 0
        for blk in lbl.select_columns(["label"]).iter_batches(
                batch_format="pyarrow", batch_size=None):
            s = pa.compute.sum(blk["label"]).as_py()
            total += int(s or 0)
        return total

    def propagate(df: pd.DataFrame) -> pa.Table:
        """Per-partition message generation + LOCAL combine. A node's
        (unique) label row and its incident edge rows are co-located;
        messages to the neighbors land in the SENDER's partition, so
        the output is a partial min per (partition, node) — the
        per-iteration ``grouped_aggregate`` consolidates them."""
        is_lbl = df["nbr"] == -1
        lbl = df[is_lbl]
        edge = df[~is_lbl]
        node_label = lbl.set_index("node")["label"]
        out = pd.DataFrame({
            "node": np.concatenate([lbl["node"].to_numpy(),
                                    edge["nbr"].to_numpy()]),
            "label": np.concatenate([
                lbl["label"].to_numpy(),
                node_label.reindex(edge["node"]).to_numpy()]),
        })
        out = out.dropna(subset=["label"])  # defensive; init covers all
        out = out.groupby("node", sort=False)["label"].min().reset_index()
        out["label"] = out["label"].astype(np.int64)
        return pa.Table.from_pandas(out[["node", "label"]],
                                    preserve_index=False) \
                       .replace_schema_metadata(None)

    def edge_rows(t: pa.Table) -> pa.Table:
        return t.append_column("label", pa.nulls(len(t), type=pa.int64()))

    edges_tagged = edges2.map_batches(edge_rows, batch_format="pyarrow",
                                      batch_size=None)

    def lbl_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "nbr": pa.array(np.full(len(t), -1,
                                                 dtype=np.int64)),
                         "label": t["label"]})

    prev = label_sum(labels)
    for _ in range(max_iters):
        un = labels.map_batches(lbl_rows, batch_format="pyarrow",
                                batch_size=None).union(edges_tagged)
        msgs = keyed_merge(un, ["node"], propagate)
        labels = grouped_aggregate(msgs, ["node"], [
            {"target": "label", "source": "label", "aggregate": "min"}])
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def dedup_by_components(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                        id_col: str = "doc_id",
                        a: str = "doc_a", b: str = "doc_b"
                        ) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """Cluster-aware near-dedup: keep ONE representative (the min id) per
    connected duplicate cluster — transitive chains (a~b, b~c) collapse
    to a single keeper even though (a, c) was never a candidate pair.
    Returns (deduped_ds, components)."""
    from ..stages.semijoin import semi_join_ids

    comp = connected_components(pairs, a=a, b=b)

    def drops(t: pa.Table) -> pa.Table:
        keep = pa.compute.equal(t["node"], t["label"])
        return t.filter(pa.compute.invert(keep)).select(["node"])

    drop_ids = comp.map_batches(drops, batch_format="pyarrow",
                                batch_size=None)
    deduped = semi_join_ids(ds, drop_ids, id_col, id_col="node", anti=True)
    return deduped, comp
