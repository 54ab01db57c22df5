"""BM25 top-k retrieval over a document corpus.

Engine-defined operator (no reference equivalent; extends the text
family): the classic Okapi BM25 ranking — the benchmark-retrieval /
hard-negative-mining primitive of an LLM data pipeline.

Scale shape:
- the query side is small by nature (benchmarks, probes): its DISTINCT
  (query_id, term) pairs and the per-term document frequencies restricted
  to query terms are driver-collected and broadcast in the task closure
  (both bounded by the query vocabulary, not the corpus);
- document frequencies come from ONE combining grouped count over the
  corpus' distinct (doc, term) pairs, pre-filtered to query terms inside
  ``map_batches`` — the exchange moves O(query-vocab) partials;
- scoring is embarrassingly parallel: a document's words live in one
  batch, so each batch emits COMPLETE (query, doc) scores (pandas merge
  against the small query-term table, vectorized BM25 formula, one
  groupby-sum); no shuffle carries anything bigger than the final
  (query, doc) score rows;
- global top-k per query is ``grouped_top_k`` (per-block partials, one
  small exchange).

Determinism contract: each PER-TERM contribution is floored to integer
micro-units (``floor(contrib * 1e6)``) and a document's score is the
INTEGER sum of those units (``score_u``); ranking ties break on doc_id.
Integer summation is order-independent, so the result is bit-identical
at any parallelism and to the SQL oracle, whose per-term expression
mirrors this arithmetic parenthesis-for-parenthesis (the inputs tf, df,
dl, N, sum(dl) are exact integers, so the per-term float64 expression
is correctly rounded to the same double everywhere; flooring BEFORE the
sum — rather than after — removes the last-bit summation-order hazard a
post-sum floor would sit on).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_WS = "[ \\t\\n\\r\\f\\v]+"


def _doc_words(batch: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    """(doc_id, word) exploded rows + per-doc word count ``dl`` —
    vectorized split/flatten (engine-wide explicit whitespace class)."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.fill_null(text, ""), pattern=_WS)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rows = np.repeat(np.arange(len(lens)), lens)
    flat = words.flatten().to_pandas()
    nonempty = (flat != "").to_numpy()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"doc": ids[rows[nonempty]],
                       "term": flat[nonempty].to_numpy()})
    dl = pd.Series(np.bincount(rows[nonempty], minlength=len(lens)),
                   index=ids).astype(np.int64)
    return df, dl


def bm25_topk(corpus: ray.data.Dataset, queries: ray.data.Dataset,
              text_col: str = "text", id_col: str = "doc_id",
              query_id_col: str = "query_id",
              k1: float = 1.5, b: float = 0.75,
              top_k: int = 5) -> ray.data.Dataset:
    """Top-``top_k`` corpus docs per query by BM25
    (``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``). Returns
    (query_id, doc_id, score_u) with
    ``score_u = sum over terms of floor(term_contrib * 1e6)``."""
    from ..stages.agg import grouped_aggregate
    from ..stages.setops import grouped_top_k

    # -- query term table (small, driver-collected) -----------------------
    qt_rows = []
    for btab in queries.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
        w, _dl = _doc_words(btab, query_id_col, text_col)
        qt_rows.append(w.drop_duplicates())
    qterms = pd.concat(qt_rows, ignore_index=True).drop_duplicates() \
        if qt_rows else pd.DataFrame({"doc": [], "term": []})
    qterms = qterms.rename(columns={"doc": "query_id"})
    qset = set(qterms["term"])
    # id columns keep their NATIVE type (int and string ids both occur
    # in this repo); every path — including empty results — types the
    # query id from the query-term frame
    qid_type = pa.array(qterms["query_id"].tolist()).type \
        if len(qterms) else pa.int64()

    # -- corpus stats: N, avgdl, df (restricted to query terms) -----------
    def stats(batch: pa.Table) -> pa.Table:
        w, dl = _doc_words(batch, id_col, text_col)
        w = w[w["term"].isin(qset)].drop_duplicates()
        t = pa.table({"term": pa.array(w["term"].tolist(), pa.string()),
                      "one": pa.array(np.ones(len(w), dtype=np.int64))})
        # piggy-back N / sum(dl) as sentinel terms: a whitespace-split
        # word can never CONTAIN a space, so these cannot collide
        meta = pa.table({
            "term": pa.array([" N ", " DL "], pa.string()),
            "one": pa.array([len(dl), int(dl.sum())], pa.int64())})
        return pa.concat_tables([t, meta])

    agg = grouped_aggregate(
        corpus.select_columns([id_col, text_col]).map_batches(
            stats, batch_format="pyarrow", batch_size=None),
        ["term"], [{"target": "n", "source": "one", "aggregate": "sum"}])
    df_map: Dict[str, int] = {}
    N = 0
    DL = 0
    for bt in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        for term, n in zip(bt["term"].to_pylist(), bt["n"].to_pylist()):
            if term == " N ":
                N = int(n)
            elif term == " DL ":
                DL = int(n)
            elif term is not None:
                df_map[term] = int(n)
    if N == 0:
        # derive the doc-id type from the corpus schema so the empty
        # result unions cleanly with any non-empty run
        sch = corpus.schema()
        did_t = sch.base_schema.field(id_col).type if sch is not None \
            else pa.int64()
        return ray.data.from_arrow(pa.table({
            query_id_col: pa.array([], qid_type),
            id_col: pa.array([], did_t),
            "score_u": pa.array([], pa.int64())}))
    avgdl = DL / N
    idf = {t: math.log((N - d + 0.5) / (d + 0.5) + 1.0)
           for t, d in df_map.items()}
    qterms = qterms.assign(idf=qterms["term"].map(idf)).dropna(
        subset=["idf"])

    # -- scoring pass: complete (query, doc) scores per batch -------------
    def score(batch: pa.Table) -> pa.Table:
        w, dl = _doc_words(batch, id_col, text_col)
        w = w[w["term"].isin(qset)]
        if not len(w):
            ids_empty = batch[id_col]
            if isinstance(ids_empty, pa.ChunkedArray):
                ids_empty = ids_empty.combine_chunks()
            return pa.table({query_id_col: pa.array([], qid_type),
                             id_col: ids_empty.slice(0, 0),
                             "score_u": pa.array([], pa.int64())})
        tf = w.groupby(["doc", "term"], sort=False).size() \
            .rename("tf").reset_index()
        tf["dl"] = tf["doc"].map(dl)
        m = tf.merge(qterms, on="term")
        tfv = m["tf"].to_numpy(np.float64)
        dlv = m["dl"].to_numpy(np.float64)
        contrib = m["idf"].to_numpy() * (
            tfv * (k1 + 1.0) / (tfv + k1 * (1.0 - b + b * dlv / avgdl)))
        # floor per term, sum integers: order-independent (see module
        # docstring determinism contract)
        contrib_u = np.floor(contrib * 1e6).astype(np.int64)
        s = pd.DataFrame({"q": m["query_id"].to_numpy(),
                          "d": m["doc"].to_numpy(),
                          "c": contrib_u}).groupby(["q", "d"], sort=False) \
            .sum().reset_index()
        return pa.table({
            query_id_col: pa.array(s["q"].tolist(), qid_type),
            id_col: pa.array(s["d"].tolist()),
            "score_u": pa.array(s["c"].to_numpy(np.int64)),
        })

    scored = corpus.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=None)
    return grouped_top_k(scored, [query_id_col], ["score_u", id_col],
                         top_k, descending=[True, False])
