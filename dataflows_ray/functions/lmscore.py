"""Unigram language-model surprisal scoring — the classic cheap
"LM perplexity" quality filter for LLM corpus curation.

Engine-defined (no reference equivalent). Two streaming passes:

1. global term counts: tokenize (lowercase, non-word-run split — the
   same RE2 dialect as the DuckDB oracle) and count each token across
   the corpus with the engine's combining aggregate (partial counts per
   block, one small shuffle of partials);
2. per-doc score: broadcast the token -> count table once (``ray.put``;
   vocabulary, not corpus, sized) and compute each document's total
   surprisal sum(ln(count(tok)/N)) in one stateless ``map_batches``.

Determinism contract: per-token surprisal is quantized to INTEGER
micro-nats (round(ln(p) * 1e6)) and summed as int64, so the distributed
sum is bit-identical regardless of partitioning or summation order —
float accumulation order can never leak into the gate hash.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_TOKEN_SPLIT = r"\W+"


def _tokens(col) -> pa.ListArray:
    low = pc.utf8_lower(col)
    toks = pc.split_pattern_regex(low, pattern=_TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def term_counts(ds: ray.data.Dataset, text_col: str = "text"
                ) -> ray.data.Dataset:
    """(token, n) global counts — empty tokens (split artifacts) dropped."""
    from ..stages.agg import grouped_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch[text_col])
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    exploded = ds.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(
        exploded, ["token"],
        [{"target": "n", "source": "token", "aggregate": "count"}],
        input_columns=["token"])


def unigram_logprob(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    vocab_limit: int = 50_000_000) -> ray.data.Dataset:
    """(id, logprob_micronats, n_toks) per document with >= 1 token:
    logprob_micronats = sum over tokens of round(ln(count/N) * 1e6) as
    int64 — integer-exact under any distribution.

    The vocabulary (token -> count) is broadcast once via ``ray.put`` —
    vocabulary-sized, not corpus-sized, which holds to ~10^8 distinct
    tokens (a few GB). ``vocab_limit`` makes the ceiling an honest
    error instead of a silent driver/worker OOM; past it, the scale
    path is a top-V vocabulary + OOV smoothing (changes scores, so it
    is not silently substituted here)."""
    counts = term_counts(ds, text_col).to_pandas()
    if len(counts) > vocab_limit:
        raise ValueError(
            f"unigram vocabulary has {len(counts)} distinct tokens "
            f"(> vocab_limit={vocab_limit}); use a top-V vocabulary with "
            "OOV smoothing for corpora at this scale")
    n_total = int(counts["n"].sum())
    # per-token micro-nat surprisal, precomputed once on the vocabulary
    micro = np.round(np.log(counts["n"].to_numpy(dtype=np.float64)
                            / n_total) * 1e6).astype(np.int64)
    table_ref = ray.put((dict(zip(counts["token"], micro)),))

    def score(batch: pa.Table) -> pa.Table:
        # Vectorized: flatten the token lists once, carry the row index
        # via np.repeat, look every token up with ONE C-level Series.map
        # over the broadcast vocab, reduce with one groupby sum/size.
        # No Python statement executes per token.
        import pandas as pd
        (vocab,) = ray.get(table_ref) if isinstance(
            table_ref, ray.ObjectRef) else table_ref
        toks = _tokens(batch[text_col])
        lens = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(len(lens)), lens)
        flat = pd.Series(toks.flatten().to_pandas())
        nonempty = (flat != "").to_numpy()
        # .astype raises on NaN, preserving the loop version's KeyError
        # contract: every token was counted in pass 1, OOV is a bug.
        micro_tok = flat[nonempty].map(vocab).to_numpy(dtype=np.int64)
        g = pd.DataFrame({"r": rows[nonempty], "m": micro_tok}) \
            .groupby("r", sort=True)["m"]
        lp = g.sum()
        keep = lp.index.to_numpy()  # rows with >= 1 token (oracle joins)
        return pa.table({
            id_col: batch[id_col].take(pa.array(keep)),
            "logprob_micronats": pa.array(lp.to_numpy(np.int64),
                                          type=pa.int64()),
            "n_toks": pa.array(g.size().to_numpy(np.int64),
                               type=pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=None)
