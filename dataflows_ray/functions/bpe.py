"""Byte-pair-encoding tokenizer: distributed learning + encoding.

Engine-defined operators (the reference datahq/dataflows has no tokenizer
surface; this extends the text family in ``functions/text.py``) for the
tokenizer-training step of an LLM data pipeline:

- :func:`learn_bpe` — the classic Sennrich merge loop, distributed the
  way production BPE trainers actually scale: the corpus is scanned ONCE
  for word frequencies (explode + combining grouped count, a tiny keyed
  exchange of partials), the count table is truncated to the top
  ``vocab_limit`` words by (count desc, word asc) — an EXPLICIT,
  documented bound, same policy as the unigram-LM vocab ceiling — and
  the merge iterations then run over that bounded dict with zero further
  corpus passes. At 100 TB the scan cost is one pass and the merge loop
  cost is independent of corpus size.
- :func:`bpe_encode_stage` — stateless ``map_batches`` encoding with the
  learned merge ranks broadcast in the task closure (a big merge table
  would ride ``ray.put``); each task memoizes word -> token-count over
  the batch's DISTINCT words, so the per-word merge walk runs once per
  distinct word, not once per occurrence.

Determinism contract: word split is the engine-wide explicit ASCII class
``[ \\t\\n\\r\\f\\v]+``; the word-count table truncates to the top
``vocab_limit`` words by (count desc, word asc) BEFORE any merge (an
oracle must apply the same truncation — it only bites past the limit);
merge ties (equal pair count) break to the lexicographically smallest
(left, right); merging stops when the best pair count < 2. Any
sequential implementation of the same contract is bit-identical — the
q90/q91 fixtures rely on this.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import ray.data

_EOW = "</w>"
_WS_PATTERN = "[ \\t\\n\\r\\f\\v]+"


def word_counts(ds: ray.data.Dataset, text_col: str = "text",
                vocab_limit: int = 50_000) -> List[Tuple[str, int]]:
    """Top ``vocab_limit`` (word, count) pairs by (count desc, word asc)
    from ONE streaming corpus scan. The combining aggregate moves
    per-block partials only; the truncation bound is explicit (words
    outside the top-V contribute nothing to merge learning — the
    standard practical policy for BPE trainers)."""
    import pyarrow.compute as pc

    from ..stages.agg import grouped_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(pc.fill_null(text, ""),
                                       pattern=_WS_PATTERN)
        flat = words.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"word": flat})

    counts = grouped_aggregate(
        ds.select_columns([text_col]).map_batches(
            explode, batch_format="pyarrow", batch_size=None),
        ["word"], [{"target": "n", "source": "word", "aggregate": "count"}])
    # bounded result: top-V via per-block partial top-V + driver merge
    # (the aggregated table is group-count sized; V caps what we collect)
    rows: List[Tuple[str, int]] = []
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        rows.extend(zip(b["word"].to_pylist(),
                        (int(x) for x in b["n"].to_pylist())))
        if len(rows) > 4 * vocab_limit:
            rows.sort(key=lambda r: (-r[1], r[0]))
            rows = rows[:vocab_limit]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:vocab_limit]


def merge_loop(wc: List[Tuple[str, int]],
               n_merges: int) -> List[Tuple[str, str]]:
    """Classic BPE merge iterations over a bounded word-frequency dict.
    Ties on pair count break to the smallest (left, right); stops early
    when the best pair occurs < 2 times."""
    words: List[Tuple[List[str], int]] = [
        (list(w) + [_EOW], c) for w, c in wc]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        l, r = best
        joined = l + r
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == l and syms[i + 1] == r:
                    syms[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


def learn_bpe(ds: ray.data.Dataset, text_col: str = "text",
              n_merges: int = 40,
              vocab_limit: int = 50_000) -> List[Tuple[str, str]]:
    """One corpus scan for word counts, then the bounded merge loop.
    Returns merges in rank order."""
    return merge_loop(word_counts(ds, text_col, vocab_limit), n_merges)


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> int:
    """Token count for one word: greedily merge the lowest-rank adjacent
    pair until none applies (the standard BPE encode order)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


class BpeEncoder:
    """Picklable batch transform: per-doc BPE token count with the merge
    ranks in the closure and a word -> count memo (hits once per
    DISTINCT word per task lifetime)."""

    def __init__(self, merges: List[Tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self._memo: Dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(pc.fill_null(text, ""),
                                       pattern=_WS_PATTERN)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        flat_np = np.asarray(flat.to_pylist(), dtype=object)
        uniq, inv = np.unique(flat_np, return_inverse=True)
        per_uniq = np.empty(len(uniq), dtype=np.int64)
        for i, w in enumerate(uniq):
            if w == "":
                per_uniq[i] = 0
                continue
            n = self._memo.get(w)
            if n is None:
                n = encode_word(w, self.ranks)
                self._memo[w] = n
            per_uniq[i] = n
        per_word = per_uniq[inv]
        rows = np.repeat(np.arange(len(lens)), lens.astype(np.int64))
        n_tokens = np.bincount(rows, weights=per_word,
                               minlength=len(lens)).astype(np.int64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_bpe_tokens": pa.array(n_tokens, pa.int64()),
        })


def bpe_encode_stage(ds: ray.data.Dataset, merges: List[Tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc BPE token counts as a stateless Dataset stage."""
    return ds.map_batches(BpeEncoder(merges, text_col, id_col),
                          batch_format="pyarrow", batch_size=None)
