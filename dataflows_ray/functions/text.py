"""Text analysis stages for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

No reference equivalent (datahq/dataflows has no scalar-function library —
SURVEY §2.5); these are engine-defined per the brief. All are stateless
vectorized ``map_batches`` stages over the ``documents`` table schema
(doc_id, text, lang, source, n_chars); regexes are compiled once per actor
in ``__init__`` (actor-pool shape), never per batch.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
_LANG_PROFILES: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"},
    "es": {"el", "la", "que", "los", "una", "por", "con", "para", "las", "es"},
}


class TextAnalyzer:
    """Actor-pool stage computing lang-id, quality score, token count and a
    rolling-hash fingerprint in one pass over the batch.

    The per-row methods (``lang_id`` / ``quality`` / ``token_count`` /
    ``fingerprint``) are the REFERENCE semantics; ``__call__`` computes
    the same values vectorized — Arrow RE2 kernels for split/count,
    numpy ``bincount`` reductions over an exploded word table, and a
    zero-copy uint64 polynomial dot for the fingerprint — and a pytest
    asserts per-row equality between the two. Dialect note: the
    vectorized ``n_tokens`` uses RE2 (ASCII ``\\d``/``\\s``, same engine
    as the DuckDB oracle) while the reference method uses Python ``re``
    (Unicode classes); they agree only on text whose whitespace is
    ASCII — NBSP (U+00A0, Latin-1) is ``\\s`` to Python ``re`` but not
    to RE2, so such text tokenizes differently between the two."""

    def __init__(self):
        self.word_re = re.compile(r"[A-Za-zÀ-ÿ]+")
        # BPE-ish tokenizer: words, numbers, or single non-space symbols
        self.token_re = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
        self.punct_re = re.compile(r"[.,;:!?]")
        # P^k mod 2^64 for the vectorized fingerprint dot (P = 1000003)
        pw = np.empty(4096, dtype=np.uint64)
        pw[0] = 1
        P = np.uint64(1_000_003)
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the point
            for i in range(1, 4096):
                pw[i] = pw[i - 1] * P
        self._powers = pw

    def lang_id(self, text: str) -> str:
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "unknown"
        wset = set(words)
        best, best_score = "unknown", 0
        for lang, stops in _LANG_PROFILES.items():
            score = len(wset & stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def quality(self, text: str) -> float:
        """Length / punctuation / stopword-ratio heuristic in [0, 1]."""
        if not text:
            return 0.0
        words = self.word_re.findall(text)
        n_words = len(words)
        if n_words == 0:
            return 0.0
        mean_len = float(np.mean([len(w) for w in words]))
        punct_ratio = len(self.punct_re.findall(text)) / max(1, n_words)
        stop_hits = sum(1 for w in words
                        if w.lower() in _LANG_PROFILES["en"]) / n_words
        len_score = min(1.0, n_words / 50.0)
        wordlen_score = 1.0 if 3.0 <= mean_len <= 8.0 else 0.5
        punct_score = 1.0 if punct_ratio <= 0.5 else 0.5
        stop_score = min(1.0, 4.0 * stop_hits)
        return round((len_score + wordlen_score + punct_score + stop_score) / 4.0, 4)

    def token_count(self, text: str) -> int:
        return len(self.token_re.findall(text))

    @staticmethod
    def fingerprint(text: str, window: int = 64) -> int:
        """Rolling polynomial hash over the normalized text (document
        fingerprint; stable across runs)."""
        data = text.encode("utf-8", "ignore")
        h = 0
        for b in data[:4096]:  # cap work per doc; prefix fingerprint
            h = (h * 1_000_003 + b) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n = len(text)

        # ---- exploded word table (extract on ORIGINAL text, lowercase
        # the extracted words — the reference method order)
        words = pc.split_pattern_regex(text, pattern="[^A-Za-zÀ-ÿ]+")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n), lens)
        flat = words.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        rows_w = rows[nonempty]
        low = pd.Series(pc.utf8_lower(flat).to_pandas().to_numpy()[nonempty])
        wlen = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)[nonempty]

        n_words = np.bincount(rows_w, minlength=n).astype(np.int64)
        denom = np.maximum(n_words, 1)
        # word lengths are small exact ints: any float64 summation order
        # reproduces np.mean bit-for-bit
        mean_len = np.bincount(rows_w, weights=wlen, minlength=n) / denom

        # ---- lang-id: DISTINCT stopword hits per language, first-max
        # wins in _LANG_PROFILES order (reference uses strict >)
        all_stops = set().union(*_LANG_PROFILES.values())
        in_any = low.isin(all_stops).to_numpy()
        sub = pd.DataFrame({"r": rows_w[in_any],
                            "w": low.to_numpy()[in_any]}).drop_duplicates()
        scores = np.zeros((n, len(_LANG_PROFILES)), np.int64)
        for j, (_, stops) in enumerate(_LANG_PROFILES.items()):
            m = sub["w"].isin(stops).to_numpy()
            scores[:, j] = np.bincount(sub["r"].to_numpy()[m], minlength=n)
        best_j = np.argmax(scores, axis=1)
        best_score = scores[np.arange(n), best_j]
        lang_names = np.array(list(_LANG_PROFILES.keys()))
        lang_pred = np.where(best_score > 0, lang_names[best_j], "unknown")

        # ---- quality score (same float64 arithmetic as the reference)
        en_hits = np.bincount(
            rows_w[low.isin(_LANG_PROFILES["en"]).to_numpy()], minlength=n)
        punct = pc.count_substring_regex(
            text, pattern="[.,;:!?]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        len_score = np.minimum(1.0, n_words / 50.0)
        wordlen_score = np.where((mean_len >= 3.0) & (mean_len <= 8.0),
                                 1.0, 0.5)
        punct_score = np.where(punct / denom <= 0.5, 1.0, 0.5)
        stop_score = np.minimum(1.0, 4.0 * (en_hits / denom))
        q = np.where(
            n_words == 0, 0.0,
            (len_score + wordlen_score + punct_score + stop_score) / 4.0)
        # Python round() for exact parity with the reference (np.round's
        # scale-and-round can differ on representation ties)
        quality = pa.array([round(float(v), 4) for v in q], pa.float64())

        # ---- token count: one RE2 kernel
        n_tokens = pc.cast(pc.count_substring_regex(
            text, pattern=r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), pa.int64())

        # ---- fingerprint: per-row uint64 polynomial dot over the
        # string column's utf-8 data buffer (zero copy, no encode())
        odt = np.int64 if pa.types.is_large_string(text.type) else np.int32
        offs = np.frombuffer(text.buffers()[1], odt)[
            text.offset:text.offset + n + 1]
        data = np.frombuffer(text.buffers()[2], np.uint8)
        fps = np.empty(n, np.uint64)
        pw = self._powers
        for i in range(n):
            s = offs[i]
            e = min(offs[i + 1], s + 4096)
            L = e - s
            if L:
                seg = data[s:e].astype(np.uint64)
                fps[i] = np.sum(seg * pw[L - 1::-1], dtype=np.uint64)
            else:
                fps[i] = 0

        batch = batch.append_column("lang_pred",
                                    pa.array(lang_pred.tolist(), pa.string()))
        batch = batch.append_column("quality", quality)
        batch = batch.append_column("n_tokens", n_tokens)
        batch = batch.append_column("fingerprint", pa.array(fps, pa.uint64()))
        return batch


import functools


@functools.lru_cache(maxsize=4)
def _cached_analyzer() -> "TextAnalyzer":
    return TextAnalyzer()  # regexes compiled once per worker process


def analyze_text(ds: ray.data.Dataset, concurrency: int = None,
                 batch_size=None) -> ray.data.Dataset:
    if concurrency is not None:  # pinned actor pool on request
        return ds.map_batches(TextAnalyzer, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)

    def analyze(batch: pa.Table) -> pa.Table:
        return _cached_analyzer()(batch)

    return ds.map_batches(analyze, batch_format="pyarrow",
                          batch_size=batch_size)


def token_count_vectorized(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Whitespace token count — fully vectorized Arrow kernel (the cheap
    path when only whitespace tokens are needed)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(batch["text"], pattern=r"\S+")
        return batch.append_column("ws_tokens", pc.cast(toks, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def term_doc_frequency(ds: ray.data.Dataset, text_col: str = "text",
                       top: int = None) -> ray.data.Dataset:
    """Document frequency per term (the DF half of TF-IDF): tokenize =
    lowercase + split on non-word runs (Arrow C++ regex — the same
    tokenizer as the dedup/minhash family), count each term once per
    document, sum across the corpus.

    Scale shape: the explode never leaves the batch — each block emits
    one (term, partial_df) row per DISTINCT (doc, term) pair already
    pre-aggregated to per-block term counts (the combiner), so the
    exchange ships O(vocab-per-block), not O(tokens). ``top`` adds the
    shuffle-free ``top_k`` head (df desc, term asc)."""
    import pyarrow.compute as pc
    from ..stages.agg import grouped_aggregate

    def block_df(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(texts, "")), pattern=r"\W+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        offs = np.asarray(words.offsets, dtype=np.int64)
        offs = offs - offs[0]
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                            np.diff(offs))
        df = pd.DataFrame({"doc": doc_idx,
                           "term": flat.to_numpy(zero_copy_only=False)})
        df = df[df["term"] != ""].drop_duplicates(["doc", "term"])
        out = df.groupby("term", sort=False).size() \
            .rename("df").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    partials = ds.select_columns([text_col]).map_batches(
        block_df, batch_format="pyarrow", batch_size=None)
    totals = grouped_aggregate(partials, ["term"], [
        {"target": "df", "source": "df", "aggregate": "sum"}])
    if top is None:
        return totals
    from ..stages.setops import top_k
    return top_k(totals, ["df", "term"], top, descending=[True, False])


def tfidf_top_terms(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    round_to: int = 6) -> ray.data.Dataset:
    """Top-k terms per document by tf-idf (tf x ln(n_docs / df)).

    Scale shape — three keyed passes, nothing driver-sized beyond a
    scalar:
    1. explode to (doc, term, tf) rows per block (vectorized tokenize +
       groupby — output granularity is the result's own);
    2. document frequency per term = one combining aggregate over those
       rows (each (doc, term) appears once);
    3. score via a keyed exchange ON TERM (tf rows + df rows co-locate;
       no driver-side vocab broadcast — web-scale vocab never fits one),
       then grouped_top_k per document.
    Scores are rounded BEFORE ranking so cross-engine libm 1-ulp
    differences cannot flip the rank order."""
    import math
    import pyarrow.compute as pc
    from ..stages.agg import grouped_aggregate, keyed_merge
    from ..stages.setops import grouped_top_k

    n_docs = ds.count()

    def explode_tf(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(texts, "")), pattern=r"\W+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        offs = np.asarray(words.offsets, dtype=np.int64)
        offs = offs - offs[0]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({id_col: np.repeat(ids, np.diff(offs)),
                           "term": flat.to_numpy(zero_copy_only=False)})
        df = df[df["term"] != ""]
        out = df.groupby([id_col, "term"], sort=False) \
            .size().rename("tf").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    toks = ds.select_columns([id_col, text_col]).map_batches(
        explode_tf, batch_format="pyarrow", batch_size=None)
    dfreq = grouped_aggregate(toks, ["term"], [
        {"target": "df", "aggregate": "count"}])

    def tag_tf(t: pa.Table) -> pa.Table:
        return t.append_column("df", pa.nulls(len(t), type=pa.int64()))

    def tag_df(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pa.nulls(len(t), type=pa.int64()),
            "term": t["term"],
            "tf": pa.nulls(len(t), type=pa.int64()),
            "df": pc.cast(t["df"], pa.int64()),
        })

    union = toks.map_batches(tag_tf, batch_format="pyarrow",
                             batch_size=None).union(
        dfreq.map_batches(tag_df, batch_format="pyarrow", batch_size=None))

    def score(df_: pd.DataFrame, n_docs=n_docs) -> pa.Table:
        is_df = df_["df"].notna()
        dmap = df_[is_df].set_index("term")["df"]
        rows = df_[~is_df]
        dfs = dmap.reindex(rows["term"]).to_numpy(dtype=np.float64)
        tf = rows["tf"].to_numpy(dtype=np.float64)
        tfidf = np.round(tf * np.log(float(n_docs) / dfs), round_to)
        out = pd.DataFrame({id_col: rows[id_col].to_numpy(dtype=np.int64),
                            "term": rows["term"].to_numpy(),
                            "tf": rows["tf"].to_numpy(dtype=np.int64),
                            "tfidf": tfidf})
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    scored = keyed_merge(union, ["term"], score)
    return grouped_top_k(scored, [id_col], ["tfidf", "term"], k,
                         descending=[True, False])


def compression_ratio(ds: ray.data.Dataset, text_col: str = "text",
                      target: str = "zlib_ratio",
                      level: int = 6) -> ray.data.Dataset:
    """Append ``len(zlib.compress(text)) / len(text)`` — the standard
    cheap redundancy/quality signal for LLM corpus filtering (boilerplate
    and generated spam compress far better than natural prose; empty
    text gets ratio 1.0). The per-row work is C-side zlib; the loop just
    feeds it bytes."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ratios = np.ones(len(texts), dtype=np.float64)
        for i, t in enumerate(texts.to_pylist()):
            if t:
                raw = t.encode("utf-8", "replace")
                ratios[i] = len(zlib.compress(raw, level)) / len(raw)
        return batch.append_column(target, pa.array(ratios))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def redact_patterns(ds: ray.data.Dataset, patterns,
                    text_col: str = "text",
                    target: str = "redacted",
                    count_col: str = "n_redactions") -> ray.data.Dataset:
    """PII / pattern redaction: apply ``[(regex, replacement), ...]`` in
    order and append the redacted text plus the total number of matches
    replaced. Fully vectorized — one Arrow C++ RE2 pass per pattern
    (``count_substring_regex`` + ``replace_substring_regex``), no Python
    per row. Counting happens on the text AS SEEN by that pattern (i.e.
    after the previous replacements), which is also what a sequential
    ``re.subn`` chain would report.

    RE2 syntax on both the engine and DuckDB oracle side keeps the
    semantics identical (both bind RE2)."""
    import pyarrow.compute as pc

    pats = list(patterns)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = np.zeros(len(batch), dtype=np.int64)
        for pat, repl in pats:
            cnt = pc.count_substring_regex(col, pattern=pat)
            n += np.asarray(pc.fill_null(cnt, 0), dtype=np.int64)
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        batch = batch.append_column(target, col)
        return batch.append_column(count_col, pa.array(n, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def chunk_tokens(ds: ray.data.Dataset, text_col: str = "text",
                 chunk_size: int = 32, stride: int = 24,
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """Overlapping token-window chunking (the standard LLM-training
    document -> context-window splitter): tokens are a plain
    single-space split (DuckDB ``string_split`` semantics — '' yields
    one empty token), chunks start every ``stride`` tokens and carry
    ``chunk_size`` tokens each (short tail chunks included). Output is
    exploded: one row per (doc, chunk_start).

    ``chunk_start`` is 1-based so the value matches SQL ``list_slice``
    arithmetic directly. Tokenization is one Arrow kernel per batch;
    the per-doc loop only slices the already-split list column."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], pattern=" ")
        ids = batch[id_col].to_pylist()
        out_id, out_start, out_chunk = [], [], []
        for i, row_toks in enumerate(toks.to_pylist()):
            row_toks = row_toks if row_toks is not None else [""]
            n = max(1, len(row_toks))
            for s in range(0, n, stride):
                out_id.append(ids[i])
                out_start.append(s + 1)
                out_chunk.append(" ".join(row_toks[s:s + chunk_size]))
        return pa.table({
            id_col: pa.array(out_id),
            "chunk_start": pa.array(out_start, type=pa.int64()),
            "chunk": pa.array(out_chunk, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def normalize_text(ds: "ray.data.Dataset", text_col: str = "text",
                   out_col: str = "norm_text") -> "ray.data.Dataset":
    """Canonical text cleanup for training corpora — the first transform
    in every LLM data pipeline: Unicode NFC normalization, control-char
    removal (C0 minus \\t \\n \\r \\f \\v, plus DEL), whitespace-run
    collapse to single spaces, and edge trim. Arrow kernels for the
    regex/trim passes (RE2 replace_substring_regex) — zero-copy in,
    embarrassingly parallel (no shuffle). NFC itself goes through
    ``unicodedata.normalize`` (a C function): this build's
    ``pc.utf8_normalize`` decomposes regardless of the requested form,
    so Arrow only supplies the vectorized ``string_is_ascii`` gate that
    skips the Python pass for all-ASCII batches — the common case in a
    web corpus. The character classes are spelled in ASCII-safe RE2 so
    any engine reproduces the output byte-for-byte (the oracle does,
    via DuckDB nfc_normalize + regexp_replace)."""
    from functools import partial
    return ds.map_batches(partial(normalize_text_batch, text_col=text_col,
                                  out_col=out_col),
                          batch_format="pyarrow", batch_size=None)


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm_text") -> pa.Table:
    """The :func:`normalize_text` per-batch kernel, exposed so the
    streaming map engine can run the SAME transform inside its split
    tasks (batch and streaming must agree byte-for-byte)."""
    import unicodedata

    import pyarrow.compute as pc

    s = batch[text_col]
    all_ascii = pc.all(pc.fill_null(pc.string_is_ascii(s), True),
                       min_count=0).as_py()
    if not all_ascii:
        s = pa.array(
            [unicodedata.normalize("NFC", v) if v is not None else None
             for v in s.to_pylist()], pa.string())
    s = pc.replace_substring_regex(
        s, pattern="[\\x00-\\x08\\x0e-\\x1f\\x7f]", replacement="")
    s = pc.replace_substring_regex(
        s, pattern="[ \\t\\n\\r\\f\\v]+", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    batch = batch.append_column(out_col, s)
    return batch.append_column(
        "norm_len", pc.cast(pc.utf8_length(s), pa.int64()))


def repetition_signals(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id") -> "ray.data.Dataset":
    """Gopher-style intra-document repetition quality signals: per doc,
    total word count, distinct word count, duplicate-word fraction
    ((n_words - n_distinct) / n_words) and the most-frequent-word
    fraction (max count / n_words). Boilerplate / keyword-stuffed /
    degenerate documents score high and get filtered before training.

    Purely per-document — stateless ``map_batches``, no shuffle; the
    per-batch kernel is one pandas split/explode/groupby chain (C-level
    kernels, not a per-row Python loop over words). Words = maximal
    non-empty runs between ASCII whitespace — the EXPLICIT class
    ``[ \\t\\n\\r\\f\\v]+`` (NOT pandas' default Unicode ``\\s``, which
    also splits on NBSP/U+0085/U+001C-1F), mirrored exactly by the
    oracle's ``string_split_regex`` + ``list_filter`` and by the q79
    normalizer and q81 shingler. Fractions are NULL for empty
    documents."""
    def fn(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, text_col]).to_pandas()
        ex = df[[id_col]].assign(
            w=df[text_col].fillna("").str.split(
                r"[ \t\n\r\f\v]+", regex=True))
        ex = ex.explode("w")
        ex = ex[ex["w"].notna() & (ex["w"] != "")]
        if len(ex):
            wc = ex.groupby([id_col, "w"], sort=False).size()
            per = wc.groupby(level=0, sort=False)
            stats = pd.DataFrame({"n_words": per.sum(),
                                  "n_distinct": per.size(),
                                  "top_c": per.max()})
        else:
            stats = pd.DataFrame(columns=["n_words", "n_distinct", "top_c"])
        stats = stats.reindex(df[id_col]).fillna(0).astype("int64")
        n = stats["n_words"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            dup = np.where(n > 0, (n - stats["n_distinct"].to_numpy()) / n,
                           np.nan)
            top = np.where(n > 0, stats["top_c"].to_numpy() / n, np.nan)
        return pa.table({
            id_col: batch[id_col],
            "n_words": pa.array(stats["n_words"].to_numpy()),
            "n_distinct": pa.array(stats["n_distinct"].to_numpy()),
            "dup_word_frac": pa.array(dup, pa.float64()),
            "top_word_frac": pa.array(top, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _doc_shingles(batch: pa.Table, id_col: str, text_col: str,
                  n: int) -> pa.Table:
    """(id, shingle) rows: per-document DISTINCT word n-grams joined by
    single spaces. Distinctness inside the doc bounds output volume
    (and the downstream semi-join / DISTINCT make global dups moot).

    Vectorized: one RE2 whitespace split, exploded words with np.repeat
    row ids, shingles built by n-1 shifted pandas string concats (valid
    where all n words share the row), distinct via one drop_duplicates —
    no Python statement per word."""
    import pandas as pd
    import pyarrow.compute as pc

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # Explicit ASCII class: RE2's \s is [\t\n\f\r ] (no \v), so spelling
    # the class keeps the engine byte-identical to the q81 SQL oracle's
    # string_split_regex('[ \t\n\r\f\v]+') and to q79/q80 tokenization.
    words = pc.split_pattern_regex(pc.fill_null(text, ""),
                                   pattern="[ \\t\\n\\r\\f\\v]+")
    lens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(lens)), lens)
    flat = words.flatten().to_pandas()
    nonempty = (flat != "").to_numpy()
    rows = rows[nonempty]
    flat = flat[nonempty].reset_index(drop=True)

    if len(flat) >= n:
        sh = flat.copy()
        ok = np.ones(len(flat), dtype=bool)
        for j in range(1, n):
            sh = sh + " " + flat.shift(-j)
            ok &= np.roll(rows, -j) == rows
        ok[len(flat) - n + 1:] = False
        sub = pd.DataFrame({"r": rows[ok], "s": sh.to_numpy()[ok]}) \
            .drop_duplicates()
    else:
        sub = pd.DataFrame({"r": np.array([], np.int64), "s": []})

    ids = batch[id_col].take(pa.array(sub["r"].to_numpy(np.int64)))
    return pa.table({id_col: ids,
                     "shingle": pa.array(sub["s"].tolist(), pa.string())})


def ngram_contamination(corpus: "ray.data.Dataset",
                        eval_ds: "ray.data.Dataset",
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5) -> "ray.data.Dataset":
    """Train/eval contamination check: ids of corpus documents sharing
    at least one word ``n``-gram with any eval-set document — the
    decontamination primitive every benchmark-respecting training
    pipeline runs before a data release.

    Shape at 100 TB: both sides shingle inside ``map_batches`` (no
    shuffle); the eval side (benchmarks are small by nature) is
    DISTINCT-ed by a combining grouped_aggregate and then drives
    ``semi_join_ids``, which broadcasts the shingle set once via
    ``ray.put`` when it fits and auto-switches to the distributed hash
    semi-join above the limit; contaminated ids come out of a second
    combining distinct. Nothing materializes on the driver."""
    from ..stages.agg import grouped_aggregate
    from ..stages.semijoin import semi_join_ids

    def shingle(batch: pa.Table) -> pa.Table:
        return _doc_shingles(batch, id_col, text_col, n)

    corpus_sh = corpus.map_batches(shingle, batch_format="pyarrow",
                                   batch_size=None)
    eval_sh = grouped_aggregate(
        eval_ds.map_batches(shingle, batch_format="pyarrow",
                            batch_size=None).select_columns(["shingle"]),
        ["shingle"], [])
    hits = semi_join_ids(corpus_sh, eval_sh, col="shingle")
    return grouped_aggregate(hits.select_columns([id_col]), [id_col], [])
