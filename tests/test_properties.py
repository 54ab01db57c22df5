"""Property-based tests (hypothesis): the distributed keyed operators must
agree with a sequential pandas ground truth on arbitrary inputs —
arbitrary key cardinality (1 group .. all-unique), nulls, negative
values, empty-ish frames, string and integer keys."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import ray.data

from dataflows_ray.stages.agg import grouped_aggregate
from dataflows_ray.stages.dedup import dedup_dataset


def _rows(draw, n):
    keys = draw(st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=n, max_size=n))
    vals = draw(st.lists(
        st.one_of(st.integers(min_value=-1000, max_value=1000), st.none()),
        min_size=n, max_size=n))
    return keys, vals


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_grouped_aggregate_matches_pandas(data):
    n = data.draw(st.integers(min_value=1, max_value=200))
    keys, vals = _rows(data.draw, n)
    df = pd.DataFrame({"k": keys, "v": vals})
    df["v"] = df["v"].astype("float64")  # None -> NaN like arrow nulls

    ds = ray.data.from_pandas(df)
    out = grouped_aggregate(ds, ["k"], [
        {"target": "s", "source": "v", "aggregate": "sum"},
        {"target": "m", "source": "v", "aggregate": "min"},
        {"target": "x", "source": "v", "aggregate": "max"},
        {"target": "a", "source": "v", "aggregate": "avg"},
        {"target": "c", "aggregate": "count"},
    ]).to_pandas().sort_values("k").reset_index(drop=True)

    g = df.groupby("k", sort=True)
    exp = pd.DataFrame({
        "s": g["v"].sum(min_count=1),
        "m": g["v"].min(),
        "x": g["v"].max(),
        "a": g["v"].mean(),
        "c": g.size(),
    }).reset_index().rename(columns={"k": "k"})

    assert list(out["k"]) == list(exp["k"])
    for col in ["s", "m", "x", "a"]:
        got = out[col].to_numpy(dtype=np.float64)
        want = exp[col].to_numpy(dtype=np.float64)
        both_nan = np.isnan(got) & np.isnan(want)
        assert np.all(both_nan | np.isclose(got, want, equal_nan=True)), col
    assert list(out["c"]) == list(exp["c"])


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_holistic_aggregators_match_pandas(data):
    n = data.draw(st.integers(min_value=1, max_value=120))
    keys = data.draw(st.lists(st.integers(min_value=0, max_value=5),
                              min_size=n, max_size=n))
    vals = data.draw(st.lists(st.integers(min_value=-50, max_value=50),
                              min_size=n, max_size=n))
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = ray.data.from_pandas(df)
    out = grouped_aggregate(ds, ["k"], [
        {"target": "med", "source": "v", "aggregate": "median"},
        {"target": "st", "source": "v", "aggregate": "set"},
    ]).to_pandas().sort_values("k").reset_index(drop=True)

    g = df.groupby("k", sort=True)
    for _, row in out.iterrows():
        grp = df[df["k"] == row["k"]]["v"]
        vs = sorted(grp.tolist())
        mid = len(vs) // 2
        med = (vs[mid - 1] + vs[mid]) / 2 if len(vs) % 2 == 0 else vs[mid]
        assert row["med"] == med
        assert list(row["st"]) == sorted(set(vs))


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_dedup_keeps_first_by_order(data):
    n = data.draw(st.integers(min_value=1, max_value=150))
    keys = data.draw(st.lists(st.integers(min_value=0, max_value=10),
                              min_size=n, max_size=n))
    df = pd.DataFrame({"k": keys, "rid": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df)
    out = dedup_dataset(ds, ["k"], "rid").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = df.drop_duplicates("k", keep="first").sort_values("k") \
        .reset_index(drop=True)
    assert list(out["k"]) == list(exp["k"])
    assert list(out["rid"]) == list(exp["rid"])


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_grouped_top_k_property(data):
    from dataflows_ray.stages.setops import grouped_top_k
    n = data.draw(st.integers(min_value=1, max_value=150))
    keys, vals = _rows(data.draw, n)
    k = data.draw(st.integers(min_value=1, max_value=5))
    df = pd.DataFrame({"k": keys,
                       "v": [0 if v is None else v for v in vals],
                       "id": range(n)})
    ds = ray.data.from_pandas(df).repartition(
        data.draw(st.integers(min_value=1, max_value=6)))
    out = grouped_top_k(ds, ["k"], ["v", "id"], k,
                        descending=[True, False], rank_col="r") \
        .to_pandas().sort_values(["k", "r"]).reset_index(drop=True)

    exp = df.sort_values(["k", "v", "id"],
                         ascending=[True, False, True], kind="mergesort")
    exp["r"] = exp.groupby("k").cumcount() + 1
    exp = exp[exp["r"] <= k].reset_index(drop=True)
    assert out[["k", "v", "id", "r"]].astype("int64", errors="ignore") \
        .equals(exp[["k", "v", "id", "r"]].astype("int64", errors="ignore")) \
        or (list(out["k"]) == list(exp["k"])
            and list(out["v"]) == list(exp["v"])
            and list(out["id"]) == list(exp["id"])
            and list(out["r"]) == list(exp["r"]))


@settings(max_examples=8, deadline=None)
@given(st.data())
def test_exact_quantiles_property(data):
    from dataflows_ray.functions.quantiles import exact_quantiles
    n = data.draw(st.integers(min_value=1, max_value=300))
    vals = data.draw(st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=n, max_size=n))
    qs = sorted(data.draw(st.lists(
        st.floats(min_value=0.0, max_value=1.0), min_size=1, max_size=3)))
    ds = ray.data.from_items([{"v": float(x)} for x in vals]).repartition(
        data.draw(st.integers(min_value=1, max_value=5)))
    got = exact_quantiles(ds, "v", qs, bins=32,
                          collect_limit=16)["value"].to_pylist()
    s = np.sort(np.asarray(vals, dtype=np.float64))
    exp = [float(s[min(n - 1, max(0, math.ceil(q * n) - 1))]) for q in qs]
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_levenshtein_property(data):
    """Kernel vs textbook DP on arbitrary unicode-ish strings, plus the
    metric axioms (identity, symmetry, length lower bound)."""
    from dataflows_ray.functions.editdist import levenshtein_pair
    alphabet = st.sampled_from(list("abcABC 日本х"))
    a = "".join(data.draw(st.lists(alphabet, max_size=20)))
    b = "".join(data.draw(st.lists(alphabet, max_size=20)))

    def naive(x, y):
        d = list(range(len(y) + 1))
        for i in range(1, len(x) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(y) + 1):
                cur = min(d[j] + 1, d[j - 1] + 1,
                          prev + (x[i - 1] != y[j - 1]))
                prev, d[j] = d[j], cur
        return d[len(y)]

    dist = levenshtein_pair(a, b)
    assert dist == naive(a, b)
    assert dist == levenshtein_pair(b, a)
    assert levenshtein_pair(a, a) == 0
    assert dist >= abs(len(a) - len(b))


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_resample_linear_properties(data):
    """n_out formula, output bounds within input min/max (linear interp
    never overshoots), and identity at equal rates."""
    from dataflows_ray.functions.audio_ops import resample_linear
    n = data.draw(st.integers(min_value=2, max_value=500))
    sr_in = data.draw(st.sampled_from([8000, 11025, 16000, 22050]))
    sr_out = data.draw(st.sampled_from([8000, 11025, 16000, 22050]))
    x = np.asarray(data.draw(st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=n, max_size=n)), dtype=np.int16)
    y = resample_linear(x, sr_in, sr_out)
    if sr_in == sr_out:
        assert y.tolist() == x.tolist()
    else:
        assert len(y) == (n - 1) * sr_out // sr_in + 1
    assert y.min() >= x.min() and y.max() <= x.max() + 1  # +1: round-up


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_bloom_no_false_negatives_property(data):
    """Membership after build must hold for EVERY inserted key, for any
    key set and any (even adversarially small) filter size."""
    from dataflows_ray.stages.bloomjoin import (
        _hash_column, _bit_positions)
    import pyarrow as pa
    keys = data.draw(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                              min_size=1, max_size=200, unique=True))
    num_bits = data.draw(st.sampled_from([64, 1024, 1 << 16]))
    k = data.draw(st.integers(min_value=1, max_value=6))
    col = pa.array(keys, type=pa.int64())
    pos = _bit_positions(_hash_column(col), k, num_bits)
    filt = np.zeros(num_bits >> 3, dtype=np.uint8)
    idx = np.unique(pos.ravel()).astype(np.uint64)
    np.bitwise_or.at(filt, (idx >> np.uint64(3)).astype(np.int64),
                     (1 << (idx & np.uint64(7))).astype(np.uint8))
    # probe the same keys: every bit must be set
    pos2 = _bit_positions(_hash_column(col), k, num_bits)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        byte = filt[(pos2[i] >> np.uint64(3)).astype(np.int64)]
        hit &= (((byte >> (pos2[i] & np.uint64(7)).astype(np.uint8))
                 & np.uint8(1)) == 1)
    assert hit.all()


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_bpe_encode_reconstruction_invariant(data):
    """BPE merging only concatenates adjacent symbols: for any corpus
    and any word, the encoded symbol sequence always re-joins to the
    original word + the end marker, and the token count never exceeds
    len(word) + 1."""
    from dataflows_ray.functions.bpe import merge_loop, _EOW

    words = data.draw(st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        min_size=1, max_size=12))
    counts = data.draw(st.lists(st.integers(min_value=1, max_value=9),
                                min_size=len(words), max_size=len(words)))
    wc = list(zip(words, counts))
    merges = merge_loop(wc, n_merges=data.draw(
        st.integers(min_value=0, max_value=20)))
    ranks = {m: i for i, m in enumerate(merges)}

    # re-implement encode returning the SYMBOLS (engine returns count)
    def enc_syms(word):
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            cand = [(ranks[(a, b)], i) for i, (a, b)
                    in enumerate(zip(syms, syms[1:])) if (a, b) in ranks]
            if not cand:
                break
            _, i = min(cand)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        return syms

    from dataflows_ray.functions.bpe import encode_word
    for w, _c in wc:
        syms = enc_syms(w)
        assert "".join(syms) == w + _EOW
        assert encode_word(w, ranks) == len(syms)
        assert len(syms) <= len(w) + 1


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_loudness_and_mixdown_bounds(data):
    """Loudness: output RMS lands within quantization distance of the
    target for non-silent input and never exceeds int16 range. Mixdown:
    |mono[i]| <= max(|L[i]|, |R[i]|) + 1 (floor division slack)."""
    from dataflows_ray.functions.audio_ops import (loudness_normalize,
                                                   mixdown, synth_stereo)

    n = data.draw(st.integers(min_value=1, max_value=400))
    x = np.array(data.draw(st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=n, max_size=n)), dtype=np.int16)
    target = data.draw(st.floats(min_value=100.0, max_value=20000.0))
    y, rms_in, gain, rms_out = loudness_normalize(x, target)
    assert y.dtype == np.int16 and len(y) == n
    if rms_in > 0:
        # clipping can only LOWER the output RMS below the target;
        # absent clipping the quantization error is at most 0.5/sample
        # int64 before abs: np.abs wraps at int16 -32768, which would
        # hide exactly the clipped samples this guard is looking for
        if int(np.abs(y.astype(np.int64)).max()) < 32767:
            assert abs(rms_out - target) <= 1.0
        else:
            assert rms_out <= target + 1.0

    inter = np.frombuffer(synth_stereo(x), dtype="<i2")
    mono, L, R = mixdown(inter)
    assert (L == x).all() and len(mono) == n
    lim = np.maximum(np.abs(L.astype(np.int64)), np.abs(R.astype(np.int64)))
    assert (np.abs(mono.astype(np.int64)) <= lim + 1).all()
