"""Round-5 regression tests for the round-4 ADVICE findings:

- pca_fit int64 moment overflow on large blocks (pca.py)
- BM25 per-term integer flooring (summation-order independence)
- streaming upsert tombstone Kleene semantics on NULL (upsert_engine.py)
- ROLLUP/CUBE/GROUPING SETS grand-total row on empty input (agg.py)
- md5 sampling anchor loud rejection of non-int/string id columns
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_pca_fit_exact_on_million_row_block():
    """A single ~1.1M-row block of |x|~3 embeddings overflows a naive
    int64 q.T@q (1.1e6 * (3e6)^2 > 2^63); the chunked partials must stay
    exact."""
    import ray.data
    from dataflows_ray.functions.pca import pca_fit

    n = 1_100_000
    flat = np.empty(2 * n, dtype=np.float32)
    flat[0::2] = 3.0
    signs = np.where(np.arange(n) % 2 == 0, 3.0, -3.0)
    flat[1::2] = signs
    arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), 2)
    tbl = pa.table({"vec_id": pa.array(np.arange(n)), "embedding": arr})
    ds = ray.data.from_arrow(tbl)
    mean, comps, vals = pca_fit(ds, col="embedding", k=2)
    # exact: mean = (3, 0); top eigenvalue = var(col1) = 9 n/(n-1)
    assert np.isclose(mean[0], 3.0, atol=1e-12)
    assert np.isclose(mean[1], 0.0, atol=1e-12)
    assert vals[0] > 0  # garbage covariance would wrap negative
    assert np.isclose(vals[0], 9.0 * n / (n - 1), rtol=1e-9)
    assert np.isclose(vals[1], 0.0, atol=1e-9)


def test_bm25_score_u_partition_invariant():
    """score_u is an integer sum of per-term floors — identical at any
    parallelism (no float summation-order hazard)."""
    import ray.data
    from dataflows_ray.functions.retrieval import bm25_topk

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
                 for _ in range(60)],
    })
    queries = pd.DataFrame({"query_id": [900, 901],
                            "text": ["w1 w2 w3", "w10 w11"]})
    outs = []
    for parts in (1, 6):
        corpus = ray.data.from_pandas(docs).repartition(parts)
        q = ray.data.from_pandas(queries)
        out = bm25_topk(corpus, q, top_k=5).to_pandas() \
            .sort_values(["query_id", "doc_id"]).reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0]["score_u"].dtype == np.int64
    assert len(outs[0]) > 0


def test_streaming_upsert_null_tombstone_dropped(tmp_path):
    """A key whose LATEST row has a NULL tombstone column is dropped
    (Kleene `<> 'error'`), matching the batch path and SQL oracle."""
    import pyarrow.parquet as pq
    from dataflows_ray.streaming.sink import ExactlyOnceSink
    from dataflows_ray.streaming.upsert_engine import StreamingUpsertEngine

    src = str(tmp_path / "chg.parquet")
    df = pd.DataFrame({
        "user_id": [1, 2, 1, 2],
        "ts": pd.to_datetime([10, 20, 30, 40], unit="s"),
        "event_id": range(4),
        "event_type": ["click", "click", "view", None],
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src,
                   row_group_size=2)
    out = str(tmp_path / "sink")
    StreamingUpsertEngine(src, out, num_partitions=2,
                          rowgroups_per_epoch=1,
                          payload_cols=["value"]).run()
    snap = ExactlyOnceSink(out).read_output().to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # user 2's latest row has NULL event_type -> dropped like a tombstone
    assert snap["user_id"].tolist() == [1]
    assert snap["value"].tolist() == [3.0]


def test_rollup_cube_grouping_sets_empty_input_grand_total():
    """SQL GROUP BY ROLLUP/CUBE/GROUPING SETS over zero rows emits
    exactly ONE grand-total row: count 0, NULL sums."""
    import ray.data
    from dataflows_ray.stages.agg import (cube_aggregate,
                                          grouping_sets_aggregate,
                                          rollup_aggregate)

    empty = pa.table({"a": pa.array([], pa.string()),
                      "v": pa.array([], pa.float64())})
    specs = [{"target": "sv", "source": "v", "aggregate": "sum"},
             {"target": "n", "aggregate": "count"}]

    for fn, kwargs in [
            (rollup_aggregate, {}),
            (cube_aggregate, {}),
            (grouping_sets_aggregate, {"sets": [["a"], []]})]:
        ds = ray.data.from_arrow(empty)
        out = fn(ds, ["a"], specs=specs, **kwargs) if "sets" not in kwargs \
            else fn(ds, ["a"], kwargs["sets"], specs)
        got = out.to_pandas()
        assert len(got) == 1, f"{fn.__name__}: {got}"
        row = got.iloc[0]
        assert pd.isna(row["a"])
        assert pd.isna(row["sv"])
        assert row["n"] == 0

    # non-empty inputs still produce the real grand total (no seed leak)
    rows = [{"a": f"a{i % 2}", "v": float(i)} for i in range(10)]
    ds = ray.data.from_items(rows).repartition(3)
    out = rollup_aggregate(ds, ["a"], specs).to_pandas()
    tot = out[out["a"].isna()]
    assert len(tot) == 1
    assert tot["n"].iloc[0] == 10
    assert tot["sv"].iloc[0] == sum(range(10))


def test_md5_sampling_rejects_nonanchor_types():
    """bool/timestamp id columns would silently break the md5(str(v))
    contract (Arrow casts bool to 'true', str(True) is 'True') — the
    sampler must reject them loudly."""
    from dataflows_ray.stages.sampling import _md5_strings, _md5_u01
    import hashlib

    with pytest.raises(TypeError):
        _md5_strings(pa.array([True, False]))
    with pytest.raises(TypeError):
        _md5_u01(pa.chunked_array([pa.array(
            pd.to_datetime([1, 2], unit="s"))]))
    # the supported types still match per-row str(v) md5 exactly
    ints = pa.chunked_array([pa.array([7, 42, None])])
    got = _md5_u01(ints)
    exp = np.array([int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                    / 2 ** 32 for v in [7, 42, None]])
    assert np.array_equal(got, exp)
