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


def test_pca_fit_rejects_unchunkable_magnitudes():
    """|x| large enough that a SINGLE quantized product q_i*q_j exceeds
    2^62 cannot be made exact by chunking — pca_fit must raise instead
    of silently wrapping (round-5 review finding)."""
    import pytest
    import ray.data
    from dataflows_ray.functions.pca import pca_fit

    flat = np.full(8, 5000.0, dtype=np.float32)  # q = 5e9; q^2 > 2^62
    arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), 2)
    tbl = pa.table({"vec_id": pa.array(np.arange(4)), "embedding": arr})
    with pytest.raises(Exception) as ei:
        pca_fit(ray.data.from_arrow(tbl), col="embedding", k=1)
    assert "rescale" in str(ei.value)


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


def test_dedup_pairs_dataset_mode_no_driver_pandas(monkeypatch):
    """pairs_format='dataset' must return a ray Dataset from BOTH
    routes, and the distributed route must never call Dataset.to_pandas
    (no driver materialization of the pair report)."""
    import ray
    import ray.data
    from dataflows_ray.functions.dedup import (minhash_dedup,
                                               ngram_jaccard_dedup)
    from tests.test_functions import _docs

    # broadcast route
    ds = ray.data.from_items(_docs())
    deduped, pairs = minhash_dedup(ds, threshold=0.5,
                                   pairs_format="dataset")
    assert isinstance(pairs, ray.data.Dataset)
    pdf = pairs.to_pandas()
    assert (1, 102) in set(zip(pdf["doc_a"], pdf["doc_b"]))
    assert 102 not in set(deduped.to_pandas()["doc_id"])

    # distributed route (auto_pair_limit=0 forces it): poison to_pandas
    # for the duration of the pipeline build + drop execution
    calls = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    ds = ray.data.from_items(_docs())
    deduped, pairs = ngram_jaccard_dedup(ds, threshold=0.5,
                                         auto_pair_limit=0,
                                         pairs_format="dataset")
    assert not calls, "distributed dataset mode materialized pandas"
    assert isinstance(pairs, ray.data.Dataset)
    monkeypatch.undo()
    assert 102 not in set(deduped.to_pandas()["doc_id"])
    pdf = pairs.to_pandas()
    assert (1, 102) in set(zip(pdf["doc_a"], pdf["doc_b"]))


def test_dedup_distributed_pandas_report_is_capped(monkeypatch):
    """The compat pandas report on the distributed route pulls at most
    PAIR_REPORT_LIMIT rows to the driver."""
    import ray.data
    import dataflows_ray.functions.dedup as dd
    from tests.test_functions import _docs

    monkeypatch.setattr(dd, "PAIR_REPORT_LIMIT", 2)
    ds = ray.data.from_items(_docs())
    deduped, pairs = dd.minhash_dedup(ds, threshold=0.5, auto_pair_limit=0)
    assert len(pairs) <= 2                  # capped
    # the DROP itself is still complete (distributed, uncapped)
    kept = set(deduped.to_pandas()["doc_id"])
    assert 100 not in kept and 101 not in kept and 102 not in kept


def test_cosine_autoroute_executes_upstream_once(tmp_path):
    """The auto-router must not run a counting pass: a small corpus is
    collected in the SAME single execution that feeds the broadcast
    path (marker file counts map-task invocations across workers)."""
    import os
    import ray.data
    from dataflows_ray.functions.similarity import cosine_neardup_pairs

    marker = str(tmp_path / "execs")
    rng = np.random.default_rng(5)
    m = rng.normal(size=(50, 8)).astype(np.float32)
    m[49] = m[0]  # planted duplicate so the pair set is non-empty
    tbl = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in m])})

    def bump(batch: pa.Table) -> pa.Table:
        with open(marker, "ab") as f:
            f.write(b"x")
        return batch

    ds = ray.data.from_arrow(tbl).map_batches(
        bump, batch_format="pyarrow", batch_size=None)
    out = cosine_neardup_pairs(ds, threshold=0.99).to_pandas()
    # broadcast cosine is inherently two scans (collect the corpus
    # matrix, then score every batch against it); the old count() PROBE
    # added a third. Exactly 2 = probe gone.
    assert os.path.getsize(marker) == 2, \
        "routing probe executed an extra upstream pass"
    assert (0, 49) in set(zip(out["id_a"], out["id_b"]))

    # row_count_hint routes without ANY probe (forced bucketed here)
    os.unlink(marker)
    ds2 = ray.data.from_arrow(tbl).map_batches(
        bump, batch_format="pyarrow", batch_size=None)
    cosine_neardup_pairs(ds2, threshold=0.99, corpus_limit=10,
                         row_count_hint=50).to_pandas()
    # bucketed path: explode + verify joins touch the upstream a bounded
    # number of times, never a dedicated count() pass; with the hint the
    # broadcast collect is skipped entirely so the marker stays small
    assert os.path.getsize(marker) >= 1


def test_vector_format_matches_python_format():
    """try_vector_format must equal the per-row str.format exactly on
    the vectorizable subset, and decline (None) elsewhere."""
    from dataflows_ray.core.strformat import (try_vector_format,
                                              try_vector_join)

    batch = pa.table({
        "a": pa.array([1, None, -3], pa.int64()),
        "b": pa.array(["x", "y", None], pa.string()),
        "f": pa.array([1.5, 2.0, None], pa.float64()),
    })
    rows = batch.to_pylist()
    for spec in ["{a}:{b}", "{b}", "pre {a} mid {b} post", "{a}{a}{b}",
                 "literal only", "", "esc {{x}} {a}"]:
        got = try_vector_format(batch, spec)
        assert got is not None, spec
        exp = [spec.format(**r) for r in rows]
        assert got.to_pylist() == exp, spec
    # declined: format spec, conversion, float column, missing field
    assert try_vector_format(batch, "{a:>5}") is None
    assert try_vector_format(batch, "{a!r}") is None
    assert try_vector_format(batch, "{f}") is None
    assert try_vector_format(batch, "{zz}") is None

    # join kernel: skip-nulls contract
    got = try_vector_join(batch, ["a", "b"], "-")
    exp = ["-".join(str(v) for v in (r["a"], r["b"]) if v is not None)
           for r in rows]
    assert got.to_pylist() == exp
    assert try_vector_join(batch, ["a", "f"], "-") is None
    assert try_vector_join(batch, ["a"], "-").to_pylist() == \
        ["1", "", "-3"]


def test_dump_to_sql_connection_factory_paths(tmp_path, monkeypatch):
    """DBAPI-pluggable sink: rewrite/append/update through a connection
    factory, the generic delete+insert upsert, env:// resolution, and
    the object/array jsonize fixer."""
    import sqlite3
    from dataflows_ray import Flow, iterable_loader, set_primary_key
    from dataflows_ray.sinks.sql import dump_to_sql

    db = str(tmp_path / "fac.db")

    def factory():
        return sqlite3.connect(db)

    def write(rows, mode, dialect):
        Flow(
            iterable_loader(rows, name="t"),
            set_primary_key(["k"]),
            dump_to_sql({"m": {"resource-name": "t", "mode": mode}},
                        engine=factory, dialect=dialect),
        ).process()

    # generic dialect upsert = pre-DELETE + INSERT (no OR REPLACE)
    write([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}], "rewrite", "generic")
    write([{"k": 1, "v": "B"}, {"k": 3, "v": "c"}], "update", "generic")
    rows = sqlite3.connect(db).execute(
        "SELECT k, v FROM m ORDER BY k").fetchall()
    assert rows == [(1, "B"), (2, "b"), (3, "c")]
    # append through the factory
    write([{"k": 9, "v": "z"}], "append", "generic")
    n = sqlite3.connect(db).execute("SELECT count(*) FROM m").fetchone()[0]
    assert n == 4

    # env:// indirection (reference to_sql.py:56-62)
    db2 = str(tmp_path / "env.db")
    monkeypatch.setenv("TEST_DF_DB", f"sqlite:///{db2}")
    Flow(
        iterable_loader([{"k": 1, "tags": ["x", "y"],
                          "meta": {"a": 1}}], name="t"),
        dump_to_sql({"m2": {"resource-name": "t"}}, engine="env://TEST_DF_DB"),
    ).process()
    got = sqlite3.connect(db2).execute(
        "SELECT tags, meta FROM m2").fetchone()
    # sqlite dialect jsonizes arrays/objects (OBJECT_FIXERS parity)
    assert got == ('["x", "y"]', '{"a": 1}')

    # missing env var is loud
    with pytest.raises(ValueError):
        dump_to_sql({"m": {}}, engine="env://NOPE_NOT_SET")
