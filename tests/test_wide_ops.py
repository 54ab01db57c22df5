"""Wide/stateful operators: join, join_with_self, dedup, sort, unpivot,
concatenate — conformance ports of reference tests/test_lib.py scenarios."""

import pytest

from dataflows_ray import (
    Flow, iterable_loader, join, join_with_self, deduplicate, sort_rows,
    unpivot, concatenate, set_primary_key, duplicate, delete_resource,
    sources, conditional, update_package, finalizer,
)


def characters():
    # reference test_lib.py join fixtures (semantics, not data, mirrored)
    return [
        {"first_name": "Louise", "house": "Lannister", "age": 23},
        {"first_name": "Jaime", "house": "Lannister", "age": 34},
        {"first_name": "Tyrion", "house": "Lannister", "age": 39},
        {"first_name": "Jon", "house": "Stark", "age": 17},
        {"first_name": "Arya", "house": "Stark", "age": 11},
    ]


def houses():
    return [{"house": "Lannister"}, {"house": "Stark"}]


def test_join_half_outer_with_aggregations():
    results, _, _ = Flow(
        iterable_loader(characters(), name="chars"),
        iterable_loader(houses(), name="houses"),
        join("chars", ["house"], "houses", ["house"], {
            "avg_age": {"name": "age", "aggregate": "avg"},
            "max_age": {"name": "age", "aggregate": "max"},
            "min_age": {"name": "age", "aggregate": "min"},
            "sum_age": {"name": "age", "aggregate": "sum"},
            "count": {"aggregate": "count"},
        }),
    ).results()
    rows = sorted(results[0], key=lambda r: r["house"])
    lann, stark = rows
    assert lann["house"] == "Lannister"
    assert lann["sum_age"] == 96 and lann["count"] == 3
    assert lann["max_age"] == 39 and lann["min_age"] == 23
    assert lann["avg_age"] == 32.0
    assert stark["sum_age"] == 28 and stark["count"] == 2


def test_join_inner_drops_unmatched():
    target = [{"house": "Lannister"}, {"house": "Targaryen"}]
    results, _, _ = Flow(
        iterable_loader(characters(), name="chars"),
        iterable_loader(target, name="houses"),
        join("chars", ["house"], "houses", ["house"],
             {"count": {"aggregate": "count"}}, mode="inner"),
    ).results()
    assert [r["house"] for r in results[0]] == ["Lannister"]


def test_join_half_outer_null_fill():
    target = [{"house": "Lannister"}, {"house": "Targaryen"}]
    results, _, _ = Flow(
        iterable_loader(characters(), name="chars"),
        iterable_loader(target, name="houses"),
        join("chars", ["house"], "houses", ["house"],
             {"count": {"aggregate": "count"}}, mode="half-outer"),
    ).results()
    rows = {r["house"]: r for r in results[0]}
    assert rows["Lannister"]["count"] == 3
    assert rows["Targaryen"]["count"] is None


def test_join_full_outer_emits_unmatched_source_keys():
    target = [{"house": "Targaryen", "seat": "Dragonstone"}]
    results, _, _ = Flow(
        iterable_loader(characters(), name="chars"),
        iterable_loader(target, name="houses"),
        join("chars", ["house"], "houses", ["house"],
             {"count": {"aggregate": "count"}}, mode="full-outer",
             strategy="shuffle"),
    ).results()
    rows = {r["house"]: r for r in results[0]}
    # unmatched source keys appear with restored key fields (join.py:251-255)
    assert set(rows) == {"Targaryen", "Lannister", "Stark"}
    assert rows["Lannister"]["count"] == 3
    assert rows["Targaryen"]["count"] is None


def test_join_with_self_group_by():
    results, _, _ = Flow(
        iterable_loader(characters(), name="chars"),
        join_with_self("chars", ["house"], {
            "house": {"aggregate": "first"},
            "n": {"aggregate": "count"},
            "names": {"name": "first_name", "aggregate": "array"},
            "name_set": {"name": "first_name", "aggregate": "set"},
            "median_age": {"name": "age", "aggregate": "median"},
        }),
    ).results()
    rows = sorted(results[0], key=lambda r: r["house"])
    lann, stark = rows
    assert lann["n"] == 3 and stark["n"] == 2
    assert sorted(lann["names"]) == ["Jaime", "Louise", "Tyrion"]
    assert lann["name_set"] == ["Jaime", "Louise", "Tyrion"]  # sorted set
    assert lann["median_age"] == 34
    assert stark["median_age"] == 14  # (11+17)/2


def test_join_with_self_counters():
    data = [{"k": 1, "w": "a"}, {"k": 1, "w": "b"}, {"k": 1, "w": "a"}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        join_with_self("t", ["k"], {
            "k": {"aggregate": "first"},
            "wc": {"name": "w", "aggregate": "counters"},
        }),
    ).results()
    assert results[0][0]["wc"] == [["a", 2], ["b", 1]]


def test_deduplicate_keep_first():
    data = [
        {"a": 1, "b": "x"}, {"a": 1, "b": "y"},
        {"a": 2, "b": "z"}, {"a": 2, "b": "z"},
    ]
    results, _, _ = Flow(
        iterable_loader(data, name="t", row_ids=True),
        set_primary_key(["a"]),
        deduplicate(),
    ).results()
    rows = sorted(results[0], key=lambda r: r["a"])
    # keep FIRST occurrence (reference deduplicate.py:6-31)
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "z")]


def test_sort_rows_numeric_with_negatives():
    data = [{"x": 3.5}, {"x": -1.2}, {"x": 0.0}, {"x": -100}, {"x": 7}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"), sort_rows(["x"]),
    ).results()
    assert [r["x"] for r in results[0]] == [-100, -1.2, 0.0, 3.5, 7]


def test_sort_rows_format_key_and_reverse():
    data = [{"a": "b", "b": 1}, {"a": "a", "b": 2}, {"a": "b", "b": 0}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"), sort_rows("{a}"),
    ).results()
    assert [r["a"] for r in results[0]] == ["a", "b", "b"]
    results, _, _ = Flow(
        iterable_loader(data, name="t"), sort_rows(["b"], reverse=True),
    ).results()
    assert [r["b"] for r in results[0]] == [2, 1, 0]


def test_sort_rows_stable():
    data = [{"k": 1, "i": 0}, {"k": 0, "i": 1}, {"k": 1, "i": 2},
            {"k": 0, "i": 3}, {"k": 1, "i": 4}]
    results, _, _ = Flow(
        iterable_loader(data, name="t", row_ids=True),
        sort_rows(["k"]),
    ).results()
    assert [r["i"] for r in results[0]] == [1, 3, 0, 2, 4]


def test_unpivot():
    data = [{"name": "r1", "2000": 1, "2001": 2},
            {"name": "r2", "2000": 3, "2001": 4}]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        unpivot(
            [{"name": r"(2\d{3})", "keys": {"year": r"\1"}}],
            [{"name": "year", "type": "integer"}],
            {"name": "value", "type": "integer"},
        ),
    ).results()
    assert results[0] == [
        {"year": 2000, "name": "r1", "value": 1},
        {"year": 2001, "name": "r1", "value": 2},
        {"year": 2000, "name": "r2", "value": 3},
        {"year": 2001, "name": "r2", "value": 4},
    ]


def test_concatenate():
    a = [{"col_a": 1, "extra": "x"}, {"col_a": 2, "extra": "y"}]
    b = [{"col_b": 3}, {"col_b": 4}]
    results, _, _ = Flow(
        iterable_loader(a, name="a"),
        iterable_loader(b, name="b"),
        concatenate({"val": ["col_a", "col_b"], "extra": None},
                    target={"name": "out"}),
    ).results()
    vals = sorted(r["val"] for r in results[0])
    assert vals == [1, 2, 3, 4]
    extras = {r["val"]: r["extra"] for r in results[0]}
    assert extras[1] == "x" and extras[3] is None


def test_duplicate_and_delete_resource():
    results, stream, _ = Flow(
        iterable_loader([{"x": 1}], name="a"),
        duplicate("a", "b"),
    ).results()
    assert len(results) == 2 and results[0] == results[1]
    results, stream, _ = Flow(
        iterable_loader([{"x": 1}], name="a"),
        duplicate("a", "b"),
        delete_resource(["a"]),
    ).results()
    assert len(results) == 1


def test_sources_and_conditional():
    results, _, _ = Flow(
        iterable_loader([{"x": 1}], name="a"),
        sources(Flow(iterable_loader([{"y": 2}], name="b"))),
    ).results()
    assert len(results) == 2
    results, _, _ = Flow(
        iterable_loader([{"x": 1}], name="a"),
        conditional(lambda s: "a" in s.resource_names(),
                    Flow(iterable_loader([{"y": 2}], name="b"))),
        conditional(lambda s: "zz" in s.resource_names(),
                    Flow(iterable_loader([{"y": 3}], name="c"))),
    ).results()
    assert len(results) == 2


def test_finalizer_runs():
    seen = []
    Flow(
        iterable_loader([{"x": 1}], name="a"),
        finalizer(lambda: seen.append(True)),
    ).results()
    assert seen == [True]


def test_asof_join_backward_and_forward():
    import datetime
    import ray.data
    from dataflows_ray.stages.asof import asof_join

    def ts(s):
        return datetime.datetime(2020, 1, s)

    left = ray.data.from_items([
        {"k": "a", "t": ts(5), "ev": 1},
        {"k": "a", "t": ts(10), "ev": 2},
        {"k": "b", "t": ts(7), "ev": 3},
        {"k": "c", "t": ts(7), "ev": 4},   # no right rows for 'c'
    ])
    right = ray.data.from_items([
        {"kk": "a", "rt": ts(4), "price": 10.0},
        {"kk": "a", "rt": ts(9), "price": 20.0},
        {"kk": "b", "rt": ts(8), "price": 30.0},
    ])
    back = asof_join(left, right, ["k"], ["kk"], "t", "rt").to_pandas()
    back = back.sort_values("ev").reset_index(drop=True)
    assert back["price"].tolist()[:2] == [10.0, 20.0]
    assert back.loc[2, "price"] != back.loc[2, "price"] or back.loc[2, "price"] is None  # b@7 < 8 -> no match
    assert len(back) == 4

    fwd = asof_join(left, right, ["k"], ["kk"], "t", "rt",
                    direction="forward").to_pandas()
    fwd = fwd.sort_values("ev").reset_index(drop=True)
    assert fwd.loc[0, "price"] == 20.0  # a@5 -> next at 9
    assert fwd.loc[2, "price"] == 30.0  # b@7 -> next at 8


def test_range_join_window():
    import datetime
    import ray.data
    from dataflows_ray.stages.rangejoin import range_join

    def ts(h):
        return datetime.datetime(2020, 1, 1, h)

    left = ray.data.from_items([
        {"k": "a", "t": ts(10), "ev": 1},
        {"k": "b", "t": ts(10), "ev": 2},
    ])
    right = ray.data.from_items([
        {"kk": "a", "rt": ts(8), "m": 1},   # within 3h before
        {"kk": "a", "rt": ts(10), "m": 2},  # exact
        {"kk": "a", "rt": ts(11), "m": 3},  # after -> excluded
        {"kk": "a", "rt": ts(6), "m": 4},   # too early
        {"kk": "b", "rt": ts(9), "m": 5},
    ])
    out = range_join(left, right, ["k"], ["kk"], "t", "rt",
                     before=datetime.timedelta(hours=3)).to_pandas()
    got = sorted(zip(out["ev"], out["m"]))
    assert got == [(1, 1), (1, 2), (2, 5)]


def test_top_k_and_set_ops():
    import ray.data
    from dataflows_ray.stages.setops import top_k, set_intersect, set_except

    ds = ray.data.from_items([{"v": i % 37, "id": i} for i in range(500)])
    top = top_k(ds, ["v", "id"], 5, descending=[True, False]).to_pandas()
    assert top["v"].tolist() == [36, 36, 36, 36, 36]
    assert top["id"].tolist() == sorted(top["id"].tolist())

    a = ray.data.from_items([{"x": i} for i in [1, 2, 2, 3, 4]])
    b = ray.data.from_items([{"x": i} for i in [3, 4, 4, 5]])
    inter = sorted(set_intersect(a, b).to_pandas()["x"])
    assert inter == [3, 4]
    exc = sorted(set_except(a, b).to_pandas()["x"])
    assert exc == [1, 2]


def test_pivot_table_roundtrip_with_unpivot():
    import ray.data
    from dataflows_ray.stages.setops import pivot_table

    rows = []
    for name in ("x", "y"):
        for year in ("1990", "2000"):
            rows.append({"name": name, "year": year,
                         "v": float(len(name) + int(year) % 7)})
    ds = ray.data.from_items(rows)
    wide = pivot_table(ds, ["name"], "year", "v", agg="sum").to_pandas() \
        .sort_values("name").reset_index(drop=True)
    assert list(wide.columns) == ["name", "1990", "2000"]
    assert wide.loc[0, "1990"] == rows[0]["v"]


def test_grouped_top_k_matches_pandas_row_number():
    import ray.data
    from dataflows_ray.stages.setops import grouped_top_k

    rows = [{"g": f"g{i % 5}", "v": (i * 7) % 23, "id": i}
            for i in range(400)]
    ds = ray.data.from_items(rows).repartition(9)
    out = grouped_top_k(ds, ["g"], ["v", "id"], 3,
                        descending=[True, False], rank_col="rank") \
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)

    import pandas as pd
    df = pd.DataFrame(rows).sort_values(
        ["g", "v", "id"], ascending=[True, False, True])
    df["rank"] = df.groupby("g").cumcount() + 1
    exp = df[df["rank"] <= 3].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["g", "v", "id", "rank"]], exp[["g", "v", "id", "rank"]],
        check_dtype=False)
    assert out.groupby("g").size().eq(3).all()


def test_rollup_aggregate_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.agg import rollup_aggregate

    rows = [{"a": f"a{i % 3}", "b": f"b{i % 2}", "v": float(i % 7),
             "w": i % 5} for i in range(300)]
    ds = ray.data.from_items(rows).repartition(5)
    out = rollup_aggregate(ds, ["a", "b"], [
        {"target": "sv", "source": "v", "aggregate": "sum"},
        {"target": "n", "aggregate": "count"},
        {"target": "mx", "source": "w", "aggregate": "max"},
    ]).to_pandas().sort_values(["a", "b"], na_position="last") \
        .reset_index(drop=True)

    df = pd.DataFrame(rows)
    fine = df.groupby(["a", "b"]).agg(
        sv=("v", "sum"), n=("v", "size"), mx=("w", "max")).reset_index()
    mid = df.groupby(["a"]).agg(
        sv=("v", "sum"), n=("v", "size"), mx=("w", "max")).reset_index()
    mid["b"] = None
    tot = pd.DataFrame([{"a": None, "b": None, "sv": df["v"].sum(),
                         "n": len(df), "mx": df["w"].max()}])
    exp = pd.concat([fine, mid, tot], ignore_index=True) \
        .sort_values(["a", "b"], na_position="last").reset_index(drop=True)

    assert len(out) == len(exp)
    assert out["a"].fillna("~").tolist() == exp["a"].fillna("~").tolist()
    assert out["b"].fillna("~").tolist() == exp["b"].fillna("~").tolist()
    assert out["sv"].tolist() == exp["sv"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()
    assert out["mx"].tolist() == exp["mx"].tolist()


def test_keyed_window_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.analytic import keyed_window

    rng = np.random.Generator(np.random.PCG64(3))
    rows = [{"k": f"k{i % 6}", "o": int(rng.integers(0, 1000)) * 10 + i,
             "v": int(rng.integers(-5, 50))} for i in range(500)]
    ds = ray.data.from_items(rows).repartition(8)
    out = keyed_window(ds, ["k"], ["o"], "v").to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)

    df = pd.DataFrame(rows).sort_values(["k", "o"]).reset_index(drop=True)
    g = df.groupby("k", sort=False)
    df["running_sum"] = g["v"].cumsum()
    df["prev_value"] = g["v"].shift(1)
    df["rn"] = g.cumcount() + 1

    assert out["running_sum"].tolist() == df["running_sum"].tolist()
    assert out["rn"].tolist() == df["rn"].tolist()
    got_prev = out["prev_value"].astype("float64").tolist()
    exp_prev = df["prev_value"].tolist()
    for a, b in zip(got_prev, exp_prev):
        assert (pd.isna(a) and pd.isna(b)) or a == b


def test_keyed_window_dense_rank_and_ntile_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.analytic import keyed_window

    rng = np.random.Generator(np.random.PCG64(11))
    rows = [{"k": f"k{i % 5}", "o": int(rng.integers(0, 9)),
             "id": i, "v": int(rng.integers(0, 100))} for i in range(230)]
    ds = ray.data.from_items(rows).repartition(6)
    out = keyed_window(ds, ["k"], ["o", "id"], "v",
                       running_sum=None, lag=None, row_number=None,
                       dense_rank="dr", ntile=4).to_pandas() \
        .sort_values(["k", "o", "id"]).reset_index(drop=True)

    df = pd.DataFrame(rows)
    exp = duckdb.connect().execute("""
        SELECT k, o, id, v,
               dense_rank() OVER (PARTITION BY k ORDER BY o, id) AS dr,
               ntile(4) OVER (PARTITION BY k ORDER BY o, id) AS nt
        FROM df ORDER BY k, o, id""").df()
    assert out["dr"].tolist() == exp["dr"].tolist()
    assert out["ntile"].tolist() == exp["nt"].tolist()


def test_keyed_window_dense_rank_with_ties():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.analytic import keyed_window

    rng = np.random.Generator(np.random.PCG64(13))
    rows = [{"k": f"k{i % 3}", "o": int(rng.integers(0, 5)), "id": i}
            for i in range(120)]
    ds = ray.data.from_items(rows).repartition(4)
    out = keyed_window(ds, ["k"], ["o"], "id",
                       running_sum=None, lag=None, row_number=None,
                       dense_rank="dr").to_pandas()
    got = {(k, o): dr for k, o, dr in zip(out["k"], out["o"], out["dr"])}

    df = pd.DataFrame(rows)
    exp = duckdb.connect().execute("""
        SELECT DISTINCT k, o,
               dense_rank() OVER (PARTITION BY k ORDER BY o) AS dr
        FROM df""").df()
    for k, o, dr in zip(exp["k"], exp["o"], exp["dr"]):
        assert got[(k, o)] == dr


def test_hash_sample_deterministic_and_entity_consistent():
    import numpy as np
    import ray.data
    from dataflows_ray.stages.sampling import hash_sample

    rows = [{"user": f"u{i % 400}", "rec": i} for i in range(2000)]
    ds = ray.data.from_items(rows).repartition(7)
    s1 = hash_sample(ds, "user", 0.3, seed=1).to_pandas()
    s2 = hash_sample(ds.repartition(3), "user", 0.3, seed=1).to_pandas()
    # identical sample at any parallelism
    assert sorted(s1["rec"]) == sorted(s2["rec"])
    # entity-consistent: each user fully in or fully out (5 recs each)
    counts = s1.groupby("user").size()
    assert (counts == 5).all()
    # roughly the requested fraction of the 400 users
    assert 0.2 < len(counts) / 400 < 0.4
    # different seed -> different sample
    s3 = hash_sample(ds, "user", 0.3, seed=2).to_pandas()
    assert sorted(s3["rec"]) != sorted(s1["rec"])
    # fraction bounds
    assert hash_sample(ds, "user", 1.0).count() == 2000
    assert hash_sample(ds, "user", 0.0).count() == 0


def test_stratified_sample_first_n_per_stratum():
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.sampling import stratified_sample

    rows = [{"g": f"g{i % 4}", "id": i} for i in range(100)]
    ds = ray.data.from_items(rows).repartition(6)
    out = stratified_sample(ds, ["g"], 3, ["id"]).to_pandas() \
        .sort_values(["g", "id"]).reset_index(drop=True)
    exp = pd.DataFrame(rows).sort_values(["g", "id"]) \
        .groupby("g").head(3).reset_index(drop=True)
    assert out[["g", "id"]].equals(exp[["g", "id"]])


def test_keyed_window_lead_first_last_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.analytic import keyed_window

    rng = np.random.Generator(np.random.PCG64(17))
    rows = [{"k": f"k{i % 4}", "id": i, "v": int(rng.integers(0, 50))}
            for i in range(160)]
    ds = ray.data.from_items(rows).repartition(5)
    out = keyed_window(ds, ["k"], ["id"], "v",
                       running_sum=None, lag=None, row_number=None,
                       lead="nxt", first_value="fv", last_value="lv") \
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)

    df = pd.DataFrame(rows)
    exp = duckdb.connect().execute("""
        SELECT k, id, v,
               lead(v) OVER w AS nxt,
               first_value(v) OVER (PARTITION BY k ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS fv,
               last_value(v) OVER (PARTITION BY k ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS lv
        FROM df WINDOW w AS (PARTITION BY k ORDER BY id)
        ORDER BY k, id""").df()
    assert out["fv"].tolist() == exp["fv"].tolist()
    assert out["lv"].tolist() == exp["lv"].tolist()
    got_nxt = out["nxt"].astype("float64")
    for a, b in zip(got_nxt, exp["nxt"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b


def test_unnest_list_ordinality_nulls_empties():
    import pyarrow as pa
    import ray.data
    from dataflows_ray.stages.reshape import unnest_list
    tbl = pa.table({"id": [1, 2, 3, 4],
                    "xs": [[10, 11], None, [], [20, 21, 22]]})
    out = unnest_list(ray.data.from_arrow(tbl).repartition(2), "xs") \
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    assert out.to_dict("list") == {
        "id": [1, 1, 4, 4, 4], "pos": [1, 2, 1, 2, 3],
        "val": [10, 11, 20, 21, 22]}


def test_ordered_group_concat_multiblock():
    """ordered_group_concat == pandas string_agg(ORDER BY) on input that
    spans many blocks with keys interleaved across them (the exchange must
    co-locate keys; order comes from the per-partition sort)."""
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.agg import ordered_group_concat

    n = 5000
    df = pd.DataFrame({
        "k": [f"g{i % 37}" for i in range(n)],
        # decreasing order key: input order is the REVERSE of output order
        "o": list(range(n, 0, -1)),
        "t": [f"w{i}" for i in range(n)],
    })
    ds = ray.data.from_pandas(df).repartition(16)
    out = ordered_group_concat(ds, "k", ["o"], "t",
                               out_col="joined", count_col="n").to_pandas()
    exp = (df.sort_values(["k", "o"]).groupby("k")
             .agg(joined=("t", " ".join), n=("t", "size")).reset_index())
    got = out.sort_values("k").reset_index(drop=True)[["k", "joined", "n"]]
    pd.testing.assert_frame_equal(
        got, exp.sort_values("k").reset_index(drop=True),
        check_dtype=False)


def test_ordered_group_concat_small_input_coalesce():
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.agg import ordered_group_concat

    df = pd.DataFrame({"k": ["a", "b", "a"], "o": [2, 1, 1],
                       "t": ["y", "z", "x"]})
    out = ordered_group_concat(ray.data.from_pandas(df), "k", ["o"], "t",
                               out_col="j").to_pandas()
    got = dict(zip(out["k"], out["j"]))
    assert got == {"a": "x y", "b": "z"}


def test_keyed_window_rolling_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.analytic import keyed_window

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 9, 400),
        "o": np.arange(400),
        "v": rng.randint(-50, 50, 400).astype("int64"),
    })
    out = keyed_window(
        ray.data.from_pandas(df).repartition(8), ["k"], ["o"], "v",
        running_sum=None, lag=None, row_number=None,
        rolling_window=5, rolling_sum="rs", rolling_avg="ra",
        rolling_min="rmin", rolling_max="rmax",
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)

    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = exp.groupby("k")["v"].rolling(5, min_periods=1)
    for name, agg in (("rs", "sum"), ("ra", "mean"),
                      ("rmin", "min"), ("rmax", "max")):
        s = getattr(g, agg)()
        s.index = s.index.droplevel(0)
        exp[name] = s.sort_index().values
    for c in ("rs", "ra", "rmin", "rmax"):
        assert np.allclose(out[c].to_numpy(dtype=float),
                           exp[c].to_numpy(dtype=float)), c


def test_hash_stratified_sample_deterministic_and_sized():
    import hashlib
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.sampling import hash_stratified_sample

    df = pd.DataFrame({"id": range(300), "s": [f"g{i % 3}" for i in range(300)]})
    ds = ray.data.from_pandas(df).repartition(6)
    out1 = hash_stratified_sample(ds, ["s"], "id", k=4).to_pandas()
    out2 = hash_stratified_sample(ds, ["s"], "id", k=4).to_pandas()
    assert sorted(out1["id"]) == sorted(out2["id"])
    assert out1.groupby("s").size().tolist() == [4, 4, 4]
    # matches the md5-rank definition exactly
    df["r"] = df["id"].map(lambda v: hashlib.md5(str(v).encode()).hexdigest())
    exp = set(df.sort_values(["s", "r", "id"]).groupby("s").head(4)["id"])
    assert set(out1["id"]) == exp


def test_normalize_text_kernels():
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.text import normalize_text

    raw = ["  he\x01llo\t\tworld  ", "e\u0301cole   x", "", "a\x7fb"]
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": range(4), "text": raw}))
    out = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert out["norm_text"].tolist() == ["hello world", "\u00e9cole x", "", "ab"]
    assert out["norm_len"].tolist() == [11, 7, 0, 2]


def test_repetition_signals_exact():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.text import repetition_signals

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a a a a", "w x y z", "spam spam ham", ""],
    })
    out = repetition_signals(ray.data.from_pandas(docs).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [4, 4, 3, 0]
    assert out["n_distinct"].tolist() == [1, 4, 2, 0]
    assert np.allclose(out["dup_word_frac"][:3], [0.75, 0.0, 1 / 3])
    assert np.allclose(out["top_word_frac"][:3], [1.0, 0.25, 2 / 3])
    assert out["dup_word_frac"].isna().tolist() == [False] * 3 + [True]


def test_ngram_contamination_planted():
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.text import ngram_contamination

    eval_ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["we saw the quick brown fox yesterday",   # shares 4-gram
                 "completely unrelated text with no overlap at all",
                 "quick brown fox jumps again"],           # shares 4-gram
    })).repartition(3)
    out = ngram_contamination(corpus, eval_ds, n=4).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2]


def test_weighted_source_sample_deterministic_and_bounded():
    import hashlib
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.sampling import weighted_source_sample

    df = pd.DataFrame({"doc_id": range(400),
                       "source": [f"s{i % 4}" for i in range(400)]})
    ds = ray.data.from_pandas(df).repartition(5)
    rates = {"s0": 0.0, "s1": 0.25, "s2": 1.0}
    out1 = weighted_source_sample(ds, rates, default_rate=0.5).to_pandas()
    out2 = weighted_source_sample(ds, rates, default_rate=0.5).to_pandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    by = out1.groupby("source").size()
    assert by.get("s0", 0) == 0          # rate 0 drops everything
    assert by["s2"] == 100               # rate 1 keeps everything
    # exact md5 definition
    u = df["doc_id"].map(lambda v: int(
        hashlib.md5(str(v).encode()).hexdigest()[:8], 16) / 2**32)
    r = df["source"].map(lambda s: rates.get(s, 0.5))
    assert sorted(out1["doc_id"]) == sorted(df.loc[u < r, "doc_id"])


def test_repetition_signals_ascii_whitespace_class_matches_oracle():
    # Engine and q80 oracle both split on the EXPLICIT class
    # [ \t\n\r\f\v]+ — NBSP (U+00A0) is NOT a separator (pandas'
    # default Unicode split used to diverge here).
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.text import repetition_signals

    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["c\xa0d c\xa0d", "a\vb a\vb"]})
    out = repetition_signals(ray.data.from_pandas(docs)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 0: "c\xa0d" is ONE word appearing twice
    assert out.loc[0, "n_words"] == 2 and out.loc[0, "n_distinct"] == 1
    # doc 1: \v IS a separator -> words a, b, a, b
    assert out.loc[1, "n_words"] == 4 and out.loc[1, "n_distinct"] == 2


def test_doc_shingles_split_on_vertical_tab():
    import pyarrow as pa
    from dataflows_ray.functions.text import _doc_shingles

    batch = pa.table({"doc_id": [0], "text": ["a\vb c d"]})
    out = _doc_shingles(batch, "doc_id", "text", 2)
    assert sorted(out["shingle"].to_pylist()) == ["a b", "b c", "c d"]


def test_ngram_contamination_empty_eval_set():
    # All eval docs shorter than n words -> zero shingles; must return
    # the correct EMPTY result, not raise on a mistyped empty value_set.
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.text import ngram_contamination

    eval_ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [100], "text": ["too short"]}))
    corpus = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["one two three four five",
                                    "six seven eight nine ten"]}))
    out = ngram_contamination(corpus, eval_ds, n=4).to_pandas()
    assert len(out) == 0


def test_semi_join_ids_empty_set_anti_identity():
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.semijoin import semi_join_ids

    ds = ray.data.from_pandas(pd.DataFrame(
        {"k": ["x", "y"], "v": [1, 2]}))
    empty = ray.data.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=str)}))
    assert len(semi_join_ids(ds, empty, col="k").to_pandas()) == 0
    anti = semi_join_ids(ds, empty, col="k", anti=True).to_pandas()
    assert sorted(anti["k"]) == ["x", "y"]


def test_train_val_test_split_vectorized_matches_md5_definition():
    import hashlib
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.sampling import train_val_test_split

    df = pd.DataFrame({"doc_id": range(300)})
    out = train_val_test_split(
        ray.data.from_pandas(df).repartition(4)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cum = np.cumsum((0.8, 0.1, 0.1))
    labels = ("train", "val", "test")
    want = [labels[int(np.searchsorted(cum, int(
        hashlib.md5(str(v).encode()).hexdigest()[:8], 16) / 2**32,
        side="right"))] for v in df["doc_id"]]
    assert out["split"].tolist() == want


def test_weighted_source_sample_null_source_uses_default():
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.sampling import weighted_source_sample

    df = pd.DataFrame({"doc_id": range(40),
                       "source": ["a"] * 20 + [None] * 20})
    ds = ray.data.from_pandas(df)
    out = weighted_source_sample(ds, {"a": 0.0}, default_rate=1.0) \
        .to_pandas()
    assert sorted(out["doc_id"]) == list(range(20, 40))


def test_cube_aggregate_matches_duckdb():
    import duckdb
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.agg import cube_aggregate

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", "q"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = cube_aggregate(ray.data.from_pandas(df).repartition(3),
                         ["a", "b"], [
        {"target": "sv", "source": "v", "aggregate": "sum"},
        {"target": "n", "source": "v", "aggregate": "count"},
    ]).to_pandas()
    want = duckdb.sql(
        "SELECT a, b, sum(v) AS sv, count(*) AS n FROM df "
        "GROUP BY CUBE(a, b)").df()
    key = lambda d: d.fillna("~").sort_values(["a", "b"]).reset_index(drop=True)
    o, w = key(out), key(want)
    assert o[["a", "b"]].equals(w[["a", "b"]])
    assert (o["sv"] == w["sv"]).all() and (o["n"] == w["n"]).all()


def test_grouping_sets_subset_and_validation():
    import pandas as pd
    import pytest as _pytest
    import ray.data
    from dataflows_ray.stages.agg import grouping_sets_aggregate

    df = pd.DataFrame({"a": ["x", "y"], "b": ["p", "p"], "v": [1, 2]})
    ds = ray.data.from_pandas(df)
    out = grouping_sets_aggregate(ds, ["a", "b"], [["a"], []], [
        {"target": "sv", "source": "v", "aggregate": "sum"}]).to_pandas()
    assert len(out) == 3  # 2 'a' groups + grand total
    total = out[out["a"].isna() & out["b"].isna()]
    assert total["sv"].iloc[0] == 3
    with _pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a"], [["zz"]], [
            {"target": "sv", "source": "v", "aggregate": "sum"}])
    with _pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a"], [["a"]], [
            {"target": "sv", "source": "v", "aggregate": "avg"}])


def test_quantile_bucket_stats_partition_invariant():
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.quantiles import quantile_bucket_stats

    vals = list(range(1, 101))
    df = pd.DataFrame({"dur": vals})
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        o = quantile_bucket_stats(ds, "dur", [0.25, 0.5, 0.75]) \
            .to_pandas().sort_values("bucket").reset_index(drop=True)
        outs.append(o)
    assert outs[0].equals(outs[1])
    o = outs[0]
    assert o["n_rows"].tolist() == [25, 25, 25, 25]
    # bucket 0 = 1..25 (quantile_disc(0.25) of 1..100 is 25)
    assert o.loc[0, "max_val"] == 25
    assert o.loc[0, "padding"] == 25 * 25 - sum(range(1, 26))


def test_loudness_normalize_and_qc_kernels():
    import numpy as np
    from dataflows_ray.functions.audio_ops import (loudness_normalize,
                                                   audio_qc)

    x = np.array([1000, -2000, 3000, -4000] * 100, dtype=np.int16)
    y, rms_in, gain, rms_out = loudness_normalize(x, 3000.0)
    assert abs(rms_in - np.sqrt((x.astype(np.float64) ** 2).mean())) < 1e-9
    # normalized RMS lands near the target (quantization error only)
    assert abs(rms_out - 3000.0) < 1.0
    assert y.dtype == np.int16
    # silent clip: identity gain
    z = np.zeros(10, dtype=np.int16)
    _, ri, g, ro = loudness_normalize(z, 3000.0)
    assert (ri, g, ro) == (0.0, 1.0, 0.0)
    # QC: peak of -32768 counts as 32768 and as clipped
    q = np.array([0, 5, -32768, 32767], dtype=np.int16)
    peak, ncl, ts, te = audio_qc(q, 16000)
    assert peak == 32768 and ncl == 2
    # trim: 16k sr, 20ms frames = 320 samples; silence, loud, silence
    sig = np.zeros(320 * 5, dtype=np.int16)
    sig[320:640] = 10000
    peak, ncl, ts, te = audio_qc(sig, 16000)
    assert (ts, te) == (20, 40)


def test_bpe_learn_partition_invariant_and_classic():
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.bpe import (learn_bpe, merge_loop,
                                             bpe_encode_stage)

    # classic Sennrich example: 'es' merges first (9 occurrences)
    m = merge_loop([("low", 5), ("lower", 2), ("newest", 6),
                    ("widest", 3)], 3)
    assert m[0] == ("e", "s") and m[1] == ("es", "t")

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["the cat sat", "the bat", "the cat", "sat mat",
                 "the the the", ""]})
    merges_1 = learn_bpe(ray.data.from_pandas(docs), n_merges=10)
    merges_4 = learn_bpe(ray.data.from_pandas(docs).repartition(4),
                         n_merges=10)
    assert merges_1 == merges_4  # deterministic at any parallelism

    out = bpe_encode_stage(ray.data.from_pandas(docs).repartition(3),
                           merges_1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[5, "n_bpe_tokens"] == 0  # empty doc
    assert (out["n_bpe_tokens"][:5] > 0).all()
    # 'the' appears 7 times and must be fully merged into one token
    the_only = bpe_encode_stage(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [0],
                                           "text": ["the"]})),
        merges_1).to_pandas()
    assert the_only["n_bpe_tokens"].iloc[0] == 1


def test_pca_partition_invariant_and_orthonormal():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.pca import pca_fit, pca_project

    rng = np.random.default_rng(7)
    base = rng.normal(size=(80, 6)) @ np.diag([3, 2, 1, .5, .2, .1])
    df = pd.DataFrame({"vec_id": range(80),
                       "embedding": [r.astype(np.float32).tolist()
                                     for r in base]})
    fits = []
    for parts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(parts)
        mean, comps, vals = pca_fit(ds, k=3)
        fits.append((mean, comps, vals))
    # EXACT integer partials: identical at any parallelism, bit-for-bit
    assert (fits[0][0] == fits[1][0]).all()
    assert (fits[0][1] == fits[1][1]).all()
    mean, comps, vals = fits[0]
    assert np.allclose(comps.T @ comps, np.eye(3), atol=1e-10)
    assert vals[0] >= vals[1] >= vals[2] > 0
    # variance along pc1 ~ the largest planted scale (3^2-ish)
    proj = pca_project(ray.data.from_pandas(df).repartition(3),
                       mean, comps).to_pandas().sort_values("vec_id")
    assert proj["pc1"].var() > proj["pc2"].var() > proj["pc3"].var()


def test_grouped_embedding_mean_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.pca import grouped_embedding_mean

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "label": [i % 3 for i in range(60)],
        "embedding": [rng.normal(size=4).astype(np.float32).tolist()
                      for _ in range(60)],
    })
    outs = []
    for parts in (1, 6):
        o = grouped_embedding_mean(
            ray.data.from_pandas(df).repartition(parts)) \
            .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
        outs.append(o)
    assert outs[0].equals(outs[1])  # bit-equal at any parallelism
    o = outs[0]
    assert len(o) == 12 and (o["n_vecs"] == 20).all()
    # exact definition check against a per-row python loop
    import math
    s = {}
    for _, r in df.iterrows():
        for d, v in enumerate(r["embedding"], start=1):
            k = (r["label"], d)
            s[k] = s.get(k, 0) + int(math.floor(float(v) * 1e6 + 0.5))
    for _, r in o.iterrows():
        assert r["mean_val"] == s[(r["label"], r["dim"])] / (20 * 1e6)


def test_ordered_prefix_sum_matches_pandas_and_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data
    from dataflows_ray.stages.analytic import ordered_prefix_sum

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": np.arange(500),
                       "v": rng.integers(0, 100, size=500)})
    want = (df["v"].cumsum() - df["v"]).to_numpy()
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_pandas(
            df.sample(frac=1.0, random_state=1)).repartition(parts)
        o = ordered_prefix_sum(ds, "k", "v", bucket_width=37) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        outs.append(o)
    assert outs[0].equals(outs[1])
    assert (outs[0]["cum_before"].to_numpy() == want).all()


def test_bm25_topk_matches_duckdb():
    import duckdb
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.retrieval import bm25_topk

    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["fast join engine", "slow scan table join",
                 "join join join speed", "vector index scan",
                 "table scan engine fast fast"],
    })
    queries = pd.DataFrame({"query_id": [0, 1],
                            "text": ["fast join", "scan"]})
    out = bm25_topk(ray.data.from_pandas(corpus).repartition(3),
                    ray.data.from_pandas(queries), top_k=3) \
        .to_pandas().sort_values(["query_id", "score_u", "doc_id"],
                                 ascending=[True, False, True]) \
        .reset_index(drop=True)
    want = duckdb.sql(r"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus
), doc_stats AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM corpus
), s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(dl) AS BIGINT) AS sdl FROM doc_stats),
qterm AS (
  SELECT query_id, unnest(string_split(text, ' ')) AS term FROM queries
), dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM words WHERE term IN (SELECT term FROM qterm) GROUP BY term
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY doc_id, term
), scores AS (
  SELECT qt.query_id, t.doc_id,
         sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
             (tf * 2.5 / (tf + 1.5 * (0.25 +
                 0.75 * d.dl / (CAST(sdl AS DOUBLE) / n))))) AS score
  FROM tf t JOIN qterm qt USING (term) JOIN dfreq USING (term)
       JOIN doc_stats d ON d.doc_id = t.doc_id, s
  GROUP BY qt.query_id, t.doc_id
)
SELECT query_id, doc_id, CAST(floor(score * 1000000) AS BIGINT) AS score_u
FROM scores
QUALIFY row_number() OVER (PARTITION BY query_id
    ORDER BY CAST(floor(score*1000000) AS BIGINT) DESC, doc_id) <= 3
ORDER BY query_id, score_u DESC, doc_id
""").df()
    assert out["query_id"].tolist() == want["query_id"].tolist()
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["score_u"].tolist() == want["score_u"].tolist()
    # doc 3 (join join join) must top the 'fast join' query's join term
    q0 = out[out["query_id"] == 0]
    assert 3 in q0["doc_id"].tolist()


def test_grouped_aggregate_all_empty_input_keeps_schema():
    # Ray may skip map tasks on zero-row blocks; the aggregate's
    # empty-result path must still emit the FINAL schema with the raw
    # key types (NULL-typed keys poison downstream joins/unions).
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from dataflows_ray.stages.agg import grouped_aggregate

    ds = ray.data.from_pandas(pd.DataFrame(
        {"s": ["a"], "l": ["x"], "v": [1]}))
    empty = ds.map_batches(lambda t: t.slice(0, 0),
                           batch_format="pyarrow", batch_size=None)
    for spec in ({"target": "n", "source": "v", "aggregate": "count"},
                 {"target": "m", "source": "v", "aggregate": "min"},
                 {"target": "md", "source": "v", "aggregate": "median"}):
        out = grouped_aggregate(empty, ["s", "l"], [spec])
        sch = out.schema()
        assert sch.names == ["s", "l", spec["target"]]
        # key types must NOT collapse to null
        str_fields = [t for n, t in zip(sch.names, sch.types)
                      if n in ("s", "l")]
        assert all(not pa.types.is_null(t) for t in str_fields), sch
        assert out.count() == 0


def test_review_fix_edge_cases():
    """Round-4 review fixes: all-null source sampling, empty-block PCA,
    duplicate quantile edges, spf=0 audio QC."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from dataflows_ray.functions.audio_ops import audio_qc
    from dataflows_ray.functions.pca import pca_fit, pca_project, \
        grouped_embedding_mean
    from dataflows_ray.functions.quantiles import quantile_bucket_stats
    from dataflows_ray.stages.sampling import weighted_source_sample

    # all-null source batch: every row keeps default_rate semantics
    df = pd.DataFrame({"doc_id": range(10),
                       "source": pd.array([None] * 10, dtype=object)})
    out = weighted_source_sample(ray.data.from_pandas(df), {"a": 0.0},
                                 default_rate=1.0).to_pandas()
    assert len(out) == 10

    # PCA over a dataset containing empty blocks (filter wipes a block)
    rng = np.random.default_rng(2)
    edf = pd.DataFrame({
        "vec_id": range(40), "label": [i % 2 for i in range(40)],
        "embedding": [rng.normal(size=4).astype(np.float32).tolist()
                      for _ in range(40)]})
    ds = ray.data.from_pandas(edf).repartition(4).filter(
        lambda r: r["vec_id"] < 20)  # half the blocks end up empty
    mean, comps, _ = pca_fit(ds, k=2)
    assert len(pca_project(ds, mean, comps).to_pandas()) == 20
    assert len(grouped_embedding_mean(ds).to_pandas()) == 8

    # duplicate quantile edges keep SQL CASE bucket ids (gap, not renumber)
    skew = pd.DataFrame({"v": [10] * 60 + list(range(11, 51))})
    b = quantile_bucket_stats(ray.data.from_pandas(skew), "v",
                              [0.25, 0.5, 0.75]).to_pandas()
    assert 1 not in set(b["bucket"])  # q1 == q2 == 10 -> bucket 1 empty
    assert int(b.loc[b["bucket"] == 0, "n_rows"].iloc[0]) == 60

    # spf == 0 (sr*frame < 1000): no crash, trim collapses to 0/0
    peak, ncl, ts, te = audio_qc(np.array([5, -5], dtype=np.int16),
                                 sr_hz=8, frame_ms=20)
    assert (ts, te) == (0, 0) and peak == 5


def test_bm25_string_ids():
    import pandas as pd
    import ray.data
    from dataflows_ray.functions.retrieval import bm25_topk

    corpus = pd.DataFrame({"doc_id": ["d1", "d2"],
                           "text": ["alpha beta", "beta gamma"]})
    queries = pd.DataFrame({"query_id": ["q1"], "text": ["beta"]})
    out = bm25_topk(ray.data.from_pandas(corpus).repartition(2),
                    ray.data.from_pandas(queries), top_k=2).to_pandas()
    assert sorted(out["doc_id"]) == ["d1", "d2"]
    assert set(out["query_id"]) == {"q1"}
