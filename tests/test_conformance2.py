"""Second conformance tranche mirroring reference tests/test_lib.py:
sort_rows composite numeric format keys (test_sort_reverse_many_rows:596),
datetime sort keys (:681), and whole-resource stateful rows generators
(helpers/rows_processor.py semantics: one generator over the full stream,
may emit trailing rows after input exhaustion)."""

import datetime

from dataflows_ray import Flow, iterable_loader, sort_rows, rows_fn


def test_sort_reverse_many_rows_composite_key():
    # reference test_lib.py:596-607: key='{b}{a}' over 1000 numeric rows
    data = [{"a": i, "b": i % 5} for i in range(1000)]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        sort_rows(key="{b}{a}", reverse=True),
    ).results()
    rows = results[0]
    assert [{k: r[k] for k in ("a", "b")} for r in rows[0:2]] == [
        {"a": 999, "b": 4}, {"a": 994, "b": 4}]
    assert [{k: r[k] for k in ("a", "b")} for r in rows[998:1000]] == [
        {"a": 5, "b": 0}, {"a": 0, "b": 0}]


def test_sort_rows_number_format_key():
    # reference test_lib.py:609-658: numeric values must sort NUMERICALLY
    # under a '{a}' format key (reference bit-encodes; we sort typed)
    vals = [0.1, -3, -4, 10, 8, 0, -1000000, 1000000, -0.1, -0.2, 0.2,
            -1000001, 1000001, 6, -10, -0.001, 0.001, 1, -1]
    results, _, _ = Flow(
        iterable_loader([{"a": v} for v in vals], name="t"),
        sort_rows(key="{a}"),
    ).results()
    assert [r["a"] for r in results[0]] == sorted(vals)


def test_sort_rows_datetime_key():
    # reference test_lib.py:681-700
    dates = [datetime.date(2000, 1, 3), datetime.date(2010, 1, 2),
             datetime.date(2020, 1, 1)]
    results, _, _ = Flow(
        iterable_loader([{"a": d} for d in reversed(dates)], name="t"),
        sort_rows(key="{a}"),
    ).results()
    assert [r["a"] for r in results[0]] == dates


def test_stateful_rows_running_total():
    # ONE generator must see every row in order and carry state across the
    # whole resource (reference rows_processor semantics)
    def running_total(rows):
        total = 0
        for row in rows:
            total += row["v"]
            yield {**row, "total": total}

    data = [{"v": i} for i in range(1, 101)]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        rows_fn(running_total, stateful=True),
    ).results()
    rows = results[0]
    assert [r["total"] for r in rows] == [sum(range(1, i + 1))
                                          for i in range(1, 101)]


def test_stateful_rows_trailing_emit():
    # a generator may emit rows AFTER the input is exhausted (summary row)
    def with_summary(rows):
        n = 0
        for row in rows:
            n += 1
            yield row
        yield {"v": -1, "is_summary": True, "count": n}

    data = [{"v": i} for i in range(10)]
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        rows_fn(with_summary, stateful=True),
    ).results()
    rows = results[0]
    assert len(rows) == 11
    assert rows[-1]["is_summary"] and rows[-1]["count"] == 10


def test_stateful_rows_seen_set_dedup():
    # cross-batch seen-set: duplicates beyond the first batch must drop
    def dedup_rows(rows):
        seen = set()
        for row in rows:
            if row["k"] not in seen:
                seen.add(row["k"])
                yield row

    data = [{"k": i % 7, "i": i} for i in range(5000)]  # many batches
    results, _, _ = Flow(
        iterable_loader(data, name="t"),
        rows_fn(dedup_rows, stateful=True),
    ).results()
    rows = results[0]
    assert len(rows) == 7
    assert sorted(r["i"] for r in rows) == list(range(7))  # first occurrences


def test_salted_dedup_hot_key():
    # one hot key = 80% of rows; two-phase salted dedup must still keep
    # exactly the FIRST occurrence per key
    from dataflows_ray import set_primary_key, deduplicate
    data = ([{"k": 0, "i": i} for i in range(4000)]
            + [{"k": j, "i": 4000 + j} for j in range(1, 11)])
    results, _, _ = Flow(
        iterable_loader(data, name="t", row_ids=True),
        set_primary_key(["k"]),
        deduplicate(salt_buckets=8),
    ).results()
    rows = sorted(results[0], key=lambda r: r["k"])
    assert len(rows) == 11
    assert rows[0]["i"] == 0  # hot key keeps its first occurrence
    assert [r["i"] for r in rows[1:]] == [4000 + j for j in range(1, 11)]


def test_duplicate_position_and_to_end():
    """Port of reference test_duplicate / test_duplicate_to_end: the
    copy emits right after its source unless duplicate_to_end."""
    from dataflows_ray import Flow, iterable_loader, duplicate
    a = [{"x": 1}]
    b = [{"y": 2}]
    res, pkg, _ = Flow(
        iterable_loader(a, name="a"),
        iterable_loader(b, name="b"),
        duplicate("a", "a_copy"),
    ).results()
    assert pkg.resource_names() == ["a", "a_copy", "b"]
    assert res == [[{"x": 1}], [{"x": 1}], [{"y": 2}]]
    res, pkg, _ = Flow(
        iterable_loader(a, name="a"),
        iterable_loader(b, name="b"),
        duplicate("a", "a_copy", duplicate_to_end=True),
    ).results()
    assert pkg.resource_names() == ["a", "b", "a_copy"]
    assert res == [[{"x": 1}], [{"y": 2}], [{"x": 1}]]


def test_sources_iterables_previous():
    """Port of reference test_sources_iterables_previous: sources()
    appends its iterables AFTER resources already in the stream."""
    from dataflows_ray import Flow, sources
    previous = [[dict(x=a, y=i) for i in range(3)] for a in ["d", "e", "f"]]
    iterables = [[dict(x=a, y=i) for i in range(3)] for a in ["a", "b", "c"]]
    res, pkg, _ = Flow(*previous, sources(*iterables)).results()
    assert len(pkg.resource_names()) == 6
    assert res == previous + iterables
