"""Single-threaded row-generator proxy of the reference's execution model.

The reference (datahq/dataflows) cannot run in this container (its
dependency tree — datapackage/tabulator/tableschema — is not installed
and there is no network), so this measures the EXECUTION MODEL it uses:
one CPython thread, dict rows flowing through a generator chain, the same
q01 pipeline (filter -> derive -> group-by aggregate). This is the
reference's best case — it excludes the reference's own per-row schema
cast and KVFile overheads, so real dataflows would be slower.

Run: python scripts/row_model_baseline.py [sf_dir]
"""

import sys
import time

import numpy as np
import pyarrow.parquet as pq

CUT = np.datetime64("1998-09-02", "us")


def row_iter(table):
    for batch in table.to_batches():
        yield from batch.to_pylist()


def filter_rows(rows):
    cut = CUT.astype("datetime64[us]").item()
    for row in rows:
        if row["l_shipdate"] <= cut:
            yield row


def derive(rows):
    for row in rows:
        row["disc_price"] = row["l_extendedprice"] * (1 - row["l_discount"])
        yield row


def aggregate(rows):
    groups = {}
    for row in rows:
        key = (row["l_returnflag"], row["l_linestatus"])
        g = groups.get(key)
        if g is None:
            g = groups[key] = {"sum_qty": 0.0, "sum_base_price": 0.0,
                               "sum_disc_price": 0.0, "sum_disc": 0.0,
                               "n": 0}
        g["sum_qty"] += row["l_quantity"]
        g["sum_base_price"] += row["l_extendedprice"]
        g["sum_disc_price"] += row["disc_price"]
        g["sum_disc"] += row["l_discount"]
        g["n"] += 1
    out = []
    for (rf, ls), g in groups.items():
        out.append({"l_returnflag": rf, "l_linestatus": ls,
                    "sum_qty": round(g["sum_qty"], 2),
                    "sum_base_price": round(g["sum_base_price"], 2),
                    "sum_disc_price": round(g["sum_disc_price"], 2),
                    "avg_disc": round(g["sum_disc"] / g["n"], 4),
                    "count_order": g["n"]})
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet",
                        columns=["l_returnflag", "l_linestatus", "l_quantity",
                                 "l_extendedprice", "l_discount",
                                 "l_shipdate"])
    t0 = time.time()
    result = aggregate(derive(filter_rows(row_iter(tbl))))
    dt = time.time() - t0
    print(f"rows={len(tbl)} groups={len(result)} "
          f"wall={dt:.2f}s rows_per_sec={len(tbl)/dt:,.0f}")


if __name__ == "__main__":
    main()
