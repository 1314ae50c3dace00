"""Scaled TPC-H-ish replica lake for big-lake strict checks of the
join/money family (the SCALE.md protocol, like the events lake):
N key-offset replicas of the sf0.1 orders/customer/lineitem tables —
key spaces shifted per replica so joins stay consistent and row
counts scale exactly N×.

Usage: python scripts/make_tpch_lake.py OUT_DIR [N]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000  # far above any sf0.1 key


def _offset(table: pa.Table, col: str, r: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    vals = table.column(col).to_numpy(zero_copy_only=False) + r * KEY_STRIDE
    return table.set_column(i, col, pa.array(vals, table.schema.field(col).type))


def main() -> None:
    out, n = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    # nation/region are dimension constants: copy once, keys unshifted
    # (customer/supplier nationkeys keep referencing them)
    for name in ("nation", "region"):
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{name}.parquet")),
            os.path.join(out, f"{name}.parquet"),
        )
        print(name, "copied")
    for name, keys in (
        ("orders", ["o_orderkey", "o_custkey"]),
        ("customer", ["c_custkey"]),
        ("part", ["p_partkey"]),
        ("supplier", ["s_suppkey"]),
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ):
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        reps = []
        for r in range(n):
            t = src
            for k in keys:
                t = _offset(t, k, r)
            reps.append(t)
        big = pa.concat_tables(reps)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"))
        print(name, big.num_rows, "rows")


if __name__ == "__main__":
    main()
