"""Strict driver-simulation: run every queries() entry with an
oracle_sql() twin at a given sf dir and compare DTYPE-EXACT canonical
bytes — columns sorted by name, rows sorted by all columns, values
hashed from the pandas string repr AND dtypes compared directly.

Round-1 lesson: the driver's value hash is byte-sensitive, so an
int64 (Ray) vs int128/HUGEINT (DuckDB ``sum()``) mismatch fails the
hash even when values are equal.  tests/test_queries_oracle.py uses
``check_dtype=False``; this script is the strict twin that catches
exactly that class of bug before the driver does.

Usage: python scripts/driver_check.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    # Deterministic, dtype-sensitive: dtype names + csv of values with
    # full float repr.  Mirrors the driver's "different bytes → fail".
    h = hashlib.sha256()
    h.update(",".join(f"{c}:{df[c].dtype}" for c in df.columns).encode())
    h.update(df.to_csv(index=False, float_format="%.17g").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        # RAY_GRAFT_CPUS lets the check run at DIFFERENT parallelism
        # levels — different block/batch groupings expose any remaining
        # summation-order sensitivity (the tpch_q9 half-cent class)
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = _duck(sf_dir)
    bad = []
    for name in qs:
        if name not in oracles:
            continue
        got = _canon(_to_df(qs[name](sf_dir)))
        want = _canon(con.sql(oracles[name]).df())
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    status.append(f"dtype[{c}] {got[c].dtype} != {want[c].dtype}")
            gh, wh = _value_hash(got), _value_hash(want)
            if gh != wh:
                status.append(f"hash {gh} != {wh}")
        tag = "OK " if not status else "FAIL"
        print(f"{tag} {name}" + ("" if not status else "  " + "; ".join(status)))
        if status:
            bad.append(name)
    print(f"\n{len(oracles) - len(bad)}/{len(oracles)} strict-green"
          + (f"; FAILING: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
