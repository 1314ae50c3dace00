"""Big-lake strict oracle check (the SCALE.md protocol): run a
queries() entry AND its DuckDB oracle on a large synthetic lake and
compare dtype-exact canonical hashes — the check that catches
1-in-millions rounding-boundary splits a 10k-row test cannot.

Usage: python scripts/check_biglake.py LAKE_DIR q1 q2 ...
LAKE_DIR holds {table}.parquet files OR {table}.parquet/ directories
of part files (both engine readers and the DuckDB views handle both).
Tables absent from LAKE_DIR are registered as empty views of the
sf0.001 schema so unrelated references still bind.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(lake_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(lake_dir, f"{t}.parquet")
        if os.path.isdir(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        else:
            small = os.path.join("/root/testdata/sf0.001", f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{small}') WHERE 1=0"
            )
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    return pd.DataFrame(result)


def _canon(df: pd.DataFrame) -> tuple:
    import hashlib

    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    h.update(repr(list(df.dtypes)).encode())
    h.update(df.to_csv(index=False, float_format="%.10g").encode())
    return len(df), list(df.columns), h.hexdigest()


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lake_dir, names = sys.argv[1], sys.argv[2:]
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    con = _duck(lake_dir)
    bad = 0
    for name in names:
        t0 = time.time()
        a = _canon(_to_df(QUERIES[name](lake_dir)))
        t1 = time.time()
        if name in ORACLES:
            b = _canon(con.execute(ORACLES[name]).fetchdf())
            t2 = time.time()
            ok = a == b
            bad += not ok
            print(
                f"{'OK ' if ok else 'FAIL'} {name}: engine {t1 - t0:.1f}s "
                f"({a[0]} rows) oracle {t2 - t1:.1f}s ({b[0]} rows)"
                + ("" if ok else f"  engine={a}  oracle={b}")
            )
        else:
            print(f"ROWS {name}: engine {t1 - t0:.1f}s ({a[0]} rows, no oracle)")
    ray.shutdown()
    print(f"{len(names) - bad}/{len(names)} green")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
