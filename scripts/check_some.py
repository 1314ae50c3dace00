"""Strict dtype-exact oracle check for a SUBSET of queries.

Usage: python scripts/check_some.py sf_dir q1 q2 ...
Same canonicalization as scripts/driver_check.py, for fast iteration
on individual queries.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir, names = sys.argv[1], sys.argv[2:]
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            log_to_driver=False,
        )
    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    def to_df(result) -> pd.DataFrame:
        if isinstance(result, pa.Table):
            return result.to_pandas()
        if hasattr(result, "to_pandas") and not isinstance(result, pd.DataFrame):
            return result.to_pandas()
        return result

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    bad = []
    for name in names:
        a = canon(to_df(QUERIES[name](sf_dir)))
        b = canon(con.execute(ORACLES[name]).df())
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            print(f"OK  {name}")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            bad.append(name)
    ray.shutdown()
    print(f"{len(names) - len(bad)}/{len(names)} green" + (f"; BAD={bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
