"""Driver-style correctness: every queries() entry runs; SQL-backed
entries match their DuckDB oracle (row count, schema names, sorted
values) at sf0.001/sf0.01."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_all_queries_run_and_match_oracles():
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)

    con = _duck(SF_DIR)
    failures = []
    for name, fn in qs.items():
        got = _to_df(fn(SF_DIR))
        assert len(got) >= 0  # runs, returns a frame
        if name not in oracles:
            assert got.shape[0] > 0, f"{name} returned no rows"
            continue
        want = con.sql(oracles[name]).df()
        g, w = _canon(got), _canon(want)
        if list(g.columns) != list(w.columns):
            failures.append(f"{name}: columns {list(g.columns)} != {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(f"{name}: rows {len(g)} != {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-6)
        except AssertionError as e:
            failures.append(f"{name}: values differ: {str(e)[:400]}")
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as entrymod

    t = entrymod.entry()
    df = _to_df(t)
    assert df.shape[0] > 0
    assert {"conv_id", "turn_idx", "unit_id", "extracted_text"} <= set(df.columns)
