"""Edge-semantics pins for the round-3 closing operator batch, on
adversarial micro-fixtures (the sf lakes never hit these paths):
posting-list capping, argmax ties, the LEFT-JOIN zero bucket — each
verified against the SAME DuckDB oracle SQL the driver runs, so the
pin covers both engines' handling of the edge, not just ours."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _check(name: str, sf_dir: str, tables: dict[str, pa.Table]) -> pd.DataFrame:
    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    got = QUERIES[name](sf_dir)
    got = got.to_pandas() if isinstance(got, pa.Table) else got
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    exp = con.execute(ORACLES[name]).fetchdf()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=True)
    return got


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_caps_postings(tmp_path):
    # 30 docs share the term "common" (> cap=20); "rare" sits in 3 docs
    # (< min_df=5) and must be filtered out entirely.
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(30)), pa.int64()),
            "text": pa.array(
                ["common " + ("rare " if i < 3 else "") for i in range(30)],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 30, pa.string()),
            "source": pa.array(["s0"] * 30, pa.string()),
            "n_chars": pa.array([10] * 30, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = _check("inverted_index", str(tmp_path), {"documents": docs})
    row = got[got["term"] == "common"].iloc[0]
    assert row["df"] == 30
    assert row["postings"] == ",".join(str(i) for i in range(20))
    assert "rare" not in set(got["term"])


@pytest.mark.usefixtures("ray_session")
def test_tpch_q15_returns_all_tied_winners(tmp_path):
    # two suppliers with bit-identical quarter revenue must BOTH win
    li = pa.table(
        {
            "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([100.0, 100.0, 50.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
            "l_shipdate": pa.array(
                [dt.datetime(1996, 2, 1)] * 3, pa.timestamp("us")
            ),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["a", "b", "c"], pa.string()),
            "s_nationkey": pa.array([0, 0, 0], pa.int32()),
            "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(supp, str(tmp_path / "supplier.parquet"))
    got = _check("tpch_q15", str(tmp_path), {"lineitem": li, "supplier": supp})
    assert sorted(got["s_suppkey"]) == [1, 2]


@pytest.mark.usefixtures("ray_session")
def test_tpch_q13_counts_customers_without_orders(tmp_path):
    # customer 3 has no orders → the c_count=0 bucket (from parquet
    # metadata, never a customer scan) must report it
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["x", "y", "z"], pa.string()),
            "c_nationkey": pa.array([0, 0, 0], pa.int32()),
            "c_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
            "c_mktsegment": pa.array(["A", "A", "A"], pa.string()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 12], pa.int64()),
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = _check("tpch_q13", str(tmp_path), {"customer": cust, "orders": orders})
    by_count = dict(zip(got["c_count"], got["custdist"]))
    assert by_count == {2: 1, 1: 1, 0: 1}


@pytest.mark.usefixtures("ray_session")
def test_tpch_join_exchange_path_matches_broadcast(monkeypatch):
    # GRAFT_JOIN_BROADCAST_MAX=0 forces the reduce-side double
    # exchange; both regimes must agree with the DuckDB oracle on the
    # real sf0.001 lake (the broadcast path is what the sf lakes take
    # by default, so without this pin the exchange path never runs).
    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("nation", "customer", "supplier", "part", "orders", "lineitem", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    for name in ("tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q16", "outer_join"):
        exp = _canon(con.execute(ORACLES[name]).fetchdf())
        monkeypatch.delenv("GRAFT_JOIN_BROADCAST_MAX", raising=False)
        bcast = QUERIES[name](sf_dir)
        bcast = bcast.to_pandas() if not isinstance(bcast, pd.DataFrame) else bcast
        monkeypatch.setenv("GRAFT_JOIN_BROADCAST_MAX", "0")
        exch = QUERIES[name](sf_dir)
        exch = exch.to_pandas() if not isinstance(exch, pd.DataFrame) else exch
        pd.testing.assert_frame_equal(_canon(bcast), exp, check_dtype=True)
        pd.testing.assert_frame_equal(_canon(exch), exp, check_dtype=True)
