"""Pins for the sequential/graph batch: RANGE-frame window peers,
gaps-and-islands streaks, the CUSUM closed form against a hand fold,
attribution lookback boundaries, and BFS distributed-vs-local parity
(including the hop cap)."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import pdf_extractor_ray.pipelines.queries as q


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, ts, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))


def test_user_streaks_islands(tmp_path):
    d0 = dt.datetime(2025, 1, 1, 12)
    day = dt.timedelta(days=1)
    rows = []
    # user 1: days 0,1,2 then 5,6 → max streak 3, 5 active days
    for i, dd in enumerate([0, 1, 2, 5, 6]):
        rows.append((i, 1, d0 + dd * day, "view", 1.0))
    # two events the same day must not break the streak
    rows.append((90, 1, d0 + 1 * day + dt.timedelta(hours=3), "view", 1.0))
    # user 2: one day only
    rows.append((91, 2, d0, "view", 1.0))
    _write_events(tmp_path, rows)
    got = q.q_user_streaks(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "n_active_days"] == 5
    assert got.loc[1, "max_streak"] == 3
    assert got.loc[2, "max_streak"] == 1


def test_cusum_matches_hand_fold(tmp_path):
    d0 = dt.datetime(2025, 3, 1)
    vals = [50.0, 120.0, 80.0, 5.0, 90.0, 200.0, 10.0, 150.0, 130.0, 1.0]
    rows = [
        (i, 7, d0 + dt.timedelta(minutes=i), "purchase", v)
        for i, v in enumerate(vals)
    ]
    _write_events(tmp_path, rows)
    got = q.q_cusum_flags(str(tmp_path)).to_pandas().iloc[0]

    # literal reset-free CUSUM fold with upward-crossing alarms
    s = 0
    prev = 0
    alarms = 0
    max_s = 0
    for v in vals:
        s = max(0, s + int(round(v * 100)) - q._CUSUM_K_CENTS)
        if s > q._CUSUM_H_CENTS and prev <= q._CUSUM_H_CENTS:
            alarms += 1
        prev = s
        max_s = max(max_s, s)
    assert got["n_alarms"] == alarms
    assert got["max_s_cents"] == max_s
    assert alarms >= 1  # the fixture actually crosses


def test_attribution_lookback_boundary(tmp_path):
    d0 = dt.datetime(2025, 5, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: click then purchase 2h later → attributed, lag 2h
        (0, 1, d0, "click", 0.0),
        (1, 1, d0 + 2 * h, "purchase", 10.0),
        # user 1: second purchase 8 days after the click → NOT attributed
        (2, 1, d0 + dt.timedelta(days=8), "purchase", 10.0),
        # user 2: purchase with no click ever → not attributed
        (3, 2, d0, "purchase", 5.0),
        # user 3: click exactly 7 days before purchase → attributed (<=)
        (4, 3, d0, "click", 0.0),
        (5, 3, d0 + dt.timedelta(days=7), "purchase", 1.0),
    ]
    _write_events(tmp_path, rows)
    got = q.q_attribution(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "n_purchases"] == 2 and got.loc[1, "n_attributed"] == 1
    assert got.loc[1, "sum_lag_us"] == 2 * 3_600_000_000
    assert got.loc[2, "n_attributed"] == 0
    assert got.loc[3, "n_attributed"] == 1
    assert got.loc[3, "sum_lag_us"] == 7 * 86_400_000_000


def test_range_window_peers_in_frame(tmp_path):
    # two events at the SAME timestamp must both be in each other's
    # frame (RANGE semantics), plus one 2h earlier outside the frame
    d0 = dt.datetime(2025, 6, 1)
    rows = [
        (0, 1, d0, "view", 10.0),
        (1, 1, d0 + dt.timedelta(hours=2), "view", 20.0),
        (2, 1, d0 + dt.timedelta(hours=2), "view", 30.0),
    ]
    _write_events(tmp_path, rows)
    got = (
        q.q_range_window(str(tmp_path)).to_pandas().set_index("event_id").sort_index()
    )
    assert got.loc[0, "n_1h"] == 1
    # both ts-peers see each other regardless of event_id order
    assert got.loc[1, "n_1h"] == 2 and got.loc[2, "n_1h"] == 2
    assert got.loc[1, "sum_cents_1h"] == 5000 and got.loc[2, "sum_cents_1h"] == 5000


def _write_lineitem_graph(tmp_path, edges):
    """edges: list of (suppkey, partkey) with quantity=1 (graph edges);
    one decoy row with quantity=2 that must be filtered out."""
    rows = edges + [(999, 999, 2.0)]
    t = pa.table(
        {
            "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_quantity": pa.array(
                [r[2] if len(r) > 2 else 1.0 for r in rows], pa.float64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))


def test_bfs_distributed_matches_local_and_caps(tmp_path):
    # bipartite chain s1-p1-s2-p2-...: hop(s_k)=2(k-1), hop(p_k)=2k-1.
    # 4 suppliers → deepest nodes sit at hops 7/8, PAST a cap of 4, so
    # both paths (and the oracle) must truncate identically.  The cap
    # is lowered to 4 here because the distributed path pays two
    # exchanges per round — the semantics under test (parity + cap
    # truncation + island exclusion) are depth-independent.
    cap = 4
    edges = []
    for k in range(1, 5):
        edges.append((k, k))      # s_k - p_k
        edges.append((k + 1, k))  # p_k - s_{k+1}
    # disconnected island: must not appear at all
    edges.append((500, 500))
    _write_lineitem_graph(tmp_path, edges)

    local = q.q_bfs_hops(str(tmp_path), max_hops=cap).to_pandas().sort_values("node")
    dist = (
        q.q_bfs_hops(str(tmp_path), local_max_bytes=0, max_hops=cap)
        .to_pandas()
        .sort_values("node")
    )
    assert local["node"].tolist() == dist["node"].tolist()
    assert local["hops"].tolist() == dist["hops"].tolist()
    assert local["hops"].max() == cap  # cap actually bites
    assert 500 not in set(local["node"])
    assert 500 + q._GRAPH_PART_OFFSET not in set(local["node"])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet('%s')"
        % str(tmp_path / "lineitem.parquet")
    )
    exp = con.execute(q._SQL_BFS_TMPL.format(h=cap)).df().sort_values("node")
    con.close()
    assert local["node"].tolist() == exp["node"].tolist()
    assert local["hops"].tolist() == exp["hops"].tolist()
