"""Pins for the stats/sequence batch: Mann-Whitney tie averaging against
scipy-free hand math, LOCF fill boundaries (pre-first-obs spine start,
same-day tie to max event_id), session entry/exit on single-event
sessions, trailing-spike frame edges, and RFM tie-stable quintiles vs
the DuckDB oracle."""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import pdf_extractor_ray.pipelines.queries as q


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, ts, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))


def _oracle(tmp_path, sql, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s')"
            % (t, str(tmp_path / (t + ".parquet")))
        )
    df = con.execute(sql).df()
    con.close()
    return df


def test_mann_whitney_hand_case(tmp_path):
    # src0 lengths {3,5,5}, src1 lengths {5,8}.
    # sorted: 3(r1) 5 5 5 (avg rank 3) 8(r5)
    # R_a = 1 + 3 + 3 = 7 → ×2 = 14; U_a×2 = 14 - 3·4 = 2
    rows = [
        (1, "aaa", "en", "src0"),
        (2, "bbbbb", "en", "src0"),
        (3, "ccccc", "en", "src0"),
        (4, "ddddd", "en", "src1"),
        (5, "eeeeeeee", "en", "src1"),
        (6, "zzzz", "en", "src9"),  # excluded source
    ]
    _write_docs(tmp_path, rows)
    got = q.q_mann_whitney(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_a"] == 3 and got["n_b"] == 2
    assert got["r_a_x2"] == 14 and got["u_a_x2"] == 2


def test_spearman_perfect_and_tied(tmp_path):
    # en: monotone (n_chars up ⇒ spaces up) → d = 0 everywhere
    rows = [
        (1, "a b", "en", "src0"),          # 3 chars, 1 space
        (2, "aa b c", "en", "src0"),       # 6 chars, 2 spaces
        (3, "aaa bb cc d", "en", "src0"),  # 11 chars, 3 spaces
    ]
    _write_docs(tmp_path, rows)
    got = q.q_spearman_x4(str(tmp_path)).to_pandas().set_index("lang")
    assert got.loc["en", "n"] == 3
    assert got.loc["en", "sum_d2_x4"] == 0


def test_locf_boundaries_and_tie(tmp_path):
    d0 = dt.datetime(2025, 1, 1, 9)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: purchases on day 0 (two, tie → event_id 11 wins), day 3
        (10, 1, d0, "purchase", 5.00),
        (11, 1, d0 + dt.timedelta(hours=2), "purchase", 7.25),
        (12, 1, d0 + 3 * day, "purchase", 9.00),
        # a view must not contribute observations
        (13, 1, d0 + 1 * day, "view", 99.0),
    ]
    _write_events(tmp_path, rows)
    got = (
        q.q_locf_fill(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    assert got["cents"].tolist() == [725, 725, 725, 900]
    assert (got["day"].diff().dropna() == 1).all()
    exp = _oracle(tmp_path, q.SQL_LOCF_FILL).sort_values(["user_id", "day"])
    assert got["cents"].tolist() == exp["cents"].tolist()


def test_session_paths_singleton_and_multi(tmp_path):
    d0 = dt.datetime(2025, 1, 1, 9)
    rows = [
        # session 1: view → click → purchase (entry view, exit purchase)
        (1, 1, d0, "view", 1.0),
        (2, 1, d0 + dt.timedelta(minutes=5), "click", 1.0),
        (3, 1, d0 + dt.timedelta(minutes=10), "purchase", 1.0),
        # >30 min gap → session 2: single event (entry == exit)
        (4, 1, d0 + dt.timedelta(hours=2), "error", 1.0),
    ]
    _write_events(tmp_path, rows)
    got = q.q_session_paths(str(tmp_path)).to_pandas()
    m = {(r.entry_type, r.exit_type): r.n_sessions for r in got.itertuples()}
    assert m == {("view", "purchase"): 1, ("error", "error"): 1}


def test_trailing_spike_frame_edges(tmp_path):
    d0 = dt.datetime(2025, 1, 1)
    # values: first event never a spike (k=0); 30 > 2*mean(10,10)? 30>20 yes
    vals = [10.0, 10.0, 30.0, 10.0]
    rows = [
        (i, 1, d0 + dt.timedelta(minutes=i), "view", v) for i, v in enumerate(vals)
    ]
    _write_events(tmp_path, rows)
    got = q.q_trailing_spike(str(tmp_path)).to_pandas()
    # event 2 (30 vs prev sum 20, k=2: 3000*2 > 2*2000) is the only spike
    assert got.set_index("user_id").loc[1, "n_spikes"] == 1
    exp = _oracle(tmp_path, q.SQL_TRAILING_SPIKE)
    assert got.sort_values("user_id")["n_spikes"].tolist() == exp.sort_values(
        "user_id"
    )["n_spikes"].tolist()


def test_rfm_tie_stable_quintiles(tmp_path):
    d0 = dt.datetime(2025, 1, 1)
    rows = []
    eid = 0
    # 10 users, all same frequency (ties must share one f_q bucket),
    # distinct monetary, staggered recency
    for u in range(10):
        rows.append((eid, u, d0 + dt.timedelta(days=u), "purchase", 10.0 + u))
        eid += 1
    _write_events(tmp_path, rows)
    got = q.q_rfm_scores(str(tmp_path)).to_pandas().sort_values("user_id")
    assert set(got["f_q"]) == {0}  # all-tied metric → everyone in bucket 0
    assert got["m_q"].tolist() == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    exp = _oracle(tmp_path, q.SQL_RFM_SCORES).sort_values("user_id")
    for c in ("recency_days", "freq", "cents", "r_q", "f_q", "m_q"):
        assert got[c].tolist() == exp[c].tolist(), c

    # force the DISTRIBUTED value-binned-exchange path (the 100-TB
    # shape) — identical table required
    dist = (
        q.q_rfm_scores(str(tmp_path), local_max_bytes=0)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert dist.equals(got.reset_index(drop=True))


def test_rfm_no_purchases(tmp_path):
    """A lake with zero purchase events must yield an empty typed
    table, not crash on max() of an empty aggregate."""
    d0 = dt.datetime(2025, 1, 1)
    _write_events(tmp_path, [(0, 1, d0, "view", 1.0)])
    got = q.q_rfm_scores(str(tmp_path))
    assert got.num_rows == 0
    assert got.column_names == [
        "user_id", "recency_days", "freq", "cents", "r_q", "f_q", "m_q",
    ]


def test_kaplan_meier_at_risk_monotone(tmp_path):
    d0 = dt.datetime(2025, 1, 1)
    day = dt.timedelta(days=1)
    rows = [
        (1, 1, d0, "view", 1.0),
        (2, 1, d0 + 2 * day, "view", 1.0),  # user 1 lifespan 2
        (3, 2, d0, "view", 1.0),            # user 2 lifespan 0
        (4, 3, d0, "view", 1.0),
        (5, 3, d0 + 2 * day, "view", 1.0),  # user 3 lifespan 2
    ]
    _write_events(tmp_path, rows)
    got = q.q_kaplan_meier(str(tmp_path)).to_pandas().sort_values("d")
    assert got["d"].tolist() == [0, 2]
    assert got["at_risk"].tolist() == [3, 2]
    assert got["churned"].tolist() == [1, 2]
