"""Pins for the fold/graph/algebra batch: weighted SSSP distributed ≡
local, Holt linear fold hand-derivation, capped running-sum clamp
accounting, anagram-class detection, and exact-recovery OLS on a
planted linear law."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor_ray.pipelines.queries import (
    QUERIES,
    q_sssp_weighted,
)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def _write_docs(tmp_path, rows, n_chars=None):
    """rows: (doc_id, text, lang, source)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    n_chars if n_chars is not None else [len(r[1]) for r in rows],
                    pa.int64(),
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_sssp_distributed_matches_local():
    """Forcing local_max_bytes=0 exercises the per-round exchange
    regime; bounded-round Bellman-Ford must be partitioning-proof."""
    sf = "/root/testdata/sf0.001"
    local = q_sssp_weighted(sf).to_pandas().sort_values("node").reset_index(drop=True)
    dist = (
        q_sssp_weighted(sf, local_max_bytes=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert local.equals(dist)
    assert (local["dist"] >= 0).all()
    assert local["dist"].min() == 0  # the source itself


@pytest.mark.usefixtures("ray_session")
def test_holt_linear_hand_derived(tmp_path):
    """alpha=0.5, beta=0.3 over values 10, 20:
    l1=10, t1=0; l2=.5*20+.5*10=15, t2=.3*5=1.5."""
    _write_events(tmp_path, [(1, 0, 7, 10.0), (2, 1_000_000, 7, 20.0)])
    got = QUERIES["holt_linear"](str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["level"] == 15.0
    assert got.iloc[0]["trend"] == 1.5


@pytest.mark.usefixtures("ray_session")
def test_holt_linear_mega_user_skew(tmp_path):
    """A 20k-event user next to tiny users: the flat-gather fold must
    stay O(total events) and agree with a scalar reference fold."""
    rng = np.random.RandomState(3)
    rows = [(i, i * 1000, 1, float(rng.randint(1, 100))) for i in range(20_000)]
    rows += [(100_000 + j, j, 2 + j // 2, 5.0) for j in range(10)]
    _write_events(tmp_path, rows)
    got = QUERIES["holt_linear"](str(tmp_path)).to_pandas().set_index("user_id")
    # scalar reference for the mega user, identical op order
    vals = [r[3] for r in rows if r[2] == 1]
    l, t = vals[0], 0.0
    for v in vals[1:]:
        ln = 0.5 * v + 0.5 * (l + t)
        t = 0.3 * (ln - l) + 0.7 * t
        l = ln
    assert abs(got.loc[1, "level"] - l) < 1e-6
    assert abs(got.loc[1, "trend"] - t) < 1e-6
    assert len(got) == 6


@pytest.mark.usefixtures("ray_session")
def test_capped_running_sum_clamps(tmp_path):
    """Deltas are value-50: +250, +400 (clamps at 500), -50+... wait:
    values 300, 450, 0 → deltas +250, +400, -50: bal 250 → 500
    (clamped, raw 650) → 450.  One clamp."""
    _write_events(
        tmp_path,
        [(1, 0, 3, 300.0), (2, 1, 3, 450.0), (3, 2, 3, 0.0)],
    )
    got = QUERIES["capped_running_sum"](str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["balance"] == 450.0
    assert got.iloc[0]["n_clamped"] == 1


@pytest.mark.usefixtures("ray_session")
def test_anagram_groups_planted(tmp_path):
    rows = [
        (1, "listen silent enlist stone notes", "en", "s"),
        (2, "tones other words here", "en", "s"),
        (3, "unrelated vocabulary", "de", "s"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["anagram_groups"](str(tmp_path)).to_pandas().set_index("lang")
    # en: {listen,silent,enlist} and {stone,notes,tones} → 2 classes, max 3
    assert got.loc["en", "n_classes"] == 2
    assert got.loc["en", "max_class"] == 3
    assert "de" not in got.index


@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_absorbing_chain(tmp_path):
    """a→b, b→b: all mass drains into the absorbing state b (up to
    the spec'd integer-floor leak)."""
    rows = []
    eid = 0
    for u in range(3):
        for i, et in enumerate(["a", "b", "b", "b"]):
            rows.append((eid, i * 1_000_000, u, et))
            eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["markov_stationary"](str(tmp_path)).to_pandas().set_index("state")
    assert "a" not in got.index  # no edges INTO a → mass 0 after round 1
    assert got.loc["b", "mass"] == 10**9  # 500M (from a) + 500M (from b)


@pytest.mark.usefixtures("ray_session")
def test_group_lcp_planted_prefix(tmp_path):
    rows = [
        (1, "common prefix alpha", "en", "s"),
        (2, "common prefix beta", "en", "s"),
        (3, "common prefab", "en", "s"),
        (4, "zzz", "de", "s"),
        (5, "aaa", "de", "s"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["group_lcp"](str(tmp_path)).to_pandas().set_index("lang")
    assert got.loc["en", "lcp_len"] == len("common pref")
    assert got.loc["de", "lcp_len"] == 0


@pytest.mark.usefixtures("ray_session")
def test_funnel3_strict_ordering(tmp_path):
    """User 1 does view→click→purchase (counts at every stage);
    user 2's click precedes the view (stops at view); user 3 has a
    purchase between view and click (purchase must NOT count)."""
    rows = [
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "purchase"),
        (4, 0, 2, "click"), (5, 1, 2, "view"),
        (6, 0, 3, "view"), (7, 1, 3, "purchase"), (8, 2, 3, "click"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["funnel3_strict"](str(tmp_path)).to_pandas()
    assert got.iloc[0]["n_view"] == 3
    assert got.iloc[0]["n_click"] == 2  # users 1 and 3
    assert got.iloc[0]["n_purchase"] == 1  # only user 1


def _write_event_rows(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_type_runs_islands(tmp_path):
    """a a b a a a → 3 runs, longest 3 ('a'); tie case: a a b b →
    2 runs, longest 2, lexicographic min type 'a'."""
    rows = [(i, i, 1, t) for i, t in enumerate(["a", "a", "b", "a", "a", "a"])]
    rows += [(10 + i, i, 2, t) for i, t in enumerate(["a", "a", "b", "b"])]
    _write_event_rows(tmp_path, rows)
    got = QUERIES["type_runs"](str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "n_runs"] == 3
    assert got.loc[1, "longest_run"] == 3
    assert got.loc[1, "longest_type"] == "a"
    assert got.loc[2, "n_runs"] == 2
    assert got.loc[2, "longest_run"] == 2
    assert got.loc[2, "longest_type"] == "a"


@pytest.mark.usefixtures("ray_session")
def test_multitouch_attribution_window(tmp_path):
    """3 clicks before the purchase, one outside the 7-day window and
    one at exactly t_p (strictly-before excludes it) → k=1... then a
    second purchase sees 2 in-window clicks → weight 500000 ppm."""
    day = 24 * 3600 * 1_000_000
    rows = [
        (1, 0, 5, "click"),            # 9 days before p1 — outside window
        (2, 8 * day, 5, "click"),      # 1 day before p1 — counts
        (3, 9 * day, 5, "purchase"),   # p1: k=1
        (4, 9 * day, 5, "click"),      # at p2-window, before p2
        (5, 10 * day, 5, "purchase"),  # p2: clicks at 8d,9d in (3d,10d) → k=2
    ]
    _write_event_rows(tmp_path, rows)
    got = (
        QUERIES["multitouch_attribution"](str(tmp_path))
        .to_pandas()
        .set_index("event_id")
    )
    assert got.loc[3, "n_touches"] == 1
    assert got.loc[3, "weight_ppm"] == 1_000_000
    assert got.loc[5, "n_touches"] == 2
    assert got.loc[5, "weight_ppm"] == 500_000


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_threshold(tmp_path):
    """400 events total → threshold 2; user 1 has 3 events (in),
    user 2 has 1 (out), filler users have 2 each (boundary — in)."""
    rows = [(i, i, 1, "view") for i in range(3)]
    rows.append((3, 3, 2, "view"))
    rows += [(4 + i, 4 + i, 10 + i // 2, "view") for i in range(396)]
    _write_event_rows(tmp_path, rows)
    got = QUERIES["heavy_hitters_exact"](str(tmp_path)).to_pandas()
    got = got.set_index("user_id")
    assert 1 in got.index and got.loc[1, "n_events"] == 3
    assert 2 not in got.index
    assert (got.drop(index=1)["n_events"] == 2).all()


@pytest.mark.usefixtures("ray_session")
def test_topk_join_hierarchy(tmp_path):
    """One dominant user with 4 active days keeps only its best 3."""
    day = 24 * 3600 * 1_000_000
    rows, vals = [], []
    for d in range(4):  # user 1: day spends 10, 20, 30, 40
        rows.append((d, d * day, 1, "view"))
        vals.append(10.0 * (d + 1))
    rows.append((10, 0, 2, "view"))
    vals.append(1.0)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["topk_join"](str(tmp_path)).to_pandas()
    u1 = got[got["user_id"] == 1].sort_values("day_cents", ascending=False)
    assert len(u1) == 3  # best 3 of 4 days
    assert u1["day_cents"].tolist() == [4000, 3000, 2000]
    assert (u1["total_cents"] == 10000).all()
    assert got[got["user_id"] == 2]["day_cents"].tolist() == [100]


@pytest.mark.usefixtures("ray_session")
def test_type_jaccard_planted_overlap(tmp_path):
    """Users 1,2 do both a and b; user 3 only a; user 4 only b →
    J(a,b) = 2/4 = 500000 ppm."""
    rows = [
        (1, 0, 1, "a"), (2, 1, 1, "b"),
        (3, 0, 2, "a"), (4, 1, 2, "b"),
        (5, 0, 3, "a"), (6, 0, 4, "b"),
    ]
    _write_event_rows(tmp_path, rows)
    got = QUERIES["type_jaccard"](str(tmp_path)).to_pandas()
    r = got[(got["type_a"] == "a") & (got["type_b"] == "b")].iloc[0]
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["n_both"] == 2
    assert r["jaccard_ppm"] == 500_000


@pytest.mark.usefixtures("ray_session")
def test_char_trigrams_planted(tmp_path):
    """'aaaa' yields trigram 'aaa' twice; doc boundaries must not
    create cross-doc trigrams ('xyz'+'zyx' share no window)."""
    rows = [
        (1, "aaaa", "en", "s"),
        (2, "xyz", "en", "s"),
        (3, "zyx", "en", "s"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["char_trigrams"](str(tmp_path)).to_pandas()
    en = got[got["lang"] == "en"].set_index("trigram")["cnt"]
    assert en["aaa"] == 2
    assert en["xyz"] == 1 and en["zyx"] == 1
    assert "yzz" not in en.index and "zzy" not in en.index  # no cross-doc windows


@pytest.mark.usefixtures("ray_session")
def test_cohort_ltv_planted(tmp_path):
    """User 1 first seen week 0, spends 100 then 200 a week later;
    user 2 first seen week 1, spends 50 → cohorts (0, age0)=100,
    (0, age1)=200, (1, age0)=50."""
    wk = 7 * 24 * 3600 * 1_000_000
    rows = [(1, 0, 1, 1.0), (2, wk, 1, 2.0), (3, wk, 2, 0.5)]
    _write_events(tmp_path, rows)
    got = (
        QUERIES["cohort_ltv"](str(tmp_path))
        .to_pandas()
        .set_index(["cohort_week", "age"])
    )
    assert got.loc[(0, 0), "cents"] == 100 and got.loc[(0, 0), "n_users"] == 1
    assert got.loc[(0, 1), "cents"] == 200
    assert got.loc[(1, 0), "cents"] == 50
    assert len(got) == 3


@pytest.mark.usefixtures("ray_session")
def test_sample_apportion_largest_remainder(tmp_path):
    """Token masses 1:1:1 over 3 langs with budget 1,000,000 →
    333,333 each + 1 leftover seat to the lexicographically first
    lang (all remainders tie)."""
    rows = [
        (1, "a b c d", "de", "s"),
        (2, "a b c d", "en", "s"),
        (3, "a b c d", "fr", "s"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["sample_apportion"](str(tmp_path)).to_pandas().set_index("lang")
    assert got["quota"].sum() == 1_000_000
    assert got.loc["de", "quota"] == 333_334  # tie → lang ASC gets the seat
    assert got.loc["en", "quota"] == 333_333
    assert got.loc["fr", "quota"] == 333_333


@pytest.mark.usefixtures("ray_session")
def test_source_shingle_overlap_planted(tmp_path):
    """Two sources share exactly one 8-word shingle; the third
    source shares none."""
    shared = "one two three four five six seven eight"
    rows = [
        (1, shared + " tail-a", "en", "srcA"),
        (2, "head-b " + shared, "en", "srcB"),
        (3, "totally different words that never overlap anything here", "en", "srcC"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["source_shingle_overlap"](str(tmp_path)).to_pandas()
    got = got.set_index(["source_a", "source_b"])
    assert got.loc[("srcA", "srcB"), "n_shared"] == 1
    assert ("srcA", "srcC") not in got.index
    assert ("srcB", "srcC") not in got.index


@pytest.mark.usefixtures("ray_session")
def test_burstiness_hand_derived(tmp_path):
    """2 events in hour 0 and 2 in hour 2 (span 3): fano = 2/3.
    A single-hour user has zero variance → fano 0."""
    hr = 3600 * 1_000_000
    rows = [
        (1, 0, 1, "view"), (2, 1, 1, "view"),
        (3, 2 * hr, 1, "view"), (4, 2 * hr + 1, 1, "view"),
        (5, 0, 2, "view"), (6, 1, 2, "view"),
    ]
    _write_event_rows(tmp_path, rows)
    got = QUERIES["burstiness"](str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "span_hours"] == 3
    assert abs(got.loc[1, "fano"] - 2 / 3) < 1e-6
    assert got.loc[2, "fano"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_ols_multi_recovers_planted_law(tmp_path):
    """n_chars = 7 + 3·wc + 2·vowels exactly → betas recovered, r2=1."""
    rng = np.random.RandomState(11)
    rows, ys = [], []
    for i in range(30):
        nw = int(rng.randint(1, 12))
        words = []
        for _ in range(nw):
            n = int(rng.randint(2, 9))
            words.append(
                "".join(rng.choice(list("abcdefgiou"), size=n))
            )
        text = " ".join(words)
        wc = len(text.split(" "))
        vw = sum(text.count(c) for c in "aeiou")
        rows.append((i, text, "en", "s"))
        ys.append(7 + 3 * wc + 2 * vw)
    _write_docs(tmp_path, rows, n_chars=ys)
    got = QUERIES["ols_multi"](str(tmp_path)).to_pandas()
    assert got.iloc[0]["n_docs"] == 30
    assert abs(got.iloc[0]["beta0"] - 7.0) < 1e-4
    assert abs(got.iloc[0]["beta1"] - 3.0) < 1e-4
    assert abs(got.iloc[0]["beta2"] - 2.0) < 1e-4
    assert abs(got.iloc[0]["r2"] - 1.0) < 1e-9
