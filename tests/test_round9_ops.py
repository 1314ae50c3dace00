"""Pins for the drift/evaluation-stat batch: rank-sum AUC (tie-aware
histogram construction vs a hand-computed Mann-Whitney value and vs
the DuckDB window-rank formulation), PSI Laplace smoothing, and JS
divergence bounds + zero-lang convention."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES


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


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
        % str(tmp_path / "documents.parquet")
    )
    df = con.execute(sql).df()
    con.close()
    return df


@pytest.mark.usefixtures("ray_session")
def test_auc_hand_derived_with_ties(tmp_path):
    # scores (n_chars) by text length; 'en' = positive.
    # pos lengths: 5, 3, 3   neg lengths: 3, 2, 1
    # Pairs (pos, neg): 9 total.  pos=5 beats 3,2,1 -> 3 wins.
    # pos=3 vs neg 3 -> tie (0.5); vs 2,1 -> 2 wins.  Twice.
    # AUC = (3 + 2.5 + 2.5) / 9 = 8/9
    rows = [
        (1, "aaaaa", "en", "s1"),
        (2, "bbb", "en", "s1"),
        (3, "ccc", "en", "s2"),
        (4, "ddd", "fr", "s2"),
        (5, "ee", "fr", "s1"),
        (6, "f", "fr", "s2"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["auc_ranksum"](str(tmp_path)).to_pandas()
    assert got.shape == (1, 3)
    assert int(got["n_pos"][0]) == 3 and int(got["n_neg"][0]) == 3
    assert got["auc"][0] == pytest.approx(8.0 / 9.0, abs=1e-6)
    want = _oracle(tmp_path, ORACLES["auc_ranksum"])
    assert want["auc"][0] == pytest.approx(got["auc"][0], abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_auc_single_class_is_empty(tmp_path):
    _write_docs(tmp_path, [(1, "aaa", "en", "s1"), (2, "bb", "en", "s1")])
    got = QUERIES["auc_ranksum"](str(tmp_path)).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["n_pos", "n_neg", "auc"]
    assert len(_oracle(tmp_path, ORACLES["auc_ranksum"])) == 0


@pytest.mark.usefixtures("ray_session")
def test_psi_identical_sources_near_zero(tmp_path):
    # Same length histogram in both sources -> smoothed PSI exactly 0.
    rows = []
    for i, ln in enumerate([10, 20, 30, 10, 20, 30]):
        rows.append((i, "x" * ln, "en", "sA"))
        rows.append((100 + i, "y" * ln, "fr", "sB"))
    _write_docs(tmp_path, rows)
    got = QUERIES["psi_drift"](str(tmp_path)).to_pandas()
    assert got.shape == (1, 5)
    assert {got["s1"][0], got["s2"][0]} == {"sA", "sB"}
    assert got["psi"][0] == pytest.approx(0.0, abs=1e-9)
    want = _oracle(tmp_path, ORACLES["psi_drift"])
    assert want["psi"][0] == pytest.approx(got["psi"][0], abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_psi_disjoint_bins_positive(tmp_path):
    # sA all short (bin 0), sB all long (bin 4+): PSI >> 0, engine == oracle.
    rows = [(i, "x" * 10, "en", "sA") for i in range(8)]
    rows += [(100 + i, "y" * 230, "fr", "sB") for i in range(8)]
    _write_docs(tmp_path, rows)
    got = QUERIES["psi_drift"](str(tmp_path)).to_pandas()
    want = _oracle(tmp_path, ORACLES["psi_drift"])
    assert got["psi"][0] > 1.0
    assert want["psi"][0] == pytest.approx(got["psi"][0], abs=1e-9)
    # hand value: bins {0, 4}, n=8 each, smoothed p=(8+1)/10 vs (0+1)/10
    term = (0.9 - 0.1) * math.log(0.9 / 0.1)
    assert got["psi"][0] == pytest.approx(2 * term, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_js_bounds_and_zero_lang_convention(tmp_path):
    # Disjoint language mixes -> JS = ln 2 exactly (both sides all-zero
    # overlap); one lang present in only one source exercises the
    # 0*ln(0/m)=0 convention.
    rows = [(i, "xxxx", "en", "sA") for i in range(6)]
    rows += [(100 + i, "yyyy", "zh", "sB") for i in range(6)]
    _write_docs(tmp_path, rows)
    got = QUERIES["js_divergence"](str(tmp_path)).to_pandas()
    assert got["js"][0] == pytest.approx(math.log(2.0), abs=1e-6)
    want = _oracle(tmp_path, ORACLES["js_divergence"])
    assert want["js"][0] == pytest.approx(got["js"][0], abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_js_identical_mix_is_zero(tmp_path):
    rows = []
    for i, lg in enumerate(["en", "en", "fr"]):
        rows.append((i, "xxxx", lg, "sA"))
        rows.append((100 + i, "yyyy", lg, "sB"))
    _write_docs(tmp_path, rows)
    got = QUERIES["js_divergence"](str(tmp_path)).to_pandas()
    assert got["js"][0] == pytest.approx(0.0, abs=1e-9)
