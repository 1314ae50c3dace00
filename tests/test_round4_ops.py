"""Pins for the fingerprinting/diagnostics batch: winnowing against an
independent brute-force reference (and the SIGMOD'03 shared-substring
guarantee), PCA moments against numpy's direct covariance eig."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Straight-from-the-paper winnowing, no vectorization: hash every
    k-gram with the base-31 polynomial, slide a w-window, keep the
    rightmost minimum per window, return distinct (1-based pos, hash)."""
    n = len(text)
    if n < k + w - 1:
        return set()
    h = [
        sum(ord(text[i + j]) * 31 ** (k - 1 - j) for j in range(k))
        for i in range(n - k + 1)
    ]
    out = set()
    for s in range(len(h) - w + 1):
        win = h[s : s + w]
        m = min(win)
        pos = s + max(i for i, v in enumerate(win) if v == m)
        out.add((pos + 1, h[pos]))
    return out


@pytest.mark.usefixtures("ray_session")
def test_winnow_matches_brute_force(tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaaaaaa",  # all-equal hashes → tie-break path
        "short",  # below K+W-1 → no fingerprints
        "abcdefghijk",  # exactly K+W-1 → one window
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import _WIN_K, _WIN_W, QUERIES

    got = QUERIES["winnow_fingerprints"](str(tmp_path)).to_pandas()
    for did, t in enumerate(texts):
        g = set(
            zip(
                got[got["doc_id"] == did]["pos"].tolist(),
                got[got["doc_id"] == did]["fp"].tolist(),
            )
        )
        assert g == _brute_winnow(t, _WIN_K, _WIN_W), f"doc {did}"
    # the winnowing guarantee: docs 0 and 4 share a substring of length
    # >= K+W-1, so they MUST share at least one fingerprint hash
    f0 = set(got[got["doc_id"] == 0]["fp"])
    f4 = set(got[got["doc_id"] == 4]["fp"])
    assert f0 & f4


@pytest.mark.usefixtures("ray_session")
def test_embed_pca_matches_numpy_direct():
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["embed_pca"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    ev = np.linalg.eigvalsh(cov)[::-1]
    want_ev = np.round(ev[:2], 6)
    want_ex = np.round(ev[:2] / ev.sum(), 6)
    assert got["component"].tolist() == [1, 2]
    np.testing.assert_allclose(got["eigenvalue"].to_numpy(), want_ev, atol=2e-6)
    np.testing.assert_allclose(got["explained"].to_numpy(), want_ex, atol=2e-6)
    assert (np.diff(got["eigenvalue"].to_numpy()) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_hhi_single_source_is_one(tmp_path):
    # a language drawn entirely from one source must score HHI = 1.0
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["x"] * 4, pa.string()),
            "lang": pa.array(["mono", "mono", "mix", "mix"], pa.string()),
            "source": pa.array(["a", "a", "a", "b"], pa.string()),
            "n_chars": pa.array([1] * 4, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["hhi_concentration"](str(tmp_path)).to_pandas()
    by = dict(zip(got["lang"], got["hhi"]))
    assert by["mono"] == 1.0 and by["mix"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_mi_independent_is_zero(tmp_path):
    # lang ⫫ source (full factorial, equal counts) → MI exactly 0
    langs, sources = ["en", "de"], ["s0", "s1", "s2"]
    rows = [(l, s) for l in langs for s in sources for _ in range(4)]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(rows))), pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([1] * len(rows), pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["lang_source_mi"](str(tmp_path)).to_pandas()
    assert got["n_docs"].iloc[0] == len(rows)
    assert got["mi"].iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_winnow_dup_pairs_flags_planted_pair(tmp_path):
    import duckdb
    import os

    # docs 0/1 share a 200-char block (≫ the 10-shared-fp threshold);
    # docs 2/3 are built from disjoint alphabets → zero shared grams
    shared = "the quick brown fox jumps over the lazy dog " * 5
    texts = [
        shared + " alpha tail one",
        shared + " beta tail two xx",
        "qrstuvwx " * 30,
        "12345678 " * 30,
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    got = QUERIES["winnow_dup_pairs"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('"
        + os.path.join(str(tmp_path), "documents.parquet")
        + "')"
    )
    exp = con.execute(ORACLES["winnow_dup_pairs"]).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=True
    )
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs
    assert not any(2 in p or 3 in p for p in pairs)


@pytest.mark.usefixtures("ray_session")
def test_gini_edge_values(tmp_path):
    # equal lengths → gini exactly 0; an extreme 1-vs-999 split → the
    # closed-form two-doc value (keeps the rank-sum algebra honest)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["x"] * 4, pa.string()),
            "lang": pa.array(["eq", "eq", "sk", "sk"], pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([7, 7, 1, 999], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["gini_by_lang"](str(tmp_path)).to_pandas()
    by = dict(zip(got["lang"], got["gini"]))
    assert by["eq"] == 0.0
    # n=2, values (1, 999): sr = 1*1 + 999*2, t = 1000
    # gini = 2*1999/(2*1000) - 3/2 = 0.499
    assert by["sk"] == round(2.0 * 1999 / 2000 - 1.5, 6)


@pytest.mark.usefixtures("ray_session")
def test_ks_identical_vs_disjoint(tmp_path):
    # two sources with identical length multisets → KS = 0; replacing
    # one with fully-disjoint support → KS = 1 (the two CDF extremes)
    import duckdb
    import os

    def lake(lens_b):
        la = [10, 20, 30, 40]
        return pa.table(
            {
                "doc_id": pa.array(list(range(8)), pa.int64()),
                "text": pa.array(["x"] * 8, pa.string()),
                "lang": pa.array(["en"] * 8, pa.string()),
                "source": pa.array(["a"] * 4 + ["b"] * 4, pa.string()),
                "n_chars": pa.array(la + lens_b, pa.int64()),
            }
        )

    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    for lens_b, want in (([10, 20, 30, 40], 0.0), ([100, 200, 300, 400], 1.0)):
        pq.write_table(lake(lens_b), str(tmp_path / "documents.parquet"))
        got = QUERIES["ks_sources"](str(tmp_path)).to_pandas()
        assert got["ks"].iloc[0] == want
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('"
            + os.path.join(str(tmp_path), "documents.parquet")
            + "')"
        )
        exp = con.execute(ORACLES["ks_sources"]).fetchdf()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=True
        )


@pytest.mark.usefixtures("ray_session")
def test_ttr_all_unique_vs_one_word(tmp_path):
    # every token unique → TTR 1; one word repeated → TTR 1/n_tokens
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma delta", "spam spam spam spam spam"], pa.string()
            ),
            "lang": pa.array(["uniq", "mono"], pa.string()),
            "source": pa.array(["s"] * 2, pa.string()),
            "n_chars": pa.array([22, 25], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["ttr_by_lang"](str(tmp_path)).to_pandas()
    by = got.set_index("lang")
    assert by.loc["uniq", "ttr"] == 1.0 and by.loc["uniq", "n_types"] == 4
    assert by.loc["mono", "n_types"] == 1 and by.loc["mono", "ttr"] == 0.2


@pytest.mark.usefixtures("ray_session")
def test_winnow_dedup_transitive_cluster(tmp_path):
    # A~B and B~C via different shared blocks (A and C share nothing)
    # must still collapse to ONE survivor — the minimum doc_id
    blk1 = "the quick brown fox jumps over the lazy dog " * 5
    blk2 = "never gonna give you up never gonna let you down " * 5
    texts = [
        blk1 + " tail-a",
        blk1 + blk2,
        blk2 + " tail-c",
        "zzzz yyyy xxxx wwww " * 12,  # unrelated → survives
    ]
    docs = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    pairs = QUERIES["winnow_dup_pairs"](str(tmp_path)).to_pandas()
    pset = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (10, 11) in pset and (11, 12) in pset
    got = QUERIES["winnow_dedup"](str(tmp_path)).to_pandas()
    assert got["doc_id"].tolist() == [10, 13]
