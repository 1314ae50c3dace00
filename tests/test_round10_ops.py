"""Pins for the layout/normalization/ML batch: Z-order bit
interleave round-trip, quantile-normalize single-source identity and
hand-derived cross-source mapping, IRLS logistic regression on a
planted separable corpus, and BPE-encode char-mass conservation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor_ray.pipelines.queries import (
    QUERIES,
    _bpe_encode_word,
    _zorder_interleave,
)


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


def test_zorder_interleave_roundtrip():
    rng = np.random.RandomState(7)
    x = rng.randint(0, 1 << 16, size=1000).astype(np.int64)
    y = rng.randint(0, 1 << 16, size=1000).astype(np.int64)
    z = _zorder_interleave(x, y).astype(np.uint64)
    # decode even bits -> x, odd bits -> y
    dx = np.zeros(len(z), dtype=np.uint64)
    dy = np.zeros(len(z), dtype=np.uint64)
    for k in range(16):
        dx |= ((z >> np.uint64(2 * k)) & np.uint64(1)) << np.uint64(k)
        dy |= ((z >> np.uint64(2 * k + 1)) & np.uint64(1)) << np.uint64(k)
    assert (dx.astype(np.int64) == x).all()
    assert (dy.astype(np.int64) == y).all()
    # locality sanity: equal inputs -> equal keys
    assert _zorder_interleave(x, y)[0] == _zorder_interleave(x.copy(), y.copy())[0]


@pytest.mark.usefixtures("ray_session")
def test_quantile_normalize_single_source_identity(tmp_path):
    """With one source the within-source rank IS the global rank, so
    normalization must be the identity (including through ties)."""
    rows = [(i, "x" * ln, "en", "s1") for i, ln in enumerate([5, 3, 3, 9, 1, 3])]
    _write_docs(tmp_path, rows)
    got = QUERIES["quantile_normalize"](str(tmp_path)).to_pandas()
    assert (got["norm_chars"] == got["n_chars"]).all()


@pytest.mark.usefixtures("ray_session")
def test_quantile_normalize_maps_small_source_onto_global(tmp_path):
    """Hand-derived: source b has 2 docs (ranks 1, 2 of 2) -> global
    ranks 1 and N; its min doc maps to the global min value, its max
    doc to the global max value."""
    rows = [
        (1, "a" * 10, "en", "a"),
        (2, "a" * 20, "en", "a"),
        (3, "a" * 30, "en", "a"),
        (4, "a" * 40, "en", "a"),
        (5, "a" * 12, "en", "b"),  # rank 1 of 2 -> g = 1 -> 10
        (6, "a" * 13, "en", "b"),  # rank 2 of 2 -> g = N=6 -> 40
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["quantile_normalize"](str(tmp_path)).to_pandas()
    got = got.set_index("doc_id")["norm_chars"]
    assert got[5] == 10
    assert got[6] == 40


@pytest.mark.usefixtures("ray_session")
def test_logreg_recovers_planted_separation(tmp_path):
    """Punctuation density perfectly separates en from fr -> IRLS must
    classify the training set near-perfectly and weight punct negative."""
    rows = []
    for i in range(150):
        rows.append((i, "clean words only here " * 4, "en", "s"))
    for i in range(150, 300):
        rows.append((i, "!!!??? ;;; !!! ??? ;;; " * 4, "fr", "s"))
    _write_docs(tmp_path, rows)
    got = QUERIES["logreg_irls"](str(tmp_path)).to_pandas().set_index("term")["value"]
    assert got["accuracy"] >= 0.95
    assert got["n"] == 300
    assert got["punct_per_100"] < 0  # punctuation pushes away from 'en'


def test_bpe_encode_word_properties():
    # no merges -> character tokens
    assert _bpe_encode_word("abc", {}) == ["a", "b", "c"]
    # single merge applies to every occurrence
    assert _bpe_encode_word("abab", {("a", "b"): 0}) == ["ab", "ab"]
    # rank order decides: ("b","c") before ("a","b") on "abc"
    assert _bpe_encode_word("abc", {("a", "b"): 1, ("b", "c"): 0}) == ["a", "bc"]
    # char-mass conservation under a nontrivial cascade
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2}
    for w in ["abcd", "dcba", "aabbccdd", "abcabc"]:
        toks = _bpe_encode_word(w, ranks)
        assert "".join(toks) == w


@pytest.mark.usefixtures("ray_session")
def test_dq_checks_counts_planted_violations(tmp_path):
    """A lake with one orphan order, one out-of-range discount, one
    nonpositive quantity, one empty props and one n_chars lie must
    report exactly one violation per check."""
    import pandas as pd

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 2, 99], pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_quantity": pa.array([1.0, 0.0, 5.0], pa.float64()),
                "l_discount": pa.array([0.1, 0.2, 1.5], pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table({"props": pa.array(["{}", "", "{}"], pa.string())}),
        str(tmp_path / "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "text": pa.array(["abc", "defg"], pa.string()),
                "n_chars": pa.array([3, 99], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        QUERIES["dq_checks"](str(tmp_path))
        .to_pandas()
        .set_index("dq_check")["n_violations"]
    )
    assert got["documents_nchars_mismatch"] == 1
    assert got["events_null_props"] == 1
    assert got["lineitem_discount_range"] == 1
    assert got["lineitem_nonpositive_qty"] == 1
    assert got["orders_orphan_custkey"] == 1


@pytest.mark.usefixtures("ray_session")
def test_extract_numbers_hand_derived(tmp_path):
    rows = [
        (1, "order 12 of 340 units", "en", "s"),
        (2, "no digits here", "en", "s"),
        (3, "007 bond", "en", "s"),
        (4, "overflow 1234567890123456789 ignored, 5 kept", "en", "s"),
    ]
    _write_docs(tmp_path, rows)
    got = (
        QUERIES["extract_numbers"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == [1, 3, 4]  # doc 2 has no integers
    assert got.loc[1, "n_ints"] == 2 and got.loc[1, "sum_ints"] == 352
    assert got.loc[3, "n_ints"] == 1 and got.loc[3, "sum_ints"] == 7
    assert got.loc[4, "n_ints"] == 1 and got.loc[4, "sum_ints"] == 5  # 19-digit run dropped


@pytest.mark.usefixtures("ray_session")
def test_record_highs_hand_derived(tmp_path):
    """Values 5, 3, 7, 7, 9 in ts order -> records at 5, 7, 9 (strict
    inequality: the second 7 is NOT a record).  ts ties broken by
    event_id; the cross-hour-range boundary is exercised by spacing
    events 2 h apart so every event sits in its own prefix range."""
    ts = pa.array(
        [i * 7_200_000_000 for i in range(5)], pa.timestamp("us")
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
                "ts": ts,
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(["view"] * 5, pa.string()),
                "value": pa.array([0.05, 0.03, 0.07, 0.07, 0.09], pa.float64()),
                "props": pa.array(["{}"] * 5, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["record_highs"](str(tmp_path)).to_pandas()
    assert list(got["event_id"]) == [10, 12, 14]
    assert list(got["cents"]) == [5, 7, 9]


@pytest.mark.usefixtures("ray_session")
def test_storage_stats_matches_footers():
    sf = "/root/testdata/sf0.001"
    got = QUERIES["storage_stats"](sf).to_pandas().set_index("tbl")
    md = pq.read_metadata(f"{sf}/documents.parquet")
    assert got.loc["documents", "n_rows"] == md.num_rows
    assert (got["compressed_bytes"] > 0).all()
    assert (got["bytes_per_row"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_embed_quantize_recall_vs_brute_force():
    """int8 symmetric quantization must keep >=0.8 recall@10 against
    the float brute force on the real embeddings table."""
    sf = "/root/testdata/sf0.01"
    exact = QUERIES["ann_bruteforce"](sf).to_pandas()
    quant = QUERIES["embed_quantize"](sf).to_pandas()
    recalls = []
    for qid, g in exact.groupby("query_id"):
        want = set(g["vec_id"])
        have = set(quant[quant["query_id"] == qid]["vec_id"])
        recalls.append(len(want & have) / len(want))
    assert sum(recalls) / len(recalls) >= 0.8


@pytest.mark.usefixtures("ray_session")
def test_ohlc_candles_hand_derived(tmp_path):
    """One 6h window, values 5, 9, 2, 7 in ts order -> open=5, high=9,
    low=2, close=7; a ts tie on the close is broken by event_id."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([0, 60_000_000, 120_000_000, 120_000_000],
                               pa.timestamp("us")),
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_type": pa.array(["view"] * 4, pa.string()),
                "value": pa.array([0.05, 0.09, 0.02, 0.07], pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["ohlc_candles"](str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["open"], row["high"], row["low"], row["close"], row["n"]) == (
        5, 9, 2, 7, 4,
    )  # close = event_id 4 (ties at ts=120s break by event_id)


def test_cms_inner_product_estimates_join_size():
    """The CMS inner product (min_d Σ_w A_d·B_d) must estimate
    Σ_k cA(k)·cB(k) within 5% on the real orderkey distributions —
    the sketch q_join_size_estimate's docstring points to for the
    beyond-O(keys) regime."""
    import pyarrow.parquet as pqt

    from pdf_extractor_ray.functions.sketches import (
        cms_add,
        cms_new,
        hash_values,
    )

    lk = pqt.read_table(
        "/root/testdata/sf0.001/lineitem.parquet", columns=["l_orderkey"]
    )["l_orderkey"].to_numpy()
    ok = pqt.read_table(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey"]
    )["o_orderkey"].to_numpy()
    # inner-product noise is ADDITIVE (~‖A‖₁·‖B‖₁/width per row, min
    # over depth) — width must be sized to the product of stream
    # masses, not the key cardinality: 6000·1500/65536 ≈ 137 ≈ 2%
    a, b = cms_new(width=65536), cms_new(width=65536)
    cms_add(a, hash_values(lk))
    cms_add(b, hash_values(ok))
    est = int(min((a[d] * b[d]).sum() for d in range(a.shape[0])))
    import pandas as pd

    exact = int(
        pd.Series(lk).value_counts()
        .mul(pd.Series(ok).value_counts(), fill_value=0)
        .sum()
    )
    assert exact > 0
    assert est >= exact  # CMS inner product never undercounts
    assert est <= exact * 1.05


@pytest.mark.usefixtures("ray_session")
def test_interp_fill_hand_derived(tmp_path):
    """User with events at t=0 (100¢) and t=2h (300¢): grid hours at
    1h and 2h?  No — half-open [t, t2) excludes t2, and t=0 IS a grid
    point, so hours 0h (100¢) and 1h (200¢ midpoint) are emitted."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([0, 7_200_000_000], pa.timestamp("us")),
                "user_id": pa.array([7, 7], pa.int64()),
                "event_type": pa.array(["view"] * 2, pa.string()),
                "value": pa.array([1.00, 3.00], pa.float64()),
                "props": pa.array(["{}"] * 2, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["interp_fill"](str(tmp_path))
        .to_pandas()
        .sort_values("hour_us")
        .reset_index(drop=True)
    )
    assert list(got["hour_us"]) == [0, 3_600_000_000]
    assert list(got["interp_cents"]) == [100.0, 200.0]


@pytest.mark.usefixtures("ray_session")
def test_mass_coverage_hand_derived(tmp_path):
    """Lengths 6, 2, 2, 2 (total 12): the largest doc alone covers 6
    = half the mass -> n_docs 1, covered 6."""
    rows = [
        (1, "aaaaaa", "en", "s"),
        (2, "bb", "en", "s"),
        (3, "cc", "en", "s"),
        (4, "dd", "en", "s"),
    ]
    _write_docs(tmp_path, rows)
    got = QUERIES["mass_coverage"](str(tmp_path)).to_pandas()
    assert list(got.iloc[0]) == [1, 6, 12]


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_boundary_tie(tmp_path):
    """Events at t=0 and t=1h with a 1h lease: the second START
    processes before the first END at the shared boundary (overlap-
    inclusive ORDER BY t, d DESC), so peak = 2 at exactly t=1h."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([0, 3_600_000_000], pa.timestamp("us")),
                "user_id": pa.array([1, 2], pa.int64()),
                "event_type": pa.array(["view"] * 2, pa.string()),
                "value": pa.array([0.1, 0.2], pa.float64()),
                "props": pa.array(["{}"] * 2, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["peak_concurrency"](str(tmp_path)).to_pandas()
    assert got.iloc[0]["peak"] == 2
    assert got.iloc[0]["first_peak_t"] == 3_600_000_000


@pytest.mark.usefixtures("ray_session")
def test_spell_suggest_finds_planted_neighbor(tmp_path):
    rows = [(1, "the transformer gradient attention model", "en", "s")]
    _write_docs(tmp_path, rows)
    got = (
        QUERIES["spell_suggest"](str(tmp_path))
        .to_pandas()
        .sort_values(["qw", "dist", "word"])
        .groupby("qw")
        .first()
    )
    assert got.loc["transfomer", "word"] == "transformer"
    assert got.loc["transfomer", "dist"] == 1
    assert got.loc["gradint", "word"] == "gradient"
    assert got.loc["atention", "word"] == "attention"


@pytest.mark.usefixtures("ray_session")
def test_compaction_plan_invariants():
    """Every file lands in exactly one group, no group exceeds the
    64 MB cap unless it is a single oversized file, and bytes are
    conserved."""
    sf = "/root/testdata/sf0.01"
    stats = QUERIES["storage_stats"](sf).to_pandas()
    plan = QUERIES["compaction_plan"](sf).to_pandas()
    assert plan["n_files"].sum() == len(stats)
    assert plan["group_bytes"].sum() == stats["compressed_bytes"].sum()
    cap = 64 << 20
    over = plan[plan["group_bytes"] > cap]
    assert (over["n_files"] == 1).all()  # only single oversized files exceed


@pytest.mark.usefixtures("ray_session")
def test_bpe_encode_corpus_invariants():
    sf = "/root/testdata/sf0.001"
    got = QUERIES["bpe_encode"](sf).to_pandas()
    assert len(got) > 0
    # every word is >= 1 token; merges only ever REDUCE token count,
    # so n_tokens is between n_words and the total char count
    assert (got["n_tokens"] >= got["n_words"]).all()
    nonempty = got[got["n_words"] > 0]
    assert (nonempty["n_tokens"] > 0).all()
