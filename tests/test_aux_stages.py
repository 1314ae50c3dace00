"""Unit tests: dedup / similarity / text analysis / multimodal /
geometry / latex sink / evaluate pipeline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pdf_extractor_ray.functions.geometry import (
    boxes_overlap,
    cluster_boxes,
    filter_min_size,
    merge_boxes,
)
from pdf_extractor_ray.functions.hashing import (
    hamming64,
    jaccard,
    minhash_signature,
    ngram_jaccard,
    shingles,
    simhash,
)
from pdf_extractor_ray.functions.textstats import (
    detect_language,
    fingerprint,
    quality_score,
    token_count,
)


# --- pure hashing functions -------------------------------------------


def test_shingles_and_jaccard():
    a = shingles("the quick brown fox jumps over the lazy dog entirely")
    b = shingles("the quick brown fox jumps over the lazy dog entirely")
    assert jaccard(a, b) == 1.0
    c = shingles("completely different words appear in this other sentence here")
    assert jaccard(a, c) == 0.0


def test_minhash_estimates_jaccard():
    base = "word" + " word".join(str(i) for i in range(100))
    near = base + " tail tail"
    sig_a = minhash_signature(shingles(base), 128)
    sig_b = minhash_signature(shingles(near), 128)
    est = (sig_a == sig_b).mean()
    true = ngram_jaccard(base, near)
    assert abs(est - true) < 0.2
    assert est > 0.6


def test_simhash_near_and_far():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + "extra"
    c = "entirely unrelated content about convex optimization theory proofs"
    assert hamming64(simhash(a), simhash(b)) <= 12
    assert hamming64(simhash(a), simhash(c)) > 12


def test_fingerprint_whitespace_invariant():
    assert fingerprint("a  b\nc") == fingerprint("a b c")
    assert fingerprint("a b c") != fingerprint("a b d")


def test_fingerprint_exact_is_byte_sensitive():
    """exact_dedup's key must match GROUP BY text byte-for-byte —
    whitespace-only variants are DIFFERENT documents to it (the
    invariant fingerprint() is for near-dup prefilters only)."""
    from pdf_extractor_ray.functions.textstats import fingerprint_exact

    assert fingerprint_exact("a  b") != fingerprint_exact("a b")
    assert fingerprint_exact("a b") == fingerprint_exact("a b")


def test_textstats():
    t = "The quick brown fox jumps over the lazy dog and runs away fast."
    assert detect_language(t) == "en"
    assert detect_language("der die das und ist von zu mit den") == "de"
    assert detect_language("") == "und"
    assert token_count("a b-c 12 !") == 6  # a, b, -, c, 12, !
    q = quality_score(t)
    assert 0 < q["quality"] <= 1 and q["stop_ratio"] > 0.1


# --- geometry ----------------------------------------------------------


def test_geometry_cluster():
    # three overlapping-ish boxes forming one region + one isolated dot
    boxes = [(0, 0, 40, 40), (50, 0, 90, 40), (0, 50, 40, 90), (500, 500, 505, 505)]
    regions = cluster_boxes(boxes, merge_distance=20, min_members=3, min_size=30)
    assert regions == [(0, 0, 90, 90)]
    assert boxes_overlap((0, 0, 10, 10), (5, 5, 20, 20))
    assert not boxes_overlap((0, 0, 10, 10), (20, 20, 30, 30))
    assert merge_boxes((0, 0, 1, 1), (2, 2, 3, 3)) == (0, 0, 3, 3)
    assert filter_min_size([(0, 0, 10, 10), (0, 0, 100, 100)]) == [(0, 0, 100, 100)]


# --- Ray stages --------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_stage():
    from pdf_extractor_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["same text here", "same text here", "unique one", "unique two"],
        }
    )
    out = pa.concat_tables(
        list(exact_dedup(ray.data.from_arrow(t)).iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    assert sorted(out.column("doc_id").to_pylist()) == [1, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_stage_finds_planted():
    from pdf_extractor_ray.stages.dedup import minhash_dedup

    base = ["doc %d " % i + " ".join(f"w{i}x{j}" for j in range(60)) for i in range(8)]
    texts = base + [base[0] + " tail", base[1] + " tail"]
    ids = list(range(8)) + [100, 101]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )
    out = pa.concat_tables(
        list(
            minhash_dedup(ds, jaccard_threshold=0.8).iter_batches(batch_format="pyarrow")
        ),
        promote_options="permissive",
    )
    kept = sorted(out.column("doc_id").to_pylist())
    assert kept == list(range(8))  # near-copies 100/101 dropped


@pytest.mark.usefixtures("ray_session")
def test_brute_force_topk():
    from pdf_extractor_ray.stages.similarity import brute_force_topk

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(50, 16)).astype(float)
    t = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs]),
        }
    )
    out = brute_force_topk(
        ray.data.from_arrow(t), {0: vecs[0].tolist()}, k=5
    )
    rows = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")), promote_options="permissive"
    ).to_pylist()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["cosine"] - 1.0) < 1e-5
    # matches numpy ground truth
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = unit @ unit[0]
    expect = set(np.argsort(-cos)[:5].tolist())
    assert {r["vec_id"] for r in rows} == expect


@pytest.mark.usefixtures("ray_session")
def test_multimodal_featurizer():
    from pdf_extractor_ray.stages.multimodal import FEATURE_SCHEMA, featurize_media, real_decode

    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": ["image", "audio"],
            "payload": pa.array([b"\x89PNG fake bytes", b"RIFF fake"], pa.binary()),
        }
    )
    out = pa.concat_tables(
        list(featurize_media(ray.data.from_arrow(t)).iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    assert out.num_rows == 2
    assert set(out.column_names) == set(FEATURE_SCHEMA.names)
    assert out.column("n_bytes").to_pylist() == [15, 9]
    assert all(len(f) == 8 for f in out.column("feature").to_pylist())
    try:
        import PIL  # noqa: F401

        # real path covered by tests/test_real_codec_seams.py
    except ImportError:
        with pytest.raises(NotImplementedError):
            real_decode(b"x", "image")


# --- latex sink --------------------------------------------------------


def test_latex_render_and_check(tmp_path):
    from pdf_extractor_ray.sources.latex_sink import (
        render_document,
        structural_check,
    )

    doc = render_document(
        [
            {"unit_id": "2.7", "extracted_text": r"Show $x \leq y$. Proof trivial."},
            {"unit_id": "", "extracted_text": "plain content"},
        ]
    )
    assert structural_check(doc)
    assert r"\subsection*{Unit 2.7}" in doc
    assert not structural_check(doc.replace(r"\end{document}", ""))
    assert not structural_check(doc.replace("{", "", 1))


# --- evaluate pipeline -------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_evaluate_against_golden_roundtrip():
    import os

    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.evaluate import evaluate_against_golden, flag_rollup
    from pdf_extractor_ray.pipelines.extract import extraction_pipeline

    gd = os.path.join(os.path.dirname(__file__), "golden")
    transcripts = pq.read_table(os.path.join(gd, "transcripts.parquet"))
    golden = pq.read_table(os.path.join(gd, "extracted.parquet"))
    ds = extraction_pipeline(ray.data.from_arrow(transcripts))
    report, mism = evaluate_against_golden(ds, golden)
    assert report.failed == 0 and report.missing == 0 and report.extra == 0
    assert report.pass_rate == 1.0 and mism.num_rows == 0

    rollup = flag_rollup(extraction_pipeline(ray.data.from_arrow(transcripts)))
    assert rollup["n"] == golden.num_rows
    assert rollup["resolved"] > 0 and rollup["continued"] > 0


@pytest.mark.usefixtures("ray_session")
def test_evaluate_detects_corruption():
    import os

    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.evaluate import evaluate_against_golden

    gd = os.path.join(os.path.dirname(__file__), "golden")
    golden = pq.read_table(os.path.join(gd, "extracted.parquet"))
    corrupt = golden.set_column(
        golden.schema.get_field_index("extracted_text"),
        "extracted_text",
        pa.array(
            ["CORRUPTED" if i == 0 else x for i, x in enumerate(golden.column("extracted_text").to_pylist())],
            pa.string(),
        ),
    )
    report, mism = evaluate_against_golden(corrupt, golden)
    assert report.failed == 1 and mism.num_rows == 1


# --- figures (S4/S6/S7 + A7) ------------------------------------------


def test_pdf_figure_detection():
    from pdf_extractor_ray.datagen import make_pdf
    from pdf_extractor_ray.functions.pdfx import extract_pdf_figures

    pdf = make_pdf(
        ["2.7 Q.", "Solution. A."],
        images=[(100, 420, 120, 90), (300, 420, 30, 20)],
        rects=[
            (100, 300, 40, 40),
            (130, 310, 40, 40),
            (160, 300, 40, 40),
            (130, 260, 40, 35),
            (500, 60, 8, 8),
        ],
    )
    figs = extract_pdf_figures(pdf)
    # big image kept, small one filtered (<50px); 4-rect cluster → one
    # region; stray rect excluded (min_members=3)
    assert figs == ["img:100,420,220,510", "region:100,260,200,350"]


@pytest.mark.usefixtures("ray_session")
def test_figures_flow_to_output_and_rollup():
    import os

    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.evaluate import figure_counts
    from pdf_extractor_ray.pipelines.extract import extraction_pipeline

    gd = os.path.join(os.path.dirname(__file__), "golden")
    transcripts = pq.read_table(os.path.join(gd, "transcripts.parquet"))
    ds = extraction_pipeline(ray.data.from_arrow(transcripts))
    out = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow")), promote_options="permissive"
    )
    n_rows_with_figs = sum(1 for f in out.column("figures").to_pylist() if f)
    assert n_rows_with_figs > 0

    fc = figure_counts(extraction_pipeline(ray.data.from_arrow(transcripts)))
    assert fc.num_rows > 0
    assert sum(fc.column("n_figures").to_pylist()) == sum(
        len(f or []) for f in out.column("figures").to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_transitive_cluster():
    """A~B~C near-dup chain collapses to one survivor (min id) via
    union-find over verified pairs."""
    from pdf_extractor_ray.stages.dedup import minhash_dedup

    base = "alpha " + " ".join(f"tok{j}" for j in range(80))
    texts = [base, base + " x", base + " x y", "totally different content " * 10]
    ids = [5, 9, 7, 1]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )
    out = pa.concat_tables(
        list(minhash_dedup(ds, jaccard_threshold=0.8).iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    assert sorted(out.column("doc_id").to_pylist()) == [1, 5]


def test_hll_sketch_accuracy():
    import numpy as np

    from pdf_extractor_ray.functions.sketches import (
        hash_values,
        hll_add_hashes,
        hll_estimate,
        hll_merge,
        hll_new,
    )

    a, b = hll_new(), hll_new()
    hll_add_hashes(a, hash_values(range(0, 30_000)))
    hll_add_hashes(b, hash_values(range(20_000, 50_000)))  # overlap 10k
    est = hll_estimate(hll_merge(a, b))
    assert abs(est - 50_000) / 50_000 < 0.05  # ~1.6% expected error
    # merge is commutative/idempotent
    m1 = hll_merge(a, b)
    assert np.array_equal(m1, hll_merge(b, a))
    assert np.array_equal(m1, hll_merge(m1, a))


def test_grouped_hll_accuracy(ray_session):
    """q:approx_distinct_grouped within 5% of exact per group (the
    accuracy pin for the no-oracle driver entry)."""
    import duckdb

    from pdf_extractor_ray.pipelines.queries import q_approx_distinct_grouped

    sf = "/root/testdata/sf0.01"
    got = q_approx_distinct_grouped(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    exact = con.execute(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY event_type"
    ).df()
    m = got.merge(exact, on="event_type")
    assert len(m) == len(exact) == len(got)
    rel_err = (m["approx_users"] - m["n"]).abs() / m["n"]
    assert (rel_err < 0.05).all(), m


def test_approx_percentiles_within_one_bin(ray_session):
    """The histogram-sketch estimate is bounded by construction: the
    exact quantile_disc value lies in the reported bin, so
    0 < est - exact <= bin width (the estimate is the bin's UPPER
    edge).  Pins the sketch error vs the exact oracle at sf0.01."""
    import duckdb

    from pdf_extractor_ray.pipelines.queries import _HIST_BIN, q_approx_percentiles

    sf = "/root/testdata/sf0.01"
    got = q_approx_percentiles(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exact = con.execute(
        """SELECT lang, quantile_disc(n_chars, 0.5) AS p50,
                  quantile_disc(n_chars, 0.9) AS p90,
                  quantile_disc(n_chars, 0.99) AS p99
           FROM documents GROUP BY lang"""
    ).df()
    m = got.merge(exact, on="lang")
    assert len(m) == len(got) == len(exact)
    for est, ex in (("p50_est", "p50"), ("p90_est", "p90"), ("p99_est", "p99")):
        diff = m[est] - m[ex]
        assert ((diff > 0) & (diff <= _HIST_BIN)).all(), m[["lang", est, ex]]


def test_kmeans_recovers_planted_clusters(ray_session):
    """Distributed Lloyd's (kmeans_fit: broadcast centroids, mergeable
    per-batch moment partials) recovers 6 well-separated planted
    clusters with >=0.95 majority-label purity, and kmeans_assign's
    cluster column agrees with a driver-side numpy assignment against
    the returned centroids."""
    from pdf_extractor_ray.stages.similarity import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(11)
    k, per, dim = 6, 60, 16
    centers = rng.normal(size=(k, dim)) * 4.0
    vecs = np.concatenate(
        [centers[j] + rng.normal(scale=0.2, size=(per, dim)) for j in range(k)]
    )
    labels = np.repeat(np.arange(k), per)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs]),
            "label": pa.array(labels, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    cent = kmeans_fit(ds, k=k, max_iters=10, seed=5, sample=256)
    assert cent.shape == (k, dim)
    out = kmeans_assign(ds, cent).select_columns(["vec_id", "cluster", "label"])
    df = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
    ).to_pandas()
    assert len(df) == k * per
    purity = (
        df.groupby("cluster")["label"]
        .agg(lambda s: s.value_counts().iloc[0])
        .sum()
        / len(df)
    )
    assert purity >= 0.95, purity
    # assignment agrees with numpy argmax against the same centroids
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = (unit @ cent.T).argmax(axis=1)
    got = df.sort_values("vec_id")["cluster"].to_numpy()
    assert (got == want).mean() >= 0.99


def test_redact_pii_planted():
    """Every pattern class is scrubbed; scalar and vectorized kernels
    agree (the Arrow RE2 path is what runs in the pipeline; the scalar
    twin is what documents the semantics)."""
    from pdf_extractor_ray.functions.textstats import redact_pii, redact_pii_array

    cases = [
        ("mail me at alice.smith+x@sub.example.co.uk now", "mail me at <EMAIL> now"),
        ("ssn 123-45-6789 end", "ssn <SSN> end"),
        ("server 192.168.0.1 down", "server <IP> down"),
        ("call 555-1234 or 555.9876", "call <PHONE> or <PHONE>"),
        # SSN must win over the phone pattern on its 3-4 tail
        ("id 987-65-4321 tel 321-7654", "id <SSN> tel <PHONE>"),
        ("no pii here at all", "no pii here at all"),
    ]
    for raw, want in cases:
        assert redact_pii(raw) == want, raw
    arr = pa.array([c[0] for c in cases])
    got = redact_pii_array(arr).to_pylist()
    assert got == [c[1] for c in cases]


def test_chunk_docs_reassembles(ray_session):
    """Chunking invariants at sf0.001: chunk 0 of every doc is a text
    prefix, consecutive chunks overlap by size-stride, and stripping
    the overlap from chunks 1..n reassembles the exact document."""
    from pdf_extractor_ray.pipelines.queries import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        q_chunk_docs,
    )

    sf = "/root/testdata/sf0.001"
    chunks = q_chunk_docs(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    text_by_id = dict(zip(docs["doc_id"], docs["text"]))
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    n_docs = 0
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        assert list(g["chunk_idx"]) == list(range(len(g)))
        parts = list(g["chunk"])
        assert all(len(p) <= _CHUNK_SIZE for p in parts)
        rebuilt = parts[0] + "".join(p[overlap:] for p in parts[1:])
        assert rebuilt == text_by_id[doc_id], doc_id
        n_docs += 1
    assert n_docs == len(docs)


def test_decontaminate_flags_planted_overlap(ray_session):
    """Every eval doc is flagged (it contains its own snippet), and a
    doc sharing a 40-char window with an eval doc is exactly the
    cross-contamination the query reports."""
    from pdf_extractor_ray.pipelines.queries import q_decontaminate

    sf = "/root/testdata/sf0.001"
    got = q_decontaminate(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ev = docs[docs["doc_id"] % 83 == 0]
    snips = [t[8:48] for t in ev["text"]]
    want = {
        int(r.doc_id): sum(s in r.text for s in snips)
        for r in docs.itertuples()
        if any(s in r.text for s in snips)
    }
    assert dict(zip(got["doc_id"], got["n_hits"])) == want
    assert set(ev["doc_id"]) <= set(got["doc_id"])


def test_semantic_dedup_drops_planted_neardups(ray_session):
    """SemDeDup shape: 4 well-separated clusters, each with 10 base
    vectors plus 3 planted near-copies of its first member.  Threshold
    math: centers have norm ~6*sqrt(12)=21, so base pairs sit at
    cosine ~1-(noise/21)^2 ~ 0.999 while planted copies (noise 1e-4)
    sit at ~1-1e-10 — the 0.99999 threshold separates them cleanly.
    The within-cluster prune must drop exactly the planted copies
    (keep-min-id) and no base vector."""
    from pdf_extractor_ray.stages.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    k, base_n, dim = 4, 10, 12
    centers = rng.normal(size=(k, dim)) * 6.0
    vids, vecs, planted = [], [], set()
    nid = 0
    for j in range(k):
        base = centers[j] + rng.normal(scale=0.3, size=(base_n, dim))
        for b in base:
            vids.append(nid); vecs.append(b); nid += 1
        anchor = base[0]
        for _ in range(3):
            vids.append(nid)
            vecs.append(anchor + rng.normal(scale=1e-4, size=dim))
            planted.add(nid)
            nid += 1
    t = pa.table(
        {
            "vec_id": pa.array(vids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    flagged = semantic_dedup(ds, k=k, threshold=0.99999, seed=5, n_total=len(vids))
    df = pa.concat_tables(list(flagged.iter_batches(batch_format="pyarrow"))).to_pandas()
    assert len(df) == len(vids)
    dropped = set(df[df["is_dup"]]["vec_id"])
    assert dropped == planted, (sorted(dropped), sorted(planted))


def test_cms_bounds_and_merge():
    """Count-Min invariants on a synthetic Zipf stream: estimates never
    undercount, overcount stays within the (e/width)*N bound, and a
    merged pair of sketches equals one sketch over the union."""
    from pdf_extractor_ray.functions.sketches import (
        cms_add,
        cms_estimate,
        cms_merge,
        cms_new,
        hash_values,
    )

    rng = np.random.RandomState(3)
    keys = rng.zipf(1.3, size=20000) % 3000
    vals, counts = np.unique(keys, return_counts=True)
    half = len(keys) // 2
    a, b, full = cms_new(), cms_new(), cms_new()
    for sk, chunk in ((a, keys[:half]), (b, keys[half:]), (full, keys)):
        v, c = np.unique(chunk, return_counts=True)
        cms_add(sk, hash_values(v), c)
    assert (cms_merge(a, b) == full).all()
    est = cms_estimate(full, hash_values(vals))
    assert (est >= counts).all()  # never undercounts
    bound = np.e / full.shape[1] * len(keys)
    # with depth 4 the expected failure probability is e^-4 per key
    assert ((est - counts) <= bound).mean() > 0.99


def test_heavy_hitters_matches_exact_top(ray_session):
    """The CMS heavy-hitter query at sf0.001: every reported estimate
    >= the exact count, and the reported top-5 IS the exact top-5 (the
    corpus's frequent words tower over the sketch error)."""
    from pdf_extractor_ray.pipelines.queries import q_heavy_hitters

    sf = "/root/testdata/sf0.001"
    got = q_heavy_hitters(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    exact = docs["text"].str.split(" ").explode().value_counts()
    for r in got.itertuples():
        assert r.est_count >= exact[r.word], (r.word, r.est_count, exact[r.word])
    assert set(got["word"].head(5)) == set(exact.head(5).index)


def test_kmeans_exchange_path_matches_driver_reduce(ray_session, monkeypatch):
    """The distributed groupby exchange (the 100-TB path, engaged when
    blocks*k exceeds KMEANS_DRIVER_REDUCE_MAX_ROWS) fits the same
    centroids as the small-scale driver reduce — same moment partials,
    different reduction order, so allclose rather than bit-equal."""
    from pdf_extractor_ray.stages import similarity as sim

    rng = np.random.RandomState(2)
    vecs = rng.normal(size=(300, 8)) + np.repeat(
        rng.normal(size=(3, 8)) * 5.0, 100, axis=0
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    c_driver = sim.kmeans_fit(ds, k=3, max_iters=4, seed=9, n_total=len(vecs))
    monkeypatch.setattr(sim, "KMEANS_DRIVER_REDUCE_MAX_ROWS", 0)
    c_exchange = sim.kmeans_fit(ds, k=3, max_iters=4, seed=9, n_total=len(vecs))
    np.testing.assert_allclose(c_driver, c_exchange, atol=1e-9)


def test_extraction_tolerates_null_and_empty_payloads(ray_session):
    """Real lakes carry nulls: a null text, an empty string, and a
    null tool column must flow through the full pipeline (parse →
    stitch → order) without crashing, yielding empty extracted text
    for the degenerate turns and correct text for the healthy ones."""
    from pdf_extractor_ray.pipelines.extract import extraction_pipeline

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
            "role": pa.array(["assistant"] * 4, pa.string()),
            "text": pa.array(
                ["<html><body><p>hello world</p></body></html>", None, "", "plain text turn"],
                pa.string(),
            ),
            "tool": pa.array(["html", None, "html", None], pa.string()),
            "ts": pa.array([0, 1, 0, 1], pa.timestamp("us")),
        }
    )
    ds = extraction_pipeline(ray.data.from_arrow(t))
    out = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert out.num_rows == 4
    got = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in out.to_pylist()
    }
    assert got[("c1", 0)] == "hello world"
    assert got[("c1", 1)] == "" and got[("c2", 0)] == ""
    assert got[("c2", 1)] == "plain text turn"


def test_size_aware_shuffle_strategy(ray_session, monkeypatch):
    """The conv_id exchange picks the hash strategy above
    HASH_SHUFFLE_MIN_BYTES and leaves the context default below it
    (the 10x lake measured sort 405.8 s vs hash 146.9 s); explicit
    GRAFT_HASH_SHUFFLE=0/1 overrides beat the size heuristic."""
    from ray.data.context import ShuffleStrategy

    from pdf_extractor_ray.stages import conversation as cv

    def fresh():
        return ray.data.from_arrow(
            pa.table({"conv_id": pa.array(["c"], pa.string())})
        )

    monkeypatch.delenv("GRAFT_HASH_SHUFFLE", raising=False)
    ds = fresh()
    cv._prefer_hash_shuffle(ds, cv.HASH_SHUFFLE_MIN_BYTES + 1)
    assert ds.context.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE

    ds = fresh()
    default = ds.context.shuffle_strategy
    cv._prefer_hash_shuffle(ds, cv.HASH_SHUFFLE_MIN_BYTES - 1)
    assert ds.context.shuffle_strategy == default

    ds = fresh()
    cv._prefer_hash_shuffle(ds, None)  # unknown size -> conservative
    assert ds.context.shuffle_strategy == default

    monkeypatch.setenv("GRAFT_HASH_SHUFFLE", "0")
    ds = fresh()
    cv._prefer_hash_shuffle(ds, cv.HASH_SHUFFLE_MIN_BYTES + 1)
    assert ds.context.shuffle_strategy == default

    monkeypatch.setenv("GRAFT_HASH_SHUFFLE", "1")
    ds = fresh()
    cv._prefer_hash_shuffle(ds, None)
    assert ds.context.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE


def test_skew_caps_preserve_planted_neardups(ray_session):
    """The oversized-group sub-split guards (semantic_dedup
    max_cluster, embedding_neardup_pairs verify_cap) must not separate
    near-identical vectors even when forced to split aggressively —
    with caps far below the group sizes, the planted near-dups are
    still all found."""
    from pdf_extractor_ray.pipelines.queries import _embeddings_with_planted_neardups
    from pdf_extractor_ray.stages.dedup import embedding_neardup_pairs
    from pdf_extractor_ray.stages.similarity import semantic_dedup

    sf = "/root/testdata/sf0.001"
    ds = _embeddings_with_planted_neardups(sf)
    pairs = pa.concat_tables(
        list(
            embedding_neardup_pairs(ds, cos_threshold=0.95, verify_cap=8).iter_batches(
                batch_format="pyarrow"
            )
        )
    ).to_pandas()
    planted = set(range(20)) if len(pairs) >= 20 else set(pairs["id_a"])
    # every planted (i, i+offset) pair survives the forced sub-splits
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    offset = int(pairs["id_b"].min()) - int(pairs["id_a"].min())
    want = {(i, i + offset) for i in sorted({a for a, _ in got})}
    assert want <= got

    flagged = pa.concat_tables(
        list(
            semantic_dedup(ds, k=4, threshold=0.95, max_cluster=8)
            .iter_batches(batch_format="pyarrow")
        )
    ).to_pandas()
    dup_ids = set(flagged[flagged["is_dup"]]["vec_id"])
    # the planted copies (higher ids) are the dups; base rows survive
    assert dup_ids == {b for _, b in got}, (sorted(dup_ids), sorted(got))


def test_identical_vector_flood_stays_bounded(ray_session):
    """A flood of >cap IDENTICAL vectors defeats hyperplane sub-splits
    (same side of every plane).  bounded_windows must (a) keep every
    matmul at most cap rows and (b) keep the flood one connected
    component / one survivor — the ADVICE round-2 medium finding."""
    import numpy as np

    from pdf_extractor_ray.stages.dedup import (
        bounded_windows,
        connected_components,
        embedding_neardup_pairs,
    )
    from pdf_extractor_ray.stages.similarity import semantic_dedup

    # pure helper: windows cover, never exceed cap, overlap by one row
    for n, cap in [(1, 4), (4, 4), (5, 4), (50, 8), (17, 8)]:
        wins = list(bounded_windows(n, cap))
        assert all(e - s <= cap for s, e in wins)
        covered = set()
        for s, e in wins:
            covered |= set(range(s, e))
        assert covered == set(range(n))
        for (s1, e1), (s2, e2) in zip(wins, wins[1:]):
            assert s2 == e1 - 1  # one-row overlap chains the chunks

    n = 50
    vec = [0.6, 0.8, 0.0, 0.0]
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([vec] * n, pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)

    pairs = embedding_neardup_pairs(ds, cos_threshold=0.95, verify_cap=8)
    labels = pa.concat_tables(
        list(connected_components(pairs).iter_batches(batch_format="pyarrow"))
    ).to_pandas()
    # all 50 identical vectors collapse to ONE component labelled 0
    assert set(labels["node"]) == set(range(n))
    assert set(labels["label"]) == {0}

    flagged = pa.concat_tables(
        list(
            semantic_dedup(
                ds, k=2, threshold=0.95, max_cluster=8, n_total=n
            ).iter_batches(batch_format="pyarrow")
        )
    ).to_pandas()
    keep = sorted(flagged[~flagged["is_dup"]]["vec_id"])
    assert keep == [0], keep  # exactly the min id survives


def test_filter_fields_structural():
    """filter_fields extracts referenced columns structurally — a field
    name appearing inside a string LITERAL must not widen the read, and
    every genuinely referenced field must be found (ADVICE r2 low)."""
    import pyarrow.compute as pcc

    from pdf_extractor_ray.sources.scan import filter_fields

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
            ("source", pa.string()),
        ]
    )
    flt = (pcc.field("n_chars") > 10) & (pcc.field("lang") == "source")
    got = filter_fields(flt, schema)
    # 'source' appears only as a literal — must NOT be included
    assert sorted(got) == ["lang", "n_chars"], got
    assert filter_fields(pcc.field("doc_id") >= 0, schema) == ["doc_id"]


def test_ntile_and_percentiles_deskewed(ray_session, tmp_path):
    """Round-3 de-skew rebuild: q_ntile / q_percentiles must stay exact
    on (a) a HOT value straddling quartile boundaries (forces the
    doc_id-tiebreak passes), (b) languages with n < 4 rows (empty
    tiles), matching DuckDB ntile/quantile_disc — with no whole-group
    map_groups anywhere."""
    import duckdb

    from pdf_extractor_ray.pipelines import queries as Q

    rows = []
    # hot lang: 1000 docs, 600 of them share n_chars=512 so every
    # quartile boundary falls inside the tie run
    for i in range(1000):
        rows.append((i, "hot", 512 if i % 5 != 0 else 64 + (i % 7) * 100))
    # tiny langs exercise empty tiles
    rows.append((2000, "tiny1", 10))
    rows.extend([(2100 + i, "tiny2", 10 + i) for i in range(3)])
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    for fn, sql in ((Q.q_ntile, Q.SQL_NTILE), (Q.q_percentiles, Q.SQL_PERCENTILES)):
        got = fn(str(tmp_path)).to_pandas()
        want = con.sql(sql).df()
        g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
        w = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_pair_texts_exchange_fallback(ray_session, monkeypatch):
    """An adversarial near-dup-heavy lake whose candidate texts exceed
    the broadcast cap must take the reduce-side exchange join and still
    produce EXACTLY the broadcast path's result (VERDICT r2 item 5)."""
    from pdf_extractor_ray.stages import dedup as dd

    # 40 docs in 20 near-dup pairs — every doc is a candidate, so the
    # candidate text set == corpus (the adversarial shape)
    ids, texts = [], []
    for i in range(20):
        base = f"document {i} contents: " + " ".join(f"w{i}k{j}" for j in range(30))
        ids += [i * 2, i * 2 + 1]
        texts += [base, base + " tail"]
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )

    def run():
        ds = ray.data.from_arrow(tbl)
        pairs = dd.minhash_candidate_pairs(ds, est_threshold=0.5).materialize()
        out = dd.pair_texts(ds, pairs)
        df = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow"))
        ).to_pandas()
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(dd, "PAIR_TEXT_BROADCAST_MAX", 1)  # force exchange
    exchanged = run()
    assert len(broadcast) >= 20
    pd.testing.assert_frame_equal(
        broadcast[sorted(broadcast.columns)], exchanged[sorted(exchanged.columns)]
    )


def test_pack_sequences_multi_range(ray_session, tmp_path, monkeypatch):
    """The distributed prefix sum must stay exact across MANY ranges
    (the sf tables fit one _PACK_RANGE, so force tiny ranges and
    sparse/duplicate-free ids spanning several buckets)."""
    import duckdb
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    rng = np.random.RandomState(3)
    ids = np.sort(rng.choice(100_000, size=3_000, replace=False)).astype("int64")
    nch = rng.randint(1, 500, size=3_000).astype("int64")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(["en"] * 3_000, pa.string()),
                "n_chars": pa.array(nch, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from pdf_extractor_ray.pipelines.queries import prep as Qprep
    monkeypatch.setattr(Qprep, "_PACK_RANGE", 1024)  # ~98 ranges
    got = Q.q_pack_sequences(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(Q.SQL_PACK_SEQUENCES).df()
    g = got[sorted(got.columns)].sort_values("doc_id").reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_grouped_order_stats_exact_vs_numpy(tmp_path):
    """The generalized two-pass order-statistic machinery returns the
    EXACT rank-th smallest per key — checked against np.sort on a
    skewed, tie-heavy distribution (many values collide in one
    histogram bin and at one exact value)."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    rng = np.random.default_rng(7)
    langs = np.repeat(["aa", "bb", "cc"], [2500, 400, 7])
    vals = np.concatenate(
        [
            rng.integers(0, 50, 2000),      # dense ties inside bin 0
            np.full(500, 777),              # one massive exact tie
            rng.integers(0, 100_000, 400),  # wide spread
            np.arange(7),                   # tiny group, every rank hit
        ]
    ).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(vals, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    ranks_for = lambda n: {  # noqa: E731
        "r1": 1,
        "q1": int(np.ceil(0.25 * n)),
        "med": int(np.ceil(0.5 * n)),
        "p99": int(np.ceil(0.99 * n)),
        "max": n,
    }
    got = Q._lang_nchars_order_stats(str(tmp_path), ranks_for)
    for lang in ("aa", "bb", "cc"):
        srt = np.sort(vals[langs == lang])
        n = len(srt)
        assert got[lang]["n"] == n
        for label, rank in ranks_for(n).items():
            val, k_within, cnt_at = got[lang]["stats"][label]
            assert val == srt[rank - 1], (lang, label)
            assert cnt_at == int((srt == val).sum())
            assert k_within == rank - int(np.searchsorted(srt, val))


def test_running_total_exact_with_ts_ties(tmp_path):
    """Global running total: rows tied on ts are ordered by event_id
    WITHIN one prefix-sum range (same ts → same range by construction),
    and the cumulative cents match a driver-side cumsum exactly."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    rng = np.random.default_rng(3)
    n = 5_000
    # heavy ties: only 40 distinct timestamps across 5k rows, spread
    # over ~56 hours so many 1h ranges are exercised
    ts = np.sort(rng.choice(40, n)) * 5_100_000_000 + 1_700_000_000_000_000
    eid = rng.permutation(n).astype(np.int64)
    val = np.round(rng.uniform(0.01, 99.99, n), 2)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(val, pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        Q.q_running_total(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    order = np.lexsort((eid, ts))
    cum = np.cumsum(np.rint(val[order] * 100).astype(np.int64))
    want = (
        pd.DataFrame({"event_id": eid[order], "cum_cents": cum})
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_dup_spans_planted(ray_session, tmp_path):
    """q_dup_spans must mark exactly the window positions whose 40-char
    content recurs in >=2 distinct docs: A and B share a 60-char block
    (2 aligned windows each at stride 20), C is unique, D is too short
    to produce any window."""
    import duckdb
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    block = ("shared boilerplate block that is exactly sixty characters ok")
    assert len(block) == 60
    # place the block at a stride-aligned offset in both docs
    a = block + " unique tail for document a " + "x" * 40
    b = block + " entirely different ending for doc b " + "y" * 40
    c = "completely unique text with no repeats at all " + "z" * 40
    d = "short"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([a, b, c, d], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = Q.q_dup_spans(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(Q.SQL_DUP_SPANS).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted pair and ONLY the planted pair
    assert set(got["doc_id"]) == {1, 2}
    # 60-char block at offset 0 → windows at positions 0 and 20 in each
    assert got.set_index("doc_id")["n_dup_windows"].to_dict() == {1: 2, 2: 2}


def test_bm25_planted_ranking(ray_session, tmp_path):
    """BM25 must rank a short doc saturated with query terms above a
    long doc that mentions one term once, exclude docs with no query
    term, and match the SQL oracle bit-for-bit on the fixture."""
    import duckdb
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    docs = [
        (1, "hash merge window hash merge window"),          # dense, short
        (2, "hash " + "filler nothing relevant here " * 20), # one hit, long
        (3, "no relevant terms in this document at all"),
        (4, "merge of the window " + "pad " * 5),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = Q.q_bm25_topk(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(Q.SQL_BM25_TOPK).df()
    pd.testing.assert_frame_equal(got, want)
    assert list(got["doc_id"])[0] == 1          # dense short doc wins
    assert 3 not in set(got["doc_id"])          # zero-term doc excluded


def test_join_salted_equivalence_under_skew(ray_session, tmp_path):
    """The salted join must be bit-identical to the plain SQL join even
    when one key owns ~90% of the fact rows (the case salting exists
    for)."""
    import duckdb
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    n = 5000
    uid = np.where(np.arange(n) % 10 < 9, 7, np.arange(n) % 50)  # user 7 is hot
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "value": pa.array(np.round(np.arange(n) * 0.07 % 100, 2), pa.float64()),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(50, dtype=np.int64), pa.int64()),
            "c_mktsegment": pa.array(
                [["BUILDING", "MACHINERY", "AUTOMOBILE"][i % 3] for i in range(50)],
                pa.string(),
            ),
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    got = Q.q_join_salted(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = con.sql(Q.SQL_JOIN_SALTED).df()
    pd.testing.assert_frame_equal(got, want)


def test_dup_spans_no_duplicates_and_nulls(ray_session, tmp_path):
    """A lake with NO duplicated window (plus null/empty texts) must
    yield an empty result, not a schema-less KeyError — the
    all-empty-partial-stream path of _merge_partials."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["x" * 80, None, ""], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = Q.q_dup_spans(str(tmp_path))
    assert got.num_rows == 0
    assert got.schema.names == ["doc_id", "n_dup_windows"]


def test_dup_family_planted_clusters(ray_session, tmp_path):
    """Round-3 batch: dup_count_dist / dedup_keep_longest / source_quota
    on a PLANTED lake (the sf tables are exact-dup-free, so the oracle
    match there only exercises the trivial case).  Plants: one 10-doc
    exact cluster, one 4-doc whitespace/case near-cluster with distinct
    lengths (keep-longest must pick max n_chars, tie -> min doc_id), a
    55-doc source so the 50-doc quota actually truncates."""
    import duckdb

    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines import queries as Q

    rows = []
    for i in range(10):  # exact cluster, size 10
        rows.append((i, "same exact text", "big", len("same exact text")))
    # normalized cluster: same after lower+collapse-ws+trim, lengths differ
    variants = ["  Hello   World ", "hello world", "HELLO  WORLD", "hello   world  "]
    for j, v in enumerate(variants):
        rows.append((100 + j, v, "big", len(v)))
    for i in range(41):  # uniques to push source 'big' to 55 docs
        rows.append((200 + i, f"unique text {i}", "big", 20 + i))
    for i in range(5):
        rows.append((300 + i, f"other {i}", "small", 10 + i))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )

    def _match(fn, sql):
        got = fn(str(tmp_path)).to_pandas()
        want = con.sql(sql).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(by=cols).reset_index(drop=True)
        w = want[cols].sort_values(by=cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
        return got

    dist = _match(Q.q_dup_count_dist, Q.SQL_DUP_COUNT_DIST)
    by_size = dict(zip(dist["cluster_size"], dist["n_clusters"]))
    assert by_size[10] == 1  # the planted exact cluster

    kept = _match(Q.q_dedup_keep_longest, Q.SQL_DEDUP_KEEP_LONGEST)
    # normalized cluster collapses to ONE survivor: the longest variant
    # ("  Hello   World " = 16 chars); doc_id 100
    cluster_ids = set(range(100, 104))
    survivors = set(kept["doc_id"]) & cluster_ids
    assert survivors == {100}

    quota = _match(Q.q_source_quota, Q.SQL_SOURCE_QUOTA)
    per_source = quota.groupby("source")["doc_id"].count().to_dict()
    assert per_source == {"big": 50, "small": 5}


@pytest.mark.usefixtures("ray_session")
def test_jsonl_roundtrip(tmp_path):
    """JSONL sink writes one atomic part file per block; reader returns
    the same rows; jsonl_to_parquet lands a scannable parquet lake."""
    import os

    import pyarrow.parquet as pq

    from pdf_extractor_ray.sources.jsonl import (
        jsonl_to_parquet,
        read_jsonl,
        write_jsonl,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(100)], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = str(tmp_path / "jl")
    n_files = write_jsonl(ds, out)
    assert n_files >= 1
    assert all(f.endswith(".jsonl") for f in os.listdir(out))

    back = read_jsonl(out)
    rows = sorted((r["doc_id"], r["text"]) for r in back.take_all())
    assert rows == [(i, f"doc {i}") for i in range(100)]

    pq_dir = str(tmp_path / "pq")
    jsonl_to_parquet(out, pq_dir)
    t = pq.read_table(pq_dir)
    assert t.num_rows == 100


def test_media_batch_size_is_size_aware():
    """batch × payload ≈ the in-flight budget: wide rows get tiny
    batches, thumbnail rows get capped-large ones."""
    from pdf_extractor_ray.stages.multimodal import media_batch_size

    assert media_batch_size(4 << 20) == 4  # 4 MB images → floor
    assert media_batch_size(500) == 1024  # small payloads → cap
    assert media_batch_size(64 << 10) == 128  # 64 KB → 8 MB / 64 KB
    assert media_batch_size(0) == 1024  # degenerate guard
