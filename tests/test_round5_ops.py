"""Pins for the profiling/diagnostics batch: exact money rounding,
per-column profiling across batch boundaries, Gopher-rule boundary
documents, EWMA against a hand-rolled fold, autocorrelation edge
cases, Benford digit extraction, chi-squared independence."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor_ray.pipelines.queries import _i4_to_money, _money_i4


def test_money_i4_exact_and_half_away():
    # 0.03 × (1 − 0.07) = 0.0279 exactly → 279 ten-thousandths
    got = _money_i4(
        pa.chunked_array([pa.array([0.03], pa.float64())]),
        pa.chunked_array([pa.array([0.07], pa.float64())]),
    )
    assert got.to_pylist() == [279]
    # exact half-cents round AWAY from zero (SQL semantics), both signs
    assert _i4_to_money(np.array([3265657450])).tolist() == [326565.75]
    assert _i4_to_money(np.array([150, -150, 149, -149])).tolist() == [
        0.02,
        -0.02,
        0.01,
        -0.01,
    ]


def _write_docs(tmp_path, tables):
    """Write each table as its own parquet file so the profiler's
    per-batch partials cross a real block boundary."""
    d = tmp_path / "documents.parquet"
    d.mkdir()
    for i, t in enumerate(tables):
        pq.write_table(t, str(d / f"part-{i}.parquet"))


def _doc_table(ids, n_chars, lang="en", source="s", text="x"):
    n = len(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([text] * n, pa.string()),
            "lang": pa.array([lang] * n, pa.string()),
            "source": pa.array([source] * n, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_profile_numeric_min_reduces_numerically(tmp_path):
    # regression: per-batch minima are stringified for the unified
    # schema; "100" < "20" lexicographically, so a string reduce
    # across batches would report min 100.  Two files force two
    # batches with exactly that trap.
    _write_docs(
        tmp_path,
        [_doc_table([100], [100]), _doc_table([20, 999], [20, 999])],
    )
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["profile_columns"](str(tmp_path)).to_pandas().set_index("col")
    assert got.loc["n_chars", "min_val"] == "20"
    assert got.loc["n_chars", "max_val"] == "999"
    assert got.loc["doc_id", "n_distinct"] == 3
    assert got.loc["lang", "n_distinct"] == 1
    assert int(got.loc["doc_id", "n"]) == 3 and int(got.loc["doc_id", "n_null"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_gopher_rule_boundaries(tmp_path):
    texts = [
        "one two three four",  # wc=4 < 5 → 'wc'
        "aa bb cc dd ee",  # wc=5, ns=10=2·wc (NOT <), al=10, tot=14: 50<42 false → kept
        "a1 b2 c3 d4 e5",  # mwl passes, al=5: 25 < 42 → 'alpha'
        "a b c d e",  # ns=5 < 2·5 → 'mwl' (first failing after wc)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["gopher_filter"](str(tmp_path)).to_pandas()
    by = dict(zip(got["reason"], got["cnt"]))
    assert by == {"wc": 1, "kept": 1, "alpha": 1, "mwl": 1}


def _events(rows):
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_ewma_matches_manual_fold(tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    vals = [4.0, 2.0, 8.0, 1.0]
    rows = [(i, t0 + dt.timedelta(minutes=i), 7, v) for i, v in enumerate(vals)]
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["ewma_user"](str(tmp_path)).to_pandas()
    exp = vals[0]
    for v in vals[1:]:
        exp = 0.5 * v + 0.5 * exp
    assert got["user_id"].tolist() == [7]
    assert got["n_events"].tolist() == [4]
    assert got["ewma"].tolist() == [round(exp, 6)]


@pytest.mark.usefixtures("ray_session")
def test_autocorr_edges(tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    # constant daily counts → zero variance → NULL
    rows = [(i, t0 + dt.timedelta(days=i), 1, 1.0) for i in range(4)]
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["autocorr_daily"](str(tmp_path)).to_pandas()
    assert got["n_pairs"].iloc[0] == 3 and np.isnan(got["acf1"].iloc[0])

    # perfectly alternating 1,3,1,3,1,3 day-counts → acf1 == −1
    rows = []
    eid = 0
    for i in range(6):
        for _ in range(1 if i % 2 == 0 else 3):
            rows.append((eid, t0 + dt.timedelta(days=i), 1, 1.0))
            eid += 1
    p2 = tmp_path / "alt"
    p2.mkdir()
    pq.write_table(_events(rows), str(p2 / "events.parquet"))
    got = QUERIES["autocorr_daily"](str(p2)).to_pandas()
    assert got["acf1"].iloc[0] == -1.0


@pytest.mark.usefixtures("ray_session")
def test_benford_digits_and_ppm(tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    vals = [0.01, 1.23, 95.0, 0.07, 0.0]  # 0.0 excluded; digits 1,1,9,7
    rows = [(i, t0, 1, v) for i, v in enumerate(vals)]
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["benford_digits"](str(tmp_path)).to_pandas()
    by = {int(d): (int(c), int(p)) for d, c, p in got.itertuples(index=False)}
    assert by[1] == (2, 500000) and by[9][0] == 1 and by[7][0] == 1
    assert set(by) == {1, 7, 9}


@pytest.mark.usefixtures("ray_session")
def test_chi2_independent_is_zero(tmp_path):
    langs, sources = ["en", "de"], ["s0", "s1", "s2"]
    rows = [(l, s) for l in langs for s in sources for _ in range(4)]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([1] * len(rows), pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["chi2_lang_source"](str(tmp_path)).to_pandas()
    assert got["n"].iloc[0] == len(rows)
    assert got["dof"].iloc[0] == 2
    assert got["chi2"].iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_jl_projection_preserves_distances():
    import ray.data

    from pdf_extractor_ray.stages.similarity import random_projection

    rng = np.random.RandomState(0)
    x = rng.normal(size=(200, 64))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(list(x), pa.list_(pa.float64())),
            }
        )
    )
    out = pa.concat_tables(
        random_projection(ds, out_dim=16).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).to_pandas()
    out = out.sort_values("vec_id")
    y = np.asarray([np.asarray(v) for v in out["proj"]])
    # JL: E‖y_a − y_b‖ ≈ ‖x_a − x_b‖, distortion ~1/√16 — mean relative
    # error over 500 random pairs must be well inside that envelope
    pairs = rng.randint(0, 200, size=(500, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    dx = np.linalg.norm(x[pairs[:, 0]] - x[pairs[:, 1]], axis=1)
    dy = np.linalg.norm(y[pairs[:, 0]] - y[pairs[:, 1]], axis=1)
    rel = np.abs(dy - dx) / dx
    assert rel.mean() < 0.35
    # deterministic: a second run reproduces bit-identically
    out2 = pa.concat_tables(
        random_projection(ds, out_dim=16).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).to_pandas().sort_values("vec_id")
    y2 = np.asarray([np.asarray(v) for v in out2["proj"]])
    assert np.array_equal(y, y2)


@pytest.mark.usefixtures("ray_session")
def test_mmr_diversifies_across_clusters():
    import ray.data

    from pdf_extractor_ray.stages.similarity import mmr_topk

    # two tight clusters, both relevant to the query; plain top-3 is
    # all cluster A (marginally closer), MMR must mix in cluster B
    a = np.array([1.0, 0.02, 0.0])
    b = np.array([1.0, -0.02, 0.0])
    vecs, ids = [], []
    for i in range(5):
        vecs.append(a + np.array([0.0, 0.0001 * i, 0.0]))
        ids.append(i)
    for i in range(5):
        vecs.append(b + np.array([0.0, -0.0001 * i, 0.0]))
        ids.append(100 + i)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
            }
        )
    )
    query = [1.0, 0.01, 0.0]  # nearer cluster A
    got = mmr_topk(ds, query, k=3, lam=0.5, fetch=10).to_pandas()
    assert got["rank"].tolist() == [1, 2, 3]
    picked = set(got["vec_id"])
    assert any(v < 100 for v in picked) and any(v >= 100 for v in picked)


@pytest.mark.usefixtures("ray_session")
def test_bootstrap_ci_covers_mean_and_shrinks():
    import duckdb

    from pdf_extractor_ray.pipelines.queries import QUERIES

    small = QUERIES["bootstrap_ci"]("/root/testdata/sf0.001").to_pandas()
    # sf0.001 and sf0.01 both hold 500 documents — sf0.1 (5000) is the
    # 10×-rows comparison point for the width-shrink law
    big = QUERIES["bootstrap_ci"]("/root/testdata/sf0.1").to_pandas()
    for sf, got in (("sf0.001", small), ("sf0.1", big)):
        true = duckdb.sql(
            f"SELECT avg(n_chars) FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchone()[0]
        assert got["ci_lo"].iloc[0] <= true <= got["ci_hi"].iloc[0]
        assert got["n_replicates"].iloc[0] == 200
    w_small = small["ci_hi"].iloc[0] - small["ci_lo"].iloc[0]
    w_big = big["ci_hi"].iloc[0] - big["ci_lo"].iloc[0]
    # 10× the rows → CI roughly 1/√10 as wide; assert a loose 2× shrink
    assert w_big < w_small / 2
    # deterministic: identical on a second run (hash-seeded weights)
    again = QUERIES["bootstrap_ci"]("/root/testdata/sf0.001").to_pandas()
    assert again.equals(small)


@pytest.mark.usefixtures("ray_session")
def test_winnow_decontaminate_flags_planted_copy(tmp_path):
    # doc 20 is the eval doc (20 % 20 == 0); doc 21 copies it exactly
    # (contaminated); docs 22/23 are unrelated texts sharing no long
    # character n-grams with the eval doc
    eval_text = "the quick brown fox jumps over the lazy dog again and again tonight"
    texts = {
        20: eval_text,
        21: eval_text,
        22: "zebras wander across violet canyons while thunder rumbles far away",
        23: "quantum ledgers hum beneath frozen observatories during polar dusk",
    }
    docs = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([len(t) for t in texts.values()], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from pdf_extractor_ray.pipelines.queries import QUERIES

    got = QUERIES["winnow_decontaminate"](str(tmp_path)).to_pandas()
    assert got["doc_id"].tolist() == [21]
    assert got["n_shared"].iloc[0] >= 3


def test_i4_money_matches_duckdb_semantics():
    import duckdb

    rng = np.random.RandomState(5)
    vals = np.concatenate(
        [
            rng.randint(0, 10**13, size=500),
            np.arange(0, 400),  # dense small values incl. every half-cent
            np.array([50, 150, 250, 10**13 + 50]),
        ]
    ).astype(np.int64)
    got = _i4_to_money(vals)
    con = duckdb.connect()
    con.execute("CREATE TABLE v(x BIGINT)")
    con.executemany("INSERT INTO v VALUES (?)", [(int(v),) for v in vals])
    exp = con.execute("SELECT ((x + 50) // 100) / 100.0 FROM v").df().iloc[:, 0].to_numpy()
    assert np.array_equal(got, exp)


def _write_lineitem_graph(tmp_path, part_supps, excluded=()):
    """lineitem lake whose co-supply graph is exactly the given
    {part: [suppliers]} map; ``excluded`` rows get quantity above the
    _TRI_QTY_MAX gate and must not contribute edges."""
    rows_p, rows_s, rows_q = [], [], []
    for p, supps in part_supps.items():
        for s in supps:
            rows_p.append(p)
            rows_s.append(s)
            rows_q.append(1.0)
    for p, s in excluded:
        rows_p.append(p)
        rows_s.append(s)
        rows_q.append(50.0)
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(rows_p, pa.int64()),
                "l_suppkey": pa.array(rows_s, pa.int64()),
                "l_quantity": pa.array(rows_q, pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_planted_graph(tmp_path):
    """K4 on {1,2,3,4} (built from ONE 3-supplier part plus pair parts,
    so cross-part edge dedup is exercised) + a star hub 0→{5,6,7,8}
    (wedge-rich, triangle-free — the degree-ordered orientation must
    not explode or miscount at the hub) + one quantity-excluded row."""
    from pdf_extractor_ray.pipelines.queries import q_degree_dist, q_triangle_count

    part_supps = {
        100: [1, 2, 3],          # clique part → edges 12, 13, 23
        101: [1, 2],             # duplicate edge 12 via a second part
        102: [1, 4],
        103: [2, 4],
        104: [3, 4],
        105: [0, 5],
        106: [0, 6],
        107: [0, 7],
        108: [0, 8],
    }
    _write_lineitem_graph(tmp_path, part_supps, excluded=[(109, 0), (109, 1)])

    tri = q_triangle_count(str(tmp_path)).to_pydict()
    # K4 has 4 triangles; every clique node sits in exactly 3; the
    # star contributes none
    assert tri == {"supp_node": [1, 2, 3, 4], "n_triangles": [3, 3, 3, 3]}

    # the planted graph is far below the local-path gate, so force the
    # DISTRIBUTED wedge/match pipeline (the 100-TB shape) and require
    # the identical result
    from pdf_extractor_ray.pipelines.queries import (
        _cosupply_edges,
        _triangles_distributed,
    )

    dist = (
        _triangles_distributed(_cosupply_edges(str(tmp_path)).materialize())
        .sort_by([("n_triangles", "descending"), ("supp_node", "ascending")])
        .to_pydict()
    )
    assert dist == tri

    deg = q_degree_dist(str(tmp_path)).to_pydict()
    # leaves 5-8 have degree 1, clique nodes degree 3, hub degree 4
    assert deg == {"degree": [1, 3, 4], "n_nodes": [4, 4, 1]}


@pytest.mark.usefixtures("ray_session")
def test_edge_jaccard_planted_graph(tmp_path):
    """Same K4 + star graph: every K4 edge shares the other two clique
    nodes (common=2, union=3+3-2=4 → J=0.5); every star edge shares
    nothing (common=0, union=4+1 → J=0.0).  Local and forced
    distributed paths must agree exactly."""
    from pdf_extractor_ray.pipelines.queries import (
        _cosupply_edges,
        _edge_jaccard_distributed,
        q_edge_jaccard,
    )

    part_supps = {
        100: [1, 2, 3],
        101: [1, 2],
        102: [1, 4],
        103: [2, 4],
        104: [3, 4],
        105: [0, 5],
        106: [0, 6],
        107: [0, 7],
        108: [0, 8],
    }
    _write_lineitem_graph(tmp_path, part_supps, excluded=[(109, 0), (109, 1)])

    got = q_edge_jaccard(str(tmp_path)).to_pydict()
    assert got == {
        "u": [1, 1, 1, 2, 2, 3, 0, 0, 0, 0],
        "v": [2, 3, 4, 3, 4, 4, 5, 6, 7, 8],
        "common_neighbors": [2, 2, 2, 2, 2, 2, 0, 0, 0, 0],
        "union_neighbors": [4, 4, 4, 4, 4, 4, 5, 5, 5, 5],
        "jaccard": [0.5] * 6 + [0.0] * 4,
    }

    dist = (
        _edge_jaccard_distributed(_cosupply_edges(str(tmp_path)).materialize())
        .to_pydict()
    )
    assert dist == got


@pytest.mark.usefixtures("ray_session")
def test_dbscan_planted_blobs(tmp_path):
    """Three well-separated 2-D blobs embedded in 64-d (structure in
    dims 0-1, tiny noise elsewhere) plus five isolated far points:
    DBSCAN must recover exactly three clusters with full purity and
    flag the isolates as noise (cluster −1)."""
    from pdf_extractor_ray.stages.similarity import dbscan_2d

    rng = np.random.RandomState(11)
    centers = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    rows, planted = [], []
    vid = 0
    for bi, (cx, cy) in enumerate(centers):
        for _ in range(60):
            v = np.zeros(64)
            v[0] = cx + rng.normal(0, 0.5)
            v[1] = cy + rng.normal(0, 0.5)
            v[2:] = rng.normal(0, 0.01, 62)
            rows.append((vid, v))
            planted.append(bi)
            vid += 1
    for i, (fx, fy) in enumerate([(50, 50), (-60, 40), (70, -30), (-80, -80), (90, 90)]):
        v = np.zeros(64)
        v[0], v[1] = fx, fy
        rows.append((vid, v))
        planted.append(-1)
        vid += 1
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1].tolist() for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    import ray.data

    ds = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    got = (
        pa.concat_tables(
            dbscan_2d(ds, eps=1.5, min_pts=8).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        .to_pandas()
        .set_index("vec_id")["cluster"]
    )
    assert len(got) == len(rows)
    planted = np.asarray(planted)
    ids = np.arange(len(rows))
    # isolates are noise
    assert (got[ids[planted == -1]] == -1).all()
    # each blob maps to exactly ONE cluster, and the three differ
    blob_clusters = set()
    for bi in range(3):
        vals = set(got[ids[planted == bi]])
        assert len(vals) == 1, f"blob {bi} split: {vals}"
        (c,) = vals
        assert c >= 0
        blob_clusters.add(c)
    assert len(blob_clusters) == 3

    # force the DISTRIBUTED grid/exchange path (local_max_bytes=0) —
    # identical assignment required
    dist = (
        pa.concat_tables(
            dbscan_2d(ds, eps=1.5, min_pts=8, local_max_bytes=0).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        .to_pandas()
        .set_index("vec_id")["cluster"]
    )
    assert dist.sort_index().equals(got.sort_index())


@pytest.mark.usefixtures("ray_session")
def test_graph_ops_empty_graph(tmp_path):
    """No line passes the quantity gate → zero edges: both graph
    queries must return empty tables with the right schema instead of
    crashing on empty exchanges."""
    from pdf_extractor_ray.pipelines.queries import q_degree_dist, q_triangle_count

    _write_lineitem_graph(tmp_path, {}, excluded=[(1, 1), (1, 2)])
    tri = q_triangle_count(str(tmp_path))
    assert tri.num_rows == 0
    assert tri.column_names == ["supp_node", "n_triangles"]
    deg = q_degree_dist(str(tmp_path))
    assert deg.num_rows == 0
    assert deg.column_names == ["degree", "n_nodes"]
    from pdf_extractor_ray.pipelines.queries import q_edge_jaccard

    ej = q_edge_jaccard(str(tmp_path))
    assert ej.num_rows == 0
    assert ej.column_names == [
        "u", "v", "common_neighbors", "union_neighbors", "jaccard",
    ]


@pytest.mark.usefixtures("ray_session")
def test_order_reconcile_lineless_order(tmp_path):
    """An order with no lines must surface with lines_micro = 0 and
    diff = −total (the LEFT-join semantics), not vanish."""
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.5], pa.float64()),
                "l_tax": pa.array([0.0, 0.1], pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_totalprice": pa.array([21.0, 99.0], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from pdf_extractor_ray.pipelines.queries import q_order_reconcile

    got = q_order_reconcile(str(tmp_path)).to_pandas().set_index("o_orderkey")
    # order 1: 10.0 + 20·0.5·1.1 = 21.0 exactly → diff 0
    assert got.loc[1, "lines_micro"] == 21_000_000 and got.loc[1, "diff_micro"] == 0
    assert got.loc[2, "lines_micro"] == 0 and got.loc[2, "diff_micro"] == -99_000_000


def test_kll_rank_error_and_merge_invariance():
    """KLL sketch: ≤2% rank error at k=200 on a skewed distribution
    split over many partials, and merge-order invariance after the
    deterministic partial sort the query layer applies."""
    from pdf_extractor_ray.functions import sketches as sk

    rng = np.random.RandomState(7)
    data = np.concatenate(
        [rng.lognormal(3, 1.5, 60_000), rng.uniform(0, 10, 40_000)]
    )
    chunks = np.array_split(data, 37)
    partials = []
    for c in chunks:
        s = sk.kll_new()
        sk.kll_update(s, c)
        partials.append(s)

    def merge_all(ps):
        m = ps[0]
        for p in ps[1:]:
            m = sk.kll_merge(m, p)
        return m

    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = sk.kll_quantiles(merge_all(partials), qs)
    srt = np.sort(data)
    for q, e in zip(qs, est):
        rank = np.searchsorted(srt, e, side="right") / len(data)
        assert abs(rank - q) <= 0.02, (q, e, rank)

    # serialize → deterministic order → identical result
    payloads = [sk.kll_serialize(p) for p in partials]
    payloads.sort(key=lambda p: (len(p), p[-1], p[0][:8] if p[0] else []))
    m1 = merge_all([sk.kll_deserialize(p) for p in payloads])
    m2 = merge_all([sk.kll_deserialize(p) for p in payloads])
    assert np.array_equal(sk.kll_quantiles(m1, qs), sk.kll_quantiles(m2, qs))
    # sketch stays small: total retained items ≈ k · levels
    assert sum(len(lv) for lv in m1["levels"]) <= 200 * len(m1["levels"])


@pytest.mark.usefixtures("ray_session")
def test_kll_query_runs(tmp_path):
    from pdf_extractor_ray.pipelines.queries import q_kll_quantiles

    n = 5000
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(np.arange(n), pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = q_kll_quantiles(str(tmp_path)).to_pandas()
    assert got["q"].tolist() == [0.25, 0.5, 0.75, 0.9, 0.99]
    # uniform 0..n: estimates within 2% of the true quantile values
    for q, e in zip(got["q"], got["n_chars_est"]):
        assert abs(e - q * n) <= 0.02 * n, (q, e)


@pytest.mark.usefixtures("ray_session")
def test_cc_chain_converges_with_pointer_jumping():
    """A 128-node path graph has diameter 127: plain min-label
    propagation blows the 25-round cap (it moves the min ONE hop per
    round), so this pins the shortcut (pointer-jumping) exchange —
    convergence must happen within the cap, with no RuntimeWarning."""
    import warnings

    import ray.data

    from pdf_extractor_ray.stages import dedup as dd

    edges = pa.table(
        {
            "id_a": pa.array(range(127), pa.int64()),
            "id_b": pa.array(range(1, 128), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(edges)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = (
            dd.connected_components(ds, local_max_bytes=0)
            .to_pandas()
            .sort_values("node")
        )
    assert len(out) == 128
    assert (out["label"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_contained_dedup_edge_cases(tmp_path, monkeypatch):
    """Adversarial containment fixture: empty text (contained in every
    other doc by SQL position('' IN x)=1 semantics), a short (<16-byte)
    candidate, multibyte UTF-8 containment, equal texts (mutually
    contained), an anchor-prefix false positive (shared 16-byte prefix,
    different suffix), and a 1-candidate-per-pass broadcast chunk so
    the multi-pass path is exercised — all checked against DuckDB."""
    import duckdb

    from pdf_extractor_ray.pipelines import queries as q

    big = "The quick brown fox jumps over the lazy dog near the river bank."
    uni = "héllo wörld ünïcode çontainment päyload"
    docs = [
        (0, big),                                  # container
        (1, "quick brown fox jumps over the lazy"),  # contained in 0
        (2, "fox"),                                # short, in 0 and 1
        (3, ""),                                   # empty: in all others
        (4, uni),                                  # container (multibyte)
        (5, "wörld ünïcode çon"),                  # contained in 4
        (6, "twin text payload AAAA"),             # equal pair
        (7, "twin text payload AAAA"),             # equal pair
        (8, big[:16] + " ENTIRELY DIFFERENT TAIL"),  # anchor FP vs 1? no:
        # shares doc 0's first-16-byte prefix with a different suffix —
        # the 128-bit verify must reject it
        (9, "nothing in common with anything else at all"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array(["s"] * len(docs), pa.string()),
                "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from pdf_extractor_ray.pipelines.queries import dedup_diag as qdd
    monkeypatch.setattr(qdd, "_CONTAIN_CHUNK", 1)  # force multi-pass
    got = q.q_contained_dedup(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
        % str(tmp_path / "documents.parquet")
    )
    exp = con.execute(q.SQL_CONTAINED_DEDUP).df()
    con.close()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_containers"].tolist() == exp["n_containers"].tolist()
    asmap = dict(zip(got["doc_id"], got["n_containers"]))
    assert asmap[3] == len(docs) - 1          # empty in every other doc
    assert asmap[1] == 1 and asmap[2] == 2    # planted containments
    assert asmap[5] == 1
    assert asmap[6] == 1 and asmap[7] == 1    # equal texts: mutual
    assert 8 not in asmap and 9 not in asmap  # FP rejected / no match
