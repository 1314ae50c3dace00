"""Round-2 additions: review decision persistence (A6, reference
reviewer.py:204-285 merge semantics), IVF recall vs brute force, and
distributed connected components."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray
import ray.data

SF_DIR = "/root/testdata/sf0.01"


# --- review decisions --------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_review_decision_roundtrip(tmp_path):
    from pdf_extractor_ray.pipelines.review import (
        load_reviews,
        record_decisions,
        review_summary,
    )

    d = str(tmp_path / "reviews")
    # session 1: two decisions
    record_decisions(
        d,
        [
            {"conv_id": "c1", "turn_idx": 0, "unit_id": "2.9", "decision": "accept"},
            {"conv_id": "c1", "turn_idx": 1, "unit_id": "2.10", "decision": "reject"},
        ],
    )
    # session 2 (resume): flip 2.9 to reject, add a skip — newest wins
    record_decisions(
        d,
        [
            {"conv_id": "c1", "turn_idx": 0, "unit_id": "2.9", "decision": "reject"},
            {"conv_id": "c2", "turn_idx": 5, "unit_id": "3.1", "decision": "skip"},
        ],
    )
    merged = {
        (r["conv_id"], r["turn_idx"], r["unit_id"]): r["decision"]
        for r in load_reviews(d).take_all()
    }
    assert merged == {
        ("c1", 0, "2.9"): "reject",
        ("c1", 1, "2.10"): "reject",
        ("c2", 5, "3.1"): "skip",
    }
    summary = review_summary(d)
    assert summary == {"total": 3, "accepted": 0, "rejected": 2, "skipped": 1}


@pytest.mark.usefixtures("ray_session")
def test_review_same_batch_later_wins(tmp_path):
    from pdf_extractor_ray.pipelines.review import load_reviews, record_decisions

    d = str(tmp_path / "reviews")
    record_decisions(
        d,
        [
            {"conv_id": "c", "turn_idx": 0, "unit_id": "u", "decision": "accept"},
            {"conv_id": "c", "turn_idx": 0, "unit_id": "u", "decision": "skip"},
        ],
    )
    rows = load_reviews(d).take_all()
    assert len(rows) == 1 and rows[0]["decision"] == "skip"


def test_review_rejects_invalid_decision(tmp_path):
    from pdf_extractor_ray.pipelines.review import record_decisions

    with pytest.raises(ValueError):
        record_decisions(
            str(tmp_path), [{"conv_id": "c", "turn_idx": 0, "decision": "maybe"}]
        )


@pytest.mark.usefixtures("ray_session")
def test_review_summary_empty(tmp_path):
    from pdf_extractor_ray.pipelines.review import review_summary

    assert review_summary(str(tmp_path / "nothing"))["total"] == 0


# --- IVF recall --------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_brute_force():
    """ann_ivf is approximate by construction — pin the approximation:
    recall@10 vs the exact brute-force neighbors must be ≥ 0.8 on the
    sf0.01 embeddings (seeded, deterministic)."""
    from pdf_extractor_ray.pipelines.queries import _query_vectors
    from pdf_extractor_ray.stages.similarity import brute_force_topk, ivf_topk

    import os

    path = os.path.join(SF_DIR, "embeddings.parquet")
    qv = _query_vectors(SF_DIR)

    def neighbors(fn):
        ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        out = {}
        for r in fn(ds, qv, k=10).take_all():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = neighbors(brute_force_topk)
    approx = neighbors(ivf_topk)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert len(recalls) == 3
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.8, f"recall@10 {mean_recall:.2f} < 0.8 ({recalls})"


# --- multimodal resize / frame-sample plumbing -------------------------


@pytest.mark.usefixtures("ray_session")
def test_resize_and_frame_sample_plumbing():
    from pdf_extractor_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
        sample_frames,
    )

    media = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "kind": pa.array(["image", "video"], pa.string()),
                "payload": pa.array([b"img-bytes", b"vid-bytes"], pa.binary()),
                "meta": pa.array(
                    [
                        {"width": 640, "height": 480, "duration_ms": 0},
                        {"width": 0, "height": 0, "duration_ms": 2100},
                    ],
                    MEDIA_SCHEMA.field("meta").type,
                ),
            }
        )
    )
    resized = resize_media(media, 64, 64).take_all()
    assert all(r["meta"]["width"] == 64 and r["meta"]["height"] == 64 for r in resized)
    assert all(len(r["payload"]) == 32 for r in resized)
    # determinism: same payload → same fake pixels
    again = resize_media(media, 64, 64).take_all()
    assert [r["payload"] for r in again] == [r["payload"] for r in resized]

    frames = sample_frames(media, every_ms=500).take_all()
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    assert 1 not in by_media  # duration 0 → no frames
    vid = sorted(by_media[2], key=lambda f: f["frame_idx"])
    assert [f["ts_ms"] for f in vid] == [0, 500, 1000, 1500]  # 2100ms // 500
    assert len({f["payload"] for f in vid}) == len(vid)  # per-frame payloads


# --- review priority routing -------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_review_priorities_routing():
    """Reference thresholds: remaining refs → medium; broken snippet →
    high; resolved row missing its inline marker (corruption) → high;
    clean row → none / passed."""
    from pdf_extractor_ray.pipelines.evaluate import review_priorities

    def row(conv, unit, text, resolved=False):
        return {
            "conv_id": conv,
            "turn_idx": 0,
            "unit_id": unit,
            "extracted_text": text,
            "flags": {
                "continued": False,
                "resolved": resolved,
                "had_refs": resolved,
                "parse_error": False,
            },
        }

    ds = ray.data.from_items(
        [
            row("c", "1.1", "Clean answer with no issues."),
            row("c", "1.2", "Uses Theorem 2.5 without resolution."),
            row("c", "1.3", "Unbalanced brace { breaks the snippet."),
            row("c", "1.4", "Resolved. [Context from 2.5: inlined.]", resolved=True),
            row("c", "1.5", "Claims resolved but marker missing.", resolved=True),
        ]
    )
    got = {r["unit_id"]: r for r in review_priorities(ds).take_all()}
    assert got["1.1"]["review_priority"] == "none" and got["1.1"]["passed"]
    assert got["1.2"]["review_priority"] == "medium" and not got["1.2"]["passed"]
    assert got["1.3"]["review_priority"] == "high" and not got["1.3"]["latex_ok"]
    assert got["1.4"]["review_priority"] == "none"
    assert got["1.4"]["answer_similarity"] == 1.0
    assert got["1.5"]["review_priority"] == "high"
    assert got["1.5"]["answer_similarity"] == 0.0


# --- embedding dedup survivors -----------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_embed_dedup_drops_planted_copies():
    """The planted near-copies (vec_id + 1_000_000) lose to their
    originals (min id wins); every base vector survives."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.queries import q_embed_dedup

    base_ids = set(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id"])
        .column("vec_id")
        .to_pylist()
    )
    got = set(q_embed_dedup(SF_DIR).column("vec_id").to_pylist())
    assert got == base_ids


# --- connected components ----------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_connected_components_random_vs_union_find():
    """Cross-validate the distributed label propagation against a
    plain union-find on seeded random graphs (incl. long chains that
    need several propagation rounds)."""
    import random

    from pdf_extractor_ray.stages.dedup import connected_components

    # one seeded graph (label propagation costs one distributed round
    # per chain hop — keep the chain short so the suite stays fast)
    for seed, n_nodes, n_edges in ((2, 60, 80),):
        rng = random.Random(seed)
        edges = [
            tuple(sorted(rng.sample(range(n_nodes), 2))) for _ in range(n_edges)
        ]
        # add a chain to force multi-round propagation
        chain = list(range(n_nodes, n_nodes + 4))
        edges += list(zip(chain, chain[1:]))

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([a for a, _ in edges], pa.int64()),
                    "id_b": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        )
        # both paths must agree with union-find: the size-gated local
        # numpy solve (default — this graph is tiny) and the
        # distributed label-propagation rounds (forced via gate=0)
        got_local = {
            r["node"]: r["label"] for r in connected_components(pairs).take_all()
        }
        got_dist = {
            r["node"]: r["label"]
            for r in connected_components(pairs, local_max_bytes=0).take_all()
        }
        assert got_local == want, f"seed {seed}: local mismatch"
        assert got_dist == want, f"seed {seed}: distributed mismatch"


@pytest.mark.usefixtures("ray_session")
def test_connected_components_chain_and_clique():
    """Chain 1-2-3-4 collapses to label 1 (multi-round propagation);
    disjoint pair (10,11) keeps its own component."""
    from pdf_extractor_ray.stages.dedup import connected_components

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 2, 3, 10], pa.int64()),
                "id_b": pa.array([2, 3, 4, 11], pa.int64()),
            }
        )
    )
    # force the distributed path — a chain is the multi-round case
    got = sorted(
        (r["node"], r["label"])
        for r in connected_components(pairs, local_max_bytes=0).take_all()
    )
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)]


@pytest.mark.usefixtures("ray_session")
def test_pagerank_distributed_matches_local():
    """The distributed power-iteration path (forced via a zero gate)
    must match the local numpy path to float tolerance on a planted
    graph, and both must rank the hub first."""
    import numpy as np
    import pyarrow as pa

    import pdf_extractor_ray.pipelines.queries as Q

    # star graph (node 0 is the hub) + a detached triangle
    star = [(0, i) for i in range(1, 8)]
    tri = [(100, 101), (101, 102), (102, 100)]
    src, dst = zip(*(star + tri))
    both = pa.table(
        {
            "src": pa.array(list(src) + list(dst), pa.int64()),
            "dst": pa.array(list(dst) + list(src), pa.int64()),
        }
    )
    local = Q._pr_local(both).to_pandas().set_index("node")["rank"]

    e = ray.data.from_arrow(both)
    dist = (
        Q._pagerank_distributed(e).to_pandas().set_index("node")["rank"]
    )
    assert set(local.index) == set(dist.index)
    for n in local.index:
        assert abs(local[n] - dist[n]) < 1e-9, (n, local[n], dist[n])
    assert local.idxmax() == 0  # the hub dominates
