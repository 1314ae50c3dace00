"""Mass-duplicate flood pinning (round-2 ADVICE closure, e2e):
>3× verify_cap / max_cluster IDENTICAL embeddings defeat every
hyperplane sub-split (same side of every plane), so only the
bounded-window hard-chunk keeps the pairwise matmul bounded AND the
keep-min-id semantics intact across chunk boundaries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pdf_extractor_ray.stages.dedup import bounded_windows, embedding_neardup_pairs
from pdf_extractor_ray.stages.similarity import semantic_dedup

CAP = 32
FLOOD = 3 * CAP + 5  # strictly more than 3 windows of identical vectors
DIM = 16


def test_bounded_windows_bounds_and_connects():
    """Every window ≤ cap rows; windows cover the range; adjacent
    windows share exactly one row (the transitive-connectivity hook)."""
    spans = list(bounded_windows(FLOOD, CAP))
    assert all(e - s <= CAP for s, e in spans)
    assert spans[0][0] == 0 and spans[-1][1] == FLOOD
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 == e0 - 1  # one-row overlap
    # the matmul bound: sum of window areas ≪ n² for a flood
    assert sum((e - s) ** 2 for s, e in spans) < FLOOD**2 / 2


def _flood_table() -> pa.Table:
    rng = np.random.RandomState(5)
    base = rng.normal(size=DIM)
    base /= np.linalg.norm(base)
    vecs = [base.copy() for _ in range(FLOOD)]
    # distinct far-away vectors that must NOT be flagged
    for _ in range(20):
        v = rng.normal(size=DIM)
        v -= v @ base * base  # orthogonal to the flood direction
        vecs.append(v / np.linalg.norm(v))
    ids = list(range(len(vecs)))
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs]),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_flood_hard_chunk():
    ds = ray.data.from_arrow(_flood_table())
    pairs = (
        embedding_neardup_pairs(ds, verify_cap=CAP, cos_threshold=0.95)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    flood_ids = set(range(FLOOD))
    touched = set(pairs["id_a"]) | set(pairs["id_b"])
    # every flood member appears in at least one verified pair, and the
    # pair graph connects the WHOLE flood (one-row window overlap)
    assert flood_ids <= touched
    parent = list(range(FLOOD))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        if a in flood_ids and b in flood_ids:
            parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in flood_ids}) == 1
    # orthogonal vectors never pair with the flood
    assert not any(
        (a in flood_ids) != (b in flood_ids)
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    )


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_flood_keeps_min_id():
    ds = ray.data.from_arrow(_flood_table())
    flags = semantic_dedup(
        ds, k=2, threshold=0.99, max_cluster=CAP, n_total=FLOOD + 20
    ).to_pandas()
    flood = flags[flags["vec_id"] < FLOOD]
    assert len(flood) == FLOOD
    survivors = sorted(flood.loc[~flood["is_dup"], "vec_id"])
    # exactly one survivor — the minimum id — despite the flood spanning
    # multiple hard-chunk windows
    assert survivors == [0]
    others = flags[flags["vec_id"] >= FLOOD]
    assert not others["is_dup"].any()
