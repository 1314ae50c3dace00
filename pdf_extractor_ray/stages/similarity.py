"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast
ONCE via ``ray.put`` and every batch does one numpy matmul against it
(never re-shipped per batch).  Scale path: IVF-style coarse
quantization — assign vectors to nearest of C centroids (broadcast),
search only matching buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_scorer(queries_ref, id_col: str, vec_col: str):
    """STATELESS scoring stage: per batch, cosine of every vector
    against the broadcast query matrix.  The matrix travels via
    ``ray.put`` once; ``ray.get`` inside the batch fn is a local
    object-store hit after the first fetch per worker (an actor pool
    here costs ~3 s of startup per query on this sandbox for state
    that is a few KB).  Scores are NOT rounded before the top-k sort —
    the DuckDB oracle orders by the unrounded cosine, and rounding
    first could flip the tie-break at the k cutoff for neighbors
    within 1e-6."""

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        q_ids = q["ids"]
        q_mat = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = _normalize(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64))
        cos = vecs @ q_mat.T  # (n, q)
        n, nq = cos.shape
        return pa.table(
            {
                "query_id": pa.array(np.repeat(q_ids, n), pa.int64()),
                "vec_id": pa.array(np.tile(ids, nq), pa.int64()),
                "cosine": pa.array(cos.T.reshape(-1), pa.float64()),
            }
        )

    return score


def brute_force_topk(
    ds,
    query_vectors: dict[int, list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Top-k cosine neighbors for each query vector.

    The per-batch stage emits (query_id, vec_id, cosine) partials; the
    top-k reduction is a per-query groupby over those small partials
    (pre-aggregation: each batch could cut to its own top-k, kept
    simple here because partials are 3 columns wide)."""
    q_ids = sorted(query_vectors)
    queries_ref = ray.put(
        {"ids": np.asarray(q_ids, dtype=np.int64), "vectors": [query_vectors[i] for i in q_ids]}
    )

    def topk_per_query(group: pd.DataFrame) -> pd.DataFrame:
        # deterministic: score desc, id asc
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True])
        return g.head(k)

    scored = ds.map_batches(
        brute_force_scorer(queries_ref, id_col, vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return scored.groupby("query_id").map_groups(topk_per_query, batch_format="pandas")


# --------------------------------------------------------------------------
# IVF-bucketed variant (the 100-TB scale path)
# --------------------------------------------------------------------------

def kmeans_centroids(ds, vec_col: str = "embedding", c: int = 16, iters: int = 5, seed: int = 3, sample: int = 2048):
    """Small deterministic SPHERICAL k-means on a driver-side sample
    (centroid table is tiny and broadcast; the full dataset is never
    pulled).  Vectors are unit-normalized before clustering so cell
    assignment agrees with the cosine search metric."""
    head = ds.limit(sample)
    vecs = _normalize(
        np.asarray([r[vec_col] for r in head.take(sample)], dtype=np.float64)
    )
    rng = np.random.RandomState(seed)
    cent = vecs[rng.choice(len(vecs), size=min(c, len(vecs)), replace=False)]
    for _ in range(iters):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(cent.shape[0]):
            m = vecs[assign == j]
            if len(m):
                cent[j] = m.mean(axis=0)
        cent = _normalize(cent)  # spherical: centroids stay on the unit sphere
    return cent


def ivf_topk(
    ds,
    query_vectors: dict[int, list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    nprobe: int = 10,
):
    """IVF search: assign every vector to its nearest centroid
    (broadcast centroids, one matmul per batch); for each query, scan
    only the ``nprobe`` nearest buckets.  Approximate by construction —
    recall is pinned ≥0.8 vs ``brute_force_topk`` by
    ``test_ivf_recall_vs_brute_force``.  The default nprobe (10 of 16
    cells) is tuned for the NEAR-UNIFORM synthetic embeddings — IVF's
    worst case; clustered real embeddings reach the same recall with
    far fewer probes, which is where the scan saving comes from."""
    if centroids is None:
        centroids = kmeans_centroids(ds, vec_col)
    cent_ref = ray.put(centroids)

    q_ids = sorted(query_vectors)
    q_mat = _normalize(np.asarray([query_vectors[i] for i in q_ids], dtype=np.float64))
    qd = ((q_mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_buckets = {qi: set(np.argsort(qd[n])[:nprobe].tolist()) for n, qi in enumerate(q_ids)}
    probes_ref = ray.put((q_ids, q_mat, probe_buckets))

    def ivf_score(batch: pa.Table) -> pa.Table:
        # stateless: broadcast refs are local object-store hits after
        # the first fetch per worker (see brute_force_scorer)
        cent = ray.get(cent_ref)
        q_ids, q_mat, probes = ray.get(probes_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        raw = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        unit = _normalize(raw)
        # assignment in UNIT space — matches the cosine metric
        d = ((unit[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        out_q, out_v, out_c = [], [], []
        for n, qi in enumerate(q_ids):
            mask = np.isin(assign, list(probes[qi]))
            if not mask.any():
                continue
            cos = unit[mask] @ q_mat[n]
            out_q.extend([qi] * int(mask.sum()))
            out_v.extend(ids[mask].tolist())
            # unrounded, like brute_force_scorer — rounding before the
            # top-k sort can flip the tie-break at the k cutoff
            out_c.extend(cos.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    def topk_per_query(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True])
        return g.head(k)

    scored = ds.map_batches(ivf_score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.groupby("query_id").map_groups(topk_per_query, batch_format="pandas")
