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

from .dedup import bounded_windows as _bounded_windows


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def vecs_to_numpy(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix WITHOUT a Python
    per-row loop: flatten the list buffer and reshape (valid when all
    rows share one length, which an embedding column guarantees —
    verified, with a to_pylist fallback for ragged input).  ~20×
    cheaper than np.asarray(col.to_pylist()) on wide batches."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        if isinstance(col, pa.FixedSizeListArray):
            if col.null_count:  # a null row would reshape into garbage
                return np.asarray(col.to_pylist(), dtype=np.float64)
            d = col.type.list_size
            # flatten() (not .values) — slice- and null-offset-aware
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            return flat.reshape(len(col), d)
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if col.null_count == 0 and len(widths) and (widths == widths[0]).all():
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            return flat.reshape(len(col), int(widths[0]))
    return np.asarray(col.to_pylist(), dtype=np.float64)


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
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        vecs = _normalize(vecs_to_numpy(batch.column(vec_col)))
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
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        unit = _normalize(vecs_to_numpy(batch.column(vec_col)))
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


# --------------------------------------------------------------------------
# distributed k-means (training-data curation / semantic clustering)
# --------------------------------------------------------------------------

#: Per-round moment partials (blocks × k rows) below this are summed on
#: the driver (~0.7 s/round) instead of a groupby exchange (~2 s/round
#: of shuffle setup on this box); above it the distributed exchange
#: bounds driver memory.  Module-level so tests can force either path.
KMEANS_DRIVER_REDUCE_MAX_ROWS = 65536

def kmeans_fit(
    ds,
    k: int = 10,
    vec_col: str = "embedding",
    max_iters: int = 10,
    tol: float = 1e-4,
    seed: int = 3,
    sample: int = 2048,
    n_total: int | None = None,
    materialize: bool = True,
) -> np.ndarray:
    """Distributed spherical Lloyd's over the FULL dataset (unlike
    ``kmeans_centroids``, which clusters a driver-side sample for IVF
    coarse quantization).  Per round: centroids broadcast once via
    ``ray.put``; every batch does one matmul assignment and collapses
    to exactly k MOMENT rows (cluster, n, s0..s{d-1}) — the mergeable
    combiner — so the exchange moves O(k·d) per batch and the driver
    only ever sees the k×(d+2) summed moment table, never vectors.
    Rounds are full streaming passes; stops early when the max centroid
    shift (L2) drops below ``tol``.  Deterministic up to FP summation
    order across partitions.

    ``materialize=True`` (default) pins the input blocks in the object
    store before iterating — Lloyd's re-executes the input pipeline
    EVERY round otherwise (a lazy Dataset re-reads parquet per pass;
    measured 27 s → ~8 s at sf0.1/8 rounds).  The object store spills
    to disk past its cap, so this is safe at scale; pass False to
    trade round speed for zero pinned storage."""
    from ray.data.aggregate import Sum

    if materialize:
        ds = ds.materialize()
    # k-means++ seeding on a bounded driver-side sample (plain random
    # seeds can land two in one true cluster and zero in another —
    # Lloyd's cannot escape that; ++ spreads seeds by squared distance).
    # The sample must be SPREAD, not ds.limit(): the head of the lake
    # can miss whole clusters, leaving them seedless forever.
    if n_total is None:  # callers with parquet inputs should pass the
        n_total = ds.count()  # metadata row count and skip this pass
    frac = min(1.0, sample / max(n_total, 1))
    head = ds if frac >= 1.0 else ds.random_sample(frac, seed=seed)
    sv = _normalize(np.asarray([r[vec_col] for r in head.take(sample)], dtype=np.float64))
    rng = np.random.RandomState(seed)
    k = min(k, len(sv))
    seeds = [int(rng.randint(len(sv)))]
    d2 = ((sv - sv[seeds[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = int(rng.choice(len(sv), p=p))
        seeds.append(nxt)
        d2 = np.minimum(d2, ((sv - sv[nxt]) ** 2).sum(axis=1))
    cent = sv[seeds].copy()
    d = cent.shape[1]
    scols = [f"s{i}" for i in range(d)]

    def moments_fn(cent_ref):
        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            unit = _normalize(vecs_to_numpy(batch.column(vec_col)))
            assign = (unit @ c.T).argmax(axis=1)
            n = np.bincount(assign, minlength=k).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, unit)
            cols: dict[str, pa.Array] = {
                "cluster": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
            for i, sc in enumerate(scols):
                cols[sc] = pa.array(sums[:, i], pa.float64())
            return pa.table(cols)

        return partial

    # Reduce strategy per round: each block emits k moment rows, so the
    # driver can sum blocks×k rows directly when that count is modest —
    # a groupby("cluster") exchange costs ~2 s of shuffle setup PER
    # ROUND on this box vs ~0.7 s for the driver reduce.  Past the
    # threshold (huge block counts × wide k·d), fall back to the
    # distributed exchange so the driver never holds O(blocks·k·d).
    try:
        n_blocks = ds.num_blocks()
    except Exception:
        n_blocks = 1 << 20  # unknown → assume large, use the exchange
    driver_reduce = n_blocks * k <= KMEANS_DRIVER_REDUCE_MAX_ROWS

    for _ in range(max_iters):
        cent_ref = ray.put(cent)
        partials = ds.map_batches(
            moments_fn(cent_ref), batch_format="pyarrow", zero_copy_batch=True
        )
        if driver_reduce:
            pdf = pd.concat(
                [b.to_pandas() for b in partials.iter_batches(batch_format="pyarrow", batch_size=None)]
            )
            g = pdf.groupby("cluster", sort=False).sum()
            rows = {
                int(c): {"n": int(r["n"]), **{sc: r[sc] for sc in scols}}
                for c, r in g.iterrows()
            }
        else:
            agg = partials.groupby("cluster").aggregate(
                Sum("n", alias_name="n"),
                *[Sum(sc, alias_name=sc) for sc in scols],
            )
            rows = {r["cluster"]: r for r in agg.take_all()}  # ≤ k rows
        new_cent = cent.copy()
        for j in range(k):
            r = rows.get(j)
            if r and r["n"] > 0:
                new_cent[j] = np.array([r[sc] for sc in scols]) / r["n"]
        new_cent = _normalize(new_cent)
        shift = float(np.sqrt(((new_cent - cent) ** 2).sum(axis=1)).max())
        cent = new_cent
        if shift < tol:
            break
    return cent


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Attach a ``cluster`` (int64) and ``cos_to_centroid`` (float64)
    column — centroids broadcast once, one matmul per batch."""
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        unit = _normalize(vecs_to_numpy(batch.column(vec_col)))
        cos = unit @ c.T
        a = cos.argmax(axis=1)
        return batch.append_column(
            "cluster", pa.array(a.astype(np.int64), pa.int64())
        ).append_column(
            "cos_to_centroid",
            pa.array(cos[np.arange(len(a)), a], pa.float64()),
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
# k-means buckets bound the quadratic — pairwise cosine runs only
# WITHIN a cluster, never across the corpus.
# --------------------------------------------------------------------------

#: Pairwise cosine runs only inside sub-buckets of at most this many
#: vectors.  A real lake's kmeans clusters are SKEWED — measured on a
#: 20k-vector table: one spherical-kmeans cluster captured 18,200
#: vectors, whose 18,200² cosine matrix (2.6 GB, O(n²)) hung the
#: prune task.  Oversized clusters are LSH-sub-split (seeded random
#: hyperplanes) until under the cap.
SEMDEDUP_MAX_CLUSTER = 4096


def semantic_dedup(
    ds,
    k: int = 8,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iters: int = 8,
    seed: int = 3,
    n_total: int | None = None,
    max_cluster: int = SEMDEDUP_MAX_CLUSTER,
):
    """Drop near-semantic duplicates: fit k-means (broadcast-centroid
    rounds, moment partials), assign every vector, then inside each
    cluster mark a vector a duplicate when its cosine to a LOWER-id
    cluster member exceeds ``threshold`` (keep-min-id, matching the
    exact-dedup convention).

    Skew guard: a cluster larger than ``max_cluster`` is sub-split
    with deterministic random-hyperplane bits (one extra bit per round,
    applied only to still-oversized sub-buckets) before the pairwise
    verify — near-identical vectors land on the same side of every
    hyperplane with overwhelming probability, so recall loss is
    confined to pairs merely NEAR the threshold (the same trade
    embedding LSH makes).  This bounds the per-group matmul at
    max_cluster² regardless of how skewed the kmeans clustering is."""
    cent = kmeans_fit(
        ds, k=k, vec_col=vec_col, max_iters=max_iters, seed=seed, n_total=n_total
    )
    assigned = kmeans_assign(ds, cent, vec_col=vec_col).select_columns(
        [id_col, vec_col, "cluster"]
    )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        unit = _normalize(np.stack(g[vec_col].to_numpy()[order]).astype(np.float64))
        n, d = unit.shape
        # LSH sub-split of an oversized cluster (deterministic planes)
        labels = np.zeros(n, dtype=np.int64)
        rng = np.random.RandomState(seed + 101)
        for _ in range(32):
            counts = np.bincount(labels)
            oversized = np.flatnonzero(counts > max_cluster)
            if not len(oversized):
                break
            side = (unit @ rng.normal(size=d)) > 0
            mask = np.isin(labels, oversized)
            labels = labels * 2 + np.where(mask, side, 0)
            # compact label space so bincount stays small
            _, labels = np.unique(labels, return_inverse=True)
        dup = np.zeros(n, dtype=bool)
        for lbl in np.unique(labels):
            m = np.flatnonzero(labels == lbl)
            # bounded_windows: a flood of identical vectors defeats the
            # hyperplane splits (same side of every plane), so the label
            # is hard-chunked into max_cluster windows overlapping by one
            # id-sorted row; OR-ing dup flags across windows preserves
            # keep-min-id for mass duplicates (the overlap row carries
            # dup status across the chunk boundary).
            for s, e in _bounded_windows(len(m), max_cluster):
                w = m[s:e]
                sub = unit[w]
                cos = sub @ sub.T
                dup[w] |= (np.triu(cos, 1) > threshold).any(axis=0)
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "cluster": pd.Series(g["cluster"].to_numpy()[order], dtype="int64"),
                "is_dup": pd.Series(dup, dtype="bool"),
            }
        )

    flagged = assigned.groupby("cluster").map_groups(prune, batch_format="pandas")
    return flagged


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (embedding compression)
# --------------------------------------------------------------------------


def random_projection(ds, out_dim: int = 16, vec_col: str = "embedding",
                      id_col: str = "vec_id", seed: int = 7):
    """Project every embedding to ``out_dim`` dims with a Gaussian
    matrix scaled 1/√out_dim (the JL construction: expected pairwise
    L2 distances are preserved, distortion ~1/√out_dim).

    Map-only — ONE matmul per batch, no exchange at any scale.  The
    d×out_dim matrix is regenerated per batch from a fixed seed
    instead of broadcast: it is a few KB and deterministic, so
    regeneration is cheaper than shipping a ref and keeps the stage
    stateless (resume-safe).  Output: id + list<float64> ``proj``.
    """

    def project(batch: pa.Table) -> pa.Table:
        x = vecs_to_numpy(batch.column(vec_col))
        rng = np.random.RandomState(seed)
        r = rng.normal(size=(x.shape[1], out_dim)) / np.sqrt(out_dim)
        y = x.astype(np.float64) @ r
        return pa.table(
            {
                id_col: batch.column(id_col),
                "proj": pa.array(list(y), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# MMR diverse top-k (maximal marginal relevance re-ranking)
# --------------------------------------------------------------------------


def mmr_topk(ds, query_vector, k: int = 10, lam: float = 0.5,
             fetch: int = 100, vec_col: str = "embedding",
             id_col: str = "vec_id"):
    """Diverse top-k: fetch the ``fetch`` nearest candidates by cosine
    (distributed brute-force stage — the scale-bearing part), then run
    the greedy MMR re-rank on the driver over the fetch×d candidate
    matrix: each step picks argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    deterministic id tie-break.  The driver never holds more than
    ``fetch`` vectors; at 100 TB swap the brute-force stage for
    ivf_topk and the re-rank is unchanged.  Returns (rank, vec_id,
    cosine) — rows-only check (greedy re-ranking has no SQL analogue).
    """
    qv = _normalize(np.asarray([query_vector], dtype=np.float64))[0]

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        vecs = _normalize(vecs_to_numpy(batch.column(vec_col)))
        cos = vecs @ qv
        # per-batch combiner: only this batch's own top-`fetch` rows
        # (with their vectors) survive — the exchange moves O(fetch)
        # rows per batch, never the corpus
        order = np.lexsort((ids, -cos))[:fetch]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "cosine": pa.array(cos[order], pa.float64()),
                "vec": pa.array(list(vecs[order]), pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    tables = list(parts.iter_batches(batch_format="pyarrow", batch_size=None))
    cand = pa.concat_tables(tables) if tables else None
    out_schema = pa.schema(
        [("rank", pa.int32()), (id_col, pa.int64()), ("cosine", pa.float64())]
    )
    if cand is None or cand.num_rows == 0:
        return out_schema.empty_table()
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    cos = cand.column("cosine").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -cos))[:fetch]
    ids, cos = ids[order], cos[order]
    vecs = np.asarray(
        [np.asarray(v) for v in cand.column("vec").take(pa.array(order)).to_pylist()]
    )
    picked: list[int] = []
    max_sim = np.full(len(ids), -np.inf)
    for _ in range(min(k, len(ids))):
        mmr = lam * cos - (1.0 - lam) * np.where(
            np.isinf(max_sim), 0.0, max_sim
        ) * (len(picked) > 0)
        mmr[picked] = -np.inf
        # deterministic: best score, then smallest id
        best = np.lexsort((ids, -mmr))[0]
        picked.append(int(best))
        max_sim = np.maximum(max_sim, vecs @ vecs[best])
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(picked) + 1, dtype=np.int32), pa.int32()),
            id_col: pa.array(ids[picked], pa.int64()),
            "cosine": pa.array(cos[picked], pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Grid-bucketed DBSCAN over the 2-D PCA projection
# --------------------------------------------------------------------------

_DBSCAN_BUCKETS = 32
_DBSCAN_CHUNK = 1024  # owner-side slice of the per-cell distance matmul


def pca_project_2d(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """(id, x, y) projection onto the top-2 principal components plus
    the full eigenvalue spectrum.  One O(d²)-per-batch moment pass
    ((n, Σx, Σxxᵀ) rows — never O(vectors) — the q_embed_pca shape),
    driver eigensolve, then a map-side matmul with the (mean, W)
    broadcast once via ray.put.  Eigenvector signs are canonicalized
    (largest-|component| positive) so the projection is reproducible."""

    def moments(b: pa.Table) -> pa.Table:
        x = vecs_to_numpy(b.column(vec_col))
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
                "g": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
            }
        )

    mats = list(
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    t = pa.concat_tables(mats)
    n = sum(v.as_py() for v in t.column("n"))
    s = np.sum([np.asarray(v) for v in t.column("s").to_pylist()], axis=0)
    g = np.sum([np.asarray(v) for v in t.column("g").to_pylist()], axis=0)
    d = len(s)
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    ev, w = np.linalg.eigh(cov)
    w2 = w[:, [-1, -2]].copy()
    for j in range(2):  # canonical sign
        k = int(np.argmax(np.abs(w2[:, j])))
        if w2[k, j] < 0:
            w2[:, j] = -w2[:, j]
    ref = ray.put((mean, w2))

    def project(b: pa.Table) -> pa.Table:
        m, ww = ray.get(ref)
        p = (vecs_to_numpy(b.column(vec_col)) - m) @ ww
        return pa.table(
            {
                id_col: b.column(id_col).cast(pa.int64()),
                "x": pa.array(p[:, 0], pa.float64()),
                "y": pa.array(p[:, 1], pa.float64()),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        ev[::-1],
    )


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    # bit-packed (cx, cy) — 2^20 cells per axis around the origin
    off = np.int64(1 << 20)
    return ((cx + off) << np.int64(21)) | (cy + off)


def _cell_bucketed(ds, fn):
    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("cell").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_bucket", pa.array((k % _DBSCAN_BUCKETS).astype("int32"))
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_DBSCAN_BUCKETS)
        .map_groups(fn, batch_format="pandas")
    )


def _replicate_cells(ds, side: float, extra_cols: tuple = (), reach: int = 2):
    """Each point lands in its own cell plus every neighbor within
    ``reach`` (the Gunawan grid: side = ε/√2, reach = 2, so one cell is
    an ε-clique and every ε-neighbor pair shares at least one replica
    cell); ``own`` marks the single replica the point is owned at."""
    offs = [(dx, dy) for dx in range(-reach, reach + 1) for dy in range(-reach, reach + 1)]

    def rep(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        cx = np.floor(x / side).astype(np.int64)
        cy = np.floor(y / side).astype(np.int64)
        n = len(x)
        cols = {c: b.column(c).to_numpy(zero_copy_only=False) for c in b.column_names}
        out_cell, out_own = [], []
        for dx, dy in offs:
            out_cell.append(_cell_key(cx + dx, cy + dy))
            out_own.append(np.full(n, 1 if (dx == 0 and dy == 0) else 0, np.int8))
        rep_n = len(offs)
        data = {
            "cell": pa.array(np.concatenate(out_cell), pa.int64()),
            "own": pa.array(np.concatenate(out_own), pa.int8()),
            "x": pa.array(np.tile(cols["x"], rep_n), pa.float64()),
            "y": pa.array(np.tile(cols["y"], rep_n), pa.float64()),
        }
        for c in extra_cols:
            data[c] = pa.array(np.tile(cols[c], rep_n))
        return pa.table(data)

    return ds.map_batches(rep, batch_format="pyarrow", zero_copy_batch=True)


def _cell_join_idx(own_cells: np.ndarray, ref_cells_sorted: np.ndarray):
    """Index pairs (o_rep, r_idx) of every (owner, ref) combination
    sharing a cell key — the numpy equi-join: unique blocks of the
    SORTED ref side + repeat/arange segment expansion.  O(pairs) flat
    int arrays, no per-cell loop, no DataFrame intermediates."""
    uniq, start = np.unique(ref_cells_sorted, return_index=True)
    block_len = np.append(start[1:], len(ref_cells_sorted)) - start
    pos = np.searchsorted(uniq, own_cells)
    pos_c = np.minimum(pos, max(len(uniq) - 1, 0))
    match = (len(uniq) > 0) & (uniq[pos_c] == own_cells) if len(uniq) else np.zeros(
        len(own_cells), bool
    )
    idx = pos_c[match]
    reps = block_len[idx]
    total = int(reps.sum())
    o_rep = np.repeat(np.nonzero(match)[0], reps)
    base = np.repeat(start[idx], reps)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    return o_rep, base + offs


def _pairwise_within(ax, ay, bx, by, eps2):
    """Boolean (len(a) × len(b)) ε-ball mask, owner-chunked so the
    matmul is memory-bounded regardless of cell population (the
    verify_cap lesson: bound the quadratic COMPUTE, exactness free)."""
    d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    return d2 <= eps2


# measured crossover: 1M projected points (24 MB) run 71.9 s
# distributed vs 411 s through the single-process twin — the gate only
# shields the fixed per-exchange cost, so it sits well below the
# dedup-CC gates (8 MB ≈ 340k points)
_DBSCAN_LOCAL_MAX_BYTES = 8 << 20


def _dbscan_local_path(proj, side, min_pts, id_col, count_cell, edges_cell):
    """Driver-side twin of the distributed grid phases: the SAME cell
    kernels run over one in-process replicated frame, with the dedup
    module's vectorized pointer-jumping CC — semantics identical by
    construction (the planted test compares the two paths)."""
    import ray.data

    from . import dedup as _dd

    out_schema = pa.schema([(id_col, pa.int64()), ("cluster", pa.int64())])
    tbls = list(proj.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tbls:
        return ray.data.from_arrow(out_schema.empty_table())
    pdf = pa.concat_tables(tbls).to_pandas()

    offs = [(dx, dy) for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)]

    def rep_local(df: pd.DataFrame, extra: tuple) -> pd.DataFrame:
        x = df["x"].to_numpy()
        y = df["y"].to_numpy()
        cx = np.floor(x / side).astype(np.int64)
        cy = np.floor(y / side).astype(np.int64)
        n = len(df)
        cells, owns = [], []
        for dx, dy in offs:
            cells.append(_cell_key(cx + dx, cy + dy))
            owns.append(np.full(n, 1 if (dx == 0 and dy == 0) else 0, np.int8))
        rep_n = len(offs)
        out = pd.DataFrame(
            {
                "cell": np.concatenate(cells),
                "own": np.concatenate(owns),
                "x": np.tile(x, rep_n),
                "y": np.tile(y, rep_n),
            }
        )
        for c in extra:
            out[c] = np.tile(df[c].to_numpy(), rep_n)
        return out

    counted = count_cell(rep_local(pdf, (id_col,))).to_pandas()
    counted["core"] = (counted["n_nbrs"] >= min_pts).astype(np.int8)
    ew = edges_cell(rep_local(counted, (id_col, "core"))).to_pandas()
    e0 = ew[ew["kind"] == 0]
    if len(e0):
        et = pa.table(
            {
                "node": pa.array(
                    np.concatenate([e0["id_a"], e0["id_b"]]), pa.int64()
                ),
                "nbr": pa.array(
                    np.concatenate([e0["id_b"], e0["id_a"]]), pa.int64()
                ),
            }
        )
        lt = _dd._cc_local(et).to_pandas()
        rep_lab = lt.set_index("node")["label"]
    else:
        rep_lab = pd.Series(dtype=np.int64)
    # star-leaf attach: every core's label = its rep's component label
    e2 = ew[ew["kind"] == 2]
    core_vals = e2["id_b"].map(rep_lab).fillna(e2["id_b"]).astype(np.int64)
    lab = pd.Series(core_vals.to_numpy(), index=e2["id_a"].to_numpy())
    e1 = ew[ew["kind"] == 1]
    bl = e1["id_b"].map(lab).fillna(e1["id_b"]).astype(np.int64)
    bmap = pd.Series(bl.to_numpy(), index=e1["id_a"].to_numpy())
    ids = counted[id_col]
    is_core = counted["core"].to_numpy() == 1
    cluster = np.where(
        is_core,
        ids.map(lab).fillna(ids).to_numpy(dtype=np.int64),
        ids.map(bmap).fillna(-1).to_numpy(dtype=np.int64),
    )
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array(ids.to_numpy(), pa.int64()),
                "cluster": pa.array(cluster, pa.int64()),
            }
        )
    )


def dbscan_2d(
    ds,
    eps: float | None = None,
    min_pts: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    local_max_bytes: int = _DBSCAN_LOCAL_MAX_BYTES,
):
    """Distributed DBSCAN over the top-2-PC projection (Gunawan's
    exact grid construction, SODM'13 / the standard exact 2-D DBSCAN).

    Cell side = ε/√2 with 5×5 replication, so one cell is an ε-CLIQUE
    and every ε-pair shares a replica cell.  Phases, each one bucketed
    O(25 × points) exchange: (1) exact per-cell ε-neighbor counts →
    core flags, (2) cluster edges — intra-cell cores collapse to a
    STAR on the cell's min core id and ε-close cross-cell core pairs
    collapse to ONE representative-pair edge per cell pair, so the CC
    edge set is O(cores + 21·cells), never O(ε-pairs) (a dense blob
    has ~occupancy² ε-pairs per cell — the naive edge set measured
    ~100M edges on a 1M-point lake; this one is ~1M) — plus each
    border's MINIMUM ε-close core id (deterministic where classic
    DBSCAN's border assignment is scan-order-dependent), (3) connected
    components over the collapsed edges (the dedup machinery —
    size-gated local below its byte gate), (4) one bucketed join
    labels the borders.  Noise → cluster −1.  Returns (vec_id,
    cluster); cluster ids are component-min CORE ids.

    eps defaults to 0.25·√(λ₁+λ₂) — a fixed fraction of the projected
    spread, deterministic from the same moment pass.
    """
    proj, ev = pca_project_2d(ds, vec_col=vec_col, id_col=id_col)
    proj = proj.materialize()
    # the projection inherits the INPUT's block count (often = file
    # count); the replicate→shuffle-map stages fuse onto those blocks,
    # so a 6-file lake would run the whole grid 6-wide — rebalance
    # before fanning out 25× (measured: the count stage sat at ~20%
    # CPU utilization on a 6-block 1M-point lake)
    try:
        if proj.num_blocks() < 32 and proj.count() > 100_000:
            proj = proj.repartition(64).materialize()
    except Exception:
        pass
    if eps is None:
        eps = 0.25 * float(np.sqrt(ev[0] + ev[1]))
    eps2 = eps * eps
    side = eps / np.sqrt(2.0)

    # Cell kernels are pure-numpy segmented expansions: the candidate
    # (owner, same-cell point) pairs come from sorted cell blocks +
    # repeat/arange index arithmetic — no per-cell Python loop (368 s
    # at 1M points) and no pandas merge (11 s single-threaded but its
    # DataFrame intermediates collapsed to ~320 s/task under 31-way
    # concurrency from memory pressure; the numpy form is ~0.5 s and
    # allocates only flat index arrays).  Pair volume per bucket is
    # Σ_cell own·pop ≤ points × 9 × max-ε-ball-occupancy — bounded by
    # DBSCAN's standard density assumption (pick ε for the density, as
    # any exact DBSCAN requires).
    def count_cell(df: pd.DataFrame) -> pa.Table:
        own_mask = df["own"].to_numpy() == 1
        if not own_mask.any():
            return pa.schema(
                [(id_col, pa.int64()), ("n_nbrs", pa.int64()),
                 ("x", pa.float64()), ("y", pa.float64())]
            ).empty_table()
        cells = df["cell"].to_numpy()
        xs = df["x"].to_numpy()
        ys = df["y"].to_numpy()
        order = np.argsort(cells, kind="stable")
        rcell, rx, ry = cells[order], xs[order], ys[order]
        oc, ox, oy = cells[own_mask], xs[own_mask], ys[own_mask]
        oid = df[id_col].to_numpy()[own_mask]
        o_rep, r_idx = _cell_join_idx(oc, rcell)
        inb = (ox[o_rep] - rx[r_idx]) ** 2 + (oy[o_rep] - ry[r_idx]) ** 2 <= eps2
        counts = np.bincount(o_rep, weights=inb, minlength=len(oc)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(oid, pa.int64()),
                "n_nbrs": pa.array(counts, pa.int64()),
                "x": pa.array(ox, pa.float64()),
                "y": pa.array(oy, pa.float64()),
            }
        )

    i64max = np.iinfo(np.int64).max

    # ONE exchange emits both row kinds: core-core ε-edges (kind 0,
    # deduped by the owner-id < other-id rule — each point owns exactly
    # one cell, so every edge is emitted exactly once) and border →
    # MIN-core-neighbor candidates (kind 1)
    def edges_cell(df: pd.DataFrame) -> pa.Table:
        kinds, a_out, b_out = [], [], []
        core_all = df["core"].to_numpy() == 1
        own_all = df["own"].to_numpy() == 1
        if core_all.any() and own_all.any():
            cells = df["cell"].to_numpy()
            xs = df["x"].to_numpy()
            ys = df["y"].to_numpy()
            ids = df[id_col].to_numpy()
            # every point of a neighbor HOME cell is replicated into
            # this group, so per-home-cell representatives (min core
            # id) computed here are globally consistent
            home = _cell_key(
                np.floor(xs / side).astype(np.int64),
                np.floor(ys / side).astype(np.int64),
            )
            order = np.lexsort((ids[core_all], cells[core_all]))
            rcell = cells[core_all][order]
            rx, ry = xs[core_all][order], ys[core_all][order]
            rid = ids[core_all][order]
            rhome = home[core_all][order]
            # rep of a core's home cell: min core id per home value
            h_sort = np.argsort(rhome, kind="stable")
            h_vals = rhome[h_sort]
            h_uniq, h_start = np.unique(h_vals, return_index=True)
            h_rep = np.minimum.reduceat(rid[h_sort], h_start) if len(h_uniq) else (
                np.array([], np.int64)
            )

            def rep_of(home_keys):
                return h_rep[np.searchsorted(h_uniq, home_keys)]

            def near(mask):
                o_rep, r_idx = _cell_join_idx(cells[mask], rcell)
                inb = (
                    (xs[mask][o_rep] - rx[r_idx]) ** 2
                    + (ys[mask][o_rep] - ry[r_idx]) ** 2
                    <= eps2
                )
                return o_rep[inb], r_idx[inb]

            oc_mask = own_all & core_all
            # intra-cell star (kind 2): every owner core → its home
            # cell's rep.  These are NOT CC edges — CC runs on the
            # O(cells) rep graph only (min-label propagation needs
            # O(diameter) rounds, and a blob's CELL graph has a large
            # diameter; the star leaves attach in one join afterward).
            oc_rep = rep_of(home[oc_mask])
            oc_id = ids[oc_mask]
            a_out.append(oc_id)
            b_out.append(oc_rep)
            kinds.append(np.full(len(oc_id), 2, np.int8))
            # cross-cell: one rep-pair edge per ε-connected cell pair
            o_rep, r_idx = near(oc_mask)
            cross = home[oc_mask][o_rep] != rhome[r_idx]
            ra = oc_rep[o_rep][cross]
            rb = rep_of(rhome[r_idx][cross])
            lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
            keep = lo != hi
            pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0) if (
                keep.any()
            ) else np.empty((0, 2), np.int64)
            a_out.append(pairs[:, 0])
            b_out.append(pairs[:, 1])
            kinds.append(np.zeros(len(pairs), np.int8))

            ob_mask = own_all & ~core_all
            o_rep, r_idx = near(ob_mask)
            n_ob = int(ob_mask.sum())
            cand = np.full(n_ob, i64max, np.int64)
            np.minimum.at(cand, o_rep, rid[r_idx])
            has = cand != i64max
            a_out.append(ids[ob_mask][has])
            b_out.append(cand[has])
            kinds.append(np.ones(int(has.sum()), np.int8))

        def cat(lst, dt):
            return np.concatenate(lst) if lst else np.array([], dt)

        return pa.table(
            {
                "kind": pa.array(cat(kinds, np.int8), pa.int8()),
                "id_a": pa.array(cat(a_out, np.int64), pa.int64()),
                "id_b": pa.array(cat(b_out, np.int64), pa.int64()),
            }
        )

    # size gate (the q_pagerank / triangle_count pattern): a projected
    # point set under the byte gate runs the SAME cell kernels in one
    # process — tiny inputs shouldn't pay five bucketed exchanges
    # (measured 7.7 s → sub-second at sf0.1); pass local_max_bytes=0
    # to force the distributed path (the planted test does)
    if (proj.size_bytes() or 0) <= local_max_bytes:
        return _dbscan_local_path(
            proj, side, min_pts, id_col, count_cell, edges_cell
        )

    rep1 = _replicate_cells(proj, side, extra_cols=(id_col,))
    flagged = _cell_bucketed(rep1, count_cell)

    def add_core(b: pa.Table) -> pa.Table:
        core = (b.column("n_nbrs").to_numpy(zero_copy_only=False) >= min_pts)
        return pa.table(
            {
                id_col: b.column(id_col),
                "x": b.column("x"),
                "y": b.column("y"),
                "core": pa.array(core.astype(np.int8), pa.int8()),
            }
        )

    pts = flagged.map_batches(add_core, batch_format="pyarrow").materialize()
    rep2 = _replicate_cells(pts, side, extra_cols=(id_col, "core"))

    ew = _cell_bucketed(rep2, edges_cell).materialize()
    import pyarrow.compute as pc

    from . import dedup as _dd

    def kind_eq(k):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("kind"), k)).select(["id_a", "id_b"])

        return f

    # CC runs on the O(cells)-node REPRESENTATIVE graph only — the
    # per-core star leaves would not change connectivity but would
    # multiply CC's work, and more importantly the rep graph usually
    # fits CC's local gate where the pointer-jumping solver is
    # diameter-proof (min-label propagation is O(diameter) rounds, and
    # a spatial blob's cell graph has diameter ~span/ε — the 1M-point
    # lake measured 200+ rounds before this split)
    rep_edges = ew.map_batches(kind_eq(0), batch_format="pyarrow")
    rep_labels = _dd.connected_components(rep_edges).materialize()
    stars = ew.map_batches(kind_eq(2), batch_format="pyarrow")
    borders = ew.map_batches(kind_eq(1), batch_format="pyarrow")

    # exchange 1 (key = candidate core id): resolve each border's
    # cluster label; an isolated core never enters the CC edge set, so
    # a missing label means "that core is its own singleton cluster"
    def key_on(col, kind):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "cell": b.column(col).cast(pa.int64()),
                    "a": b.column("id_a" if col != "node" else "node").cast(pa.int64()),
                    "b": (
                        b.column("label")
                        if kind == 2
                        else pa.array(
                            np.full(b.num_rows, -1, np.int64), pa.int64()
                        )
                    ),
                    "kind": pa.array(np.full(b.num_rows, kind, np.int8), pa.int8()),
                }
            )

        return f

    def resolve_border(df: pd.DataFrame) -> pa.Table:
        lab = df[df["kind"] == 2].set_index("cell")["b"]
        bor = df[df["kind"] == 1]
        out = bor["cell"].map(lab).fillna(bor["cell"]).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(bor["a"].to_numpy(), pa.int64()),
                "blabel": pa.array(out.to_numpy(), pa.int64()),
            }
        )

    # star-leaf attach (key = rep id): every core's label = its rep's
    # component label (rep not in any rep-pair edge → its own label)
    star_tagged = stars.map_batches(key_on("id_b", 1), batch_format="pyarrow").union(
        rep_labels.map_batches(key_on("node", 2), batch_format="pyarrow")
    )

    def to_node_label(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b.column("vec_id"), "label": b.column("blabel")}
        )

    labels = (
        _cell_bucketed(star_tagged, resolve_border)
        .map_batches(to_node_label, batch_format="pyarrow")
        .materialize()
    )

    tagged1 = borders.map_batches(key_on("id_b", 1), batch_format="pyarrow").union(
        labels.map_batches(key_on("node", 2), batch_format="pyarrow")
    )

    blab = _cell_bucketed(tagged1, resolve_border)

    # exchange 2 (key = vec_id): assemble every point's cluster
    def pt_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": b.column(id_col).cast(pa.int64()),
                "val": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "kind": pa.array(
                    b.column("core").to_numpy(zero_copy_only=False).astype(np.int8),
                    pa.int8(),
                ),  # 0 = non-core point, 1 = core point
            }
        )

    def lab_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": b.column("node").cast(pa.int64()),
                "val": b.column("label").cast(pa.int64()),
                "kind": pa.array(np.full(b.num_rows, 2, np.int8), pa.int8()),
            }
        )

    def blab_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": b.column("vec_id").cast(pa.int64()),
                "val": b.column("blabel").cast(pa.int64()),
                "kind": pa.array(np.full(b.num_rows, 3, np.int8), pa.int8()),
            }
        )

    tagged2 = (
        pts.map_batches(pt_rows, batch_format="pyarrow")
        .union(labels.map_batches(lab_rows, batch_format="pyarrow"))
        .union(blab.map_batches(blab_rows, batch_format="pyarrow"))
    )

    def assemble(df: pd.DataFrame) -> pa.Table:
        lab = df[df["kind"] == 2].set_index("cell")["val"]
        bl = df[df["kind"] == 3].set_index("cell")["val"]
        p = df[df["kind"] <= 1]
        ids = p["cell"].to_numpy()
        is_core = p["kind"].to_numpy() == 1
        from_cc = p["cell"].map(lab)
        from_b = p["cell"].map(bl)
        cluster = np.where(
            is_core,
            from_cc.fillna(pd.Series(ids, index=p.index)).to_numpy(dtype=np.int64),
            from_b.fillna(-1).to_numpy(dtype=np.int64),
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cluster, pa.int64()),
            }
        )

    return _cell_bucketed(tagged2, assemble)
