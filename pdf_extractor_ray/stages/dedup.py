"""Deduplication operators over an (id, text) dataset.

Scale design (per ray_guide / SURVEY §4): hash/signature computation is
embarrassingly parallel in ``map_batches``; the shuffle moves ONLY
ids + small signatures (never document text); candidate verification
joins text back per small candidate group.

- exact:        content hash → hash-partition groupby → keep min id
- minhash_lsh:  shingles → MinHash sig → band buckets → groupby bucket
                → candidate pairs → exact-Jaccard verify
- simhash:      64-bit simhash → bucket by 4×16-bit sub-keys →
                Hamming-distance verify within buckets
- ngram_jaccard: pairwise verify inside LSH buckets (the verify step
                of minhash_lsh exposed as its own operator)
- embedding:    cosine near-dup via normalized-vector rounding buckets
                (LSH by random hyperplanes)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    shingles,
    simhash,
)
from ..functions.textstats import fingerprint


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: 64-bit content fingerprint, hash-partition, keep
    the smallest id per group (deterministic winner).  Only
    (fp64, id) columns cross the shuffle; survivors join text back via
    the id set (broadcast semi-join)."""

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [fingerprint(t or "") for t in batch.column(text_col).to_pylist()]
        return batch.append_column("fp64", pa.array(fps, pa.uint64()))

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    slim = (
        ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["fp64", id_col])
        .groupby("fp64")
        .map_groups(keep_min, batch_format="pandas")
    )
    return slim.select_columns([id_col])


# --------------------------------------------------------------------------
# MinHash + LSH near-dedup
# --------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: text → (band_id, bucket, id, signature)."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int, k: int):
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, k
        # Warm the permutation cache once per actor.
        minhash_signature(np.array([1], dtype=np.uint64), num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_bucket, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(shingles(t or "", self.k), self.num_perm)
            for band_id, key in enumerate(lsh_band_keys(sig, self.bands)):
                out_id.append(i)
                out_band.append(band_id)
                out_bucket.append(key)
                out_sig.append(sig.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )


def minhash_candidate_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    est_threshold: float = 0.5,
):
    """MinHash-LSH candidate pairs with signature-estimated Jaccard.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduped across
    bands.  The shuffle key is (band, bucket); only 256-byte
    signatures move."""

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        rows = group.sort_values("doc_id").drop_duplicates("doc_id")
        ids = rows["doc_id"].to_numpy()
        sigs = [np.frombuffer(s, dtype=np.uint32) for s in rows["sig"]]
        a_out, b_out, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                sim = float((sigs[i] == sigs[j]).mean())
                if sim >= est_threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    est.append(sim)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "est_jaccard": est})

    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands, k=k
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    pairs = sigs.groupby(["band", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )

    # A pair can surface from several bands → dedup on (id_a, id_b).
    def first_per_pair(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(
        first_per_pair, batch_format="pandas"
    )


def minhash_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.8,
):
    """Near-dedup survivors: exact-Jaccard verify candidate pairs
    (broadcast text of candidate ids only), union-find over verified
    pairs (candidate set is small relative to the corpus — documented
    assumption), survivors = min id per duplicate cluster."""
    import ray

    pairs_tbl = pa.concat_tables(
        list(
            minhash_candidate_pairs(
                ds, id_col, text_col, num_perm, bands, k
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="permissive",
    )
    cand_ids = set(pairs_tbl.column("id_a").to_pylist()) | set(
        pairs_tbl.column("id_b").to_pylist()
    )

    # Pull ONLY candidate texts (tiny subset) to verify exactly.
    cand_ref = ray.put(cand_ids)

    def filter_cands(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        mask = [i in cands for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask))

    cand_rows = pa.concat_tables(
        list(
            ds.map_batches(filter_cands, batch_format="pyarrow")
            .select_columns([id_col, text_col])
            .iter_batches(batch_format="pyarrow")
        ),
        promote_options="permissive",
    )
    text_by_id = dict(
        zip(cand_rows.column(id_col).to_pylist(), cand_rows.column(text_col).to_pylist())
    )
    sh_cache = {i: shingles(text_by_id.get(i, "") or "", k) for i in cand_ids}

    # union-find over verified pairs (driver-side: candidate graph only)
    parent: dict[int, int] = {i: i for i in cand_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_tbl.column("id_a").to_pylist(), pairs_tbl.column("id_b").to_pylist()):
        if jaccard(sh_cache[a], sh_cache[b]) >= jaccard_threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    losers = {i for i in cand_ids if find(i) != i}
    losers_ref = ray.put(losers)

    def drop_losers(batch: pa.Table) -> pa.Table:
        drop = ray.get(losers_ref)
        mask = [i not in drop for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask))

    return ds.map_batches(drop_losers, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash near-dedup
# --------------------------------------------------------------------------

def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
    """SimHash near-dup candidates: bucket by each of four 16-bit
    sub-keys (any pair within Hamming ≤3 of 64 bits shares at least one
    exact 16-bit quarter — pigeonhole), verify Hamming in-bucket."""

    def add_simhash(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_q, out_key, out_h = [], [], [], []
        for i, t in zip(ids, texts):
            h = simhash(t or "")
            for q in range(4):
                out_id.append(i)
                out_q.append(q)
                out_key.append((h >> (16 * q)) & 0xFFFF)
                out_h.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "quarter": pa.array(out_q, pa.int32()),
                "qkey": pa.array(out_key, pa.int32()),
                "simhash": pa.array(out_h, pa.uint64()),
            }
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values("doc_id").drop_duplicates("doc_id")
        ids = rows["doc_id"].to_list()
        hs = rows["simhash"].to_list()
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(int(hs[i]), int(hs[j]))
                if d <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    d_out.append(d)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": d_out})

    def first_per_pair(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return (
        ds.map_batches(add_simhash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["quarter", "qkey"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(first_per_pair, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cos_threshold: float = 0.95,
    num_planes: int = 8,
    n_tables: int = 6,
    seed: int = 7,
):
    """Random-hyperplane LSH (``n_tables`` independent tables of
    ``num_planes`` bits — recall amplification) + exact cosine verify
    in-bucket, deduped across tables.  Only (table, bucket, id, vector)
    rows shuffle; vectors are short."""

    def add_buckets(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        ids = batch.column(id_col).to_pylist()
        rng = np.random.RandomState(seed)
        out_id, out_tbl, out_bkt, out_vec = [], [], [], []
        for t in range(n_tables):
            planes = rng.normal(size=(vecs.shape[1], num_planes))
            bits = (vecs @ planes) > 0
            keys = np.packbits(bits, axis=1, bitorder="little")[:, 0].astype(np.int64)
            out_id.extend(ids)
            out_tbl.extend([t] * len(ids))
            out_bkt.extend(keys.tolist())
            out_vec.extend(batch.column(vec_col).to_pylist())
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "table_id": pa.array(out_tbl, pa.int32()),
                "bucket": pa.array(out_bkt, pa.int64()),
                vec_col: pa.array(out_vec, batch.schema.field(vec_col).type),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values("vec_id").drop_duplicates("vec_id")
        ids = rows["vec_id"].to_list()
        vecs = np.asarray(rows[vec_col].to_list(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        cos = unit @ unit.T
        a_out, b_out, c_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cos[i, j] >= cos_threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    c_out.append(round(float(cos[i, j]), 6))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "cosine": c_out})

    def first_per_pair(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return (
        ds.map_batches(add_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["table_id", "bucket"])
        .map_groups(verify, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(first_per_pair, batch_format="pandas")
    )
