"""Deduplication operators over an (id, text) dataset.

Scale design (per ray_guide / SURVEY §4): hash/signature computation is
embarrassingly parallel in ``map_batches``; the shuffle moves ONLY
ids + small signatures (never document text); candidate verification
joins text back per small candidate group.

- exact:        content hash → hash-partition groupby → keep min id
                (pure vectorized ``Min`` aggregate — no per-group Python)
- minhash_lsh:  shingles → MinHash sig → band buckets → groupby bucket
                → candidate pairs → exact-Jaccard verify (distributed:
                broadcast candidate-id set, filter corpus, hash-join
                texts onto pairs) → distributed connected components
- simhash:      64-bit simhash → bucket by 4×16-bit sub-keys →
                Hamming-distance verify within buckets
- ngram_jaccard: pairwise verify inside LSH buckets (the verify step
                of minhash_lsh exposed via ``pair_texts``)
- embedding:    cosine near-dup via normalized-vector rounding buckets
                (LSH by random hyperplanes)

Schema stability: every pandas group-fn return — INCLUDING empty ones —
declares explicit dtypes, so hash-shuffled block schemas are identical
across partitions (an object-dtype empty frame upstream of a second
groupby is what broke ``embed_neardup`` in round 1: the shuffle
aggregator saw blocks without the key columns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    shingles,
    simhash,
)
from ..functions.textstats import fingerprint_exact, fingerprint_exact_array

# Coarse shuffle-bucket count for the pair generators: ONE map_groups
# call per coarse bucket; fine (band/bucket) groups are sieved
# vectorized inside.  At cluster scale raise ~linearly with CPUs.
_PAIR_BUCKETS = 32


def bounded_windows(n: int, cap: int):
    """Yield (start, stop) windows of at most ``cap`` rows covering
    ``range(n)``, adjacent windows overlapping by ONE row.

    Hard bound for pairwise-verify groups that hyperplane sub-splits
    cannot shrink: identical / exactly collinear vectors land on the
    same side of EVERY hyperplane, so a flood of >cap duplicates of one
    embedding stays a single oversized label through all split rounds
    and the O(n²) matmul runs unbounded.  Slicing the (id-sorted) label
    into cap-sized windows bounds every matmul at cap²; the one-row
    overlap keeps mass-duplicate chunks transitively connected (the
    shared row pairs with both sides), so downstream connected
    components / keep-min-id semantics still collapse the whole flood.
    Recall loss is confined to cross-window pairs of a label that was
    genuinely diverse yet unsplittable — the same trade LSH banding
    already makes."""
    if n <= cap:
        yield (0, n)
        return
    step = cap - 1
    for s in range(0, n - 1, step):
        yield (s, min(s + cap, n))


def _pairs_df(a, b, extra: str, vals, dtype: str = "float64") -> pa.Table:
    """(id_a, id_b, <extra>) block with an EXPLICIT, metadata-free
    Arrow schema — identical whether or not the lists are empty.  The
    pair generators return this from pandas ``map_groups`` fns; a
    pandas return would be converted by Ray with ``b'pandas'`` schema
    metadata attached, which is unhashable in this pyarrow build and
    knocks the downstream (id_a, id_b) aggregate off its schema-dedup
    fast path (see sources/scan.py)."""
    return pa.table(
        {
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            extra: pa.array(vals, pa.from_numpy_dtype(np.dtype(dtype))),
        }
    )


def _collect(ds) -> pa.Table:
    """Driver-side collect of a SMALL dataset (candidate ids / labels
    only — never document text)."""
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: 64-bit RAW-byte content fingerprint
    (``fingerprint_exact`` — byte-for-byte ``GROUP BY text``
    semantics; the whitespace-invariant ``fingerprint`` belongs to the
    near-dup prefilters, not here), hash-partition, keep the smallest
    id per group (deterministic winner) via a pure vectorized ``Min``
    aggregate — ~1 group per distinct document, so a per-group Python
    ``map_groups`` call would dominate at scale.  Only (fp64, id)
    columns cross the shuffle."""
    from ray.data.aggregate import Min

    def add_fp(batch: pa.Table) -> pa.Table:
        # row-vectorized FNV (round 5) — was a per-row Python loop
        fps = fingerprint_exact_array(batch.column(text_col))
        return batch.append_column("fp64", pa.array(fps, pa.int64()))

    slim = (
        ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["fp64", id_col])
        .groupby("fp64")
        .aggregate(Min(id_col, alias_name=id_col))
    )
    return slim.select_columns([id_col])


# --------------------------------------------------------------------------
# MinHash + LSH near-dedup
# --------------------------------------------------------------------------

def minhash_signatures_fn(id_col: str, text_col: str, num_perm: int, bands: int, k: int):
    """STATELESS signature stage: text → (band_id, bucket, id, sig).

    The permutation table is module-level state warmed on first call
    per worker process (``hashing._PERM_CACHE``) — an actor pool here
    costs ~3 s of pool startup per query on this sandbox while the
    warm state it would hold is a 1 KB array (see BASELINE.md perf
    journal: reserved actor pools also starve post-shuffle stages)."""

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_band, out_bucket, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(shingles(t or "", k), num_perm)
            for band_id, key in enumerate(lsh_band_keys(sig, bands)):
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

    return sign


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
    bands.  The shuffle key is a COARSE hash of (band, bucket) — one
    ``map_groups`` call per coarse bucket, not per LSH bucket (a call
    per LSH bucket is ~1 group per doc×band: per-group Python overhead
    dominates, the same disease ``exact_dedup`` had).  Inside, a
    vectorized ``transform('size')`` sieve skips singleton buckets
    (the vast majority) without touching Python; only colliding
    buckets pay the pair loop.  Only 256-byte signatures move.  The
    cross-band dedup is a vectorized ``Min`` aggregate (est_jaccard is
    a pure function of the two signatures, so it is identical in every
    band that surfaces the pair)."""
    from ray.data.aggregate import Min

    def pairs_in_coarse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(["band", "bucket"], sort=False)["doc_id"].transform("size")
        multi = df.loc[cnt >= 2]
        a_out, b_out, est = [], [], []
        for _, g in multi.groupby(["band", "bucket"], sort=False):
            rows = g.sort_values("doc_id").drop_duplicates("doc_id")
            ids = rows["doc_id"].to_numpy()
            sigs = [np.frombuffer(s, dtype=np.uint32) for s in rows["sig"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    sim = float((sigs[i] == sigs[j]).mean())
                    if sim >= est_threshold:
                        a_out.append(int(ids[i]))
                        b_out.append(int(ids[j]))
                        est.append(sim)
        return _pairs_df(a_out, b_out, "est_jaccard", est)

    def add_coarse(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False).astype("int64")
        bd = batch.column("band").to_numpy(zero_copy_only=False).astype("int64")
        coarse = ((bk ^ bd) % _PAIR_BUCKETS).astype("int32")
        return batch.append_column("_cb", pa.array(coarse))

    sigs = ds.map_batches(
        minhash_signatures_fn(id_col, text_col, num_perm, bands, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = (
        sigs.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_cb", num_partitions=_PAIR_BUCKETS)
        .map_groups(pairs_in_coarse_bucket, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard")
    )


#: Max bytes of candidate text the driver may collect + broadcast;
#: above this, pair_texts switches to the reduce-side exchange join.
PAIR_TEXT_BROADCAST_MAX = 256 << 20


def _attach_texts_exchange(pairs, texts, id_col, text_col, num_buckets=_PAIR_BUCKETS):
    """Reduce-side fallback for ``pair_texts``: attach text_a / text_b
    with two tag + union + bucketed-groupby hash joins when the
    candidate text set exceeds the broadcast cap.  Carries every pairs
    column through the exchange; candidate text bytes move exactly
    twice (once per side) and never touch the driver.  Uses the same
    map_groups exchange as connected_components — immune to the
    JoinOperator empty-first-block schema bug."""
    fields = [(f.name, f.type) for f in pairs.schema().base_schema]
    cur = pairs
    for side in ("a", "b"):
        key, out_col = f"id_{side}", f"text_{side}"
        cur_fields = list(fields)  # both keyed fns build columns in
        # cur_fields + (out_col, _k, _src) insertion order → identical
        # union schemas

        def pairs_keyed(
            batch: pa.Table, key=key, out_col=out_col, cur_fields=cur_fields
        ) -> pa.Table:
            n = batch.num_rows
            cols = {name: batch.column(name) for name, _ in cur_fields}
            cols[out_col] = pa.nulls(n, pa.string())
            cols["_k"] = batch.column(key)
            cols["_src"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
            return pa.table(cols)

        def texts_keyed(
            batch: pa.Table, out_col=out_col, cur_fields=cur_fields
        ) -> pa.Table:
            n = batch.num_rows
            cols = {name: pa.nulls(n, t) for name, t in cur_fields}
            cols[out_col] = pc.cast(batch.column(text_col), pa.string())
            cols["_k"] = batch.column(id_col)
            cols["_src"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
            return pa.table(cols)

        def add_bucket(batch: pa.Table) -> pa.Table:
            k = batch.column("_k").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "_bucket", pa.array((k % num_buckets).astype("int32"))
            )

        def merge(
            df: pd.DataFrame, out_col=out_col, cur_fields=cur_fields
        ) -> pa.Table:
            left = df[df["_src"] == 0]
            right = df.loc[df["_src"] == 1, ["_k", out_col]].drop_duplicates("_k")
            m = left.drop(columns=[out_col]).merge(right, on="_k", how="left")
            out = {name: pa.array(m[name], type=t) for name, t in cur_fields}
            out[out_col] = pa.array(m[out_col], type=pa.string())
            return pa.table(out)

        unioned = cur.map_batches(pairs_keyed, batch_format="pyarrow").union(
            texts.map_batches(texts_keyed, batch_format="pyarrow")
        )
        cur = (
            unioned.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket", num_partitions=num_buckets)
            .map_groups(merge, batch_format="pandas")
        )
        fields = cur_fields + [(out_col, pa.string())]
    return cur


def pair_texts(
    ds,
    pairs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Attach (text_a, text_b) to a candidate-pair dataset without ever
    materializing the corpus: broadcast the (small) candidate id set,
    semi-join-filter the corpus distributed (vectorized ``pc.is_in``),
    pull ONLY the candidate texts, broadcast them once via ``ray.put``,
    and attach per batch over the pairs dataset.

    Assumption (documented, same as the LSH design): near-dup
    candidates ≪ corpus, so the candidate ID set is broadcastable.
    The candidate TEXT set is additionally GUARDED: its bytes are
    measured (in the object store, never on the driver) and above
    ``PAIR_TEXT_BROADCAST_MAX`` the attach switches to
    ``_attach_texts_exchange`` — a reduce-side hash join (tag + union
    + bucketed groupby), immune to Ray 2.49's JoinOperator losing its
    schema broadcast when an input's first block is empty (exactly
    what a filtered corpus produces)."""
    import ray

    ids_tbl = _collect(pairs.select_columns(["id_a", "id_b"]))
    if ids_tbl.num_rows == 0:
        return None
    cand = np.unique(
        np.concatenate(
            [
                ids_tbl.column("id_a").to_numpy(zero_copy_only=False),
                ids_tbl.column("id_b").to_numpy(zero_copy_only=False),
            ]
        )
    )
    # broadcast the Arrow array itself — pc.is_in builds its hash set
    # from the value_set per call, but at least the numpy→Arrow
    # conversion happens once, not per batch
    cand_ref = ray.put(pa.array(cand, pa.int64()))

    def filt(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)  # local object-store hit after first fetch
        return batch.filter(pc.is_in(batch.column(id_col), value_set=c))

    filtered = (
        ds.map_batches(filt, batch_format="pyarrow")
        .select_columns([id_col, text_col])
        .materialize()  # bounded by the candidate set; spillable
    )
    if (filtered.size_bytes() or 0) > PAIR_TEXT_BROADCAST_MAX:
        return _attach_texts_exchange(pairs, filtered, id_col, text_col)
    cand_rows = _collect(filtered)
    text_map_ref = ray.put(
        dict(
            zip(
                cand_rows.column(id_col).to_pylist(),
                cand_rows.column(text_col).to_pylist(),
            )
        )
    )

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(text_map_ref)
        ta = [m.get(i) for i in batch.column("id_a").to_pylist()]
        tb = [m.get(i) for i in batch.column("id_b").to_pylist()]
        return batch.append_column("text_a", pa.array(ta, pa.string())).append_column(
            "text_b", pa.array(tb, pa.string())
        )

    return pairs.map_batches(attach, batch_format="pyarrow")


# --------------------------------------------------------------------------
# distributed connected components (min-label propagation)
# --------------------------------------------------------------------------

_CC_BUCKETS = 32

# Edge sets below this (materialized Arrow bytes) are solved locally
# with vectorized numpy pointer-jumping instead of paying ~diameter
# distributed rounds of fixed streaming-executor overhead — the same
# broadcast-small-side principle as the join planner.  64 MB ≈ 4 M
# edges; the distributed rounds take over beyond that.
CC_LOCAL_MAX_BYTES = 64 << 20


def _cc_local(edge_tbl: pa.Table) -> pa.Table:
    """Exact CC on a driver-resident edge table: compact node ids
    (sorted, so min compact index == min node id), then alternate
    vectorized edge relaxation (``np.minimum.at``) with path-halving
    pointer jumps until fix-point — O(E) work per round, O(log n)
    rounds.  Returns (node, label) with label = component min node id."""
    a = edge_tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    b = edge_tbl.column("nbr").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        m = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, m)
        np.minimum.at(label, ib, m)
        label = np.minimum(label, label[label])  # path halving
        label = np.minimum(label, label[label])
        if np.array_equal(label, before):
            break
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array(nodes[label], pa.int64()),
        }
    )


def connected_components(
    pairs,
    max_rounds: int = 25,
    num_buckets: int = _CC_BUCKETS,
    local_max_bytes: int = CC_LOCAL_MAX_BYTES,
):
    """Connected components over an (id_a, id_b) pair dataset as
    iterative min-label propagation — the scale-safe replacement for a
    driver-side union-find (no driver-resident pair graph).

    Size-gated: the edge set is materialized once anyway (it is reused
    every round), so if it measures under ``local_max_bytes`` the graph
    is solved exactly on the driver with vectorized pointer-jumping
    (``_cc_local``) — tiny graphs shouldn't pay ~diameter rounds of
    executor overhead.  Pass ``local_max_bytes=0`` to force the
    distributed path (the planted-cluster tests do).

    Each distributed round is two reduce-side hash joins expressed as
    bucketed groupbys (tag + union + per-bucket vectorized pandas merge
    — no JoinOperator, whose schema broadcast is lost when an input's
    first block is empty): (1) neighbors' labels flow along edges keyed
    on ``nbr``; (2) per-node min over messages ∪ current labels, with
    an exact per-node ``changed`` flag summed in a tiny aggregate for
    the convergence check.  Rounds are O(component diameter); near-dup
    clusters are near-cliques so 2-3 rounds typical.  Returns a Dataset
    (node, label) where label is the component's min node id."""
    import ray.data
    from ray.data.aggregate import Sum

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]).astype("int64"), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]).astype("int64"), pa.int64()),
            }
        )

    edges = pairs.select_columns(["id_a", "id_b"]).map_batches(
        to_edges, batch_format="pyarrow"
    ).materialize()  # reused every round — don't re-derive candidates

    if (edges.size_bytes() or 0) <= local_max_bytes:
        tbl = _collect(edges)
        if tbl.num_rows == 0:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
            )
        return ray.data.from_arrow(_cc_local(tbl))

    def bucket_on(col: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "_bucket", pa.array((n % num_buckets).astype("int32"))
            )

        return f

    # Smart init: label₀ = min(self, direct neighbors) — one bucketed
    # groupby, same cost as a plain distinct-nodes pass but it IS the
    # first propagation round, so clique-shaped near-dup clusters (the
    # common case) converge after a single confirming round.
    def init_labels(df: pd.DataFrame) -> pa.Table:
        # Arrow return (here and in send_labels/propagate): a pandas
        # return would re-enter the next round's shuffle carrying
        # unhashable pandas schema metadata (see _pairs_df).
        m = df.groupby("node", sort=False)["nbr"].min()
        nodes = m.index.to_numpy()
        lab = np.minimum(nodes, m.to_numpy())
        return pa.table(
            {
                "node": pa.array(nodes.astype("int64"), pa.int64()),
                "label": pa.array(lab.astype("int64"), pa.int64()),
            }
        )

    labels = (
        edges.map_batches(bucket_on("node"), batch_format="pyarrow")
        .groupby("_bucket", num_partitions=num_buckets)
        .map_groups(init_labels, batch_format="pandas")
        .materialize()
    )

    # Union-able canonical row: (k, node, label, src). src=0 → edge row
    # keyed on nbr (node carries the destination); src=1 → label row
    # keyed on its node.  All int64 — no nulls, schemas identical.
    def edges_keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("nbr"),
                "node": batch.column("node"),
                "label": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64), pa.int64()
                ),
                "src": pa.array(np.zeros(batch.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def labels_keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("node"),
                "node": batch.column("node"),
                "label": batch.column("label"),
                "src": pa.array(np.ones(batch.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def send_labels(t: pa.Table) -> pa.Table:
        """Per-bucket reduce-side join: each edge row (k=nbr) receives
        the label of k from the label row (k=node).  Arrow-native
        (acero hash join + group-min dedup): measured 2.1× the pandas
        merge (23.9 vs 49.9 ms per 350k-row bucket, to_pandas
        included).  propagate/init_labels stay pandas — the same A/B
        measured Arrow 0.81× there (two group_bys + join lose to one
        groupby + reindex)."""
        src = t.column("src")
        lab = pa.TableGroupBy(
            t.filter(pc.equal(src, 1)).select(["k", "label"]), "k"
        ).aggregate([("label", "min")]).rename_columns(["k", "label"])
        ed = t.filter(pc.equal(src, 0)).select(["k", "node"])
        m = ed.join(lab, keys="k", join_type="inner")
        return pa.table(
            {
                "node": m.column("node"),
                "label": m.column("label"),
                "is_old": pa.array(np.zeros(m.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def with_is_old(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "label": batch.column("label"),
                "is_old": pa.array(np.ones(batch.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def propagate(df: pd.DataFrame) -> pa.Table:
        new = df.groupby("node", sort=False)["label"].min()
        old = df.loc[df["is_old"] == 1].set_index("node")["label"]
        old = old[~old.index.duplicated()]
        aligned = old.reindex(new.index)
        changed = (new < aligned) | aligned.isna()
        return pa.table(
            {
                "node": pa.array(new.index.to_numpy().astype("int64"), pa.int64()),
                "label": pa.array(new.to_numpy().astype("int64"), pa.int64()),
                "changed": pa.array(changed.to_numpy().astype("int8"), pa.int8()),
            }
        )

    # pointer-jumping query rows: every non-root label row asks for its
    # LABEL's label (k = label) through the same send_labels join —
    # the classic shortcutting step (Kiveris et al., "Connected
    # Components in MapReduce and Beyond"), which contracts
    # label-to-root distance geometrically so chain/grid-shaped
    # components converge in O(log diameter) rounds instead of
    # O(diameter) (a 255-hop chain: 25-round cap blown without it,
    # ~10 rounds with it)
    def labels_query(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.not_equal(batch.column("label"), batch.column("node"))
        )
        return pa.table(
            {
                "k": t.column("label"),
                "node": t.column("node"),
                "label": pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
                "src": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    for round_idx in range(max_rounds):
        keyed = edges.map_batches(edges_keyed, batch_format="pyarrow").union(
            labels.map_batches(labels_keyed, batch_format="pyarrow")
        )
        msgs = (
            keyed.map_batches(bucket_on("k"), batch_format="pyarrow")
            .groupby("_bucket", num_partitions=num_buckets)
            .map_groups(send_labels, batch_format="pyarrow")
        )
        cand = msgs.union(labels.map_batches(with_is_old, batch_format="pyarrow"))
        if round_idx >= 2:
            # clique-shaped graphs (the near-dup common case) converge
            # in ≤2 rounds and never pay this; a third round means the
            # graph has depth, so add the shortcut exchange
            jkeyed = labels.map_batches(
                labels_query, batch_format="pyarrow"
            ).union(labels.map_batches(labels_keyed, batch_format="pyarrow"))
            jmsgs = (
                jkeyed.map_batches(bucket_on("k"), batch_format="pyarrow")
                .groupby("_bucket", num_partitions=num_buckets)
                .map_groups(send_labels, batch_format="pyarrow")
            )
            cand = cand.union(jmsgs)
        # ONE heavy execution per round (the materialize) + one tiny
        # aggregate over its cached blocks; the `changed` column rides
        # along into the next round's labels (labels_keyed/with_is_old
        # only read node/label) instead of paying a third execution to
        # project it away.
        new_labels = (
            cand.map_batches(bucket_on("node"), batch_format="pyarrow")
            .groupby("_bucket", num_partitions=num_buckets)
            .map_groups(propagate, batch_format="pandas")
            .materialize()
        )
        n_changed = new_labels.aggregate(Sum("changed", alias_name="n"))["n"] or 0
        # the union + map_groups lineage DOUBLES the label dataset's
        # block count every round (measured 1→3→7→15→31…): by round 10
        # the tiny-block scheduling overhead dwarfs the data (2.0 s →
        # 220 s/round on a 256-node chain) — rebound it before it
        # compounds
        if new_labels.num_blocks() > 4 * num_buckets:
            new_labels = new_labels.repartition(num_buckets).materialize()
        labels = new_labels
        if n_changed == 0:
            break
    else:
        # Rounds = O(log diameter) with the shortcut exchange; a
        # component deeper than 2^max_rounds would come back
        # under-merged, so make the cap audible instead of silently
        # keeping duplicates.
        import warnings

        warnings.warn(
            f"connected_components hit max_rounds={max_rounds} before "
            f"convergence ({n_changed} labels still changing) — raise "
            "max_rounds for chain-shaped duplicate graphs",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select_columns(["node", "label"])


def minhash_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.8,
):
    """Near-dedup survivors, fully distributed:

    1. LSH candidate pairs (only signatures shuffle),
    2. exact-Jaccard verify with texts hash-joined onto pairs
       (``pair_texts`` — only candidate texts move, none to the driver),
    3. distributed connected components over verified pairs
       (min-label propagation — no driver union-find),
    4. survivors = cluster-min ids; losers broadcast as an id array and
       dropped with a vectorized ``pc.is_in`` mask."""
    import ray

    pairs = minhash_candidate_pairs(
        ds, id_col, text_col, num_perm, bands, k
    ).materialize()
    with_text = pair_texts(ds, pairs, id_col=id_col, text_col=text_col)
    if with_text is None:
        return ds

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch.column("id_a").to_numpy(zero_copy_only=False)
        b_ids = batch.column("id_b").to_numpy(zero_copy_only=False)
        ta = batch.column("text_a").to_pylist()  # strings: kernel input
        tb = batch.column("text_b").to_pylist()
        # per-batch shingle cache: a hot cluster of m docs appears in
        # ~m²/2 pairs — the vectorized shingles kernel runs once per
        # UNIQUE candidate, never once per pair
        sh: dict[int, object] = {}
        for i, t in zip(a_ids, ta):
            if i not in sh:
                sh[i] = shingles(t or "", k)
        for i, t in zip(b_ids, tb):
            if i not in sh:
                sh[i] = shingles(t or "", k)
        keep = np.fromiter(
            (
                jaccard(sh[ia], sh[ib]) >= jaccard_threshold
                for ia, ib in zip(a_ids, b_ids)
            ),
            dtype=bool,
            count=len(a_ids),
        )
        return pa.table(
            {
                "id_a": pa.array(a_ids[keep], pa.int64()),
                "id_b": pa.array(b_ids[keep], pa.int64()),
            }
        )

    verified = with_text.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        return ds
    labels = connected_components(verified)

    def losers_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(batch.column("node"), batch.column("label"))
        )

    loser_tbl = _collect(
        labels.map_batches(losers_only, batch_format="pyarrow").select_columns(["node"])
    )
    if loser_tbl.num_rows == 0:
        return ds
    losers_ref = ray.put(loser_tbl.column("node").combine_chunks())

    def drop_losers(batch: pa.Table) -> pa.Table:
        drop = ray.get(losers_ref)
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=drop))
        return batch.filter(mask)

    return ds.map_batches(drop_losers, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash near-dedup
# --------------------------------------------------------------------------

def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
    """SimHash near-dup candidates: bucket by each of four 16-bit
    sub-keys (any pair within Hamming ≤3 of 64 bits shares at least one
    exact 16-bit quarter — pigeonhole), verify Hamming in-bucket.
    Cross-quarter dedup is a vectorized ``Min`` aggregate (the Hamming
    distance is quarter-independent)."""
    from ray.data.aggregate import Min

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

    def pairs_in_coarse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(["quarter", "qkey"], sort=False)["doc_id"].transform("size")
        multi = df.loc[cnt >= 2]
        a_out, b_out, d_out = [], [], []
        for _, g in multi.groupby(["quarter", "qkey"], sort=False):
            rows = g.sort_values("doc_id").drop_duplicates("doc_id")
            ids = rows["doc_id"].to_list()
            hs = rows["simhash"].to_list()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = hamming64(int(hs[i]), int(hs[j]))
                    if d <= max_hamming:
                        a_out.append(ids[i])
                        b_out.append(ids[j])
                        d_out.append(d)
        return _pairs_df(a_out, b_out, "hamming", d_out, dtype="int64")

    def add_coarse(batch: pa.Table) -> pa.Table:
        qk = batch.column("qkey").to_numpy(zero_copy_only=False).astype("int64")
        q = batch.column("quarter").to_numpy(zero_copy_only=False).astype("int64")
        coarse = (((qk * 2654435761) ^ q) % _PAIR_BUCKETS).astype("int32")
        return batch.append_column("_cb", pa.array(coarse))

    return (
        ds.map_batches(add_simhash, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_cb", num_partitions=_PAIR_BUCKETS)
        .map_groups(pairs_in_coarse_bucket, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
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
    verify_cap: int = 4096,
):
    """Random-hyperplane LSH (``n_tables`` independent tables of
    ``num_planes`` bits — recall amplification) + exact cosine verify
    in-bucket, deduped across tables via a vectorized ``Min`` aggregate
    (cosine is table-independent).  Only (table, bucket, id, vector)
    rows shuffle; vectors are short."""
    from ray.data.aggregate import Min

    def add_buckets(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "table_id": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int64()),
                vec_col: pa.array([], batch.schema.field(vec_col).type),
            }
        )
        if batch.num_rows == 0:
            return empty
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

    # In-bucket verify caps the pairwise matmul at verify_cap: an LSH
    # bucket larger than that is sub-split with further deterministic
    # hyperplane bits (near-identical vectors stay together — the same
    # recall trade the banding itself makes).  Measured need: a table
    # whose vectors share one dominant direction put ~all 20k rows in
    # the SAME bucket of every LSH table, and the O(n²) verify hung.
    def verify_coarse(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(["table_id", "bucket"], sort=False)["vec_id"].transform("size")
        multi = df.loc[cnt >= 2]
        a_out, b_out, c_out = [], [], []
        for _, g in multi.groupby(["table_id", "bucket"], sort=False):
            rows = g.sort_values("vec_id").drop_duplicates("vec_id")
            ids = rows["vec_id"].to_numpy()
            vecs = np.asarray(rows[vec_col].to_list(), dtype=np.float64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = vecs / norms
            labels = np.zeros(len(ids), dtype=np.int64)
            rng = np.random.RandomState(seed + 977)
            for _ in range(32):
                counts = np.bincount(labels)
                oversized = np.flatnonzero(counts > verify_cap)
                if not len(oversized):
                    break
                side = (unit @ rng.normal(size=unit.shape[1])) > 0
                labels = labels * 2 + np.where(np.isin(labels, oversized), side, 0)
                _, labels = np.unique(labels, return_inverse=True)
            for lbl in np.unique(labels):
                m = labels == lbl
                lbl_ids, lbl_unit = ids[m], unit[m]
                # bounded_windows: labels the hyperplane loop could not
                # shrink (identical-vector floods) are hard-chunked so
                # the matmul never exceeds verify_cap².
                for s, e in bounded_windows(len(lbl_ids), verify_cap):
                    sub_ids, sub = lbl_ids[s:e], lbl_unit[s:e]
                    cos = sub @ sub.T
                    ii, jj = np.nonzero(np.triu(cos, 1) >= cos_threshold)
                    a_out.extend(sub_ids[ii].tolist())
                    b_out.extend(sub_ids[jj].tolist())
                    c_out.extend(np.round(cos[ii, jj], 6).tolist())
        return _pairs_df(a_out, b_out, "cosine", c_out)

    def add_coarse(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False).astype("int64")
        t = batch.column("table_id").to_numpy(zero_copy_only=False).astype("int64")
        coarse = ((((bk + 1) * 2654435761) ^ t) % _PAIR_BUCKETS).astype("int32")
        return batch.append_column("_cb", pa.array(coarse))

    return (
        ds.map_batches(add_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_cb", num_partitions=_PAIR_BUCKETS)
        .map_groups(verify_coarse, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("cosine", alias_name="cosine"))
    )
