"""Review decision capture + newest-wins merge (reference
/root/reference/src/reviewer.py:204-285: the accept/reject/skip loop
persists decisions to reviews.json, merges newest-wins by qa_id, and
reports summary counts — rebuilt as append-only parquet artifacts with
a distributed newest-wins merge, so review rounds are resumable and
the merge scales past a driver-side dict).

Layout: ``<review_dir>/decisions-<rev>.parquet`` append-only files;
each write gets a monotonically increasing ``rev`` so later decisions
win.  The merge is the ``dedup_latest`` shape (D1): bucketed hash
groupby on the (conv_id, turn_idx, unit_id) key, keep the max-rev row
per key — one exchange, vectorized pandas inside.
"""

from __future__ import annotations

import glob
import os
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VALID_DECISIONS = ("accept", "reject", "skip")

DECISION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("unit_id", pa.string()),
        ("decision", pa.string()),
        ("note", pa.string()),
        ("rev", pa.int64()),
    ]
)

_MERGE_BUCKETS = 32


def _decision_files(review_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(review_dir, "decisions-*.parquet")))


def _next_rev(review_dir: str) -> int:
    """Max rev across existing decision files + 1 (metadata-only scan:
    reads ONLY the rev column of each small decision file)."""
    best = 0
    for f in _decision_files(review_dir):
        revs = pq.read_table(f, columns=["rev"]).column("rev")
        if len(revs):
            best = max(best, pa.compute.max(revs).as_py())
    return best + 1


def record_decisions(review_dir: str, decisions: list[dict]) -> str:
    """Persist one batch of review decisions (reference reviewer.py's
    per-session save, :204-231).  Each row: conv_id, turn_idx, unit_id,
    decision ∈ {accept,reject,skip}, optional note.  Per-row ``rev``
    increases in input order so a later decision in the SAME batch also
    wins.  Returns the written path (atomic tmp+rename)."""
    os.makedirs(review_dir, exist_ok=True)
    for d in decisions:
        if d["decision"] not in VALID_DECISIONS:
            raise ValueError(
                f"invalid decision {d['decision']!r}; expected one of {VALID_DECISIONS}"
            )
    # Claim a rev range atomically: os.link refuses to overwrite, so a
    # concurrent writer that computed the same base loses the link race
    # and retries with a re-scanned rev — no decision file is ever
    # silently clobbered.
    for _ in range(16):
        base = _next_rev(review_dir)
        t = pa.table(
            {
                "conv_id": pa.array([d["conv_id"] for d in decisions], pa.string()),
                "turn_idx": pa.array(
                    [int(d["turn_idx"]) for d in decisions], pa.int32()
                ),
                "unit_id": pa.array(
                    [d.get("unit_id", "") for d in decisions], pa.string()
                ),
                "decision": pa.array([d["decision"] for d in decisions], pa.string()),
                "note": pa.array([d.get("note", "") for d in decisions], pa.string()),
                "rev": pa.array(range(base, base + len(decisions)), pa.int64()),
            }
        )
        path = os.path.join(review_dir, f"decisions-{base:012d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        try:
            os.link(tmp, path)  # atomic create-if-absent
            return path
        except FileExistsError:
            continue  # another writer claimed this rev — rescan
        finally:
            os.unlink(tmp)
    raise RuntimeError("could not claim a decision rev after 16 attempts")


def load_reviews(review_dir: str):
    """Merged review state: newest-wins per (conv_id, turn_idx,
    unit_id) — the reference's reviews.json merge semantics
    (reviewer.py:233-266) as a distributed bucketed groupby."""
    import ray.data

    files = _decision_files(review_dir)
    if not files:
        return ray.data.from_arrow(DECISION_SCHEMA.empty_table())
    from ..sources.scan import scan_parquet

    ds = scan_parquet(files)

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = [
            zlib.crc32(f"{c}|{t}|{u}".encode()) % _MERGE_BUCKETS
            for c, t, u in zip(
                batch.column("conv_id").to_pylist(),
                batch.column("turn_idx").to_pylist(),
                batch.column("unit_id").to_pylist(),
            )
        ]
        return batch.append_column("_bucket", pa.array(keys, pa.int32()))

    def newest_wins(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("rev", ascending=False)
        b = b.drop_duplicates(["conv_id", "turn_idx", "unit_id"], keep="first")
        return b[["conv_id", "turn_idx", "unit_id", "decision", "note", "rev"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_MERGE_BUCKETS)
        .map_groups(newest_wins, batch_format="pandas")
    )


def review_summary(review_dir: str) -> dict:
    """A6: review decision counts over the MERGED state (reference
    reviewer.py:268-285 prints accepted/rejected/skipped tallies)."""
    from ray.data.aggregate import Count

    # materialize once — count() and the aggregate share the merge
    merged = load_reviews(review_dir).materialize()
    counts = {d: 0 for d in VALID_DECISIONS}
    if merged.count():
        for row in merged.groupby("decision").aggregate(Count(alias_name="n")).take_all():
            counts[row["decision"]] = int(row["n"])
    total = sum(counts.values())
    return {
        "total": total,
        "accepted": counts["accept"],
        "rejected": counts["reject"],
        "skipped": counts["skip"],
    }
