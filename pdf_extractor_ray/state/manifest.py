"""Per-partition checkpoint manifests (resume without reprocessing).

Redesign of the reference's full-state JSON checkpoint
(/root/reference/src/checkpoint.py:22-103 — rewritten after every page,
O(pages²) cumulative I/O): here a run is split into independent input
partitions (groups of lake files; conversations never span lake files
in the conv-partitioned layout datagen.write_lake produces).  Each
completed partition writes its output directory ATOMICALLY (temp dir
+ rename — the reference's own atomicity trick, checkpoint.py:74-78)
and appends a small manifest record: lineage id (hash of the exact
input file list + pipeline config), row counts, bytes, wall time.

Resume = list manifests → skip partitions whose lineage id matches →
process only the remainder (the reference's PDF-path identity check,
pipeline.py:195-207, generalized per partition).  Manifests are
append-only, one JSON file per partition, so concurrent writers never
contend and a crash mid-partition leaves no partial manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass


@dataclass
class PartitionManifest:
    partition_id: int
    lineage_id: str
    input_files: list[str]
    row_count: int
    bytes_out: int
    wall_ms: float
    completed_at: float


def lineage_id(input_files: list[str], config_tag: str) -> str:
    """Stable id of (exact inputs, pipeline config) — a partition is
    reusable only if both match (reference pipeline.py:195-207)."""
    h = hashlib.sha256()
    for f in sorted(input_files):
        h.update(f.encode())
        h.update(b"\0")
    h.update(config_tag.encode())
    return h.hexdigest()[:16]


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"part-{partition_id:05d}.json")


def partition_dir(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"partition={partition_id:05d}")


def load_manifests(out_dir: str) -> dict[int, PartitionManifest]:
    """Read all valid manifests; corrupt files are ignored with a
    warning (reference CHECKPOINT_IMPLEMENTATION.md:191 semantics)."""
    mdir = _manifest_dir(out_dir)
    out: dict[int, PartitionManifest] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        path = os.path.join(mdir, name)
        try:
            with open(path) as f:
                data = json.load(f)
            m = PartitionManifest(**data)
            out[m.partition_id] = m
        except (json.JSONDecodeError, TypeError, KeyError):
            print(f"[WARN] corrupt manifest ignored: {path}")
    return out


def write_manifest(out_dir: str, m: PartitionManifest) -> None:
    """Atomic tmp+rename write (checkpoint.py:74-78 trick)."""
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = manifest_path(out_dir, m.partition_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f)
    os.replace(tmp, path)


def completed_partitions(
    out_dir: str, partitions: list[list[str]], config_tag: str
) -> set[int]:
    """Partition ids that can be skipped on resume: manifest exists AND
    its lineage id matches the current inputs+config AND the output
    directory is present."""
    manifests = load_manifests(out_dir)
    done: set[int] = set()
    for pid, files in enumerate(partitions):
        m = manifests.get(pid)
        if (
            m is not None
            and m.lineage_id == lineage_id(files, config_tag)
            and os.path.isdir(partition_dir(out_dir, pid))
        ):
            done.add(pid)
    return done


def progress_summary(out_dir: str, total_partitions: int) -> dict:
    """Run-progress from manifests ALONE — no dataset scan (reference
    A5, src/checkpoint.py:105-123: pages done, %, Q&A count)."""
    manifests = load_manifests(out_dir)
    rows = sum(m.row_count for m in manifests.values())
    byts = sum(m.bytes_out for m in manifests.values())
    done = len(manifests)
    return {
        "partitions_done": done,
        "partitions_total": total_partitions,
        "pct": round(100.0 * done / total_partitions, 1) if total_partitions else 0.0,
        "rows_written": rows,
        "bytes_written": byts,
    }


def clear_checkpoints(out_dir: str) -> None:
    """force_restart: drop manifests + outputs (reference
    pipeline.py:209-211 'Starting from scratch')."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)


def atomic_partition_swap(tmp_dir: str, out_dir: str, partition_id: int) -> None:
    """Move a completed partition's temp output into place atomically."""
    dest = partition_dir(out_dir, partition_id)
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.replace(tmp_dir, dest)


def now_ms() -> float:
    return time.monotonic() * 1000.0
