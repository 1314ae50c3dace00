"""Deterministic big embeddings lake (SCALE protocol, round 5).

Schema-identical to testdata embeddings (vec_id:int64,
embedding:list<float> 64-d unit-norm, label:int32 in 0..9): 10
well-separated cluster centers + in-cluster noise, with 1% planted
near-duplicate pairs (a copy nudged by 1e-3 noise) so the
neardup/ANN family has real structure to find at scale.

Usage: python scripts/make_embed_lake.py OUT_DIR N_ROWS [N_FILES]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def main() -> int:
    out_dir, n_rows = sys.argv[1], int(sys.argv[2])
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(20260821)
    centers = rng.standard_normal((10, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    labels = rng.integers(0, 10, size=n_rows).astype(np.int32)
    vecs = centers[labels] + 0.35 * rng.standard_normal((n_rows, DIM))
    # plant near-dup pairs: each row i in the last 1% copies row i - n//2
    n_dup = max(1, n_rows // 100)
    src = np.arange(n_dup)
    dst = n_rows - n_dup + src
    vecs[dst] = vecs[src] + 1e-3 * rng.standard_normal((n_dup, DIM))
    labels[dst] = labels[src]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)

    path = os.path.join(out_dir, "embeddings.parquet")
    os.makedirs(path, exist_ok=True)
    per = (n_rows + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n_rows)
        if lo >= hi:
            break
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs[lo:hi]), pa.list_(pa.float32())
                ),
                "label": pa.array(labels[lo:hi], pa.int32()),
            }
        )
        pq.write_table(t, os.path.join(path, f"part-{f:03d}.parquet"))
    print(f"wrote {n_rows} rows to {path} in {min(n_files, f + 1)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
