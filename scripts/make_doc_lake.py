"""Deterministic large `documents` lake for dedup-family scale runs.

Same shape as the driver's testdata documents table (doc_id, text,
lang, source, n_chars).  Text is synthetic: ~`words_per_doc` draws
from a 1,000-word vocabulary with a per-shard seeded RNG (no wall
clock anywhere), so the lake reproduces bit-identically.  A planted
`dup_frac` of docs copy the text of an earlier doc (groups of exact
duplicates for the dedup operators to find); everything else is
unique with near-dup-free high probability.

Usage: python scripts/make_doc_lake.py OUT_DIR N_DOCS [N_FILES]
Writes OUT_DIR/documents.parquet/ as N_FILES part files (the
directory form every reader in this repo already handles).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB_SIZE = 1000
WORDS_PER_DOC = 60
DUP_FRAC = 0.01
LANGS = np.array(["en", "de", "fr", "es", "it"])
N_SOURCES = 20

_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _vocab() -> np.ndarray:
    rng = np.random.RandomState(7)
    words = []
    for _ in range(VOCAB_SIZE):
        n = rng.randint(2, 5)
        w = "".join(
            _CONS[rng.randint(len(_CONS))] + _VOW[rng.randint(len(_VOW))]
            for _ in range(n)
        )
        words.append(w)
    return np.array(words)


def _shard(shard: int, n: int, base: int, vocab: np.ndarray) -> pa.Table:
    rng = np.random.RandomState(100_000 + shard)
    idx = rng.randint(0, VOCAB_SIZE, size=(n, WORDS_PER_DOC))
    words = vocab[idx]  # (n, w) of str
    flat = pa.array(words.ravel(), pa.string())
    offsets = pa.array(np.arange(0, n * WORDS_PER_DOC + 1, WORDS_PER_DOC, dtype=np.int32))
    lists = pa.ListArray.from_arrays(offsets, flat)
    text = pc.binary_join(lists, " ")
    # plant exact duplicates: the last DUP_FRAC of the shard copies the
    # text of an earlier in-shard doc (deterministic pairing)
    n_dup = int(n * DUP_FRAC)
    if n_dup:
        t = text.to_pylist()
        for j in range(n_dup):
            t[n - n_dup + j] = t[j % (n - n_dup)]
        text = pa.array(t, pa.string())
    doc_id = np.arange(base, base + n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": text,
            "lang": pa.array(LANGS[doc_id % len(LANGS)], pa.string()),
            "source": pa.array(
                np.char.add("src", (doc_id % N_SOURCES).astype(str)), pa.string()
            ),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        }
    )


def main() -> None:
    out, n_docs = sys.argv[1], int(sys.argv[2])
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    tdir = os.path.join(out, "documents.parquet")
    os.makedirs(tdir, exist_ok=True)
    vocab = _vocab()
    per = (n_docs + n_files - 1) // n_files
    total = 0
    for s in range(n_files):
        n = min(per, n_docs - total)
        if n <= 0:
            break
        t = _shard(s, n, total, vocab)
        pq.write_table(t, os.path.join(tdir, f"part-{s:04d}.parquet"))
        total += n
    print(f"wrote {total} docs in {s + 1} files under {tdir}")


if __name__ == "__main__":
    main()
