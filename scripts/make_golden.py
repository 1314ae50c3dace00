"""Freeze golden fixtures: synthetic lake slice → oracle → parquet.

Run once (committed output): ``python scripts/make_golden.py``.
The pytest suite then asserts the Ray pipeline reproduces
``tests/golden/extracted.parquet`` bit-for-bit (FIXTURES.md §2).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extractor_ray.datagen import transcripts_table  # noqa: E402
from pdf_extractor_ray.oracle import oracle_extract  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
N_CONVS = 40
SEED = 42
MEGA_EVERY = 20  # two mega conversations in the golden slice


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    table = transcripts_table(N_CONVS, seed=SEED, mega_every=MEGA_EVERY)
    pq.write_table(table, os.path.join(GOLDEN_DIR, "transcripts.parquet"))
    golden = oracle_extract(table)
    pq.write_table(golden, os.path.join(GOLDEN_DIR, "extracted.parquet"))
    print(f"wrote {table.num_rows} transcript rows, {golden.num_rows} golden rows")


if __name__ == "__main__":
    main()
