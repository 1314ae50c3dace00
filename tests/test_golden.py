"""Frozen-golden equality: pipeline output vs committed fixtures.

The fixtures were produced ONCE by the sequential oracle
(scripts/make_golden.py) and committed; this is the rebuild's analogue
of the reference's golden-corpus evaluation
(/root/reference/src/evaluator.py:216-292) with the similarity gate
tightened to bit-equality (deterministic heuristics allow it)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_extractor_ray.pipelines.extract import extraction_pipeline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

SORT = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("unit_id", "ascending"),
]

COLS = ["conv_id", "turn_idx", "unit_id", "extracted_text", "turn_span", "flags"]


@pytest.mark.usefixtures("ray_session")
def test_pipeline_reproduces_frozen_golden():
    transcripts = pq.read_table(os.path.join(GOLDEN_DIR, "transcripts.parquet"))
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "extracted.parquet"))

    ds = extraction_pipeline(ray.data.from_arrow(transcripts))
    got = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow")), promote_options="permissive"
    )
    got = got.select(COLS).sort_by(SORT)
    want = golden.select(COLS).sort_by(SORT)
    assert got.num_rows == want.num_rows
    assert got.equals(want)
