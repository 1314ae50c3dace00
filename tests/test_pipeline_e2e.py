"""End-to-end: Ray pipeline output ≡ sequential oracle, bit-for-bit."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor_ray.datagen import transcripts_table
from pdf_extractor_ray.oracle import oracle_extract
from pdf_extractor_ray.pipelines.extract import extraction_pipeline

SORT = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("unit_id", "ascending"),
]


def _canon(t: pa.Table) -> pa.Table:
    return t.select(
        ["conv_id", "turn_idx", "unit_id", "extracted_text", "turn_span", "flags"]
    ).sort_by(SORT)


def run_pipeline(source, **kw) -> pa.Table:
    ds = extraction_pipeline(source, **kw)
    # iter_batches(batch_format="pyarrow") yields pa.Table blocks
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tables, promote_options="permissive")


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_oracle(small_lake):
    import ray.data

    golden = _canon(
        oracle_extract(
            pa.concat_tables(
                [pq.read_table(p) for p in sorted_parquets(small_lake)]
            )
        )
    )
    got = _canon(run_pipeline(small_lake))
    assert got.num_rows == golden.num_rows, (got.num_rows, golden.num_rows)
    assert got.equals(golden), diff_report(got, golden)


@pytest.mark.usefixtures("ray_session")
def test_pipeline_salted_matches_oracle(small_lake):
    """Salted-shard stitching (tiny W to stress chains crossing cuts)
    must equal the plain sequential semantics exactly."""
    golden = _canon(
        oracle_extract(
            pa.concat_tables(
                [pq.read_table(p) for p in sorted_parquets(small_lake)]
            )
        )
    )
    got = _canon(run_pipeline(small_lake, salt_turns=3))
    assert got.num_rows == golden.num_rows, (got.num_rows, golden.num_rows)
    assert got.equals(golden), diff_report(got, golden)


@pytest.mark.usefixtures("ray_session")
def test_duplicate_turns_last_write_wins():
    """Dirty-lake duplicates: newest ts version of a turn wins."""
    import ray.data

    base = transcripts_table(4, seed=7, mega_every=0)
    # Duplicate every turn of conv 0 with an older ts and junk text —
    # the pipeline must ignore the older rows.
    older = base.to_pylist()
    import datetime

    dup_rows = [
        {
            **r,
            "ts": r["ts"] - datetime.timedelta(seconds=1),
            "text": "<p>stale duplicate row</p>",
            "tool": "html",
        }
        for r in older
        if r["conv_id"] == "c0000000"
    ]
    dirty = pa.concat_tables(
        [base, pa.Table.from_pylist(dup_rows, schema=base.schema)]
    )
    golden = _canon(oracle_extract(dirty))
    got = _canon(run_pipeline(ray.data.from_arrow(dirty)))
    assert got.equals(golden), diff_report(got, golden)


def sorted_parquets(d):
    import os

    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def diff_report(got: pa.Table, golden: pa.Table) -> str:
    import pandas as pd

    g, o = got.to_pandas(), golden.to_pandas()
    for col in ("conv_id", "turn_idx", "unit_id", "extracted_text"):
        if not g[col].astype(str).equals(o[col].astype(str)):
            mask = g[col].astype(str) != o[col].astype(str)
            idx = mask[mask].index[:5]
            return f"first diffs in {col}:\n got={g.loc[idx]}\n want={o.loc[idx]}"
    return "tables differ in nested/flag columns"


@pytest.mark.usefixtures("ray_session")
def test_pipeline_actor_pool_matches_oracle(small_lake):
    """The ``use_actor_pool=True`` branch (heavy-init parsers — the
    warm-pdfplumber-in-actor-state configuration from the reference's
    north star) must run end-to-end and equal the sequential oracle
    exactly; keeps the actor configuration from rotting (VERDICT r2
    item 7)."""
    from pdf_extractor_ray.config import RunConfig

    golden = _canon(
        oracle_extract(
            pa.concat_tables([pq.read_table(p) for p in sorted_parquets(small_lake)])
        )
    )
    run = RunConfig(use_actor_pool=True, extract_concurrency=2, num_cpus_per_actor=1.0)
    got = _canon(run_pipeline(small_lake, run=run))
    assert got.num_rows == golden.num_rows, (got.num_rows, golden.num_rows)
    assert got.equals(golden), diff_report(got, golden)
