"""Robustness: conversations spanning input files; multi-MB payloads."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_extractor_ray.datagen import transcripts_table
from pdf_extractor_ray.oracle import oracle_extract
from pdf_extractor_ray.pipelines.extract import extraction_pipeline

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending"), ("unit_id", "ascending")]
COLS = ["conv_id", "turn_idx", "unit_id", "extracted_text", "turn_span", "flags"]


def _run(source) -> pa.Table:
    t = pa.concat_tables(
        list(extraction_pipeline(source).iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    return t.select(COLS).sort_by(SORT)


@pytest.mark.usefixtures("ray_session")
def test_conversation_spanning_files(tmp_path):
    """The plain pipeline has NO file-layout assumption: the conv_id
    shuffle co-locates a conversation split across input files (only
    run_with_checkpoint's partition skipping needs conv-bucketed
    files — documented in SCALE.md)."""
    table = transcripts_table(6, seed=11, mega_every=0)
    # Split every conversation's rows across two files by turn parity.
    idx = [i for i, t in enumerate(table.column("turn_idx").to_pylist())]
    even = table.take([i for i in idx if table.column("turn_idx")[i].as_py() % 2 == 0])
    odd = table.take([i for i in idx if table.column("turn_idx")[i].as_py() % 2 == 1])
    pq.write_table(even, str(tmp_path / "a.parquet"))
    pq.write_table(odd, str(tmp_path / "b.parquet"))

    golden = oracle_extract(table).select(COLS).sort_by(SORT)
    got = _run(str(tmp_path))
    assert got.equals(golden)


@pytest.mark.usefixtures("ray_session")
def test_wide_payload_rows():
    """Multi-MB payloads (the FIXTURES 'wide text rows' hard part):
    must stream through without failure and extract correctly."""
    big_content = "Filler sentence for bulk. " * 150_000  # ~3.9 MB
    html = (
        "<html><body><nav><a href='/'>x</a></nav>"
        f"<p>3.1 The question survives bulk.</p><p>Solution. Done.</p>"
        f"<div>{big_content}</div>"  # div text not in block whitelist → dropped
        "</body></html>"
    )
    rows = [
        {
            "conv_id": f"w{i}",
            "turn_idx": 0,
            "role": "user",
            "text": html,
            "tool": "html",
            "ts": 1_700_000_000_000_000 + i,
        }
        for i in range(6)
    ]
    table = pa.Table.from_pylist(rows)
    got = _run(ray.data.from_arrow(table))
    assert got.num_rows == 6
    assert set(got.column("unit_id").to_pylist()) == {"3.1"}
    assert all(
        t == "The question survives bulk. Done."
        for t in got.column("extracted_text").to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_auto_salt_engages_and_matches(small_lake):
    """auto_salt_threshold: metadata pre-pass detects the mega
    conversation and flips to the salted path; output stays bit-equal."""
    import glob

    from pdf_extractor_ray.pipelines.extract import max_conversation_turns

    m = max_conversation_turns(small_lake)
    assert m >= 800  # the lake's mega conversation

    table = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(os.path.join(small_lake, "*.parquet")))]
    )
    golden = oracle_extract(table).select(COLS).sort_by(SORT)

    got = pa.concat_tables(
        list(
            extraction_pipeline(small_lake, auto_salt_threshold=100).iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="permissive",
    ).select(COLS).sort_by(SORT)
    assert got.equals(golden)

    # threshold above the max → plain path, same answer
    got2 = pa.concat_tables(
        list(
            extraction_pipeline(small_lake, auto_salt_threshold=10_000).iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="permissive",
    ).select(COLS).sort_by(SORT)
    assert got2.equals(golden)


@pytest.mark.usefixtures("ray_session")
def test_all_queries_on_empty_lake(tmp_path):
    """EVERY registry query must survive an all-EMPTY lake (0-row
    tables with the real schemas) — at 100 TB a predicate-pushdown
    read legitimately produces zero rows for some partitions/date
    ranges.  The bar, per query: (a) no crash; (b) where an oracle
    exists, the ROW COUNT matches DuckDB on the same empty views
    (global aggregates still emit their NULL row, ROLLUP/CUBE their
    grand-total row); (c) when the engine result carries column names,
    they match the oracle's.  (A schema-less 0-row result — Ray drops
    the schema of a fully-empty exchange — is tolerated only at 0
    rows.)"""
    import duckdb
    import pandas as pd

    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "empty_sf")
    os.makedirs(sf)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(sf, f"{t}.parquet"))
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if name in ("extract_transcripts", "page_render"):
            continue  # transcript-lake surface, covered by their own tests
        try:
            result = fn(sf)
            df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
        except Exception as exc:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: CRASH {exc!r}")
            continue
        if name not in ORACLES:
            continue
        want = con.sql(ORACLES[name]).df()
        if len(df) != len(want):
            failures.append(f"{name}: rows {len(df)} != oracle {len(want)}")
        elif len(df.columns) and sorted(df.columns) != sorted(want.columns):
            failures.append(
                f"{name}: cols {sorted(df.columns)} != {sorted(want.columns)}"
            )
    assert not failures, "\n".join(failures)
