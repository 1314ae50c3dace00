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
def test_round3_queries_on_empty_lake(tmp_path):
    """Every round-3 operator must survive an EMPTY lake (0-row tables
    with the real schemas) — returning an empty frame, never crashing:
    at 100 TB a predicate-pushdown read legitimately produces zero
    rows for some partitions/date ranges."""
    import pandas as pd

    from pdf_extractor_ray.pipelines.queries import QUERIES

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "empty_sf")
    os.makedirs(sf)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(sf, f"{t}.parquet"))

    round3 = [
        "graph_components", "tpch_q14", "tpch_q18", "percentile_cont",
        "edit_dedup", "unigram_logprob", "lang_balance", "drawdown",
        "unpivot_events", "embed_norms", "pareto_front", "interval_union",
        "weighted_avg", "histogram_2d", "pagerank", "time_weighted_avg",
    ]
    for name in round3:
        result = QUERIES[name](sf)
        df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
        if name == "tpch_q14":
            # a global aggregate returns ONE row (NULL ratio) on empty
            # input — the oracle's semantics exactly
            assert len(df) == 1 and pd.isna(df["promo_pct"].iloc[0])
        else:
            assert len(df) == 0, f"{name} returned rows from an empty lake"
