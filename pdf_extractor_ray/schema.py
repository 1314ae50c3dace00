"""Arrow schemas for every stage boundary.

The reference validates its object graph with Pydantic
(/root/reference/src/schemas/extraction.py); the rebuild's equivalent
is explicit ``pyarrow`` schemas enforced at each ``map_batches``
boundary — lenient ingest, strict internal schema
(/root/reference/src/llm_extractor.py:75-101 semantics).
"""

from __future__ import annotations

import pyarrow as pa

# Input lake (BASELINE.json input hint, exact shape).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# One segmented fragment (analogue of the reference QuestionPart,
# /root/reference/src/schemas/extraction.py:19-36).
FRAGMENT_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("unit_id", pa.string()),
        ("part_id", pa.string()),
        ("question", pa.string()),
        ("answer", pa.string()),
        ("continues_next", pa.bool_()),
        ("continued_prev", pa.bool_()),
    ]
)

SPAN_TYPE = pa.struct(
    [("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())]
)

# Turn-extraction stage output: raw text column DROPPED before the
# conv_id shuffle (only extracted structure moves — SURVEY §7.5).
# ``payload`` is an opaque pickle of (fragments: list[Fragment],
# spans: list[tuple], parse_error: bool) — the logical shape is
# FRAGMENT_TYPE/SPAN_TYPE above; binary beats list<struct> ~3× on
# build+read and the shuffle never looks inside it.
TURN_EXTRACTED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("payload", pa.binary()),
        ("ts", pa.timestamp("us")),
    ]
)

FLAGS_TYPE = pa.struct(
    [
        ("continued", pa.bool_()),
        ("resolved", pa.bool_()),
        ("had_refs", pa.bool_()),
        ("parse_error", pa.bool_()),
    ]
)

# Final output rows (analogue of the reference ExtractionResult,
# /root/reference/src/schemas/extraction.py:55-62, per FIXTURES.md §2).
EXTRACTED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("unit_id", pa.string()),
        ("extracted_text", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("turn_span", pa.list_(pa.int32(), 2)),
        ("flags", FLAGS_TYPE),
        # resolution-tracking detail (reference resolution_results.json,
        # /root/reference/src/pipeline.py:326-351): the matched
        # reference phrases, empty for ref-free rows
        ("refs_found", pa.list_(pa.string())),
        # detected figure ids (reference ExtractionResult.figures,
        # /root/reference/src/schemas/extraction.py:60; unioned across
        # stitched turns per src/pipeline.py:66)
        ("figures", pa.list_(pa.string())),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
