"""Single-threaded, obviously-correct oracle for golden fixtures.

Processes the transcript table exactly like the reference processes a
PDF — one conversation at a time, strictly sequential turn loop
(/root/reference/src/pipeline.py:214-256) — using the same pure
per-payload extractors.  The Ray pipeline must reproduce this output
bit-for-bit under stable (conv_id, turn_idx, unit_id) ordering; what
the comparison therefore verifies is the *distributed orchestration*
(shuffle, group ordering, salted-shard boundary merging, dedup),
which is exactly where parallelism could diverge from the sequential
semantics.
"""

from __future__ import annotations

import pyarrow as pa

from .config import DEFAULT_CONFIG, ExtractorConfig
from .functions.stitch import TurnInput, process_conversation
from .schema import EXTRACTED_SCHEMA, SPAN_TYPE
from .stages.turn_extract import extract_turn


def oracle_extract(table: pa.Table, cfg: ExtractorConfig = DEFAULT_CONFIG) -> pa.Table:
    """Sequential reference implementation over a transcript table."""
    rows = table.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    ).to_pylist()

    out: list[dict] = []
    conv_id: str | None = None
    turns: list[TurnInput] = []

    def flush() -> None:
        if conv_id is None:
            return
        for r in process_conversation(turns):
            out.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": r.turn_idx,
                    "unit_id": r.unit_id,
                    "extracted_text": r.extracted_text,
                    "spans": [
                        {"start": s, "end": e, "kind": k} for s, e, k in r.spans
                    ],
                    "turn_span": list(r.turn_span),
                    "flags": {
                        "continued": r.continued,
                        "resolved": r.resolved,
                        "had_refs": r.had_refs,
                        "parse_error": r.parse_error,
                    },
                    "refs_found": r.refs_found,
                    "figures": r.figures,
                }
            )

    for row in rows:
        if row["conv_id"] != conv_id:
            flush()
            conv_id = row["conv_id"]
            turns = []
        frags, spans, err = extract_turn(row["text"], row["tool"], cfg)
        ti = TurnInput(
            turn_idx=row["turn_idx"], fragments=frags, spans=spans, parse_error=err
        )
        if turns and turns[-1].turn_idx == ti.turn_idx:
            turns[-1] = ti  # duplicate turn: newest (by ts) wins
        else:
            turns.append(ti)
    flush()

    if not out:
        return EXTRACTED_SCHEMA.empty_table()
    cols = {
        f.name: pa.array([r[f.name] for r in out], type=f.type)
        for f in EXTRACTED_SCHEMA
    }
    return pa.table(cols).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("unit_id", "ascending")]
    )
