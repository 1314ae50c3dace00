"""Turn-level extraction stage: the actor-pool map.

Rebuild of the reference's core page-extraction step
(/root/reference/src/llm_extractor.py:30-106 + the per-payload parse
paths of src/pdf_processor.py) as a stateful ``map_batches`` class:
warm parser state (compiled regexes, config tables, optional
pdfplumber handle) is constructed ONCE per actor in ``__init__``
(reference ST1-ST3, SURVEY §2.3); ``__call__`` processes a zero-copy
Arrow batch and emits segmented fragments + spans, with the raw
payload column dropped so only extracted structure crosses the
conv_id shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..functions.htmlx import extract_html
from ..functions.pdfx import extract_pdf
from ..functions.segment import Fragment, segment_units
from ..functions.toolx import extract_tool_markup
from ..schema import TURN_EXTRACTED_SCHEMA

_WS_KINDS = {"html", "pdf", "tool_markup"}


def extract_payload(
    text: str, kind: str, cfg: ExtractorConfig
) -> tuple[str, list[tuple[int, int, str]], bool]:
    """Dispatch one payload to its extractor (strategy selection; the
    rebuild's analogue of the provider switch at
    /root/reference/src/llm_extractor.py:108-135)."""
    if kind == "html":
        return extract_html(text, cfg)
    if kind == "pdf":
        return extract_pdf(text, cfg)
    if kind == "tool_markup":
        return extract_tool_markup(text)
    # Plain text: passthrough (whitespace kept; normalization happens
    # downstream).
    return text, [(0, len(text), "plain")] if text else [], False


def extract_turn(
    text: str, kind: str, cfg: ExtractorConfig = DEFAULT_CONFIG
) -> tuple[list[Fragment], list[tuple[int, int, str]], bool]:
    """payload → main content → segmented fragments (pure, unit-tested)."""
    content, spans, parse_error = extract_payload(text or "", kind or "", cfg)
    fragments = segment_units(content, cfg) if content else []
    return fragments, spans, parse_error


def _frag_dict(f: Fragment) -> dict:
    return {
        "kind": f.kind,
        "unit_id": f.unit_id,
        "part_id": f.part_id,
        "question": f.question,
        "answer": f.answer,
        "continues_next": f.continues_next,
        "continued_prev": f.continued_prev,
    }


class TurnExtractor:
    """Callable class for ``ds.map_batches(TurnExtractor, concurrency=N,
    batch_format="pyarrow", zero_copy_batch=True)``.

    Parsing is irreducibly per-row (each row is one document payload);
    batch assembly is Arrow-native and the heavy state (config tables,
    compiled regexes living at module import, optional external parser
    libraries) is amortized across the actor's lifetime.
    """

    def __init__(self, cfg: ExtractorConfig | None = None):
        self.cfg = cfg or DEFAULT_CONFIG
        # Touch the compiled-regex modules once so import cost is paid
        # at actor startup, not first batch.
        from ..functions import htmlx, pdfx, segment, toolx  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        kinds = batch.column("tool").to_pylist()

        fragments_col: list[list[dict]] = []
        spans_col: list[list[dict]] = []
        err_col: list[bool] = []
        for text, kind in zip(texts, kinds):
            try:
                frags, spans, err = extract_turn(text, kind, self.cfg)
            except Exception:
                # Poison-pill payload → empty extraction row, never a
                # failed block (reference llm_extractor.py:103-106).
                frags, spans, err = [], [], True
            fragments_col.append([_frag_dict(f) for f in frags])
            spans_col.append(
                [{"start": s, "end": e, "kind": k} for s, e, k in spans]
            )
            err_col.append(err)

        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx").cast(pa.int32()),
            "fragments": pa.array(
                fragments_col, type=TURN_EXTRACTED_SCHEMA.field("fragments").type
            ),
            "spans": pa.array(
                spans_col, type=TURN_EXTRACTED_SCHEMA.field("spans").type
            ),
            "parse_error": pa.array(err_col, type=pa.bool_()),
        }
        # ts rides along (8 bytes/row) so the conversation stage can
        # dedup dirty-lake duplicate turns last-write-wins.
        if "ts" in batch.column_names:
            cols["ts"] = batch.column("ts")
        return pa.table(cols)
