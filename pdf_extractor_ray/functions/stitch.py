"""Conversation-level stitch fold: the pure sequential core.

Re-expresses the reference's three sequential per-document passes —
carried-context assignment (/root/reference/src/pipeline.py:227-243 +
src/llm_extractor.py:47-60), multi-page stitching
(src/pipeline.py:17-89) and in-order reference resolution
(src/reference_resolver.py:401-465) — as ONE fold over a single
conversation's turns sorted by ``turn_idx``.  This fold is the unit of
work inside ``groupby("conv_id").map_groups`` and, via its explicit
``FoldState``, also the building block of the salted-shard path for
mega-conversation skew (stages/conversation.py): a shard resumes the
fold from the previous shard's exported state.

Semantics preserved from the reference:
- continuation merge only across ADJACENT turns (pages i, i+1 —
  pipeline.py:40-41); a continuation fragment with no adjacent open
  unit degrades to standalone content;
- question text appended with a space only when non-empty and novel,
  answers joined with a blank line (pipeline.py:54-59);
- chains spanning 3+ turns keep the merged unit open
  (pipeline.py:67);
- orphan part heads "(b)" at the top of a turn attach as new parts of
  the previous turn's last unit (prompts/extraction.md:83-90);
- flatten full_id = unit_id + part_id (pipeline.py:273-276);
- resolution walks units in document order, updating the lookup so
  chained references see resolved text (reference_resolver.py:458).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .normalize import normalize_full
from .refs import detect_references, resolve_unit
from .segment import Fragment


@dataclass
class TurnInput:
    """One extracted turn entering the fold."""

    turn_idx: int
    fragments: list[Fragment]
    spans: list[tuple[int, int, str]] = field(default_factory=list)
    parse_error: bool = False


@dataclass
class UnitRecord:
    unit_id: str  # base id ("2.18"); may be "" when unknown
    part_id: str  # "a" / "" — full id is unit_id + part_id
    question: str
    answer: str
    head_turn: int
    last_turn: int
    seq: int  # fragment index within the head turn (document order)
    open: bool  # continues into the next turn
    continued: bool = False  # was merged across turns
    parse_error: bool = False
    needs_id: bool = False  # orphan part attached while no unit id known
    spans: list[tuple[int, int, str]] = field(default_factory=list)
    figures: list[str] = field(default_factory=list)

    @property
    def full_id(self) -> str:
        return f"{self.unit_id}{self.part_id}"


@dataclass
class FoldState:
    """Carried fold state — the rebuild of the reference's
    ``previous_page_context`` dict (pipeline.py:237-243), made explicit
    so shard folds can resume it."""

    open_unit: UnitRecord | None = None
    last_unit_id: str = ""


@dataclass
class OutputRow:
    turn_idx: int
    unit_id: str
    extracted_text: str
    spans: list[tuple[int, int, str]]
    turn_span: tuple[int, int]
    continued: bool
    resolved: bool
    had_refs: bool
    parse_error: bool
    refs_found: list[str] = field(default_factory=list)
    figures: list[str] = field(default_factory=list)


def _merge_continuation(rec: UnitRecord, frag: Fragment, turn_idx: int) -> None:
    """Merge a loose-continuation fragment into an open unit.

    The fragment's text continues whatever the unit was last
    accumulating (answer once an answer exists, else question); an
    embedded Solution marker inside the fragment switches it to the
    answer.  Mirrors the reference's merge (pipeline.py:54-59).
    """
    if rec.answer:
        if frag.question:
            rec.answer = rec.answer + "\n\n" + frag.question
        if frag.answer:
            rec.answer = rec.answer + "\n\n" + frag.answer
    else:
        if frag.question and frag.question != rec.question:
            rec.question = (rec.question + " " + frag.question).strip()
        if frag.answer:
            rec.answer = frag.answer
    rec.figures = rec.figures + frag.figures  # union (ref pipeline.py:66)
    rec.last_turn = turn_idx
    rec.continued = True
    rec.open = frag.continues_next  # chain if still continuing (ref :67)


def stitch_conversation(
    turns: list[TurnInput], state: FoldState | None = None
) -> tuple[list[UnitRecord], FoldState]:
    """Fold turns (MUST be sorted by turn_idx, unique) into unit
    records in document order, resuming from ``state`` if given.

    A continuation merged into ``state.open_unit`` mutates that record
    in place (it belongs to the caller); only units *created* here
    appear in the returned list.
    """
    st = state if state is not None else FoldState()
    units: list[UnitRecord] = []

    for turn in turns:
        if not turn.fragments:
            # Empty extraction (boilerplate-only or parse failure) —
            # the reference's empty-page fallback
            # (llm_extractor.py:103-106): emit an empty content row.
            units.append(
                UnitRecord(
                    unit_id="",
                    part_id="",
                    question="",
                    answer="",
                    head_turn=turn.turn_idx,
                    last_turn=turn.turn_idx,
                    seq=0,
                    open=False,
                    parse_error=turn.parse_error,
                    spans=list(turn.spans),
                )
            )
            st.open_unit = None
            continue

        for i, frag in enumerate(turn.fragments):
            if (
                i == 0
                and frag.kind == "cont"
                and st.open_unit is not None
                and st.open_unit.open
                and st.open_unit.last_turn == turn.turn_idx - 1
            ):
                _merge_continuation(st.open_unit, frag, turn.turn_idx)
                st.open_unit.spans.extend(turn.spans)
                if not st.open_unit.open:
                    st.open_unit = None
                continue

            # Resolve the fragment's unit id.
            unit_id = frag.unit_id
            needs_id = False
            if frag.kind == "part" and not unit_id:
                # Orphan part head: attach to the most recent unit id
                # (carried-context rule, prompts/extraction.md:83-90).
                unit_id = st.last_unit_id
                needs_id = not unit_id
            if frag.kind == "cont":
                # Continuation with nothing to attach to → content.
                unit_id = ""

            rec = UnitRecord(
                unit_id=unit_id,
                part_id=frag.part_id if frag.kind in ("unit", "part") else "",
                question=frag.question,
                answer=frag.answer,
                head_turn=turn.turn_idx,
                last_turn=turn.turn_idx,
                seq=i,
                open=frag.continues_next,
                parse_error=turn.parse_error,
                needs_id=needs_id,
                spans=list(turn.spans) if i == 0 else [],
                figures=list(frag.figures),
            )
            units.append(rec)
            if frag.kind in ("unit", "part") and unit_id:
                st.last_unit_id = unit_id
            st.open_unit = rec if rec.open else None

    return units, st


def resolve_conversation(units: list[UnitRecord]) -> list[OutputRow]:
    """Document-order reference resolution + flatten to output rows.

    ``units`` must be in document order — (head_turn, seq) ascending —
    which is creation order for a plain fold."""
    lookup: dict[str, tuple[str, str]] = {
        u.full_id: (u.question, u.answer) for u in units if u.full_id
    }

    rows: list[OutputRow] = []
    for u in units:
        detection = detect_references(u.question, u.answer)
        question, answer, resolved = u.question, u.answer, False
        if detection.ref_ids:
            question, answer, resolved = resolve_unit(
                u.question, u.answer, detection, lookup
            )
            if resolved and u.full_id:
                # Chained references see the resolved text
                # (reference_resolver.py:458).
                lookup[u.full_id] = (question, answer)

        norm_q = normalize_full(question)
        norm_a = normalize_full(answer)
        text = (norm_q + " " + norm_a).strip() if norm_a else norm_q
        rows.append(
            OutputRow(
                turn_idx=u.head_turn,
                unit_id=u.full_id,
                extracted_text=text,
                spans=u.spans,
                turn_span=(u.head_turn, u.last_turn),
                continued=u.continued,
                resolved=resolved,
                had_refs=detection.had_refs,
                parse_error=u.parse_error,
                refs_found=detection.ref_texts[:8],
                figures=u.figures,
            )
        )
    return rows


def process_conversation(turns: list[TurnInput]) -> list[OutputRow]:
    """stitch + resolve: the complete per-conversation transform."""
    units, _ = stitch_conversation(turns)
    return resolve_conversation(units)
