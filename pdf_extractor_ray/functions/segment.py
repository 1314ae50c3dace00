"""Unit segmentation of extracted main-content text.

Splits a turn's main content into content *units* (the rebuild's
analogue of the reference's per-page Question/QuestionPart structure,
/root/reference/src/schemas/extraction.py:19-52), emitting the
continuation flags that drive conversation-level stitching:

- a line starting with an id like ``2.7`` / ``2.18a`` opens a new unit;
- a line starting with a bare part marker ``(b)`` opens a new part of
  the current unit — or, at the top of a turn with no preceding unit
  head, an *orphan* part that must attach to the previous turn's last
  unit (the carried-context rule,
  /root/reference/prompts/extraction.md:83-90);
- a ``Solution.`` marker switches accumulation from question to answer;
- leading text that begins with a lowercase letter and no head marker
  is a *loose continuation* of the previous turn's open unit
  (``continued_prev``);
- the final fragment is flagged ``continues_next`` when its text ends
  without terminal punctuation (the deterministic stand-in for the
  reference's LLM-judged ``continues_next_page``,
  /root/reference/src/schemas/extraction.py:29-36).

Fragment kinds: ``unit`` (has id) | ``part`` (bare part head) |
``cont`` (loose continuation) | ``content`` (non-unit text, only when
the turn has no units at all).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import DEFAULT_CONFIG, ExtractorConfig

UNIT_HEAD_RE = re.compile(r"^(\d+\.\d+)([a-z]?)[\s.:)]")
PART_HEAD_RE = re.compile(r"^\(([a-z])\)\s")
ANSWER_RE = re.compile(r"^(\\textbf\{Solution\.\}|Solution\.)\s*")


@dataclass
class Fragment:
    """One segmented fragment of a turn."""

    kind: str  # unit | part | cont | content
    unit_id: str = ""  # "" when unknown (part/cont/content)
    part_id: str = ""
    question: str = ""
    answer: str = ""
    continues_next: bool = False
    continued_prev: bool = False
    figures: list[str] = field(default_factory=list)


@dataclass
class _Builder:
    kind: str
    unit_id: str = ""
    part_id: str = ""
    q_lines: list[str] = field(default_factory=list)
    a_lines: list[str] = field(default_factory=list)
    in_answer: bool = False

    def add(self, line: str) -> None:
        (self.a_lines if self.in_answer else self.q_lines).append(line)

    def build(self) -> Fragment:
        return Fragment(
            kind=self.kind,
            unit_id=self.unit_id,
            part_id=self.part_id,
            question="\n".join(self.q_lines).strip(),
            answer="\n".join(self.a_lines).strip(),
        )


def _ends_terminal(text: str, cfg: ExtractorConfig) -> bool:
    t = text.rstrip().rstrip("})\"'")
    return bool(t) and t[-1] in cfg.terminal_chars


def segment_units(
    text: str, cfg: ExtractorConfig = DEFAULT_CONFIG
) -> list[Fragment]:
    """Segment main-content text into ordered fragments (see module doc)."""
    text = text.strip()
    if not text:
        return []

    fragments: list[Fragment] = []
    cur: _Builder | None = None
    current_unit_id = ""  # last unit id opened in THIS turn
    saw_unit_head = False

    def flush() -> None:
        nonlocal cur
        if cur is not None:
            frag = cur.build()
            if frag.question or frag.answer:
                fragments.append(frag)
            cur = None

    for raw_line in text.split("\n"):
        line = raw_line.strip()
        if not line:
            if cur is not None:
                cur.add("")
            continue

        m = UNIT_HEAD_RE.match(line + " ")  # pad so "2.7" alone matches
        if m:
            flush()
            saw_unit_head = True
            current_unit_id = m.group(1)
            cur = _Builder(kind="unit", unit_id=current_unit_id, part_id=m.group(2))
            rest = line[m.end(1) + len(m.group(2)):].lstrip(" .:)")
            am = ANSWER_RE.match(rest)
            if am:
                cur.in_answer = True
                rest = rest  # keep the marker text; normalization strips it later
            if rest:
                cur.add(rest)
            continue

        pm = PART_HEAD_RE.match(line)
        if pm:
            flush()
            # Part of this turn's current unit, or an orphan head that
            # the stitch fold attaches to the previous turn's last unit.
            cur = _Builder(
                kind="unit" if saw_unit_head else "part",
                unit_id=current_unit_id,
                part_id=pm.group(1),
            )
            rest = line[pm.end():]
            if rest:
                cur.add(rest)
            continue

        am = ANSWER_RE.match(line)
        if am and cur is not None and not cur.in_answer:
            cur.in_answer = True
            cur.add(line)
            continue

        if cur is None:
            # Leading text with no head marker: lowercase start reads as
            # a mid-sentence continuation of the previous turn's open
            # unit; anything else is standalone content.
            cur = _Builder(kind="cont" if line[0].islower() else "content")
            cur.add(line)
            continue

        cur.add(line)

    flush()

    if not fragments:
        return []

    # A turn with real units treats standalone "content" preamble as
    # non-unit noise (the reference's page chrome); a unit-free turn is
    # pure content.
    has_units = any(f.kind in ("unit", "part") for f in fragments)
    if has_units:
        fragments = [f for f in fragments if f.kind != "content"]

    if fragments:
        # "cont" = same part's text flows on (reference
        # continued_from_previous); an orphan "part" head instead
        # attaches as a NEW part of the previous turn's last unit.
        fragments[0].continued_prev = fragments[0].kind == "cont"
        last = fragments[-1]
        last.continues_next = not _ends_terminal(last.answer or last.question, cfg)
    return fragments
