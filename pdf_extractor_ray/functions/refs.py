"""Deterministic cross-reference detection and resolution.

The reference detects references with an LLM and rewrites the Q&A with
inlined context (/root/reference/src/reference_resolver.py:230-399),
iterating in document order and updating its lookup table so *later*
units see *resolved* earlier units (chained references,
reference_resolver.py:458).  The rebuild replaces the LLM with the
reference's own published regex pattern set (the evaluator's
remaining-reference patterns, /root/reference/src/evaluator.py:53-69)
plus an id-capturing pattern, and a deterministic context-inlining
rule, preserving the document-order chaining semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Generic reference shapes (no resolvable id) — same 15 semantic
# patterns as the reference's evaluator REF_PATTERNS
# (/root/reference/src/evaluator.py:53-69).
_GENERIC_PATTERNS = (
    r"theorem\s+\d+",
    r"lemma\s+\d+",
    r"corollary\s+\d+",
    r"proposition\s+\d+",
    r"remark\s+\d+",
    r"example\s+\d+",
    r"definition\s+\d+",
    r"exercise\s+\d+",
    r"problem\s+\d+",
    r"equation\s*\(\d+",
    r"section\s+\d+",
    r"chapter\s+\d+",
    r"page\s+\d+",
    r"see\s+\(\d+",
    r"from\s+\(\d+",
)
GENERIC_REF_PATTERNS = [re.compile(p, re.IGNORECASE) for p in _GENERIC_PATTERNS]
# One alternation scan instead of 15 passes (identical match-set
# semantics for the boolean/phrase-list use below).  A bare
# alternation forfeits the regex engine's fast literal-prefix scan, so
# the hot path first gates on cheap substring checks: every pattern
# contains its keyword as a literal, so "no keyword present" proves
# "no match" — most units skip the regex entirely.
GENERIC_REF_RE = re.compile("|".join(_GENERIC_PATTERNS), re.IGNORECASE)

# Hot-path scanner: every pattern starts with a literal keyword, so
# locate keyword occurrences with str.find (memmem — orders of
# magnitude faster than regex position-by-position scanning) and
# attempt the anchored pattern only there.  Equivalent match set; the
# full-regex form above remains for one-shot uses.
_KW_ANCHORED: list[tuple[str, re.Pattern]] = [
    (p.split("\\")[0].rstrip(), re.compile(p, re.IGNORECASE)) for p in _GENERIC_PATTERNS
]


def scan_generic_refs(text: str) -> list[str]:
    """All generic-reference phrase matches, in text order."""
    low = text.lower()
    hits: list[tuple[int, str]] = []
    for kw, pat in _KW_ANCHORED:
        start = low.find(kw)
        while start >= 0:
            m = pat.match(text, start)
            if m:
                hits.append((start, m.group(0)))
                start = low.find(kw, m.end())
            else:
                start = low.find(kw, start + 1)
    hits.sort()
    return [h[1] for h in hits]

# "using 2.7", "from exercise 3.4a", "by the result of 2.2", … — a
# reference with an id we can resolve within the conversation.
ID_REF_RE = re.compile(
    r"\b(?:using|from|by|see|in|of|per|apply(?:ing)?)\s+"
    r"(?:the\s+)?(?:result\s+(?:of\s+)?)?"
    r"(?:exercise|problem|question|part|item)?\s*"
    r"(\d+\.\d+[a-z]?)\b",
    re.IGNORECASE,
)

# Any ID_REF match must contain a "d.d" id — a cheap existence probe
# gates the expensive alternation scan.
_HAS_ID_RE = re.compile(r"\d\.\d")

_SENTENCE_RE = re.compile(r"^.*?[.!?](?=\s|$)", re.DOTALL)
_CONTEXT_CAP = 200


@dataclass
class Detection:
    had_refs: bool
    ref_ids: list[str]  # resolvable ids, in match order, deduped
    ref_texts: list[str]  # all matched reference phrases


def detect_references(question: str, answer: str) -> Detection:
    """Regex-based detection over question+answer (lowercased match,
    mirroring /root/reference/src/evaluator.py:132-148)."""
    text = question + " " + answer
    ref_texts: list[str] = scan_generic_refs(text)
    ids: list[str] = []
    if _HAS_ID_RE.search(text):
        for m in ID_REF_RE.finditer(text):
            ref_texts.append(m.group(0))
            rid = m.group(1)
            if rid not in ids:
                ids.append(rid)
    return Detection(had_refs=bool(ref_texts), ref_ids=ids, ref_texts=ref_texts)


def context_snippet(ref_question: str, ref_answer: str) -> str:
    """The deterministic stand-in for LLM context extraction: the first
    sentence of the referenced answer (else question), capped."""
    src = (ref_answer or ref_question).strip()
    for marker in (r"\textbf{Solution.}", "Solution."):
        if src.startswith(marker):
            src = src[len(marker):].strip()
    m = _SENTENCE_RE.match(src)
    snippet = m.group(0) if m else src
    return snippet[:_CONTEXT_CAP].strip()


def resolve_unit(
    question: str,
    answer: str,
    detection: Detection,
    lookup: dict[str, tuple[str, str]],
) -> tuple[str, str, bool]:
    """Resolve the first resolvable reference (the reference resolves
    only the first essential ref, reference_resolver.py:319-321).

    ``lookup`` maps full unit id → (question, answer), already updated
    with previously *resolved* units for chaining.  Returns
    ``(question, answer, resolved)`` — the answer is never modified
    (the reference instructs the same, reference_resolver.py:118).
    """
    for rid in detection.ref_ids:
        hit = lookup.get(rid)
        if hit is None:
            continue
        snippet = context_snippet(hit[0], hit[1])
        resolved_q = f"{question}\n\n[Context from {rid}: {snippet}]"
        return resolved_q, answer, True
    return question, answer, False
