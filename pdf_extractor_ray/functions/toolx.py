"""Tool-output markup extraction.

The reference parses LLM responses by stripping markdown code fences
and tolerantly JSON-decoding the payload, degrading to an empty page
on failure (/root/reference/src/llm_extractor.py:66-106, duplicated at
src/reference_resolver.py:204-228).  The rebuild applies the same
semantics to tool-output turns: content lives in fenced blocks
surrounded by invocation chrome; fenced content is extracted, a
``json``-labeled fence must parse as JSON to count, and a payload with
no recoverable content yields an empty row (never an exception).
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"```([a-zA-Z0-9_-]*)[ \t]*\n(.*?)```", re.DOTALL)
# Chrome lines the generator/agent runtimes wrap tool output in,
# e.g. "[tool:search] invoked", "[exit 0]".
_CHROME_RE = re.compile(r"^\[[^\]]*\]\s*.*$")


def extract_tool_markup(raw: str) -> tuple[str, list[tuple[int, int, str]], bool]:
    """Extract content from tool-output markup.

    Returns ``(text, spans, parse_error)``:

    - fenced blocks present → their contents joined with "\\n\\n", in
      order; a fence labeled ``json`` whose body fails ``json.loads``
      is excluded and flags ``parse_error`` (reference
      llm_extractor.py:103-106 empty-fallback semantics);
    - no fences → chrome lines (``[...]``-prefixed) are dropped and the
      remainder kept;
    - nothing recoverable → ("", [], True).
    """
    parse_error = False
    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    for m in _FENCE_RE.finditer(raw):
        label, body = m.group(1).lower(), m.group(2)
        body = body.strip("\n")
        if label == "json":
            try:
                json.loads(body)
            except json.JSONDecodeError:
                parse_error = True
                continue
        pieces.append(body)
        spans.append((m.start(2), m.end(2), f"fence:{label or 'plain'}"))

    if pieces:
        return "\n\n".join(pieces), spans, parse_error

    # No (valid) fences: fall back to de-chromed plain lines.
    kept: list[str] = []
    offset = 0
    for line in raw.splitlines(keepends=True):
        stripped = line.strip()
        if stripped and not _CHROME_RE.match(stripped):
            kept.append(stripped)
            spans.append((offset, offset + len(line.rstrip("\n")), "line"))
        offset += len(line)
    if kept:
        return "\n".join(kept), spans, parse_error
    return "", [], True
