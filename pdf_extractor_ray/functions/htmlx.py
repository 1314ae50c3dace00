"""HTML main-content extraction (boilerplate strip).

Deterministic Readability/trafilatura-style heuristic replacing the
reference's vision-LLM page extraction
(/root/reference/src/llm_extractor.py:30-106): block-level tag
whitelist + wholesale boilerplate-subtree drop + anchor-text
("link-density") ratio scoring + minimum-length filter.

Built on the stdlib ``html.parser`` (no external deps).  Output is the
kept blocks joined with blank lines, plus character-span provenance
into the raw payload.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..config import DEFAULT_CONFIG, ExtractorConfig

_WS_RE = re.compile(r"\s+")

# Elements that never contain content text but also never nest content
# (void elements) — encountering them must not disturb the tag stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


@dataclass
class Block:
    """One candidate content block."""

    tag: str
    start: int  # char offset of the opening tag in the raw payload
    end: int = -1  # char offset just past the closing tag
    text_parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    total_chars: int = 0

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.text_parts)).strip()

    @property
    def is_heading(self) -> bool:
        return self.tag in ("h1", "h2", "h3", "h4", "h5", "h6")

    @property
    def link_ratio(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0


class _BlockCollector(HTMLParser):
    """Stream the document once, collecting block-level text runs.

    Text inside any tag from ``drop_tags`` (the whole subtree) is
    discarded; text inside anchors is counted toward the enclosing
    block's link_chars for the link-density filter.
    """

    def __init__(self, cfg: ExtractorConfig, raw: str):
        super().__init__(convert_charrefs=True)
        self.cfg = cfg
        self.raw = raw
        self.blocks: list[Block] = []
        self._open: list[Block] = []  # stack of open candidate blocks
        self._drop_depth = 0
        self._anchor_depth = 0
        # line-number → char offset of line start, for getpos() → offset
        self._line_starts = [0]
        for i, ch in enumerate(raw):
            if ch == "\n":
                self._line_starts.append(i + 1)

    def _offset(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- tag events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            return
        if self._drop_depth or tag in self.cfg.html_drop_tags:
            self._drop_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in self.cfg.html_block_tags:
            self._open.append(Block(tag=tag, start=self._offset()))

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        if self._drop_depth:
            self._drop_depth -= 1
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
            return
        if tag in self.cfg.html_block_tags:
            # close the innermost matching open block (lenient on
            # malformed nesting, like browsers)
            for i in range(len(self._open) - 1, -1, -1):
                if self._open[i].tag == tag:
                    blk = self._open.pop(i)
                    blk.end = self._offset() + len(tag) + 3  # </tag>
                    self.blocks.append(blk)
                    break

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not self._open:
            return
        blk = self._open[-1]  # innermost open block gets the text
        blk.text_parts.append(data)
        n = len(_WS_RE.sub(" ", data).strip())
        blk.total_chars += n
        if self._anchor_depth:
            blk.link_chars += n

    def close(self) -> None:  # flush unclosed blocks (malformed HTML)
        super().close()
        while self._open:
            blk = self._open.pop()
            blk.end = len(self.raw)
            self.blocks.append(blk)


def extract_html(
    raw: str, cfg: ExtractorConfig = DEFAULT_CONFIG
) -> tuple[str, list[tuple[int, int, str]], bool]:
    """Strip boilerplate from an HTML payload.

    Returns ``(main_text, spans, parse_error)`` where ``main_text`` is
    the kept blocks joined with "\\n\\n" in document order and ``spans``
    is ``[(start, end, "html_block"), ...]`` character provenance into
    ``raw``.  Malformed HTML degrades gracefully (parser is lenient);
    an empty result with no block structure at all is flagged as a
    parse error, mirroring the reference's empty-page fallback
    (/root/reference/src/llm_extractor.py:103-106).
    """
    collector = _BlockCollector(cfg, raw)
    try:
        collector.feed(raw)
        collector.close()
    except Exception:
        return "", [], True

    # Document order = order of block *start* offsets (blocks close out
    # of order when nested, e.g. li inside li).
    blocks = sorted(collector.blocks, key=lambda b: b.start)

    kept: list[Block] = []
    for blk in blocks:
        text = blk.text
        if not text:
            continue
        if blk.link_ratio > cfg.html_max_link_ratio:
            continue  # navigation chrome
        if not blk.is_heading and len(text) < cfg.html_min_block_chars:
            continue  # noise fragment
        kept.append(blk)

    text = "\n\n".join(b.text for b in kept)
    spans = [(b.start, b.end, "html_block") for b in kept]
    parse_error = not kept and "<" not in raw
    return text, spans, parse_error
