"""PDF text-layout extraction.

The reference renders PDF pages to images and asks a vision LLM for
the text (/root/reference/src/pdf_processor.py:35-61 +
src/llm_extractor.py:30-106).  The rebuild parses the PDF text layer
directly and deterministically.

Production path: a warm ``pdfplumber``/``pypdf`` parser held in actor
state (imported lazily — neither ships in this container).  Fallback
path (always available, and the one golden fixtures are pinned to): a
minimal content-stream text extractor for uncompressed PDFs, written
from the public PDF 1.x spec — BT/ET text objects, Td/TD/Tm/T*
positioning, Tj/'/TJ show operators.  Lines are reconstructed by
y-coordinate, reading order top-to-bottom then left-to-right, with
paragraph breaks at large vertical gaps — the deterministic analogue
of layout analysis.
"""

from __future__ import annotations

import re

from ..config import DEFAULT_CONFIG, ExtractorConfig

try:  # pragma: no cover - not available in this container
    import pdfplumber  # type: ignore
except ImportError:
    pdfplumber = None

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

# Tokenizer for the operators we understand inside a text object:
#   (string) Tj | (string) ' | [ ... ] TJ | x y Td | x y TD |
#   a b c d e f Tm | T* | leading TL
_NUM = rb"[-+]?\d*\.?\d+"
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string
    rb"|\[|\]"
    rb"|" + _NUM + rb"|T\*|Tj|TJ|Td|TD|Tm|TL|TF|Tf|'"
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(tok: bytes) -> str:
    """Decode a literal PDF string token ``(...)`` incl. escapes."""
    body = tok[1:-1]
    if b"\\" not in body:  # fast path: no escapes (most lines)
        return body.decode("latin-1")
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return out.decode("latin-1")


class PdfParseError(ValueError):
    pass


def _extract_text_runs(data: bytes) -> list[tuple[float, float, str]]:
    """Parse all content streams → list of (y, x, text) runs."""
    runs: list[tuple[float, float, str]] = []
    streams = _STREAM_RE.findall(data)
    if not streams:
        raise PdfParseError("no content streams")
    for stream in streams:
        for bt in _BT_RE.findall(stream):
            x = y = 0.0
            leading = 14.0
            stack: list[bytes] = []
            in_array = False
            array_parts: list[str] = []
            for tok in _TOKEN_RE.findall(bt):
                if tok == b"[":
                    in_array, array_parts = True, []
                elif tok == b"]":
                    in_array = False
                elif tok.startswith(b"("):
                    if in_array:
                        array_parts.append(_decode_pdf_string(tok))
                    else:
                        stack.append(tok)
                elif tok == b"Tj":
                    if stack and stack[-1].startswith(b"("):
                        runs.append((y, x, _decode_pdf_string(stack.pop())))
                    stack.clear()
                elif tok == b"'":
                    y -= leading
                    if stack and stack[-1].startswith(b"("):
                        runs.append((y, x, _decode_pdf_string(stack.pop())))
                    stack.clear()
                elif tok == b"TJ":
                    runs.append((y, x, "".join(array_parts)))
                    array_parts = []
                    stack.clear()
                elif tok in (b"Td", b"TD"):
                    if len(stack) >= 2:
                        dx, dy = float(stack[-2]), float(stack[-1])
                        x += dx
                        y += dy
                        if tok == b"TD":
                            leading = -dy if dy else leading
                    stack.clear()
                elif tok == b"Tm":
                    if len(stack) >= 6:
                        x, y = float(stack[-2]), float(stack[-1])
                    stack.clear()
                elif tok == b"T*":
                    y -= leading
                    stack.clear()
                elif tok == b"TL":
                    if stack:
                        leading = float(stack[-1])
                    stack.clear()
                elif tok in (b"Tf", b"TF"):
                    stack.clear()
                else:  # a number operand
                    stack.append(tok)
    return runs


def extract_pdf(
    raw: str, cfg: ExtractorConfig = DEFAULT_CONFIG
) -> tuple[str, list[tuple[int, int, str]], bool]:
    """Extract the text layer of a latin-1-encoded PDF byte payload.

    Returns ``(text, spans, parse_error)``.  Lines are grouped by
    y-coordinate (tolerance ``cfg.pdf_line_tolerance``), ordered
    top-to-bottom / left-to-right; a vertical gap greater than
    ``cfg.pdf_paragraph_gap`` starts a new paragraph ("\\n\\n"), else
    lines join with "\\n".  Truncated / non-PDF payloads yield an empty
    result with ``parse_error=True`` (graceful degradation, reference
    /root/reference/src/llm_extractor.py:103-106).
    """
    data = raw.encode("latin-1", errors="replace")
    if not data.startswith(b"%PDF"):
        return "", [], True
    try:
        runs = _extract_text_runs(data)
    except PdfParseError:
        return "", [], True
    if not runs:
        return "", [], True

    # Group runs into lines by y (exact grouping within tolerance).
    runs.sort(key=lambda r: (-r[0], r[1]))
    lines: list[tuple[float, str]] = []  # (y, joined text)
    cur_y: float | None = None
    cur_parts: list[str] = []
    for y, _x, s in runs:
        if cur_y is None or abs(y - cur_y) > cfg.pdf_line_tolerance:
            if cur_parts:
                lines.append((cur_y, " ".join(cur_parts)))  # type: ignore[arg-type]
            cur_y, cur_parts = y, [s]
        else:
            cur_parts.append(s)
    if cur_parts:
        lines.append((cur_y, " ".join(cur_parts)))  # type: ignore[arg-type]

    # Join with paragraph detection on vertical gaps.
    pieces: list[str] = []
    prev_y: float | None = None
    for y, text in lines:
        if prev_y is not None:
            pieces.append("\n\n" if (prev_y - y) > cfg.pdf_paragraph_gap else "\n")
        pieces.append(text)
        prev_y = y
    text = "".join(pieces)
    spans = [(0, len(raw), "pdf_text")]
    return text, spans, False


# Image XObject placement: q <w> 0 0 <h> <x> <y> cm /Name Do Q
_IMG_PLACE_RE = re.compile(
    rb"q\s+(" + _NUM + rb")\s+0\s+0\s+(" + _NUM + rb")\s+(" + _NUM + rb")\s+("
    + _NUM + rb")\s+cm\s*/(\w+)\s+Do\s+Q"
)
# Rectangle path op: <x> <y> <w> <h> re
_RECT_RE = re.compile(
    rb"(" + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM + rb")\s+("
    + _NUM + rb")\s+re\b"
)


def extract_pdf_figures(raw: str, cfg: ExtractorConfig = DEFAULT_CONFIG) -> list[str]:
    """Figure detection (reference S4/S6/S7):

    - embedded images = XObject placements, kept when ≥50 px in both
      dimensions (pdf_processor.py:105-206 min-size filter);
    - vector-figure regions = rectangle drawing ops clustered by
      iterative overlap-merge (≥3 drawings, merge distance 20, min
      size 30 — pdf_processor.py:248-325).

    Returns stable figure ids ``img:x0,y0,x1,y1`` / ``region:...`` in
    document order — the rebuild of the reference's figure paths; the
    raster crop itself (S5) is an artifact of the vision-LLM design
    and is dropped."""
    from .geometry import cluster_boxes, filter_min_size

    data = raw.encode("latin-1", errors="replace")
    figures: list[str] = []

    # memmem prefilters: the operators' literal keywords gate the
    # (alternation-heavy, hence slow) bbox regexes.
    if b" Do" in data:
        img_boxes = []
        for m in _IMG_PLACE_RE.finditer(data):
            w, h, x, y = (float(m.group(i)) for i in range(1, 5))
            img_boxes.append((x, y, x + w, y + h))
        for x0, y0, x1, y1 in filter_min_size(img_boxes, min_px=50.0):
            figures.append(f"img:{x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}")

    if b" re" in data:
        rects = []
        for m in _RECT_RE.finditer(data):
            x, y, w, h = (float(m.group(i)) for i in range(1, 5))
            rects.append((x, y, x + w, y + h))
        for x0, y0, x1, y1 in cluster_boxes(
            rects,
            merge_distance=cfg.pdf_paragraph_gap,
            min_members=3,
            min_size=30.0,
        ):
            figures.append(f"region:{x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}")
    return figures


def extract_pdf_with_plumber(raw: str, cfg: ExtractorConfig = DEFAULT_CONFIG):
    """Production-path extraction via pdfplumber when available.

    Not used for golden fixtures (library absent in this container);
    kept as the documented swap-in for real-world PDF payloads.
    """
    if pdfplumber is None:  # pragma: no cover
        raise NotImplementedError("pdfplumber not installed; use extract_pdf")
    import io  # pragma: no cover

    with pdfplumber.open(io.BytesIO(raw.encode("latin-1"))) as pdf:  # pragma: no cover
        text = "\n\n".join((page.extract_text() or "") for page in pdf.pages)
        return text, [(0, len(raw), "pdf_text")], False
