"""Deterministic synthetic transcript-lake generator.

Produces the Parquet table from the BASELINE input hint —
``(conv_id, turn_idx, role, text, tool, ts)`` — with every structure
the extraction pipeline must handle (FIXTURES.md §1): HTML turns with
boilerplate, minimal-PDF byte payloads, tool-output markup,
continuation spans (2 and 3+ turns), orphan part heads, multi-part
units, cross-references (incl. chained and unresolvable), sort-stress
ids, unicode math, malformed payloads, and one mega-conversation for
skew.  Everything is keyed off a fixed seed + stable per-conversation
hashing, so any slice of the lake regenerates bit-identically (and in
parallel: ``conversation_table(i)`` depends only on ``i``).

The payload *renderers* here are the inverse of the extractors in
``functions/`` — they embed known golden content into realistic noise.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

import pyarrow as pa

from .schema import TRANSCRIPT_SCHEMA

_WORDS = (
    "convex set function norm point vector matrix bound dual cone hull "
    "affine linear optimal feasible gradient epigraph domain closed open "
    "minimize subject constraint proof define theorem holds implies"
).split()

_UNICODE_SNIPPETS = [
    "x ≤ y for α ∈ ℝ",
    "the set {x | ‖x‖ ≥ 0} ⊆ ℝ",
    "f: ℝ → ℝ with ∇f ≠ 0",
    "∀ x ∃ y such that x + y ∈ C",
]

_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (µs)


def _rng(*key) -> random.Random:
    """Deterministic RNG from a stable hash of the key tuple."""
    h = hashlib.sha256("|".join(str(k) for k in key).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sentence(rng: random.Random, n: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n)]
    return (" ".join(words)).capitalize()


def _para(rng: random.Random, sentences: int = 2) -> str:
    parts = [_sentence(rng, rng.randint(6, 12)) + "." for _ in range(sentences)]
    if rng.random() < 0.25:
        parts.append(rng.choice(_UNICODE_SNIPPETS) + ".")
    return " ".join(parts)


# --------------------------------------------------------------------------
# payload renderers
# --------------------------------------------------------------------------

def _esc_pdf(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(
    paragraphs: list[str],
    width: int = 78,
    images: list[tuple[float, float, float, float]] | None = None,
    rects: list[tuple[float, float, float, float]] | None = None,
) -> str:
    """Render paragraphs as a minimal single-page uncompressed PDF
    (latin-1 string).  Line leading 14pt; paragraph gap 28pt (beyond
    the extractor's 20pt paragraph threshold).  ``images`` places
    image XObjects as (x, y, w, h); ``rects`` draws rectangle paths —
    the embedded-figure / vector-drawing fixtures (FIXTURES.md §1)."""
    ops: list[str] = ["BT", "/F1 12 Tf", "72 720 Td"]
    first = True
    for para in paragraphs:
        # naive wrap at `width` chars on word boundaries
        lines: list[str] = []
        cur = ""
        for word in para.split(" "):
            if cur and len(cur) + 1 + len(word) > width:
                lines.append(cur)
                cur = word
            else:
                cur = f"{cur} {word}".strip()
        if cur:
            lines.append(cur)
        for j, line in enumerate(lines):
            if not first:
                gap = -28 if j == 0 else -14
                ops.append(f"0 {gap} Td")
            ops.append(f"({_esc_pdf(line)}) Tj")
            first = False
    ops.append("ET")
    for i, (x, y, w, h) in enumerate(images or [], start=1):
        ops.append(f"q {w:g} 0 0 {h:g} {x:g} {y:g} cm /Im{i} Do Q")
    for x, y, w, h in rects or []:
        ops.append(f"{x:g} {y:g} {w:g} {h:g} re S")
    content = "\n".join(ops)

    xobjs = "".join(f"/Im{i} {5 + i} 0 R" for i in range(1, len(images or []) + 1))
    resources = "<</Font<</F1 5 0 R>>" + (f"/XObject<<{xobjs}>>" if xobjs else "") + ">>"
    objs = [
        "<</Type/Catalog/Pages 2 0 R>>",
        "<</Type/Pages/Kids[3 0 R]/Count 1>>",
        "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 4 0 R"
        f"/Resources{resources}>>",
        f"<</Length {len(content)}>>\nstream\n{content}\nendstream",
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    for i in range(1, len(images or []) + 1):
        objs.append(
            "<</Type/XObject/Subtype/Image/Width 8/Height 8/ColorSpace/DeviceGray"
            "/BitsPerComponent 8/Length 64>>\nstream\n" + "\x80" * 64 + "\nendstream"
        )
    out = ["%PDF-1.4"]
    for i, body in enumerate(objs, start=1):
        out.append(f"{i} 0 obj\n{body}\nendobj")
    out.append("trailer\n<</Root 1 0 R>>\n%%EOF")
    return "\n".join(out)


def make_html(paragraphs: list[str], rng: random.Random) -> str:
    """Wrap content paragraphs in realistic boilerplate the HTML
    stripper must remove (nav/aside/footer/script, link-dense blocks,
    short noise)."""
    nav_items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_WORDS, 4)
    )
    body = [
        "<html><head><title>doc</title>",
        "<script>var tracking = 'analytics-" + str(rng.randint(0, 999)) + "';</script>",
        "<style>.x{color:red}</style></head><body>",
        f"<nav><ul>{nav_items}</ul></nav>",
        f"<header><p>Site header {rng.choice(_WORDS)} menu login register subscribe</p></header>",
    ]
    for p in paragraphs:
        body.append(f"<p>{p}</p>")
        if rng.random() < 0.2:
            body.append(f"<aside>Related: {_sentence(rng, 5)}</aside>")
    body += [
        "<p>ok</p>",  # below min-length noise
        f'<footer><p>Copyright 2024 <a href="/tos">terms</a> <a href="/priv">privacy</a> '
        f'<a href="/contact">contact</a></p></footer>',
        "</body></html>",
    ]
    return "\n".join(body)


def make_tool_markup(paragraphs: list[str], rng: random.Random) -> str:
    tool = rng.choice(["search", "calculator", "retrieval", "shell"])
    content = "\n".join(paragraphs)
    return (
        f"[tool:{tool}] invoked with args id={rng.randint(0, 9999)}\n"
        f"```\n{content}\n```\n"
        f"[exit 0]\n"
    )


# --------------------------------------------------------------------------
# conversation script generation
# --------------------------------------------------------------------------

@dataclass
class _TurnDraft:
    paragraphs: list[str]
    kind: str  # html | pdf | tool_markup | "" (plain)
    no_filler: bool = False  # turns in continuation spans keep their
    # trailing-fragment flags intact (filler would close the chain)


def _unit_text(
    rng: random.Random,
    unit_id: str,
    part_id: str,
    ref_clause: str = "",
) -> tuple[str, str]:
    """Question + answer text for one unit (answer starts with the
    Solution marker the normalizer strips)."""
    head = f"({part_id}) " if part_id and not unit_id else ""
    q = _sentence(rng, rng.randint(8, 14))
    if ref_clause:
        q = f"{q.rstrip('.')} {ref_clause}."
    else:
        q += "."
    question = f"{head}{q}" if head else q
    answer = f"Solution. {_para(rng, rng.randint(1, 3))}"
    return question, answer


def _conversation_script(
    conv_idx: int, n_turns: int, seed: int, filler_paras: int = 0
) -> list[_TurnDraft]:
    """Build the turn drafts of one conversation deterministically."""
    rng = _rng(seed, "conv", conv_idx)
    chapter = (conv_idx % 9) + 1
    drafts: list[_TurnDraft] = [
        _TurnDraft(paragraphs=[], kind="") for _ in range(n_turns)
    ]

    # Sort-stress id sequence: includes 9→10 and 18/18a-c shapes.
    q_numbers = [2, 5, 9, 10, 18, 18, 18, 21, 30]
    seen_ids: list[str] = []
    turn = 0
    qi = 0
    while turn < n_turns:
        rng_t = _rng(seed, "unit", conv_idx, turn)
        qnum = q_numbers[qi % len(q_numbers)] + (qi // len(q_numbers)) * 40
        unit_id = f"{chapter}.{qnum}"
        qi += 1

        # Cross-reference clause: resolvable / chained / unresolvable.
        ref_clause = ""
        roll = rng_t.random()
        if seen_ids and roll < 0.30:
            ref_clause = f"using {rng_t.choice(seen_ids)}"
        elif roll < 0.38:
            ref_clause = f"using {chapter}.99"  # unresolvable
        elif roll < 0.44:
            ref_clause = "by theorem 3"  # generic ref, no id

        shape = rng_t.random()
        if shape < 0.25 and turn + 1 < n_turns:
            # Continuation span across 2 turns (or 3 when room).
            span = 3 if (shape < 0.08 and turn + 2 < n_turns) else 2
            q, a = _unit_text(rng_t, unit_id, "", ref_clause)
            extra = [_para(rng_t, 2) for _ in range(span - 1)]
            # First chunk ends mid-clause (no terminal punctuation) and
            # later chunks START lowercase → cont fragments.
            drafts[turn].paragraphs.append(f"{unit_id} {q}")
            drafts[turn].paragraphs.append(a.rstrip(".") + " and therefore")
            for k, chunk in enumerate(extra):
                cont = "continuing the bound " + chunk[0].lower() + chunk[1:]
                if k < len(extra) - 1:
                    cont = cont.rstrip(".") + " which gives"
                drafts[turn + 1 + k].paragraphs.append(cont)
            for k in range(span):
                drafts[turn + k].no_filler = True
            turn += span
        elif shape < 0.40 and turn + 1 < n_turns:
            # Multi-part unit with orphan (b)/(c) heads on the next turn.
            qa, aa = _unit_text(rng_t, unit_id, "", ref_clause)
            drafts[turn].paragraphs.append(f"{unit_id}a {qa}")
            drafts[turn].paragraphs.append(aa)
            for part in ("b", "c"):
                qb, ab = _unit_text(rng_t, "", part)
                drafts[turn + 1].paragraphs.append(qb)
                drafts[turn + 1].paragraphs.append(ab)
            turn += 2
        else:
            # Single-turn unit, possibly multi-part on one turn.
            q, a = _unit_text(rng_t, unit_id, "", ref_clause)
            drafts[turn].paragraphs.append(f"{unit_id} {q}")
            drafts[turn].paragraphs.append(a)
            if shape > 0.85:
                qb, ab = _unit_text(rng_t, "", "b")
                drafts[turn].paragraphs.append(qb)
                drafts[turn].paragraphs.append(ab)
            turn += 1
        seen_ids.append(unit_id)

    # Assign payload kinds; occasionally inject malformed payloads.
    for t, draft in enumerate(drafts):
        rng_k = _rng(seed, "kind", conv_idx, t)
        if not draft.paragraphs:
            draft.paragraphs = [_para(rng_k, 2)]
        if filler_paras and not draft.no_filler:
            # Payload bulk for realistic per-turn parse cost (bench
            # lakes); content-classed, so it never alters unit
            # structure or continuation flags.
            rng_f = _rng(seed, "filler", conv_idx, t)
            draft.paragraphs.extend(
                _para(rng_f, rng_f.randint(2, 4)) for _ in range(filler_paras)
            )
        r = rng_k.random()
        has_unit_head = any(
            p.split(" ", 1)[0].replace(".", "").replace("a", "").isdigit()
            for p in draft.paragraphs
        )
        if r < 0.40:
            draft.kind = "html"
        elif r < 0.65:
            draft.kind = "pdf"
        elif r < 0.80 and not has_unit_head:
            # tool fences keep content verbatim, so units survive too,
            # but bias tool turns toward non-unit content.
            draft.kind = "tool_markup"
        elif r < 0.84:
            draft.kind = "html"
        else:
            draft.kind = ""
    return drafts


def _render_turn(conv_idx: int, t: int, draft: _TurnDraft, seed: int) -> tuple[str, str]:
    rng = _rng(seed, "render", conv_idx, t)
    # ~1% malformed payloads (graceful-degradation fixtures).
    if rng.random() < 0.01:
        if draft.kind == "pdf":
            return "%PDF-1.4\ngarbage-truncated", "pdf"
        if draft.kind == "tool_markup":
            return "[tool:x]\n```json\n{broken\n```\n", "tool_markup"

    if draft.kind == "html":
        return make_html(draft.paragraphs, rng), "html"
    if draft.kind == "pdf":
        # PDF payloads must be latin-1 encodable: strip unicode math.
        paras = [p.encode("latin-1", "replace").decode("latin-1") for p in draft.paragraphs]
        images = rects = None
        if rng.random() < 0.30:
            # Figure fixtures: one keepable image (≥50px), one below
            # the min-size filter, a 4-rect drawing cluster and a
            # stray rect that must NOT form a region (FIXTURES.md §1).
            x = 90 + rng.randint(0, 60)
            images = [(x, 420, 120, 90), (x + 200, 420, 30, 20)]
            rects = [
                (x, 300, 40, 40),
                (x + 30, 310, 40, 40),
                (x + 60, 300, 40, 40),
                (x + 30, 260, 40, 35),
                (500, 60, 8, 8),
            ]
        return make_pdf(paras, images=images, rects=rects), "pdf"
    if draft.kind == "tool_markup":
        return make_tool_markup(draft.paragraphs, rng), "tool_markup"
    return "\n".join(draft.paragraphs), ""


def conversation_rows(
    conv_idx: int,
    seed: int = 42,
    mega_every: int = 200,
    base_turns: int = 8,
    filler_paras: int = 0,
) -> list[dict]:
    """All transcript rows of one conversation (pure function of
    (conv_idx, seed) — safe to call from parallel workers)."""
    rng = _rng(seed, "meta", conv_idx)
    if mega_every and conv_idx % mega_every == mega_every - 1:
        n_turns = base_turns * 100  # the skew fixture (FIXTURES.md §1)
    else:
        n_turns = max(1, int(rng.expovariate(1.0 / base_turns)) + 1)

    drafts = _conversation_script(conv_idx, n_turns, seed, filler_paras)
    conv_id = f"c{conv_idx:07d}"
    roles = ("user", "assistant", "tool")
    rows = []
    for t, draft in enumerate(drafts):
        text, kind = _render_turn(conv_idx, t, draft, seed)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": "tool" if kind == "tool_markup" else roles[t % 2],
                "text": text,
                "tool": kind,
                "ts": _EPOCH_US + conv_idx * 86_400_000_000 + t * 60_000_000,
            }
        )
    return rows


def transcripts_table(
    n_convs: int,
    seed: int = 42,
    conv_offset: int = 0,
    mega_every: int = 200,
    filler_paras: int = 0,
) -> pa.Table:
    """Materialize conversations [offset, offset+n) as one Arrow table."""
    rows: list[dict] = []
    for i in range(conv_offset, conv_offset + n_convs):
        rows.extend(
            conversation_rows(i, seed=seed, mega_every=mega_every, filler_paras=filler_paras)
        )
    cols = {name: [r[name] for r in rows] for name in TRANSCRIPT_SCHEMA.names}
    arrays = [
        pa.array(cols[f.name], type=f.type) for f in TRANSCRIPT_SCHEMA
    ]
    return pa.Table.from_arrays(arrays, schema=TRANSCRIPT_SCHEMA)


def write_lake(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    convs_per_file: int = 64,
    mega_every: int = 200,
) -> list[str]:
    """Write the lake as conv-partitioned Parquet files (one file per
    conversation bucket — the layout the resume manifests key off)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_convs, convs_per_file):
        n = min(convs_per_file, n_convs - start)
        path = os.path.join(out_dir, f"part-{start:07d}.parquet")
        pq.write_table(
            transcripts_table(n, seed=seed, conv_offset=start, mega_every=mega_every),
            path,
        )
        paths.append(path)
    return paths
