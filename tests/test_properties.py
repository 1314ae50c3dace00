"""Property-based tests (hypothesis).

The load-bearing invariant: folding a conversation in one pass equals
folding a prefix, exporting ``FoldState``, and resuming on the suffix —
for ANY cut point.  This is exactly what the salted-shard path's
boundary replay depends on (stages/conversation.py pass 2).
"""

from __future__ import annotations

import copy

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_ray.functions.normalize import normalize_compare, normalize_full
from pdf_extractor_ray.functions.segment import Fragment, segment_units
from pdf_extractor_ray.functions.stitch import (
    TurnInput,
    process_conversation,
    stitch_conversation,
)
from pdf_extractor_ray.stages.turn_extract import extract_turn

words = st.sampled_from(
    ["convex", "set", "bound", "norm", "proof", "theorem", "holds", "x", "f(x)"]
)
texts = st.lists(words, min_size=1, max_size=8).map(" ".join)


@st.composite
def fragments(draw) -> Fragment:
    kind = draw(st.sampled_from(["unit", "part", "cont", "content"]))
    unit_id = ""
    part_id = ""
    if kind == "unit":
        unit_id = f"{draw(st.integers(1, 3))}.{draw(st.integers(1, 20))}"
        part_id = draw(st.sampled_from(["", "a", "b"]))
    elif kind == "part":
        part_id = draw(st.sampled_from(["b", "c"]))
    return Fragment(
        kind=kind,
        unit_id=unit_id,
        part_id=part_id,
        question=draw(texts),
        answer=draw(st.one_of(st.just(""), texts.map(lambda t: "Solution. " + t))),
        continues_next=draw(st.booleans()),
        continued_prev=kind == "cont",
    )


@st.composite
def conversations(draw) -> list[TurnInput]:
    n = draw(st.integers(1, 8))
    turns = []
    for idx in range(n):
        frags = draw(st.lists(fragments(), min_size=0, max_size=3))
        # segment_units guarantees: only the LAST fragment may be
        # flagged continues_next, and cont can only be first.
        for i, f in enumerate(frags):
            if i < len(frags) - 1:
                f.continues_next = False
            if i > 0 and f.kind == "cont":
                f.kind = "content"
                f.continued_prev = False
        turns.append(
            TurnInput(
                turn_idx=idx,
                fragments=frags,
                spans=[],
                parse_error=draw(st.booleans()) if not frags else False,
            )
        )
    return turns


def _canon(units):
    return [
        (u.unit_id, u.part_id, u.question, u.answer, u.head_turn, u.last_turn,
         u.seq, u.continued, u.needs_id, u.figures)
        for u in units
    ]


@given(conversations(), st.integers(0, 8))
@settings(max_examples=300, deadline=None)
def test_fold_resume_invariant(turns, cut):
    cut = min(cut, len(turns))
    whole, _ = stitch_conversation(copy.deepcopy(turns))

    prefix, state = stitch_conversation(copy.deepcopy(turns[:cut]))
    suffix, _ = stitch_conversation(copy.deepcopy(turns[cut:]), state)
    assert _canon(prefix + suffix) == _canon(whole)


@given(conversations())
@settings(max_examples=150, deadline=None)
def test_process_conversation_deterministic(turns):
    a = process_conversation(copy.deepcopy(turns))
    b = process_conversation(copy.deepcopy(turns))
    assert [(r.unit_id, r.extracted_text, r.turn_span) for r in a] == [
        (r.unit_id, r.extracted_text, r.turn_span) for r in b
    ]
    # every non-empty turn yields at least one unit or merges upstream
    assert all(r.turn_span[0] <= r.turn_span[1] for r in a)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_extractors_never_raise(payload):
    for kind in ("", "html", "pdf", "tool_markup"):
        frags, spans, err = extract_turn(payload, kind)
        assert isinstance(err, bool)
        for f in frags:
            assert f.kind in ("unit", "part", "cont", "content")
    segment_units(payload)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(text):
    once = normalize_compare(text)
    assert normalize_compare(once) == once
    full = normalize_full(text)
    # full chain is idempotent modulo a leading Solution marker, which
    # the first pass already removed
    assert normalize_full(full) == full


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_redact_pii_idempotent(text):
    """Replacement tokens contain no digits or @, so a second pass can
    never find new matches — redaction is a projection."""
    from pdf_extractor_ray.functions.textstats import redact_pii

    once = redact_pii(text)
    assert redact_pii(once) == once


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=700))
@settings(max_examples=200, deadline=None)
def test_chunk_windows_reassemble(text):
    """The pure chunking rule (start = i*stride while start < len)
    loses nothing: stripping the size-stride overlap from chunks 1..n
    rebuilds the document exactly; an EMPTY document yields zero
    chunks (both the Ray explode and the ceil(len/stride) oracle).
    Mirrors q_chunk_docs' kernel math without a Ray session."""
    from pdf_extractor_ray.pipelines.queries import _CHUNK_SIZE, _CHUNK_STRIDE

    chunks = []
    i = 0
    while i * _CHUNK_STRIDE < len(text):
        start = i * _CHUNK_STRIDE
        chunks.append(text[start : start + _CHUNK_SIZE])
        i += 1
    # chunk count == the oracle's ceil(len/stride) range bound
    assert len(chunks) == (len(text) + _CHUNK_STRIDE - 1) // _CHUNK_STRIDE
    if not text:
        assert chunks == []
        return
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
    assert rebuilt == text
    assert all(len(c) <= _CHUNK_SIZE for c in chunks)
