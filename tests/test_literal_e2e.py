"""Literal end-to-end expectations: hand-written payloads in,
hand-written extracted rows out — independent of the oracle (which
shares code with the pipeline), so this pins the SEMANTICS, not just
parallel-vs-sequential agreement."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from pdf_extractor_ray.datagen import make_pdf
from pdf_extractor_ray.pipelines.extract import extraction_pipeline
from pdf_extractor_ray.schema import TRANSCRIPT_SCHEMA


def _lake(rows):
    cols = {f.name: [r[f.name] for r in rows] for f in TRANSCRIPT_SCHEMA}
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in TRANSCRIPT_SCHEMA],
        schema=TRANSCRIPT_SCHEMA,
    )


def _row(conv, idx, text, tool=""):
    return {
        "conv_id": conv,
        "turn_idx": idx,
        "role": "user",
        "text": text,
        "tool": tool,
        "ts": 1_700_000_000_000_000 + idx,
    }


@pytest.mark.usefixtures("ray_session")
def test_literal_extraction():
    html_turn = (
        "<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<p>2.7 Show that x ≤ y implies the bound.</p>"
        "<p>Solution. Because the norm is nonnegative and therefore</p>"
        "<footer>Copyright legal text long enough to be a block</footer>"
        "</body></html>"
    )
    cont_turn = "continuing the argument the bound holds."
    pdf_turn = make_pdf(
        ["2.8 Prove the claim using 2.7.", "Solution. It follows directly."]
    )
    tool_turn = "[tool:calc] run\n```\n42 is the result\n```\n[exit 0]"

    rows = [
        _row("cA", 0, html_turn, "html"),
        _row("cA", 1, cont_turn, ""),
        _row("cA", 2, pdf_turn, "pdf"),
        _row("cB", 0, tool_turn, "tool_markup"),
    ]
    out = pa.concat_tables(
        list(
            extraction_pipeline(ray.data.from_arrow(_lake(rows))).iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="permissive",
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    got = [
        (r["conv_id"], r["turn_idx"], r["unit_id"], r["extracted_text"],
         r["turn_span"], r["flags"]["continued"], r["flags"]["resolved"])
        for r in out.to_pylist()
    ]

    # Hand-derived expectations:
    # - boilerplate (nav/footer) stripped; unicode ≤ → \leq
    # - turn 0's unit 2.7 continues into turn 1 ("and therefore" has no
    #   terminal punctuation; turn 1 starts lowercase) → stitched,
    #   answers joined, turn_span [0,1], Solution prefix stripped
    # - turn 2's unit 2.8 resolves "using 2.7" against the STITCHED 2.7
    #   (context = first sentence of its merged answer)
    # - tool fence content extracted verbatim for cB
    expected = [
        (
            "cA", 0, "2.7",
            r"Show that x \leq y implies the bound. Because the norm is "
            "nonnegative and therefore continuing the argument the bound holds.",
            [0, 1], True, False,
        ),
        (
            "cA", 2, "2.8",
            "Prove the claim using 2.7.\n\n[Context from 2.7: Because the norm "
            "is nonnegative and therefore continuing the argument the bound "
            "holds.] It follows directly.".replace("\n\n", " "),
            [2, 2], False, True,
        ),
        ("cB", 0, "", "42 is the result", [0, 0], False, False),
    ]
    assert got == expected, f"\ngot:      {got}\nexpected: {expected}"
