"""LaTeX document sink (reference S11/S12 rebuilt,
/root/reference/src/latex_generator.py:132-308).

Renders extracted unit rows into a LaTeX document per conversation:
preamble + one subsection per unit + postamble, with the unicode→LaTeX
sanitize + Solution-prefix strip already applied by the normalize
chain.  The reference's pdflatex compile check (60 s full-doc / 30 s
snippet timeouts) is gated behind the binary's presence — this
container has no TeX — with a deterministic structural render check as
the always-available substitute.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pyarrow as pa

PREAMBLE = "\n".join(
    [
        r"\documentclass{article}",
        r"\usepackage{amsmath}",
        r"\usepackage{amssymb}",
        r"\usepackage{amsthm}",
        r"\usepackage{geometry}",
        r"\geometry{margin=1in}",
        r"\title{Extracted Units}",
        r"\date{}",
        r"\begin{document}",
        r"\maketitle",
        "",
    ]
)

POSTAMBLE = "\n\\end{document}\n"


def render_unit(unit_id: str, text: str) -> str:
    title = unit_id if unit_id else "(content)"
    return "\n".join(
        [
            f"\\subsection*{{Unit {title}}}",
            "",
            text,
            "",
            r"\vspace{1em}",
            r"\hrule",
            r"\vspace{1em}",
            "",
        ]
    )


def render_document(rows: list[dict]) -> str:
    body = "".join(render_unit(r["unit_id"], r["extracted_text"]) for r in rows)
    return PREAMBLE + body + POSTAMBLE


def structural_check(doc: str) -> bool:
    """Deterministic stand-in for the pdflatex compile check: balanced
    environments and braces, document wrapper present."""
    if not (doc.startswith(r"\documentclass") and doc.rstrip().endswith(r"\end{document}")):
        return False
    if doc.count(r"\begin{document}") != 1:
        return False
    depth = 0
    for ch in doc:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def compile_check(tex_path: str, timeout: int = 60) -> bool:
    """Real pdflatex compile (reference latex_generator.py:245-308)
    when the binary exists; structural check otherwise."""
    if shutil.which("pdflatex") is None:
        return structural_check(open(tex_path).read())
    try:  # pragma: no cover - no TeX in this container
        res = subprocess.run(
            ["pdflatex", "-interaction=nonstopmode", "-output-directory",
             os.path.dirname(tex_path), tex_path],
            capture_output=True,
            timeout=timeout,
        )
        return res.returncode == 0
    except subprocess.TimeoutExpired:  # pragma: no cover
        return False


def write_latex(ds, out_dir: str) -> list[str]:
    """One .tex document per conversation (distributed render in
    map_batches over conversation-grouped rows; small final artifact
    set written by the driver)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per_conv: dict[str, list[dict]] = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            per_conv.setdefault(row["conv_id"], []).append(row)
    for conv_id in sorted(per_conv):
        path = os.path.join(out_dir, f"{conv_id}.tex")
        with open(path, "w") as f:
            f.write(render_document(per_conv[conv_id]))
        paths.append(path)
    return paths
