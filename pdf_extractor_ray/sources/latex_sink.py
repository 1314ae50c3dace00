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
    """One .tex document per conversation.  The render is DISTRIBUTED:
    ``groupby(conv_id).map_groups`` builds each document's bytes in the
    cluster (rows ordered by the O1 unit sort key inside the group);
    the driver only streams the small (conv_id, tex) result rows to
    files — it never materializes the extracted dataset itself."""
    import pandas as pd

    from ..functions.ids import parse_unit_id

    os.makedirs(out_dir, exist_ok=True)

    def render_group(g: "pd.DataFrame") -> "pd.DataFrame":
        keys = [parse_unit_id(u) for u in g["unit_id"]]
        g = g.assign(
            _ch=[k[0] for k in keys], _q=[k[1] for k in keys], _sf=[k[2] for k in keys]
        ).sort_values(["_ch", "_q", "_sf", "turn_idx"], kind="stable")
        rows = g[["unit_id", "extracted_text"]].to_dict("records")
        return pd.DataFrame(
            {
                "conv_id": pd.Series([g["conv_id"].iloc[0]], dtype="object"),
                "tex": pd.Series([render_document(rows)], dtype="object"),
            }
        )

    rendered = (
        ds.select_columns(["conv_id", "turn_idx", "unit_id", "extracted_text"])
        .groupby("conv_id")
        .map_groups(render_group, batch_format="pandas")
    )
    paths = []
    for batch in rendered.iter_batches(batch_format="pyarrow", batch_size=None):
        for conv_id, tex in zip(
            batch.column("conv_id").to_pylist(), batch.column("tex").to_pylist()
        ):
            path = os.path.join(out_dir, f"{conv_id}.tex")
            with open(path, "w") as f:
                f.write(tex)
            paths.append(path)
    return sorted(paths)
