"""Text normalization: unicode math → LaTeX, prefix strip, whitespace.

Re-implements the semantics of the reference's sanitizer + comparison
normalizer (unicode map /root/reference/src/latex_generator.py:19-129;
solution-prefix strip :186-195; comparison normalizer
/root/reference/src/evaluator.py:80-107) as a single deterministic
chain used both by the pipeline's normalize stage and by the golden
oracle, so extracted text is bit-comparable.
"""

from __future__ import annotations

import re

# Unicode math symbol → LaTeX command.  Same coverage as the
# reference's 96-entry table (latex_generator.py:19-115), expressed as
# a compact spec string: "<char> <command>" per entry.
_UNICODE_SPEC = r"""
α \alpha    β \beta     γ \gamma    δ \delta    ε \epsilon  ζ \zeta
η \eta      θ \theta    ι \iota     κ \kappa    λ \lambda   μ \mu
ν \nu       ξ \xi       π \pi       ρ \rho      σ \sigma    τ \tau
υ \upsilon  φ \phi      χ \chi      ψ \psi      ω \omega
Γ \Gamma    Δ \Delta    Θ \Theta    Λ \Lambda   Ξ \Xi       Π \Pi
Σ \Sigma    Φ \Phi      Ψ \Psi      Ω \Omega
≤ \leq      ≥ \geq      ≠ \neq      ≈ \approx   ≡ \equiv
≺ \prec     ≻ \succ     ⪯ \preceq   ⪰ \succeq
∈ \in       ∉ \notin    ⊂ \subset   ⊃ \supset   ⊆ \subseteq ⊇ \supseteq
∪ \cup      ∩ \cap      ∅ \emptyset
→ \to       ← \leftarrow            ↔ \leftrightarrow
⇒ \Rightarrow           ⇐ \Leftarrow            ⇔ \Leftrightarrow
↦ \mapsto
∞ \infty    ∂ \partial  ∇ \nabla    ∑ \sum      ∏ \prod     ∫ \int
√ \sqrt
∀ \forall   ∃ \exists   ¬ \neg      ∧ \land     ∨ \lor
× \times    ÷ \div      ± \pm       ∓ \mp       · \cdot
° ^\circ    ′ '         ″ ''        ‖ \|        ⊥ \perp     ∥ \parallel
⊗ \otimes   ⊕ \oplus
ℝ \mathbb{R}            ℂ \mathbb{C}            ℕ \mathbb{N}
ℤ \mathbb{Z}            ℚ \mathbb{Q}
"""


def _build_table() -> dict[int, str]:
    # Spec tokens strictly alternate: symbol, command, symbol, command…
    toks = _UNICODE_SPEC.split()
    out: dict[int, str] = {}
    for ch, cmd in zip(toks[0::2], toks[1::2]):
        assert len(ch) == 1, f"bad spec entry: {ch!r}"
        out[ord(ch)] = cmd
    return out


_TRANSLATE_TABLE = _build_table()
# Char-class regex + dict lookup beats str.translate ~1.8× here (the
# class scan skips ASCII runs; translate checks every char).
_UNI_RE = re.compile("[" + "".join(re.escape(chr(c)) for c in _TRANSLATE_TABLE) + "]")
_UNI_MAP = {chr(k): v for k, v in _TRANSLATE_TABLE.items()}


def _uni_sub(m: "re.Match[str]") -> str:
    return _UNI_MAP[m.group()]

# One pass over =, +, - (identical output to three sequential passes:
# each operator occurrence loses its surrounding whitespace).  Gated on
# operator presence — template subs are C-fast but still cost a scan.
_OP_RE = re.compile(r"\s*([=+-])\s*")

# \left( → ( etc., matching the comparison normalizer's replacements
# (/root/reference/src/evaluator.py:95-100).
_DELIM_PAIRS = (
    (r"\left(", "("),
    (r"\right)", ")"),
    (r"\left[", "["),
    (r"\right]", "]"),
    (r"\left\{", r"\{"),
    (r"\right\}", r"\}"),
)

_SOLUTION_PREFIXES = (r"\textbf{Solution.}", "Solution.")


def unicode_to_latex(text: str) -> str:
    """Map unicode math symbols to their LaTeX commands (one pass;
    ASCII fast-path skips the table scan)."""
    if text.isascii():
        return text
    return _UNI_RE.sub(_uni_sub, text)


def strip_solution_prefix(text: str) -> str:
    """Drop a leading Solution marker (latex_generator.py:186-195)."""
    t = text.strip()
    for prefix in _SOLUTION_PREFIXES:
        if t.startswith(prefix):
            return t[len(prefix):].strip()
    return t


def normalize_compare(text: str) -> str:
    """Comparison normalizer: whitespace collapse, delimiter + operator
    spacing normalization (evaluator.py:80-107 semantics)."""
    # C-level split/join ≡ re.sub(r"\s+", " ", text.strip()) — both
    # key on Unicode whitespace runs; split/join is ~5× faster on
    # long-run text and never slower.
    t = " ".join(text.split())
    if "\\" in t:  # delimiter commands only exist alongside backslashes
        for src, dst in _DELIM_PAIRS:
            t = t.replace(src, dst)
    if "=" in t or "+" in t or "-" in t:
        t = _OP_RE.sub(r"\1", t)
    return t


def normalize_full(text: str) -> str:
    """The pipeline's full normalization chain (unicode map → prefix
    strip → comparison normalizer).  This is the bit-equality target
    transform for ``extracted_text``."""
    return normalize_compare(strip_solution_prefix(unicode_to_latex(text)))
