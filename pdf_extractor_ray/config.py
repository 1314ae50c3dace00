"""Extraction configuration.

The reference externalizes extraction behavior into a prompt file and
pydantic settings (/root/reference/src/config.py:6-32,
/root/reference/src/llm_extractor.py:25-28).  The rebuild replaces the
LLM-prompt surface with deterministic heuristic thresholds held in a
frozen dataclass, passed to actor-pool stages via
``fn_constructor_kwargs`` so every worker sees identical config.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractorConfig:
    """Thresholds / whitelists for the deterministic extractors.

    All values participate in golden-fixture bit-equality: changing any
    of them changes extraction output, so they are frozen and versioned.
    """

    # --- HTML main-content heuristic (Readability/trafilatura-style) ---
    # Block-level elements whose text is considered candidate content.
    html_block_tags: frozenset[str] = frozenset(
        {
            "p",
            "h1",
            "h2",
            "h3",
            "h4",
            "h5",
            "h6",
            "li",
            "pre",
            "blockquote",
            "td",
            "th",
            "figcaption",
            "dd",
            "dt",
        }
    )
    # Subtrees dropped wholesale (boilerplate / non-content).
    html_drop_tags: frozenset[str] = frozenset(
        {
            "script",
            "style",
            "noscript",
            "template",
            "svg",
            "head",
            "nav",
            "header",
            "footer",
            "aside",
            "form",
            "button",
            "iframe",
            "select",
            "option",
        }
    )
    # A block whose anchor-text ratio exceeds this is navigation chrome.
    html_max_link_ratio: float = 1.0 / 3.0
    # Non-heading blocks shorter than this (chars, collapsed) are noise.
    html_min_block_chars: int = 10

    # --- PDF layout heuristic ---
    # Vertical gap (points) between consecutive text lines that starts a
    # new paragraph (the reference renders at fixed leading; see
    # /root/reference/src/pdf_processor.py:35-61 for the page-level
    # analogue).
    pdf_paragraph_gap: float = 20.0
    # y-coordinates within this tolerance are the same text line.
    pdf_line_tolerance: float = 0.5

    # --- unit segmentation / stitching ---
    # Mirrors the reference's continuation-flag semantics
    # (/root/reference/src/schemas/extraction.py:29-36 and the
    # carried-context rule in /root/reference/prompts/extraction.md:83-90).
    answer_markers: tuple[str, ...] = (r"\textbf{Solution.}", "Solution.")
    # Characters that legitimately terminate a unit; a unit whose text
    # ends on anything else is flagged continues_next.
    terminal_chars: str = ".!?$"

    # --- stitch sharding (mega-conversation skew mitigation) ---
    # When salting, shard conversations every `salt_turns` turns and
    # merge shard boundaries in a second, tiny pass.
    salt_turns: int = 512


DEFAULT_CONFIG = ExtractorConfig()


@dataclass(frozen=True)
class RunConfig:
    """Physical execution knobs for pipeline stages (scale tuning)."""

    batch_size: int = 1024
    # Extraction-stage execution mode.  The deterministic parsers keep
    # their warm state (compiled regexes, config tables) at module
    # level, so stateless tasks — elastic, releasing CPUs the moment a
    # batch finishes — outperform a reserved actor pool, which holds
    # its CPUs for the whole dataset execution and starves the
    # post-shuffle stages.  Set ``use_actor_pool=True`` for parsers
    # with genuinely heavy per-instance init (e.g. real pdfplumber /
    # model handles) where amortized construction wins.
    use_actor_pool: bool = False
    # Actor-pool size when use_actor_pool; ``None`` → cpus - 1.
    extract_concurrency: int | None = None
    num_cpus_per_actor: float = 1.0
    # Number of hash partitions for the conv_id shuffle. ``None`` →
    # derived from cluster CPUs.
    shuffle_partitions: int | None = None
    # Columns actually needed from the lake (prune at the read).
    read_columns: tuple[str, ...] = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


DEFAULT_RUN = RunConfig()
