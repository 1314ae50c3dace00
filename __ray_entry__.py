"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module;
nothing here (or in pdf_extractor_ray) calls ``ray.init``/``shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: transcript extraction over a deterministic
    small lake (the engine's own domain) — returns the extracted rows
    Dataset result as a pyarrow Table."""
    from pdf_extractor_ray.pipelines.queries import q_extract_transcripts

    return q_extract_transcripts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_extractor_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_extractor_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
