"""Unit-id parsing and sort keys.

Semantics of the reference's Q&A id parser
(/root/reference/src/pipeline.py:92-127): ids like "2.18", "2.18a"
sort numerically by (chapter, question) with the bare parent before
lettered sub-parts ("2.9" < "2.10"; "2.18" < "2.18a" < "2.18b");
unparseable ids sort first, lexicographically.
"""

from __future__ import annotations

import re

_ID_RE = re.compile(r"^(\d+)\.(\d+)([a-z]*)$")


def parse_unit_id(unit_id: str) -> tuple[int, int, str]:
    """Parse "2.18a" → (2, 18, "a"); fallback (0, 0, raw) for others."""
    m = _ID_RE.match(unit_id.strip())
    if m:
        return int(m.group(1)), int(m.group(2)), m.group(3)
    return 0, 0, unit_id


def unit_sort_key(unit_id: str) -> tuple[int, int, str]:
    return parse_unit_id(unit_id)
