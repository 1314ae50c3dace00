"""Text-analysis primitives for training-data pipelines.

Beyond the reference's surface (task brief): language id (n-gram /
stopword heuristic), quality scoring (length / punctuation / stopword
ratios), token counting (BPE-ish regex), and document fingerprinting
(rolling hash).  All deterministic and vectorization-friendly.
"""

from __future__ import annotations

import re

import numpy as np

# Tiny per-language stopword profiles (public common-word lists).
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is that it for on with as are be".split()),
    "de": frozenset("der die das und ist von zu mit den nicht ein eine im".split()),
    "fr": frozenset("le la les et de des un une est dans que pour sur".split()),
    "es": frozenset("el la los las y de del un una es en que por con".split()),
    "zh": frozenset("的 是 在 了 和 有 我 不 这 他 也 就 人 都".split()),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
# BPE-ish token splitter: words, numbers, punctuation runs (a public
# GPT-2-style pre-tokenization shape, simplified and deterministic).
# re.ASCII pins \d/\s to [0-9]/ASCII whitespace so Python tokenizes
# identically to the DuckDB-RE2 oracle (queries.TOKEN_SQL_RE) even on
# non-ASCII digits or NBSP.
TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.ASCII)


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def detect_language(text: str) -> str:
    """Stopword-profile vote; CJK codepoint share short-circuits zh."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)[:300]]
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in sorted(_STOPWORDS):  # sorted → deterministic tie-break
        sw = _STOPWORDS[lang]
        hits = sum(1 for w in words if w in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= max(2, len(words) // 50) else "und"


def quality_score(text: str) -> dict[str, float]:
    """Deterministic quality features + composite score in [0, 1]."""
    n = len(text)
    if n == 0:
        return {
            "n_chars": 0.0,
            "n_tokens": 0.0,
            "stop_ratio": 0.0,
            "punct_ratio": 0.0,
            "mean_word_len": 0.0,
            "quality": 0.0,
        }
    words = _WORD_RE.findall(text)
    n_words = len(words)
    lowered = [w.lower() for w in words]
    en_sw = _STOPWORDS["en"]
    stop_ratio = sum(1 for w in lowered if w in en_sw) / n_words if n_words else 0.0
    punct = sum(1 for ch in text if not ch.isalnum() and not ch.isspace())
    punct_ratio = punct / n
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    # Composite: reward document-like stopword share and sane word
    # lengths; penalize punctuation soup (thresholds are heuristic
    # constants, frozen for determinism).
    quality = 1.0
    if n < 50:
        quality *= 0.5
    if stop_ratio < 0.05:
        quality *= 0.6
    if punct_ratio > 0.3:
        quality *= 0.4
    if not 2.0 <= mean_word_len <= 12.0:
        quality *= 0.7
    return {
        "n_chars": float(n),
        "n_tokens": float(token_count(text)),
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "mean_word_len": mean_word_len,
        "quality": quality,
    }


_FP_BASE = 1099511628211
_FP_OFFSET = 14695981039346656037
_FP_MASK = (1 << 64) - 1


# --------------------------------------------------------------------------
# PII redaction — RE2-compatible patterns applied in a FIXED order
# (SSN before phone: the 3-4 tail of an SSN would otherwise be eaten
# by the phone pattern).  Both pyarrow.compute and DuckDB use RE2, so
# the vectorized Arrow kernel and the SQL oracle redact identically.
# --------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii_array(arr):
    """Vectorized PII scrub over a pyarrow string array — one
    ``replace_substring_regex`` kernel pass per pattern, no Python
    per-row loop."""
    import pyarrow.compute as _pc

    for pat, repl in PII_PATTERNS:
        arr = _pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    return arr


def redact_pii(text: str) -> str:
    """Scalar twin of :func:`redact_pii_array` (tests / oracle.py)."""
    for pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text, flags=re.ASCII)  # RE2 \d == [0-9]
    return text


def fingerprint(text: str) -> int:
    """FNV-1a 64-bit hash over the whitespace-normalized text — a
    cheap, stable document fingerprint (exact-dedup key).  Returned as
    a SIGNED int64 (two's-complement view, Spark-xxhash64-style): an
    unsigned value above 2^63 overflows Arrow int64 inference inside
    Ray's aggregate finalize and silently degrades the column to
    pickled Python objects."""
    h = _FP_OFFSET
    for b in " ".join(text.split()).encode("utf-8"):
        h = ((h ^ b) * _FP_BASE) & _FP_MASK
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def fingerprint_exact(text: str) -> int:
    """FNV-1a 64-bit over the RAW utf-8 bytes — the exact-dedup key.
    Unlike ``fingerprint`` (whitespace-invariant, for document
    fingerprinting / near-dup prefilters), two texts differing only in
    whitespace get DIFFERENT keys here, matching a ``GROUP BY text``
    oracle byte-for-byte."""
    h = _FP_OFFSET
    for b in text.encode("utf-8"):
        h = ((h ^ b) * _FP_BASE) & _FP_MASK
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def levenshtein(a: str, b: str, max_dist: int | None = None) -> int | None:
    """Unit-cost Levenshtein edit distance (insert/delete/substitute),
    the same definition as DuckDB's ``levenshtein()``.  With
    ``max_dist`` the DP is banded (Ukkonen cutoff): cells farther than
    ``max_dist`` off-diagonal can never yield a distance ≤ max_dist,
    so each row touches O(max_dist) cells and the function returns
    ``None`` as soon as the true distance provably exceeds the bound —
    the right shape for verify-after-blocking entity resolution where
    almost every comparison is a reject."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if max_dist is not None and abs(la - lb) > max_dist:
        return None
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < lb:  # keep the inner loop over the shorter string
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        if max_dist is None:
            lo, hi = 1, lb
        else:
            lo = max(1, i - max_dist)
            hi = min(lb, i + max_dist)
        cur = [0] * (lb + 1)
        cur[0] = i
        if lo > 1:
            cur[lo - 1] = max_dist + 1  # outside the band
        ca = a[i - 1]
        best = cur[0] if lo == 1 else max_dist + 1
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            up = prev[j] if j <= hi else max_dist + 1
            c = min(up + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = c
            if c < best:
                best = c
        if max_dist is not None and hi < lb:
            cur[hi + 1 :] = [max_dist + 1] * (lb - hi)
        if max_dist is not None and best > max_dist:
            return None
        prev = cur
    d = prev[lb]
    if max_dist is not None and d > max_dist:
        return None
    return d


def jaro(a: str, b: str) -> float:
    """Jaro similarity, the standard definition DuckDB's
    ``jaro_similarity()`` implements: match window
    ``max(|a|,|b|)//2 - 1``, transpositions counted as half the
    out-of-order matches.  Parity with DuckDB verified pairwise over
    real part-name vocabulary in tests (ASCII inputs; multibyte
    inputs may differ byte-vs-codepoint — the engine's fuzzy-join
    callers operate on ASCII name columns)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB scores ''-vs-'' as 0, not 1
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    fa = [False] * la
    fb = [False] * lb
    m = 0
    for i in range(la):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        ca = a[i]
        for j in range(lo, hi):
            if not fb[j] and ca == b[j]:
                fa[i] = fb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if fa[i]:
            while not fb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler: Jaro plus a common-prefix bonus (≤4 chars, only
    when Jaro > 0.7) — the standard parameters and the ones DuckDB's
    ``jaro_winkler_similarity()`` uses (verified pairwise in tests)."""
    j = jaro(a, b)
    if j > 0.7:
        prefix = 0
        for x, y in zip(a, b):
            if x == y and prefix < 4:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return j
