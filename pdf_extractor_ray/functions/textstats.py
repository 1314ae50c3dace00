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
# Vectorized array twins (Arrow/RE2 kernels + numpy) of the scalar
# functions above.  The scalars remain the spec (and the per-row
# oracle); these are the hot-path forms used by TextAnalyzer and the
# langid/quality/token_count queries — semantics pinned to the SQL
# mirrors in pipelines/queries/textops.py (both sides are RE2, so the
# engine matches the DuckDB oracle by construction).  Corpus
# assumption, shared with the SQL mirrors and verified by the driver's
# strict hashes: document text is ASCII + CJK; exotic Unicode
# whitespace or letters would diverge from the Unicode-aware scalars.
# --------------------------------------------------------------------------

_CJK_RE = r"[\x{4E00}-\x{9FFF}]"
_LANG_WORD_SPLIT_RE = r"[^a-z\x{4E00}-\x{9FFF}]+"
_SORTED_LANGS = tuple(sorted(_STOPWORDS))


def _as_array(col):
    """ChunkedArray/Array → single null-free large_utf8 Array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(col, "").cast(pa.large_utf8())


def token_count_array(col):
    """Vectorized :func:`token_count`: one RE2 count kernel.  RE2's
    ``\\s`` excludes ``\\v`` (unlike Python's ASCII ``\\s``) — matching
    the DuckDB oracle (queries.TOKEN_SQL_RE) exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.count_substring_regex(
        _as_array(col), pattern=r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
    ).cast(pa.int64())


def _str_buffers(arr):
    """(bytes buffer, starts, lens) views of a large_utf8 Array."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return buf, offs[:-1], (offs[1:] - offs[:-1])


# Above this row length the position-wise numpy FNV pays more in
# per-position dispatch than the plain byte loop costs — the rare
# mega-document falls back to the scalar.
_FNV_VEC_CAP = 1 << 14


def _fnv1a_buffers(buf, starts, lens):
    """FNV-1a 64 over each [start, start+len) byte slice, vectorized
    ACROSS rows (the per-byte chain is sequential, the row dimension
    is not): rows are length-sorted so each position step updates a
    contiguous suffix."""
    n = len(lens)
    out = np.full(n, np.uint64(_FP_OFFSET), dtype=np.uint64)
    if n == 0:
        return out
    base = np.uint64(_FP_BASE)
    order = np.argsort(lens, kind="stable")
    s_starts = starts[order]
    s_lens = lens[order]
    # scalar fallback for the long tail (cheaper than maxlen tiny-array steps)
    cut = int(np.searchsorted(s_lens, _FNV_VEC_CAP, side="right"))
    hs = np.full(n, np.uint64(_FP_OFFSET), dtype=np.uint64)
    maxlen = int(s_lens[cut - 1]) if cut else 0
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            k = int(np.searchsorted(s_lens[:cut], i, side="right"))
            idx = s_starts[k:cut] + i
            hs[k:cut] = (hs[k:cut] ^ buf[idx].astype(np.uint64)) * base
    for j in range(cut, n):
        h = _FP_OFFSET
        s = int(s_starts[j])
        for b in buf[s : s + int(s_lens[j])].tobytes():
            h = ((h ^ b) * _FP_BASE) & _FP_MASK
        hs[j] = h
    out[order] = hs
    return out


def fingerprint_exact_array(col):
    """Vectorized :func:`fingerprint_exact` (FNV-1a 64 over raw utf-8
    bytes), returned as a signed-int64 numpy array."""
    arr = _as_array(col)
    return _fnv1a_buffers(*_str_buffers(arr)).view(np.int64)


def fingerprint_array(col):
    """Vectorized :func:`fingerprint`: whitespace normalization via
    Arrow's Unicode trim + split_whitespace + join (the exact
    ``' '.join(t.split())`` twin for Unicode-whitespace text), then
    the row-vectorized FNV."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = _as_array(col)
    norm = pc.binary_join(
        pc.utf8_split_whitespace(pc.utf8_trim_whitespace(arr)),
        pa.scalar(" ", pa.large_utf8()),
    ).cast(pa.large_utf8())
    return _fnv1a_buffers(*_str_buffers(norm)).view(np.int64)


def _word_hits(flat_ne, parents_ne, value_set, n_rows):
    """Per-row count of tokens that are members of ``value_set``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    member = pc.is_in(flat_ne, value_set=pa.array(sorted(value_set))).to_numpy(
        zero_copy_only=False
    )
    return np.bincount(parents_ne[member], minlength=n_rows)


def _split_tokens(lower, pattern, n_rows):
    """Split each row on ``pattern``; return (non-empty flat tokens,
    their parent row indices, per-row non-empty counts)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(lower, pattern=pattern)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ne = pc.not_equal(flat, "")
    flat_ne = flat.filter(ne)
    parents_ne = parents[ne.to_numpy(zero_copy_only=False)]
    counts = np.bincount(parents_ne, minlength=n_rows)
    return flat_ne, parents_ne, counts


def detect_language_array(col):
    """Vectorized :func:`detect_language`, pinned to the SQL_LANGID
    mirror: CJK-share short-circuit on the first 400 codepoints, then
    a stopword vote over the first 300 ``[a-z|CJK]+`` tokens of the
    lowered text with sorted-language tie-break and a
    ``max(2, nw // 50)`` confidence floor."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = _as_array(col)
    n_rows = len(arr)
    n = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    cjk = (
        pc.count_substring_regex(
            pc.utf8_slice_codeunits(arr, 0, 400), pattern=_CJK_RE
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    lower = pc.utf8_lower(arr)
    flat_ne, parents_ne, _ = _split_tokens(lower, _LANG_WORD_SPLIT_RE, n_rows)
    # rank of each token within its row (parents_ne is nondecreasing)
    m = len(parents_ne)
    if m:
        pos = np.arange(m, dtype=np.int64)
        first = np.zeros(m, dtype=np.int64)
        new_row = np.empty(m, dtype=bool)
        new_row[0] = True
        new_row[1:] = parents_ne[1:] != parents_ne[:-1]
        first[new_row] = pos[new_row]
        first = np.maximum.accumulate(first)
        keep = (pos - first) < 300  # first 300 words per row
        flat_c = flat_ne.filter(pa.array(keep))
        parents_c = parents_ne[keep]
    else:
        flat_c, parents_c = flat_ne, parents_ne
    nw = np.bincount(parents_c, minlength=n_rows)
    hits = np.stack(
        [_word_hits(flat_c, parents_c, _STOPWORDS[lang], n_rows) for lang in _SORTED_LANGS]
    )
    best = hits.max(axis=0)
    # argmax takes the FIRST max → sorted-language tie-break, as the scalar
    pred = np.array(_SORTED_LANGS, dtype=object)[hits.argmax(axis=0)]
    pred[(nw == 0) | (best < np.maximum(2, nw // 50))] = "und"
    pred[cjk > np.minimum(n, 400) * 0.2] = "zh"
    pred[n == 0] = "und"
    return pa.array(pred, pa.string())


def quality_features_array(col):
    """Vectorized :func:`quality_score`, pinned to the SQL_QUALITY
    mirror — returns a dict of float64 numpy arrays (stop_ratio,
    punct_ratio, mean_word_len, quality).  Same integer counters, same
    left-to-right double products of the frozen thresholds."""
    import pyarrow.compute as pc

    arr = _as_array(col)
    n_rows = len(arr)
    n = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    lower = pc.utf8_lower(arr)
    punct = (
        pc.count_substring_regex(arr, pattern="[^a-zA-Z0-9 \t\n\f\r\x0b]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # nw == count of [a-z]+ matches == non-empty split segments, and
    # word_chars == their total length — both fall out of the one split
    flat_ne, parents_ne, nw = _split_tokens(lower, r"[^a-z]+", n_rows)
    word_chars = np.bincount(
        parents_ne,
        weights=pc.utf8_length(flat_ne).to_numpy(zero_copy_only=False),
        minlength=n_rows,
    ).astype(np.int64)
    stop_hits = _word_hits(flat_ne, parents_ne, _STOPWORDS["en"], n_rows)
    nw_safe = np.where(nw > 0, nw, 1)
    stop_ratio = np.where(nw > 0, stop_hits / nw_safe, 0.0)
    mean_word_len = np.where(nw > 0, word_chars / nw_safe, 0.0)
    punct_ratio = np.where(n > 0, punct / np.where(n > 0, n, 1), 0.0)
    quality = np.where(n < 50, 0.5, 1.0)
    quality = quality * np.where(stop_ratio < 0.05, 0.6, 1.0)
    quality = quality * np.where(punct_ratio > 0.3, 0.4, 1.0)
    quality = quality * np.where((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0, 0.7)
    quality[n == 0] = 0.0
    return {
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "mean_word_len": mean_word_len,
        "quality": quality,
    }


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
