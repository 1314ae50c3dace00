"""Shingling / MinHash / SimHash primitives for near-duplicate
detection at scale (vectorized with numpy; deterministic seeds).

Standard constructions from the public literature (Broder's MinHash,
Charikar's SimHash) — mergeable/bandable so the Ray stages can shuffle
only small signatures, never document text.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


_ROLL_BASE = np.uint64(1099511628211)  # FNV prime; arithmetic wraps mod 2^64


_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_HASH_CACHE_MAX = 1_000_000  # vocabulary-bounded; reset if exceeded


def _word_hashes(words: list[str]) -> np.ndarray:
    """Stable 64-bit hash per word — blake2b once per DISTINCT word
    ever seen by this worker process (natural-language vocabulary is
    tiny relative to token count, so the cache hit rate is ~99%)."""
    cache = _WORD_HASH_CACHE
    if len(cache) > _WORD_HASH_CACHE_MAX:
        cache.clear()
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = cache[w] = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
            )
        out[i] = h
    return out


def shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingles → stable 32-bit hashes (sorted unique) via a
    VECTORIZED polynomial rolling hash: each unique word is digested
    once, then gram hashes are Σ wordhash[i+j]·B^(k-1-j) mod 2^64 over
    a sliding window — k shifted numpy multiplies instead of a blake2b
    digest per gram (the gram digests dominated the signature kernel).
    The document-fingerprinting rolling-hash primitive of the task
    brief, doubling as the MinHash shingle function."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return np.empty(0, dtype=np.uint64)
    seq = _word_hashes(words)
    n = len(seq)
    mask = (1 << 64) - 1
    base = int(_ROLL_BASE)
    if n < k:
        acc = 0
        for h in seq.tolist():
            acc = (acc * base + h) & mask  # explicit mod-2^64 wrap
        return np.unique(np.array([acc], dtype=np.uint64) >> np.uint64(32))
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    power = 1
    for j in range(k - 1, -1, -1):
        # array multiply wraps mod 2^64 silently (intended); the power
        # itself is computed in Python ints to avoid scalar-overflow
        # warnings
        acc += seq[j : j + m] * np.uint64(power)
        power = (power * base) & mask
    # top 32 bits: the low bits of a polynomial in an odd base are the
    # least mixed
    return np.unique(acc >> np.uint64(32))


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(sh: np.ndarray, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """(a*x + b) mod p universal-hash MinHash signature (uint32)."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if sh.size == 0:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint32)
    # (num_perm, n) without materializing python loops
    vals = (np.outer(a, sh) + b[:, None]) % _MERSENNE
    return (vals.min(axis=1) & _MAX_HASH).astype(np.uint32)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into bands; each band hashes to a bucket key.
    Band id is mixed into the key so buckets never collide across
    bands."""
    rows = sig.size // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8, salt=bytes([b])).digest()
        keys.append(int.from_bytes(h, "big") >> 1)  # fits int64
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over shingle-hash sets (verification step)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash(text: str, seed: int = 1) -> int:
    """64-bit SimHash over word features (term-frequency weighted)."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    uniq, counts = np.unique(np.array(words), return_counts=True)
    for w, c in zip(uniq, counts):
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8, salt=seed.to_bytes(1, "big")).digest(),
            "big",
        )
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += (2 * bits - 1) * int(c)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    return jaccard(shingles(a, k), shingles(b, k))
