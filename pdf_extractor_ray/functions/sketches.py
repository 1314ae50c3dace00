"""Mergeable sketches: HyperLogLog (approximate distinct count).

Standard HLL (Flajolet et al., public construction): m=2^p registers,
register j keeps the max leading-zero rank of hashes routed to it.
Registers are tiny (m bytes) and merge by elementwise max — the
mergeable-sketch shape Ray Data aggregates want: one partial sketch
per batch, a cheap final merge (ray_guide "Aggregation at scale").
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_P = 12  # 4096 registers ≈ 1.6% standard error


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7)


def hll_new(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> None:
    """Add pre-hashed 64-bit values (vectorized)."""
    p = int(np.log2(reg.size))
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (cap 64-p+1)
    ranks = np.zeros(hashes.size, dtype=np.uint8)
    remaining = rest
    cur = np.ones(hashes.size, dtype=bool)
    for bit in range(64 - p):
        top = (remaining >> np.uint64(63)) & np.uint64(1)
        hit = cur & (top == 1)
        ranks[hit] = bit + 1
        cur &= top == 0
        remaining = remaining << np.uint64(1)
        if not cur.any():
            break
    ranks[cur] = 64 - p + 1
    np.maximum.at(reg, idx, ranks)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mix function) —
    a full-avalanche 64-bit hash for integer keys, no Python loop."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def hash_values(values) -> np.ndarray:
    """Stable 64-bit hashes.  Integer inputs (the hot path — ids/keys)
    hash vectorized via splitmix64; anything else falls back to a
    per-value blake2b of the string form.

    A sketch must only ever be fed ONE hash family per logical column,
    or merged HLL/CMS estimates silently inflate — so int-LIKE inputs
    (an int64 column that became float64/object through a null or a
    pandas conversion) are normalized back to int64 and hashed with
    splitmix64, the same space their int-dtype siblings use."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return _splitmix64(arr)
    if arr.dtype.kind == "f" and len(arr):
        ints = arr.astype(np.int64)
        if not np.isnan(arr).any() and np.array_equal(
            ints.astype(arr.dtype), arr
        ):
            return _splitmix64(ints)
    if arr.dtype.kind == "O" and len(arr) and all(
        isinstance(v, (int, np.integer)) and not isinstance(v, bool) for v in arr
    ):
        return _splitmix64(arr.astype(np.int64))
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
        )
    return out


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    m = reg.size
    est = _alpha(m) * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:  # small-range correction
        zeros = int((reg == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, public construction) —
# heavy-hitter estimation with a fixed-size mergeable array: depth
# rows of width counters; add = +1 at one hashed slot per row; merge =
# elementwise sum; estimate = min over rows (always >= true count,
# <= true + (e/width)·N with prob 1-e^-depth).
# --------------------------------------------------------------------------

CMS_DEPTH, CMS_WIDTH = 4, 2048
_CMS_ROW_SALTS = np.array(
    [0x9E3779B97F4A7C15 * (d + 1) & 0xFFFFFFFFFFFFFFFF for d in range(64)],
    dtype=np.uint64,
)


def cms_new(depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def _cms_slots(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) slot indices — one independent hash row per depth via
    salted splitmix64 re-mixing (vectorized, no Python loop)."""
    h = hashes.astype(np.uint64)
    return np.stack(
        [(_splitmix64(h ^ _CMS_ROW_SALTS[d]) % np.uint64(width)).astype(np.int64)
         for d in range(depth)]
    )


def cms_add(cms: np.ndarray, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
    depth, width = cms.shape
    slots = _cms_slots(hashes, depth, width)
    c = np.ones(len(hashes), dtype=np.int64) if counts is None else counts.astype(np.int64)
    for d in range(depth):
        np.add.at(cms[d], slots[d], c)


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_estimate(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    depth, width = cms.shape
    slots = _cms_slots(hashes, depth, width)
    return np.min(
        np.stack([cms[d][slots[d]] for d in range(depth)]), axis=0
    ).astype(np.int64)


# --------------------------------------------------------------------------
# KLL-style mergeable rank sketch (Karnin–Lang–Liberty, FOCS'16 —
# simplified fixed-capacity compactors, the MRL/KLL-lite variant).
# Deterministic: compaction keeps even- or odd-indexed items of the
# SORTED level according to a per-level parity counter, so the same
# inputs merged in the same order always produce the same sketch (the
# query layer sorts partials before merging to fix the order).
# Rank error is O(levels / k) of n — pinned by test at ≤2% for k=200.
# --------------------------------------------------------------------------

KLL_K = 200


def kll_new(k: int = KLL_K) -> dict:
    return {"k": k, "levels": [np.empty(0, np.float64)], "parity": [0], "n": 0}


def _kll_compact(s: dict) -> None:
    k = s["k"]
    h = 0
    while h < len(s["levels"]):
        lv = s["levels"][h]
        if len(lv) <= k:
            h += 1
            continue
        lv = np.sort(lv)
        keep = lv[s["parity"][h] :: 2]  # half survive, weight doubles
        s["parity"][h] ^= 1
        s["levels"][h] = np.empty(0, np.float64)
        if h + 1 == len(s["levels"]):
            s["levels"].append(np.empty(0, np.float64))
            s["parity"].append(0)
        s["levels"][h + 1] = np.concatenate([s["levels"][h + 1], keep])
        h += 1


def kll_update(s: dict, values: np.ndarray) -> None:
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    s["levels"][0] = np.concatenate([s["levels"][0], v])
    s["n"] += len(v)
    _kll_compact(s)


def kll_merge(a: dict, b: dict) -> dict:
    assert a["k"] == b["k"]
    out = {"k": a["k"], "levels": [], "parity": [], "n": a["n"] + b["n"]}
    for h in range(max(len(a["levels"]), len(b["levels"]))):
        la = a["levels"][h] if h < len(a["levels"]) else np.empty(0, np.float64)
        lb = b["levels"][h] if h < len(b["levels"]) else np.empty(0, np.float64)
        out["levels"].append(np.concatenate([la, lb]))
        out["parity"].append(
            (a["parity"][h] if h < len(a["parity"]) else 0)
            ^ (b["parity"][h] if h < len(b["parity"]) else 0)
        )
    _kll_compact(out)
    return out


def kll_quantiles(s: dict, qs) -> np.ndarray:
    """Lower-rank quantile estimates for each q in ``qs``."""
    items, weights = [], []
    for h, lv in enumerate(s["levels"]):
        if len(lv):
            items.append(lv)
            weights.append(np.full(len(lv), 1 << h, np.int64))
    if not items:
        return np.full(len(list(qs)), np.nan)
    items = np.concatenate(items)
    weights = np.concatenate(weights)
    order = np.argsort(items, kind="stable")
    items, weights = items[order], weights[order]
    cum = np.cumsum(weights)
    total = cum[-1]
    out = []
    for q in qs:
        target = q * total
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append(items[min(idx, len(items) - 1)])
    return np.asarray(out, np.float64)


def kll_serialize(s: dict) -> list:
    """Arrow-friendly: list of per-level float lists; parity packed as
    a trailing float level (small ints are exact in float64)."""
    return [lv.tolist() for lv in s["levels"]] + [
        [float(p) for p in s["parity"]] + [float(s["k"]), float(s["n"])]
    ]


def kll_deserialize(payload: list) -> dict:
    *levels, meta = payload
    n_levels = len(levels)
    parity = [int(x) for x in meta[:n_levels]]
    k = int(meta[n_levels])
    n = int(meta[n_levels + 1])
    return {
        "k": k,
        "levels": [np.asarray(lv, np.float64) for lv in levels],
        "parity": parity,
        "n": n,
    }
