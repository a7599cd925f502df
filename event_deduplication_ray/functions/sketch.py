"""HyperLogLog — mergeable approximate count-distinct.

A 100 TB-scale extension beyond the reference's operator set (the
reference counts distincts exactly in SQL, e.g. its dashboard
aggregates at src/event_dedup/api/routes/stats.py): at billions of
distinct keys per group the exact distinct shuffle moves one row per
(group, key), while an HLL partial is a FIXED 2**p bytes per group
per batch, merged by elementwise max — associative, commutative,
idempotent, so it composes with any shuffle topology and with
incremental/resumable runs.

Standard Flajolet et al. 2007 estimator with the small-range
linear-counting correction; 64-bit hash makes the large-range
correction unnecessary.  p = 12 → 4096 registers → ~1.6 % standard
error, 4 KB per sketch.

Vectorized throughout: one splitmix64 pass, register index / rank via
shifts, np.maximum.at for the register fold.  The rank uses
floor(log2) in float64 with an explicit off-by-one correction where
log2 rounds up at a power-of-two boundary (w in [2**k, 2**(k+1)) can
round to k+1 only at the very top of the interval).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
P_DEFAULT = 12

_SPLITMIX_GAMMA = U64(0x9E3779B97F4A7C15)
_MIX1 = U64(0xBF58476D1CE4E5B9)
_MIX2 = U64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless splitmix64 of a u64 array (fixed constants)."""
    with np.errstate(over="ignore"):
        z = (x + _SPLITMIX_GAMMA).astype(U64)
        z = (z ^ (z >> U64(30))) * _MIX1
        z = (z ^ (z >> U64(27))) * _MIX2
        return z ^ (z >> U64(31))


def hll_partial(values: np.ndarray, p: int = P_DEFAULT) -> np.ndarray:
    """Fold int values into a fresh register array (uint8, 2**p)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _splitmix64(np.asarray(values).astype(np.int64).view(U64))
    idx = (h >> U64(64 - p)).astype(np.int64)
    w = (h << U64(p)).astype(U64)          # top 64-p payload bits
    width = 64 - p
    rank = np.full(len(w), width + 1, dtype=np.uint8)
    nz = w != 0
    if nz.any():
        k = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
        k = np.where((w[nz] >> k.astype(U64)) == 0, k - 1, k)  # log2 round-up
        # w's msb sits at bit k (0-based within 64 bits); leading zeros
        # within the width-bit payload = 63 - k; rank = lz + 1
        rank[nz] = (U64(64) - k.astype(U64)).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches: "list[np.ndarray]") -> np.ndarray:
    """Elementwise max — the union of the underlying sets."""
    return np.maximum.reduce([np.asarray(s, dtype=np.uint8) for s in sketches])


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)        # linear counting
    return float(est)


# ------------------------------------------------------------------
# Count-Min sketch — mergeable approximate frequency table.
#
# Complements Misra-Gries (queries.q69): MG surfaces WHICH keys are
# heavy with a one-sided underestimate, CMS answers "how often does
# key k occur" for ANY k with a one-sided OVERestimate
# (true <= est <= true + eps*N w.h.p., eps = e/width).  Both partials
# merge by simple elementwise ops, so a reduce tree of any shape —
# per-batch → per-partition → driver — gives the exact same sketch as
# a single pass; no per-key shuffle ever happens.

CMS_D_DEFAULT = 4
CMS_W_DEFAULT = 8192


def _cms_rows(keys_u64: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) int64 column indices — row r uses splitmix(key ^ mix(r+1))."""
    out = np.empty((d, len(keys_u64)), dtype=np.int64)
    for r in range(d):
        seed = _splitmix64(np.asarray([r + 1], dtype=U64))[0]
        out[r] = (_splitmix64(keys_u64 ^ seed) % U64(w)).astype(np.int64)
    return out


def cms_partial(keys_u64: np.ndarray, counts: np.ndarray,
                d: int = CMS_D_DEFAULT, w: int = CMS_W_DEFAULT) -> np.ndarray:
    """Fold (key, count) pairs into a fresh (d, w) int64 matrix."""
    M = np.zeros((d, w), dtype=np.int64)
    if len(keys_u64) == 0:
        return M
    idx = _cms_rows(np.asarray(keys_u64, dtype=U64), d, w)
    c = np.asarray(counts, dtype=np.int64)
    for r in range(d):
        np.add.at(M[r], idx[r], c)
    return M


def cms_merge(sketches: "list[np.ndarray]") -> np.ndarray:
    """Elementwise sum — the sketch of the concatenated streams."""
    return np.sum([np.asarray(s, dtype=np.int64) for s in sketches], axis=0)


def cms_query(M: np.ndarray, keys_u64: np.ndarray) -> np.ndarray:
    """Point estimates (int64): min over rows — never below the true
    count, above it by at most eps*N with prob 1-2^-d."""
    if len(keys_u64) == 0:
        return np.zeros(0, dtype=np.int64)
    d, w = M.shape
    idx = _cms_rows(np.asarray(keys_u64, dtype=U64), d, w)
    ests = np.stack([M[r][idx[r]] for r in range(d)])
    return ests.min(axis=0).astype(np.int64)


# ------------------------------------------------------------------
# KLL/MRL-style mergeable rank (quantile) sketch — the scale path for
# quantiles over UNBOUNDED domains, where q34/q83's exact distinct-
# value histograms stop being "small state".  Level i holds items of
# weight 2^i; a full level sorts and keeps every other item
# (deterministic alternating offset instead of the classic coin flip,
# so re-runs and resumes reproduce the sketch bit-for-bit; the rank
# error stays O(n/k)-bounded for any merge-tree shape and is gated
# empirically in tests/test_sketch.py across distributions).

KLL_K_DEFAULT = 200


def kll_new(k: int = KLL_K_DEFAULT) -> dict:
    return {"k": int(k), "levels": [np.empty(0, np.float64)], "flip": 0}


def _kll_compact(s: dict) -> None:
    k, levels = s["k"], s["levels"]
    i = 0
    while i < len(levels):
        if len(levels[i]) <= k:            # uniform capacity per level (MRL)
            i += 1
            continue
        buf = np.sort(levels[i], kind="stable")
        off = s["flip"] & 1
        s["flip"] += 1
        # an odd buffer leaves ONE item behind at this level so total
        # weight is conserved exactly (promoted items double in weight)
        if len(buf) % 2 == 1:
            if off == 0:
                leftover, buf = buf[-1:], buf[:-1]
            else:
                leftover, buf = buf[:1], buf[1:]
        else:
            leftover = np.empty(0, np.float64)
        promoted = buf[off::2]
        levels[i] = leftover
        if i + 1 == len(levels):
            levels.append(np.empty(0, np.float64))
        levels[i + 1] = np.concatenate([levels[i + 1], promoted])
        i += 1


def kll_update(s: dict, values: np.ndarray) -> dict:
    v = np.asarray(values, np.float64)
    if len(v):
        s["levels"][0] = np.concatenate([s["levels"][0], v])
        _kll_compact(s)
    return s


def kll_merge(a: dict, b: dict) -> dict:
    out = {"k": min(a["k"], b["k"]),
           "levels": [], "flip": a["flip"] + b["flip"]}
    n = max(len(a["levels"]), len(b["levels"]))
    for i in range(n):
        la = a["levels"][i] if i < len(a["levels"]) else np.empty(0)
        lb = b["levels"][i] if i < len(b["levels"]) else np.empty(0)
        out["levels"].append(np.concatenate([la, lb]).astype(np.float64))
    _kll_compact(out)
    return out


def kll_n(s: dict) -> int:
    return int(sum(len(lv) << i for i, lv in enumerate(s["levels"])))


def kll_quantile(s: dict, frac: float) -> float:
    """Value whose weighted rank is ceil(frac·n) (percentile_disc
    semantics over the sketch's weighted sample)."""
    vals, wts = [], []
    for i, lv in enumerate(s["levels"]):
        if len(lv):
            vals.append(lv)
            wts.append(np.full(len(lv), 1 << i, np.int64))
    if not vals:
        return float("nan")
    v = np.concatenate(vals)
    w = np.concatenate(wts)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = int(cum[-1])
    target = max(int(np.ceil(frac * total)), 1)
    return float(v[np.searchsorted(cum, target)])


def kll_serialize(s: dict) -> bytes:
    import pickle

    return pickle.dumps({"k": s["k"], "flip": s["flip"],
                         "levels": [lv.tobytes() for lv in s["levels"]]})


def kll_deserialize(b: bytes) -> dict:
    import pickle

    d = pickle.loads(b)
    return {"k": d["k"], "flip": d["flip"],
            "levels": [np.frombuffer(lv, np.float64).copy()
                       for lv in d["levels"]]}
