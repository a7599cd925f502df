"""Vectorized Bloom filter over int64 keys — the broadcast-membership
scale path.

Where it slots in: q33-style decontamination and the incremental
band-key semi-join (pipelines/incremental.py) broadcast the small
side as an EXACT sorted array and probe with np.isin.  That is the
right call while the set fits comfortably in worker memory (hundreds
of millions of 8 B keys).  When the "small" side grows past that — a
benchmark-suite shingle set in the tens of billions — a Bloom filter
at ~10 bits/key keeps the broadcast ~6x smaller at a tunable
false-positive rate; contaminated-by-false-positive rows only
over-drop (never under-drop), the conservative direction for
decontamination.

Mergeable by bitwise OR, so per-batch partial filters compose with
any shuffle topology (same contract as functions/sketch.py).

All operations are array-at-once: k double-hashed probes per key
(h1 + i*h2, Kirsch-Mitzenmacher), gathered with one fancy-index per
probe round — no per-key Python.
"""

from __future__ import annotations

import numpy as np

from event_deduplication_ray.functions.sketch import _splitmix64

U64 = np.uint64
_H2_SALT = U64(0xD6E8FEB86659FD93)


def _h12(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values).astype(np.int64).view(U64)
    h1 = _splitmix64(v)
    with np.errstate(over="ignore"):
        h2 = _splitmix64(v ^ _H2_SALT) | U64(1)   # odd → full-period step
    return h1, h2


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for n_keys at the target false-positive rate
    (standard m = -n ln p / ln2², k = m/n ln2), m rounded up to a
    whole uint64 word."""
    n = max(n_keys, 1)
    m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
    m = max((m + 63) // 64 * 64, 64)
    k = max(int(round(m / n * np.log(2))), 1)
    return m, k


def bloom_build(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Packed uint64 word array with all keys folded in."""
    words = np.zeros(m_bits // 64, dtype=U64)
    if len(values) == 0:
        return words
    h1, h2 = _h12(values)
    for i in range(k):
        with np.errstate(over="ignore"):
            bit = (h1 + U64(i) * h2) % U64(m_bits)
        np.bitwise_or.at(words, (bit >> U64(6)).astype(np.int64),
                         U64(1) << (bit & U64(63)))
    return words


def bloom_merge(filters: "list[np.ndarray]") -> np.ndarray:
    """Bitwise OR — the union of the underlying key sets."""
    return np.bitwise_or.reduce([np.asarray(f, dtype=U64) for f in filters])


def bloom_contains(words: np.ndarray, values: np.ndarray, k: int) -> np.ndarray:
    """Membership probe (definite-no / probable-yes), vectorized."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = U64(len(words) * 64)
    h1, h2 = _h12(values)
    hit = np.ones(len(values), dtype=bool)
    for i in range(k):
        with np.errstate(over="ignore"):
            bit = (h1 + U64(i) * h2) % m_bits
        w = words[(bit >> U64(6)).astype(np.int64)]
        hit &= (w >> (bit & U64(63))) & U64(1) != 0
        if not hit.any():
            break
    return hit
