"""Vectorized hashing kernels: stable 64-bit hashes, token shingles,
MinHash signatures, SimHash fingerprints, LSH band keys.

All functions are pure numpy/pandas over flat arrays — no per-row
Python loops — so a map_batches stage calling them is C-speed.
Determinism: every hash is seeded from DedupConfig.seed only; the same
text produces the same signature in any process on any worker
(reference analog: deterministic blocking keys,
/root/reference/src/event_dedup/preprocessing/blocking.py:69-121).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

U64 = np.uint64
_GOLDEN = U64(0x9E3779B97F4A7C15)

def warm_numpy_heap() -> None:
    """No-op, kept for call-site compatibility.

    First-touch of FRESH large allocations costs seconds in this
    sandbox (~20-40 MB/s page faulting), so the fix is to keep every
    kernel's temporaries SMALL (perm_chunk=8, chunked simhash bits):
    small blocks are recycled by the numpy allocator and never leave
    the warm arena.  Pre-faulting a big buffer just moved the cost."""


def hash_strings_u64(values: "pd.Series | np.ndarray | list[str]") -> np.ndarray:
    """Stable 64-bit hash of each string (pandas siphash, fixed key)."""
    arr = pd.array(values, dtype="object") if not isinstance(values, pd.Series) else values
    return pd.util.hash_array(np.asarray(arr, dtype=object)).astype(U64)


def doc_ids_for_urls(urls) -> np.ndarray:
    """int64 doc ids from urls (stable across processes).

    Top bit cleared so ids are non-negative int64 — keeps parquet/SQL
    comparisons and canonical pair ordering (id_a < id_b) simple.
    """
    h = hash_strings_u64(urls)
    return (h >> U64(1)).astype(np.int64)


def _splitmix_array(x: np.ndarray, mult: U64, add: U64) -> np.ndarray:
    """One splitmix64-style mixing round with per-permutation constants."""
    with np.errstate(over="ignore"):
        z = (x + add).astype(U64)
        z = (z ^ (z >> U64(30))) * mult
        z = z ^ (z >> U64(27))
        z = z * _GOLDEN
        return z ^ (z >> U64(31))


def perm_constants(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(mults, adds) — the per-permutation hash constants (mults odd)."""
    rng = np.random.default_rng(seed)
    mults = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * U64(2) + U64(1)
    adds = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return mults, adds


def tokenize_offsets(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch of texts into one flat token array.

    Returns (flat_tokens: object ndarray, doc_lens: int64 ndarray).
    Empty/None texts produce zero tokens.
    """
    s = texts.fillna("") if texts.isna().any() else texts
    token_lists = s.str.split()
    doc_lens = token_lists.str.len().fillna(0).to_numpy(dtype=np.int64)
    nonempty = [t for t in token_lists if t]
    flat = (
        np.concatenate([np.asarray(t, dtype=object) for t in nonempty])
        if nonempty
        else np.empty(0, dtype=object)
    )
    return flat, doc_lens


def shingle_hashes(
    token_hashes: np.ndarray, doc_lens: np.ndarray, k: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle hashes over a flat token-hash array.

    Polynomial combine of k consecutive token hashes with seeded odd
    multipliers, masked so shingles never cross document boundaries.
    Docs with 0 < n < k tokens contribute ONE shingle combining all
    their tokens (short docs still get signatures; exact short dups
    still collide). Docs with 0 tokens contribute 0 shingles.

    Returns (flat_shingles: uint64, shingles_per_doc: int64).
    """
    rng = np.random.default_rng(seed + 1)
    mults = rng.integers(1, 2**63, size=k, dtype=np.uint64) * U64(2) + U64(1)

    n_docs = len(doc_lens)
    full = np.maximum(doc_lens - (k - 1), 0)          # full k-shingles per doc
    short = (doc_lens > 0) & (doc_lens < k)           # docs needing a stub shingle
    out_lens = np.where(short, 1, full)

    total = int(out_lens.sum())
    if total == 0:
        return np.empty(0, dtype=U64), out_lens

    ends = np.cumsum(doc_lens)
    starts = ends - doc_lens

    with np.errstate(over="ignore"):
        # rolling polynomial over the flat array (cross-boundary values
        # computed then discarded by the index mask below)
        T = token_hashes.astype(U64)
        nt = len(T)
        poly = np.zeros(max(nt - k + 1, 0), dtype=U64)
        for j in range(k):
            poly += T[j : nt - k + 1 + j] * mults[j]
        poly = _splitmix_array(poly, mults[0], U64(seed))

        out = np.empty(total, dtype=U64)
        pos = 0
        for d in range(n_docs):
            m = int(out_lens[d])
            if m == 0:
                continue
            if short[d]:
                seg = T[starts[d] : ends[d]]
                acc = (seg * mults[: len(seg)]).sum(dtype=U64)
                out[pos] = _splitmix_array(np.array([acc], dtype=U64), mults[0], U64(seed))[0]
            else:
                out[pos : pos + m] = poly[starts[d] : starts[d] + m]
            pos += m
    return out, out_lens


def minhash_signatures(
    flat_shingles: np.ndarray,
    shingles_per_doc: np.ndarray,
    mults: np.ndarray,
    adds: np.ndarray,
    perm_chunk: int = 8,
) -> np.ndarray:
    """(n_docs, num_perms) uint64 MinHash matrix via segment-min.

    Per permutation p the hash is the odd-multiply bijection
    ``h_p(x) = mults[p] * x  (mod 2^64)`` over shingle hashes that were
    already splitmix-mixed; min-equality under h_p is invariant to any
    additive constant, so no ``+b`` term is applied.  Hot loop is one
    uint64 broadcast multiply + np.minimum.reduceat per permutation
    chunk (chunk × shingles × 8 B of temporary).  Docs with zero
    shingles get the all-max sentinel signature (matches nothing).
    """
    num_perms = len(mults)
    n_docs = len(shingles_per_doc)
    sig = np.full((n_docs, num_perms), np.iinfo(np.uint64).max, dtype=U64)
    if len(flat_shingles) == 0:
        return sig
    del adds  # kept in the signature for config plumbing symmetry

    spd = np.asarray(shingles_per_doc, dtype=np.int64)
    ends = np.cumsum(spd)
    starts_all = ends - spd

    # BLOCK over shingles as well as perms: one (chunk × whole-batch)
    # temporary is tens of MB and streams DRAM once per perm chunk
    # (~2.4 GB of memory traffic per 4k-doc batch) — with 32 workers
    # that saturates the socket's bandwidth and caps the signature
    # phase's scaling.  Processing ~64k-shingle doc ranges keeps the
    # shingle slice + temporaries cache-resident across all 16 perm
    # chunks; the math (and therefore every signature bit) is
    # unchanged.
    shingle_block = 1 << 16
    b = 0
    while b < n_docs:
        limit = int(starts_all[b]) + shingle_block
        e = int(np.searchsorted(ends, limit, side="left")) + 1
        e = min(max(e, b + 1), n_docs)
        lo, hi = int(starts_all[b]), int(ends[e - 1])
        if hi == lo:
            b = e
            continue
        block = flat_shingles[lo:hi]
        nz = spd[b:e] > 0
        rel_starts = starts_all[b:e][nz] - lo
        if rel_starts.size == 0:
            b = e
            continue
        doc_rows = np.arange(b, e, dtype=np.int64)[nz]
        for c0 in range(0, num_perms, perm_chunk):
            c1 = min(c0 + perm_chunk, num_perms)
            with np.errstate(over="ignore"):
                # (chunk, block) layout: reduceat along contiguous rows
                hv = mults[c0:c1, None] * block[None, :]
            sig[np.ix_(doc_rows, range(c0, c1))] = np.minimum.reduceat(
                hv, rel_starts, axis=1
            ).T
        b = e
    return sig


def simhash_fingerprints(
    token_hashes: np.ndarray, doc_lens: np.ndarray, bits: int = 64
) -> np.ndarray:
    """(n_docs,) uint64 SimHash over unigram token hashes.

    Per-bit +1/-1 vote summed per doc (segment-sum), sign → bit.
    Zero-token docs get fingerprint 0.
    """
    n_docs = len(doc_lens)
    out = np.zeros(n_docs, dtype=U64)
    if len(token_hashes) == 0:
        return out
    nonzero = doc_lens > 0
    ends = np.cumsum(doc_lens)
    starts = (ends - doc_lens)[nonzero].astype(np.int64)

    fp = np.zeros(len(starts), dtype=U64)
    bit_chunk = 8          # keep temporaries small (see warm_numpy_heap)
    for b0 in range(0, bits, bit_chunk):
        b1 = min(b0 + bit_chunk, bits)
        shifts = np.arange(b0, b1, dtype=np.uint64)
        # (chunk, n_tokens) layout: reduceat along contiguous rows
        votes = (
            ((token_hashes[None, :] >> shifts[:, None]) & U64(1)).astype(np.int8) * 2 - 1
        )
        sums = np.add.reduceat(votes.astype(np.int32), starts, axis=1)
        bits_set = (sums > 0).astype(np.uint64)
        for j, b in enumerate(range(b0, b1)):
            fp |= bits_set[j, :] << U64(b)
    out[nonzero] = fp
    return out


def band_hashes(sig: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """(n_docs, bands) uint64 band keys from a (n_docs, bands*rows) signature.

    Each band's r values are combined with a seeded polynomial + mix so
    two docs share a band key iff their r signature slots are equal
    (modulo 64-bit collisions).
    """
    n = sig.shape[0]
    rng = np.random.default_rng(seed + 2)
    mults = rng.integers(1, 2**63, size=rows, dtype=np.uint64) * U64(2) + U64(1)
    s3 = sig.reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        combined = (s3 * mults[None, None, :]).sum(axis=2, dtype=U64)
        return _splitmix_array(combined, _GOLDEN, U64(seed))


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Exact Jaccard of two stacked signature matrices (n, P) → (n,) float64.

    'Exact' in the reference-parity sense (north rule): the verification
    score is the exact fraction of equal MinHash slots, the standard
    unbiased estimator of set Jaccard at P permutations.
    """
    return (sig_a == sig_b).mean(axis=1)


def hamming_distance_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR for uint64 arrays."""
    x = (a ^ b).view(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def sample_hash32(keys: np.ndarray) -> np.ndarray:
    """SQL-expressible 32-bit key hash for deterministic Bernoulli
    sampling: fold an int64 key to 32 bits, then the murmur3 fmix32
    finalizer (two odd-constant multiplies + xorshifts), all mod 2**32.

    Every step is exact integer arithmetic reproducible in ANSI SQL
    (xor / integer division / HUGEINT multiply mod 4294967296) — see
    the q51 oracle — so a sample drawn by this engine and one drawn by
    a SQL warehouse select the SAME rows.  Uniformity is the fmix32
    avalanche; keys are consumed as unsigned.  SQL parity holds for
    NONNEGATIVE keys (every table's id domain; property-tested):
    negative bit patterns diverge because SQL's // floor-divides
    where the unsigned view shifts."""
    x = np.asarray(keys).astype(np.int64).view(U64)
    m32 = U64(0xFFFFFFFF)
    v = (x ^ (x >> U64(32))) & m32
    with np.errstate(over="ignore"):
        v = (v * U64(2246822507)) & m32
        v ^= v >> U64(13)
        v = (v * U64(3266489909)) & m32
        v ^= v >> U64(16)
    return v
