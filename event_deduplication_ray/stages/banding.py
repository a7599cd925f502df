"""Stage 3a — explode signatures into candidate-generation key tables.

Reference analog: blocking-key generation B1
(/root/reference/src/event_dedup/preprocessing/blocking.py:69-121) —
re-keyed per the north rule to LSH band hashes, SimHash chunk buckets
and substring fingerprints.  Each pass yields a narrow key table
``(band_key:int64, doc_id:int64, ...)`` that feeds the same
groupby-style pair generator (pairs.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions import hashing as H

U64 = np.uint64
# per-pass salts so keys from different passes never collide
_MINHASH_SALT = U64(0x5851F42D4C957F2D)
_SIMHASH_SALT = U64(0x14057B7EF767814F)


def _mix_to_int63(x: np.ndarray) -> np.ndarray:
    return (H._splitmix_array(x, H._GOLDEN, U64(0)) >> U64(1)).astype(np.int64)


def _n_chars(t: pa.Table) -> np.ndarray:
    """n_chars column if present (older checkpoints lack it: treat as
    passing — the gate only ever *excludes* with explicit evidence)."""
    if "n_chars" in t.column_names:
        return t["n_chars"].to_numpy(zero_copy_only=False)
    return np.full(len(t), np.iinfo(np.int64).max, dtype=np.int64)


def plan_bands(threshold: float, n_hashes: int,
               fp_weight: float = 0.5, fn_weight: float = 0.5) -> dict:
    """Choose the (bands, rows) LSH split for a target Jaccard
    threshold (the standard S-curve planner, e.g. Leskovec et al.
    MMDS §3.4 / datasketch's _optimal_param): a pair with similarity
    s collides in ≥1 band with p(s) = 1 − (1 − s^r)^b, so pick the
    (b, r) with b·r ≤ n_hashes minimizing
    fp_weight·∫₀ᵗ p(s) ds + fn_weight·∫ₜ¹ (1 − p(s)) ds.
    Weight fn_weight up for recall-critical dedup (missed dups cost
    more than extra verify work — verification filters false
    positives anyway, at compute cost only).

    Driver-side arithmetic over a fixed grid; returns
    ``{"bands", "rows", "fp", "fn", "midpoint"}`` where midpoint
    = (1/b)^(1/r) is where the S-curve crosses p = 1 − (1 − 1/b)ᵇ
    ≈ 0.63 — the usual "threshold" reading of a band plan."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1): {threshold}")
    s = np.linspace(0.0, 1.0, 2001)
    ds_ = s[1] - s[0]
    below = s <= threshold
    best: dict | None = None
    for b in range(1, n_hashes + 1):
        for r in range(1, n_hashes // b + 1):
            p = 1.0 - (1.0 - s ** r) ** b
            fp = float(np.trapz(np.where(below, p, 0.0), dx=ds_))
            fn = float(np.trapz(np.where(below, 0.0, 1.0 - p), dx=ds_))
            cost = fp_weight * fp + fn_weight * fn
            if best is None or cost < best["_cost"]:
                best = {"bands": b, "rows": r, "fp": round(fp, 6),
                        "fn": round(fn, 6),
                        "midpoint": round((1.0 / b) ** (1.0 / r), 6),
                        "_cost": cost}
    assert best is not None
    best.pop("_cost")
    return best


def minhash_band_key_matrix(sig: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """(n, bands*rows) uint64 MinHash matrix → (n, bands) int63 band
    keys (banded row hash ⊕ band index ⊕ pass salt, mixed).

    Called by the SIGNATURE stage so the per-doc band keys (8 B × b)
    ride the pinned table instead of the full u64 signature
    (8 B × b × r) — the banding explode then just flattens."""
    bands, rows = cfg.lsh_bands, cfg.lsh_rows
    bh = H.band_hashes(sig, bands, rows, cfg.seed)          # (n, bands) uint64
    with np.errstate(over="ignore"):
        keyed = bh ^ (np.arange(bands, dtype=U64)[None, :] * H._GOLDEN) ^ _MINHASH_SALT
    return _mix_to_int63(keyed.reshape(-1)).reshape(-1, bands)


def make_minhash_explode(cfg: DedupConfig):
    """Batch-level explode fn (fusable into the shuffle's split tasks
    via partition_apply(pre_fn=...))."""
    bands = cfg.lsh_bands
    min_chars = cfg.min_text_chars

    def explode(t: pa.Table) -> pa.Table:
        band_key = (
            t["band_keys"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        )
        doc_id = np.repeat(t["doc_id"].to_numpy(), bands)
        # docs with no shingles have the all-max sentinel signature:
        # identical for every empty doc; exclude them from keying.
        # min_text_chars (B3 quality gate): sub-threshold docs are
        # passthrough singletons — excluded from every key family.
        n_sh = np.repeat(t["n_shingles"].to_numpy(), bands)
        keep = n_sh > 0
        keep &= np.repeat(_n_chars(t), bands) >= min_chars
        return pa.table(
            {"band_key": pa.array(band_key[keep]), "doc_id": pa.array(doc_id[keep])}
        )

    return explode


def minhash_band_table(signatures: Dataset, cfg: DedupConfig) -> Dataset:
    """Explode each doc into ``lsh_bands`` rows (band_key, doc_id)."""
    return signatures.map_batches(
        make_minhash_explode(cfg), batch_format="pyarrow"
    )


def pigeonhole_band_keys(
    fp: np.ndarray, n_chunks: int, bits: int, salt: np.uint64 = _SIMHASH_SALT
) -> np.ndarray:
    """Pigeonhole chunk keys for Hamming-radius bucketing: split each
    ``bits``-wide fingerprint into n_chunks pieces; two fingerprints
    within Hamming distance n_chunks-1 share at least one exact chunk.
    Returns int63 band keys, length len(fp)*n_chunks (chunk-major —
    concatenated per chunk, matching np.tile of the row columns)."""
    chunk_bits = bits // n_chunks
    keys = []
    for c in range(n_chunks):
        lo = c * chunk_bits
        hi = bits if c == n_chunks - 1 else lo + chunk_bits
        mask = (U64(1) << U64(hi - lo)) - U64(1) if hi - lo < 64 else U64(0xFFFFFFFFFFFFFFFF)
        chunk = (fp >> U64(lo)) & mask
        with np.errstate(over="ignore"):
            keys.append(chunk ^ (U64(c) * H._GOLDEN) ^ salt)
    return _mix_to_int63(np.concatenate(keys))


def make_simhash_explode(cfg: DedupConfig):
    n_chunks = cfg.hamming_radius + 1
    bits = cfg.simhash_bits
    min_chars = cfg.min_text_chars

    def explode(t: pa.Table) -> pa.Table:
        fp = t["simhash"].to_numpy().astype(U64)
        band_key = pigeonhole_band_keys(fp, n_chunks, bits)
        doc_id = np.tile(t["doc_id"].to_numpy(), n_chunks)
        simhash = np.tile(fp, n_chunks)
        n_tok = np.tile(t["n_tokens"].to_numpy(), n_chunks)
        keep = (n_tok > 0) & (np.tile(_n_chars(t), n_chunks) >= min_chars)
        return pa.table(
            {
                "band_key": pa.array(band_key[keep]),
                "doc_id": pa.array(doc_id[keep]),
                "simhash": pa.array(simhash[keep]),
            }
        )

    return explode


def simhash_band_table(signatures: Dataset, cfg: DedupConfig) -> Dataset:
    """SimHash chunk buckets: split the 64-bit fingerprint into
    (hamming_radius+1) chunks — pigeonhole guarantees two fingerprints
    within the radius share at least one exact chunk.  Rows carry the
    full fingerprint so the pair generator can compute Hamming distance
    in-place (no signature join needed — 8 bytes/row).
    """
    return signatures.map_batches(
        make_simhash_explode(cfg), batch_format="pyarrow"
    )


def make_substring_explode(cfg: DedupConfig):
    min_fps = cfg.substring_min_fps
    min_chars = cfg.min_text_chars

    def explode(t: pa.Table) -> pa.Table:
        fps = t["substr_fps"]
        lens = pa.compute.list_value_length(fps).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        flat = fps.combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(U64)
        doc_id = np.repeat(t["doc_id"].to_numpy(), lens)
        n_fps = np.repeat(lens, lens)
        keep = (n_fps >= min_fps) & (np.repeat(_n_chars(t), lens) >= min_chars)
        return pa.table(
            {
                "fp_key": pa.array(_mix_to_int63(flat[keep])),
                "doc_id": pa.array(doc_id[keep]),
                # int32: the doc's fp count rides EVERY exploded row
                # of the engine's largest shuffle payload — half-width
                # here is ~17% of that table's bytes
                "n_fps": pa.array(n_fps[keep].astype(np.int32), pa.int32()),
            }
        )

    return explode


def substring_fp_table(signatures: Dataset, cfg: DedupConfig) -> Dataset:
    """Explode substring fingerprints to (fp_key, doc_id, n_fps) rows.

    n_fps (the doc's total fingerprint count) rides along so the pair
    generator can pick the least-padded hot-group hub without a join
    back to the signature table (the containment DENOMINATOR no
    longer rides the pair partials — see substring_nf_table).
    """
    return signatures.map_batches(
        make_substring_explode(cfg), batch_format="pyarrow"
    )


def substring_nf_table(signatures: Dataset, cfg: DedupConfig) -> Dataset:
    """(doc_id, n_fps) — ONE row per gate-passing doc (vs one per
    exploded fingerprint).  The containment denominators attach to
    merged pairs from this 12 B/doc table via two chained cogroups
    (the minhash verify pattern) instead of riding na/nb on every
    40 B pair partial of the engine's biggest shuffle — the VERDICT
    r3 candidate-branch shuffle-bytes cut.  Gates (min_fps,
    min_chars) mirror make_substring_explode exactly so the row set
    equals the docs that emit fp rows."""
    min_fps = cfg.substring_min_fps
    min_chars = cfg.min_text_chars

    def lens(t: pa.Table) -> pa.Table:
        n = pa.compute.list_value_length(t["substr_fps"]) \
            .to_numpy(zero_copy_only=False)
        n = np.nan_to_num(n).astype(np.int64)
        keep = (n >= min_fps) & (_n_chars(t) >= min_chars)
        return pa.table({
            "doc_id": pa.array(t["doc_id"].to_numpy()[keep]),
            "n_fps": pa.array(n[keep].astype(np.int32), pa.int32()),
        })

    return signatures.map_batches(lens, batch_format="pyarrow")
