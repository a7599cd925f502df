"""Stage 4 — pairwise verification: exact Jaccard over MinHash
signatures + three-way threshold decision.

Reference analogs: title scorer P3 → exact signature Jaccard, combiner
P6/P7 threshold decision (match / ambiguous / no_match,
/root/reference/src/event_dedup/matching/combiner.py:52-84) and the
pair scoring driver P8 (matching/pipeline.py:98-161).  The ``tier``
column concept (deterministic vs other resolution tiers,
matching/pipeline.py:48) is kept: minhash / simhash / substring.

Signatures reach the pairs via two hash-partitioned cogroups (pairs ⋈
signatures on id_a, then on id_b with the Jaccard computed in-place and
signatures dropped immediately) — the small pair table is shuffled, the
wide signature table streams through exactly twice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.shuffle import Shuffled, cogroup_apply, shuffle_to


def _sig_matrix(col: pd.Series) -> np.ndarray:
    """object column of uint64 arrays → (n, P) uint64 matrix."""
    return np.vstack(col.to_numpy()).astype(np.uint64)


def decide(
    scores: np.ndarray, cfg: DedupConfig, match_thresh: np.ndarray | None = None
) -> np.ndarray:
    """Three-way threshold decision (reference combiner.py:52-84).

    ``match_thresh`` (optional, per-row) carries resolved per-lang
    match thresholds (P5 overrides); no_match stays global so the
    ambiguous band only moves at its top edge.
    """
    thresh = cfg.jaccard_match if match_thresh is None else match_thresh
    out = np.full(len(scores), "ambiguous", dtype=object)
    out[scores >= thresh] = "match"
    out[scores <= cfg.jaccard_no_match] = "no_match"
    return out


def resolve_match_thresholds(
    lang_a: np.ndarray, lang_b: np.ndarray, cfg: DedupConfig
) -> np.ndarray:
    """Per-pair jaccard_match from lang overrides (reference P5,
    matching/config.py:128-132: per-category override + priority list).

    Same lang on both sides → that lang's override (if any); langs
    differ → the first lang in cfg.lang_priority carrying an override
    wins; otherwise the global cfg.jaccard_match.
    """
    ov = dict(cfg.lang_match_overrides)
    pri = {l: i for i, l in enumerate(cfg.lang_priority)}
    sa = pd.Series(lang_a, dtype=object)
    sb = pd.Series(lang_b, dtype=object)
    ta, tb = sa.map(ov), sb.map(ov)
    thr = np.full(len(sa), cfg.jaccard_match, dtype=np.float64)
    same = (sa == sb).to_numpy()
    m = same & ta.notna().to_numpy()
    thr[m] = ta.to_numpy(dtype=np.float64, na_value=np.nan)[m]
    diff = ~same
    # Cross-lang: the first lang in lang_priority that CARRIES an
    # override wins (cascade) — rank by priority among override
    # carriers, so an override on the lower-priority side still
    # applies when the higher-priority lang has none.  A lang outside
    # lang_priority never wins cross-lang (rank +inf).
    ra = sa.map(pri).to_numpy(dtype=np.float64, na_value=np.inf)
    rb = sb.map(pri).to_numpy(dtype=np.float64, na_value=np.inf)
    elig_a = ta.notna().to_numpy() & np.isfinite(ra)
    elig_b = tb.notna().to_numpy() & np.isfinite(rb)
    use_a = diff & elig_a & (~elig_b | (ra <= rb))
    use_b = diff & elig_b & ~use_a
    thr[use_a] = ta.to_numpy(dtype=np.float64, na_value=np.nan)[use_a]
    thr[use_b] = tb.to_numpy(dtype=np.float64, na_value=np.nan)[use_b]
    return thr


def _fsl_matrix(col, width: int) -> np.ndarray:
    """fixed_size_list / list<uint64> Arrow column → (n, width) uint64,
    zero-copy where possible."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), width)


def _gather_idx(
    pair_ids: np.ndarray, sig_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Return (mask_found, row indices into the sig table per pair id)."""
    order = np.argsort(sig_ids, kind="stable")
    sorted_ids = sig_ids[order]
    pos = np.searchsorted(sorted_ids, pair_ids)
    pos_clip = np.minimum(pos, len(sorted_ids) - 1) if len(sorted_ids) else pos
    found = len(sorted_ids) > 0
    mask = (
        (sorted_ids[pos_clip] == pair_ids) if found else np.zeros(len(pair_ids), bool)
    )
    idx = order[pos_clip[mask]] if found else np.empty(0, np.int64)
    return mask, idx


def _gather_sigs(
    pair_ids: np.ndarray, sig_ids: np.ndarray, sig_mat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Return (mask_found, rows of sig_mat for each pair id)."""
    mask, idx = _gather_idx(pair_ids, sig_ids)
    return mask, sig_mat[idx]


def folded_sigs_by_id(signatures: Dataset, cfg: DedupConfig) -> Shuffled:
    """Folded (uint8) signature table shuffled ONCE by doc_id — reuse
    this handle for both verify cogroups (and any other consumer
    keyed on doc_id): one split wave instead of one per consumer.
    The fold runs INSIDE the split tasks (pre_fn) so no intermediate
    folded table ever materializes."""
    width = cfg.num_perms

    carry_lang = bool(cfg.lang_match_overrides)

    def to_folded(t: pa.Table) -> pa.Table:
        if "sig8" not in t.column_names:
            return t
        col = t["sig8"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        # fixed-size list → variable-length list (a fixed-size-list
        # null pad in the pair join allocates the full child array;
        # see the representation note in verify_pairs)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offsets = pa.array(np.arange(0, (n + 1) * width, width, dtype=np.int32))
        var = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.uint8()))
        cols = {"doc_id": t["doc_id"], "sig8": var}
        if carry_lang and "lang" in t.column_names:
            cols["lang"] = t["lang"]
        return pa.table(cols)

    # no select_columns: the pre_fn projects inside the split task, so
    # passing the materialized table avoids a separate projection wave
    # (blocks are read zero-copy from the local object store)
    return shuffle_to(signatures, ["doc_id"], cfg.join_num_partitions,
                      pre_fn=to_folded)


def verify_pairs(
    pairs, signatures: Dataset | None, cfg: DedupConfig,
    sigs_by_id: Shuffled | None = None,
) -> Dataset:
    """(id_a, id_b) + signatures → (id_a, id_b, score, decision, tier).

    Pure-Arrow cogroups: signature columns never round-trip through
    pandas objects — the per-partition join is a numpy
    searchsorted-gather over the zero-copy (n, P) signature matrix.
    Pairs whose doc ids are missing from the signature table (filtered
    upstream) are dropped.

    ``pairs`` may be a Dataset or a Shuffled pre-partitioned by id_a
    (chained from the candidate generator — no barrier); pass
    ``sigs_by_id`` (from folded_sigs_by_id) to reuse one signature
    split wave across both cogroups.
    """
    P = cfg.join_num_partitions
    width = cfg.num_perms
    # Join representation: (1) variable-length lists — padding pair
    # rows with typed nulls of a FIXED-size list type allocates a full
    # child array (measured 1.5 GB for 1.5M pad rows vs 6 MB); and
    # (2) signatures FOLDED to the low byte of each slot (uint8).
    # Slot equality implies byte equality, an unequal slot collides
    # w.p. 1/256, so the score bias is +(1-J)/256 <= 0.004 — far
    # inside the decision margins — while the shuffle moves 8x fewer
    # signature bytes (memory traffic bounds scaling here).
    if sigs_by_id is None:
        sigs_by_id = folded_sigs_by_id(signatures, cfg)

    use_lang = bool(cfg.lang_match_overrides)
    empty_a_cols = {
        "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
        "sig8": pa.array([], pa.list_(pa.uint8())),
    }
    if use_lang:
        empty_a_cols["lang_a"] = pa.array([], pa.string())
    empty_a = pa.table(empty_a_cols)

    def attach_a(l: pa.Table, r: pa.Table) -> pa.Table:
        if len(l) == 0 or len(r) == 0:
            return empty_a
        # global pair dedup happens here: this cogroup partitions by
        # id_a, so every copy of (id_a, id_b) from different bands is
        # in this partition (see minhash_candidate_pairs)
        uniq = np.unique(
            np.stack([l["id_a"].to_numpy(), l["id_b"].to_numpy()], axis=1), axis=0
        )
        ia, ib = uniq[:, 0], uniq[:, 1]
        mask, idx = _gather_idx(ia, r["doc_id"].to_numpy())
        sig_rows = _fsl_matrix(r["sig8"], width)[idx]
        n = int(mask.sum())
        offsets = pa.array(np.arange(0, (n + 1) * width, width, dtype=np.int32))
        cols = {
            "id_a": pa.array(ia[mask]), "id_b": pa.array(ib[mask]),
            "sig8": pa.ListArray.from_arrays(
                offsets, pa.array(sig_rows.reshape(-1), pa.uint8())
            ),
        }
        if use_lang:
            if "lang" not in r.column_names:
                raise ValueError(
                    "lang_match_overrides requires a 'lang' column in the "
                    "signature table (pass it via signature_stage passthrough)"
                )
            lang_col = (r["lang"].combine_chunks()
                        if isinstance(r["lang"], pa.ChunkedArray) else r["lang"])
            cols["lang_a"] = lang_col.take(pa.array(idx, pa.int64()))
        return pa.table(cols)

    # output chained pre-split by id_b: the second cogroup starts as
    # soon as each partition's attach_a task finishes — no barrier
    with_a = cogroup_apply(pairs, sigs_by_id, ["id_a"], ["doc_id"], P, attach_a,
                           batch_format="pyarrow", out_keys=["id_b"])

    empty_out = pa.table({
        "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
        "decision": pa.array([], pa.string()), "tier": pa.array([], pa.string()),
    })

    def attach_b_and_score(l: pa.Table, r: pa.Table) -> pa.Table:
        if len(l) == 0 or len(r) == 0:
            return empty_out
        ib = l["id_b"].to_numpy()
        mask, idx = _gather_idx(ib, r["doc_id"].to_numpy())
        sig_b = _fsl_matrix(r["sig8"], width)[idx]
        kept = l.filter(pa.array(mask))
        sig_a = _fsl_matrix(kept["sig8"], width)
        score = (sig_a == sig_b).mean(axis=1)
        thr = None
        if use_lang:
            lang_col = (r["lang"].combine_chunks()
                        if isinstance(r["lang"], pa.ChunkedArray) else r["lang"])
            lang_b = lang_col.take(pa.array(idx, pa.int64())).to_numpy(
                zero_copy_only=False)
            lang_a = kept["lang_a"].to_numpy(zero_copy_only=False)
            thr = resolve_match_thresholds(lang_a, lang_b, cfg)
        return pa.table({
            "id_a": kept["id_a"], "id_b": kept["id_b"],
            "score": pa.array(score),
            "decision": pa.array(decide(score, cfg, thr).astype(str)),
            "tier": pa.array(np.full(len(score), "minhash"), pa.string()),
        })

    return cogroup_apply(with_a, sigs_by_id, ["id_b"], ["doc_id"], P,
                         attach_b_and_score, batch_format="pyarrow")


def match_edges(verified: Dataset, cfg: DedupConfig) -> Dataset:
    """decision=='match' (optionally + ambiguous) → edge list.

    Reference analog: match-pair extractor P9
    (matching/pipeline.py:164-175).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = {"match"} | ({"ambiguous"} if cfg.ambiguous_is_match else set())

    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["decision"], value_set=pa.array(sorted(keep)))
        return t.filter(mask).select(["id_a", "id_b", "score", "tier"])

    return verified.map_batches(f, batch_format="pyarrow")
