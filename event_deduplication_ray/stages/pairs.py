"""Stage 3b — candidate pairs from keyed tables (the blocking self-join).

Reference analog: candidate pair generator B4
(/root/reference/src/event_dedup/matching/candidate_pairs.py:31-76):
invert the blocking index, enumerate unordered pairs per block with
canonical ordering id_a < id_b, dedup globally.  Re-expressed as a
hash-partitioned shuffle with fully vectorized per-partition pandas
(see shuffle.py for why not Ray's groupby.aggregate).

Skew (SURVEY.md §4.2): groups larger than ``max_block_pairs`` are not
enumerated quadratically — they fall back to star pairing against the
group's min doc id (O(g) pairs, connectivity-preserving: every member
still reaches every other through the hub after clustering).  Hot-group
counts are exposed in the pair-stats metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions import hashing as H
from event_deduplication_ray.functions.hashing import hamming_distance_u64
from event_deduplication_ray.stages.shuffle import partition_apply

U64 = np.uint64


def _chain_pairs(groups: pd.DataFrame, key: str) -> pd.DataFrame:
    """Consecutive-by-doc_id pairs within each key group, with the
    same ``<col>_a/<col>_b`` column layout the self-merge produces."""
    h = groups.sort_values([key, "doc_id"], kind="mergesort").reset_index(drop=True)
    keys_np = h[key].to_numpy()
    same = keys_np[:-1] == keys_np[1:]
    idx = np.flatnonzero(same)
    la = h.iloc[idx].reset_index(drop=True)
    lb = h.iloc[idx + 1].reset_index(drop=True)
    payload = [c for c in h.columns if c != key]
    chain = pd.concat(
        [la[payload].add_suffix("_a"), lb[payload].add_suffix("_b")], axis=1
    )
    chain[key] = la[key].to_numpy()
    return chain


def _pairs_from_groups(df: pd.DataFrame, key: str, cap: int) -> pd.DataFrame:
    """Vectorized within-partition pair enumeration.

    all-pairs (via self-merge) for groups of size 2..cap, star-to-min
    for larger groups.  Returns columns id_a, id_b (canonical order)
    plus any extra per-row columns suffixed _a/_b from the self-merge.
    """
    df = df.drop_duplicates([key, "doc_id"])

    def _empty(frame: pd.DataFrame) -> pd.DataFrame:
        # typed empty frame with the SAME renamed columns as the
        # non-empty path — callers index p[["id_a", "id_b"]] directly
        e = frame.iloc[0:0].merge(frame.iloc[0:0], on=key, suffixes=("_a", "_b"))
        return e.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})

    sizes = df.groupby(key)["doc_id"].transform("size")
    multi = df[sizes > 1]
    if len(multi) == 0:
        return _empty(df)
    sizes = sizes[sizes > 1]
    small = multi[sizes <= cap]
    hot = multi[sizes > cap]

    out = []
    if len(small):
        m = small.merge(small, on=key, suffixes=("_a", "_b"))
        out.append(m[m["doc_id_a"] < m["doc_id_b"]])
    if len(hot):
        # star pairing: hub row = the group's min-doc_id ROW (all its
        # payload columns intact), paired with every other member
        idx = hot.groupby(key)["doc_id"].idxmin()
        hubs = hot.loc[idx]
        m2 = hubs.merge(hot, on=key, suffixes=("_a", "_b"))
        out.append(m2[m2["doc_id_a"] < m2["doc_id_b"]])
        # + CHAIN pairing: consecutive members by doc_id.  The star
        # alone disconnects a family when the hub happens to be
        # DISSIMILAR to the members (adversarial hot band: boilerplate
        # key collision where the min-id doc is an outlier — every
        # hub edge fails verification).  Chain edges connect mutually
        # similar members regardless of the hub, at O(g) extra pairs
        # (north-rule skew handling; tested by the adversarial
        # hot-band fixture).
        out.append(_chain_pairs(hot, key))
    if not out:
        return _empty(df)
    res = pd.concat(out, ignore_index=True)
    return res.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})


# ---------------------------------------------------------------------------
# numpy pair-enumeration core (zero-pandas hot path).
#
# The pandas `_pairs_from_groups` path costs one full Arrow→pandas
# copy per partition plus pandas' merge/groupby internals — measured
# on this host, the candidate-gen window spends ~6x more CPU in the
# kernel (page faults from those allocations) than in user code.  The
# numpy core works directly on the partition's zero-copy int64 arrays:
# one lexsort, triangle-index enumeration for small groups, star+chain
# for hot groups — identical pair sets (property-tested against the
# pandas reference implementation).
# ---------------------------------------------------------------------------

_TRI_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _tri(s: int) -> tuple[np.ndarray, np.ndarray]:
    t = _TRI_CACHE.get(s)
    if t is None:
        i, j = np.triu_indices(s, k=1)
        t = (i.astype(np.int64), j.astype(np.int64))
        if len(_TRI_CACHE) < 4096:
            _TRI_CACHE[s] = t
    return t


def _sorted_dedup(k: np.ndarray, d: np.ndarray, extras: list[np.ndarray]):
    """Sort rows by (key, doc_id) and drop (key, doc_id) duplicates.
    One gather per column (the sorted arrays are sliced by the keep
    mask, not re-gathered through indices)."""
    order = np.lexsort((d, k))
    ks, ds = k[order], d[order]
    if len(ks) == 0:
        return ks, ds, [e[order] for e in extras]
    keep = np.empty(len(ks), dtype=bool)
    keep[0] = True
    keep[1:] = (ks[1:] != ks[:-1]) | (ds[1:] != ds[:-1])
    if keep.all():
        return ks, ds, [e[order] for e in extras]
    return ks[keep], ds[keep], [e[order[keep]] for e in extras]


def _group_offsets(ks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted key array → (group starts, group sizes)."""
    n = len(ks)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.r_[starts, n])
    return starts, sizes


def _enumerate_pair_rows(
    starts: np.ndarray, sizes: np.ndarray, cap: int,
    hub_rows_hot: np.ndarray | None = None,
    mode: str = "star_chain",
    ds: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Row-index pairs over (key, doc_id)-sorted rows: all-pairs for
    groups of 2..cap; hot groups (> cap) use ``mode`` — "star_chain"
    (hub star + consecutive chain) or "salted" (doc-hash salt into
    ~cap-sized subgroups; see DedupConfig.hot_pair_mode; requires
    ``ds``, ignores ``hub_rows_hot``).  ``hub_rows_hot`` overrides
    the hub row per hot group (default: group start = min doc_id).
    Returns (a_rows, b_rows); with the default hub both are
    doc_id-ascending within each pair."""
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    small = (sizes >= 2) & (sizes <= cap)
    sstarts, ssizes = starts[small], sizes[small]
    if len(ssizes):
        # batch groups of identical size → one broadcast per size
        order = np.argsort(ssizes, kind="stable")
        ssz, sst = ssizes[order], sstarts[order]
        bounds = np.r_[0, np.flatnonzero(ssz[1:] != ssz[:-1]) + 1, len(ssz)]
        for bi in range(len(bounds) - 1):
            lo, hi = int(bounds[bi]), int(bounds[bi + 1])
            s = int(ssz[lo])
            i, j = _tri(s)
            st = sst[lo:hi]
            a_parts.append((st[:, None] + i[None, :]).ravel())
            b_parts.append((st[:, None] + j[None, :]).ravel())
    hot = sizes > cap
    hstarts, hsizes = starts[hot], sizes[hot]
    if len(hsizes) and mode == "salted":
        if ds is None:
            raise ValueError("salted hot_pair_mode needs the doc array")
        a, b = _salted_pair_rows(hstarts, hsizes, cap, ds)
        a_parts.append(a)
        b_parts.append(b)
    elif len(hsizes):
        tot = int(hsizes.sum())
        pos = np.arange(tot) - np.repeat(np.cumsum(hsizes) - hsizes, hsizes)
        rows = np.repeat(hstarts, hsizes) + pos
        hubs = hub_rows_hot if hub_rows_hot is not None else hstarts
        hub_rows = np.repeat(hubs, hsizes)
        m = rows != hub_rows
        a_parts.append(hub_rows[m])
        b_parts.append(rows[m])
        # chain edges keep a family connected when the hub itself is
        # dissimilar (adversarial hot group)
        m2 = pos > 0
        a_parts.append(rows[m2] - 1)
        b_parts.append(rows[m2])
    if not a_parts:
        z = np.empty(0, np.int64)
        return z, z
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _salted_pair_rows(
    hstarts: np.ndarray, hsizes: np.ndarray, cap: int, ds: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Salted hot-group enumeration (DedupConfig.hot_pair_mode =
    "salted"): each hot group's members are split into
    ceil(g / cap) subgroups by a deterministic splitmix hash of
    doc_id (the "explicit salting of hot band-keys" the north rule
    names), all-pairs enumerated within each subgroup for dense local
    evidence, plus the consecutive-by-doc_id chain across the whole
    group for cross-subgroup connectivity (NOT subgroup-minimum
    representatives: a dissimilar rep would disconnect its subgroup —
    the same failure mode the star_chain chain guards against).
    ~O(g·cap) pairs per group; every returned pair is doc_id-
    ascending (rows are swapped where needed so callers can gather
    payload by row index on either side)."""
    tot = int(hsizes.sum())
    pos = np.arange(tot) - np.repeat(np.cumsum(hsizes) - hsizes, hsizes)
    rows = np.repeat(hstarts, hsizes) + pos
    gidx = np.repeat(np.arange(len(hsizes), dtype=np.int64), hsizes)
    n_sub = np.repeat(-(-hsizes // cap), hsizes)      # ceil(g/cap), per row
    salt = (H._splitmix_array(ds[rows].astype(np.uint64), H._GOLDEN, U64(0))
            % n_sub.astype(np.uint64)).astype(np.int64)
    # order by (group, salt, doc): pos is doc-ascending within a group
    order = np.lexsort((pos, salt, gidx))
    rows_s, g_s, salt_s = rows[order], gidx[order], salt[order]
    comb = g_s * int(n_sub.max() + 1) + salt_s        # unique per subgroup
    sub_starts, sub_sizes = _group_offsets(comb)
    # all-pairs within each subgroup (sizes ~cap; no inner cap so the
    # binomial tail of the hash split can't re-trigger hot handling)
    a_pos, b_pos = _enumerate_pair_rows(sub_starts, sub_sizes,
                                        cap=int(sub_sizes.max()))
    a_parts = [rows_s[a_pos]]
    b_parts = [rows_s[b_pos]]
    # chain: consecutive members by doc_id across the whole group
    m2 = pos > 0
    a_parts.append(rows[m2] - 1)
    b_parts.append(rows[m2])
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    da, db = ds[a], ds[b]
    sw = da > db
    a2 = np.where(sw, b, a)
    b2 = np.where(sw, a, b)
    return a2, b2


def _unique_pairs(ia: np.ndarray, ib: np.ndarray, *extras: np.ndarray):
    """Lexsort-dedup on (id_a, id_b); extras are gathered alongside."""
    order = np.lexsort((ib, ia))
    ia, ib = ia[order], ib[order]
    keep = np.empty(len(ia), dtype=bool)
    if len(ia):
        keep[0] = True
        keep[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
    out_extras = [e[order][keep] for e in extras]
    return ia[keep], ib[keep], out_extras


def minhash_candidate_pairs(
    band_table: Dataset, cfg: DedupConfig, pre_fn=None, out_keys=None
):
    """(band_key, doc_id) → (id_a, id_b) candidate pairs.

    Pairs are deduped within each band partition only; the global
    dedup (a pair found in several bands) happens for free inside the
    verification stage's first cogroup, which partitions by id_a —
    all copies of a pair land in the same partition there (one fewer
    all-to-all than a dedicated distinct pass).

    ``out_keys=["id_a"]`` chains the output pre-split for that cogroup
    (returns Shuffled; no barrier between pair-gen and verify).
    """
    cap = cfg.max_block_pairs
    P = cfg.join_num_partitions
    mode = cfg.hot_pair_mode

    def gen(t: pa.Table) -> pa.Table:
        return minhash_pair_table(t, cap, mode=mode)

    return partition_apply(band_table, ["band_key"], P, gen, pre_fn=pre_fn,
                           out_keys=out_keys, batch_format="pyarrow")


def minhash_pair_table(t: pa.Table, cap: int,
                       mode: str = "star_chain") -> pa.Table:
    """One partition's (band_key, doc_id) rows → deduped (id_a, id_b)."""
    k = t["band_key"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    ks, ds, _ = _sorted_dedup(k, d, [])
    starts, sizes = _group_offsets(ks)
    a, b = _enumerate_pair_rows(starts, sizes, cap, mode=mode, ds=ds)
    # dedup across ALL band keys of this partition (a pair often
    # collides in many bands) — shrinks the shuffle into verify
    ia, ib, _ = _unique_pairs(ds[a], ds[b])
    return pa.table({"id_a": pa.array(ia), "id_b": pa.array(ib)})


def simhash_match_pairs(
    sim_band_table: Dataset, cfg: DedupConfig, pre_fn=None,
    tier: str = "simhash",
) -> Dataset:
    """(band_key, doc_id, simhash) → verified pairs within the Hamming
    radius; no signature join needed (fingerprints ride on the rows).
    Output: id_a, id_b, score (1 - hamming/bits), decision, tier.
    """
    cap = cfg.max_block_pairs
    P = cfg.join_num_partitions
    radius, bits = cfg.hamming_radius, cfg.simhash_bits
    mode = cfg.hot_pair_mode

    def gen(t: pa.Table) -> pa.Table:
        return simhash_pair_table(t, cap, radius, bits, mode=mode)

    # chained: gen's merge tasks emit pre-split by (id_a, id_b) — the
    # dedup wave starts per-partition with no driver barrier
    raw = partition_apply(sim_band_table, ["band_key"], P, gen, pre_fn=pre_fn,
                          out_keys=["id_a", "id_b"], batch_format="pyarrow")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("score", ascending=False).drop_duplicates(["id_a", "id_b"])
        df["decision"] = "match"
        df["tier"] = tier
        return df

    return partition_apply(raw, ["id_a", "id_b"], P, dedup)


def simhash_pair_table(t: pa.Table, cap: int, radius: int, bits: int,
                       mode: str = "star_chain") -> pa.Table:
    """One partition's (band_key, doc_id, simhash) rows →
    Hamming-verified (id_a, id_b, score)."""
    k = t["band_key"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ks, ds, (shs,) = _sorted_dedup(k, d, [sh])
    starts, sizes = _group_offsets(ks)
    a, b = _enumerate_pair_rows(starts, sizes, cap, mode=mode, ds=ds)
    dist = hamming_distance_u64(shs[a], shs[b])
    m = dist <= radius
    a, b = a[m], b[m]
    score = 1.0 - dist[m] / bits
    # same-pair copies from different chunks carry the same
    # fingerprints, hence the same score — dedup order irrelevant
    ia, ib, (score,) = _unique_pairs(ds[a], ds[b], score)
    return pa.table({"id_a": pa.array(ia), "id_b": pa.array(ib),
                     "score": pa.array(score)})


def _nf_of(ids: np.ndarray, r: pa.Table) -> np.ndarray:
    """Searchsorted lookup of per-doc fingerprint counts from a
    co-partitioned (doc_id, n_fps) nf block; -1 for absent docs.  An
    all-empty shuffle partition arrives column-less — guarded."""
    if "doc_id" not in r.column_names or len(r) == 0:
        return np.full(len(ids), -1, dtype=np.int64)
    did = r["doc_id"].to_numpy(zero_copy_only=False)
    nf = r["n_fps"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(did, kind="stable")
    did, nf = did[o], nf[o]
    pos = np.minimum(np.searchsorted(did, ids), len(did) - 1)
    return np.where(did[pos] == ids, nf[pos], -1)


def substring_match_pairs(
    fp_table: Dataset, cfg: DedupConfig, pre_fn=None,
    emit_below: float | None = None,
    nf_table: "Dataset | None" = None,
) -> Dataset:
    """(fp_key, doc_id, n_fps) → containment-verified pairs.

    Within each fp group, enumerate pairs; count shared fingerprints
    per pair; keep pairs with shared/min(n_fps_a, n_fps_b) >= the
    containment threshold.  ``emit_below`` (opt-in, default off —
    the dedup path never pays for it) ALSO emits pairs scoring in
    [emit_below, threshold) with decision 'no_match': the mined
    hard negatives q162 trains a matcher on (docs that share real
    substrings yet are not duplicates).

    Shuffle shape (VERDICT r3 bytes cut): the pair PARTIALS carry
    only (id_a, id_b, shared:int32) — 20 B/row instead of the former
    40 B with na/nb riding every row of the engine's biggest table.
    After the (id_a, id_b) merge the containment denominators attach
    from ``nf_table`` (doc_id → n_fps, 12 B/doc — see
    banding.substring_nf_table) via two chained cogroups keyed id_a
    then id_b, exactly the minhash-verify signature-attach pattern.
    ``nf_table`` is REQUIRED unless ``fp_table`` is a signatures
    dataset (has substr_fps) — then it is derived internally.
    Scores, decisions and hub selection are bit-identical to the
    former na/nb-riding shape (equivalence-tested).

    Skew: fp groups larger than ``max_block_pairs`` (hot templates)
    use star pairing against a hub — the member with the FEWEST total
    fingerprints (deterministic (n_fps, doc_id) tie-break).  The
    least-padded member is the most-contained one (base or exact dup
    in a duplicate family), so hub-pair containment stays near 1.0 and
    the star keeps the family connected at O(g) pairs per group.
    Groups larger than ``substring_drop_group`` are dropped outright
    (true boilerplate carries no containment signal).
    Output: id_a, id_b, score (containment), decision, tier.
    """
    from event_deduplication_ray.stages.shuffle import (
        cogroup_apply,
        shuffle_to,
    )

    cap = cfg.substring_small_cap
    drop_cap = cfg.substring_drop_group
    P = cfg.join_num_partitions
    thresh = cfg.substring_containment
    mode = cfg.hot_pair_mode

    if nf_table is None:
        if "substr_fps" in fp_table.schema().names:
            from event_deduplication_ray.stages.banding import (
                substring_nf_table,
            )

            nf_table = substring_nf_table(fp_table, cfg)
        else:
            # already-exploded input: every row carries the doc's
            # TOTAL n_fps, so per-batch distinct (doc_id, n_fps) IS
            # the nf table (duplicate rows across batches carry the
            # same value — harmless for the searchsorted attach)
            def batch_nf(t: pa.Table) -> pa.Table:
                d = t["doc_id"].to_numpy(zero_copy_only=False)
                nf = t["n_fps"].to_numpy(zero_copy_only=False)
                o = np.argsort(d, kind="stable")
                d = d[o]
                keep = np.empty(len(d), dtype=bool)
                if len(d):
                    keep[0] = True
                    keep[1:] = d[1:] != d[:-1]
                return pa.table({
                    "doc_id": pa.array(d[keep]),
                    "n_fps": pa.array(nf[o][keep].astype(np.int32),
                                      pa.int32()),
                })

            nf_table = fp_table.map_batches(batch_nf,
                                            batch_format="pyarrow")

    def gen(t: pa.Table) -> pa.Table:
        return substring_shared_table(t, cap, drop_cap, mode=mode)

    # keyed by id_a ONLY: that already co-locates every partial of a
    # pair (same id_a → same partition), so the partial merge fuses
    # into the na attach — 3 waves total (gen → merge+attach_a →
    # attach_b) instead of 4
    shared_rows = partition_apply(fp_table, ["fp_key"], P, gen, pre_fn=pre_fn,
                                  out_keys=["id_a"],
                                  batch_format="pyarrow")

    nf_by_id = shuffle_to(nf_table, ["doc_id"], P)

    def merge_attach_a(l: pa.Table, r: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "shared": pa.array([], pa.int64()),
            "na": pa.array([], pa.int64()),
        })
        if len(l) == 0 or "id_a" not in l.column_names:
            return empty
        ia = l["id_a"].to_numpy(zero_copy_only=False)
        ib = l["id_b"].to_numpy(zero_copy_only=False)
        sh = l["shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ib, ia))
        ia, ib, sh = ia[order], ib[order], sh[order]
        run = np.empty(len(ia), dtype=bool)
        run[0] = True
        run[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
        rstart = np.flatnonzero(run)
        ia, ib = ia[rstart], ib[rstart]
        return pa.table({
            "id_a": pa.array(ia), "id_b": pa.array(ib),
            "shared": pa.array(np.add.reduceat(sh, rstart)),
            "na": pa.array(_nf_of(ia, r)),
        })

    with_a = cogroup_apply(shared_rows, nf_by_id, ["id_a"], ["doc_id"], P,
                           merge_attach_a, batch_format="pyarrow",
                           out_keys=["id_b"], out_parts=P)

    def attach_b(l: pa.Table, r: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "decision": pa.array([], pa.string()),
            "tier": pa.array([], pa.string()),
        })
        if len(l) == 0:
            return empty
        nb = _nf_of(l["id_b"].to_numpy(zero_copy_only=False), r)
        na = l["na"].to_numpy(zero_copy_only=False)
        sh = l["shared"].to_numpy(zero_copy_only=False)
        ok = (na > 0) & (nb > 0)          # gate-passing docs only
        score = np.zeros(len(sh), dtype=np.float64)
        np.divide(sh, np.minimum(na, nb), out=score, where=ok)
        m = ok & (score >= thresh)
        if emit_below is not None:
            m = ok & (score >= emit_below)
        dec = np.where(score >= thresh, "match", "no_match")
        return pa.table({
            "id_a": pa.array(l["id_a"].to_numpy(zero_copy_only=False)[m]),
            "id_b": pa.array(l["id_b"].to_numpy(zero_copy_only=False)[m]),
            "score": pa.array(score[m]),
            "decision": pa.array(dec[m].astype(object), pa.string()),
            "tier": pa.array(np.full(int(m.sum()), "substring"), pa.string()),
        })

    return cogroup_apply(with_a, nf_by_id, ["id_b"], ["doc_id"], P,
                         attach_b, batch_format="pyarrow")


def substring_shared_table(t: pa.Table, cap: int, drop_cap: int,
                           mode: str = "star_chain") -> pa.Table:
    """One partition's (fp_key, doc_id, n_fps) rows → partial
    per-pair shared-fingerprint counts (id_a, id_b, shared:int32).

    All rows of one fp group are in this partition; a pair spanning
    several fp groups in OTHER partitions is summed in the merge
    stage.  n_fps is read here ONLY for hot-group hub selection —
    the containment denominators attach later from the per-doc nf
    table, so they no longer ride every partial row.
    """
    empty = pa.table({
        "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
        "shared": pa.array([], pa.int32()),
    })
    k = t["fp_key"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    nf = t["n_fps"].to_numpy(zero_copy_only=False).astype(np.int64)
    ks, ds, (nfs,) = _sorted_dedup(k, d, [nf])
    starts, sizes = _group_offsets(ks)
    # boilerplate guard: groups above drop_cap carry no containment
    # signal and are dropped outright
    ok = (sizes >= 2) & (sizes <= drop_cap)
    starts2, sizes2 = starts[ok], sizes[ok]
    if len(sizes2) == 0:
        return empty
    hub = None
    hot_mask = sizes2 > cap
    if hot_mask.any() and mode != "salted":
        # hub = min (n_fps, doc_id) row per group: least-padded, hence
        # most-contained member — its containment vs every member is
        # ~1.0 for true duplicate families.  Lexsort only the HOT
        # groups' rows (one hot group must not force a 3-key sort of
        # the whole partition).
        hstarts, hsizes = starts2[hot_mask], sizes2[hot_mask]
        tot = int(hsizes.sum())
        rows = (np.repeat(hstarts, hsizes)
                + np.arange(tot)
                - np.repeat(np.cumsum(hsizes) - hsizes, hsizes))
        order2 = np.lexsort((ds[rows], nfs[rows], ks[rows]))
        ks2 = ks[rows][order2]
        first = np.empty(len(ks2), dtype=bool)
        first[0] = True
        first[1:] = ks2[1:] != ks2[:-1]
        hub = rows[order2[first]]         # one per hot group, group order
    a, b = _enumerate_pair_rows(starts2, sizes2, cap, hub_rows_hot=hub,
                                mode=mode, ds=ds)
    if len(a) == 0:
        return empty
    ia, ib = ds[a].copy(), ds[b].copy()
    sw = ia > ib                          # custom hub can break ordering
    tmp = ia[sw]; ia[sw] = ib[sw]; ib[sw] = tmp
    # per-(group, pair) dedup (star + chain can emit the same pair
    # within one group — it must count ONCE toward 'shared'), then
    # partial shared-count per pair across this partition's groups
    ga = np.searchsorted(starts2, a, side="right") - 1
    order = np.lexsort((ib, ia, ga))
    ga_s = ga[order]
    ia, ib = ia[order], ib[order]
    keep = np.empty(len(ia), dtype=bool)
    keep[0] = True
    keep[1:] = (ga_s[1:] != ga_s[:-1]) | (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
    ia, ib = ia[keep], ib[keep]
    # count runs of (ia, ib): re-sort by (ia, ib) for run-length count
    order = np.lexsort((ib, ia))
    ia, ib = ia[order], ib[order]
    run = np.empty(len(ia), dtype=bool)
    run[0] = True
    run[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
    rstart = np.flatnonzero(run)
    shared = np.diff(np.r_[rstart, len(ia)])
    return pa.table({
        "id_a": pa.array(ia[rstart]), "id_b": pa.array(ib[rstart]),
        # int32: per-partition shared counts are bounded by a doc's
        # per-partition fp count; summed in int64 at the merge
        "shared": pa.array(shared.astype(np.int32), pa.int32()),
    })


def ngram_jaccard_match_pairs(
    fp_table: Dataset, cfg: DedupConfig, threshold: float, pre_fn=None,
    mode: str = "jaccard", nf_table: Dataset | None = None,
) -> Dataset:
    """EXACT n-gram-Jaccard pairs via a shingle inverted-index join.

    Input is the substring fp table built with ``substring_mod_p=1``
    (every distinct shingle hash, no sampling): two docs share a row
    group iff they share a shingle, so enumerating pairs per fp group
    and summing shared counts yields the EXACT shingle-set
    intersection — Jaccard = shared / (|A| + |B| - shared) with zero
    estimation error and zero candidate misses (any pair with J > 0
    shares >= 1 shingle).  Deterministic → DuckDB-oracle-checkable.

    Scale note: this is the exact mode — fp groups are enumerated
    all-pairs (no hub-star cap), so a shingle shared by g docs costs
    O(g^2) rows.  ``substring_drop_group`` still guards true
    boilerplate explosions; production near-dup at 100 TB should use
    the MinHash pass (estimation) or the containment pass (sampling),
    both of which cap skew.
    Output: id_a, id_b, score (exact Jaccard), decision, tier='ngram'.

    Shuffle shape (VERDICT r4 carry-forward, mirrors the substring
    tier's r3 cut): pair PARTIALS carry only (id_a, id_b,
    shared:int32) — 20 B/row instead of 40 B with na/nb riding the
    exact mode's biggest table (O(g^2) rows per shingle group).  The
    Jaccard/containment denominators attach AFTER the merge from the
    per-doc (doc_id, n_fps) nf table (12 B/doc) via two chained
    cogroups keyed id_a then id_b; keying the partial shuffle by
    id_a only fuses the partial merge into the na attach — 3 waves.
    Scores / decisions bit-identical to the former na/nb-riding
    shape (same int64 sums, same float division order).
    """
    from event_deduplication_ray.stages.shuffle import (
        cogroup_apply,
        shuffle_to,
    )

    P = cfg.join_num_partitions
    drop_cap = cfg.substring_drop_group

    if nf_table is None:
        # exploded input: every row carries the doc's TOTAL n_fps, so
        # per-batch distinct (doc_id, n_fps) IS the nf table
        # (duplicate rows across batches carry the same value —
        # harmless for the searchsorted attach)
        def batch_nf(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            nf = t["n_fps"].to_numpy(zero_copy_only=False)
            o = np.argsort(d, kind="stable")
            d = d[o]
            keep = np.empty(len(d), dtype=bool)
            if len(d):
                keep[0] = True
                keep[1:] = d[1:] != d[:-1]
            return pa.table({
                "doc_id": pa.array(d[keep]),
                "n_fps": pa.array(nf[o][keep].astype(np.int32),
                                  pa.int32()),
            })

        nf_table = fp_table.map_batches(batch_nf, batch_format="pyarrow")

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "shared": pd.Series(dtype="int32")}
        )
        if len(df) == 0:
            return empty
        df = df.drop_duplicates(["fp_key", "doc_id"])
        sizes = df.groupby("fp_key")["doc_id"].transform("size")
        df = df[(sizes > 1) & (sizes <= drop_cap)]
        if len(df) == 0:
            return empty
        m = df.merge(df, on="fp_key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if len(m) == 0:
            return empty
        m = m.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})
        g = m.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("fp_key", "size"))
        # int32: per-partition shared counts bounded by the doc's
        # per-partition fp count; summed in int64 at the merge
        g["shared"] = g["shared"].astype("int32")
        return g

    # keyed by id_a ONLY: partials of one pair co-locate, so the
    # partial merge fuses into the na attach
    shared_rows = partition_apply(fp_table, ["fp_key"], P, gen, pre_fn=pre_fn,
                                  out_keys=["id_a"])

    nf_by_id = shuffle_to(nf_table, ["doc_id"], P)

    def merge_attach_a(l: pa.Table, r: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "shared": pa.array([], pa.int64()),
            "na": pa.array([], pa.int64()),
        })
        if len(l) == 0 or "id_a" not in l.column_names:
            return empty
        ia = l["id_a"].to_numpy(zero_copy_only=False)
        ib = l["id_b"].to_numpy(zero_copy_only=False)
        sh = l["shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ib, ia))
        ia, ib, sh = ia[order], ib[order], sh[order]
        run = np.empty(len(ia), dtype=bool)
        run[0] = True
        run[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
        rstart = np.flatnonzero(run)
        ia, ib = ia[rstart], ib[rstart]
        return pa.table({
            "id_a": pa.array(ia), "id_b": pa.array(ib),
            "shared": pa.array(np.add.reduceat(sh, rstart)),
            "na": pa.array(_nf_of(ia, r)),
        })

    with_a = cogroup_apply(shared_rows, nf_by_id, ["id_a"], ["doc_id"], P,
                           merge_attach_a, batch_format="pyarrow",
                           out_keys=["id_b"], out_parts=P)

    def attach_b_score(l: pa.Table, r: pa.Table) -> pa.Table:
        if mode == "containment_directed":
            empty = pa.table({
                "inner_id": pa.array([], pa.int64()),
                "outer_id": pa.array([], pa.int64()),
                "cont_ppm": pa.array([], pa.int64()),
            })
        else:
            empty = pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "decision": pa.array([], pa.string()),
                "tier": pa.array([], pa.string()),
            })
        if len(l) == 0 or "id_a" not in l.column_names:
            return empty
        ia = l["id_a"].to_numpy(zero_copy_only=False)
        ib = l["id_b"].to_numpy(zero_copy_only=False)
        sh = l["shared"].to_numpy(zero_copy_only=False)
        na = l["na"].to_numpy(zero_copy_only=False)
        nb = _nf_of(ib, r)
        if mode == "containment_directed":
            # directed exact containment: the INNER doc (fewer distinct
            # shingles; doc_id breaks ties) is contained in the OUTER
            # one.  Exact-integer ppm + cross-multiplied threshold so
            # the boundary is float-free (oracle-parity convention).
            n_min = np.minimum(na, nb)
            thr_ppm = int(round(threshold * 1_000_000))
            keep = sh * 1_000_000 >= thr_ppm * n_min
            a_inner = (na < nb) | ((na == nb) & (ia < ib))
            return pa.table({
                "inner_id": pa.array(np.where(a_inner, ia, ib)[keep]),
                "outer_id": pa.array(np.where(a_inner, ib, ia)[keep]),
                "cont_ppm": pa.array((sh * 1_000_000 // n_min)[keep]),
            })
        if mode == "containment":
            # exact containment: shared / min(|A|, |B|) — the
            # substring-tier decision rule with zero sampling error
            score = sh / np.minimum(na, nb)
        else:
            score = sh / (na + nb - sh)
        m = score >= threshold
        tier = "ngram" if mode == "jaccard" else "containment"
        return pa.table({
            "id_a": pa.array(ia[m]), "id_b": pa.array(ib[m]),
            "score": pa.array(score[m].astype(np.float64)),
            "decision": pa.array(np.full(int(m.sum()), "match"), pa.string()),
            "tier": pa.array(np.full(int(m.sum()), tier), pa.string()),
        })

    return cogroup_apply(with_a, nf_by_id, ["id_b"], ["doc_id"], P,
                         attach_b_score, batch_format="pyarrow")
