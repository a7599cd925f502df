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

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions.hashing import hamming_distance_u64
from event_deduplication_ray.stages.shuffle import partition_apply


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

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_from_groups(df, "band_key", cap)
        # dedup across ALL band keys of this partition (a pair often
        # collides in many bands) — shrinks the shuffle into verify
        return p[["id_a", "id_b"]].drop_duplicates()

    return partition_apply(band_table, ["band_key"], P, gen, pre_fn=pre_fn,
                           out_keys=out_keys)


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

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_from_groups(df, "band_key", cap)
        if len(p) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
        d = hamming_distance_u64(
            p["simhash_a"].to_numpy().astype(np.uint64),
            p["simhash_b"].to_numpy().astype(np.uint64),
        )
        p = p.assign(score=1.0 - d / bits)[d <= radius]
        return p[["id_a", "id_b", "score"]].drop_duplicates(["id_a", "id_b"])

    # chained: gen's merge tasks emit pre-split by (id_a, id_b) — the
    # dedup wave starts per-partition with no driver barrier
    raw = partition_apply(sim_band_table, ["band_key"], P, gen, pre_fn=pre_fn,
                          out_keys=["id_a", "id_b"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("score", ascending=False).drop_duplicates(["id_a", "id_b"])
        df["decision"] = "match"
        df["tier"] = tier
        return df

    return partition_apply(raw, ["id_a", "id_b"], P, dedup)


def substring_match_pairs(
    fp_table: Dataset, cfg: DedupConfig, pre_fn=None
) -> Dataset:
    """(fp_key, doc_id, n_fps) → containment-verified pairs.

    Within each fp group, enumerate pairs; count shared fingerprints
    per pair; keep pairs with shared/min(n_fps_a, n_fps_b) >= the
    containment threshold.

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
    cap = cfg.substring_small_cap
    drop_cap = cfg.substring_drop_group
    P = cfg.join_num_partitions
    thresh = cfg.substring_containment

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["fp_key", "doc_id"])
        sizes = df.groupby("fp_key")["doc_id"].transform("size")
        df = df[(sizes > 1) & (sizes <= drop_cap)]
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "shared": pd.Series(dtype="int64"),
             "na": pd.Series(dtype="int64"), "nb": pd.Series(dtype="int64")}
        )
        if len(df) == 0:
            return empty
        sizes = sizes[sizes.index.isin(df.index)]
        small = df[sizes <= cap]
        hot = df[sizes > cap]
        outs = []
        if len(small):
            m = small.merge(small, on="fp_key", suffixes=("_a", "_b"))
            outs.append(m[m["doc_id_a"] < m["doc_id_b"]])
        if len(hot):
            # hub = min (n_fps, doc_id) row per group: least-padded,
            # hence most-contained member — its containment vs every
            # member is ~1.0 for true duplicate families
            h = hot.sort_values(["fp_key", "n_fps", "doc_id"])
            hubs = h.groupby("fp_key", sort=False).head(1)
            m2 = hubs.merge(hot, on="fp_key", suffixes=("_a", "_b"))
            m2 = m2[m2["doc_id_a"] != m2["doc_id_b"]]
            swap = m2["doc_id_a"] > m2["doc_id_b"]
            for col in ("doc_id", "n_fps"):
                a, b = f"{col}_a", f"{col}_b"
                m2.loc[swap, [a, b]] = m2.loc[swap, [b, a]].to_numpy()
            outs.append(m2)
            # chain fallback for a non-contained hub (see _chain_pairs)
            outs.append(_chain_pairs(hot, "fp_key"))
        if not outs:
            return empty
        res = pd.concat(outs, ignore_index=True)
        res = res.drop_duplicates(["fp_key", "doc_id_a", "doc_id_b"])
        res = res.rename(
            columns={"doc_id_a": "id_a", "doc_id_b": "id_b",
                     "n_fps_a": "na", "n_fps_b": "nb"}
        )
        # partial shared-count per pair within this partition (all
        # rows of one fp group are here; a pair spanning several fp
        # groups in other partitions is summed in the agg stage)
        return res.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("na", "size"), na=("na", "first"), nb=("nb", "first")
        )

    shared_rows = partition_apply(fp_table, ["fp_key"], P, gen, pre_fn=pre_fn,
                                  out_keys=["id_a", "id_b"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["id_a", "id_b"], as_index=False)
            .agg(shared=("shared", "sum"), na=("na", "first"), nb=("nb", "first"))
        )
        g["score"] = g["shared"] / np.minimum(g["na"], g["nb"])
        g = g[g["score"] >= thresh]
        g["decision"] = "match"
        g["tier"] = "substring"
        return g[["id_a", "id_b", "score", "decision", "tier"]]

    return partition_apply(shared_rows, ["id_a", "id_b"], P, agg)


def ngram_jaccard_match_pairs(
    fp_table: Dataset, cfg: DedupConfig, threshold: float, pre_fn=None,
    mode: str = "jaccard",
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
    """
    P = cfg.join_num_partitions
    drop_cap = cfg.substring_drop_group

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "shared": pd.Series(dtype="int64"),
             "na": pd.Series(dtype="int64"), "nb": pd.Series(dtype="int64")}
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
        m = m.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b",
                              "n_fps_a": "na", "n_fps_b": "nb"})
        return m.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("na", "size"), na=("na", "first"), nb=("nb", "first")
        )

    shared_rows = partition_apply(fp_table, ["fp_key"], P, gen, pre_fn=pre_fn,
                                  out_keys=["id_a", "id_b"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64"),
                 "decision": pd.Series(dtype="object"),
                 "tier": pd.Series(dtype="object")}
            )
        g = (
            df.groupby(["id_a", "id_b"], as_index=False)
            .agg(shared=("shared", "sum"), na=("na", "first"), nb=("nb", "first"))
        )
        if mode == "containment":
            # exact containment: shared / min(|A|, |B|) — the
            # substring-tier decision rule with zero sampling error
            g["score"] = g["shared"] / np.minimum(g["na"], g["nb"])
        else:
            g["score"] = g["shared"] / (g["na"] + g["nb"] - g["shared"])
        g = g[g["score"] >= threshold].copy()
        g["decision"] = "match"
        g["tier"] = "ngram" if mode == "jaccard" else "containment"
        return g[["id_a", "id_b", "score", "decision", "tier"]]

    return partition_apply(shared_rows, ["id_a", "id_b"], P, agg)
