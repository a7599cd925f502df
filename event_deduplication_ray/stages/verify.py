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

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.shuffle import cogroup_apply


def _sig_matrix(col: pd.Series) -> np.ndarray:
    """object column of uint64 arrays → (n, P) uint64 matrix."""
    return np.vstack(col.to_numpy()).astype(np.uint64)


def decide(scores: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """Three-way threshold decision (reference combiner.py:52-84)."""
    out = np.full(len(scores), "ambiguous", dtype=object)
    out[scores >= cfg.jaccard_match] = "match"
    out[scores <= cfg.jaccard_no_match] = "no_match"
    return out


def verify_pairs(pairs: Dataset, signatures: Dataset, cfg: DedupConfig) -> Dataset:
    """(id_a, id_b) + signatures → (id_a, id_b, score, decision, tier).

    Pairs whose doc ids are missing from the signature table (filtered
    upstream) are dropped.
    """
    P = cfg.join_num_partitions
    sigs = signatures.select_columns(["doc_id", "minhash"])

    def attach_a(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "minhash": pd.Series(dtype="object")}
            )
        # global pair dedup happens here: this cogroup partitions by
        # id_a, so every copy of (id_a, id_b) from different bands is
        # in this partition (see minhash_candidate_pairs)
        l = l.drop_duplicates(["id_a", "id_b"])
        m = l.merge(r.rename(columns={"doc_id": "id_a"}), on="id_a", how="inner")
        return m[["id_a", "id_b", "minhash"]]

    with_a = cogroup_apply(pairs, sigs, ["id_a"], ["doc_id"], P, attach_a)

    def attach_b_and_score(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64"), "decision": pd.Series(dtype="object"),
             "tier": pd.Series(dtype="object")}
        )
        if len(l) == 0 or len(r) == 0:
            return empty
        m = l.merge(
            r.rename(columns={"doc_id": "id_b", "minhash": "minhash_b"}),
            on="id_b", how="inner",
        )
        if len(m) == 0:
            return empty
        sig_a = _sig_matrix(m["minhash"])
        sig_b = _sig_matrix(m["minhash_b"])
        score = (sig_a == sig_b).mean(axis=1)
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy(), "id_b": m["id_b"].to_numpy(),
             "score": score, "decision": decide(score, cfg),
             "tier": "minhash"}
        )

    return cogroup_apply(with_a, sigs, ["id_b"], ["doc_id"], P, attach_b_and_score)


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
