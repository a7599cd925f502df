"""Review edits: incremental cluster surgery (split / merge) applied
as an edit table over pipeline assignments, plus an append-only audit
log.

Reference analog: R1 split / R2 merge
(/root/reference/src/event_dedup/review/operations.py:20-338) and the
audit log R3 (models/audit_log.py:13).  Re-keyed for a batch engine:
edits are DATA, not mutations — a (doc_id, forced_cluster_id) edit
table joined over the computed assignments as a final override, then
re-synthesis of only the touched clusters.  This keeps the pipeline
pure (rerunning the pipeline never loses review decisions) — the same
reason the reference links sources to canonicals instead of mutating
them (.planning/research/ARCHITECTURE.md "Overwriting Instead of
Linking").
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pandas as pd

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.shuffle import cogroup_apply
from event_deduplication_ray.stages.synthesize import synthesize_clusters


def empty_edits() -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "forced_cluster_id": pd.Series(dtype="int64"),
    })


def empty_audit() -> pd.DataFrame:
    return pd.DataFrame({
        "action_type": pd.Series(dtype="object"),
        "doc_id": pd.Series(dtype="int64"),
        "cluster_id": pd.Series(dtype="int64"),
        "operator": pd.Series(dtype="object"),
        "at": pd.Series(dtype="object"),
    })


class AuditLog:
    """Durable append-only audit table in the run dir (reference R3:
    AuditLog rows persisted per edit,
    /root/reference/src/event_dedup/models/audit_log.py:13, writes at
    review/operations.py:201-208,321-331).  Batch-engine form: one
    immutable Parquet part per edit batch under ``{run_dir}/audit/``
    (tmp-write → atomic rename), so edits survive process restarts and
    a later run can replay them into an edit table."""

    def __init__(self, run_dir: str):
        self.dir = os.path.join(run_dir, "audit")
        os.makedirs(self.dir, exist_ok=True)

    def append(self, rows: pd.DataFrame) -> None:
        if len(rows) == 0:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        # lexicographically ordered part names keep replay order stable
        fname = (
            f"part-{time.strftime('%Y%m%dT%H%M%S')}"
            f"-{time.monotonic_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        )
        tmp = os.path.join(self.dir, "." + fname)
        pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(self.dir, fname))

    def load(self) -> pd.DataFrame:
        """All audit rows ever appended, in append order."""
        import pyarrow.parquet as pq

        files = sorted(
            f for f in os.listdir(self.dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        if not files:
            return empty_audit()
        return pd.concat(
            [pq.read_table(os.path.join(self.dir, f)).to_pandas() for f in files],
            ignore_index=True,
        )


def edits_from_audit(audit: pd.DataFrame) -> pd.DataFrame:
    """Replay an audit trail into the edit table (last edit per doc
    wins — the same semantics the in-memory path applies online), so a
    restarted process recovers every review decision from the run
    dir."""
    if len(audit) == 0:
        return empty_edits()
    last = audit.drop_duplicates("doc_id", keep="last")
    return pd.DataFrame({
        "doc_id": last["doc_id"].to_numpy(np.int64),
        "forced_cluster_id": last["cluster_id"].to_numpy(np.int64),
    }).reset_index(drop=True)


def split_doc(
    edits: pd.DataFrame, audit: pd.DataFrame, doc_id: int,
    target_cluster_id: int | None = None, operator: str = "reviewer",
    log: AuditLog | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Detach a doc from its computed cluster: into its own singleton
    (target None → forced cluster = own doc_id) or onto a target
    cluster (reference split-with-target, operations.py:20-216).
    Pass ``log`` to persist the audit rows durably per edit."""
    forced = int(doc_id) if target_cluster_id is None else int(target_cluster_id)
    edits = pd.concat(
        [edits[edits["doc_id"] != doc_id],
         pd.DataFrame({"doc_id": [doc_id], "forced_cluster_id": [forced]})],
        ignore_index=True,
    )
    new_rows = pd.DataFrame({
        "action_type": ["split"], "doc_id": [doc_id],
        "cluster_id": [forced], "operator": [operator],
        "at": [time.strftime("%Y-%m-%dT%H:%M:%S")]})
    audit = pd.concat([audit, new_rows], ignore_index=True)
    if log is not None:
        log.append(new_rows)
    return edits, audit


def merge_clusters(
    edits: pd.DataFrame, audit: pd.DataFrame,
    assignments: pd.DataFrame, donor_cluster_id: int,
    survivor_cluster_id: int, operator: str = "reviewer",
    log: AuditLog | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Force every member of the donor cluster onto the survivor
    (reference merge, operations.py:219-338).  Pass ``log`` to persist
    the audit rows durably per edit batch."""
    members = assignments.loc[
        assignments["cluster_id"] == donor_cluster_id, "doc_id"
    ]
    new = pd.DataFrame({
        "doc_id": members.to_numpy(np.int64),
        "forced_cluster_id": np.full(len(members), survivor_cluster_id, np.int64),
    })
    edits = pd.concat(
        [edits[~edits["doc_id"].isin(set(members))], new], ignore_index=True
    )
    new_rows = pd.DataFrame({
        "action_type": ["merge"] * len(members),
        "doc_id": members.to_numpy(np.int64),
        "cluster_id": np.full(len(members), survivor_cluster_id, np.int64),
        "operator": [operator] * len(members),
        "at": [time.strftime("%Y-%m-%dT%H:%M:%S")] * len(members)})
    audit = pd.concat([audit, new_rows], ignore_index=True)
    if log is not None:
        log.append(new_rows)
    return edits, audit


def apply_edits(
    assignments: Dataset, edits: pd.DataFrame, cfg: DedupConfig
) -> Dataset:
    """Override computed assignments with the edit table (edits win).

    Broadcast join: the edit table is human-scale (bounded by review
    throughput), so it ships in the task closure — no shuffle.
    """
    if len(edits) == 0:
        return assignments
    forced = edits.set_index("doc_id")["forced_cluster_id"]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        # masked assignment keeps int64 exact (a NaN-bearing map would
        # go through float64 and corrupt ids above 2^53)
        mask = df["doc_id"].isin(forced.index).to_numpy()
        if mask.any():
            df = df.copy()
            df.loc[mask, "cluster_id"] = (
                df.loc[mask, "doc_id"].map(forced).astype(np.int64)
            )
        return df

    return assignments.map_batches(f, batch_format="pandas")


def resynthesize_after_edits(
    docs_meta: Dataset, assignments: Dataset, edits: pd.DataFrame,
    cfg: DedupConfig,
) -> Dataset:
    """Re-synthesize canonicals with edits applied.  Only touched
    clusters actually change; synthesis is a per-cluster groupby so
    untouched groups produce identical rows (pure function of the
    group)."""
    return synthesize_clusters(docs_meta, apply_edits(assignments, edits, cfg), cfg)


def explain_pair(run_dir: str, id_a: int, id_b: int,
                 cfg: DedupConfig | None = None) -> dict:
    """Pair-level match EXPLANATION for the review surface: why did
    (or didn't) two docs match — per-tier evidence recomputed from
    the run's checkpoints (reference Q4's detail join, re-keyed to
    pair granularity).  Reads the two docs' rows via broadcast
    semi-joins (two linear scans, no shuffle) and reports: exact
    shingle Jaccard from text_norm, the signature-estimated Jaccard
    (the verify tier's score), shared LSH bands, simhash Hamming
    distance, shared substring fingerprints + containment, the
    decision each score implies, and whether an edge was actually
    persisted.  Driver cost is O(2 docs)."""
    import ray.data as rd

    from event_deduplication_ray.functions import hashing as H
    from event_deduplication_ray.pipelines.incremental import (
        semi_join_broadcast,
    )
    from event_deduplication_ray.stages.verify import decide

    cfg = cfg or DedupConfig()
    lo, hi = int(min(id_a, id_b)), int(max(id_a, id_b))
    ids = np.array([lo, hi], dtype=np.int64)

    meta = semi_join_broadcast(
        rd.read_parquet(f"{run_dir}/extracted"), "doc_id", ids
    ).to_pandas().set_index("doc_id")
    if lo not in meta.index or hi not in meta.index:
        missing = [i for i in (lo, hi) if i not in meta.index]
        return {"id_a": lo, "id_b": hi, "error": "unknown doc_id",
                "missing": missing}
    sigs = semi_join_broadcast(
        rd.read_parquet(f"{run_dir}/signatures"), "doc_id", ids
    ).to_pandas().set_index("doc_id")

    out: dict = {"id_a": lo, "id_b": hi,
                 "url_a": str(meta.loc[lo, "url"]),
                 "url_b": str(meta.loc[hi, "url"])}

    # exact shingle Jaccard from the checkpointed normalized text
    sh = []
    for i in (lo, hi):
        flat, lens = H.tokenize_offsets(
            pd.Series([meta.loc[i, "text_norm"]]))
        s, _ = H.shingle_hashes(H.hash_strings_u64(flat), lens,
                                cfg.shingle_k, cfg.seed)
        sh.append(set(np.asarray(s).tolist()))
    inter = len(sh[0] & sh[1])
    union = len(sh[0] | sh[1])
    out["exact_jaccard"] = round(inter / union, 6) if union else 0.0
    out["shared_shingles"] = inter

    # minhash tier: folded-signature estimate + shared bands
    s_a = np.asarray(sigs.loc[lo, "sig8"], dtype=np.uint8)
    s_b = np.asarray(sigs.loc[hi, "sig8"], dtype=np.uint8)
    est = float((s_a == s_b).mean()) if len(s_a) and len(s_a) == len(s_b) \
        else 0.0
    out["sig_jaccard_est"] = round(est, 6)
    ba = set(np.asarray(sigs.loc[lo, "band_keys"]).tolist())
    bb = set(np.asarray(sigs.loc[hi, "band_keys"]).tolist())
    out["shared_bands"] = len(ba & bb)
    out["minhash_decision"] = str(
        decide(np.array([est]), cfg)[0]) if out["shared_bands"] else "no_candidate"

    # simhash tier
    ha = np.array([sigs.loc[lo, "simhash"]]).astype(np.int64).view(np.uint64)
    hb = np.array([sigs.loc[hi, "simhash"]]).astype(np.int64).view(np.uint64)
    out["simhash_hamming"] = int(H.hamming_distance_u64(ha, hb)[0])

    # substring tier
    fa = set(np.asarray(sigs.loc[lo, "substr_fps"]).tolist())
    fb = set(np.asarray(sigs.loc[hi, "substr_fps"]).tolist())
    shared_fps = len(fa & fb)
    out["shared_substr_fps"] = shared_fps
    mn = min(len(fa), len(fb))
    out["containment"] = round(shared_fps / mn, 6) if mn else 0.0

    # what the run actually persisted
    edges = semi_join_broadcast(
        rd.read_parquet(f"{run_dir}/edges"), "id_a", ids
    ).to_pandas()
    hit = edges[(edges["id_a"] == lo) & (edges["id_b"] == hi)]
    out["edge"] = (
        {"score": round(float(hit["score"].iloc[0]), 6),
         "tier": str(hit["tier"].iloc[0])} if len(hit) else None)
    asn = semi_join_broadcast(
        rd.read_parquet(f"{run_dir}/assignments"), "doc_id", ids
    ).to_pandas().set_index("doc_id")
    out["same_cluster"] = bool(
        asn.loc[lo, "cluster_id"] == asn.loc[hi, "cluster_id"])
    return out
