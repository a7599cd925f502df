"""Run-dir consistency audit (fsck): cross-stage invariants a healthy
run dir must satisfy.  The operational companion of compaction/gc —
run it after a crash, a manual edit, or a chained incremental persist
before trusting the dir for resume/export.

Check shapes are all linear or one-shuffle:
- row counts vs the manifest (metadata read only);
- set equalities via ORDER-INDEPENDENT u64 checksums (sum of
  splitmix64 over the key column) + counts — two linear scans, no
  shuffle, collision odds ~2⁻⁶⁴ per check;
- membership (edge endpoints ⊆ docs, rep_doc ∈ its cluster) via one
  hash cogroup each, counting violations exactly.

Reference parity: the reference trusts its relational constraints
(FKs on models/*.py) for these invariants; a Parquet run dir has no
engine-enforced FKs, so this module IS the constraint check.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray.data as rd

from event_deduplication_ray.functions.sketch import _splitmix64
from event_deduplication_ray.stages.shuffle import cogroup_apply

U64 = np.uint64


def _sum_hash(ds, col: str) -> "tuple[int, int]":
    """(order-independent u64 checksum, row count) of a column."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.int64).view(U64)
        with np.errstate(over="ignore"):
            s = int(_splitmix64(v).sum(dtype=U64))
        return pd.DataFrame({"s": [np.uint64(s)], "n": [np.int64(len(v))]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return 0, 0
    with np.errstate(over="ignore"):
        s = int(parts["s"].to_numpy(U64).sum(dtype=U64))
    return s, int(parts["n"].sum())


def validate_run_dir(run_dir: str, num_parts: int = 16) -> dict:
    """Audit a run dir; returns ``{"ok": bool, "checks": {...}}`` where
    each check carries ``ok`` plus the measured detail."""
    checks: dict = {}
    with open(os.path.join(run_dir, "manifest.json")) as f:
        manifest = json.load(f)

    bad_rows = {}
    for stage, meta in manifest.get("stages", {}).items():
        d = os.path.join(run_dir, stage)
        if not os.path.isdir(d):
            bad_rows[stage] = "missing"
            continue
        n = rd.read_parquet(d).count()
        if meta.get("rows") is not None and n != meta["rows"]:
            bad_rows[stage] = f"{n} != manifest {meta['rows']}"
    checks["stage_rows_match_manifest"] = {"ok": not bad_rows,
                                           "bad": bad_rows}

    extracted = rd.read_parquet(f"{run_dir}/extracted",
                                columns=["doc_id"])
    assignments = rd.read_parquet(f"{run_dir}/assignments",
                                  columns=["doc_id", "cluster_id"])
    canonical = rd.read_parquet(
        f"{run_dir}/canonical",
        columns=["cluster_id", "rep_doc_id", "n_members"])

    se, ne = _sum_hash(extracted, "doc_id")
    sa, na = _sum_hash(assignments, "doc_id")
    checks["assignments_cover_extracted"] = {
        "ok": (se, ne) == (sa, na),
        "extracted": ne, "assignments": na}

    # every edge endpoint must be an extracted doc
    edges = rd.read_parquet(f"{run_dir}/edges", columns=["id_a", "id_b"])

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(np.concatenate([df["id_a"].to_numpy(np.int64),
                                      df["id_b"].to_numpy(np.int64)])) \
            if len(df) else np.array([], np.int64)
        return pd.DataFrame({"doc_id": v})

    def missing(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l):
            return pd.DataFrame({"n_missing": pd.Series(dtype="int64")})
        have = set(r["doc_id"]) if len(r) else set()
        miss = (~l["doc_id"].isin(have)).sum()
        return pd.DataFrame({"n_missing": [np.int64(miss)]})

    em = cogroup_apply(edges.map_batches(ends, batch_format="pandas"),
                       extracted, ["doc_id"], ["doc_id"], num_parts,
                       missing).to_pandas()
    n_orphan = int(em["n_missing"].sum()) if "n_missing" in em.columns \
        else 0
    checks["edge_endpoints_in_docs"] = {"ok": n_orphan == 0,
                                        "orphans": n_orphan}

    # cluster-id sets agree (distinct on the assignment side first)
    def dedup_cid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cluster_id": pd.unique(
            df["cluster_id"].to_numpy(np.int64))})

    from event_deduplication_ray.stages.shuffle import partition_apply

    asn_cids = partition_apply(
        assignments.map_batches(dedup_cid, batch_format="pandas"),
        ["cluster_id"], num_parts, dedup_cid)
    sc1, nc1 = _sum_hash(asn_cids, "cluster_id")
    sc2, nc2 = _sum_hash(canonical, "cluster_id")
    checks["canonical_matches_cluster_ids"] = {
        "ok": (sc1, nc1) == (sc2, nc2),
        "assignment_clusters": nc1, "canonical_rows": nc2}

    # sum of n_members == assignment rows
    nm = canonical.map_batches(
        lambda df: pd.DataFrame({"n": [np.int64(df["n_members"].sum())]}),
        batch_format="pandas").to_pandas()
    total_members = int(nm["n"].sum()) if len(nm) else 0
    checks["member_counts_sum"] = {
        "ok": total_members == na,
        "sum_n_members": total_members, "assignment_rows": na}

    # each canonical rep_doc_id must be assigned to its own cluster
    def rep_ok(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l):
            return pd.DataFrame({"n_bad": pd.Series(dtype="int64")})
        have = set(zip(r["cluster_id"], r["doc_id"])) if len(r) else set()
        bad = sum((c, d) not in have
                  for c, d in zip(l["cluster_id"], l["rep_doc_id"]))
        return pd.DataFrame({"n_bad": [np.int64(bad)]})

    rb = cogroup_apply(canonical, assignments, ["cluster_id"],
                       ["cluster_id"], num_parts, rep_ok).to_pandas()
    n_bad_rep = int(rb["n_bad"].sum()) if "n_bad" in rb.columns else 0
    checks["rep_doc_in_own_cluster"] = {"ok": n_bad_rep == 0,
                                        "bad": n_bad_rep}

    return {"ok": all(c["ok"] for c in checks.values()), "checks": checks}
