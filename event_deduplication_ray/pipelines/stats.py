"""Dashboard-style pipeline statistics.

Reference analog: Q5 dashboard aggregates
(/root/reference/src/event_dedup/api/routes/dashboard.py:27-84) —
match-decision distribution, canonical stats (count / needs_review /
avg confidence) — plus the candidate-reduction stats B5
(matching/candidate_pairs.py:14-28): total possible pairs, candidate
pairs, reduction percent.
"""

from __future__ import annotations

import pandas as pd

from event_deduplication_ray.pipelines.dedup_pipeline import DedupResult
from event_deduplication_ray.stages.aggregate import grouped_aggregate


def decision_distribution(result: DedupResult) -> pd.DataFrame:
    """decision → count over verified pairs (GROUP BY decision)."""
    return grouped_aggregate(
        result.verified_pairs, ["decision"], [("n", "count", "decision")]
    ).sort_values("decision").reset_index(drop=True)


def tier_distribution(result: DedupResult) -> pd.DataFrame:
    return grouped_aggregate(
        result.edges, ["tier"], [("n", "count", "tier")]
    ).sort_values("tier").reset_index(drop=True)


def pipeline_stats(result: DedupResult) -> dict:
    """One dict of run-level metrics (the reference's dashboard card)."""
    n_docs = result.assignments.count()
    can = grouped_aggregate(
        result.canonical, ["needs_review"],
        [("n", "count", "cluster_id"), ("total_members", "sum", "n_members")],
    )
    n_clusters = int(can["n"].sum())
    n_review = int(can.loc[can["needs_review"], "n"].sum()) if can["needs_review"].any() else 0
    n_edges = result.edges.count()
    total_possible = n_docs * (n_docs - 1) // 2
    n_candidates = result.verified_pairs.count()
    return {
        "n_docs": int(n_docs),
        "n_clusters": n_clusters,
        "n_duplicates_removed": int(n_docs - n_clusters),
        "dup_rate": round(1 - n_clusters / n_docs, 6) if n_docs else 0.0,
        "n_clusters_needing_review": n_review,
        "n_candidate_pairs": int(n_candidates),
        "n_match_edges": int(n_edges),
        "total_possible_pairs": int(total_possible),
        "candidate_reduction_pct": (
            round(100.0 * (1 - n_candidates / total_possible), 4)
            if total_possible else 100.0
        ),
    }
