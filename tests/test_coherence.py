"""C2 cluster-coherence validator: low mean intra-cluster edge score
or excessive crawl-ts spread flags needs_review (reference boundary
cases, /root/reference/src/event_dedup/clustering/coherence.py:16-65
and /root/reference/tests/test_clustering.py)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path
from event_deduplication_ray.stages.synthesize import (
    attach_coherence,
    cluster_confidence,
)

CFG = DedupConfig(join_num_partitions=4, coherence_min_confidence=0.8)


def _frames():
    # cluster 1: tight (scores 1.0, 0.95); cluster 2: loose (0.5, 0.45);
    # cluster 7: singleton (no edges)
    edges = pd.DataFrame({
        "id_a": [10, 11, 20, 21],
        "id_b": [11, 12, 21, 22],
        "score": [1.0, 0.95, 0.5, 0.45],
    })
    assignments = pd.DataFrame({
        "doc_id": [10, 11, 12, 20, 21, 22, 7],
        "cluster_id": [1, 1, 1, 2, 2, 2, 7],
    })
    canonical = pd.DataFrame({
        "cluster_id": [1, 2, 7],
        "n_members": [3, 3, 1],
        "needs_review": [False, False, False],
    })
    return edges, assignments, canonical


def test_low_coherence_cluster_flagged():
    edges, assignments, canonical = _frames()
    conf = cluster_confidence(rd.from_pandas(edges), rd.from_pandas(assignments), CFG)
    out = attach_coherence(rd.from_pandas(canonical), conf, CFG).to_pandas()
    out = out.set_index("cluster_id")
    assert not out.loc[1, "needs_review"]            # mean 0.975 >= 0.8
    assert out.loc[2, "needs_review"]                # mean 0.475 < 0.8
    assert not out.loc[7, "needs_review"]            # singleton: no edges, coherent
    assert np.isnan(out.loc[7, "match_confidence"])
    assert abs(out.loc[1, "match_confidence"] - 0.975) < 1e-9
    assert abs(out.loc[2, "match_confidence"] - 0.475) < 1e-9


def test_boundary_exactly_at_threshold_not_flagged():
    """Reference semantics: flag only STRICTLY below the threshold."""
    edges = pd.DataFrame({"id_a": [10], "id_b": [11], "score": [0.8]})
    assignments = pd.DataFrame({"doc_id": [10, 11], "cluster_id": [1, 1]})
    canonical = pd.DataFrame(
        {"cluster_id": [1], "n_members": [2], "needs_review": [False]})
    conf = cluster_confidence(rd.from_pandas(edges), rd.from_pandas(assignments), CFG)
    out = attach_coherence(rd.from_pandas(canonical), conf, CFG).to_pandas()
    assert not out["needs_review"].iloc[0]           # 0.8 == threshold → keep


def test_ts_spread_flags_e2e(corpus_dir):
    """The fixture's warc_ts spans 90 days — a tiny spread budget must
    flag every multi-member cluster whose members differ in ts, and
    never a singleton."""
    cfg = DedupConfig(use_substring=True, join_num_partitions=4,
                      coherence_max_ts_spread_days=0.000001)
    res = dedup_path(f"{corpus_dir}/docs", cfg)
    can = res.canonical.to_pandas()
    spread = (can["last_ts"] - can["first_ts"]).dt.total_seconds()
    assert (can.loc[spread > 0.1, "needs_review"]).all()
    assert not can.loc[can["n_members"] == 1, "needs_review"].any()
