import pandas as pd
import pyarrow.parquet as pq
import pytest

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path
from event_deduplication_ray.pipelines.eval import threshold_sweep
from event_deduplication_ray.pipelines.stats import (
    decision_distribution,
    pipeline_stats,
    tier_distribution,
)

CFG = DedupConfig(use_substring=True, join_num_partitions=4)


@pytest.fixture(scope="module")
def result(corpus_dir):
    return dedup_path(f"{corpus_dir}/docs", CFG)


def test_pipeline_stats(result):
    s = pipeline_stats(result)
    assert s["n_docs"] == 1054
    assert 0 < s["n_clusters"] < s["n_docs"]
    assert s["n_duplicates_removed"] == s["n_docs"] - s["n_clusters"]
    assert s["candidate_reduction_pct"] > 95.0   # blocking must prune >95%
    assert s["n_match_edges"] > 0


def test_decision_distribution(result):
    d = decision_distribution(result)
    assert set(d["decision"]) <= {"match", "ambiguous", "no_match"}
    assert (d["n"] > 0).all()


def test_tier_distribution(result):
    d = tier_distribution(result)
    assert "minhash" in set(d["tier"]) and "substring" in set(d["tier"])


def test_threshold_sweep_monotone(result, corpus_dir):
    scores = result.verified_pairs.to_pandas()[["id_a", "id_b", "score"]]
    ids = result.assignments.to_pandas()[["doc_id"]]
    gp = pq.read_table(f"{corpus_dir}/golden_pairs.parquet")
    sweep = threshold_sweep(scores, ids, gp, [0.5, 0.75, 0.9])
    assert list(sweep["threshold"]) == [0.5, 0.75, 0.9]
    # recall can only fall as the threshold rises
    assert (sweep["recall"].diff().dropna() <= 1e-9).all()
    # precision stays high on this corpus
    assert (sweep["precision"] >= 0.95).all()
