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


def test_subset_metrics_split_by_lang():
    """E5 analog: per-subset rows partition the golden pairs; a pair
    with mismatched sides lands in 'mixed'; metrics per subset match
    a hand filter."""
    from event_deduplication_ray.functions.hashing import doc_ids_for_urls
    from event_deduplication_ray.pipelines.eval import (
        evaluate_pairs_by_subset,
    )

    urls = [f"https://x.example/{i}" for i in range(4)]
    ids = doc_ids_for_urls(pd.Series(urls))
    # docs 0,1 are "de" and truly same (clustered together);
    # docs 2,3 are "en" and truly same but predicted apart (fn)
    asn = pd.DataFrame({
        "doc_id": ids,
        "cluster_id": [ids[0], ids[0], ids[2], ids[3]],
    })
    meta = pd.DataFrame({"doc_id": ids, "lang": ["de", "de", "en", "fr"]})
    gp = pd.DataFrame({
        "url_a": [urls[0], urls[2]],
        "url_b": [urls[1], urls[3]],
        "label": ["same", "same"],
    })
    out = evaluate_pairs_by_subset(asn, gp, meta, by="lang")
    by = out.set_index("subset")
    assert by.loc["__all__", "tp"] == 1 and by.loc["__all__", "fn"] == 1
    assert by.loc["de", "tp"] == 1 and by.loc["de", "fn"] == 0
    # en/fr pair has mismatched langs -> mixed subset
    assert by.loc["mixed", "fn"] == 1
    assert "en" not in by.index


def test_tier_ablation_report(corpus_dir):
    """E6 analog: side-by-side rows; adding candidate tiers never
    reduces recall (supersets of edges) on the golden corpus."""
    from event_deduplication_ray.pipelines.eval import tier_ablation

    gp = pq.read_table(f"{corpus_dir}/golden_pairs.parquet")
    df = tier_ablation(
        f"{corpus_dir}/docs", gp, base_cfg=CFG,
        variants={
            "minhash": dict(use_simhash=False, use_substring=False),
            "all": dict(use_simhash=True, use_substring=True),
        },
    )
    assert list(df["tiers"]) == ["minhash", "all"]
    r = df.set_index("tiers")["recall"]
    assert r["all"] >= r["minhash"]
    assert (df["precision"] >= 0.99).all()
    assert {"n_clusters", "sec", "f1"} <= set(df.columns)
