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


def test_bcubed_hand_example():
    """Classic worked example: gold {1,2,3}{4,5}, pred {1,2}{3,4,5}
    → B³ P = B³ R = 11/15 (per-item intersection ratios averaged);
    identical assignments score 1.0; one mega-cluster keeps recall 1
    but drops precision."""
    import pandas as pd

    from event_deduplication_ray.pipelines.eval import bcubed_metrics

    gold = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                         "cluster_id": [10, 10, 10, 20, 20]})
    pred = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                         "cluster_id": [1, 1, 2, 2, 2]})
    m = bcubed_metrics(pred, gold)
    assert m["bcubed_precision"] == round(11 / 15, 6)
    assert m["bcubed_recall"] == round(11 / 15, 6)
    assert m["n_items"] == 5

    perfect = bcubed_metrics(gold, gold)
    assert perfect["bcubed_precision"] == 1.0
    assert perfect["bcubed_recall"] == 1.0

    mega = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                         "cluster_id": [1, 1, 1, 1, 1]})
    m2 = bcubed_metrics(mega, gold)
    assert m2["bcubed_recall"] == 1.0
    assert m2["bcubed_precision"] == round((9 / 5 + 4 / 5) / 5, 6)


def test_bcubed_on_golden_fixture(ray_session, tmp_path):
    """End-to-end: flagship assignments on the planted corpus score
    near-perfect B³ against the golden clusters (recall gate's
    cluster-level counterpart)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from event_deduplication_ray import fixtures as F
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path
    from event_deduplication_ray.pipelines.eval import bcubed_metrics
    from event_deduplication_ray.functions.hashing import doc_ids_for_urls

    d = F.materialize_corpus(str(tmp_path), 400, seed=7)
    res = dedup_path(f"{d}/docs", DedupConfig(use_substring=True))
    pred = res.assignments.to_pandas()
    gold = pq.read_table(f"{d}/golden_clusters.parquet").to_pandas()
    gold["doc_id"] = doc_ids_for_urls(gold["url"])
    gold = gold[["doc_id", "cluster_id"]]
    m = bcubed_metrics(pred, gold)
    assert m["n_items"] == len(gold)
    assert m["bcubed_precision"] >= 0.99
    assert m["bcubed_recall"] >= 0.98


def test_compare_runs_identical_is_one():
    import pandas as pd

    from event_deduplication_ray.pipelines.eval import compare_runs

    a = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                      "cluster_id": [1, 1, 2, 2, 3]})
    m = compare_runs(a, a.copy())
    assert m["ari"] == 1.0
    assert m["n_split_a"] == 0 and m["n_merged_b"] == 0
    assert m["n_moved"] == 0
    assert m["n_common"] == 5 and m["n_only_a"] == 0


def test_compare_runs_hand_ari():
    """sklearn's doc example: true=[0,0,1,1], pred=[0,0,1,2] →
    ARI = 4/7 (index 1, expected 1/3, max 3/2), one split, zero
    merges, one doc moved out of its majority cell."""
    import pandas as pd

    from event_deduplication_ray.pipelines.eval import compare_runs

    a = pd.DataFrame({"doc_id": [1, 2, 3, 4], "cluster_id": [0, 0, 1, 1]})
    b = pd.DataFrame({"doc_id": [1, 2, 3, 4], "cluster_id": [0, 0, 1, 2]})
    m = compare_runs(a, b)
    assert m["ari"] == round(4 / 7, 6)
    assert m["n_split_a"] == 1          # A cluster 1 → B {1, 2}
    assert m["n_merged_b"] == 0
    assert m["n_moved"] == 1
    assert m["n_clusters_a"] == 2 and m["n_clusters_b"] == 3


def test_compare_runs_merge_and_disjoint_docs():
    import pandas as pd

    from event_deduplication_ray.pipelines.eval import compare_runs

    # B merges A's two clusters; doc 9 only in A, doc 10 only in B
    a = pd.DataFrame({"doc_id": [1, 2, 3, 4, 9],
                      "cluster_id": [1, 1, 2, 2, 5]})
    b = pd.DataFrame({"doc_id": [1, 2, 3, 4, 10],
                      "cluster_id": [7, 7, 7, 7, 8]})
    m = compare_runs(a, b)
    assert m["n_merged_b"] == 1
    assert m["n_split_a"] == 0
    assert m["n_only_a"] == 1 and m["n_only_b"] == 1
    assert m["n_common"] == 4
    # ARI by hand: index=2, sum_a=2, sum_b=6, total=6, exp=2, max=4
    assert m["ari"] == 0.0


def test_compare_runs_trivial_denominator():
    import pandas as pd

    from event_deduplication_ray.pipelines.eval import compare_runs

    # all docs in ONE cluster on both sides: denom 0 → ARI 1
    a = pd.DataFrame({"doc_id": [1, 2, 3], "cluster_id": [1, 1, 1]})
    b = pd.DataFrame({"doc_id": [1, 2, 3], "cluster_id": [9, 9, 9]})
    assert compare_runs(a, b)["ari"] == 1.0


def test_compare_runs_ds_matches_pandas(ray_session):
    """compare_runs_ds (distributed contingency partials) must equal
    the pandas compare_runs on every edge the pandas gates cover:
    identical runs, a hand ARI, splits+merges with disjoint docs, a
    random 2k-doc relabeling (multi-partition cells), and zero
    overlap."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from event_deduplication_ray.pipelines.eval import (
        compare_runs,
        compare_runs_ds,
    )

    rng = np.random.default_rng(7)
    big_a = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64),
                          "cluster_id": rng.integers(0, 120, 2000)})
    big_b = big_a.copy()
    big_b["cluster_id"] = np.where(rng.random(2000) < 0.3,
                                   rng.integers(0, 120, 2000),
                                   big_b["cluster_id"])
    cases = [
        (big_a, big_a.copy()),
        (big_a, big_b),
        (pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "cluster_id": [1, 1, 2, 2]}),
         pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "cluster_id": [1, 1, 1, 2]})),
        (pd.DataFrame({"doc_id": [1, 2, 3],
                       "cluster_id": [1, 1, 2]}),
         pd.DataFrame({"doc_id": [3, 4, 5],
                       "cluster_id": [9, 9, 8]})),
        (pd.DataFrame({"doc_id": [1], "cluster_id": [1]}),
         pd.DataFrame({"doc_id": [2], "cluster_id": [1]})),
    ]
    for a, b in cases:
        want = compare_runs(a[["doc_id", "cluster_id"]].astype("int64"),
                            b[["doc_id", "cluster_id"]].astype("int64"))
        got = compare_runs_ds(rd.from_pandas(a.astype("int64")),
                              rd.from_pandas(b.astype("int64")),
                              num_parts=4)
        assert got == want, (got, want)


def test_evaluate_pairs_ds_matches_pandas(ray_session, corpus_dir):
    """The bounded golden-slice path must reproduce the full-collect
    metrics on the fixture corpus truth (and on an empty golden
    table)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from event_deduplication_ray.functions.hashing import doc_ids_for_urls
    from event_deduplication_ray.pipelines.eval import (
        evaluate_pairs,
        evaluate_pairs_ds,
    )

    gp = pq.read_table(f"{corpus_dir}/golden_pairs.parquet")
    gpd = gp.to_pandas()
    # synthetic assignments: cluster by min golden partner
    ids = pd.unique(pd.concat([
        pd.Series(doc_ids_for_urls(gpd["url_a"])),
        pd.Series(doc_ids_for_urls(gpd["url_b"]))]))
    asn = pd.DataFrame({"doc_id": ids.astype("int64")})
    asn["cluster_id"] = (asn["doc_id"] % 97).astype("int64")
    want = evaluate_pairs(asn, gp).as_dict()
    got = evaluate_pairs_ds(rd.from_pandas(asn), gp).as_dict()
    assert got == want

    empty = pa.Table.from_pandas(gpd.iloc[:0])
    m = evaluate_pairs_ds(rd.from_pandas(asn), empty)
    assert (m.tp, m.fp, m.fn, m.tn) == (0, 0, 0, 0)
