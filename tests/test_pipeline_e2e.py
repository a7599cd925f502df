"""End-to-end pipeline on the golden fixture corpus — the dup-pair
recall ≥0.99 gate (BASELINE.md; reference pattern:
tests/test_end_to_end.py + the E1 P/R/F1 harness)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions.hashing import doc_ids_for_urls
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path
from event_deduplication_ray.pipelines.eval import evaluate_pairs

CFG = DedupConfig(use_substring=True, use_simhash=True, join_num_partitions=4)


@pytest.fixture(scope="module")
def result(corpus_dir):
    return dedup_path(f"{corpus_dir}/docs", CFG)


@pytest.fixture(scope="module")
def assignments(result) -> pd.DataFrame:
    return result.assignments.to_pandas()


def test_every_doc_assigned_exactly_once(assignments, corpus_dir):
    docs = pq.read_table(f"{corpus_dir}/docs", columns=["url"])
    assert len(assignments) == docs.num_rows
    assert assignments["doc_id"].is_unique


def test_recall_gate(assignments, corpus_dir):
    gp = pq.read_table(f"{corpus_dir}/golden_pairs.parquet")
    m = evaluate_pairs(assignments, gp)
    assert m.recall >= 0.99, m.as_dict()
    assert m.precision >= 0.99, m.as_dict()


def test_exact_dups_always_cluster(assignments, corpus_dir):
    gc = pq.read_table(f"{corpus_dir}/golden_clusters.parquet").to_pandas()
    gc["doc_id"] = doc_ids_for_urls(gc["url"])
    lab = assignments.set_index("doc_id")["cluster_id"]
    exact = gc[gc["kind"].isin(["base", "exact"])]
    for _, grp in exact.groupby("cluster_id"):
        if len(grp) > 1:
            assert grp["doc_id"].map(lab).nunique() == 1


def test_extraction_byte_identical(result, corpus_dir):
    got = result.docs.to_pandas()[["url", "text"]]
    want = pq.read_table(f"{corpus_dir}/docs", columns=["url", "text"]).to_pandas()
    m = want.merge(got, on="url", suffixes=("_want", "_got"))
    assert len(m) == len(want)
    assert (m["text_want"] == m["text_got"]).all()


def test_canonical_one_row_per_cluster(result, assignments):
    can = result.canonical.to_pandas()
    assert can["cluster_id"].is_unique
    assert set(can["cluster_id"]) == set(assignments["cluster_id"].unique())
    assert int(can["n_members"].sum()) == len(assignments)
    # representative is a member of its own cluster
    lab = assignments.set_index("doc_id")["cluster_id"]
    assert (can["rep_doc_id"].map(lab) == can["cluster_id"]).all()


def test_verified_pairs_canonical_order(result):
    vp = result.verified_pairs.to_pandas()
    assert (vp["id_a"] < vp["id_b"]).all()
    assert not vp.duplicated(["id_a", "id_b"]).any()
    assert set(vp["decision"].unique()) <= {"match", "ambiguous", "no_match"}


def test_determinism_two_runs(corpus_dir, assignments):
    res2 = dedup_path(f"{corpus_dir}/docs", CFG)
    a2 = res2.assignments.to_pandas()
    m = assignments.merge(a2, on="doc_id", suffixes=("_1", "_2"))
    assert (m["cluster_id_1"] == m["cluster_id_2"]).all()


def test_distributed_cc_path_matches_driver_path(corpus_dir, assignments):
    """Force the iterative hash-to-min path end-to-end and require
    identical cluster labels to the driver union-find shortcut."""
    cfg2 = CFG.with_overrides(cc_driver_edge_limit=0)
    res = dedup_path(f"{corpus_dir}/docs", cfg2)
    a2 = res.assignments.to_pandas()
    m = assignments.merge(a2, on="doc_id", suffixes=("_drv", "_dist"))
    assert len(m) == len(assignments)
    assert (m["cluster_id_drv"] == m["cluster_id_dist"]).all()


def test_partition_count_invariance(corpus_dir, assignments):
    """Cluster assignments must not depend on the shuffle partition
    count (the in-session proxy for running at different cluster
    sizes; FIXTURES.md §3 scaling fixture)."""
    cfg3 = CFG.with_overrides(join_num_partitions=3)
    a3 = dedup_path(f"{corpus_dir}/docs", cfg3).assignments.to_pandas()
    m = assignments.merge(a3, on="doc_id", suffixes=("_p4", "_p3"))
    assert len(m) == len(assignments)
    assert (m["cluster_id_p4"] == m["cluster_id_p3"]).all()


def test_duplicate_free_corpus_all_singletons(tmp_path):
    """A corpus with NO duplicates must run clean (every shuffle
    partition's band groups are singletons — regression for the
    empty-partition KeyError in _pairs_from_groups) and yield one
    singleton cluster per doc."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_deduplication_ray.fixtures import wrap_html

    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    n = 60
    texts = [
        " ".join(
            "".join(letters[rng.integers(0, 26, size=6)]) for _ in range(80)
        )
        for _ in range(n)
    ]
    urls = [f"https://uniq.example/p{i:04d}" for i in range(n)]
    ts0 = np.datetime64("2025-06-01T00:00:00", "us")
    docs = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([ts0] * n, pa.timestamp("us")),
            "html": pa.array(
                [wrap_html(texts[i], f"t{i}", "uniq.example") for i in range(n)],
                pa.binary(),
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(docs, str(d / "part-0000.parquet"))
    res = dedup_path(str(d), CFG)
    a = res.assignments.to_pandas()
    assert len(a) == n
    assert a["cluster_id"].nunique() == n  # all singletons


def test_exact_tier_flag_no_worse(corpus_dir, assignments):
    """With the exact tier on, recall/precision must be >= the base
    config's (ambiguous pairs only ever get better-informed decisions)."""
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.eval import evaluate_pairs

    cfg2 = CFG.with_overrides(use_exact_tier=True)
    res = dedup_path(f"{corpus_dir}/docs", cfg2)
    a2 = res.assignments.to_pandas()
    gp = pq.read_table(f"{corpus_dir}/golden_pairs.parquet")
    m_base = evaluate_pairs(assignments, gp)
    m_exact = evaluate_pairs(a2, gp)
    assert m_exact.recall >= m_base.recall - 1e-9
    assert m_exact.precision >= 0.99


def test_min_text_chars_gate(corpus_dir):
    """min_text_chars excludes short docs from every key family —
    they become passthrough singletons (B3 quality gate; round-2
    ADVICE: the knob previously had no effect)."""
    big = DedupConfig(use_substring=True, use_simhash=True,
                      join_num_partitions=4, min_text_chars=10**9)
    res = dedup_path(f"{corpus_dir}/docs", big)
    a = res.assignments.to_pandas()
    # every doc is shorter than 1e9 chars → no candidates → singletons
    assert a["cluster_id"].nunique() == len(a)


def test_flagship_on_docid_keyed_table():
    """The driver documents table shape (doc_id, text, lang, source,
    n_chars — no url/html) runs through the flagship directly: rows
    keep their doc_id and source, nothing is rejected, and the run is
    deterministic."""
    import ray.data as rd

    from event_deduplication_ray.pipelines.dedup_pipeline import dedup_docs

    path = "/root/testdata/sf0.001/documents.parquet"
    cfg = DedupConfig(use_substring=True, join_num_partitions=4)
    res = dedup_docs(rd.read_parquet(path), cfg)
    asn = res.assignments.to_pandas()
    import pyarrow.parquet as pq

    src = pq.read_table(path, columns=["doc_id", "source"]).to_pandas()
    assert len(asn) == len(src)
    assert set(asn.doc_id) == set(src.doc_id)
    docs = res.docs.to_pandas()
    m = docs.merge(src, on="doc_id", suffixes=("", "_in"))
    assert (m["source"] == m["source_in"]).all()
    assert res.rejected.count() == 0
    # deterministic across runs
    res2 = dedup_docs(rd.read_parquet(path), cfg)
    asn2 = res2.assignments.to_pandas()
    a = asn.sort_values("doc_id").reset_index(drop=True)
    b = asn2.sort_values("doc_id").reset_index(drop=True)
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()
