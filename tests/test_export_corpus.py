"""Deduped-corpus export: the training-data product — full text, one
surviving representative per cluster, hive-partitionable, identical
through the broadcast and cogroup anti-join paths."""

import os

import pandas as pd
import pytest

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path_resumable
from event_deduplication_ray.pipelines.export import export_deduped_corpus

CFG = DedupConfig(join_num_partitions=4)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory, corpus_dir):
    d = str(tmp_path_factory.mktemp("exp") / "run")
    dedup_path_resumable(f"{corpus_dir}/docs", d, CFG)
    return d


def test_deduped_corpus_one_doc_per_cluster(run_dir, tmp_path):
    out = str(tmp_path / "corpus")
    m = export_deduped_corpus(run_dir, out, num_partitions=4)

    asn = pd.read_parquet(f"{run_dir}/assignments")
    canon = pd.read_parquet(f"{run_dir}/canonical")
    kept = pd.read_parquet(out)

    assert m["n_kept"] == len(kept)
    assert m["n_kept"] + m["n_dropped"] == len(asn)
    # exactly the representatives survive
    assert set(kept["doc_id"]) == set(canon["rep_doc_id"])
    assert len(kept) == len(canon)
    # full text preserved, byte-identical to the extracted checkpoint
    ex = pd.read_parquet(f"{run_dir}/extracted")[["doc_id", "text"]]
    j = kept[["doc_id", "text"]].merge(ex, on="doc_id",
                                       suffixes=("_out", "_src"))
    assert (j["text_out"] == j["text_src"]).all()


def test_deduped_corpus_cogroup_path_matches_broadcast(run_dir, tmp_path):
    out_b = str(tmp_path / "bcast")
    out_c = str(tmp_path / "cogrp")
    export_deduped_corpus(run_dir, out_b, num_partitions=4)
    export_deduped_corpus(run_dir, out_c, num_partitions=4,
                          broadcast_limit=0)   # force the cogroup path
    a = pd.read_parquet(out_b).sort_values("doc_id").reset_index(drop=True)
    b = pd.read_parquet(out_c).sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["text"] == b["text"]).all()


def test_deduped_corpus_partitioned_by_lang(run_dir, tmp_path):
    out = str(tmp_path / "bylang")
    m = export_deduped_corpus(run_dir, out, partition_by=["lang"],
                              num_partitions=4)
    dirs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert dirs, "expected hive lang= partition dirs"
    kept = pd.read_parquet(out)
    assert len(kept) == m["n_kept"]
