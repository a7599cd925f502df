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


def test_export_sorted_corpus_global_order(ray_session, tmp_path):
    """Curriculum export: reading part files in NAME order yields
    globally non-decreasing (n_tokens, doc_id); every doc appears
    exactly once; each file is internally sorted."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.export import export_sorted_corpus

    rng = np.random.default_rng(7)
    n = 400
    docs = pd.DataFrame({
        "doc_id": np.arange(1, n + 1, dtype=np.int64),
        "text": [" ".join(["tok"] * int(k))
                 for k in rng.integers(1, 80, n)],
        "lang": ["en"] * n,
    })
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(src / "d.parquet"))
    out = str(tmp_path / "sorted")
    m = export_sorted_corpus(str(src), out, num_files=8)
    assert m["n_docs"] == n and 1 <= m["n_files"] <= 8

    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(files) == m["n_files"]
    seen = []
    prev = (-1, -1)
    for f in files:
        t = pq.read_table(os.path.join(out, f)).to_pandas()
        keys = list(zip(t["n_tokens"], t["doc_id"]))
        assert keys == sorted(keys), f"{f} not internally sorted"
        assert keys[0] >= prev, f"{f} overlaps previous file"
        prev = keys[-1]
        seen.extend(t["doc_id"].tolist())
    assert sorted(seen) == docs["doc_id"].tolist()


def test_export_sorted_corpus_empty_and_heavy_key(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.export import export_sorted_corpus

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}),
                   str(empty / "d.parquet"))
    assert export_sorted_corpus(str(empty), str(tmp_path / "eo")) == \
        {"n_docs": 0, "n_files": 0}

    # one dominant key value: ties never straddle files
    docs = pd.DataFrame({
        "doc_id": np.arange(1, 101, dtype=np.int64),
        "text": ["a b c"] * 90 + ["a"] * 5 + ["a b c d e f g"] * 5,
    })
    src = tmp_path / "heavy"
    src.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(src / "d.parquet"))
    out = str(tmp_path / "ho")
    m = export_sorted_corpus(str(src), out, num_files=10)
    assert m["n_docs"] == 100
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    per_file = [set(pq.read_table(os.path.join(out, f)).to_pandas()
                    ["n_tokens"]) for f in files]
    # the 3-token flood lives in exactly one file
    assert sum(3 in s for s in per_file) == 1


def test_bucketed_export_and_shuffle_free_join(ray_session, tmp_path):
    """Bucketing contract: every row's key hashes to its directory's
    bucket; a per-bucket cogroup (NO shuffle) reproduces the global
    join exactly (orders-per-customer counts vs a pandas merge)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data as rd
    from event_deduplication_ray.functions.sketch import _splitmix64
    from event_deduplication_ray.pipelines.export import (
        bucketed_cogroup,
        export_bucketed,
    )

    rng = np.random.default_rng(3)
    cust = pd.DataFrame({
        "c_custkey": np.arange(1, 61, dtype=np.int64),
        "c_name": [f"c{i}" for i in range(1, 61)]})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, 301, dtype=np.int64),
        "c_custkey": rng.integers(1, 61, 300).astype(np.int64)})

    da, db = str(tmp_path / "cust"), str(tmp_path / "ord")
    export_bucketed(rd.from_pandas(cust), da, "c_custkey", n_buckets=8)
    export_bucketed(rd.from_pandas(orders), db, "c_custkey", n_buckets=8)

    # dir invariant: keys in bucket=i all hash to i
    for i in range(8):
        d = os.path.join(da, f"bucket={i}")
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            t = pq.read_table(os.path.join(d, f)).to_pandas()
            h = (_splitmix64(t["c_custkey"].to_numpy(np.int64)
                             .view(np.uint64)) % np.uint64(8)).astype(int)
            assert (h == i).all()

    def per_bucket(a, b):
        if not len(a) or not len(b):
            return pd.DataFrame()
        m = a.merge(b, on="c_custkey")
        return m.groupby("c_custkey", as_index=False) \
            .agg(n_orders=("o_orderkey", "size"))

    got = bucketed_cogroup(da, db, per_bucket, n_buckets=8) \
        .sort_values("c_custkey").reset_index(drop=True)
    want = orders.groupby("c_custkey", as_index=False) \
        .agg(n_orders=("o_orderkey", "size")) \
        .sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_export_jsonl_gz_roundtrip(ray_session, tmp_path):
    """Export → re-ingest closed loop: write docs as .jsonl.gz parts,
    read them back through read_docs (the gz JSON-lines reader) —
    identical rows; file count respects rows_per_file."""
    import gzip
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd
    from event_deduplication_ray.pipelines.dedup_pipeline import read_docs
    from event_deduplication_ray.pipelines.export import export_jsonl_gz

    docs = pd.DataFrame({
        "doc_id": np.arange(1, 51, dtype=np.int64),
        "text": [f"doc body {i} with words" for i in range(1, 51)],
        "lang": ["en", "de"] * 25,
    })
    out = str(tmp_path / "jl")
    m = export_jsonl_gz(rd.from_pandas(docs), out, rows_per_file=20)
    assert m["n_rows"] == 50 and m["n_files"] >= 3

    files = [f for f in os.listdir(out) if f.endswith(".jsonl.gz")]
    assert len(files) == m["n_files"]
    with gzip.open(os.path.join(out, files[0]), "rt") as f:
        first = f.readline()
    assert '"text"' in first

    back = read_docs(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[["doc_id", "text", "lang"]],
        docs.sort_values("doc_id").reset_index(drop=True))


def test_export_deduped_corpus_jsonl_gz(ray_session, corpus_dir, tmp_path):
    """fmt='jsonl.gz' corpus export: same keep/drop accounting as the
    Parquet path, and the output re-ingests through read_docs."""
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import (
        dedup_path_resumable,
        read_docs,
    )
    from event_deduplication_ray.pipelines.export import (
        export_deduped_corpus,
    )

    cfg = DedupConfig(join_num_partitions=4)
    run = str(tmp_path / "run")
    res = dedup_path_resumable(f"{corpus_dir}/docs", run, cfg)
    n_clusters = res.canonical.count()

    out = str(tmp_path / "jl")
    m = export_deduped_corpus(run, out, fmt="jsonl.gz")
    assert m["n_kept"] == n_clusters
    back = read_docs(out).to_pandas()
    assert len(back) == m["n_kept"]
    assert "text" in back.columns

    import pytest

    with pytest.raises(ValueError, match="partition_by"):
        export_deduped_corpus(run, str(tmp_path / "x"),
                              partition_by=["lang"], fmt="jsonl.gz")
