"""Snapshot-driven watcher semantics: corpus_delta classification,
deletion propagation (incremental_remove — a removed bridge doc must
SPLIT its cluster), and the full remove-then-add composition
(incremental_update) matching a fresh run on the new snapshot.

Reference analog: the watcher reacts to file change/delete events
(worker/watcher.py:20-62); the batch engine re-keys that as a
snapshot diff feeding the incremental paths.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import (
    dedup_path,
    dedup_path_resumable,
)
from event_deduplication_ray.pipelines.incremental import (
    incremental_remove,
    incremental_update,
)
from event_deduplication_ray.pipelines.snapshot import corpus_delta

CFG = DedupConfig(join_num_partitions=4)


def test_corpus_delta_classifies():
    old = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a", "b", "c"]}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": [2, 3, 4], "text": ["b", "CHANGED", "d"]}))
    d = corpus_delta(old, new, num_partitions=4)
    assert d["added"].tolist() == [4]
    assert d["removed"].tolist() == [1]
    assert d["changed"].tolist() == [3]


def test_corpus_delta_empty_on_identical():
    df = pd.DataFrame({"doc_id": [7, 8], "text": ["x", "y"]})
    d = corpus_delta(rd.from_pandas(df), rd.from_pandas(df.copy()),
                     num_partitions=4)
    assert all(len(v) == 0 for v in d.values())


def _write_synthetic_run(run_dir: str, edges: list[tuple[int, int]],
                         doc_ids=(1, 2, 3), n_files: int = 1):
    """Minimal run-dir checkpoint (extracted / signatures / edges) so
    incremental_remove's contract is testable with a HAND-CHOSEN edge
    graph — the text pipeline can't easily plant a pure bridge.
    n_files > 1 fragments the extracted stage across multiple parquet
    files (round-robin) to exercise multi-block read paths."""
    os.makedirs(f"{run_dir}/extracted")
    for f in range(n_files):
        ids = [d for i, d in enumerate(doc_ids) if i % n_files == f]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": [f"https://ex.com/{i}" for i in ids],
            "warc_ts": ["2024-01-01T00:00:00Z"] * len(ids),
            "lang": ["en"] * len(ids),
            "text": [f"text {i}" for i in ids],
        }), f"{run_dir}/extracted/part{f}.parquet")
    n = len(doc_ids)
    os.makedirs(f"{run_dir}/signatures")
    pq.write_table(pa.table({
        "doc_id": pa.array(list(doc_ids), pa.int64()),
    }), f"{run_dir}/signatures/part0.parquet")
    os.makedirs(f"{run_dir}/edges")
    pq.write_table(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64()),
        "score": pa.array([0.9] * len(edges), pa.float64()),
        "tier": pa.array(["minhash"] * len(edges), pa.string()),
    }), f"{run_dir}/edges/part0.parquet")


def test_incremental_remove_splits_bridge(tmp_path):
    """Edges 1—3, 2—3: doc 3 is the only bridge.  Removing it must
    split {1,2,3} into singletons {1} and {2} — stale labels would
    leave the halves merged."""
    run_dir = str(tmp_path / "bridge")
    _write_synthetic_run(run_dir, [(1, 3), (2, 3)])
    res = incremental_remove(run_dir, [3], CFG)
    asn = res.assignments.to_pandas().sort_values("doc_id")
    assert asn["doc_id"].tolist() == [1, 2]
    assert asn["cluster_id"].tolist() == [1, 2]     # own-id singletons
    assert res.canonical.count() == 2
    assert res.edges.count() == 0
    assert res.metrics["n_removed"] == 1


def test_incremental_remove_keeps_unaffected_component(tmp_path):
    """Edges 1—2, 2—3: removing leaf 1 keeps {2,3} merged under the
    stable min-id label 2."""
    run_dir = str(tmp_path / "leaf")
    _write_synthetic_run(run_dir, [(1, 2), (2, 3)])
    res = incremental_remove(run_dir, [1], CFG)
    asn = res.assignments.to_pandas().sort_values("doc_id")
    assert asn["doc_id"].tolist() == [2, 3]
    assert asn["cluster_id"].tolist() == [2, 2]
    assert res.canonical.count() == 1


def test_incremental_remove_empties_whole_file(tmp_path):
    """Regression (round-4 bmap bug): a fragmented multi-file
    checkpoint where removal drains EVERY row of one file leaves a
    zero-row, schema-less Arrow block flowing into the broadcast
    label-join fast path — which used to call project() before its
    emptiness guard and crash with KeyError 'doc_id'.  Round-robin
    over 3 files puts docs {1,4} / {2,5} / {3,6} per file; removing
    1 and 4 drains file 0 entirely."""
    run_dir = str(tmp_path / "fragfile")
    _write_synthetic_run(run_dir, [(2, 5), (3, 6)],
                         doc_ids=(1, 2, 3, 4, 5, 6), n_files=3)
    res = incremental_remove(run_dir, [1, 4], CFG)
    asn = res.assignments.to_pandas().sort_values("doc_id")
    assert asn["doc_id"].tolist() == [2, 3, 5, 6]
    assert asn["cluster_id"].tolist() == [2, 3, 2, 3]
    assert res.canonical.count() == 2
    assert res.metrics["n_removed"] == 2


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory, corpus_dir):
    """Snapshot A = first 90% of the 1k corpus; snapshot B = the full
    corpus with 15 of A's docs REMOVED and 10 CHANGED (html emptied,
    text token appended — the JSON-shape fallback keeps the url-hash
    doc_id stable), the remaining tail being the ADDED docs."""
    root = tmp_path_factory.mktemp("snap")
    df = pq.read_table(f"{corpus_dir}/docs").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    cut = int(len(df) * 0.9)
    a = df.iloc[:cut].reset_index(drop=True)

    b = df.copy()
    removed_urls = a["url"].iloc[5:20].tolist()
    b = b[~b["url"].isin(removed_urls)].reset_index(drop=True)
    chg_urls = set(a["url"].iloc[30:40].tolist())
    chg_mask = b["url"].isin(chg_urls)
    b.loc[chg_mask, "text"] = b.loc[chg_mask, "text"] + " zzchangetoken"
    b.loc[chg_mask, "html"] = b.loc[chg_mask, "html"].map(lambda _: b"")

    a_dir, b_dir = str(root / "a"), str(root / "b")
    os.makedirs(a_dir), os.makedirs(b_dir)
    pq.write_table(pa.Table.from_pandas(a, preserve_index=False),
                   f"{a_dir}/docs.parquet")
    pq.write_table(pa.Table.from_pandas(b, preserve_index=False),
                   f"{b_dir}/docs.parquet")
    n_added = len(df) - cut
    return a_dir, b_dir, {"removed": 15, "changed": 10, "added": n_added}


def test_incremental_update_matches_full(snapshots, tmp_path):
    a_dir, b_dir, expect = snapshots
    run_dir = str(tmp_path / "run_a")
    dedup_path_resumable(f"{a_dir}/docs.parquet", run_dir, CFG)

    delta = incremental_update(run_dir, f"{b_dir}/docs.parquet", CFG)
    assert delta["removed"] == expect["removed"]
    assert delta["changed"] == expect["changed"]
    assert delta["added"] == expect["added"]

    inc_asn = pd.read_parquet(f"{run_dir}/assignments")
    full_asn = dedup_path(f"{b_dir}/docs.parquet", CFG) \
        .assignments.to_pandas()
    assert len(inc_asn) == len(full_asn)
    m = inc_asn.merge(full_asn, on="doc_id", suffixes=("_inc", "_full"))
    assert len(m) == len(full_asn)          # same doc_id sets
    grp_inc = m.groupby("cluster_id_inc")["doc_id"].apply(frozenset)
    grp_full = m.groupby("cluster_id_full")["doc_id"].apply(frozenset)
    assert set(grp_inc) == set(grp_full)


def test_incremental_update_noop_on_identical(snapshots, tmp_path):
    """Re-presenting the SAME snapshot must classify everything
    unchanged and leave the run dir's assignments byte-stable."""
    a_dir, _, _ = snapshots
    run_dir = str(tmp_path / "run_noop")
    dedup_path_resumable(f"{a_dir}/docs.parquet", run_dir, CFG)
    before = pd.read_parquet(f"{run_dir}/assignments") \
        .sort_values("doc_id").reset_index(drop=True)
    delta = incremental_update(run_dir, f"{a_dir}/docs.parquet", CFG)
    assert delta == {"added": 0, "removed": 0, "changed": 0}
    after = pd.read_parquet(f"{run_dir}/assignments") \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_fingerprint_drift_roundtrip(ray_session, corpus_dir, tmp_path):
    """persist_fingerprint + drift: the run's own corpus estimates
    1.0; a vocab-disjoint snapshot estimates near 0; a half-replaced
    snapshot lands strictly between."""
    import numpy as np
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import (
        dedup_path_resumable,
        read_docs,
    )
    from event_deduplication_ray.pipelines.snapshot import (
        drift_vs_fingerprint,
        persist_fingerprint,
    )

    cfg = DedupConfig(join_num_partitions=4)
    run = str(tmp_path / "run")
    dedup_path_resumable(f"{corpus_dir}/docs", run, cfg)
    persist_fingerprint(run, cfg)

    same = read_docs(f"{corpus_dir}/docs")
    assert drift_vs_fingerprint(run, same, cfg) == 1.0

    rng = np.random.default_rng(2)
    vz = [f"zz{i}" for i in range(40)]
    alien = rd.from_pandas(pd.DataFrame({
        "url": [f"http://z.test/{i}" for i in range(300)],
        "text": [" ".join(rng.choice(vz, 50)) for _ in range(300)]}))
    j_alien = drift_vs_fingerprint(run, alien, cfg)
    assert j_alien < 0.1
