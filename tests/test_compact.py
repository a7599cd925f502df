"""Small-file compaction (state/compact.py): the OPTIMIZE maintenance
verb.  Contracts: byte-equivalent content after the rewrite, manifest
row counts asserted, resume still skips compacted stages, index
serving answers unchanged, zero-row and already-compact dirs are
no-ops."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path_resumable
from event_deduplication_ray.state.compact import (
    compact_dir,
    compact_index_dir,
    compact_run_dir,
)

CFG = DedupConfig(join_num_partitions=4)


def _read_sorted(d: str) -> pd.DataFrame:
    import numpy as np

    import ray.data as rd

    df = rd.read_parquet(d).to_pandas()
    for c in df.columns:                     # list columns → hashable
        if df[c].dtype == object and len(df) and \
                isinstance(df[c].iloc[0], (np.ndarray, list)):
            df[c] = df[c].map(tuple)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _fragment(d: str, pieces: int) -> None:
    """Rewrite a stage dir as `pieces` tiny files (simulates many
    chained incremental persists)."""
    import ray.data as rd

    t = pa.Table.from_pandas(rd.read_parquet(d).to_pandas(),
                             preserve_index=False)
    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    n = max(len(t), 1)
    step = -(-n // pieces)
    for i in range(pieces):
        part = t.slice(i * step, step)
        pq.write_table(part, os.path.join(d, f"frag-{i:03d}.parquet"))


def test_compact_run_dir_content_and_resume(ray_session, corpus_dir,
                                            tmp_path):
    run = str(tmp_path / "run")
    res1 = dedup_path_resumable(f"{corpus_dir}/docs", run, CFG)
    a1 = res1.assignments.to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

    _fragment(os.path.join(run, "signatures"), 12)
    _fragment(os.path.join(run, "assignments"), 9)
    before = {s: _read_sorted(os.path.join(run, s))
              for s in ("signatures", "assignments", "canonical")}

    out = compact_run_dir(run, target_rows_per_file=10_000_000)
    assert out["signatures"]["compacted"]
    assert out["signatures"]["files_before"] == 12
    assert out["signatures"]["files_after"] == 1
    assert out["assignments"]["files_after"] == 1

    for s, want in before.items():
        pd.testing.assert_frame_equal(_read_sorted(os.path.join(run, s)),
                                      want)

    # resume on the compacted dir: stages are skipped, answers identical
    res2 = dedup_path_resumable(f"{corpus_dir}/docs", run, CFG)
    a2 = res2.assignments.to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a1, a2)


def test_compact_respects_target_rows(ray_session, corpus_dir, tmp_path):
    run = str(tmp_path / "run")
    dedup_path_resumable(f"{corpus_dir}/docs", run, CFG)
    d = os.path.join(run, "assignments")
    _fragment(d, 10)
    rows = len(_read_sorted(d))
    target = -(-rows // 3)            # want exactly 3 output files
    out = compact_dir(d, target_rows_per_file=target)
    assert out["compacted"] and out["files_after"] == 3
    # already at/below target → no-op
    out2 = compact_dir(d, target_rows_per_file=target)
    assert not out2["compacted"] and out2["files_after"] == 3


def test_compact_row_mismatch_guard(ray_session, tmp_path):
    """The torn-rewrite guard: manifest rows disagreeing with disk is
    an error, not a silent swap."""
    run = str(tmp_path / "run")
    os.makedirs(os.path.join(run, "stage_x"))
    pq.write_table(pa.table({"a": [1, 2, 3]}),
                   os.path.join(run, "stage_x", "p0.parquet"))
    with open(os.path.join(run, "manifest.json"), "w") as f:
        json.dump({"stages": {"stage_x": {"rows": 99}}}, f)
    with pytest.raises(RuntimeError, match="manifest rows"):
        compact_run_dir(run, target_rows_per_file=1)


def test_compact_index_dir_serving_identical(ray_session, tmp_path):
    import ray.data as rd
    from event_deduplication_ray.stages import textindex as TI

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["aa bb", "aa cc", "bb cc dd",
                 "newterm aa", "newterm only", "dd newterm"]})
    idx = str(tmp_path / "idx")
    TI.token_index_build(rd.from_pandas(docs.iloc[:3]), idx)
    TI.token_index_add(rd.from_pandas(docs.iloc[3:]), idx)

    shards = [s for s in os.listdir(idx) if s.startswith("tok_shard=")]
    multi = [s for s in shards
             if len([f for f in os.listdir(os.path.join(idx, s))
                     if f.endswith(".parquet")]) > 1]
    assert multi, "add should have left at least one multi-file shard"

    before = {(m, t): TI.token_index_search(idx, t.split(), mode=m)
              ["doc_id"].tolist()
              for m in ("and", "or")
              for t in ("aa bb", "newterm aa", "dd", "zz")}
    out = compact_index_dir(idx)
    for s in multi:
        assert out[s]["compacted"] and out[s]["files_after"] == 1
    for (m, t), want in before.items():
        got = TI.token_index_search(idx, t.split(), mode=m)["doc_id"].tolist()
        assert got == want, (m, t)


def test_compact_empty_and_missing_dirs(ray_session, tmp_path):
    d = str(tmp_path / "nope")
    assert compact_dir(d) == {"rows": 0, "files_before": 0,
                              "files_after": 0, "compacted": False}
    # zero-row stage (duplicate-free corpora produce these)
    z = str(tmp_path / "zero")
    os.makedirs(z)
    pq.write_table(pa.table({"a": pa.array([], pa.int64())}),
                   os.path.join(z, "part-empty.parquet"))
    out = compact_dir(z, target_rows_per_file=1)
    assert not out["compacted"] and out["rows"] == 0


def test_gc_run_dir_removes_only_leftovers(ray_session, tmp_path):
    from event_deduplication_ray.state.compact import gc_run_dir

    run = str(tmp_path / "run")
    for d in ("assignments", "assignments.tmp-abc123",
              "edges.trash-def456", "canonical.compact-9f9f9f"):
        os.makedirs(os.path.join(run, d))
    pq.write_table(pa.table({"a": [1]}),
                   os.path.join(run, "assignments", "p.parquet"))
    removed = gc_run_dir(run)
    assert removed == ["assignments.tmp-abc123",
                       "canonical.compact-9f9f9f", "edges.trash-def456"]
    assert sorted(os.listdir(run)) == ["assignments"]
    assert gc_run_dir(run) == []
