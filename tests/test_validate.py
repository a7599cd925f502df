"""Run-dir fsck (state/validate.py): a clean run passes every check;
targeted corruptions each trip exactly the matching check."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path_resumable
from event_deduplication_ray.state.validate import validate_run_dir

CFG = DedupConfig(join_num_partitions=4)


@pytest.fixture(scope="module")
def clean_run(ray_session, corpus_dir, tmp_path_factory):
    run = str(tmp_path_factory.mktemp("fsck") / "run")
    dedup_path_resumable(f"{corpus_dir}/docs", run, CFG)
    return run


def _copy_run(run: str, tmp_path) -> str:
    import shutil

    dst = str(tmp_path / "run")
    shutil.copytree(run, dst)
    return dst


def _rewrite_stage(run: str, stage: str, df: pd.DataFrame) -> None:
    d = os.path.join(run, stage)
    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-corrupt.parquet"))


def _read_stage(run: str, stage: str) -> pd.DataFrame:
    import ray.data as rd

    return rd.read_parquet(os.path.join(run, stage)).to_pandas()


def test_clean_run_validates(clean_run):
    out = validate_run_dir(clean_run)
    assert out["ok"], out
    assert all(c["ok"] for c in out["checks"].values())


def test_dropped_assignments_detected(clean_run, tmp_path):
    run = _copy_run(clean_run, tmp_path)
    a = _read_stage(run, "assignments")
    _rewrite_stage(run, "assignments", a.iloc[:-5])
    out = validate_run_dir(run)
    assert not out["ok"]
    assert not out["checks"]["stage_rows_match_manifest"]["ok"]
    assert not out["checks"]["assignments_cover_extracted"]["ok"]


def test_orphan_edge_detected(clean_run, tmp_path):
    run = _copy_run(clean_run, tmp_path)
    e = _read_stage(run, "edges")
    e.loc[e.index[0], "id_a"] = 999_999_999  # not an extracted doc
    _rewrite_stage(run, "edges", e)
    out = validate_run_dir(run)
    assert not out["checks"]["edge_endpoints_in_docs"]["ok"]
    assert out["checks"]["edge_endpoints_in_docs"]["orphans"] == 1


def test_wrong_rep_doc_detected(clean_run, tmp_path):
    run = _copy_run(clean_run, tmp_path)
    c = _read_stage(run, "canonical")
    # point one cluster's rep at a doc from a DIFFERENT cluster
    a = _read_stage(run, "assignments")
    other = a[a["cluster_id"] != c["cluster_id"].iloc[0]]["doc_id"].iloc[0]
    c.loc[c.index[0], "rep_doc_id"] = other
    _rewrite_stage(run, "canonical", c)
    out = validate_run_dir(run)
    assert not out["checks"]["rep_doc_in_own_cluster"]["ok"]


def test_member_count_drift_detected(clean_run, tmp_path):
    run = _copy_run(clean_run, tmp_path)
    c = _read_stage(run, "canonical")
    c.loc[c.index[0], "n_members"] = c["n_members"].iloc[0] + 3
    _rewrite_stage(run, "canonical", c)
    out = validate_run_dir(run)
    assert not out["checks"]["member_counts_sum"]["ok"]
