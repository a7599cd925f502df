"""Checkpoint/resume tests (reference pattern: hash-skip idempotent
ingestion, tests for file_processor.py:187-196)."""

import json
import os
import shutil

import pytest

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path_resumable

CFG = DedupConfig(use_substring=True, join_num_partitions=4)


@pytest.fixture()
def run_dir(tmp_path):
    return str(tmp_path / "run1")


def _asn(res):
    return (
        res.assignments.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_full_run_writes_manifest(corpus_dir, run_dir):
    res = dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    a1 = _asn(res)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        m = json.load(f)
    for stage in ("extracted", "signatures", "edges", "cc_labels",
                  "assignments", "canonical"):
        assert stage in m["stages"], stage
        assert m["stages"][stage]["rows"] > 0
    assert m["metrics"]["n_docs"] == len(a1)


def test_resume_after_late_stage_loss(corpus_dir, run_dir):
    res1 = dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    a1 = _asn(res1)
    # simulate a crash that lost the late stages
    for stage in ("cc_labels", "assignments", "canonical"):
        shutil.rmtree(os.path.join(run_dir, stage))
    res2 = dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    a2 = _asn(res2)
    assert a1.equals(a2)


def test_resume_skips_completed_stages(corpus_dir, run_dir):
    dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        m1 = json.load(f)
    # second run must not rewrite any stage (completed_at unchanged)
    dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        m2 = json.load(f)
    for stage, info in m1["stages"].items():
        assert m2["stages"][stage]["completed_at"] == info["completed_at"]


def test_config_change_invalidates(corpus_dir, run_dir):
    dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    cfg2 = CFG.with_overrides(jaccard_match=0.8)
    dedup_path_resumable(f"{corpus_dir}/docs", run_dir, cfg2)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        m = json.load(f)
    from event_deduplication_ray.state.runstate import config_fingerprint

    assert m["lineage"]["config_fingerprint"] == config_fingerprint(cfg2)


def test_run_config_persisted_and_patchable(corpus_dir, run_dir):
    """Reference Q8: the run's config is a durable, readable,
    PATCHABLE artifact — a later process can read back the exact
    config the checkpoints were written under, deep-merge a partial
    update, and the patched config invalidates stale stages via the
    fingerprint."""
    from event_deduplication_ray.state.runstate import (
        config_fingerprint,
        load_run_config,
        patch_run_config,
    )

    dedup_path_resumable(f"{corpus_dir}/docs", run_dir, CFG)
    got = load_run_config(run_dir)
    assert got == CFG                       # full round-trip, not just fp

    patched = patch_run_config(run_dir, {"jaccard_match": 0.8,
                                         "langs": ["en", "de"]})
    assert patched.jaccard_match == 0.8
    assert patched.langs == ("en", "de")    # JSON list -> tuple field
    assert patched.shingle_k == CFG.shingle_k  # untouched keys survive
    assert load_run_config(run_dir) == patched
    assert config_fingerprint(patched) != config_fingerprint(CFG)

    # running under the patched config invalidates the old stages
    dedup_path_resumable(f"{corpus_dir}/docs", run_dir, patched)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        m = json.load(f)
    assert m["lineage"]["config_fingerprint"] == config_fingerprint(patched)
