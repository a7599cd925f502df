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


@pytest.mark.parametrize("crash_stage", ["signatures", "edges"])
def test_crash_after_stage_then_resume(corpus_dir, tmp_path, crash_stage,
                                       monkeypatch):
    """Deterministic node-loss drill: EDR_CRASH_AFTER_STAGE kills the
    run right after the named checkpoint lands; the crashed dir holds
    exactly the stages up to it (atomic — never a torn stage); a plain
    rerun resumes and the final assignments equal a crash-free run."""
    crashed = str(tmp_path / f"run_crash_{crash_stage}")
    clean = str(tmp_path / "run_clean")

    monkeypatch.setenv("EDR_CRASH_AFTER_STAGE", crash_stage)
    with pytest.raises(RuntimeError, match="injected crash"):
        dedup_path_resumable(f"{corpus_dir}/docs", crashed, CFG)
    assert os.path.isdir(os.path.join(crashed, crash_stage))
    assert not os.path.isdir(os.path.join(crashed, "canonical"))
    # no torn stage: every present stage dir is marker-free and final
    assert not [d for d in os.listdir(crashed)
                if ".tmp-" in d or ".trash-" in d]

    monkeypatch.delenv("EDR_CRASH_AFTER_STAGE")
    resumed = dedup_path_resumable(f"{corpus_dir}/docs", crashed, CFG)
    fresh = dedup_path_resumable(f"{corpus_dir}/docs", clean, CFG)
    a, b = _asn(resumed), _asn(fresh)
    assert a.equals(b)
