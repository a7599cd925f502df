"""CLI smoke (subprocess: the CLI owns its own Ray session)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_run_export_eval(corpus_dir, tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "clirun")
    out_dir = str(tmp_path / "cliout")

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "run", "--input", f"{corpus_dir}/docs", "--run-dir", run_dir,
         "--substring"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["n_docs"] == 1054 and metrics["n_clusters"] > 0

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "export", "--run-dir", run_dir, "--output-dir", out_dir],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(f.endswith(".parquet") for f in os.listdir(out_dir))

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "eval", "--run-dir", run_dir,
         "--golden-pairs", f"{corpus_dir}/golden_pairs.parquet"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["recall"] >= 0.99 and m["precision"] >= 0.99
