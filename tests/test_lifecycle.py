"""Whole-lifecycle CLI e2e: one subprocess chain exercising the
operational story end to end — run → incremental add (persisted) →
compact → fsck → deduped-corpus export → eval.  Each verb has its own
e2e; this catches their interactions (fsck after compact after a
chained add is the state a long-lived deployment actually lives in).
"""

import json
import os
import subprocess
import sys

import pytest


def _cli(args, env, timeout=600):
    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli",
         "--num-cpus", "4", *args],
        env=env, capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (args[0], r.stderr[-2000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_full_lifecycle_chain(corpus_dir, tmp_path):
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "run")

    # split the fixture corpus: initial run on most, add the rest
    docs = pq.read_table(f"{corpus_dir}/docs")
    base, extra = docs.slice(0, len(docs) - 60), docs.slice(len(docs) - 60)
    base_dir, extra_dir = tmp_path / "base", tmp_path / "extra"
    base_dir.mkdir(), extra_dir.mkdir()
    pq.write_table(base, str(base_dir / "d.parquet"))
    pq.write_table(extra, str(extra_dir / "d.parquet"))

    m_run = _cli(["run", "--input", str(base_dir), "--run-dir", run_dir,
                  "--substring"], env)
    assert m_run["n_docs"] == len(base)

    m_add = _cli(["add", "--run-dir", run_dir, "--input", str(extra_dir),
                  "--persist"], env)
    assert m_add["persisted"] and m_add["n_docs"] == len(docs)

    m_cp = _cli(["compact", "--run-dir", run_dir], env)
    assert all(v["rows"] >= 0 for k, v in m_cp.items()
               if isinstance(v, dict))

    m_fsck = _cli(["fsck", "--run-dir", run_dir], env)
    assert m_fsck["ok"], m_fsck

    out = str(tmp_path / "corpus")
    m_exp = _cli(["export", "--run-dir", run_dir, "--output-dir", out,
                  "--corpus"], env)
    assert m_exp["n_kept"] + m_exp["n_dropped"] == len(docs)

    m_eval = _cli(["eval", "--run-dir", run_dir, "--golden-pairs",
                   f"{corpus_dir}/golden_pairs.parquet"], env)
    assert m_eval["recall"] >= 0.99 and m_eval["precision"] >= 0.99
