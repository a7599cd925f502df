"""Two-node shuffle rehearsal (VERDICT r3 item 6): the custom hash
shuffle is validated single-node everywhere else; this drill starts a
REAL 2-raylet Ray cluster (`ray start --head` + one worker process —
separate raylets, separate object stores, the same topology a
multi-node deployment has minus the physical NIC), runs the flagship
CLI against it with the wire codec ON (EDR_SHUFFLE_CODEC=lz4 — the
multi-node configuration, exercising the encode/decode path every
sub-table crosses), and asserts the run output is identical to a
single-node run of the same corpus.

Slow-marked: cluster bootstrap is ~10 s and the drill runs the
flagship twice.  `pytest -m slow` runs it.
"""

import json
import os
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

PORT = 6412
ADDR = f"127.0.0.1:{PORT}"


def _run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def _cli(docs, run_dir, env_extra):
    env = dict(os.environ, PYTHONPATH="/root/repo", **env_extra)
    out = _run(
        [sys.executable, "-m", "event_deduplication_ray.cli",
         "--num-cpus", "4", "run", "--input", docs, "--run-dir", run_dir,
         "--simhash", "--substring"],
        env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_two_node_cluster_matches_single_node(tmp_path):
    from event_deduplication_ray import fixtures as F

    d = F.materialize_corpus(str(tmp_path / "corpus"), 3000, seed=9)
    docs = f"{d}/docs"

    single = _cli(docs, str(tmp_path / "run_single"), {})

    env = dict(os.environ)
    try:
        head = _run(["ray", "start", "--head", f"--port={PORT}",
                     "--num-cpus", "4", "--include-dashboard=false",
                     "--disable-usage-stats"], env=env, timeout=120)
        assert head.returncode == 0, head.stderr[-2000:]
        worker = _run(["ray", "start", f"--address={ADDR}",
                       "--num-cpus", "4", "--disable-usage-stats"],
                      env=env, timeout=120)
        assert worker.returncode == 0, worker.stderr[-2000:]

        # wait for both raylets to register
        probe = (
            "import ray, sys\n"
            f"ray.init(address='{ADDR}', logging_level='ERROR')\n"
            "alive = [n for n in ray.nodes() if n['Alive']]\n"
            "sys.exit(0 if len(alive) >= 2 else 1)\n"
        )
        for _ in range(30):
            if _run([sys.executable, "-c", probe], timeout=60).returncode == 0:
                break
            time.sleep(1.0)
        else:
            pytest.fail("second raylet never registered")

        clustered = _cli(docs, str(tmp_path / "run_cluster"),
                         {"EDR_RAY_ADDRESS": ADDR,
                          "EDR_SHUFFLE_CODEC": "lz4"})
    finally:
        _run(["ray", "stop", "--force"], timeout=120)

    assert clustered == single, (clustered, single)
