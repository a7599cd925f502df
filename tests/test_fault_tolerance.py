"""Worker-death drill: SIGKILL live Ray workers mid-flagship and
assert the run still completes with output identical to a clean run.

This is the single-node stand-in for the multi-node failure mode that
matters at 100 TB — an executor lost mid-shuffle.  Ray's lineage
reconstruction re-executes the lost tasks (the custom shuffle is pure
tasks over immutable inputs, so replays are deterministic); the gate
proves the engine's stages are actually replay-safe, not just assumed
so.  Reference parity: the reference survives worker-process loss via
its transactional ingest (src/event_dedup/worker/orchestrator.py);
the batch-engine equivalent is deterministic task replay.

Only workers that are process-tree DESCENDANTS of the subprocess are
killed (PPid chain walked via /proc), so the pytest session's own Ray
workers are never touched — PID ordering is no guarantee under PID
wraparound or when pgrep matches an unrelated process.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest


def _is_descendant_of(pid: int, ancestor: int) -> bool:
    """Walk the PPid chain in /proc; True if `ancestor` is on it."""
    seen = set()
    while pid > 1 and pid not in seen:
        seen.add(pid)
        try:
            with open(f"/proc/{pid}/status") as f:
                ppid = next((int(ln.split()[1]) for ln in f
                             if ln.startswith("PPid:")), 0)
        except OSError:
            return False
        if ppid == ancestor:
            return True
        pid = ppid
    return False


def _cli_run(docs: str, run_dir: str, kill_n: int) -> tuple[dict, int]:
    p = subprocess.Popen(
        [sys.executable, "-m", "event_deduplication_ray.cli",
         "--num-cpus", "4", "run", "--input", docs, "--run-dir", run_dir,
         "--simhash", "--substring"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=dict(os.environ, PYTHONPATH="/root/repo"))
    kills, t0 = 0, time.time()
    while kill_n and p.poll() is None and time.time() - t0 < 45 \
            and kills < kill_n:
        time.sleep(2.0 if kills == 0 else 1.0)
        if time.time() - t0 < 5:
            continue
        out = subprocess.run(["pgrep", "-f", "ray::"],
                             capture_output=True, text=True).stdout.split()
        mine = [int(x) for x in out
                if _is_descendant_of(int(x), p.pid)]
        if mine:
            try:
                os.kill(mine[len(mine) // 2], signal.SIGKILL)
                kills += 1
            except ProcessLookupError:
                pass
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"run failed (kills={kills})"
    return json.loads(out.strip().splitlines()[-1]), kills


def test_flagship_survives_worker_kills(tmp_path):
    from event_deduplication_ray import fixtures as F

    d = F.materialize_corpus(str(tmp_path / "corpus"), 5000, seed=42)
    clean, _ = _cli_run(f"{d}/docs", str(tmp_path / "run_clean"), 0)
    killed, kills = _cli_run(f"{d}/docs", str(tmp_path / "run_kill"), 2)
    if kills == 0:
        pytest.skip("run finished before any worker could be killed")
    assert killed == clean, f"output diverged after {kills} worker kills"
