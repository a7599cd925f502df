"""Small-file compaction for persisted artifacts.

Chained incremental ingest (``persist_incremental``) and index adds
(``token_index_add`` / ``srp_index_add`` / ``ivf_index_add``) append or
rewrite Parquet in whatever block granularity the producing pipeline
had — after many small batches a stage or index shard accumulates many
tiny files, and at 100 TB the "small files problem" dominates read
planning and metadata cost.  This module is the maintenance verb that
fixes it (the batch-engine analog of Delta/Iceberg ``OPTIMIZE``):
rewrite a directory into ``ceil(rows / target_rows_per_file)`` files.

Scale shape: the rewrite is SHUFFLE-FREE — ``read_parquet`` with
``override_num_blocks`` makes each output file a concatenation of
whole input files (one read task per output block), so bytes move
exactly once and never cross a partition exchange.  The swap is
atomic-ish: the new directory is fully written and row-counted before
the old one is moved aside (tmp → trash rename window; a crash between
the two renames leaves the stage dir absent, which resume treats as
not-done and recomputes — never a torn mix of old and new files).

Reference parity: the reference's clear-and-replace persistence
(SURVEY §2 C9) is the same contract at table granularity.
"""

from __future__ import annotations

import os
import shutil
import uuid

import ray.data as rd


def _parquet_files(d: str) -> list[str]:
    try:
        return sorted(f for f in os.listdir(d)
                      if f.endswith(".parquet") and not f.startswith("."))
    except FileNotFoundError:
        return []


def compact_dir(data_dir: str,
                target_rows_per_file: int = 1_000_000) -> dict:
    """Rewrite ``data_dir``'s Parquet files into
    ``max(1, ceil(rows / target_rows_per_file))`` files.  No-op (and
    no rewrite cost) when the directory already has that few files.
    Returns ``{"rows", "files_before", "files_after", "compacted"}``.
    """
    files = _parquet_files(data_dir)
    if not files:
        return {"rows": 0, "files_before": 0, "files_after": 0,
                "compacted": False}
    paths = [os.path.join(data_dir, f) for f in files]
    rows = rd.read_parquet(paths).count()
    want = max(1, -(-rows // max(target_rows_per_file, 1)))
    if len(files) <= want or rows == 0:
        return {"rows": int(rows), "files_before": len(files),
                "files_after": len(files), "compacted": False}

    tmp = data_dir + f".compact-{uuid.uuid4().hex[:8]}"
    # one read task per output block → each output file is a pure
    # concat of whole input files (no shuffle, single copy)
    rd.read_parquet(paths, override_num_blocks=want).write_parquet(tmp)
    got = rd.read_parquet(tmp).count()
    if got != rows:                      # never swap in a torn rewrite
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch in {data_dir}: {got} != {rows}")
    trash = data_dir + f".trash-{uuid.uuid4().hex[:8]}"
    os.rename(data_dir, trash)
    os.rename(tmp, data_dir)
    shutil.rmtree(trash, ignore_errors=True)
    return {"rows": int(rows), "files_before": len(files),
            "files_after": len(_parquet_files(data_dir)),
            "compacted": True}


def compact_run_dir(run_dir: str,
                    target_rows_per_file: int = 1_000_000) -> dict:
    """Compact every completed stage of a run dir (manifest-driven, so
    stray tmp/trash dirs are never touched).  Content-preserving: the
    manifest's recorded row counts are asserted against the rewritten
    stages, and resume semantics are unchanged (``is_done`` only needs
    the directory to exist)."""
    import json

    manifest_path = os.path.join(run_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    out: dict = {}
    for stage, meta in sorted(manifest.get("stages", {}).items()):
        d = os.path.join(run_dir, stage)
        if not os.path.isdir(d):
            continue
        res = compact_dir(d, target_rows_per_file)
        if meta.get("rows") is not None and res["rows"] != meta["rows"]:
            raise RuntimeError(
                f"stage {stage}: manifest rows {meta['rows']} != "
                f"{res['rows']} on disk")
        out[stage] = res
    return out


def gc_run_dir(run_dir: str) -> list[str]:
    """Remove crash leftovers: ``*.tmp-*`` (write_stage /
    persist_incremental), ``*.trash-*`` and ``*.compact-*`` (this
    module) directories.  Only directories whose name carries one of
    those markers are touched — live stages never match, so gc is
    always safe to run, including concurrently with reads of the
    final stage dirs (the leftovers are by construction unreferenced:
    each producer renames its tmp away before declaring a stage
    done)."""
    markers = (".tmp-", ".trash-", ".compact-")
    removed: list[str] = []
    for name in sorted(os.listdir(run_dir)):
        p = os.path.join(run_dir, name)
        if os.path.isdir(p) and any(m in name for m in markers):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    return removed


def compact_index_dir(index_dir: str,
                      target_rows_per_file: int = 1_000_000) -> dict:
    """Compact a hive-partitioned index directory (the token /
    SRP / IVF index layouts: one subdirectory per shard key, files
    appended per incremental add).  Each shard compacts independently
    — serving reads whole shard dirs, so per-shard file merges can
    never change a query answer (hit counts sum across files)."""
    out: dict = {}
    for sub in sorted(os.listdir(index_dir)):
        d = os.path.join(index_dir, sub)
        if os.path.isdir(d) and "=" in sub:
            res = compact_dir(d, target_rows_per_file)
            if res["files_before"]:
                out[sub] = res
    return out
