"""Flagship pipeline: docs → signatures → candidates → verified pairs
→ clusters → canonical representatives.

Reference analog: the full pipeline driver C7
(/root/reference/src/event_dedup/matching/pipeline.py:202-268) —
blocking → scoring → clustering → synthesis — re-expressed as a lazy
Ray Data DAG.  Library code never calls ray.init (driver contract).
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

import ray.data as rd
from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.banding import (
    minhash_band_table,
    simhash_band_table,
    substring_fp_table,
)
from event_deduplication_ray.stages.cluster import (
    assignments_with_singletons,
    connected_components,
)
from event_deduplication_ray.stages.extract import extract_stage
from event_deduplication_ray.stages.pairs import (
    minhash_candidate_pairs,
    simhash_match_pairs,
    substring_match_pairs,
)
from event_deduplication_ray.stages.signatures import signature_stage
from event_deduplication_ray.stages.synthesize import (
    join_meta_labels,
    synthesize_clusters,
    synthesize_joined,
)
from event_deduplication_ray.stages.verify import match_edges, verify_pairs


@dataclass
class DedupResult:
    """Handles to every stage output (lazy Datasets unless noted)."""
    docs: Dataset              # extracted + normalized, html dropped
    signatures: Dataset        # doc_id, minhash, simhash, substr_fps
    verified_pairs: Dataset    # id_a, id_b, score, decision, tier
    edges: Dataset             # match-decision pairs (all tiers)
    assignments: Dataset       # doc_id, cluster_id (incl. singletons)
    canonical: Dataset         # one row per cluster
    rejected: Dataset | None = None  # dead-letter rows (doc_id, url, reject_reason)
    metrics: dict = field(default_factory=dict)


def read_docs(path: str) -> Dataset:
    """Read the CC-style docs table (url, warc_ts, html, text, lang).

    Parquet by default; ``.json`` / ``.jsonl`` files or directories of
    them use the JSON-lines reader (reference S1 analog — the
    reference ingests JSON event files,
    /root/reference/src/event_dedup/ingestion/file_processor.py).
    Schema validation happens downstream: rows missing required
    columns fail extraction and land in the dead-letter table rather
    than killing the run."""
    import os as _os

    def _is_json(p: str) -> bool:
        # gzipped JSON-lines included: crawl feeds usually ship as
        # .jsonl.gz, and Arrow's reader decompresses by extension
        return p.endswith((".json", ".jsonl", ".json.gz", ".jsonl.gz"))

    def _is_csv(p: str) -> bool:
        return p.endswith((".csv", ".csv.gz"))

    if _is_json(path):
        return rd.read_json(path)
    if _is_csv(path):
        return rd.read_csv(path)
    if _os.path.isdir(path):
        entries = sorted(_os.listdir(path))
        files = [
            f for f in entries
            if _os.path.isfile(_os.path.join(path, f))
            and not f.startswith((".", "_"))
        ]
        js = [f for f in files if _is_json(f)]
        cs = [f for f in files if _is_csv(f)]
        other = [f for f in files if not _is_json(f) and not _is_csv(f)]
        if js and not cs and not other:
            # pure JSON-lines directory
            return rd.read_json([_os.path.join(path, f) for f in js])
        if cs and not js and not other:
            return rd.read_csv([_os.path.join(path, f) for f in cs])
        if other and (js or cs):
            # mixed directory: a stray JSON/CSV sidecar (manifest,
            # metadata) must not flip the whole read — read only the
            # remaining data files as Parquet
            return rd.read_parquet([_os.path.join(path, f) for f in other])
        if other and len(other) >= 64:
            # a well-sharded directory (the corpus layout this engine
            # writes: ~4k rows/file) already has >= 2 blocks per core
            # at the widest bench level; Ray's default row-group
            # SplitBlocks doubles the task count, and ~20 ms of
            # per-task dispatch overhead on this host put the extra
            # tasks straight on the critical path (measured: 254
            # blocks 14.1 s vs 127 blocks 11.3 s for the signature
            # phase at 8 cpus; 4.6 vs 4.1 at 32).  One block per file
            # keeps read→map fusion and the task count matched to the
            # sharding the corpus writer chose.
            return rd.read_parquet(path, override_num_blocks=len(other))
    return rd.read_parquet(path)


def dedup_docs(
    docs: Dataset, cfg: DedupConfig | None = None,
    sigs_precomputed: Dataset | None = None,
) -> DedupResult:
    """Run the full near-duplicate pipeline on a docs Dataset.

    Everything stays lazy; consume via .canonical/.assignments (e.g.
    write_parquet).  The clustering stage internally materializes only
    the narrow edge table between label-propagation rounds.

    ``sigs_precomputed``: an already-materialized signature table
    (with url/warc_ts/lang/text_len passthrough) — dedup_path's
    raw-task wave supplies one to skip the fused read→extract→
    signature Ray Data pass; ``docs`` is still used for the lazy
    consumers (exact tier, rejected, DedupResult.docs).
    """
    cfg = cfg or DedupConfig()

    # EDR_TIMING=1: per-phase wall times to stderr (scaling diagnosis)
    _t0 = time.time()
    _timing = os.environ.get("EDR_TIMING") == "1"

    def _cpu() -> tuple[float, float]:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:9]))
        return (v[0] + v[1]) / 100.0, (v[2] + v[5] + v[6]) / 100.0

    def _mark(phase: str) -> None:
        if _timing:
            u, s = _cpu()
            print(f"[edr-timing] {phase}: {time.time() - _t0:.2f}s cum "
                  f"user={u:.0f} sys={s:.0f}",
                  file=sys.stderr, flush=True)

    # one fused pipelined pass: read → extract → signatures, with the
    # NARROW doc meta (url/ts/lang/text_len — not the text bodies)
    # passed through and pinned ONCE; every later consumer is a free
    # projection of this table.  Object-store bytes bound wall time in
    # this environment, so the pinned table excludes text/text_norm —
    # consumers that need bodies (exact tier, review/export detail)
    # recompute the cheap extract lazily via ``DedupResult.docs``.
    # (At 100 TB the equivalent pin is a run-dir parquet checkpoint —
    # see state/runstate.py.)
    extracted_lazy = extract_stage(docs, cfg)
    if sigs_precomputed is not None:
        sigs_full = sigs_precomputed
    else:
        sigs_full = signature_stage(
            extracted_lazy, cfg,
            passthrough=("url", "warc_ts", "lang", "text_len"),
        ).materialize()
    _mark("signatures_materialized")
    sigs = sigs_full
    meta = sigs_full.select_columns(
        ["doc_id", "url", "warc_ts", "lang", "text_len"]
    )

    # the candidate passes are independent branches over the pinned
    # signature table; their shuffles are eager (see shuffle.py), so
    # run the branches in driver threads to overlap their task waves
    from concurrent.futures import ThreadPoolExecutor

    # explode maps fuse INTO the shuffle split tasks (pre_fn): the
    # band/fp tables never materialize as separate datasets
    from event_deduplication_ray.stages.banding import (
        make_minhash_explode,
        make_simhash_explode,
        make_substring_explode,
    )

    def minhash_branch():
        # fully chained: band-split → pair-gen (emits pre-split by
        # id_a) → attach_a (emits pre-split by id_b) → attach_b; the
        # folded signature table is shuffled ONCE and feeds both
        # cogroups.  One submission, zero driver barriers inside.
        from event_deduplication_ray.stages.verify import folded_sigs_by_id

        sigs_by_id = folded_sigs_by_id(sigs, cfg)
        cands = minhash_candidate_pairs(
            sigs, cfg, pre_fn=make_minhash_explode(cfg), out_keys=["id_a"]
        )
        return verify_pairs(cands, None, cfg, sigs_by_id=sigs_by_id)

    def simhash_branch():
        return simhash_match_pairs(sigs, cfg, pre_fn=make_simhash_explode(cfg))

    def substring_branch():
        return substring_match_pairs(sigs, cfg, pre_fn=make_substring_explode(cfg))

    branches: dict[str, object] = {}
    # Branches run SEQUENTIALLY by default: each branch's shuffle is
    # wide enough to fill the cluster on its own, so serializing
    # bounds peak shuffle memory (and, on allocator-contended hosts,
    # measurably wins: interleaved A/B at 500 k docs / 32 cpus showed
    # 18.8 s serial vs 23.5 s overlapped, identical clusters).
    # EDR_SERIAL_BRANCHES=0 overlaps them in driver threads — useful
    # for small corpora whose branch waves underfill the machine.
    workers = 3 if os.environ.get("EDR_SERIAL_BRANCHES") == "0" else 1
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futs = {}
        if cfg.use_minhash:
            futs["minhash"] = pool.submit(minhash_branch)
        if cfg.use_simhash:
            futs["simhash"] = pool.submit(simhash_branch)
        if cfg.use_substring:
            futs["substring"] = pool.submit(substring_branch)
        for name, f in futs.items():
            branches[name] = f.result()
            _mark(f"branch_{name}")

    verified = branches.get("minhash", rd.from_items([]))
    if cfg.use_exact_tier and cfg.use_minhash:
        # expensive tier: ambiguous band re-decided by true shingle
        # Jaccard over the normalized text (reference AI-tier analog)
        from event_deduplication_ray.stages.exact_verify import exact_jaccard_tier

        verified = exact_jaccard_tier(verified, extracted_lazy, cfg)
    edges = match_edges(verified, cfg) if cfg.use_minhash else None
    for name in ("simhash", "substring"):
        if name in branches:
            ex = branches[name].select_columns(["id_a", "id_b", "score", "tier"])
            edges = ex if edges is None else edges.union(ex)

    # no select_columns wave: the CC split's fused pre-contract
    # reads only id_a/id_b and emits the narrow (u, v) star table
    labels = connected_components(edges, cfg)
    _mark("connected_components")
    # one cogroup serves both assignments and synthesis (see
    # join_meta_labels) — singletons filled inside the join
    joined = join_meta_labels(meta, labels, cfg).materialize()
    _mark("join_meta_labels")
    assignments = joined.select_columns(["doc_id", "cluster_id"])
    canonical = synthesize_joined(joined, cfg)
    _mark("synthesized")
    if cfg.coherence_min_confidence is not None:
        # C2 coherence validator: mean intra-cluster MATCH-edge score
        # joined into canonical; low-coherence clusters flagged
        from event_deduplication_ray.stages.synthesize import (
            attach_coherence,
            cluster_confidence,
        )

        confidence = cluster_confidence(edges, assignments, cfg)
        canonical = attach_coherence(canonical, confidence, cfg)

    from event_deduplication_ray.stages.extract import rejected_stage

    return DedupResult(
        docs=extracted_lazy,
        signatures=sigs,
        verified_pairs=verified,
        edges=edges,
        assignments=assignments,
        canonical=canonical,
        rejected=rejected_stage(docs, cfg),   # lazy; pays only if consumed
    )


def _sharded_parquet_files(path: str) -> list[str] | None:
    """>=64 pure-parquet shards in a directory, or None.
    EDR_RAW_SIG_WAVE=0 opts out of every raw signature wave."""
    import os as _os

    if _os.environ.get("EDR_RAW_SIG_WAVE") == "0":
        return None
    if not _os.path.isdir(path):
        return None
    entries = sorted(_os.listdir(path))
    files = [
        _os.path.join(path, f) for f in entries
        if _os.path.isfile(_os.path.join(path, f))
        and not f.startswith((".", "_"))
    ]
    if len(files) < 64:
        return None
    if any(not f.endswith((".parquet", ".pq")) for f in files):
        return None
    return files


def _raw_sig_wave_files(path: str, cfg: DedupConfig) -> list[str] | None:
    """File list for the raw-task signature wave, or None when the
    input/config isn't eligible: a directory of >=64 pure-parquet
    shards (the corpus layout this engine writes) and an extract that
    is purely per-batch (no canonicalize_urls keep-first shuffle).
    EDR_RAW_SIG_WAVE=0 opts out."""
    if cfg.canonicalize_urls:
        return None
    return _sharded_parquet_files(path)


def dedup_path(path: str, cfg: DedupConfig | None = None) -> DedupResult:
    cfg = cfg or DedupConfig()
    files = _raw_sig_wave_files(path, cfg)
    if files is not None:
        from event_deduplication_ray.stages.signatures import (
            signatures_from_files,
        )

        sigs = signatures_from_files(
            files, cfg, passthrough=("url", "warc_ts", "lang", "text_len")
        )
        return dedup_docs(read_docs(path), cfg, sigs_precomputed=sigs)
    return dedup_docs(read_docs(path), cfg)


def dedup_path_resumable(
    path: str, run_dir: str, cfg: DedupConfig | None = None
) -> DedupResult:
    """Checkpointed flagship run: every stage lands in
    ``{run_dir}/{stage}/part-*.parquet`` with lineage + metrics in the
    manifest; a rerun (same input + config) skips completed stages
    (north rule: resumable from checkpoint with per-partition lineage).
    """
    from event_deduplication_ray.state.runstate import RunState

    cfg = cfg or DedupConfig()
    rs = RunState(run_dir, cfg, path)

    from event_deduplication_ray.stages.extract import rejected_stage

    extracted = rs.stage("extracted", lambda: extract_stage(read_docs(path), cfg))
    # dead-letter table: malformed rows land in {run_dir}/_rejected
    # with a reason column; count recorded in the manifest (reference
    # dead-letter dir, ingestion/file_processor.py:259-283)
    rejected = rs.stage("_rejected", lambda: rejected_stage(read_docs(path), cfg))
    # per-lang threshold overrides (P5) need lang riding the signature
    # checkpoint so verify_pairs can resolve per-pair thresholds
    sig_pass = ("lang",) if cfg.lang_match_overrides else ()

    def compute_sigs() -> Dataset:
        # raw wave over the extracted checkpoint when it is sharded
        # enough: per-file tasks read ONLY the narrow signature
        # columns (text bodies stay on disk) and skip the streaming
        # executor's per-task dispatch — same output, see
        # signatures_from_extracted_files
        files = _sharded_parquet_files(rs.stage_dir("extracted"))
        if files is not None:
            from event_deduplication_ray.stages.signatures import (
                signatures_from_extracted_files,
            )

            return signatures_from_extracted_files(
                files, cfg, passthrough=sig_pass)
        return signature_stage(extracted, cfg, passthrough=sig_pass)

    sigs = rs.stage("signatures", compute_sigs)

    def compute_edges() -> Dataset:
        verified = (
            verify_pairs(
                minhash_candidate_pairs(minhash_band_table(sigs, cfg), cfg),
                sigs, cfg,
            )
            if cfg.use_minhash
            else None
        )
        edges = match_edges(verified, cfg) if verified is not None else None
        extra_sets = []
        if cfg.use_simhash:
            extra_sets.append(simhash_match_pairs(simhash_band_table(sigs, cfg), cfg))
        if cfg.use_substring:
            extra_sets.append(substring_match_pairs(substring_fp_table(sigs, cfg), cfg))
        for extra in extra_sets:
            ex = extra.select_columns(["id_a", "id_b", "score", "tier"])
            edges = ex if edges is None else edges.union(ex)
        return edges

    edges = rs.stage("edges", compute_edges)
    labels = rs.stage(
        "cc_labels",
        lambda: connected_components(edges.select_columns(["id_a", "id_b"]), cfg),
    )
    assignments = rs.stage(
        "assignments", lambda: assignments_with_singletons(extracted, labels, cfg)
    )
    canonical = rs.stage(
        "canonical", lambda: synthesize_clusters(extracted, assignments, cfg)
    )
    rs.record_metric("n_docs", rs.manifest["stages"]["extracted"]["rows"])
    rs.record_metric("n_rejected", rs.manifest["stages"]["_rejected"]["rows"])
    rs.record_metric("n_edges", rs.manifest["stages"]["edges"]["rows"])
    rs.record_metric("n_clusters", rs.manifest["stages"]["canonical"]["rows"])

    return DedupResult(
        docs=extracted, signatures=sigs, verified_pairs=edges, edges=edges,
        assignments=assignments, canonical=canonical, rejected=rejected,
        metrics=dict(rs.manifest["metrics"]),
    )
