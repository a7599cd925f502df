"""Stage 2 — MinHash / SimHash / substring-fingerprint signatures.

Stateful actor-pool stage (the reference's load-once-per-worker
pattern, /root/reference/src/event_dedup/ingestion/file_processor.py:162-171):
the permutation constants are built once in ``__init__`` and reused
for every batch.  Signature layout is
``sig8: fixed_size_list<uint8, num_perms>`` + per-band LSH keys —
fixed-width, compact through the object store (SURVEY.md §4.2 "keep
signatures compact").

Output schema (narrow; text is NOT carried):
  doc_id int64, n_tokens int64, n_shingles int64,
  band_keys fixed_size_list<int64,b> (LSH band keys, precomputed),
  sig8 fixed_size_list<uint8,P> (low-byte-folded MinHash — the full
  u64 signature never leaves this stage: verification scores on the
  folded rep anyway, and dropping the 8x-wider column cuts the pinned
  table's object-store bytes ~3.5x), simhash uint64,
  substr_fps list<uint64>  (mod-p sampled shingle fingerprints —
  position-independent, so a doc embedded inside a longer page shares
  its interior fingerprints; the suffix-array-style substring pass)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions import hashing as H


class SignatureStage:
    """Callable class for map_batches actor pools.

    ``passthrough`` columns are copied through unchanged so the
    extract → signature chain can stay one fused pipelined pass with a
    single materialization serving both the narrow verification joins
    and the doc-meta consumers (projection on a materialized dataset
    is free; a second barrier is not).
    """

    def __init__(self, cfg: DedupConfig, passthrough: tuple[str, ...] = ()):
        self.cfg = cfg
        self.passthrough = passthrough
        self.mults, self.adds = H.perm_constants(cfg.num_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if cfg.use_arrow_strings:
            from event_deduplication_ray.functions.arrow_text import (
                hash_tokens_arrow,
            )

            token_hashes, doc_lens = hash_tokens_arrow(batch["text_norm"])
        else:
            text = batch["text_norm"].to_pandas()
            flat_tokens, doc_lens = H.tokenize_offsets(text)
            token_hashes = H.hash_strings_u64(flat_tokens)
        shingles, spd = H.shingle_hashes(token_hashes, doc_lens, cfg.shingle_k, cfg.seed)
        sig = H.minhash_signatures(shingles, spd, self.mults, self.adds)
        simhash = H.simhash_fingerprints(token_hashes, doc_lens, cfg.simhash_bits)

        # substring fingerprints: mod-p sample of shingle hashes,
        # deduped per doc (content-defined selection → position-free).
        # Fully vectorized: lexsort by (doc, fp) over the sampled flat
        # array, then segment-aware unique — no per-doc Python loop.
        p = np.uint64(cfg.substring_mod_p)
        sel = shingles % p == 0
        doc_of = np.repeat(np.arange(len(spd), dtype=np.int64), spd)[sel]
        fps = shingles[sel]
        order = np.lexsort((fps, doc_of))
        doc_s, fps_s = doc_of[order], fps[order]
        if len(fps_s):
            keep = np.empty(len(fps_s), dtype=bool)
            keep[0] = True
            keep[1:] = (fps_s[1:] != fps_s[:-1]) | (doc_s[1:] != doc_s[:-1])
            doc_u, fps_u = doc_s[keep], fps_s[keep]
        else:
            doc_u, fps_u = doc_s, fps_s
        fps_per_doc = np.bincount(doc_u, minlength=len(spd)).astype(np.int64)

        from event_deduplication_ray.stages.banding import (
            minhash_band_key_matrix,
        )

        band_keys = minhash_band_key_matrix(sig, cfg)       # (n, bands) int64
        bk_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(band_keys.reshape(-1), pa.int64()), cfg.lsh_bands
        )
        sig8 = (sig & np.uint64(0xFF)).astype(np.uint8)     # folded rep
        sig8_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sig8.reshape(-1), pa.uint8()), cfg.num_perms
        )
        import pyarrow.compute as pc

        n_chars = pc.utf8_length(
            pc.fill_null(batch["text_norm"], "")
        ).cast(pa.int64())
        cols = {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": pa.array(doc_lens, pa.int64()),
            "n_shingles": pa.array(spd.astype(np.int64), pa.int64()),
            "band_keys": bk_arr,
            "sig8": sig8_arr,
            "simhash": pa.array(simhash, pa.uint64()),
            "substr_fps": pa.ListArray.from_arrays(
                pa.array(np.concatenate([[0], np.cumsum(fps_per_doc)]),
                         pa.int32()),
                pa.array(fps_u, pa.uint64()),
            ),
        }
        for c in self.passthrough:
            cols[c] = batch[c]
        return pa.table(cols)


def signatures_from_files(
    files: list[str],
    cfg: DedupConfig,
    passthrough: tuple[str, ...] = (),
) -> Dataset:
    """Raw-task read → extract → signature wave over a parquet file
    list: ONE ``ray.remote`` task per file, results assembled with
    ``from_arrow_refs`` — already materialized, one block per file.

    Why this exists alongside ``signature_stage``: Ray Data's
    streaming executor dispatches map tasks at ~20 ms apiece on this
    host (raw ``ray.remote`` dispatch measures ~0.1 ms — the gap is
    the executor, not Ray core; ROUND4_NOTES §5).  For a well-sharded
    corpus the signature phase is embarrassingly parallel per file,
    so the executor buys nothing and its serialized dispatch puts
    ~2.5 s on the 32-wide critical path.  Semantics are IDENTICAL to
    read_parquet → extract_stage → signature_stage for configs whose
    extract is purely per-batch (no canonicalize_urls shuffle) —
    equivalence-tested (test_raw_sig_wave.py).  Per-doc outputs don't
    depend on batch boundaries, so slicing per file matches Ray's
    block batching bit-for-bit.

    Multi-node note: files live on shared storage, so per-file tasks
    schedule anywhere — same locality profile as Ray Data's read
    tasks; outputs land in the local object store of whichever node
    ran the task, exactly like read→map blocks.
    """
    import ray
    import ray.data as rd

    import pyarrow.compute as pc

    from event_deduplication_ray.stages.extract import extract_batch
    from event_deduplication_ray.stages.shuffle import _task_cpus

    stage = SignatureStage(cfg, passthrough)
    narrow_cols = list(dict.fromkeys(["doc_id", "text_norm", *passthrough]))
    langs = sorted(set(cfg.langs)) if cfg.langs else None
    bs = cfg.sig_batch_size

    def file_sigs(fp: str) -> pa.Table:
        import pyarrow.parquet as pq

        t = pq.read_table(fp)
        outs = []
        for off in range(0, t.num_rows, bs):
            e = extract_batch(t.slice(off, bs), cfg=cfg)
            e = e.filter(pc.is_null(e["reject_reason"]))
            if langs:
                e = e.filter(pc.is_in(e["lang"], value_set=pa.array(langs)))
            if e.num_rows:
                outs.append(stage(e.select(narrow_cols)))
        if not outs:
            # empty / fully-rejected file: typed empty block
            e = extract_batch(t.slice(0, 0), cfg=cfg)
            outs.append(stage(e.select(narrow_cols)))
        return pa.concat_tables(outs)

    task = ray.remote(num_cpus=_task_cpus())(file_sigs)
    return rd.from_arrow_refs([task.remote(f) for f in files])


def signatures_from_extracted_files(
    files: list[str],
    cfg: DedupConfig,
    passthrough: tuple[str, ...] = (),
) -> Dataset:
    """Raw-task signature wave over an ALREADY-EXTRACTED parquet
    checkpoint (the resumable path's `extracted` stage): one
    ``ray.remote`` task per file reading ONLY the narrow columns the
    signature stage needs (doc_id, text_norm, passthrough — the text
    bodies never leave disk).  Same rationale and identical-output
    guarantee as ``signatures_from_files``, minus the extract step
    (the checkpoint is already gated/normalized)."""
    import ray
    import ray.data as rd

    from event_deduplication_ray.stages.shuffle import _task_cpus

    stage = SignatureStage(cfg, passthrough)
    narrow_cols = list(dict.fromkeys(["doc_id", "text_norm", *passthrough]))
    bs = cfg.sig_batch_size

    def file_sigs(fp: str) -> pa.Table:
        import pyarrow.parquet as pq

        t = pq.read_table(fp, columns=narrow_cols)
        outs = [stage(t.slice(off, bs))
                for off in range(0, t.num_rows, bs)]
        if not outs:
            outs.append(stage(t.slice(0, 0)))
        return pa.concat_tables(outs)

    task = ray.remote(num_cpus=_task_cpus())(file_sigs)
    return rd.from_arrow_refs([task.remote(f) for f in files])


def signature_stage(
    docs: Dataset,
    cfg: DedupConfig,
    concurrency: int | None = None,
    passthrough: tuple[str, ...] = (),
) -> Dataset:
    """docs (with doc_id + text_norm) → signatures dataset."""
    kwargs: dict = dict(batch_format="pyarrow", batch_size=cfg.sig_batch_size)
    conc = concurrency if concurrency is not None else cfg.sig_concurrency
    narrow = docs.select_columns(
        list(dict.fromkeys(["doc_id", "text_norm", *passthrough]))
    )
    if conc:
        # actor pool: constants built once per actor in __init__
        return narrow.map_batches(
            SignatureStage, fn_constructor_args=(cfg, passthrough),
            concurrency=conc, **kwargs
        )
    # stateless tasks: the instance (with precomputed constants) ships
    # in the task closure — still built once per worker process cache
    return narrow.map_batches(SignatureStage(cfg, passthrough), **kwargs)


def corpus_minhash(docs, cfg: DedupConfig) -> np.ndarray:
    """128-perm MinHash of the CORPUS — the elementwise column-min of
    the per-doc signature matrix, which by min-commutativity equals
    the MinHash of the union of every doc's shingle set.  A 1 KB
    mergeable corpus fingerprint (min-merge, any reduce-tree shape —
    the HLL contract for set SIMILARITY instead of cardinality):
    ``(sig_a == sig_b).mean()`` estimates the shingle-set Jaccard
    between two corpora/snapshots with σ = √(J(1−J)/128), without
    touching either corpus again.  Per-batch partial = one signature
    pass + one column-min; driver folds P rows of 1 KB."""
    mults, adds = H.perm_constants(cfg.num_perms, cfg.seed)
    k, seed, n_perms = cfg.shingle_k, cfg.seed, cfg.num_perms

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text_norm"].to_pandas()
        flat_tokens, doc_lens = H.tokenize_offsets(text)
        token_hashes = H.hash_strings_u64(flat_tokens)
        shingles, spd = H.shingle_hashes(token_hashes, doc_lens, k, seed)
        sig = H.minhash_signatures(shingles, spd, mults, adds)
        colmin = sig.min(axis=0) if len(sig) else \
            np.full(n_perms, np.iinfo(np.uint64).max, np.uint64)
        return pa.table({"sig": pa.array([colmin.tobytes()], pa.binary())})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    mats = [np.frombuffer(b, np.uint64) for b in parts.get("sig", [])]
    if not mats:
        return np.full(n_perms, np.iinfo(np.uint64).max, np.uint64)
    return np.minimum.reduce(mats)


def corpus_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Estimated shingle-set Jaccard between two corpus fingerprints
    (fraction of agreeing permutation minima)."""
    return float((np.asarray(sig_a, np.uint64)
                  == np.asarray(sig_b, np.uint64)).mean())
