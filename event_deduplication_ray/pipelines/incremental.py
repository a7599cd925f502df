"""Incremental update: add a batch of new documents to a completed
(checkpointed) run without re-verifying old-vs-old pairs.

Reference analog: C6 enrichment with downgrade prevention
(/root/reference/src/event_dedup/canonical/enrichment.py:19-64) and
the re-cluster-after-edits path C8 (matching/pipeline.py:317-379):
reuse everything already computed (old signatures, old verified match
edges from the run-dir checkpoint), compute only the NEW work (new
signatures; candidate pairs touching at least one new doc; their
verification), then rerun the cheap downstream stages (union-find,
synthesis) on the combined graph.

Scale contract (round-3 rework): every shuffle is O(new batch), not
O(corpus).  The new docs' band/fp keys — genuinely small: |new| ×
bands rows — are collected and broadcast (``ray.put`` once, read per
task); the old corpus's band tables are SEMI-JOINED to that key set
inside the linear explode scan, so only rows from buckets the new
docs actually touch enter pair generation.  Verification likewise
shuffles only the signatures of docs that appear in a candidate pair
(broadcast id semi-join), so the expensive cogroups never move the
full corpus.  The reference's watcher has the same shape: one file's
arrival never re-scores the world (worker/orchestrator.py:174-260).
The only remaining O(corpus) work is the unavoidable linear re-read
of the signature checkpoint (no shuffle) and the final
clustering/synthesis over the combined graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import DedupResult, read_docs
from event_deduplication_ray.stages.banding import (
    minhash_band_table,
    simhash_band_table,
    substring_fp_table,
)
from event_deduplication_ray.stages.cluster import connected_components
from event_deduplication_ray.stages.extract import extract_stage
from event_deduplication_ray.stages.pairs import (
    minhash_candidate_pairs,
    simhash_match_pairs,
    substring_match_pairs,
)
from event_deduplication_ray.stages.signatures import signature_stage
from event_deduplication_ray.stages.synthesize import (
    join_meta_labels,
    synthesize_joined,
)
from event_deduplication_ray.stages.verify import match_edges, verify_pairs


def semi_join_broadcast(
    ds: Dataset, col: str, values: np.ndarray, negate: bool = False
) -> Dataset:
    """Keep rows whose ``col`` is in ``values`` (sorted int64 array,
    broadcast ONCE via ray.put and read zero-copy in every task — the
    small side never re-ships per batch).  ``negate=True`` keeps the
    complement (broadcast anti-join)."""
    ref = ray.put(np.sort(np.asarray(values, dtype=np.int64)))

    def f(t: pa.Table) -> pa.Table:
        vals = ray.get(ref)
        keys = t[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vals, keys)
        pos_c = np.minimum(pos, len(vals) - 1) if len(vals) else pos
        mask = (vals[pos_c] == keys) if len(vals) else np.zeros(len(keys), bool)
        if negate:
            mask = ~mask
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def _affected_band_table(
    new_band: Dataset, old_sigs: Dataset, explode_table, cfg: DedupConfig,
    key_col: str,
) -> tuple[Dataset, np.ndarray]:
    """Union of the new docs' band rows with the old corpus's rows in
    buckets the new docs touch.  Returns (affected_rows, new_keys);
    the semi-join runs inside the old table's linear explode scan —
    no O(corpus) rows ever enter the pair-gen shuffle."""
    kdf = new_band.select_columns([key_col]).to_pandas()
    if key_col not in kdf.columns:
        # Ray's to_pandas drops a 0-row Dataset's schema — a batch of
        # short all-unique docs can legitimately emit ZERO band/fp
        # rows for a tier (e.g. mod-p substring sampling selects none)
        kdf = pd.DataFrame({key_col: pd.Series(dtype="int64")})
    new_keys = np.unique(kdf[key_col].to_numpy()).astype(np.int64)
    old_rows = semi_join_broadcast(explode_table(old_sigs, cfg), key_col, new_keys)
    return new_band.union(old_rows), new_keys


def _new_edges(
    old_meta: Dataset, old_sigs: Dataset, all_sigs: Dataset,
    new_full: Dataset, new_ids_arr: np.ndarray, cfg: DedupConfig,
) -> tuple[list[Dataset], dict]:
    """Verified match edges touching >= 1 new doc — the shared core
    of incremental_add (which persists them) and screen_docs (which
    only reports them).  Every shuffle is O(new batch): band tables
    are semi-joined to the new docs' key set, verify cogroups move
    only signatures of docs occurring in a candidate pair."""
    metrics: dict = {}
    pair_sets: list[Dataset] = []

    def touching_new(t: pa.Table) -> pa.Table:
        mask = np.isin(t["id_a"].to_numpy(), new_ids_arr) | np.isin(
            t["id_b"].to_numpy(), new_ids_arr
        )
        return t.filter(pa.array(mask))

    if cfg.use_minhash:
        band, keys = _affected_band_table(
            minhash_band_table(new_full, cfg), old_sigs, minhash_band_table,
            cfg, "band_key",
        )
        band = band.materialize()          # O(new keys' buckets) rows
        metrics["minhash_new_keys"] = int(len(keys))
        metrics["minhash_band_rows"] = int(band.count())
        cands = minhash_candidate_pairs(band, cfg)
        # affected buckets still contain old-old pairs (already in the
        # old edge set) — keep only pairs with >= 1 new side
        cands_new = cands.map_batches(
            touching_new, batch_format="pyarrow"
        ).materialize()
        pair_id_cols = cands_new.select_columns(["id_a", "id_b"]).to_pandas()
        if "id_a" not in pair_id_cols.columns:
            # Ray's to_pandas drops a 0-row Dataset's schema — an
            # all-new unique batch legitimately yields zero candidates
            pair_id_cols = pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64")})
        pair_ids = np.unique(
            np.concatenate([
                pair_id_cols["id_a"].to_numpy(), pair_id_cols["id_b"].to_numpy(),
                new_ids_arr,
            ])
        ).astype(np.int64)
        metrics["minhash_candidates"] = int(len(pair_id_cols))
        # the verify cogroups shuffle ONLY the signatures of docs that
        # occur in a candidate pair — never the full corpus
        sigs_touched = semi_join_broadcast(all_sigs, "doc_id", pair_ids)
        verified_new = verify_pairs(cands_new, sigs_touched, cfg)
        if cfg.use_exact_tier:
            # same ambiguous-band re-scoring as the full pipeline —
            # an incremental run configured with the exact tier must
            # not silently decide new-doc pairs at the cheap tier only
            from event_deduplication_ray.stages.exact_verify import (
                exact_jaccard_tier,
            )

            docs_touched = semi_join_broadcast(
                old_meta.select_columns(["doc_id", "text_norm"]).union(
                    new_full.select_columns(["doc_id", "text_norm"])
                ),
                "doc_id", pair_ids,
            )
            verified_new = exact_jaccard_tier(verified_new, docs_touched, cfg)
        pair_sets.append(match_edges(verified_new, cfg))
    if cfg.use_simhash:
        band, keys = _affected_band_table(
            simhash_band_table(new_full, cfg), old_sigs, simhash_band_table,
            cfg, "band_key",
        )
        metrics["simhash_new_keys"] = int(len(keys))
        sim = simhash_match_pairs(band, cfg)
        sim_new = sim.map_batches(touching_new, batch_format="pyarrow").select_columns(
            ["id_a", "id_b", "score", "tier"]
        )
        pair_sets.append(sim_new)
    if cfg.use_substring:
        band, keys = _affected_band_table(
            substring_fp_table(new_full, cfg), old_sigs, substring_fp_table,
            cfg, "fp_key",
        )
        metrics["substring_new_keys"] = int(len(keys))
        sub = substring_match_pairs(band, cfg)
        sub_new = sub.map_batches(touching_new, batch_format="pyarrow").select_columns(
            ["id_a", "id_b", "score", "tier"]
        )
        pair_sets.append(sub_new)
    return pair_sets, metrics


def incremental_add(
    run_dir: str, new_docs_path: str, cfg: DedupConfig | None = None
) -> DedupResult:
    """Combine a checkpointed run (dedup_path_resumable at run_dir)
    with a new docs batch; returns the combined DedupResult."""
    cfg = cfg or DedupConfig()

    old_meta = rd.read_parquet(f"{run_dir}/extracted")
    old_sigs = rd.read_parquet(f"{run_dir}/signatures")
    old_edges = rd.read_parquet(f"{run_dir}/edges")

    new_extracted = extract_stage(read_docs(new_docs_path), cfg)
    new_full = signature_stage(
        new_extracted, cfg,
        passthrough=("url", "warc_ts", "lang", "text", "text_norm"),
    ).materialize()

    new_ids = set(
        new_full.select_columns(["doc_id"]).to_pandas()["doc_id"].tolist()
    )
    new_ids_arr = np.array(sorted(new_ids), dtype=np.int64)

    # a batch id already in the corpus is a RE-CRAWL of the same url
    # (ids are url hashes): silently unioning it would duplicate the
    # doc's signature/meta rows through every downstream join.  The
    # correct verb is incremental_update (remove + re-add, content
    # refresh included) — fail loudly instead of corrupting.
    n_overlap = semi_join_broadcast(
        old_sigs.select_columns(["doc_id"]), "doc_id", new_ids_arr
    ).count()
    if n_overlap:
        raise ValueError(
            f"incremental_add: {n_overlap} doc id(s) in the new batch "
            "already exist in the run dir (same url re-crawled). Use "
            "incremental_update to refresh existing docs.")

    sig_cols = ["doc_id", "n_chars", "n_tokens", "n_shingles", "band_keys",
                "sig8", "simhash", "substr_fps"]
    if cfg.lang_match_overrides:
        # per-lang thresholds (P5): lang must ride the signature rows
        # into verify_pairs.  Checkpoints written by
        # dedup_path_resumable under the same config carry it (the
        # config fingerprint invalidates older lang-less checkpoints).
        sig_cols.append("lang")
    all_sigs = old_sigs.select_columns(sig_cols).union(
        new_full.select_columns(sig_cols)
    )

    metrics: dict = {"n_new_docs": len(new_ids)}
    pair_sets, tier_metrics = _new_edges(
        old_meta, old_sigs, all_sigs, new_full, new_ids_arr, cfg
    )
    metrics.update(tier_metrics)
    edges = old_edges.select_columns(["id_a", "id_b", "score", "tier"])
    for extra in pair_sets:
        edges = edges.union(extra.select_columns(["id_a", "id_b", "score", "tier"]))
    edges = edges.materialize()

    all_meta = old_meta.select_columns(
        ["doc_id", "url", "warc_ts", "lang", "text", "text_norm"]
    ).union(
        new_full.select_columns(
            ["doc_id", "url", "warc_ts", "lang", "text", "text_norm"]
        )
    ).materialize()

    labels = connected_components(edges.select_columns(["id_a", "id_b"]), cfg)
    joined = join_meta_labels(all_meta, labels, cfg).materialize()
    assignments = joined.select_columns(["doc_id", "cluster_id"])
    canonical = synthesize_joined(joined, cfg)

    return DedupResult(
        docs=all_meta, signatures=all_sigs, verified_pairs=edges, edges=edges,
        assignments=assignments, canonical=canonical,
        metrics=metrics,
    )


def persist_incremental(
    run_dir: str, res: "DedupResult", cfg: DedupConfig, batch_path: str
) -> None:
    """Fold an ``incremental_add`` result back into its run dir so the
    NEXT batch chains on it — the missing half of the reference's
    watcher loop (worker/orchestrator.py processes file after file
    against persistent state; without this, a run dir supported
    exactly one add).

    Each stage is rewritten atomically (write_stage: tmp dir → rename,
    and the lazy union feeding the write streams from the OLD stage
    files, which are only replaced after the write completes), so a
    crash mid-persist leaves the previous checkpoint readable.  The
    manifest's lineage records the last folded batch; its fingerprint
    deliberately differs from a fresh full run's, so
    ``dedup_path_resumable`` on the same dir recomputes rather than
    trusting chained stages for a different input.
    """
    from event_deduplication_ray.state.runstate import RunState

    rs = RunState(run_dir, cfg, batch_path)
    rs.manifest["lineage"]["chained_from"] = run_dir
    rs.write_stage("extracted", res.docs)
    rs.write_stage("signatures", res.signatures)
    rs.write_stage("edges", res.edges)
    rs.write_stage("assignments", res.assignments)
    rs.write_stage("canonical", res.canonical)
    for k, v in (res.metrics or {}).items():
        rs.manifest["metrics"][f"incremental_{k}"] = v
    rs._save()


def incremental_remove(
    run_dir: str, removed_ids, cfg: DedupConfig | None = None
) -> DedupResult:
    """Deletion propagation — the watcher's REMOVE path (and the
    GDPR-delete path): drop the docs, drop every edge touching them,
    and re-run connected components over the REMAINING edges so a
    removed bridge doc correctly SPLITS its cluster (keeping stale
    labels would silently leave the two halves merged).  The removed
    id set is broadcast once (it is the delta, genuinely small);
    every filter is a linear scan with no shuffle; the re-CC costs
    the edge graph, which is tiny next to the corpus, and min-id
    labeling keeps untouched components' cluster ids stable."""
    from event_deduplication_ray.stages.cluster import connected_components
    from event_deduplication_ray.stages.synthesize import (
        join_meta_labels,
        synthesize_joined,
    )

    cfg = cfg or DedupConfig()
    removed = np.unique(np.asarray(list(removed_ids), dtype=np.int64))
    rref = ray.put(removed)

    def drop_docs(t: pa.Table) -> pa.Table:
        rm = ray.get(rref)
        return t.filter(pa.array(~np.isin(t["doc_id"].to_numpy(), rm)))

    def drop_edges(t: pa.Table) -> pa.Table:
        rm = ray.get(rref)
        mask = ~(np.isin(t["id_a"].to_numpy(), rm)
                 | np.isin(t["id_b"].to_numpy(), rm))
        return t.filter(pa.array(mask))

    # meta/sigs stay LAZY: each is a linear filtered scan consumed by
    # at most two sinks (join + persist), and materializing would pin
    # the corpus text in the object store.  Only the edge graph (tiny
    # next to the corpus) is pinned for the CC rounds.
    meta = rd.read_parquet(f"{run_dir}/extracted") \
        .map_batches(drop_docs, batch_format="pyarrow")
    sigs = rd.read_parquet(f"{run_dir}/signatures") \
        .map_batches(drop_docs, batch_format="pyarrow")
    edges = rd.read_parquet(f"{run_dir}/edges") \
        .map_batches(drop_edges, batch_format="pyarrow").materialize()

    labels = connected_components(edges.select_columns(["id_a", "id_b"]), cfg)
    joined = join_meta_labels(meta, labels, cfg).materialize()
    assignments = joined.select_columns(["doc_id", "cluster_id"])
    canonical = synthesize_joined(joined, cfg)
    return DedupResult(
        docs=meta, signatures=sigs, verified_pairs=edges, edges=edges,
        assignments=assignments, canonical=canonical,
        metrics={"n_removed": int(len(removed))},
    )


def incremental_update(
    run_dir: str, snapshot_path: str, cfg: DedupConfig | None = None,
    scratch_dir: str | None = None,
) -> dict:
    """Full watcher semantics from a corpus SNAPSHOT: diff it against
    the run dir's extracted state (``snapshot.corpus_delta``), then
    remove (removed ∪ changed — a changed doc keeps its url-hash
    doc_id, so its old rows must leave before re-ingest) and re-add
    (added ∪ changed), persisting each half back into the run dir so
    the next snapshot chains.  A doc whose raw form changed but whose
    extracted text hashes equal is classified unchanged; an html
    corpus diffing raw-vs-extracted may over-classify changed — the
    remove+add composition stays correct, just does extra work.
    Returns the delta counts."""
    import os
    import shutil
    import uuid

    from event_deduplication_ray.pipelines.snapshot import corpus_delta
    from event_deduplication_ray.stages.extract import extract_batch

    cfg = cfg or DedupConfig()
    old = rd.read_parquet(f"{run_dir}/extracted") \
        .select_columns(["doc_id", "text"])
    new = read_docs(snapshot_path)
    new_ex = extract_stage(new, cfg).select_columns(["doc_id", "text"])
    delta = corpus_delta(old, new_ex, cfg.join_num_partitions)

    to_remove = np.union1d(delta["removed"], delta["changed"])
    if len(to_remove):
        res = incremental_remove(run_dir, to_remove, cfg)
        persist_incremental(run_dir, res, cfg, snapshot_path)

    to_ingest = np.union1d(delta["added"], delta["changed"])
    if len(to_ingest):
        # added/changed ids live in the EXTRACTED id space, which is
        # exactly what extract_batch recomputes per raw row (it is
        # row-aligned: rejection is a tag column, rows are never
        # dropped or reordered) — so the raw snapshot rows to
        # re-ingest are selected by extracting ids per batch and
        # filtering against the broadcast delta set.
        kref = ray.put(to_ingest)

        def keep_raw(t: pa.Table) -> pa.Table:
            ids = ray.get(kref)
            ex = extract_batch(t, cfg)
            return t.filter(pa.array(np.isin(ex["doc_id"].to_numpy(), ids)))

        scratch = scratch_dir or os.path.join(
            run_dir, f"_delta-{uuid.uuid4().hex[:8]}")
        os.makedirs(scratch, exist_ok=True)
        # write the RAW delta rows; extract re-runs inside
        # incremental_add (which also persists doc provenance columns)
        new.map_batches(keep_raw, batch_format="pyarrow") \
            .write_parquet(scratch)
        res = incremental_add(run_dir, scratch, cfg)
        persist_incremental(run_dir, res, cfg, snapshot_path)
        if scratch_dir is None:
            shutil.rmtree(scratch, ignore_errors=True)

    return {k: int(len(v)) for k, v in delta.items()}


def screen_docs(
    run_dir: str, new_docs_path: str, cfg: DedupConfig | None = None
) -> pd.DataFrame:
    """READ-ONLY near-dup screening of a candidate batch against a
    checkpointed corpus: for every new doc — is it a duplicate, of
    what, at which tier — WITHOUT mutating the run dir, re-clustering
    or paying any O(corpus) shuffle.  The admission-control verb in
    front of incremental_add: screen first, ingest only what's novel
    (the reference's watcher admits per file,
    worker/orchestrator.py:174-260; this decides per doc).

    Returns (doc_id, is_dup, dup_of, score, tier), one row per new
    doc; dup_of = -1 for novel docs.  A new doc is flagged against
    the corpus or against a SMALLER-id batch mate (keep-first within
    the batch), so admitting the is_dup == False rows reproduces
    exact keep-first semantics.  Driver traffic is bounded by the
    batch's edge count, never the corpus.
    """
    cfg = cfg or DedupConfig()
    old_meta = rd.read_parquet(f"{run_dir}/extracted")
    old_sigs = rd.read_parquet(f"{run_dir}/signatures")

    new_full = signature_stage(
        extract_stage(read_docs(new_docs_path), cfg), cfg,
        passthrough=("url", "warc_ts", "lang", "text", "text_norm"),
    ).materialize()
    id_df = new_full.select_columns(["doc_id"]).to_pandas()
    if "doc_id" not in id_df.columns:
        id_df = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    new_ids_arr = np.unique(id_df["doc_id"].to_numpy()).astype(np.int64)

    sig_cols = ["doc_id", "n_chars", "n_tokens", "n_shingles", "band_keys",
                "sig8", "simhash", "substr_fps"]
    if cfg.lang_match_overrides:
        sig_cols.append("lang")
    all_sigs = old_sigs.select_columns(sig_cols).union(
        new_full.select_columns(sig_cols)
    )
    pair_sets, _metrics = _new_edges(
        old_meta, old_sigs, all_sigs, new_full, new_ids_arr, cfg
    )

    frames = []
    for ps in pair_sets:
        df = ps.select_columns(["id_a", "id_b", "score", "tier"]).to_pandas()
        if "id_a" in df.columns and len(df):
            frames.append(df)
    if frames:
        e = pd.concat(frames, ignore_index=True)
        long = pd.concat([
            e.rename(columns={"id_a": "doc_id", "id_b": "partner"}),
            e.rename(columns={"id_b": "doc_id", "id_a": "partner"}),
        ], ignore_index=True)[["doc_id", "partner", "score", "tier"]]
        long = long[np.isin(long["doc_id"].to_numpy(), new_ids_arr)]
        p_new = np.isin(long["partner"].to_numpy(), new_ids_arr)
        keep = (~p_new) | (long["partner"].to_numpy()
                           < long["doc_id"].to_numpy())
        long = long[keep]
        best = (long.sort_values(["doc_id", "score", "partner"],
                                 ascending=[True, False, True])
                .groupby("doc_id", as_index=False).first())
    else:
        best = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "partner": pd.Series(dtype="float64"),
                             "score": pd.Series(dtype="float64"),
                             "tier": pd.Series(dtype="object")})
    # partner must stay integral through the left merge: NaN-backed
    # float64 silently corrupts the low bits of 62-bit doc ids
    best["partner"] = best["partner"].astype("Int64")
    out = pd.DataFrame({"doc_id": new_ids_arr}).merge(
        best, on="doc_id", how="left")
    out["is_dup"] = out["partner"].notna()
    out["dup_of"] = out["partner"].fillna(-1).astype(np.int64)
    out["score"] = out["score"].fillna(0.0)
    out["tier"] = out["tier"].fillna("")
    return out[["doc_id", "is_dup", "dup_of", "score", "tier"]] \
        .sort_values("doc_id").reset_index(drop=True)


def assignment_summary(assignments: Dataset, num_partitions: int = 16
                       ) -> dict[str, int]:
    """Distributed (n_docs, n_clusters) over an assignments Dataset —
    the CLI's post-add/remove summary.  Replaces a full-table
    to_pandas() collect (O(corpus) on the driver) with per-batch
    distinct cluster_id partials, ONE hash shuffle on cluster_id (so
    in-partition distincts are globally disjoint), and a sum of the
    tiny per-partition counts — the q47 exact-distinct shape."""
    from event_deduplication_ray.stages.shuffle import partition_apply

    n_docs = assignments.count()

    def batch_distinct(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # zero-row blocks can arrive column-less (same shape as the
        # round-4 bmap bug) — return a typed empty partial
        if t.num_rows == 0 or "cluster_id" not in t.column_names:
            return pa.table({"cluster_id": pa.array([], pa.int64())})
        return pa.table({"cluster_id": pc.unique(t["cluster_id"])})

    def part_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"n": pa.array(
            [pc.count_distinct(t["cluster_id"]).as_py()
             if t.num_rows and "cluster_id" in t.column_names else 0],
            pa.int64())})

    parts = partition_apply(
        assignments.select_columns(["cluster_id"])
        .map_batches(batch_distinct, batch_format="pyarrow"),
        ["cluster_id"], num_partitions, part_count,
        batch_format="pyarrow",
    ).to_pandas()
    return {"n_docs": int(n_docs), "n_clusters": int(parts["n"].sum())}
