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

Scale note: the candidate-pair generation runs over the combined band
table (narrow rows), but verification — the expensive stage — is
limited to pairs with >= 1 new side, filtered via a broadcast set of
new doc ids (the new batch is assumed small relative to the corpus;
a huge batch should just use a fresh full run).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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

    sig_cols = ["doc_id", "n_chars", "n_tokens", "n_shingles", "band_keys",
                "sig8", "simhash", "substr_fps"]
    if cfg.lang_match_overrides:
        # per-lang thresholds (P5): lang must ride the combined
        # signature table into verify_pairs.  Checkpoints written by
        # dedup_path_resumable under the same config carry it (the
        # config fingerprint invalidates older lang-less checkpoints).
        sig_cols.append("lang")
    all_sigs = old_sigs.select_columns(sig_cols).union(
        new_full.select_columns(sig_cols)
    ).materialize()

    def touching_new(t: pa.Table) -> pa.Table:
        mask = np.isin(t["id_a"].to_numpy(), new_ids_arr) | np.isin(
            t["id_b"].to_numpy(), new_ids_arr
        )
        return t.filter(pa.array(mask))

    pair_sets = []
    if cfg.use_minhash:
        cands = minhash_candidate_pairs(minhash_band_table(all_sigs, cfg), cfg)
        cands_new = cands.map_batches(touching_new, batch_format="pyarrow")
        verified_new = verify_pairs(cands_new, all_sigs, cfg)
        if cfg.use_exact_tier:
            # same ambiguous-band re-scoring as the full pipeline —
            # an incremental run configured with the exact tier must
            # not silently decide new-doc pairs at the cheap tier only
            from event_deduplication_ray.stages.exact_verify import (
                exact_jaccard_tier,
            )

            all_docs_lazy = old_meta.select_columns(
                ["doc_id", "text_norm"]
            ).union(new_full.select_columns(["doc_id", "text_norm"]))
            verified_new = exact_jaccard_tier(verified_new, all_docs_lazy, cfg)
        pair_sets.append(match_edges(verified_new, cfg))
    if cfg.use_simhash:
        sim = simhash_match_pairs(simhash_band_table(all_sigs, cfg), cfg)
        sim_new = sim.map_batches(touching_new, batch_format="pyarrow").select_columns(
            ["id_a", "id_b", "score", "tier"]
        )
        pair_sets.append(sim_new)
    if cfg.use_substring:
        sub = substring_match_pairs(substring_fp_table(all_sigs, cfg), cfg)
        sub_new = sub.map_batches(touching_new, batch_format="pyarrow").select_columns(
            ["id_a", "id_b", "score", "tier"]
        )
        pair_sets.append(sub_new)

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
        metrics={"n_new_docs": len(new_ids)},
    )
