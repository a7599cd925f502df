"""Stage 6 — canonical / representative synthesis per cluster.

Reference analog: canonical synthesizer C3 + field strategies C3a-g
(/root/reference/src/event_dedup/canonical/synthesizer.py:16-126) and
cluster coherence C2 (clustering/coherence.py:16-65).  Re-keyed: the
representative is one member document chosen by a named strategy
(longest_text / earliest_ts / min_url — all order-insensitive with
deterministic doc_id tie-breaks, unlike the reference's
first-occurrence tie-break, synthesizer.py:225-249), with per-field
provenance pointing at contributing members.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.shuffle import cogroup_apply, partition_apply


def join_meta_labels(
    docs_meta: Dataset, labels: Dataset, cfg: DedupConfig
) -> Dataset:
    """One cogroup serving BOTH assignments and synthesis: doc meta
    left-joined with CC labels (singletons filled with own doc_id),
    text replaced by text_len.  Output: doc_id, url, warc_ts, lang,
    text_len, cluster_id — materialize it once and project."""
    import pyarrow as pa
    import pyarrow.compute as pc

    P = cfg.join_num_partitions
    labels_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    # only the narrow meta enters the shuffle: text bodies never hit
    # the sort (memory traffic bounds scaling).  Accept inputs that
    # already carry text_len (the pinned pipeline table) or raw text.
    meta_cols = set(docs_meta.schema().names)
    if "text_len" in meta_cols:
        # projection fused into the cogroup's split tasks (pre_fn) —
        # no separate select_columns wave over the pinned table
        meta = docs_meta

        def project(t: pa.Table) -> pa.Table:
            return t.select(["doc_id", "url", "warc_ts", "lang", "text_len"])
    else:
        def project(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["doc_id"], "url": t["url"], "warc_ts": t["warc_ts"],
                "lang": t["lang"],
                "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            })

        meta = docs_meta

    def attach(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # pure-Arrow left join: one searchsorted against the sorted
        # label ids, cluster_id appended to the zero-copy meta slice —
        # the url/ts strings never round-trip through pandas object
        # dtype (this cogroup ships the whole corpus's meta; pandas
        # materialization here was measured allocation churn)
        if len(lt) == 0 or "doc_id" not in lt.column_names:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "lang": pa.array([], pa.string()),
                "text_len": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
            })
        ld = lt["doc_id"].to_numpy(zero_copy_only=False)
        cid = ld
        if len(rt) and "doc_id" in rt.column_names:
            rd_ = rt["doc_id"].to_numpy(zero_copy_only=False)
            rc = rt["cluster_id"].to_numpy(zero_copy_only=False)
            o = np.argsort(rd_, kind="stable")
            rd_, rc = rd_[o], rc[o]
            pos = np.minimum(np.searchsorted(rd_, ld), len(rd_) - 1)
            cid = np.where(rd_[pos] == ld, rc[pos], ld)   # singleton = own id
        return lt.append_column("cluster_id", pa.array(cid, pa.int64()))

    # Fast path: CC's driver-finish returns labels as ONE block
    # (edge-incident docs only — dup-structure-sized, ~16 B/doc).
    # Broadcasting that block and mapping once over the meta blocks
    # replaces the whole doc_id cogroup (split wave + merge wave +
    # barrier) with a single raw-task wave: per-block searchsorted
    # against the broadcast sorted label arrays.  The cogroup stays
    # the fallback for a distributed (multi-block) label table — the
    # scale-safe path when the dup structure itself is too big to
    # broadcast.
    try:
        n_label_blocks = labels.num_blocks()
    except Exception:
        n_label_blocks = None
    if n_label_blocks == 1:
        import ray
        import ray.data as rd_

        lab = labels.to_pandas()
        if "doc_id" not in lab.columns:     # zero-row collect drops schema
            lab = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                "cluster_id": pd.Series(dtype="int64")})
        o = np.argsort(lab["doc_id"].to_numpy(), kind="stable")
        lab_ids = lab["doc_id"].to_numpy()[o]
        lab_cids = lab["cluster_id"].to_numpy()[o]
        lab_ref = ray.put((lab_ids, lab_cids))

        def bmap(t: pa.Table, label_arrays) -> pa.Table:
            # the ObjectRef arg is plasma-resolved by Ray before the
            # task runs — zero-copy on every worker of a node.
            # Zero-row blocks come through with an EMPTY schema
            # (to_arrow_refs drops it, e.g. after a drop_docs filter
            # removed a whole file's rows), so guard BEFORE project —
            # both project variants would raise on the missing columns.
            # Mirrors the cogroup path's pre_fn guard (shuffle.py).
            if t.num_rows == 0 or "doc_id" not in t.column_names:
                return attach(pa.table({}), pa.table({}))
            t = project(t)
            ids, cids = label_arrays
            ld = t["doc_id"].to_numpy(zero_copy_only=False)
            if len(ids):
                pos = np.minimum(np.searchsorted(ids, ld), len(ids) - 1)
                cid = np.where(ids[pos] == ld, cids[pos], ld)
            else:
                cid = ld
            return t.append_column("cluster_id", pa.array(cid, pa.int64()))

        from event_deduplication_ray.stages.shuffle import _task_cpus

        task = ray.remote(num_cpus=_task_cpus())(bmap)
        return rd_.from_arrow_refs(
            [task.remote(b, lab_ref) for b in meta.to_arrow_refs()]
        )
    return cogroup_apply(meta, labels, ["doc_id"], ["doc_id"], P, attach,
                         right_schema=labels_schema, batch_format="pyarrow",
                         left_pre_fn=project)


def synthesize_joined(joined: Dataset, cfg: DedupConfig) -> Dataset:
    """Per-cluster synthesis from the pre-joined meta+labels table
    (see join_meta_labels); one shuffle by cluster_id."""
    P = cfg.join_num_partitions
    return partition_apply(
        joined, ["cluster_id"], P,
        _synth_fn(cfg.representative_strategy, cfg.max_cluster_size,
                  cfg.coherence_max_ts_spread_days),
    )


def _synth_fn(strategy: str, max_size: int, max_spread_days: float | None = None):
    def synth(df: pd.DataFrame) -> pd.DataFrame:
        # order-insensitive representative choice with doc_id tie-break
        if strategy == "longest_text":
            df = df.sort_values(["text_len", "doc_id"], ascending=[False, True])
        elif strategy == "earliest_ts":
            df = df.sort_values(["warc_ts", "doc_id"], ascending=[True, True])
        else:  # min_url
            df = df.sort_values(["url", "doc_id"], ascending=[True, True])
        g = df.groupby("cluster_id", sort=False)
        rep = g.head(1).set_index("cluster_id")
        agg = g.agg(
            n_members=("doc_id", "size"),
            first_ts=("warc_ts", "min"),
            last_ts=("warc_ts", "max"),
            total_text_len=("text_len", "sum"),
        )
        first_idx = df.sort_values(["warc_ts", "doc_id"]).groupby(
            "cluster_id", sort=False
        ).head(1).set_index("cluster_id")["doc_id"]
        out = agg.join(rep[["doc_id", "url", "lang", "text_len"]]).rename(
            columns={"doc_id": "rep_doc_id", "url": "rep_url",
                     "lang": "rep_lang", "text_len": "rep_text_len"}
        )
        out["first_ts_doc_id"] = first_idx
        out["needs_review"] = out["n_members"] > max_size
        if max_spread_days is not None:
            # coherence spread guard (reference coherence.py:16-65,
            # re-keyed from ">3 distinct dates" to a crawl-ts window)
            spread = (out["last_ts"] - out["first_ts"]).dt.total_seconds()
            out["needs_review"] |= spread > max_spread_days * 86400.0
        out["strategy"] = strategy
        return out.reset_index()

    return synth


def synthesize_clusters(
    docs_meta: Dataset, assignments: Dataset, cfg: DedupConfig
) -> Dataset:
    """docs meta (doc_id, url, warc_ts, lang, text) ⋈ assignments →
    one canonical row per cluster.

    Output: cluster_id, rep_doc_id, rep_url, n_members, first_ts,
    last_ts, rep_text_len, needs_review, first_ts_doc_id (provenance
    of the earliest crawl), strategy.
    """
    P = cfg.join_num_partitions
    strategy = cfg.representative_strategy
    max_size = cfg.max_cluster_size

    def attach(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        m = l.merge(r, on="doc_id", how="inner")
        m["text_len"] = m["text"].str.len().astype(np.int64)
        return m.drop(columns=["text"])

    import pyarrow as pa

    meta = docs_meta.select_columns(["doc_id", "url", "warc_ts", "lang", "text"])
    labels_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    joined = cogroup_apply(meta, assignments, ["doc_id"], ["doc_id"], P, attach,
                           right_schema=labels_schema)

    return partition_apply(
        joined, ["cluster_id"], P,
        _synth_fn(strategy, max_size, cfg.coherence_max_ts_spread_days),
    )


def cluster_confidence(
    verified_pairs: Dataset, assignments: Dataset, cfg: DedupConfig
) -> Dataset:
    """Mean intra-cluster edge score per cluster (reference C4 analog,
    matching/pipeline.py:282-301).  Singletons have no edges → absent
    (the reference's None)."""
    P = cfg.join_num_partitions

    def attach(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        m = l.merge(r.rename(columns={"doc_id": "id_a"}), on="id_a", how="inner")
        return m[["cluster_id", "score"]]

    import pyarrow as pa

    edges = verified_pairs.select_columns(["id_a", "score"])
    labels_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    with_cluster = cogroup_apply(
        edges, assignments, ["id_a"], ["doc_id"], P, attach,
        left_schema=pa.schema([("id_a", pa.int64()), ("score", pa.float64())]),
        right_schema=labels_schema,
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("cluster_id", as_index=False)["score"]
            .mean()
            .rename(columns={"score": "match_confidence"})
        )

    return partition_apply(with_cluster, ["cluster_id"], P, agg)


def attach_coherence(
    canonical: Dataset, confidence: Dataset, cfg: DedupConfig
) -> Dataset:
    """Join per-cluster match_confidence into the canonical table and
    flag low-coherence clusters (reference C2 validator,
    /root/reference/src/event_dedup/clustering/coherence.py:16-65:
    avg internal edge weight < threshold → needs_review).

    Singletons have no edges → confidence stays null and is NOT
    flagged (a singleton is trivially coherent, matching the
    reference's None)."""
    P = cfg.join_num_partitions
    thresh = cfg.coherence_min_confidence

    def attach(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return l.assign(match_confidence=pd.Series(dtype="float64"))
        if len(r) == 0:
            m = l.assign(match_confidence=np.nan)
        else:
            m = l.merge(r, on="cluster_id", how="left")
        if thresh is not None:
            low = m["match_confidence"].notna() & (m["match_confidence"] < thresh)
            m["needs_review"] = m["needs_review"] | low
        return m

    return cogroup_apply(canonical, confidence, ["cluster_id"], ["cluster_id"],
                         P, attach)
