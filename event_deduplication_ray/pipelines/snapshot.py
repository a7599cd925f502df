"""Corpus snapshot diff: which documents were added, removed, or
changed between two corpus versions — the batch-engine re-keying of
the reference's file watcher trigger (worker/watcher.py:20-62 +
orchestrator idempotency): instead of reacting to file events, a new
snapshot is diffed against the previous one and only the delta feeds
`pipelines/incremental.incremental_add`.

Scale shape: each side reduces to a narrow (doc_id, text_hash) table
in its read pass — text never shuffles — and ONE doc_id cogroup
classifies every id locally; per-partition category counts (and
bounded id samples) are the only driver traffic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.functions.hashing import hash_strings_u64


def _hashed(ds: Dataset) -> Dataset:
    def h(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pandas().fillna("")
        return pa.table({
            "doc_id": t["doc_id"],
            "text_hash": hash_strings_u64(txt.to_numpy(dtype=object))
            .astype(np.int64),
        })

    return ds.map_batches(h, batch_format="pyarrow")


def corpus_diff(old: Dataset, new: Dataset, num_partitions: int = 16,
                sample_per_category: int = 100) -> dict:
    """Diff two document Datasets (columns doc_id, text).

    Returns {"summary": DataFrame(status, n), "samples":
    DataFrame(status, doc_id)} with statuses added / removed /
    changed / unchanged; samples hold up to ``sample_per_category``
    smallest doc_ids per category per partition (bounded driver
    traffic — the full id sets stay distributed by design)."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    new_sh = shuffle_to(_hashed(new), ["doc_id"], num_partitions)

    empty_cnt = {"status": pd.Series(dtype="object"),
                 "n": pd.Series(dtype="int64"),
                 "sample_ids": pd.Series(dtype="object")}

    def classify(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 and len(r) == 0:
            return pd.DataFrame(empty_cnt)
        lo = l.set_index("doc_id")["text_hash"] if len(l) else \
            pd.Series(dtype="int64")
        rn = r.set_index("doc_id")["text_hash"] if len(r) else \
            pd.Series(dtype="int64")
        both = lo.index.intersection(rn.index)
        added = rn.index.difference(lo.index)
        removed = lo.index.difference(rn.index)
        changed = both[(lo.loc[both] != rn.loc[both]).to_numpy()]
        unchanged = both[(lo.loc[both] == rn.loc[both]).to_numpy()]
        rows = []
        for status, ids in (("added", added), ("removed", removed),
                            ("changed", changed),
                            ("unchanged", unchanged)):
            ids = np.sort(np.asarray(ids, dtype=np.int64))
            rows.append({
                "status": status, "n": int(len(ids)),
                "sample_ids": ids[:sample_per_category].tobytes()})
        return pd.DataFrame(rows)

    parts = cogroup_apply(_hashed(old), new_sh, ["doc_id"], ["doc_id"],
                          num_partitions, classify).to_pandas()
    if "status" not in parts.columns:
        parts = pd.DataFrame(empty_cnt)
    summary = parts.groupby("status", as_index=False)["n"].sum()
    for st in ("added", "removed", "changed", "unchanged"):
        if st not in set(summary["status"]):
            summary = pd.concat(
                [summary, pd.DataFrame({"status": [st], "n": [0]})],
                ignore_index=True)
    summary["n"] = summary["n"].astype("int64")
    summary = summary.sort_values("status").reset_index(drop=True)

    samp_rows = []
    for _, row in parts.iterrows():
        for did in np.frombuffer(row["sample_ids"], np.int64):
            samp_rows.append({"status": row["status"], "doc_id": int(did)})
    samples = (pd.DataFrame(samp_rows)
               if samp_rows else pd.DataFrame(
                   {"status": pd.Series(dtype="object"),
                    "doc_id": pd.Series(dtype="int64")}))
    samples = samples.sort_values(["status", "doc_id"]) \
        .reset_index(drop=True)
    return {"summary": summary, "samples": samples}


def corpus_delta(old: Dataset, new: Dataset,
                 num_partitions: int = 16) -> dict:
    """Full delta ID sets between two snapshots — the actionable
    counterpart of ``corpus_diff``'s bounded report: returns numpy
    arrays of added / removed / changed doc_ids (DELTA-sized driver
    traffic: unchanged ids never leave the partitions), ready to feed
    ``incremental_update``'s remove-then-add composition."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    new_sh = shuffle_to(_hashed(new), ["doc_id"], num_partitions)

    def delta_ids(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        lo = l.set_index("doc_id")["text_hash"] if len(l) else \
            pd.Series(dtype="int64")
        rn = r.set_index("doc_id")["text_hash"] if len(r) else \
            pd.Series(dtype="int64")
        both = lo.index.intersection(rn.index)
        rows = []
        for status, ids in (
            ("added", rn.index.difference(lo.index)),
            ("removed", lo.index.difference(rn.index)),
            ("changed", both[(lo.loc[both] != rn.loc[both]).to_numpy()]),
        ):
            for did in np.asarray(ids, dtype=np.int64):
                rows.append({"status": status, "doc_id": int(did)})
        if not rows:
            return pd.DataFrame({"status": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64")})
        return pd.DataFrame(rows)

    parts = cogroup_apply(_hashed(old), new_sh, ["doc_id"], ["doc_id"],
                          num_partitions, delta_ids).to_pandas()
    if "status" not in parts.columns:
        parts = pd.DataFrame({"status": pd.Series(dtype="object"),
                              "doc_id": pd.Series(dtype="int64")})
    out = {}
    for st in ("added", "removed", "changed"):
        ids = parts.loc[parts["status"] == st, "doc_id"] \
            .to_numpy(np.int64)
        out[st] = np.sort(ids)
    return out


def persist_fingerprint(run_dir: str, cfg=None) -> str:
    """Write the run's 1 KB corpus MinHash fingerprint
    (stages/signatures.corpus_minhash over the extracted stage) to
    ``{run_dir}/fingerprint.parquet`` — the cheap half of the watcher
    loop: later snapshots estimate their shingle-set Jaccard against
    this run WITHOUT re-reading the old corpus (corpus_delta is the
    exact, doc-level half)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.signatures import corpus_minhash

    cfg = cfg or DedupConfig()
    docs = rd.read_parquet(f"{run_dir}/extracted",
                           columns=["text_norm"])
    fp = corpus_minhash(docs, cfg)
    path = os.path.join(run_dir, "fingerprint.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table({"sig": pa.array([fp.tobytes()],
                                             pa.binary())}), tmp)
    os.replace(tmp, path)
    return path


def drift_vs_fingerprint(run_dir: str, snapshot, cfg=None) -> float:
    """Estimated shingle-set Jaccard between the run dir's persisted
    fingerprint and a NEW snapshot Dataset (raw docs: text is
    normalized here the same way extraction does).  1.0 ≈ unchanged
    corpus; low values mean the new crawl diverged and a full
    incremental_update is worth its cost."""
    import os

    import pyarrow.parquet as pq

    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.functions.text import normalize_text
    from event_deduplication_ray.stages.signatures import (
        corpus_jaccard_estimate,
        corpus_minhash,
    )

    cfg = cfg or DedupConfig()
    t = pq.read_table(os.path.join(run_dir, "fingerprint.parquet"))
    old = np.frombuffer(t["sig"][0].as_py(), np.uint64)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_norm"] = normalize_text(df["text"])
        return df

    new = corpus_minhash(
        snapshot.map_batches(prep, batch_format="pandas"), cfg)
    return corpus_jaccard_estimate(old, new)
