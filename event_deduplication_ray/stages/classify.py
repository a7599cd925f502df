"""Distributed supervised classifier: full-batch logistic regression
trained over an embedding Dataset — the quality-classifier verb of
web-scale curation (GPT-3's WebText-reference classifier, CCNet's LM
filter): fit on a labeled seed set, score the whole corpus in one
streaming pass, keep docs above a threshold.

Reference analog: the scoring tier P6/P7 (a learned combiner instead
of hand weights; /root/reference/src/event_dedup/matching/scorer.py
combines signals with fixed weights — this stage LEARNS the weights).

Shape (the q123 PageRank round loop with a dense gradient instead of
rank mass): the vector table hash-partitions ONCE by vec_id and stays
resident (`shuffle_to`; normalized features ride as FixedSizeList —
pyarrow partition fns keep list columns intact); each iteration
broadcasts the (d+1) weight vector and every partition returns ONE
gradient-partial row (grad bytes, loss, count), so per-round driver
traffic is O(P·d) and per-round cluster work is one linear scan with
zero reshuffles.  Determinism: rows are sorted by vec_id inside each
partition before the matmul and the driver folds partials in
partition-key order, so refits are bit-identical for a fixed
partition count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.shuffle import partition_apply, shuffle_to
from event_deduplication_ray.stages.similarity import (
    _emb_matrix,
    _normalize_rows,
    _probe_dim,
)


def _packed_xy(
    embeddings: Dataset, cfg: DedupConfig, label_col: str, positive: int,
    emb_col: str = "embedding", id_col: str = "vec_id",
):
    """Shuffle (vec_id, normalized features, y) into resident
    partitions; returns (Shuffled, dim, P)."""
    d0 = _probe_dim(embeddings, emb_col)
    P = cfg.join_num_partitions

    def pack(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        n = m.shape[0]
        d = m.shape[1] if n else d0
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), d)
        y = (t[label_col].to_numpy(zero_copy_only=False)
             .astype(np.int64) == positive).astype(np.float64)
        return pa.table({"vec_id": t[id_col], "x": fsl,
                         "y": pa.array(y, pa.float64())})

    return shuffle_to(embeddings, ["vec_id"], P, pre_fn=pack), d0, P


def _part_mat(t: pa.Table):
    """Partition table → (vec_id-sorted ids, X, y)."""
    col = t["x"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = t.schema.field("x").type.list_size
    X = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), d)
    ids = t["vec_id"].to_numpy()
    y = t["y"].to_numpy()
    order = np.argsort(ids, kind="stable")
    return ids[order], X[order], y[order]


def logreg_fit(
    embeddings: Dataset,
    cfg: DedupConfig | None = None,
    label_col: str = "label",
    positive: int = 0,
    n_iters: int = 40,
    lr: float = 4.0,
    l2: float = 1e-3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fit w ∈ R^(d+1) (weights + bias) by full-batch gradient descent
    over L2-normalized features.  Returns {"w": ndarray(d+1), "n": N,
    "n_pos": P, "loss": final mean log-loss, "accuracy_ppm": exact
    int train accuracy}."""
    import ray

    cfg = cfg or DedupConfig()
    vecs, d, P = _packed_xy(embeddings, cfg, label_col, positive,
                            emb_col, id_col)
    if d == 0:
        return {"w": np.zeros(1), "n": 0, "n_pos": 0, "loss": 0.0,
                "accuracy_ppm": 0}
    w = np.zeros(d + 1, np.float64)
    loss = 0.0
    n_total = n_pos = 0
    for _ in range(n_iters):
        ref = ray.put(w)

        def grad_partial(t: pa.Table) -> pa.Table:
            ww = ray.get(ref)
            ids, X, y = _part_mat(t)
            if not len(ids):
                return pa.table({"pk": pa.array([], pa.int64()),
                                 "g": pa.array([], pa.binary()),
                                 "loss": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64()),
                                 "n_pos": pa.array([], pa.int64())})
            z = X @ ww[:-1] + ww[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            g = np.concatenate([X.T @ r, [r.sum()]])
            eps = 1e-12
            ll = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            return pa.table({
                "pk": pa.array([int(ids.min())], pa.int64()),
                "g": pa.array([g.tobytes()], pa.binary()),
                "loss": pa.array([float(ll)], pa.float64()),
                "n": pa.array([len(ids)], pa.int64()),
                "n_pos": pa.array([int(y.sum())], pa.int64()),
            })

        parts = partition_apply(vecs, ["vec_id"], P, grad_partial,
                                batch_format="pyarrow").to_pandas()
        if "pk" not in parts.columns or not len(parts):
            break
        parts = parts.sort_values("pk").reset_index(drop=True)
        grad = np.zeros(d + 1, np.float64)
        ll = 0.0
        for b in parts["g"]:
            grad += np.frombuffer(b, np.float64)
        for v in parts["loss"]:
            ll += float(v)
        n_total = int(parts["n"].sum())
        n_pos = int(parts["n_pos"].sum())
        loss = ll / max(n_total, 1)
        w = w - lr * (grad / max(n_total, 1) + l2 * np.concatenate([w[:-1], [0.0]]))

    acc_ref = ray.put(w)

    def acc_partial(t: pa.Table) -> pa.Table:
        ww = ray.get(acc_ref)
        ids, X, y = _part_mat(t)
        if not len(ids):
            return pa.table({"n": pa.array([], pa.int64()),
                             "n_ok": pa.array([], pa.int64())})
        pred = (X @ ww[:-1] + ww[-1]) > 0.0
        return pa.table({"n": pa.array([len(ids)], pa.int64()),
                         "n_ok": pa.array([int((pred == (y > 0.5)).sum())],
                                          pa.int64())})

    accp = partition_apply(vecs, ["vec_id"], P, acc_partial,
                           batch_format="pyarrow").to_pandas()
    n_ok = int(accp["n_ok"].sum()) if "n_ok" in accp.columns else 0
    return {"w": w, "n": n_total, "n_pos": n_pos, "loss": loss,
            "accuracy_ppm": 1_000_000 * n_ok // max(n_total, 1)}


def logreg_score(
    embeddings: Dataset,
    w: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Score every row with a fitted weight vector in ONE streaming
    map_batches pass (w is (d+1) floats — it ships with the task
    closure, never per batch).  Returns a LAZY Dataset of (vec_id,
    score, pred) — the corpus-scale scoring pass never materializes
    on the driver; collect or aggregate downstream."""
    wv = np.asarray(w, np.float64)

    def score(t: pa.Table) -> pa.Table:
        X = _normalize_rows(_emb_matrix(t[emb_col]))
        if not len(X):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64()),
                             "pred": pa.array([], pa.bool_())})
        z = X @ wv[:-1] + wv[-1]
        return pa.table({"vec_id": t[id_col],
                         "score": pa.array(z, pa.float64()),
                         "pred": pa.array(z > 0.0)})

    return embeddings.map_batches(score, batch_format="pyarrow")


def scored_frame(scored: Dataset) -> pd.DataFrame:
    """Collect a logreg_score Dataset to a typed frame (eval-scale
    helper; Ray's to_pandas drops a 0-row schema)."""
    out = scored.to_pandas()
    if "vec_id" not in out.columns:
        out = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                            "score": pd.Series(dtype="float64"),
                            "pred": pd.Series(dtype="bool")})
    return out.sort_values("vec_id").reset_index(drop=True)
