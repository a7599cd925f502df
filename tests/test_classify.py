"""Distributed logistic-regression classifier (stages/classify.py):
planted-separability, determinism, partition-count invariance of
predictions, and the degenerate empty/one-class corpora."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.classify import (
    logreg_fit,
    logreg_score,
    scored_frame,
)

CFG = DedupConfig(join_num_partitions=4)


def _two_clump_ds(n=200, d=8, sep=4.0, seed=0):
    """Linearly separable: clump 0 (label 0) around +sep·e0, clump 1
    (label 1) around −sep·e0."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    labels = (np.arange(n) % 2).astype(np.int32)
    m[:, 0] += np.where(labels == 0, sep, -sep)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    return rd.from_arrow(t), labels


def test_logreg_separates_planted_clumps(ray_session):
    ds, labels = _two_clump_ds()
    fit = logreg_fit(ds, CFG, positive=0, n_iters=30)
    assert fit["n"] == 200 and fit["n_pos"] == 100
    assert fit["accuracy_ppm"] == 1_000_000
    # the separating direction is +e0 for the positive class
    assert fit["w"][0] > 0
    scored = scored_frame(logreg_score(ds, fit["w"]))
    assert (scored["pred"].to_numpy() == (labels == 0)).all()
    # scores order by class: every positive score > every negative one
    s = scored["score"].to_numpy()
    assert s[labels == 0].min() > s[labels == 1].max()


def test_logreg_refit_is_deterministic(ray_session):
    ds, _ = _two_clump_ds(seed=3)
    w1 = logreg_fit(ds, CFG, positive=0, n_iters=10)["w"]
    w2 = logreg_fit(ds, CFG, positive=0, n_iters=10)["w"]
    assert np.array_equal(w1, w2)  # bit-identical refit (fixed P)


def test_logreg_predictions_invariant_to_partition_count(ray_session):
    ds, _ = _two_clump_ds(seed=5)
    p2 = logreg_fit(ds, DedupConfig(join_num_partitions=2),
                    positive=0, n_iters=15)
    p8 = logreg_fit(ds, DedupConfig(join_num_partitions=8),
                    positive=0, n_iters=15)
    # float partial-sum order differs across P — weights agree to
    # tolerance and the decision boundary agrees exactly
    assert np.allclose(p2["w"], p8["w"], atol=1e-8)
    s2 = scored_frame(logreg_score(ds, p2["w"]))["pred"].to_numpy()
    s8 = scored_frame(logreg_score(ds, p8["w"]))["pred"].to_numpy()
    assert (s2 == s8).all()
    assert p2["accuracy_ppm"] == p8["accuracy_ppm"] == 1_000_000


def test_logreg_one_class_degenerate(ray_session):
    """All-positive corpus: no crash, classifier predicts the
    majority class everywhere (bias dominates)."""
    ds, _ = _two_clump_ds(n=40)
    fit = logreg_fit(ds, CFG, positive=99, n_iters=10)  # no row matches
    assert fit["n_pos"] == 0
    assert fit["accuracy_ppm"] == 1_000_000  # trivially all-negative
    scored = scored_frame(logreg_score(ds, fit["w"]))
    assert not scored["pred"].any()


def test_logreg_empty_table(ray_session):
    """Zero-row embeddings: fit returns the degenerate model instead
    of crashing in the dim probe, and scoring stays a typed empty."""
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32()),
    }))
    fit = logreg_fit(ds, CFG)
    assert fit["n"] == 0 and fit["accuracy_ppm"] == 0
    scored = scored_frame(logreg_score(ds, np.zeros(9)))
    assert len(scored) == 0 and list(scored.columns) == [
        "vec_id", "score", "pred"]
