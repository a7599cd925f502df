"""HyperLogLog sketch: estimator accuracy, merge semantics, and the
q48-vs-q47 error gate that stands in for the missing SQL oracle."""

import numpy as np

from event_deduplication_ray.functions.sketch import (
    hll_estimate,
    hll_merge,
    hll_partial,
)


def test_hll_accuracy_across_cardinalities():
    """p=12 → ~1.6 % σ; gate at 5 % (~3σ) across 4 decades, including
    the linear-counting small range."""
    for n in (100, 1_000, 10_000, 100_000):
        est = hll_estimate(hll_partial(np.arange(n, dtype=np.int64)))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_is_union():
    """merge(partial(A), partial(B)) == partial(A ∪ B) exactly
    (registers, not just estimates) — the property that makes the
    sketch safe under ANY shuffle topology / retry duplication."""
    a = np.arange(0, 5_000, dtype=np.int64)
    b = np.arange(3_000, 9_000, dtype=np.int64)   # overlapping
    merged = hll_merge([hll_partial(a), hll_partial(b)])
    union = hll_partial(np.union1d(a, b))
    assert np.array_equal(merged, union)
    # idempotent: folding the same set twice changes nothing
    assert np.array_equal(hll_merge([merged, hll_partial(a)]), merged)


def test_hll_duplicates_do_not_inflate():
    vals = np.repeat(np.arange(500, dtype=np.int64), 50)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 500) / 500 < 0.05, est


def test_hll_empty_and_single():
    assert hll_estimate(hll_partial(np.empty(0, np.int64))) == 0.0
    one = hll_estimate(hll_partial(np.array([42], np.int64)))
    assert 0.5 < one < 1.5


def test_q48_within_error_of_exact_q47(ray_session, sf_dir):
    from event_deduplication_ray.pipelines.queries import (
        q47_distinct_users,
        q48_distinct_users_hll,
    )

    exact = q47_distinct_users(sf_dir).set_index("event_type")["n_users"]
    est = q48_distinct_users_hll(sf_dir).set_index("event_type")["n_users_est"]
    assert set(exact.index) == set(est.index)
    for et in exact.index:
        n, e = int(exact[et]), int(est[et])
        assert abs(e - n) / max(n, 1) < 0.05, (et, n, e)


def test_cms_merge_equals_single_pass():
    """partial(a) + partial(b) must equal partial(a ++ b) register
    for register — the property that makes any reduce-tree shape
    produce the same sketch."""
    import numpy as np

    from event_deduplication_ray.functions.sketch import (
        cms_merge, cms_partial,
    )

    rng = np.random.default_rng(3)
    ka = rng.integers(0, 2**63, 500).astype(np.uint64)
    kb = rng.integers(0, 2**63, 700).astype(np.uint64)
    ca = rng.integers(1, 50, 500).astype(np.int64)
    cb = rng.integers(1, 50, 700).astype(np.int64)
    merged = cms_merge([cms_partial(ka, ca), cms_partial(kb, cb)])
    single = cms_partial(np.concatenate([ka, kb]), np.concatenate([ca, cb]))
    assert (merged == single).all()


def test_cms_overestimates_within_bound():
    """true <= est for EVERY key (hard guarantee) and est <= true +
    eps*N for a zipf-ish planted distribution (holds deterministically
    for this fixed hash; eps = e/w)."""
    import numpy as np

    from event_deduplication_ray.functions.sketch import (
        CMS_W_DEFAULT, cms_partial, cms_query,
    )

    rng = np.random.default_rng(11)
    n_keys = 20_000
    keys = rng.integers(0, 2**63, n_keys).astype(np.uint64)
    counts = np.maximum((10_000 / np.arange(1, n_keys + 1)), 1).astype(np.int64)
    M = cms_partial(keys, counts)
    est = cms_query(M, keys)
    assert (est >= counts).all()
    N = int(counts.sum())
    eps = np.e / CMS_W_DEFAULT
    assert (est <= counts + eps * N).all()
