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


def test_kll_merge_tree_shapes_and_rank_error():
    """KLL/MRL sketch: (a) any merge-tree shape yields a sketch whose
    quantiles hit the same rank-error bound; (b) observed rank error
    <= 2% of n for k=200 across uniform, zipf-ish and tie-heavy
    distributions (deterministic alternating compaction — stable)."""
    import numpy as np

    from event_deduplication_ray.functions.sketch import (
        kll_merge, kll_n, kll_new, kll_quantile, kll_update,
    )

    rng = np.random.default_rng(5)
    dists = {
        "uniform": rng.uniform(0, 1000, 100_000),
        "zipf": 1000.0 / rng.integers(1, 1000, 100_000),
        "ties": rng.integers(0, 10, 100_000).astype(float),
    }
    for name, data in dists.items():
        srt = np.sort(data)
        n = len(data)
        # single stream
        single = kll_update(kll_new(), data)
        # 16-way merge tree over chunks
        parts = [kll_update(kll_new(), c) for c in np.array_split(data, 16)]
        while len(parts) > 1:
            parts = [kll_merge(parts[i], parts[i + 1])
                     for i in range(0, len(parts) - 1, 2)] + \
                    ([parts[-1]] if len(parts) % 2 else [])
        merged = parts[0]
        assert kll_n(single) == n and kll_n(merged) == n
        for s in (single, merged):
            for frac in (0.5, 0.9, 0.99):
                est = kll_quantile(s, frac)
                # tie-aware: est occupies the rank interval [lo, hi];
                # error = distance from the target rank to that interval
                lo = np.searchsorted(srt, est, side="left")
                hi = np.searchsorted(srt, est, side="right")
                t = frac * n
                err = 0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t))
                assert err <= 0.02 * n, (name, frac, err, t)


def test_kll_serialize_roundtrip():
    import numpy as np

    from event_deduplication_ray.functions.sketch import (
        kll_deserialize, kll_new, kll_quantile, kll_serialize, kll_update,
    )

    s = kll_update(kll_new(), np.arange(10_000, dtype=float))
    s2 = kll_deserialize(kll_serialize(s))
    for f in (0.1, 0.5, 0.99):
        assert kll_quantile(s, f) == kll_quantile(s2, f)
