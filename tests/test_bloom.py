"""Bloom filter: no false negatives ever, false-positive rate near
the design target, OR-merge equals union."""

import numpy as np

from event_deduplication_ray.functions.bloom import (
    bloom_build,
    bloom_contains,
    bloom_merge,
    bloom_params,
)


def test_no_false_negatives():
    keys = np.arange(50_000, dtype=np.int64) * 7 - 123
    m, k = bloom_params(len(keys), fpr=0.01)
    bf = bloom_build(keys, m, k)
    assert bloom_contains(bf, keys, k).all()


def test_false_positive_rate_near_target():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**62, 20_000).astype(np.int64)
    m, k = bloom_params(len(keys), fpr=0.01)
    bf = bloom_build(keys, m, k)
    probe = rng.integers(2**62, 2**63 - 1, 100_000).astype(np.int64)  # disjoint
    fpr = bloom_contains(bf, probe, k).mean()
    assert fpr < 0.02, fpr       # 2x the 1% design point


def test_merge_is_union():
    a = np.arange(0, 3_000, dtype=np.int64)
    b = np.arange(2_000, 6_000, dtype=np.int64)
    m, k = bloom_params(6_000, fpr=0.01)
    merged = bloom_merge([bloom_build(a, m, k), bloom_build(b, m, k)])
    union = bloom_build(np.union1d(a, b), m, k)
    assert np.array_equal(merged, union)
    assert bloom_contains(merged, np.union1d(a, b), k).all()


def test_bloom_decontaminate_superset(ray_session, sf_dir):
    """Bloom-mode decontamination must flag EVERY doc the exact mode
    flags (no false negatives → nothing contaminated slips through)
    and may over-flag only within the filter's false-positive budget."""
    from event_deduplication_ray.pipelines.queries import (
        _decontaminate,
        q33_decontaminate,
    )

    exact = q33_decontaminate(sf_dir).to_pandas().set_index("doc_id")
    bloom = _decontaminate(sf_dir, use_bloom=True).to_pandas().set_index(
        "doc_id")
    assert set(exact.index) == set(bloom.index)
    e = exact["contaminated"].sort_index()
    b = bloom["contaminated"].sort_index()
    assert (b[e == 1] == 1).all()            # superset: never under-flag
    # doc-level fp ≈ shingles/doc (~100) x probe fpr (1e-4) ≈ 1 %
    extra = int(((b == 1) & (e == 0)).sum())
    assert extra <= max(5, int(0.05 * len(e))), extra


def test_empty_filter_rejects_everything():
    m, k = bloom_params(100)
    bf = bloom_build(np.empty(0, np.int64), m, k)
    assert not bloom_contains(bf, np.arange(1_000, dtype=np.int64), k).any()
    assert len(bloom_contains(bf, np.empty(0, np.int64), k)) == 0
