"""Unit tests for the pure hashing kernels (reference test pattern:
tiny hand-built inputs, boundary cases — tests/test_blocking.py,
tests/test_candidate_pairs.py in /root/reference)."""

import numpy as np
import pandas as pd
import pytest

from event_deduplication_ray.functions import hashing as H


@pytest.fixture(scope="module")
def perms():
    return H.perm_constants(128, 42)


def _sig_for(texts, perms, k=5, seed=42):
    flat, lens = H.tokenize_offsets(pd.Series(texts))
    th = H.hash_strings_u64(flat)
    sh, spd = H.shingle_hashes(th, lens, k, seed)
    return H.minhash_signatures(sh, spd, *perms), spd


def test_stable_hash_deterministic():
    a = H.hash_strings_u64(["foo", "bar", "foo"])
    assert a[0] == a[2] and a[0] != a[1]
    b = H.hash_strings_u64(pd.Series(["foo", "bar", "foo"]))
    assert np.array_equal(a, b)


def test_doc_ids_nonnegative():
    ids = H.doc_ids_for_urls([f"https://x/{i}" for i in range(1000)])
    assert (ids >= 0).all() and len(set(ids.tolist())) == 1000


def test_identical_text_identical_signature(perms):
    sig, _ = _sig_for(["a b c d e f g h", "a b c d e f g h"], perms)
    assert np.array_equal(sig[0], sig[1])


def test_short_text_gets_single_shingle(perms):
    sig, spd = _sig_for(["one two", "one two", "one other"], perms)
    assert list(spd) == [1, 1, 1]
    assert np.array_equal(sig[0], sig[1])
    assert not np.array_equal(sig[0], sig[2])


def test_empty_text_sentinel(perms):
    sig, spd = _sig_for(["", "   ", "a b c d e f"], perms)
    assert spd[0] == 0 and spd[1] == 0
    assert (sig[0] == np.iinfo(np.uint64).max).all()
    # two empty docs must NOT look like duplicates via keying
    # (banding excludes n_shingles == 0 rows; here just check sentinel)
    assert np.array_equal(sig[0], sig[1])


def test_jaccard_estimate_unbiased(perms):
    rng = np.random.default_rng(7)
    errs = []
    for _ in range(30):
        base = rng.integers(0, 2**63, 200).astype(np.uint64)
        m = 140  # true J = 140 / 260
        other = np.concatenate([base[:m], rng.integers(0, 2**63, 200 - m).astype(np.uint64)])
        sh = H._splitmix_array(np.concatenate([base, other]), H._GOLDEN, H.U64(1))
        sig = H.minhash_signatures(sh, np.array([200, 200]), *perms)
        errs.append(H.signature_jaccard(sig[0:1], sig[1:2])[0] - m / 260)
    assert abs(np.mean(errs)) < 0.02


def test_shingles_never_cross_docs(perms):
    # "a b c d e" + "f g h i j" as two docs must not create the
    # cross-boundary shingle "b c d e f" etc.
    joined, _ = _sig_for(["a b c d e f g h i j"], perms)
    split, spd = _sig_for(["a b c d e", "f g h i j"], perms)
    assert list(spd) == [1, 1]
    assert not np.array_equal(joined[0], split[0])


def test_band_hashes_shape_and_equality(perms):
    sig, _ = _sig_for(["x y z w v u t s", "x y z w v u t s", "q r s t u v w x"], perms)
    bh = H.band_hashes(sig, 16, 8, 42)
    assert bh.shape == (3, 16)
    assert (bh[0] == bh[1]).all()
    assert not (bh[0] == bh[2]).all()


def test_simhash_close_for_similar():
    rng = np.random.default_rng(3)
    toks = [f"w{i}" for i in rng.integers(0, 1000, 300)]
    t2 = list(toks)
    t2[5] = "zzz"
    flat, lens = H.tokenize_offsets(pd.Series([" ".join(toks), " ".join(t2)]))
    th = H.hash_strings_u64(flat)
    fp = H.simhash_fingerprints(th, lens)
    assert H.hamming_distance_u64(fp[0:1], fp[1:2])[0] <= 6


def test_hamming_distance():
    a = np.array([0b1011], dtype=np.uint64)
    b = np.array([0b0010], dtype=np.uint64)
    assert H.hamming_distance_u64(a, b)[0] == 2


def test_plan_bands_properties():
    """The S-curve band planner: recall-weighted planning at the
    engine's threshold 0.75 / 128 hashes reproduces the configured
    (bands=16, rows=8) split (midpoint (1/16)^(1/8) = 0.7071); the
    balanced plan sits tighter around the threshold; midpoints grow
    with the threshold; every plan respects b*r <= n."""
    import pytest

    from event_deduplication_ray.stages.banding import plan_bands

    fn_heavy = plan_bands(0.75, 128, fp_weight=0.1, fn_weight=0.9)
    assert (fn_heavy["bands"], fn_heavy["rows"]) == (16, 8)
    assert abs(fn_heavy["midpoint"] - 0.707107) < 1e-6

    balanced = plan_bands(0.75, 128)
    assert balanced["bands"] * balanced["rows"] <= 128
    assert balanced["fn"] > fn_heavy["fn"]      # recall weighting works
    assert balanced["fp"] < fn_heavy["fp"]

    mids = [plan_bands(t, 128)["midpoint"] for t in (0.5, 0.75, 0.9)]
    assert mids == sorted(mids)

    with pytest.raises(ValueError):
        plan_bands(1.0, 128)
