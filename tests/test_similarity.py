import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.similarity import (
    brute_force_topk,
    embedding_dup_pairs,
    lsh_topk,
)

CFG = DedupConfig(join_num_partitions=4)


def _emb_ds(n=200, d=16, planted=None, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    for (i, j, noise) in planted or []:
        m[j] = m[i] + noise * rng.standard_normal(d)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in m],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(t), m


def test_brute_force_topk_matches_numpy():
    ds, m = _emb_ds()
    q = m[0]
    got = brute_force_topk(ds, q, k=5, exclude_ids={0})
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = mn @ qn
    cos[0] = -np.inf
    want = set(np.argsort(-cos)[:5].tolist())
    assert set(got["vec_id"]) == want
    assert (got["cos"].diff().dropna() <= 1e-9).all()  # sorted desc


def test_lsh_topk_finds_planted_near_dup():
    ds, m = _emb_ds(planted=[(0, 7, 0.01)])
    got = lsh_topk(ds, m[0], k=3)
    assert 7 in set(got["vec_id"])   # near-identical vector survives pruning


def test_embedding_dup_pairs_planted():
    ds, _ = _emb_ds(planted=[(0, 7, 0.005), (3, 9, 0.005)])
    pairs = embedding_dup_pairs(ds, CFG, cos_threshold=0.95).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 7) in found and (3, 9) in found
    assert (pairs["score"] >= 0.95).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_embedding_dup_pairs_no_false_positives_random():
    ds, _ = _emb_ds(seed=5)
    pairs = embedding_dup_pairs(ds, CFG, cos_threshold=0.95).to_pandas()
    assert len(pairs) == 0


def test_embedding_banding_shuffles_no_vectors():
    """The multi-probe banding explode must emit ONLY (band_key,
    doc_id) — 16 bytes/row — never the embedding payload (round-2
    rework: the old explode replicated vectors ×(n_bits+1) through
    the shuffle)."""
    import inspect

    from event_deduplication_ray.stages import similarity as S

    src = inspect.getsource(S.embedding_dup_pairs)
    # structural guarantee: the keyed table construction names exactly
    # the two narrow columns
    assert '"band_key": pa.array(band_key), "doc_id": pa.array(doc_id)}' in src


def test_embedding_dup_pairs_no_duplicate_pairs():
    ds, _ = _emb_ds(planted=[(0, 7, 0.001)])
    pairs = embedding_dup_pairs(ds, CFG, cos_threshold=0.9).to_pandas()
    assert not pairs.duplicated(["id_a", "id_b"]).any()
    assert set(pairs["tier"]) <= {"embedding"}


def test_srp_index_matches_lsh_topk(tmp_path):
    """The partitioned SRP index must return the same answer as the
    scan-based lsh_topk (same planes/seed → same candidate buckets)."""
    from event_deduplication_ray.stages.similarity import (
        srp_index_build,
        srp_index_topk,
    )

    ds, m = _emb_ds(n=400, d=16, planted=[(0, 7, 0.01), (3, 9, 0.02)])
    idx = str(tmp_path / "idx")
    srp_index_build(ds, idx)
    got = srp_index_topk(idx, m[0], k=5)
    want = lsh_topk(ds, m[0], k=5)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(got["cos"].to_numpy(), want["cos"].to_numpy())
    assert 7 in set(got["vec_id"])


def test_srp_index_reads_fraction_of_table(tmp_path):
    """Serving a query touches only the <= n_bits+1 matching partition
    dirs — the rows read must be a small fraction of the table (the
    round-2 weak: lsh_topk re-scanned everything per query)."""
    import os

    import pyarrow.parquet as pq

    from event_deduplication_ray.stages.similarity import (
        srp_bucket_codes,
        srp_index_build,
    )

    n, n_bits = 3000, 8
    ds, m = _emb_ds(n=n, d=16, seed=2)
    idx = str(tmp_path / "idx")
    srp_index_build(ds, idx, n_bits=n_bits)

    total = sum(
        pq.read_table(os.path.join(idx, d)).num_rows for d in os.listdir(idx)
    )
    assert total == n          # index covers the table exactly once

    q = m[0] / np.linalg.norm(m[0])
    q_code = int(srp_bucket_codes(q[None, :], n_bits, 42, 16)[0])
    near = {q_code} | {q_code ^ (1 << b) for b in range(n_bits)}
    scanned = sum(
        pq.read_table(p).num_rows
        for c in near
        if os.path.isdir(p := os.path.join(idx, f"srp_code={c}"))
    )
    # 9 of 256 buckets ~ 3.5% expected; assert a loose 20% bound
    assert scanned < 0.2 * n
    assert scanned > 0


def test_brute_force_topk_many_empty_block_safe():
    """An empty input block must not crash the per-batch argpartition
    (kk=0 used to raise 'kth out of bounds')."""
    from event_deduplication_ray.stages.similarity import brute_force_topk_many

    _, m = _emb_ds(n=50, d=8, seed=9)
    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    })
    full = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in m],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow([empty, full])
    got = brute_force_topk_many(ds, m[:2], k=5)
    assert len(got) == 2 * 5


def test_brute_force_topk_many_tie_break_on_vec_id():
    """Exact-cosine ties straddling k within one batch resolve by
    vec_id asc (the q31 oracle's row_number tie-break)."""
    from event_deduplication_ray.stages.similarity import brute_force_topk_many

    rng = np.random.default_rng(11)
    v = rng.standard_normal(8)
    # ids descending on purpose: 5 identical vectors, k=2 must pick
    # the two SMALLEST ids, not argpartition's arbitrary survivors
    m = np.vstack([v] * 5)
    t = pa.table({
        "vec_id": pa.array(np.array([9, 7, 5, 3, 1], dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in m],
                              pa.list_(pa.float32())),
    })
    got = brute_force_topk_many(rd.from_arrow(t), v[None, :], k=2)
    assert got["vec_id"].tolist() == [1, 3]


def test_brute_force_topk_many_matches_single():
    """Batched multi-query top-k agrees with the single-query baseline
    for every query row, in one pass over the table."""
    from event_deduplication_ray.stages.similarity import brute_force_topk_many

    ds, m = _emb_ds(n=300, d=16, seed=3)
    qmat = m[:4]
    got = brute_force_topk_many(ds, qmat, k=7)
    assert len(got) == 4 * 7
    for qi in range(4):
        single = brute_force_topk(ds, m[qi], k=7)
        sub = got[got["query_idx"] == qi]
        assert sub["vec_id"].tolist() == single["vec_id"].tolist()
        assert np.allclose(sub["cos"].to_numpy(), single["cos"].to_numpy())


def test_srp_index_add_identical_to_rebuild(tmp_path):
    """SRP maintenance is exact: codes are data-independent, so
    build(A) + add(B) serves every query identically to a full
    rebuild over A∪B — including queries whose answers live entirely
    in the added half."""
    import ray.data as rd
    from event_deduplication_ray.stages.similarity import (
        srp_index_add,
        srp_index_build,
        srp_index_topk,
    )

    ds, m = _emb_ds(n=300, d=16, planted=[(5, 250, 0.01)])
    t = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64())),
    })
    a = rd.from_arrow(t.slice(0, 150))
    b = rd.from_arrow(t.slice(150))

    inc = str(tmp_path / "inc")
    srp_index_build(a, inc)
    srp_index_add(b, inc)
    full = str(tmp_path / "full")
    srp_index_build(ds, full)

    for qi in (0, 5, 250, 299):
        gi = srp_index_topk(inc, m[qi], k=6)
        gf = srp_index_topk(full, m[qi], k=6)
        assert gi["vec_id"].tolist() == gf["vec_id"].tolist(), qi
        assert np.allclose(gi["cos"], gf["cos"])
    assert 250 in set(srp_index_topk(inc, m[5], k=6)["vec_id"])


def test_pca_fit_transform_planted(tmp_path):
    """PCA on planted anisotropic data: variance lives on axes 0 (sd
    3) and 1 (sd 1) with 0.01 noise elsewhere → the two components
    recover those axes (up to sign, which the deterministic rule
    fixes), explained variances order 9 : 1, projection reproduces
    the centered coordinates, and batch-size choice doesn't change
    the model (mergeable partials)."""
    import ray.data as rd
    from event_deduplication_ray.stages.similarity import (
        pca_fit,
        pca_transform,
    )

    rng = np.random.default_rng(5)
    n, d = 600, 10
    m = 0.01 * rng.standard_normal((n, d))
    m[:, 0] += 3.0 * rng.standard_normal(n)
    m[:, 1] += 1.0 * rng.standard_normal(n)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)

    model = pca_fit(ds, k=2)
    c = model["components"]
    assert abs(c[0, 0]) > 0.99 and abs(c[1, 1]) > 0.99
    assert c[0, 0] > 0 and c[1, 1] > 0           # deterministic sign
    ev = model["explained_var"]
    assert 6.0 < ev[0] / ev[1] < 13.0            # ~9x, noise-tolerant

    out = pca_transform(ds, model).to_pandas().sort_values("vec_id")
    p = np.vstack(out["proj"].to_numpy())
    want = (m - m.mean(axis=0)) @ c.T
    assert np.allclose(p, want, atol=1e-9)

    model_b = pca_fit(rd.from_arrow(t).repartition(7), k=2)
    assert np.allclose(model_b["components"], c, atol=1e-8)
    assert np.allclose(model_b["mean"], model["mean"], atol=1e-12)


def test_quantize_roundtrip_and_recall(tmp_path):
    """int8 quantization: every reconstructed value sits within half
    a quantization step of the original (per-dim bound), the model is
    batch-layout-independent (exact min/max folds), and cosine top-10
    over dequantized vectors overlaps float top-10 by >= 8/10 on
    random data."""
    import ray.data as rd
    from event_deduplication_ray.stages.similarity import (
        brute_force_topk,
        dequantize,
        quantize_fit,
        quantize_transform,
    )

    rng = np.random.default_rng(17)
    n, d = 500, 24
    m = rng.standard_normal((n, d)) * np.linspace(0.5, 4.0, d)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)

    model = quantize_fit(ds)
    model_b = quantize_fit(rd.from_arrow(t).repartition(9))
    assert np.array_equal(model["lo"], model_b["lo"])
    assert np.array_equal(model["scale"], model_b["scale"])

    out = quantize_transform(ds, model).to_pandas().sort_values("vec_id")
    codes = np.vstack(out["q8"].to_numpy()).astype(np.int8)
    deq = dequantize(codes, model)
    assert np.all(np.abs(deq - m) <= model["scale"] / 2 + 1e-9)

    q = m[0]
    want = set(brute_force_topk(ds, q, k=10)["vec_id"])
    dn = deq / np.linalg.norm(deq, axis=1, keepdims=True)
    got = set(np.argsort(-(dn @ (q / np.linalg.norm(q))))[:10].tolist())
    assert len(want & got) >= 8


def test_pq_encode_decode_and_topk(tmp_path):
    """Product quantization on planted clumps: 4 well-separated
    centers × tight noise in 64 dims, m=8 subspaces × 16 codes.
    Gates: codes are (n, 8) uint8 (8 bytes/vector = 32× vs float32);
    every reconstruction lands nearer its own original than any other
    clump's center; ADC top-k from a clump center returns exactly
    that clump; fit is deterministic."""
    import ray.data as rd
    from event_deduplication_ray.stages.similarity import (
        pq_decode,
        pq_fit,
        pq_topk,
        pq_transform,
    )

    rng = np.random.default_rng(11)
    n_per, d = 50, 64
    centers = rng.standard_normal((4, d)) * 4.0
    m = np.vstack([c + 0.05 * rng.standard_normal((n_per, d))
                   for c in centers])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)

    model = pq_fit(ds, m=8, n_codes=16)
    assert model["codebooks"].shape == (8, 16, 8)
    model_b = pq_fit(rd.from_arrow(t), m=8, n_codes=16)
    assert np.array_equal(model["codebooks"], model_b["codebooks"])

    enc = pq_transform(ds, model).to_pandas().sort_values("vec_id")
    codes = np.vstack(enc["pq_code"].to_numpy()).astype(np.uint8)
    assert codes.shape == (len(m), 8)

    rec = pq_decode(codes, model)
    d_own = ((rec - m) ** 2).sum(axis=1)
    d_other = np.min(
        [((rec - c) ** 2).sum(axis=1) for i, c in enumerate(centers)
         if True], axis=0)
    # reconstruction error ≪ inter-clump distance
    assert np.all(d_own < 1.0)
    for i in range(4):
        rows = slice(i * n_per, (i + 1) * n_per)
        others = [c for j, c in enumerate(centers) if j != i]
        d_off = np.min([((rec[rows] - c) ** 2).sum(axis=1)
                        for c in others], axis=0)
        assert np.all(d_own[rows] < d_off)

    enc_ds = pq_transform(ds, model)
    top = pq_topk(enc_ds, model, centers[2], k=n_per)
    want = set(range(2 * n_per, 3 * n_per))
    assert set(top["vec_id"]) == want
    assert len(top) == n_per


def test_pq_dim_guard_and_empty_batch(tmp_path):
    import pytest

    import ray.data as rd
    from event_deduplication_ray.stages.similarity import pq_fit

    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[0.0] * 10, [1.0] * 10],
                              pa.list_(pa.float64())),
    })
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(rd.from_arrow(t), m=3)


def test_mmr_topk_diversifies_planted(tmp_path):
    """A 6-copy clump nearest the query monopolizes plain top-k; MMR
    at λ=0.5 must interleave the second clump within the top 4.
    Rank 1 is always the globally most-relevant vector."""
    import ray.data as rd
    from event_deduplication_ray.stages.similarity import (
        brute_force_topk,
        mmr_topk,
    )

    rng = np.random.default_rng(23)
    d = 16
    c1 = rng.standard_normal(d)
    c2 = rng.standard_normal(d)
    rows = [c1 + 1e-3 * rng.standard_normal(d) for _ in range(6)]
    rows += [c2 + 1e-3 * rng.standard_normal(d) for _ in range(6)]
    m = np.vstack(rows)
    t = pa.table({
        "vec_id": pa.array(np.arange(12, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)
    q = c1 + 0.3 * c2

    plain = brute_force_topk(ds, q, k=4)["vec_id"].to_numpy()
    assert set(plain) <= set(range(6))       # clump 1 monopolizes

    got = mmr_topk(ds, q, k=4, lambda_=0.5, pool=12)
    ids = got["vec_id"].to_numpy()
    assert got["rank"].tolist() == [0, 1, 2, 3]
    assert ids[0] == plain[0]                # most relevant first
    assert (ids >= 6).any()                  # second clump surfaced
    # scores are non-increasing marginal gains for a fixed λ ordering
    assert len(set(ids)) == 4
