"""IVF (inverted-file) ANN index: build → partitioned layout → probe-
limited serving.  Reference analog: the engine's SRP index; the IVF
variant is the data-adaptive coarse quantizer named by the build brief
("IVF or LSH-bucketed variant as the scale path")."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from event_deduplication_ray.stages.similarity import (
    brute_force_topk,
    ivf_index_build,
    ivf_topk,
    spherical_kmeans,
)


def _clustered_ds(n_clumps=8, per=25, d=16, seed=3):
    """Well-separated direction clumps: IVF's best case, and the case
    where the planted neighbors MUST survive pruning."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clumps, d)) * 10
    rows = []
    for c in centers:
        rows.append(c + 0.05 * rng.standard_normal((per, d)))
    m = np.vstack(rows)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float64())),
    })
    return rd.from_arrow(t), m


def test_spherical_kmeans_separates_clumps():
    _, m = _clustered_ds()
    cent = spherical_kmeans(m, n_lists=8, seed=1)
    assert cent.shape == (8, m.shape[1])
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    # every clump should map to a single list, one list per clump
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    assign = (mn @ cent.T).argmax(axis=1)
    lists_per_clump = [len(set(assign[i * 25:(i + 1) * 25])) for i in range(8)]
    assert lists_per_clump == [1] * 8
    assert len(set(assign)) == 8


def test_ivf_pruned_probe_matches_brute_force_on_clumps(tmp_path):
    ds, m = _clustered_ds()
    idx = str(tmp_path / "ivf")
    ivf_index_build(ds, idx, n_lists=8, seed=1)
    q = m[0] + 0.01 * np.ones_like(m[0])
    got = ivf_topk(idx, q, k=10, n_probes=2)
    want = brute_force_topk(ds, q, k=10)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(got["cos"], want["cos"], atol=1e-6)


def test_ivf_full_probes_equal_brute_force_on_random(tmp_path):
    # unstructured data: full probes must STILL return the exact global
    # top-k (the q32 oracle-gate mode)
    rng = np.random.default_rng(11)
    m = rng.standard_normal((300, 12))
    t = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)
    idx = str(tmp_path / "ivf")
    ivf_index_build(ds, idx, n_lists=16, seed=2)
    q = rng.standard_normal(12)
    got = ivf_topk(idx, q, k=7, n_probes=16)
    want = brute_force_topk(ds, q, k=7)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()


def test_ivf_probe_scans_fraction_of_rows(tmp_path):
    # the point of the index: a pruned query READS only its probed
    # lists, not the table
    ds, m = _clustered_ds()
    idx = str(tmp_path / "ivf")
    ivf_index_build(ds, idx, n_lists=8, seed=1)
    total = sum(
        pq.read_table(os.path.join(r, f)).num_rows
        for r, _, fs in os.walk(idx) for f in fs
        if f.endswith(".parquet") and "centroids" not in f
    )
    assert total == 200
    cent = pq.read_table(f"{idx}/centroids.parquet")
    cc = cent["centroid"].combine_chunks()
    d = cc.type.list_size
    cm = cc.flatten().to_numpy(zero_copy_only=False).reshape(len(cent), d)
    qn = m[0] / np.linalg.norm(m[0])
    probe = np.argsort(-(cm @ qn))[:2]
    probed_rows = sum(
        pq.read_table(os.path.join(dirp, f)).num_rows
        for li in cent["ivf_list"].to_numpy()[probe]
        if os.path.isdir(dirp := os.path.join(idx, f"ivf_list={li}"))
        for f in os.listdir(dirp) if f.endswith(".parquet")
    )
    assert probed_rows <= total * 0.5


def test_semantic_dedup_planted_clumps():
    """Each tight clump keeps exactly its min vec_id; isolated
    vectors all keep; output covers every input row once."""
    from event_deduplication_ray.stages.similarity import semantic_dedup

    ds, m = _clustered_ds(n_clumps=6, per=10, d=16, seed=7)
    out = semantic_dedup(ds, n_lists=6, cos_threshold=0.95,
                         sample_size=1000, seed=1).to_pandas()
    n = len(m)
    assert sorted(out["vec_id"]) == list(range(n))
    kept = set(out.loc[out["keep"], "vec_id"])
    # clump i occupies vec_ids [10i, 10i+10) — min id survives
    for i in range(6):
        ids = set(range(10 * i, 10 * i + 10))
        assert ids & kept == {10 * i}, (i, ids & kept)


def test_semantic_dedup_no_dups_keeps_all():
    """Spread-out vectors (max pairwise cosine < threshold) all keep."""
    from event_deduplication_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    m = rng.standard_normal((40, 32))
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float64())),
    })
    out = semantic_dedup(rd.from_arrow(t), n_lists=4, cos_threshold=0.99,
                         sample_size=100, seed=2).to_pandas()
    assert len(out) == 40 and out["keep"].all()


def test_ivf_index_add_full_probe_exact_over_union(tmp_path):
    """Index maintenance: build on the first half (centroids frozen),
    ivf_index_add the second half → full-probe serving is EXACT over
    the union (matches brute force), and a query aimed at an
    added-half vector finds it."""
    import ray.data as rd
    from event_deduplication_ray.stages.similarity import (
        brute_force_topk,
        ivf_index_add,
    )

    rng = np.random.default_rng(21)
    m = rng.standard_normal((240, 12))
    def ds_of(lo, hi):
        t = pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in m[lo:hi]],
                                  pa.list_(pa.float64())),
        })
        return rd.from_arrow(t)

    idx = str(tmp_path / "ivf")
    ivf_index_build(ds_of(0, 120), idx, n_lists=8, seed=3)
    ivf_index_add(ds_of(120, 240), idx)

    q = m[200] + 0.01
    got = ivf_topk(idx, q, k=9, n_probes=8)
    want = brute_force_topk(ds_of(0, 240), q, k=9)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert 200 in set(got["vec_id"])


def test_ivfpq_pruned_probe_recall_on_clumps(tmp_path):
    """IVF-PQ: pruned probing (2/8 lists) over 8-byte codes must
    recover the query's clump — set-identical to brute force on
    well-separated clumps (PQ resolution can reorder WITHIN the tight
    clump, so the gate is the id set, not the order)."""
    from event_deduplication_ray.stages.similarity import (
        ivfpq_index_build,
        ivfpq_topk,
    )

    ds, m = _clustered_ds()
    idx = str(tmp_path / "ivfpq")
    ivfpq_index_build(ds, idx, n_lists=8, m=8, n_codes=16, seed=1)

    # within a 0.05-noise clump PQ cannot rank members (that's the
    # resolution trade), so the gate is CLUMP recovery: top-25 must be
    # exactly the query's 25-member clump, as brute force agrees
    q = m[0] + 0.01 * np.ones_like(m[0])
    got = ivfpq_topk(idx, q, k=25, n_probes=2)
    want = brute_force_topk(ds, q, k=25)
    assert set(want["vec_id"]) == set(range(25))
    assert set(got["vec_id"]) == set(range(25))
    assert (got["adc_dist"].to_numpy() >= -1e-12).all()
    assert got["adc_dist"].is_monotonic_increasing

    # payload is m bytes per vector
    files = []
    for sub in os.listdir(idx):
        d = os.path.join(idx, sub)
        if sub.startswith("ivf_list=") and os.path.isdir(d):
            files += [os.path.join(d, f) for f in os.listdir(d)]
    t = pq.read_table(files[0])
    assert t["pq_code"].combine_chunks().type.list_size == 8

    # full probe degrades gracefully to an exact (up to PQ) scan
    full = ivfpq_topk(idx, q, k=25, n_probes=8)
    assert set(full["vec_id"]) == set(range(25))


def test_ivfpq_scan_fraction_bounded(tmp_path):
    """Pruned serving must READ only the probed lists: rows read at
    n_probes=1 ≈ one clump, not the corpus."""
    import ray.data as rd2

    from event_deduplication_ray.stages.similarity import (
        ivfpq_index_build,
    )

    ds, m = _clustered_ds()
    idx = str(tmp_path / "ivfpq")
    ivfpq_index_build(ds, idx, n_lists=8, m=8, n_codes=16, seed=1)
    # the single probed list's dir holds ~1 clump of 25 vectors
    cent = pq.read_table(f"{idx}/centroids.parquet")
    d = cent["centroid"].combine_chunks().type.list_size
    c = cent["centroid"].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False).reshape(-1, d)
    qn = m[0] / np.linalg.norm(m[0])
    li = int(cent["ivf_list"][int(np.argmax(c @ qn))].as_py())
    rows = rd2.read_parquet(f"{idx}/ivf_list={li}").count()
    assert rows <= 2 * 25     # one clump (slack for seeding quirks)


def test_dbscan_roles_planted_angles(tmp_path):
    """Controlled cosine geometry in the (e1, e2) plane, eps =
    cos(10°), min_pts=4: a 5-member clump at angles −4.9…4.9° (all
    pairs within 9.8°) is CORE in one min-id cluster; a vector at 13°
    neighbors only the +4.9° member → BORDER of that cluster; a lone
    3°-apart pair (1 neighbor each) and an isolated vector are
    NOISE."""
    import ray.data as rd
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.similarity import dbscan_embeddings

    def vec(deg):
        r = np.deg2rad(deg)
        v = np.zeros(8)
        v[0], v[1] = np.cos(r), np.sin(r)
        return v

    angles = {1: -4.9, 2: -2.0, 3: 0.0, 4: 2.0, 5: 4.9,
              6: 13.0, 7: 60.0, 8: 63.0, 9: 90.0}
    t = pa.table({
        "vec_id": pa.array(sorted(angles), pa.int64()),
        "embedding": pa.array([vec(angles[i]).tolist()
                               for i in sorted(angles)],
                              pa.list_(pa.float64())),
    })
    eps = float(np.cos(np.deg2rad(10.0)))
    out = dbscan_embeddings(rd.from_arrow(t),
                            DedupConfig(join_num_partitions=4),
                            cos_threshold=eps, min_pts=4) \
        .set_index("vec_id")
    assert (out.loc[[1, 2, 3, 4, 5], "role"] == "core").all()
    assert out.loc[[1, 2, 3, 4, 5], "cluster_id"].nunique() == 1
    assert out.loc[1, "cluster_id"] == 1          # min-id label
    assert out.loc[6, "role"] == "border"
    assert out.loc[6, "cluster_id"] == 1
    assert (out.loc[[7, 8, 9], "role"] == "noise").all()
    assert (out.loc[[7, 8, 9], "cluster_id"] == -1).all()


def test_dbscan_min_pts_one_equals_threshold_cc(tmp_path):
    """min_pts=1 degenerates to q42-style threshold CC: every vector
    with an ε-neighbor clusters, none are border/noise among paired
    vectors."""
    import ray.data as rd
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.similarity import dbscan_embeddings

    ds, m = _clustered_ds(n_clumps=3, per=5, d=16, seed=13)
    out = dbscan_embeddings(ds, DedupConfig(join_num_partitions=4),
                            cos_threshold=0.99, min_pts=1)
    core = out[out["role"] == "core"]
    assert len(core) == 15 and core["cluster_id"].nunique() == 3
    for i in range(3):
        ids = list(range(5 * i, 5 * i + 5))
        labs = out.set_index("vec_id").loc[ids, "cluster_id"]
        assert labs.nunique() == 1 and labs.iloc[0] == 5 * i
