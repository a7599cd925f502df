"""Adversarial hot-band fixture (VERDICT r1 #7 / north-rule skew
handling): a blocking group larger than max_block_pairs whose hub
(min-doc_id member) is DISSIMILAR to the mutually-similar members.
Star-only pairing loses the whole family (every hub edge fails
verification); the chain fallback must keep it connected."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.fixtures import wrap_html
from event_deduplication_ray.functions.hashing import doc_ids_for_urls
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path
from event_deduplication_ray.stages.pairs import _pairs_from_groups


def test_chain_pairs_connect_family_with_dissimilar_hub():
    """Unit level: hot group of 100; star edges from the hub plus a
    chain over consecutive members."""
    band = pd.DataFrame({"band_key": 7, "doc_id": np.arange(100, dtype=np.int64)})
    p = _pairs_from_groups(band, "band_key", cap=64)
    pairs = set(zip(p["id_a"], p["id_b"]))
    # star edges
    assert all((0, i) in pairs for i in range(1, 100))
    # chain edges: members stay connected even if every hub edge fails
    assert all((i, i + 1) in pairs for i in range(1, 99))
    # O(g): star (g-1) + chain (g-1), minus the shared (0,1) edge
    assert len(pairs) == 99 + 98


def test_adversarial_hot_band_recall_e2e(tmp_path):
    """E2E via the substring tier (deterministic group membership: a
    shared boilerplate shingle puts ALL docs carrying it in one fp
    group).  40 identical long docs + 1 short outlier that shares only
    the boilerplate and is engineered to be the group's least-padded
    min-id member — the hub the star pairs against.  Hub containment
    vs members is far below threshold (its own body is unique), so
    star-only pairing would lose the whole family; chain edges
    (containment 1.0 between identical members) must keep it
    together, and the outlier must NOT merge in (precision)."""
    rng = np.random.default_rng(21)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def words(n):
        return ["".join(letters[rng.integers(0, 26, size=7)]) for _ in range(n)]

    # boiler:body = 100:100 — star containments both fail:
    #   hub(outlier) vs member: 96/156 ~ 0.62 < 0.8
    #   hub(member m0, body groups) vs member: 100/196 ~ 0.51 < 0.8
    # so ONLY chain edges (1.0 between identical members) connect the
    # family; pre-chain code shatters it (verified arithmetic)
    boiler = words(100)
    body = words(100)
    texts, urls = [], []
    for i in range(40):
        texts.append(" ".join(boiler + body))
        urls.append(f"https://fam.example/m{i:03d}")
    member_ids = doc_ids_for_urls(pd.Series(urls))
    # outlier takes the min doc_id so it becomes the star hub of any
    # group it joins; short => fewest fps => also the substring-tier
    # hub choice (least padded)
    outlier_url = None
    for i in range(50000):
        cand = f"https://outlier.example/x{i:05d}"
        if doc_ids_for_urls(pd.Series([cand]))[0] < member_ids.min():
            outlier_url = cand
            break
    assert outlier_url is not None
    texts.append(" ".join(boiler + words(60)))   # least-padded: fewest fps
    urls.append(outlier_url)

    n = len(urls)
    ts0 = np.datetime64("2025-06-01T00:00:00", "us")
    docs = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([ts0] * n, pa.timestamp("us")),
        "html": pa.array(
            [wrap_html(texts[i], f"t{i}", "fam.example") for i in range(n)],
            pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(docs, str(d / "part-0000.parquet"))

    # substring tier only; small caps force the hot (hub-star) path
    cfg = DedupConfig(join_num_partitions=4, use_minhash=False,
                      use_substring=True, substring_small_cap=8,
                      substring_mod_p=1, substring_drop_group=10_000)
    res = dedup_path(str(d), cfg)
    asn = res.assignments.to_pandas()
    fam = asn[asn.doc_id.isin(set(member_ids.tolist()))]
    assert fam["cluster_id"].nunique() == 1, fam["cluster_id"].nunique()
    out_id = int(doc_ids_for_urls(pd.Series([outlier_url]))[0])
    hub_cluster = asn.set_index("doc_id").loc[out_id, "cluster_id"]
    assert hub_cluster != fam["cluster_id"].iloc[0]


def test_salted_pair_rows_structure():
    """Salted mode (hot_pair_mode="salted"): a 100-member hot group
    at cap=16 yields (a) all-pairs inside each hash-salted subgroup,
    (b) the full consecutive-by-id chain, (c) one connected
    component, (d) canonical id_a < id_b, (e) identical output for a
    permuted input (determinism is content-defined, not
    order-defined)."""
    from event_deduplication_ray.stages.pairs import (
        _enumerate_pair_rows,
        _group_offsets,
        _sorted_dedup,
    )

    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(10_000, size=100, replace=False)).astype(np.int64)
    k = np.full(100, 7, dtype=np.int64)

    def pairs_of(perm):
        ks, ds, _ = _sorted_dedup(k, docs[perm], [])
        starts, sizes = _group_offsets(ks)
        a, b = _enumerate_pair_rows(starts, sizes, cap=16,
                                    mode="salted", ds=ds)
        return set(zip(ds[a].tolist(), ds[b].tolist()))

    pairs = pairs_of(np.arange(100))
    # canonical order
    assert all(x < y for x, y in pairs)
    # chain present
    assert all((int(docs[i]), int(docs[i + 1])) in pairs for i in range(99))
    # connected: union-find over the pairs
    parent = {int(d): int(d) for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        parent[find(x)] = find(y)
    assert len({find(int(d)) for d in docs}) == 1
    # bounded: well under all-pairs, at least chain + some subgroup density
    assert 99 <= len(pairs) < 100 * 99 // 2
    assert len(pairs) > 200        # subgroup all-pairs add real density
    # order-free determinism
    assert pairs_of(rng.permutation(100)) == pairs


def test_adversarial_hot_band_recall_salted(tmp_path):
    """The adversarial fixture of
    test_adversarial_hot_band_recall_e2e, run with
    hot_pair_mode="salted": the family must still collapse to ONE
    cluster and the dissimilar min-id outlier must stay out —
    whichever subgroup the outlier salts into, within-subgroup
    all-pairs and the global chain connect the identical members."""
    rng = np.random.default_rng(21)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def words(n):
        return ["".join(letters[rng.integers(0, 26, size=7)]) for _ in range(n)]

    boiler = words(100)
    body = words(100)
    texts, urls = [], []
    for i in range(40):
        texts.append(" ".join(boiler + body))
        urls.append(f"https://fam.example/m{i:03d}")
    member_ids = doc_ids_for_urls(pd.Series(urls))
    outlier_url = None
    for i in range(50000):
        cand = f"https://outlier.example/x{i:05d}"
        if doc_ids_for_urls(pd.Series([cand]))[0] < member_ids.min():
            outlier_url = cand
            break
    assert outlier_url is not None
    texts.append(" ".join(boiler + words(60)))
    urls.append(outlier_url)

    n = len(urls)
    ts0 = np.datetime64("2025-06-01T00:00:00", "us")
    docs = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([ts0] * n, pa.timestamp("us")),
        "html": pa.array(
            [wrap_html(texts[i], f"t{i}", "fam.example") for i in range(n)],
            pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(docs, str(d / "part-0000.parquet"))

    cfg = DedupConfig(join_num_partitions=4, use_minhash=False,
                      use_substring=True, substring_small_cap=8,
                      substring_mod_p=1, substring_drop_group=10_000,
                      hot_pair_mode="salted")
    res = dedup_path(str(d), cfg)
    asn = res.assignments.to_pandas()
    fam = asn[asn.doc_id.isin(set(member_ids.tolist()))]
    assert fam["cluster_id"].nunique() == 1, fam["cluster_id"].nunique()
    out_id = int(doc_ids_for_urls(pd.Series([outlier_url]))[0])
    hub_cluster = asn.set_index("doc_id").loc[out_id, "cluster_id"]
    assert hub_cluster != fam["cluster_id"].iloc[0]


def test_salted_flagship_matches_star_chain_clusters(tmp_path):
    """Flagship clustering on the golden fixture corpus must be
    IDENTICAL under both hot-group modes (the fixture's dup families
    are genuinely similar, so denser hot-group evidence cannot change
    the verified components) — the equivalence the knob's docstring
    promises."""
    from event_deduplication_ray import fixtures as F

    d = F.materialize_corpus(str(tmp_path / "c"), 1500, seed=11)
    cfgs = {
        m: DedupConfig(join_num_partitions=4, use_simhash=True,
                       use_substring=True, hot_pair_mode=m)
        for m in ("star_chain", "salted")
    }
    asn = {
        m: dedup_path(f"{d}/docs", cfg).assignments.to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
        for m, cfg in cfgs.items()
    }
    a, b = asn["star_chain"], asn["salted"]
    assert (a["doc_id"] == b["doc_id"]).all()
    # same partition: cluster ids are min-member ids → comparable directly
    assert (a["cluster_id"] == b["cluster_id"]).all()
