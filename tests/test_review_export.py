"""Review-edit surgery, export sinks, serving queries, exact tier."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines import review as R
from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path
from event_deduplication_ray.pipelines.export import (
    cluster_detail,
    export_canonical_parquet,
    list_canonical,
)

CFG = DedupConfig(use_substring=True, join_num_partitions=4)


@pytest.fixture(scope="module")
def result(corpus_dir):
    return dedup_path(f"{corpus_dir}/docs", CFG)


@pytest.fixture(scope="module")
def asn_df(result):
    return result.assignments.to_pandas()


def test_split_moves_doc_to_singleton(result, asn_df):
    multi = asn_df.groupby("cluster_id").size()
    cid = multi[multi > 2].index[0]
    victim = int(asn_df[asn_df.cluster_id == cid]["doc_id"].iloc[1])
    edits, audit = R.split_doc(R.empty_edits(), R.empty_audit(), victim)
    out = R.apply_edits(result.assignments, edits, CFG).to_pandas()
    out = out.set_index("doc_id")["cluster_id"]
    assert out[victim] == victim
    # everyone else untouched
    before = asn_df.set_index("doc_id")["cluster_id"].drop(victim)
    assert (out.drop(victim).sort_index() == before.sort_index()).all()
    assert audit.iloc[0]["action_type"] == "split"


def test_merge_clusters(result, asn_df):
    sizes = asn_df.groupby("cluster_id").size()
    donor, survivor = int(sizes.index[0]), int(sizes.index[1])
    edits, audit = R.merge_clusters(
        R.empty_edits(), R.empty_audit(), asn_df, donor, survivor
    )
    out = R.apply_edits(result.assignments, edits, CFG).to_pandas()
    assert (out[out.doc_id.isin(
        asn_df[asn_df.cluster_id == donor].doc_id)]["cluster_id"] == survivor).all()
    assert (audit["action_type"] == "merge").all()


def test_audit_log_survives_restart(result, asn_df, tmp_path):
    """Reference R3: the audit trail is durable.  Edits written through
    AuditLog must be readable after a process restart (a fresh AuditLog
    over the same run dir), and replaying them must reproduce the edit
    table exactly."""
    run_dir = str(tmp_path / "run")
    log = R.AuditLog(run_dir)

    multi = asn_df.groupby("cluster_id").size()
    cid = multi[multi > 2].index[0]
    victim = int(asn_df[asn_df.cluster_id == cid]["doc_id"].iloc[1])
    sizes = asn_df.groupby("cluster_id").size()
    donor, survivor = int(sizes.index[0]), int(sizes.index[1])

    edits, audit = R.split_doc(R.empty_edits(), R.empty_audit(), victim, log=log)
    edits, audit = R.merge_clusters(edits, audit, asn_df, donor, survivor,
                                    log=log)

    # "restart": a fresh AuditLog instance reads everything back
    recovered = R.AuditLog(run_dir).load()
    pd.testing.assert_frame_equal(
        recovered.reset_index(drop=True), audit.reset_index(drop=True)
    )

    # replay reproduces the edit table (last edit per doc wins)
    replayed = R.edits_from_audit(recovered)
    a = edits.sort_values("doc_id").reset_index(drop=True)
    b = replayed.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # applying recovered edits matches applying the in-memory ones
    out1 = R.apply_edits(result.assignments, edits, CFG).to_pandas()
    out2 = R.apply_edits(result.assignments, replayed, CFG).to_pandas()
    m = out1.merge(out2, on="doc_id", suffixes=("_a", "_b"))
    assert (m["cluster_id_a"] == m["cluster_id_b"]).all()


def test_audit_log_append_only(tmp_path):
    """Appends never rewrite earlier parts: each edit batch lands in
    its own immutable file."""
    run_dir = str(tmp_path / "run2")
    log = R.AuditLog(run_dir)
    _, audit = R.split_doc(R.empty_edits(), R.empty_audit(), 1, log=log)
    first_parts = sorted(os.listdir(log.dir))
    _, audit = R.split_doc(R.empty_edits(), audit, 2, log=log)
    second_parts = sorted(os.listdir(log.dir))
    assert len(second_parts) == len(first_parts) + 1
    assert set(first_parts) <= set(second_parts)
    assert len(R.AuditLog(run_dir).load()) == 2


def test_resynthesize_touched_only(result, asn_df, corpus_dir):
    multi = asn_df.groupby("cluster_id").size()
    cid = multi[multi > 2].index[0]
    victim = int(asn_df[asn_df.cluster_id == cid]["doc_id"].iloc[1])
    edits, _ = R.split_doc(R.empty_edits(), R.empty_audit(), victim)
    can2 = R.resynthesize_after_edits(
        result.docs, result.assignments, edits, CFG
    ).to_pandas()
    can1 = result.canonical.to_pandas()
    assert len(can2) == len(can1) + 1          # new singleton appeared
    m1 = can1.set_index("cluster_id")["n_members"]
    m2 = can2.set_index("cluster_id")["n_members"]
    untouched = m1.index.difference([cid, victim])
    assert (m2[untouched] == m1[untouched]).all()
    assert m2[cid] == m1[cid] - 1
    assert m2[victim] == 1


def test_export_parquet_filtered(result, tmp_path):
    out = export_canonical_parquet(
        result.canonical, str(tmp_path / "exp"), rows_per_file=100
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    total = sum(pq.ParquetFile(os.path.join(out, f)).metadata.num_rows for f in files)
    assert total == result.canonical.count()


def test_list_canonical_pagination(result):
    p1 = list_canonical(result.canonical, sort_by="n_members", limit=5)
    p2 = list_canonical(result.canonical, sort_by="n_members", offset=5, limit=5)
    assert len(p1) == 5 and len(p2) == 5
    assert set(p1.cluster_id).isdisjoint(set(p2.cluster_id))
    assert (p1["n_members"].to_numpy()[:-1] >= p1["n_members"].to_numpy()[1:]).all()
    assert p1["n_members"].min() >= p2["n_members"].max()


def test_cluster_detail_provenance(result, asn_df):
    sizes = asn_df.groupby("cluster_id").size()
    cid = int(sizes[sizes > 2].index[0])
    d = cluster_detail(result.canonical, result.assignments, result.docs,
                       result.verified_pairs, cid)
    assert len(d["canonical"]) == 1
    assert len(d["members"]) == sizes[cid]
    assert set(d["members"]["doc_id"]).issuperset(
        set(d["decisions"]["id_a"]) | set(d["decisions"]["id_b"])
    ) or len(d["decisions"]) == 0


def test_exact_tier_resolves_ambiguous(result, tmp_path):
    from event_deduplication_ray.stages.exact_verify import exact_jaccard_tier

    cache = str(tmp_path / "cache")
    out = exact_jaccard_tier(result.verified_pairs, result.docs, CFG,
                             cache_dir=cache).to_pandas()
    amb_before = (result.verified_pairs.to_pandas()["decision"] == "ambiguous").sum()
    exact_rows = out[out["tier"] == "exact"]
    assert len(exact_rows) == amb_before
    # second run hits the cache and produces the same decisions
    out2 = exact_jaccard_tier(result.verified_pairs, result.docs, CFG,
                              cache_dir=cache).to_pandas()
    a = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = out2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_exact_tier_cache_invalidated_by_config(result, tmp_path):
    """A cache written under one shingle config must be IGNORED by a
    run with a different config fingerprint (round-2 ADVICE: stale
    cache entries silently replaced scores)."""
    from event_deduplication_ray.stages.exact_verify import (
        exact_config_fingerprint,
        exact_jaccard_tier,
    )

    cache = str(tmp_path / "cache_fp")
    cfg_a = CFG
    cfg_b = CFG.with_overrides(shingle_k=3)
    assert exact_config_fingerprint(cfg_a) != exact_config_fingerprint(cfg_b)

    out_a = exact_jaccard_tier(result.verified_pairs, result.docs, cfg_a,
                               cache_dir=cache).to_pandas()
    # run under cfg_b against cfg_a's cache: scores must equal a
    # cache-free cfg_b run, not cfg_a's cached scores
    out_b = exact_jaccard_tier(result.verified_pairs, result.docs, cfg_b,
                               cache_dir=cache).to_pandas()
    ref_b = exact_jaccard_tier(result.verified_pairs, result.docs,
                               cfg_b).to_pandas()
    key = ["id_a", "id_b"]
    b = out_b[out_b.tier == "exact"].sort_values(key).reset_index(drop=True)
    rb = ref_b[ref_b.tier == "exact"].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, rb)
    # both fingerprints coexist in the cache dir; a rerun under cfg_a
    # still matches its own first run
    out_a2 = exact_jaccard_tier(result.verified_pairs, result.docs, cfg_a,
                                cache_dir=cache).to_pandas()
    a = out_a.sort_values(key).reset_index(drop=True)
    a2 = out_a2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, a2)


def test_exact_tier_missing_text_stays_ambiguous(result):
    """Pairs whose doc id is absent from the text table keep their
    cheap-tier score and stay ambiguous (left-join semantics), instead
    of being dropped."""
    from event_deduplication_ray.stages.exact_verify import exact_jaccard_tier

    vp = result.verified_pairs.to_pandas()
    amb = vp[vp.decision == "ambiguous"]
    if len(amb) == 0:
        pytest.skip("fixture produced no ambiguous pairs")
    drop_ids = set(amb["id_a"].head(3).tolist())
    docs_df = result.docs.to_pandas()
    docs_pruned = rd.from_pandas(docs_df[~docs_df.doc_id.isin(drop_ids)])
    out = exact_jaccard_tier(result.verified_pairs, docs_pruned, CFG).to_pandas()
    # every input pair survives
    assert len(out) == len(vp)
    touched = out[out.id_a.isin(drop_ids) | out.id_b.isin(drop_ids)]
    amb_touched = amb[amb.id_a.isin(drop_ids) | amb.id_b.isin(drop_ids)]
    t = touched.merge(amb_touched[["id_a", "id_b", "score"]],
                      on=["id_a", "id_b"], suffixes=("", "_cheap"))
    assert len(t) == len(amb_touched)
    assert (t["decision"] == "ambiguous").all()
    assert np.allclose(t["score"], t["score_cheap"])


def test_exact_tier_cache_no_foreign_pair_injection(result, tmp_path):
    """A shared cache must behave as a per-pair LOOKUP (the reference
    resolver consults its cache pair-by-pair, ai_matching/cache.py):
    cached pairs absent from the current run's input must not be
    injected into the output — a cache populated by a full run, then
    consulted by a run over a pair subset, returns only subset pairs."""
    from event_deduplication_ray.stages.exact_verify import exact_jaccard_tier

    cache = str(tmp_path / "cache_subset")
    vp = result.verified_pairs.to_pandas()
    amb = vp[vp.decision == "ambiguous"]
    if len(amb) < 2:
        pytest.skip("need >=2 ambiguous pairs")
    # populate the cache from the full pair table
    exact_jaccard_tier(result.verified_pairs, result.docs, CFG,
                       cache_dir=cache).to_pandas()
    # rerun over a subset missing one previously-cached ambiguous pair
    drop = amb.iloc[[0]][["id_a", "id_b"]]
    keep = vp.merge(drop.assign(__d=1), on=["id_a", "id_b"], how="left")
    keep = keep[keep["__d"].isna()].drop(columns="__d")
    out = exact_jaccard_tier(rd.from_pandas(keep), result.docs, CFG,
                             cache_dir=cache).to_pandas()
    assert len(out) == len(keep)
    dropped_pair = (int(drop.id_a.iloc[0]), int(drop.id_b.iloc[0]))
    assert dropped_pair not in set(zip(out.id_a, out.id_b))
    # and the surviving cached pairs still resolve identically to a
    # cache-free run over the same subset
    ref = exact_jaccard_tier(rd.from_pandas(keep), result.docs, CFG).to_pandas()
    key = ["id_a", "id_b"]
    a = out.sort_values(key).reset_index(drop=True)
    b = ref.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_export_parquet_partitioned(result, tmp_path):
    """partition_by writes hive layout (one dir per key value) whose
    union re-reads to exactly the unpartitioned row set — the
    skip-finished-partitions resume contract."""
    import ray.data as rd

    out = export_canonical_parquet(
        result.canonical, str(tmp_path / "part_exp"),
        partition_by=["rep_lang"])
    dirs = [d for d in os.listdir(out) if d.startswith("rep_lang=")]
    assert len(dirs) >= 2
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == result.canonical.count()
    want = result.canonical.to_pandas()
    assert set(back["cluster_id"]) == set(want["cluster_id"])
    # every row landed in the directory matching its key
    for d in dirs:
        lang = d.split("=", 1)[1]
        sub = rd.read_parquet(os.path.join(out, d)).to_pandas()
        assert (back.set_index("cluster_id").loc[sub["cluster_id"],
                "rep_lang"] == lang).all()


def test_export_bundle_small_is_json(result, tmp_path):
    """<= chunk_limit rows → ONE .json file with every row (the
    reference's small-response path)."""
    import json

    from event_deduplication_ray.pipelines.export import (
        export_canonical_bundle,
    )

    n = result.canonical.count()
    p = export_canonical_bundle(result.canonical,
                                str(tmp_path / "bundle"),
                                chunk_limit=n + 10)
    assert p.endswith(".json")
    rows = json.load(open(p))
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == set(
        result.canonical.to_pandas()["cluster_id"])


def test_export_bundle_large_is_zip_of_chunks(result, tmp_path):
    """> chunk_limit rows → a ZIP whose JSONL members hold every row
    in <= chunk_limit pieces (the reference's ZIP path)."""
    import io
    import json
    import zipfile

    from event_deduplication_ray.pipelines.export import (
        export_canonical_bundle,
    )

    n = result.canonical.count()
    limit = max(n // 4, 1)
    p = export_canonical_bundle(result.canonical,
                                str(tmp_path / "bundle"),
                                chunk_limit=limit)
    assert p.endswith(".zip")
    seen = []
    with zipfile.ZipFile(p) as zf:
        names = sorted(zf.namelist())
        assert len(names) >= 2
        for m in names:
            for line in io.TextIOWrapper(zf.open(m)):
                seen.append(json.loads(line))
    assert len(seen) == n


def test_explain_pair(tmp_path):
    """Pair EXPLAIN: a planted exact-dup pair reports exact_jaccard
    1.0, all 16 bands shared, a persisted edge and same_cluster; an
    unrelated pair reports no edge and different clusters; unknown
    ids come back as a typed error."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_deduplication_ray import fixtures as FX
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.functions.hashing import doc_ids_for_urls
    from event_deduplication_ray.pipelines.dedup_pipeline import (
        dedup_path_resumable,
    )
    from event_deduplication_ray.pipelines.review import explain_pair

    dup = ("an identical pair of documents used to pin the explain "
           "readout across every tier of the engine")
    urls = ["http://e.example/1", "http://e.example/2",
            "http://e.example/3"]
    rows = pd.DataFrame({
        "url": urls,
        "warc_ts": ["2024-01-01T00:00:00Z"] * 3,
        "html": [FX.wrap_html(dup, "a", "e.example"),
                 FX.wrap_html(dup, "b", "e.example"),
                 FX.wrap_html("completely unrelated text about orbital "
                              "mechanics and transfer windows", "c",
                              "e.example")],
        "text": [dup, dup, "x"],
        "lang": ["en"] * 3,
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                   f"{d}/docs.parquet")
    run_dir = str(tmp_path / "run")
    cfg = DedupConfig(use_substring=True, join_num_partitions=4)
    dedup_path_resumable(f"{d}/docs.parquet", run_dir, cfg)

    i1, i2, i3 = (int(x) for x in doc_ids_for_urls(pd.Series(urls)))
    got = explain_pair(run_dir, i1, i2, cfg)
    assert got["exact_jaccard"] == 1.0
    assert got["sig_jaccard_est"] == 1.0
    assert got["shared_bands"] == 16
    assert got["minhash_decision"] == "match"
    assert got["simhash_hamming"] == 0
    assert got["containment"] == 1.0
    assert got["edge"] is not None and got["edge"]["score"] == 1.0
    assert got["same_cluster"] is True

    far = explain_pair(run_dir, i1, i3, cfg)
    assert far["exact_jaccard"] < 0.1
    assert far["shared_bands"] == 0
    assert far["minhash_decision"] == "no_candidate"
    assert far["edge"] is None and far["same_cluster"] is False

    bad = explain_pair(run_dir, i1, 12345, cfg)
    assert bad["error"] == "unknown doc_id" and bad["missing"] == [12345]
