"""Incremental-add equivalence: run on corpus A (checkpointed), add
batch B, result must match a full run on A ∪ B (reference enrichment
semantics C6: new sources only ever improve the canonical set)."""

import os

import pyarrow.parquet as pq
import pytest

from event_deduplication_ray import fixtures as F
from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import (
    dedup_path,
    dedup_path_resumable,
)
from event_deduplication_ray.pipelines.incremental import incremental_add

# use_simhash=True: regression for incremental_add silently skipping
# the simhash tier (round-2 ADVICE) — equivalence must hold with every
# candidate tier enabled
CFG = DedupConfig(use_substring=True, use_simhash=True, join_num_partitions=4)


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory, corpus_dir):
    """Split the 1k corpus into old (first 80%) and new (last 20%) doc
    batches, by url order (urls group whole clusters approximately —
    the point is new docs extend existing clusters AND add new ones)."""
    root = tmp_path_factory.mktemp("incr")
    docs = pq.read_table(f"{corpus_dir}/docs")
    df = docs.to_pandas().sort_values("url").reset_index(drop=True)
    cut = int(len(df) * 0.8)
    import pyarrow as pa

    old_dir, new_dir = str(root / "old"), str(root / "new")
    os.makedirs(old_dir), os.makedirs(new_dir)
    pq.write_table(pa.Table.from_pandas(df.iloc[:cut], preserve_index=False),
                   f"{old_dir}/docs.parquet")
    pq.write_table(pa.Table.from_pandas(df.iloc[cut:], preserve_index=False),
                   f"{new_dir}/docs.parquet")
    return old_dir, new_dir, f"{corpus_dir}/docs"


def test_incremental_matches_full(split_corpus, tmp_path):
    old_dir, new_dir, full_path = split_corpus
    run_dir = str(tmp_path / "run_old")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, CFG)

    inc = incremental_add(run_dir, f"{new_dir}/docs.parquet", CFG)
    inc_asn = inc.assignments.to_pandas()

    full = dedup_path(full_path, CFG)
    full_asn = full.assignments.to_pandas()

    assert len(inc_asn) == len(full_asn)
    m = inc_asn.merge(full_asn, on="doc_id", suffixes=("_inc", "_full"))
    # compare PARTITIONS (same groups), label-invariantly
    grp_inc = m.groupby("cluster_id_inc")["doc_id"].apply(frozenset)
    grp_full = m.groupby("cluster_id_full")["doc_id"].apply(frozenset)
    assert set(grp_inc) == set(grp_full)


def test_incremental_metrics(split_corpus, tmp_path):
    old_dir, new_dir, _ = split_corpus
    run_dir = str(tmp_path / "run_old2")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, CFG)
    inc = incremental_add(run_dir, f"{new_dir}/docs.parquet", CFG)
    n_new = pq.ParquetFile(f"{new_dir}/docs.parquet").metadata.num_rows
    assert inc.metrics["n_new_docs"] == n_new


def test_incremental_band_rows_scale_with_batch(split_corpus, tmp_path):
    """The pair-gen shuffle must be O(new-batch keys), not O(corpus):
    only band rows from buckets the new docs touch may enter it
    (round-2 VERDICT: the old path exploded the ENTIRE combined corpus
    per increment)."""
    old_dir, new_dir, _ = split_corpus
    run_dir = str(tmp_path / "run_scale")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, CFG)
    inc = incremental_add(run_dir, f"{new_dir}/docs.parquet", CFG)

    n_new = pq.ParquetFile(f"{new_dir}/docs.parquet").metadata.num_rows
    n_old = pq.ParquetFile(f"{old_dir}/docs.parquet").metadata.num_rows
    full_rows = (n_new + n_old) * CFG.lsh_bands
    band_rows = inc.metrics["minhash_band_rows"]
    # every new doc contributes <= lsh_bands rows; affected old rows
    # are bounded by the new docs' duplicate partners — far below the
    # full-corpus explode
    assert band_rows <= n_new * CFG.lsh_bands * 3
    assert band_rows < 0.5 * full_rows
    assert inc.metrics["minhash_new_keys"] <= n_new * CFG.lsh_bands


def test_incremental_exact_tier_matches_full(split_corpus, tmp_path):
    """With the exact tier enabled, incremental_add must re-score
    ambiguous new-doc pairs exactly like a full run (regression for
    the tier being silently skipped on incremental updates)."""
    cfg = CFG.with_overrides(use_exact_tier=True, ambiguous_is_match=False)
    old_dir, new_dir, full_path = split_corpus
    run_dir = str(tmp_path / "run_exact")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, cfg)

    inc = incremental_add(run_dir, f"{new_dir}/docs.parquet", cfg)
    inc_asn = inc.assignments.to_pandas()
    full_asn = dedup_path(full_path, cfg).assignments.to_pandas()

    assert len(inc_asn) == len(full_asn)
    m = inc_asn.merge(full_asn, on="doc_id", suffixes=("_inc", "_full"))
    grp_inc = m.groupby("cluster_id_inc")["doc_id"].apply(frozenset)
    grp_full = m.groupby("cluster_id_full")["doc_id"].apply(frozenset)
    assert set(grp_inc) == set(grp_full)


def test_incremental_with_lang_overrides_matches_full(split_corpus, tmp_path):
    """Per-lang threshold overrides (P5) must survive the incremental
    path: the old run's signature checkpoint has no lang column, so
    incremental_add must re-attach lang before verification instead of
    crashing or silently dropping the overrides."""
    cfg = CFG.with_overrides(lang_match_overrides={"en": 0.72},
                             lang_priority=("en",))
    old_dir, new_dir, full_path = split_corpus
    run_dir = str(tmp_path / "run_lang")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, cfg)

    inc = incremental_add(run_dir, f"{new_dir}/docs.parquet", cfg)
    inc_asn = inc.assignments.to_pandas()
    full_asn = dedup_path(full_path, cfg).assignments.to_pandas()

    assert len(inc_asn) == len(full_asn)
    m = inc_asn.merge(full_asn, on="doc_id", suffixes=("_inc", "_full"))
    grp_inc = m.groupby("cluster_id_inc")["doc_id"].apply(frozenset)
    grp_full = m.groupby("cluster_id_full")["doc_id"].apply(frozenset)
    assert set(grp_inc) == set(grp_full)


def test_chained_incremental_matches_full(corpus_dir, tmp_path):
    """The watcher LOOP: A → +B (persist) → +C must equal a full run
    on A∪B∪C — persist_incremental folds each batch back into the run
    dir so candidate generation for batch C chains on the A∪B state,
    never re-reading raw batch B.  Partitions compared
    label-invariantly (the single-step test's contract, chained)."""
    import pandas as pd
    import pyarrow as pa

    docs = pq.read_table(f"{corpus_dir}/docs")
    df = docs.to_pandas().sort_values("url").reset_index(drop=True)
    c1, c2 = int(len(df) * 0.6), int(len(df) * 0.8)
    parts = [df.iloc[:c1], df.iloc[c1:c2], df.iloc[c2:]]
    paths = []
    for i, p in enumerate(parts):
        d = str(tmp_path / f"batch{i}")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(p, preserve_index=False),
                       f"{d}/docs.parquet")
        paths.append(f"{d}/docs.parquet")

    from event_deduplication_ray.pipelines.incremental import (
        persist_incremental,
    )

    run_dir = str(tmp_path / "chained")
    dedup_path_resumable(paths[0], run_dir, CFG)
    for batch in paths[1:]:
        res = incremental_add(run_dir, batch, CFG)
        persist_incremental(run_dir, res, CFG, batch)

    inc_asn = pd.read_parquet(f"{run_dir}/assignments")
    full_asn = dedup_path(f"{corpus_dir}/docs", CFG).assignments.to_pandas()
    assert len(inc_asn) == len(full_asn)
    m = inc_asn.merge(full_asn, on="doc_id", suffixes=("_inc", "_full"))
    grp_inc = m.groupby("cluster_id_inc")["doc_id"].apply(frozenset)
    grp_full = m.groupby("cluster_id_full")["doc_id"].apply(frozenset)
    assert set(grp_inc) == set(grp_full)


def _mini_docs(urls_texts):
    import pandas as pd

    from event_deduplication_ray import fixtures as FX

    rows = [{"url": u, "warc_ts": "2024-01-01T00:00:00Z",
             "html": FX.wrap_html(t, f"t{i}", "site.example"),
             "text": t, "lang": "en"}
            for i, (u, t) in enumerate(urls_texts)]
    return pd.DataFrame(rows)


def _dir_state(root):
    out = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out.append((p, st.st_size, st.st_mtime_ns))
    return out


def test_screen_docs_verdicts_and_read_only(tmp_path):
    """screen_docs: a batch doc duplicating the corpus is flagged with
    the corpus partner; within-batch dups resolve keep-first (only the
    larger doc_id flags, against the smaller); novel docs pass — and
    the run dir is bit-untouched (read-only contract)."""
    import pandas as pd
    import pyarrow as pa

    from event_deduplication_ray.functions.hashing import doc_ids_for_urls
    from event_deduplication_ray.pipelines.incremental import screen_docs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = _mini_docs([
        ("http://a.example/1", base),
        ("http://a.example/2", "completely different article about pottery "
                               "glazes and kiln temperature control methods"),
        ("http://a.example/3", "a third unrelated piece discussing alpine "
                               "weather patterns and seasonal snowfall data"),
    ])
    batch = _mini_docs([
        ("http://b.example/dup", base),                      # corpus dup
        ("http://b.example/new", "entirely novel content on deep sea vents "
                                 "and chemosynthetic bacterial ecosystems"),
        ("http://b.example/twin1", "twin text shared by exactly two batch "
                                   "documents for the keep first check"),
        ("http://b.example/twin2", "twin text shared by exactly two batch "
                                   "documents for the keep first check"),
    ])
    old_dir, new_dir = str(tmp_path / "old"), str(tmp_path / "new")
    os.makedirs(old_dir), os.makedirs(new_dir)
    pq.write_table(pa.Table.from_pandas(corpus, preserve_index=False),
                   f"{old_dir}/docs.parquet")
    pq.write_table(pa.Table.from_pandas(batch, preserve_index=False),
                   f"{new_dir}/docs.parquet")
    run_dir = str(tmp_path / "run_screen")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, CFG)

    before = _dir_state(run_dir)
    got = screen_docs(run_dir, f"{new_dir}/docs.parquet", CFG)
    assert _dir_state(run_dir) == before   # READ-ONLY

    ids = {u: i for u, i in zip(
        [r[0] for r in [
            ("http://b.example/dup",), ("http://b.example/new",),
            ("http://b.example/twin1",), ("http://b.example/twin2",)]],
        doc_ids_for_urls(pd.Series([
            "http://b.example/dup", "http://b.example/new",
            "http://b.example/twin1", "http://b.example/twin2"])))}
    corpus_id = int(doc_ids_for_urls(pd.Series(["http://a.example/1"]))[0])
    g = got.set_index("doc_id")
    assert len(got) == 4 and got["doc_id"].is_unique

    assert bool(g.loc[ids["http://b.example/dup"], "is_dup"])
    assert int(g.loc[ids["http://b.example/dup"], "dup_of"]) == corpus_id

    assert not bool(g.loc[ids["http://b.example/new"], "is_dup"])
    assert int(g.loc[ids["http://b.example/new"], "dup_of"]) == -1

    t1, t2 = sorted([ids["http://b.example/twin1"],
                     ids["http://b.example/twin2"]])
    assert not bool(g.loc[t1, "is_dup"])   # keep-first: smaller id novel
    assert bool(g.loc[t2, "is_dup"])
    assert int(g.loc[t2, "dup_of"]) == t1


def test_add_rejects_existing_doc_ids(split_corpus, tmp_path):
    """Re-adding docs already in the corpus (same url → same id) must
    fail loudly and point at incremental_update — a silent union would
    duplicate every downstream row for those ids."""
    old_dir, _new_dir, _ = split_corpus
    run_dir = str(tmp_path / "run_overlap")
    dedup_path_resumable(f"{old_dir}/docs.parquet", run_dir, CFG)
    with pytest.raises(ValueError, match="incremental_update"):
        incremental_add(run_dir, f"{old_dir}/docs.parquet", CFG)


def test_assignment_summary_distributed(ray_session):
    """assignment_summary must equal the pandas ground truth — and
    stay correct when one cluster's rows span multiple blocks (the
    per-batch distinct partial must not double-count)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from event_deduplication_ray.pipelines.incremental import (
        assignment_summary,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(5000, dtype=np.int64),
        "cluster_id": rng.integers(0, 700, 5000).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(13)
    s = assignment_summary(ds, num_partitions=8)
    assert s["n_docs"] == 5000
    assert s["n_clusters"] == df["cluster_id"].nunique()
