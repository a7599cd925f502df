"""Deterministic synthetic Common-Crawl-style corpus with planted
duplicate clusters and golden ground truth.

Plays the role of the reference's ground-truth builder
(/root/reference/scripts/generate_ground_truth.py:29-120, seed=42) and
its hand-built end-to-end fixtures
(/root/reference/tests/test_end_to_end.py:20-71): a corpus where the
true cluster assignment is known by construction, feeding the
dup-pair-recall ≥0.99 gate (FIXTURES.md §1).

Planted member kinds per cluster:
- ``exact``      identical text, different url (always clusters);
- ``near``       ~1% token substitutions (above the MinHash threshold);
- ``substring``  base text embedded in a longer page (caught by the
                 winnowing/substring pass, not necessarily by MinHash);
- hard negatives share boilerplate with a cluster but have different
  bodies — labeled ``different`` (the reference's hard-negative
  sampling analog, ground_truth/candidate_generator.py:115-121).

Everything derives from ``numpy.random.default_rng(seed)`` only; the
same (n_docs, seed, base_texts) triple produces byte-identical tables
in any process.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pandas as pd
import pyarrow as pa

_LANGS = np.array(["en", "en", "en", "de", "de", "fr", "es"])


def _vocab(rng: np.random.Generator, size: int = 4000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 10, size=size)
    return np.array(
        ["".join(letters[rng.integers(0, 26, size=l)]) for l in lens], dtype=object
    )


def wrap_html(text: str, title: str, site: str) -> bytes:
    """Deterministic HTML template; extract_text_from_html inverts it
    byte-identically (the BASELINE.md per-row invariant)."""
    body = _html.escape(text)
    t = _html.escape(title)
    return (
        f"<html><head><title>{t}</title></head><body>"
        f"<nav>home | about | {site}</nav>"
        f"<article>{body}</article>"
        f"<footer>&copy; {site}</footer></body></html>"
    ).encode("utf-8")


def _cluster_sizes(rng: np.random.Generator, n_docs: int) -> list[int]:
    """Zipf-ish mix: mostly singletons/pairs, a few hot boilerplate
    clusters of 50..max to exercise band-key salting."""
    max_big = max(20, min(500, n_docs // 10))
    sizes: list[int] = []
    total = 0
    # plant two hot clusters first (skew / salting exercise)
    for frac in (0.08, 0.04):
        s = max(10, int(n_docs * frac))
        s = min(s, max_big)
        sizes.append(s)
        total += s
    while total < n_docs:
        u = rng.random()
        if u < 0.55:
            s = 1
        elif u < 0.75:
            s = 2
        elif u < 0.88:
            s = int(rng.integers(3, 6))
        elif u < 0.97:
            s = int(rng.integers(6, 21))
        else:
            s = int(rng.integers(21, max_big + 1))
        s = min(s, n_docs - total)
        sizes.append(s)
        total += s
    return sizes


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    base_texts: list[str] | None = None,
    hard_negative_ratio: float = 0.05,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (docs, golden_clusters, golden_pairs).

    docs:            url, warc_ts, html(binary), text, lang
    golden_clusters: url, cluster_id (int64, cluster index)
    golden_pairs:    url_a, url_b (url_a < url_b), label in {same,different}
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    boiler_vocab = _vocab(rng, 400)

    def sample_tokens(n: int) -> np.ndarray:
        return vocab[rng.integers(0, len(vocab), size=n)]

    base_pool: list[list[str]] = []
    if base_texts:
        for t in base_texts:
            toks = (t or "").split()
            if len(toks) >= 30:
                base_pool.append(toks[:500])

    sizes = _cluster_sizes(rng, n_docs)
    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    titles: list[str] = []
    sites: list[str] = []
    cluster_ids: list[int] = []
    kinds: list[str] = []

    pair_a: list[str] = []
    pair_b: list[str] = []
    pair_label: list[str] = []

    def add_doc(cid: int, member: int, toks: list[str], kind: str, lang: str) -> str:
        site = f"site-{cid % 97:02d}.example"
        url = f"https://{site}/c{cid:05d}/p{member:04d}"
        urls.append(url)
        texts.append(" ".join(toks))
        langs.append(lang)
        titles.append(f"page c{cid} m{member}")
        sites.append(site)
        cluster_ids.append(cid)
        kinds.append(kind)
        return url

    next_cid = 0
    for size in sizes:
        cid = next_cid
        next_cid += 1
        lang = str(_LANGS[rng.integers(0, len(_LANGS))])
        if base_pool and rng.random() < 0.5:
            base = list(base_pool[int(rng.integers(0, len(base_pool)))])
        else:
            base = list(sample_tokens(int(rng.integers(50, 500))))
        # hot clusters get a shared boilerplate prefix (skew driver)
        boiler = list(boiler_vocab[rng.integers(0, len(boiler_vocab), size=20)])
        if size >= 20:
            base = boiler + base

        member_urls = [add_doc(cid, 0, base, "base", lang)]
        for m in range(1, size):
            u = rng.random()
            if u < 0.45:
                member_urls.append(add_doc(cid, m, base, "exact", lang))
            elif u < 0.85:
                toks = list(base)
                n_sub = max(1, len(toks) // 100)
                idx = rng.choice(len(toks), size=n_sub, replace=False)
                for i in idx:
                    toks[i] = str(vocab[rng.integers(0, len(vocab))])
                member_urls.append(add_doc(cid, m, toks, "near", lang))
            else:
                pad_frac = float(rng.uniform(0.3, 1.0))
                n_pad = max(5, int(len(base) * pad_frac))
                pre = list(sample_tokens(n_pad // 2))
                post = list(sample_tokens(n_pad - n_pad // 2))
                member_urls.append(add_doc(cid, m, pre + base + post, "substring", lang))

        # hard negative sharing this cluster's boilerplate, own cluster id
        if size >= 2 and rng.random() < hard_negative_ratio * 10:
            hn_cid = next_cid
            next_cid += 1
            body = list(sample_tokens(int(rng.integers(50, 300))))
            hn_url = add_doc(hn_cid, 0, boiler + body, "hard_negative", lang)
            a, b = sorted([member_urls[0], hn_url])
            pair_a.append(a)
            pair_b.append(b)
            pair_label.append("different")

        # golden same-pairs: all pairs for small clusters, star+sample for big
        mu = sorted(member_urls)
        if len(mu) <= 40:
            for i in range(len(mu)):
                for j in range(i + 1, len(mu)):
                    pair_a.append(mu[i]); pair_b.append(mu[j]); pair_label.append("same")
        else:
            for i in range(1, len(mu)):
                a, b = sorted([mu[0], mu[i]])
                pair_a.append(a); pair_b.append(b); pair_label.append("same")
            for _ in range(len(mu)):
                i, j = rng.choice(len(mu), size=2, replace=False)
                a, b = sorted([mu[i], mu[j]])
                pair_a.append(a); pair_b.append(b); pair_label.append("same")

    n = len(urls)
    ts0 = np.datetime64("2025-06-01T00:00:00", "us")
    warc_ts = ts0 + rng.integers(0, 90 * 24 * 3600, size=n).astype("timedelta64[s]").astype("timedelta64[us]")
    html_col = [wrap_html(texts[i], titles[i], sites[i]) for i in range(n)]

    docs = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(html_col, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    golden_clusters = pa.table(
        {"url": pa.array(urls, pa.string()),
         "cluster_id": pa.array(cluster_ids, pa.int64()),
         "kind": pa.array(kinds, pa.string())}
    )
    pairs_df = (
        pd.DataFrame({"url_a": pair_a, "url_b": pair_b, "label": pair_label})
        .drop_duplicates(subset=["url_a", "url_b"])
        .reset_index(drop=True)
    )
    golden_pairs = pa.Table.from_pandas(pairs_df, preserve_index=False)
    return docs, golden_clusters, golden_pairs


def load_base_texts(sf_dir: str, limit: int = 200) -> list[str]:
    """Deterministically pick base texts from the driver's documents
    table (TESTDATA.md) so fixture content derives from provided data."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = t.to_pandas().sort_values("doc_id").head(limit)
    return df["text"].tolist()


def corpus_path(
    tmp_root: str, n_docs: int, seed: int = 42,
    base_texts: list[str] | None = None,
) -> str:
    """Cache key covers EVERY generator input — n, seed, and the base
    texts (two callers with different sf tiers must not share a dir)."""
    import hashlib

    bt = ""
    if base_texts:
        h = hashlib.sha256()
        for t in base_texts:
            h.update((t or "").encode()); h.update(b"\x00")
        bt = f"_b{h.hexdigest()[:8]}"
    # v4: strided file sharding (layout-only change; same content —
    # sequential slicing clustered long docs into the same shards,
    # giving 3.7x byte skew across files and straggler map tasks)
    return f"{tmp_root}/dedup_corpus_v4_n{n_docs}_s{seed}{bt}"


_WRITE_DOCS = None   # fork-inherited docs table for parallel shard writes


def _write_strided_shard(args: tuple) -> None:
    """One shard file's strided rows (row j -> file j % n_files),
    block-sliced to keep every take under 32-bit string offsets —
    byte-of-content identical to the serial writer loop."""
    import numpy as np
    import pyarrow.parquet as pq

    out, i, n_files, n = args
    docs = _WRITE_DOCS
    writer = pq.ParquetWriter(f"{out}/docs/part-{i:04d}.parquet", docs.schema)
    block_rows = 1_000_000
    for start in range(0, n, block_rows):
        blk = docs.slice(start, block_rows)
        first = (i - start) % n_files
        idx = np.arange(first, blk.num_rows, n_files)
        if len(idx):
            writer.write_table(blk.take(pa.array(idx)), row_group_size=2000)
    writer.close()


def materialize_corpus(
    tmp_root: str, n_docs: int, seed: int = 42, base_texts: list[str] | None = None
) -> str:
    """Write (or reuse) the corpus under tmp_root; returns the dir.

    Layout: {dir}/docs/part-*.parquet, golden_clusters.parquet,
    golden_pairs.parquet + _DONE marker (idempotent, the reference's
    hash-skip ingestion pattern, file_processor.py:187-196).
    """
    import os
    import pyarrow.parquet as pq

    out = corpus_path(tmp_root, n_docs, seed, base_texts)
    done = f"{out}/_DONE"
    if os.path.exists(done):
        return out
    os.makedirs(f"{out}/docs", exist_ok=True)
    docs, gc, gp = generate_corpus(n_docs, seed=seed, base_texts=base_texts)
    # shard the docs table: a single parquet file is read by ONE Ray
    # task (serial); a directory of files parallelizes the read.
    # ~4k rows/file keeps >=4 tasks per core at 500k docs on a 32-way
    # node (64 coarse files measured 2 uneven waves + ramp at 32 cpus);
    # small row groups let Ray split files further if it wants to.
    n = docs.num_rows
    n_files = max(8, min(256, n // 4000))
    # STRIDED assignment (row i -> file i % n_files): doc lengths in
    # the generator cluster by position, so contiguous slices gave
    # 2.8-10.6 MB files whose read+extract+signature tasks varied
    # 3.4x — the straggler tail of every 32-wide wave.  Striding
    # mixes lengths uniformly into every shard (content unchanged).
    # Gathers run over <=1M-row slices: pa.Table.take concatenates
    # the table's chunks first, and a multi-GB string column
    # overflows 32-bit offsets (seen at 8M docs).
    import numpy as np

    def _ray_up() -> bool:
        # forking a Ray-connected process (grpc threads) is unsafe;
        # callers that want the parallel writer should generate the
        # corpus BEFORE ray.init (bench.py does)
        import sys as _sys

        r = _sys.modules.get("ray")
        return bool(r is not None and getattr(r, "is_initialized", lambda: False)())

    if n >= 1_000_000 and not _ray_up():
        # big corpora: parallelize the strided take+compress across a
        # fork pool — children read the in-memory docs table through
        # copy-on-write, each owning a disjoint file range.  Content
        # is IDENTICAL to the serial path (same strided indices, same
        # row-group size); only wall time changes (the 8 M corpus
        # write was the 80-minute wall of the abandoned 12 M attempt).
        import multiprocessing as mp
        import os as _os

        global _WRITE_DOCS
        _WRITE_DOCS = docs
        workers = min(16, _os.cpu_count() or 8, n_files)
        args = [(out, i, n_files, n) for i in range(n_files)]
        try:
            with mp.get_context("fork").Pool(workers) as pool:
                pool.map(_write_strided_shard, args, chunksize=1)
        finally:
            _WRITE_DOCS = None
    else:
        writers = [pq.ParquetWriter(f"{out}/docs/part-{i:04d}.parquet",
                                    docs.schema) for i in range(n_files)]
        block_rows = 1_000_000
        for start in range(0, n, block_rows):
            blk = docs.slice(start, block_rows)
            for i in range(n_files):
                first = (i - start) % n_files
                idx = np.arange(first, blk.num_rows, n_files)
                if len(idx):
                    writers[i].write_table(blk.take(pa.array(idx)),
                                           row_group_size=2000)
        for w in writers:
            w.close()
    pq.write_table(gc, f"{out}/golden_clusters.parquet")
    pq.write_table(gp, f"{out}/golden_pairs.parquet")
    with open(done, "w") as f:
        f.write("ok")
    return out
