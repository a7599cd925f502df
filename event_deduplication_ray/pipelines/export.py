"""Export sinks + serving-style query surface over pipeline outputs.

Reference analogs: export transformer/chunked writer/filtered query
S7-S9 (/root/reference/src/event_dedup/export/service.py:16-163) and
the list/filter/sort/paginate API Q1
(api/routes/canonical_events.py:30-95).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def export_canonical_parquet(
    canonical: Dataset,
    out_dir: str,
    first_ts_after: str | None = None,
    last_ts_before: str | None = None,
    rows_per_file: int = 10_000,
    partition_by: "list[str] | None" = None,
) -> str:
    """Filtered, sharded Parquet export (resumable layout: a directory
    of bounded part files, never one giant file).

    ``partition_by`` writes hive-partitioned output (one directory per
    key value, e.g. ``rep_lang=en/``) — the 100 TB resume story: a
    failed run re-lists finished partition dirs and skips them, and
    downstream readers prune at the directory level.

    Reference: timestamp-filtered export S9 + 200-events-per-file
    chunking S8 (export/service.py:77-163).
    """
    import pyarrow.compute as pc

    ds = canonical

    def filt(t: pa.Table) -> pa.Table:
        if first_ts_after:
            t = t.filter(
                pc.greater_equal(t["first_ts"], pa.scalar(pd.Timestamp(first_ts_after)))
            )
        if last_ts_before:
            t = t.filter(
                pc.less(t["last_ts"], pa.scalar(pd.Timestamp(last_ts_before)))
            )
        return t

    if first_ts_after or last_ts_before:
        ds = ds.map_batches(filt, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    kw = {"partition_cols": partition_by} if partition_by else {}
    try:
        ds.write_parquet(out_dir, min_rows_per_file=rows_per_file, **kw)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=rows_per_file, **kw)
    return out_dir


def export_canonical_bundle(
    canonical: Dataset,
    out_path: str,
    chunk_limit: int = 200,
) -> str:
    """Small-result JSON / large-result ZIP-of-chunks sink — the
    batch-engine form of the reference's export API (S10,
    api/routes/export.py:21-91: <= 200 events → one JSON response,
    more → a ZIP of chunk files).

    Streams via ``iter_batches`` — no driver materialization beyond
    one chunk — writing JSONL chunk members into the ZIP as they
    arrive; the single-JSON path only triggers when the dataset is
    small enough to hold one chunk.  Returns the path actually
    written (``.json`` or ``.zip`` appended to ``out_path``)."""
    import json
    import zipfile

    first: "pd.DataFrame | None" = None
    it = canonical.iter_batches(batch_size=chunk_limit,
                                batch_format="pandas")
    zf = None
    n_chunks = 0
    zip_path = out_path + ".zip"
    try:
        for b in it:
            b = b.copy()
            for c in b.columns:
                if pd.api.types.is_datetime64_any_dtype(b[c]):
                    b[c] = b[c].astype(str)
            if first is None and len(b) <= chunk_limit and zf is None:
                first = b
                continue
            if zf is None:
                zf = zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED)
                if first is not None:
                    zf.writestr(f"chunk_{n_chunks:05d}.jsonl",
                                first.to_json(orient="records",
                                              lines=True))
                    n_chunks += 1
                    first = None
            zf.writestr(f"chunk_{n_chunks:05d}.jsonl",
                        b.to_json(orient="records", lines=True))
            n_chunks += 1
    finally:
        if zf is not None:
            zf.close()
    if zf is not None:
        return zip_path
    json_path = out_path + ".json"
    rows = [] if first is None else json.loads(
        first.to_json(orient="records"))
    with open(json_path, "w") as f:
        json.dump(rows, f)
    return json_path


def list_canonical(
    canonical: Dataset,
    url_contains: str | None = None,
    lang: str | None = None,
    needs_review: bool | None = None,
    sort_by: str = "n_members",
    descending: bool = True,
    offset: int = 0,
    limit: int = 50,
) -> pd.DataFrame:
    """Filter + sort + paginate (reference Q1,
    canonical_events.py:30-95).  Deterministic cluster_id tie-break."""
    ds = canonical

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        if url_contains:
            df = df[df["rep_url"].str.contains(url_contains, case=False, regex=False)]
        if lang:
            df = df[df["rep_lang"] == lang]
        if needs_review is not None:
            df = df[df["needs_review"] == needs_review]
        return df

    ds = ds.map_batches(filt, batch_format="pandas")
    ds = ds.sort([sort_by, "cluster_id"], descending=[descending, False])
    page = ds.limit(offset + limit).to_pandas().iloc[offset:]
    return page.reset_index(drop=True)


def cluster_detail(
    canonical: Dataset, assignments: Dataset, docs_meta: Dataset,
    verified_pairs: Dataset, cluster_id: int,
) -> dict:
    """Detail + provenance join for one cluster (reference Q4,
    canonical_events.py:128-176): canonical row + member docs + their
    pair decisions.  Single-cluster predicate pushes down to a
    vectorized filter on each table."""
    import pyarrow.compute as pc

    def only(ds: Dataset, col: str) -> pd.DataFrame:
        return ds.map_batches(
            lambda t: t.filter(pc.equal(t[col], pa.scalar(cluster_id, pa.int64()))),
            batch_format="pyarrow",
        ).to_pandas()

    can = only(canonical, "cluster_id")
    members = only(assignments, "cluster_id")
    ids = set(members["doc_id"].tolist())

    def member_rows(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["doc_id"], value_set=pa.array(sorted(ids), pa.int64()))
        return t.filter(mask)

    docs = docs_meta.select_columns(
        ["doc_id", "url", "warc_ts", "lang"]
    ).map_batches(member_rows, batch_format="pyarrow").to_pandas()

    def pair_rows(t: pa.Table) -> pa.Table:
        arr = pa.array(sorted(ids), pa.int64())
        mask = pc.and_(pc.is_in(t["id_a"], value_set=arr),
                       pc.is_in(t["id_b"], value_set=arr))
        return t.filter(mask)

    pairs = verified_pairs.map_batches(pair_rows, batch_format="pyarrow").to_pandas()
    return {"canonical": can, "members": docs, "decisions": pairs}


def export_deduped_corpus(
    run_dir: str,
    out_dir: str,
    partition_by: "list[str] | None" = None,
    rows_per_file: int = 10_000,
    broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
    fmt: str = "parquet",
) -> dict:
    """THE training-data product: the corpus with every
    non-representative duplicate dropped — full text preserved, one
    surviving doc per cluster (the run's synthesis strategy decides
    the representative via canonical.rep_doc_id; singletons keep
    themselves).

    Scale shape: loser ids (docs whose cluster representative is
    someone else) come from ONE narrow cluster_id cogroup of
    assignments × canonical — 16 B/row, never text.  The corpus
    filter then runs as a broadcast anti-join (linear scan, zero text
    shuffle) when the loser set fits ``broadcast_limit``; above it,
    a doc_id cogroup routes text once — unavoidable at that dup
    volume, and the export writes the text anyway.  Output is
    hive-partitionable + chunked for resume, like
    export_canonical_parquet.

    Returns {"n_kept": ..., "n_dropped": ...}.
    """
    import numpy as np
    import ray.data as rd

    from event_deduplication_ray.stages.shuffle import cogroup_apply

    asn = rd.read_parquet(f"{run_dir}/assignments")
    canon = rd.read_parquet(f"{run_dir}/canonical") \
        .select_columns(["cluster_id", "rep_doc_id"])
    P = num_partitions or 16

    def losers_fn(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        m = l.merge(r, on="cluster_id")
        return m.loc[m["doc_id"] != m["rep_doc_id"], ["doc_id"]]

    losers = cogroup_apply(asn, canon, ["cluster_id"], ["cluster_id"],
                           P, losers_fn)
    losers_df = losers.to_pandas()
    if "doc_id" not in losers_df.columns:      # duplicate-free corpus:
        losers_df = pd.DataFrame(              # zero loser rows drop the
            {"doc_id": pd.Series(dtype="int64")})  # schema in to_pandas
    n_losers = int(len(losers_df))

    extracted = rd.read_parquet(f"{run_dir}/extracted")
    if n_losers <= broadcast_limit:
        from event_deduplication_ray.pipelines.incremental import (
            semi_join_broadcast,
        )

        kept = semi_join_broadcast(
            extracted, "doc_id",
            losers_df["doc_id"].to_numpy(np.int64), negate=True)
    else:
        # loser set too big to broadcast: route the corpus once by
        # doc_id hash and anti-join per partition
        def anti(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
            if not len(l):
                return l
            if not len(r):
                return l
            return l[~l["doc_id"].isin(set(r["doc_id"]))]

        kept = cogroup_apply(extracted, losers, ["doc_id"], ["doc_id"],
                             P, anti)

    os.makedirs(out_dir, exist_ok=True)
    if fmt == "jsonl.gz":
        # interchange format (the read_docs round-trip counterpart);
        # hive partitioning is a Parquet-layout feature
        if partition_by:
            raise ValueError("partition_by requires fmt='parquet'")
        m = export_jsonl_gz(kept, out_dir, rows_per_file=rows_per_file)
        return {"n_kept": int(m["n_rows"]), "n_dropped": n_losers}
    kw = {"partition_cols": partition_by} if partition_by else {}
    try:
        kept.write_parquet(out_dir, min_rows_per_file=rows_per_file, **kw)
    except TypeError:  # older Ray releases
        kept.write_parquet(out_dir, num_rows_per_file=rows_per_file, **kw)
    n_kept = rd.read_parquet(out_dir).count()
    return {"n_kept": int(n_kept), "n_dropped": n_losers}


def export_sorted_corpus(
    docs_path: str,
    out_dir: str,
    num_files: int = 16,
) -> dict:
    """Globally ordered corpus export — curriculum ordering (feed a
    training loop short → long documents): lexicographic FILE order ==
    global (n_tokens, doc_id) order, and each file is internally
    sorted, so a loader that streams ``part-*.parquet`` in name order
    replays the curriculum with no reader-side sort.

    Not a full shuffle-sort: pass 1 builds the exact token-count
    histogram (tiny — one row per distinct count per batch, the
    q34/q68 pattern); the driver cuts file boundaries at equal-row
    quantiles.  Pass 2 maps each row to its file id (searchsorted
    against the broadcast boundaries — row-local), moves the corpus
    ONCE through a hash shuffle on file id, sorts within each file
    and writes ``part-<id:05d>.parquet`` atomically (tmp → rename).
    Equal keys never straddle a boundary (boundaries are key VALUES),
    so ties stay within one file; a heavy key value merely makes its
    file larger than the target.  Returns ``{"n_docs", "n_files"}``.
    """
    import uuid

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from event_deduplication_ray.functions import textstats as TS
    from event_deduplication_ray.stages.shuffle import partition_apply

    ds = rd.read_parquet(docs_path)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = pd.Series(TS.token_counts(df["text"])).value_counts()
        return pd.DataFrame({"n_tokens": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    hist = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    if not len(hist):
        os.makedirs(out_dir, exist_ok=True)
        return {"n_docs": 0, "n_files": 0}
    hist = hist.groupby("n_tokens", as_index=False)["n"].sum() \
        .sort_values("n_tokens")
    vals = hist["n_tokens"].to_numpy(np.int64)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    total = int(cum[-1])
    target = -(-total // max(num_files, 1))
    cuts = np.searchsorted(cum, np.arange(1, num_files) * target,
                           side="left")
    bounds = np.unique(vals[np.clip(cuts, 0, len(vals) - 1)])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        nt = np.asarray(TS.token_counts(df["text"]), dtype=np.int64)
        df["n_tokens"] = nt
        df["file_id"] = np.searchsorted(bounds, nt, side="left") \
            .astype(np.int64)
        return df

    os.makedirs(out_dir, exist_ok=True)

    def write_files(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for fid, sub in df.groupby("file_id"):
            sub = sub.sort_values(["n_tokens", "doc_id"]) \
                .drop(columns=["file_id"])
            final = os.path.join(out_dir, f"part-{int(fid):05d}.parquet")
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(pa.Table.from_pandas(sub, preserve_index=False),
                           tmp)
            os.replace(tmp, final)
            out.append({"file_id": np.int64(fid),
                        "n_rows": np.int64(len(sub))})
        return pd.DataFrame(out, columns=["file_id", "n_rows"])

    manifest = partition_apply(
        ds.map_batches(assign, batch_format="pandas"),
        ["file_id"], max(min(num_files, 64), 1), write_files,
    ).to_pandas()
    n_written = int(manifest["n_rows"].sum()) if len(manifest) else 0
    if n_written != total:            # torn export must not look done
        raise RuntimeError(
            f"sorted export wrote {n_written} of {total} rows")
    return {"n_docs": total, "n_files": int(len(manifest))}


def export_bucketed(
    ds: Dataset,
    out_dir: str,
    key_col: str,
    n_buckets: int = 32,
) -> dict:
    """Hash-bucketed storage layout (the Hive/Spark bucketing
    contract): rows land in ``bucket=<splitmix64(key) % n>/`` hive
    dirs.  Two tables bucketed on the same key with the same
    ``n_buckets`` CO-LOCATE their join: bucket i of A can only match
    bucket i of B, so a later join reads aligned directories pairwise
    with NO exchange — pay the shuffle once at write time, reuse it
    for every downstream join (`bucketed_cogroup`)."""
    import numpy as np

    from event_deduplication_ray.functions.sketch import _splitmix64

    def tag(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            .view(np.uint64)
        b = (_splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    return {"out_dir": out_dir, "n_buckets": n_buckets, "key": key_col}


def bucketed_cogroup(
    dir_a: str,
    dir_b: str,
    fn,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Join/cogroup two same-key bucketed layouts WITHOUT a shuffle:
    for each bucket id, one task reads ``dir_a/bucket=i`` and
    ``dir_b/bucket=i`` and applies ``fn(a_df, b_df)`` — the bucketing
    invariant (equal keys share a bucket) makes per-bucket results
    exact partials of the global join.  Task-parallel via a Dataset
    over bucket ids (reads happen inside the tasks, never on the
    driver)."""
    import ray.data as rd

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq_

        outs = []
        for i in df["bucket"]:
            pa_ = os.path.join(dir_a, f"bucket={int(i)}")
            pb_ = os.path.join(dir_b, f"bucket={int(i)}")

            def read(d):
                if not os.path.isdir(d):
                    return pd.DataFrame()
                fs = [os.path.join(d, f) for f in sorted(os.listdir(d))
                      if f.endswith(".parquet")]
                return pd.concat([pq_.read_table(f).to_pandas()
                                  for f in fs], ignore_index=True) \
                    if fs else pd.DataFrame()

            r = fn(read(pa_), read(pb_))
            if r is not None and len(r):
                outs.append(r)
        if not outs:
            return pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    ids = rd.from_items([{"bucket": i} for i in range(n_buckets)],
                        override_num_blocks=n_buckets)
    return ids.map_batches(run_bucket, batch_format="pandas").to_pandas()


def export_jsonl_gz(
    ds: Dataset,
    out_dir: str,
    rows_per_file: int = 10_000,
) -> dict:
    """Gzipped JSON-lines export — the write half of `read_docs`'s
    ``.jsonl.gz`` ingestion (crawl interchange format): each task
    writes its batch as one ``part-<uuid>.jsonl.gz`` (bounded,
    resumable layout — never one giant file; names are run-unique so
    re-runs append rather than clobber, the token_index_add
    convention).  Timestamps serialize as ISO-8601 strings, so a
    round-trip back through ``read_docs`` reparses them.  Returns
    ``{"n_rows", "n_files"}``."""
    import gzip
    import json as _json
    import uuid

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lo in range(0, len(df), rows_per_file):
            sub = df.iloc[lo:lo + rows_per_file]
            path = os.path.join(out_dir,
                                f"part-{uuid.uuid4().hex}.jsonl.gz")
            tmp = path + ".tmp"
            with gzip.open(tmp, "wt", encoding="utf-8") as f:
                for line in sub.to_json(orient="records", lines=True,
                                        date_format="iso",
                                        date_unit="us").splitlines():
                    f.write(line + "\n")
            os.replace(tmp, path)
            out.append({"n_rows": np.int64(len(sub)), "n_files": 1})
        if not out:
            return pd.DataFrame({"n_rows": pd.Series(dtype="int64"),
                                 "n_files": pd.Series(dtype="int64")})
        return pd.DataFrame(out)

    m = ds.map_batches(write_batch, batch_format="pandas").to_pandas()
    n_rows = int(m["n_rows"].sum()) if "n_rows" in m.columns else 0
    n_files = int(m["n_files"].sum()) if "n_files" in m.columns else 0
    return {"n_rows": n_rows, "n_files": n_files}
