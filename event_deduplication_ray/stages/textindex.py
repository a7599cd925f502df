"""Persisted token posting-list index (inverted index) for corpus
curation search — the swap-in q89 documents for when queries
outnumber corpus scans.

Follows the SRP/IVF index pattern (``stages/similarity.py``): ONE
linear build pass writes Parquet PARTITIONED by a token-hash shard
(hive layout ``tok_shard=<k>/``); a query reads ONLY the shard
directories its terms hash into, so rows read scale with the query
terms' posting sizes, not the corpus.  Reference analog: the filtered
export queries (SURVEY §2.8 Q1/Q9) — this is their full-text cousin.

Partitioning assumption: a (token, doc_id) posting is emitted at most
once globally (tokens are deduped per doc at build, and a doc never
spans input batches), so serve-side hit counts are exact sums.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ray.data import Dataset

from event_deduplication_ray.functions.hashing import (
    hash_strings_u64,
    tokenize_offsets,
)

N_SHARDS_DEFAULT = 64


def _token_shards(tokens: np.ndarray, n_shards: int) -> np.ndarray:
    return (hash_strings_u64(tokens) % np.uint64(n_shards)).astype(np.int64)


def _make_explode(n_shards: int):
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        doc_of = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        d = pd.DataFrame({"token": flat, "doc_id": doc_of}).drop_duplicates()
        if len(d) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "tok_shard": pd.Series(dtype="int64")})
        d["tok_shard"] = _token_shards(d["token"].to_numpy(dtype=object),
                                       n_shards)
        return d
    return explode


def token_index_build(docs: Dataset, index_dir: str,
                      n_shards: int = N_SHARDS_DEFAULT) -> None:
    """Materialize the posting list: distinct (token, doc_id) rows
    partitioned by ``tok_shard = hash(token) % n_shards``."""
    docs.map_batches(_make_explode(n_shards),
                     batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tok_shard"]
    )


def token_index_add(new_docs: Dataset, index_dir: str,
                    n_shards: int = N_SHARDS_DEFAULT) -> None:
    """Incrementally index NEW documents into an existing posting
    list WITHOUT rebuilding: the same explode pass appends fresh
    Parquet files into the existing ``tok_shard=`` directories (file
    names are run-unique, so appends never clobber), and serving is
    unchanged because hit counts sum across files within a shard.

    Contract (the `incremental_add` pattern, pipelines/incremental.py):
    callers pass only doc_ids NOT already in the index — postings must
    stay globally distinct for AND counts to be exact.  Re-adding a
    doc_id is the caller's bug; `token_index_doc_ids` exists to
    semi-join candidates against when in doubt.  Cost is O(new batch):
    nothing existing is read or rewritten."""
    new_docs.map_batches(_make_explode(n_shards),
                         batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tok_shard"]
    )


def token_index_doc_ids(index_dir: str,
                        n_shards: int = N_SHARDS_DEFAULT) -> np.ndarray:
    """Distinct doc_ids present in the index (one pruned-column scan;
    for validating/add-time semi-joins, not the serving path)."""
    import ray.data as rd

    paths = _shard_paths(index_dir, set(range(n_shards)))
    if not paths:
        return np.array([], dtype=np.int64)

    def ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": np.unique(
            df["doc_id"].to_numpy(np.int64))})

    parts = rd.read_parquet(paths, columns=["doc_id"]) \
        .map_batches(ids, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return np.array([], dtype=np.int64)
    return np.unique(parts["doc_id"].to_numpy(np.int64))


def _shard_paths(index_dir: str, shards: "set[int]") -> list[str]:
    out = []
    for s in sorted(shards):
        d = os.path.join(index_dir, f"tok_shard={s}")
        if os.path.isdir(d):
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".parquet"))
    return out


def token_index_search(index_dir: str, terms: "list[str]",
                       mode: str = "and",
                       n_shards: int = N_SHARDS_DEFAULT) -> pd.DataFrame:
    """Serve an AND/OR term query from the persisted index.

    Reads only the <= len(terms) matching shard directories; each
    batch filters to the query terms and emits (doc_id, n_hit)
    partials — exact because postings are globally distinct — and the
    driver combines what is by construction the query's posting set,
    not the corpus."""
    import ray.data as rd

    terms = sorted(set(t.lower() for t in terms))
    if not terms:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    shards = set(_token_shards(np.asarray(terms, dtype=object),
                               n_shards).tolist())
    paths = _shard_paths(index_dir, shards)
    if not paths:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    term_set = frozenset(terms)

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["token"].isin(term_set)]
        if len(d) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_hit": pd.Series(dtype="int64")})
        g = d.groupby("doc_id", as_index=False).size()
        return g.rename(columns={"size": "n_hit"})

    parts = rd.read_parquet(paths, columns=["token", "doc_id"]) \
        .map_batches(hits, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    g = parts.groupby("doc_id", as_index=False)["n_hit"].sum()
    if mode == "and":
        g = g[g["n_hit"] == len(terms)]
    out = g[["doc_id"]].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _make_pos_explode(n_shards: int):
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64"),
                                 "tok_shard": pd.Series(dtype="int64")})
        doc_of = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        ends = np.cumsum(lens)
        pos = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(ends - lens, lens)
        d = pd.DataFrame({"token": flat, "doc_id": doc_of, "pos": pos})
        d["tok_shard"] = _token_shards(d["token"].to_numpy(dtype=object),
                                       n_shards)
        return d
    return explode


def phrase_index_build(docs: Dataset, index_dir: str,
                       n_shards: int = N_SHARDS_DEFAULT) -> None:
    """Positional posting list (every occurrence, with its token
    offset) — the phrase-query cousin of ``token_index_build``.  A
    separate layout on purpose: the presence index stores DISTINCT
    (token, doc) so AND counts are exact; positions multiply rows per
    occurrence and would break that contract.  Same hive sharding, so
    ``compact_index_dir`` and shard-pruned serving apply unchanged."""
    docs.map_batches(_make_pos_explode(n_shards),
                     batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tok_shard"]
    )


def phrase_search(index_dir: str, terms: "list[str]",
                  n_shards: int = N_SHARDS_DEFAULT) -> pd.DataFrame:
    """Exact ordered-phrase search from the positional index: a doc
    matches at start position p iff term i sits at p+i for every i.
    Each batch emits (doc_id, p = pos − i, term_idx) for every term
    occurrence (postings are globally unique, so these triples are
    too); one hash shuffle on (doc_id, p) then counts DISTINCT
    term_idx == len(terms) per start — overlapping matches and
    repeated phrase terms both fall out of the distinct-index
    semantics.  Reads only the query terms' shards; the shuffle
    carries the query's posting rows, not the corpus.  Returns
    (doc_id, n_phrase) for matching docs."""
    import ray.data as rd

    from event_deduplication_ray.stages.shuffle import partition_apply

    terms = [t.lower() for t in terms]
    k = len(terms)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_phrase": pd.Series(dtype="int64")})
    if k == 0:
        return empty
    shards = set(_token_shards(np.asarray(sorted(set(terms)),
                                          dtype=object),
                               n_shards).tolist())
    paths = _shard_paths(index_dir, shards)
    if not paths:
        return empty

    def starts(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for i, term in enumerate(terms):
            m = df[df["token"] == term]
            if len(m):
                outs.append(pd.DataFrame({
                    "doc_id": m["doc_id"].to_numpy(np.int64),
                    "p": m["pos"].to_numpy(np.int64) - i,
                    "tix": np.int64(i)}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "p": pd.Series(dtype="int64"),
                                 "tix": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    def count_full(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        g = df[df["p"] >= 0].groupby(["doc_id", "p"])["tix"].nunique()
        hits = g[g == k].reset_index()
        if not len(hits):
            return empty
        out = hits.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "n_phrase"})
        return out.astype({"doc_id": "int64", "n_phrase": "int64"})

    parts = rd.read_parquet(paths, columns=["token", "doc_id", "pos"]) \
        .map_batches(starts, batch_format="pandas")
    res = partition_apply(parts, ["doc_id", "p"], 16, count_full) \
        .to_pandas()
    if "doc_id" not in res.columns:        # 0-row schema drop
        return empty
    res = res.groupby("doc_id", as_index=False)["n_phrase"].sum()
    return res.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_phrase": "int64"})


def phrase_index_add(new_docs: Dataset, index_dir: str,
                     n_shards: int = N_SHARDS_DEFAULT) -> None:
    """Incrementally index NEW documents into a positional index
    (token_index_add's contract: callers pass only doc_ids not
    already present; appends run-unique files into the existing
    ``tok_shard=`` dirs; O(new batch))."""
    new_docs.map_batches(_make_pos_explode(n_shards),
                         batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tok_shard"]
    )
