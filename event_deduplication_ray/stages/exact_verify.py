"""Expensive-verification tier: exact token-shingle Jaccard for
ambiguous pairs, with a persisted result cache.

Reference analog: the AI ambiguity-resolution tier T2/T3/T6
(/root/reference/src/event_dedup/ai_matching/resolver.py:25-194) —
pairs whose MinHash decision lands in the ambiguous band are re-scored
by a more expensive, more accurate oracle; results are cached by a
content hash so reruns skip already-resolved pairs
(ai_matching/cache.py:21-100); resolved decisions are merged back over
the cheap-tier decisions (resolver.py:197-250).  Re-keyed: the oracle
is EXACT shingle-set Jaccard over the documents' normalized text (no
estimation error), tier='exact'.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions import hashing as H
from event_deduplication_ray.stages.shuffle import cogroup_apply, partition_apply


def _shingle_sets(
    text_norm: pd.Series, k: int, seed: int, use_arrow: bool = True
) -> list[np.ndarray]:
    if use_arrow:
        # MUST match the signature stage's tokenization/hash exactly
        import pyarrow as pa

        from event_deduplication_ray.functions.arrow_text import hash_tokens_arrow

        th, lens = hash_tokens_arrow(pa.array(text_norm.fillna(""), pa.string()))
    else:
        flat, lens = H.tokenize_offsets(text_norm)
        th = H.hash_strings_u64(flat)
    sh, spd = H.shingle_hashes(th, lens, k, seed)
    ends = np.cumsum(spd)
    starts = ends - spd
    return [np.unique(sh[starts[i]:ends[i]]) for i in range(len(spd))]


def exact_jaccard_tier(
    verified: Dataset,
    docs: Dataset,
    cfg: DedupConfig,
    cache_dir: str | None = None,
) -> Dataset:
    """Resolve ambiguous pairs with exact shingle Jaccard.

    verified: (id_a, id_b, score, decision, tier) from the cheap tier.
    docs:     must carry (doc_id, text_norm).
    Returns the verified table with ambiguous rows re-decided
    (tier='exact'), non-ambiguous rows untouched — the reference's
    "failures keep pair ambiguous" semantics on any error path.

    cache_dir: optional Parquet cache of (pair_key, score) — already-
    resolved pairs are skipped via a broadcast anti-join (cache is
    small relative to the corpus: only ambiguous pairs land in it).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    P = cfg.join_num_partitions

    def split_amb(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["decision"], "ambiguous"))

    def split_rest(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["decision"], "ambiguous"))

    ambiguous = verified.map_batches(split_amb, batch_format="pyarrow")
    rest = verified.map_batches(split_rest, batch_format="pyarrow")

    cached: pd.DataFrame | None = None
    if cache_dir and os.path.isdir(cache_dir) and os.listdir(cache_dir):
        cached = rd.read_parquet(cache_dir).to_pandas()

    if cached is not None and len(cached):
        cache_keys = set(
            (cached["id_a"].astype(np.int64) * np.int64(1_000_003)
             + cached["id_b"].astype(np.int64)).tolist()
        )

        def drop_cached(t: pa.Table) -> pa.Table:
            key = (t["id_a"].to_numpy() * np.int64(1_000_003)) + t["id_b"].to_numpy()
            mask = ~np.isin(key, list(cache_keys))
            return t.filter(pa.array(mask))

        to_score = ambiguous.map_batches(drop_cached, batch_format="pyarrow")
    else:
        to_score = ambiguous

    texts = docs.select_columns(["doc_id", "text_norm"])
    texts_schema = pa.schema([("doc_id", pa.int64()), ("text_norm", pa.string())])
    pairs_schema = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), ("score", pa.float64()),
        ("decision", pa.string()), ("tier", pa.string()),
    ])
    with_a_schema = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), ("text_a", pa.string()),
    ])

    def attach_a(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "text_a": pd.Series(dtype="object")})
        m = l[["id_a", "id_b"]].merge(
            r.rename(columns={"doc_id": "id_a", "text_norm": "text_a"}),
            on="id_a", how="inner",
        )
        return m[["id_a", "id_b", "text_a"]]

    with_a = cogroup_apply(to_score, texts, ["id_a"], ["doc_id"], P, attach_a,
                           left_schema=pairs_schema, right_schema=texts_schema)

    k, seed = cfg.shingle_k, cfg.seed
    use_arrow = cfg.use_arrow_strings

    def attach_b_score(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        if len(l) == 0:
            return empty
        m = l.merge(
            r.rename(columns={"doc_id": "id_b", "text_norm": "text_b"}),
            on="id_b", how="inner",
        )
        if len(m) == 0:
            return empty
        sa = _shingle_sets(m["text_a"], k, seed, use_arrow)
        sb = _shingle_sets(m["text_b"], k, seed, use_arrow)
        scores = np.empty(len(m))
        for i in range(len(m)):
            inter = np.intersect1d(sa[i], sb[i], assume_unique=True).size
            union = sa[i].size + sb[i].size - inter
            scores[i] = inter / union if union else 0.0
        return pd.DataFrame({"id_a": m["id_a"].to_numpy(),
                             "id_b": m["id_b"].to_numpy(), "score": scores})

    scored = cogroup_apply(with_a, texts, ["id_b"], ["doc_id"], P, attach_b_score,
                           left_schema=with_a_schema, right_schema=texts_schema)
    scored_df = scored.to_pandas()

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        if len(scored_df):
            import pyarrow.parquet as pq
            import uuid

            pq.write_table(
                pa.Table.from_pandas(scored_df, preserve_index=False),
                os.path.join(cache_dir, f"part-{uuid.uuid4().hex[:12]}.parquet"),
            )
    if cached is not None and len(cached):
        scored_df = pd.concat(
            [scored_df, cached[["id_a", "id_b", "score"]]], ignore_index=True
        ).drop_duplicates(["id_a", "id_b"])

    jm, jn = cfg.jaccard_match, cfg.jaccard_no_match
    if len(scored_df):
        dec = np.full(len(scored_df), "ambiguous", dtype=object)
        dec[scored_df["score"].to_numpy() >= jm] = "match"
        dec[scored_df["score"].to_numpy() <= jn] = "no_match"
        scored_df = scored_df.assign(decision=dec, tier="exact")
    else:
        scored_df = scored_df.assign(decision=pd.Series(dtype="object"),
                                     tier=pd.Series(dtype="object"))

    resolved = rd.from_pandas(
        scored_df[["id_a", "id_b", "score", "decision", "tier"]]
    ) if len(scored_df) else None

    return rest.union(resolved) if resolved is not None else rest
