"""Expensive-verification tier: exact token-shingle Jaccard for
ambiguous pairs, with a persisted, config-fingerprinted result cache.

Reference analog: the AI ambiguity-resolution tier T2/T3/T6
(/root/reference/src/event_dedup/ai_matching/resolver.py:25-194) —
pairs whose MinHash decision lands in the ambiguous band are re-scored
by a more expensive, more accurate oracle; results are cached so
reruns skip already-resolved pairs (ai_matching/cache.py:21-100, which
keys on a content+config hash); resolved decisions are merged back
over the cheap-tier decisions (resolver.py:197-250).  Re-keyed: the
oracle is EXACT shingle-set Jaccard over the documents' normalized
text (no estimation error), tier='exact'.

Scale design (round-2 rework):
- no driver-side materialization: scoring runs inside cogroup merge
  tasks; the only pinned table is the narrow
  (id_a, id_b, score) result for *ambiguous pairs only*;
- cache is keyed on the exact (id_a, id_b) pair (two-column pandas
  hash join — no composite-int collisions) plus a config fingerprint
  covering every input that determines the score (shingle_k, seed,
  tokenizer); a cache written under a different config is ignored;
- cache writes happen from Ray Data write tasks, not the driver;
- the per-pair intersection loop is replaced by one lexsort over the
  partition's concatenated shingle arrays (adjacent-duplicate
  counting — unique-per-side arrays can only collide across sides);
- texts are LEFT-joined: a pair whose doc id misses the text table
  stays ambiguous with its cheap-tier score (the reference's
  "failures keep pair ambiguous" semantics), instead of being dropped.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions import hashing as H
from event_deduplication_ray.stages.shuffle import cogroup_apply


# per-worker residency for the broadcast cache table: ray.get on a
# pandas DataFrame DESERIALIZES it per call, so paying that once per
# batch turns the broadcast into per-batch setup cost (round-2
# VERDICT).  One entry max — the previous table is dropped when a new
# ref appears (new run / new cache generation).
_WORKER_RESIDENT: dict[str, pd.DataFrame] = {}


def _resident_df(ref) -> pd.DataFrame:
    key = ref.hex()
    df = _WORKER_RESIDENT.get(key)
    if df is None:
        df = ray.get(ref)
        _WORKER_RESIDENT.clear()
        _WORKER_RESIDENT[key] = df
    return df


def exact_config_fingerprint(cfg: DedupConfig) -> str:
    """Hash of every config input that determines the exact score.

    Thresholds are NOT included: decisions are recomputed from cached
    scores on every run, so threshold changes reuse the cache safely.
    """
    s = f"k={cfg.shingle_k}|seed={cfg.seed}|arrow={int(cfg.use_arrow_strings)}"
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def _shingle_flat(
    text_norm: pd.Series, k: int, seed: int, use_arrow: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DEDUPED shingle hashes as flat (values, doc_index)
    arrays — no per-row Python objects.  Must match the signature
    stage's tokenization/hash exactly."""
    if use_arrow:
        import pyarrow as pa

        from event_deduplication_ray.functions.arrow_text import hash_tokens_arrow

        th, lens = hash_tokens_arrow(pa.array(text_norm.fillna(""), pa.string()))
    else:
        flat, lens = H.tokenize_offsets(text_norm)
        th = H.hash_strings_u64(flat)
    sh, spd = H.shingle_hashes(th, lens, k, seed)
    pid = np.repeat(np.arange(len(spd), dtype=np.int64), spd)
    order = np.lexsort((sh, pid))
    v, p = sh[order], pid[order]
    keep = np.r_[True, (v[1:] != v[:-1]) | (p[1:] != p[:-1])]
    return v[keep], p[keep]


def _pair_jaccard(
    text_a: pd.Series, text_b: pd.Series, k: int, seed: int, use_arrow: bool
) -> np.ndarray:
    """Exact shingle-set Jaccard per row, fully vectorized: one
    lexsort over the concatenated (per-side-unique) shingle arrays;
    cross-side matches are exactly the adjacent duplicates."""
    n = len(text_a)
    va, ia = _shingle_flat(text_a, k, seed, use_arrow)
    vb, ib = _shingle_flat(text_b, k, seed, use_arrow)
    la = np.bincount(ia, minlength=n)
    lb = np.bincount(ib, minlength=n)
    vals = np.concatenate([va, vb])
    pids = np.concatenate([ia, ib])
    order = np.lexsort((vals, pids))
    v, p = vals[order], pids[order]
    dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
    inter = np.bincount(p[1:][dup], minlength=n)
    union = la + lb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


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
    (tier='exact'), non-ambiguous rows untouched.  Pairs that cannot
    be scored (doc id missing from the text table) stay ambiguous
    with their cheap-tier score.

    cache_dir: optional Parquet cache of
    (id_a, id_b, score, cfg_fp) — already-resolved pairs under the
    SAME config fingerprint are skipped via a broadcast anti-join
    (cache is small relative to the corpus: only ambiguous pairs land
    in it); new scores are appended from Ray write tasks.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    P = cfg.join_num_partitions
    fp = exact_config_fingerprint(cfg)

    def split_amb(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["decision"], "ambiguous"))

    def split_rest(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["decision"], "ambiguous"))

    ambiguous = verified.map_batches(split_amb, batch_format="pyarrow")
    rest = verified.map_batches(split_rest, batch_format="pyarrow")

    cached: pd.DataFrame | None = None
    if cache_dir and os.path.isdir(cache_dir) and os.listdir(cache_dir):
        cdf = rd.read_parquet(cache_dir).to_pandas()
        if "cfg_fp" in cdf.columns:
            cdf = cdf[cdf["cfg_fp"] == fp]
        else:  # unversioned (pre-round-2) cache: ignore, never trust
            cdf = cdf.iloc[0:0]
        if len(cdf):
            cached = cdf[["id_a", "id_b", "score"]].drop_duplicates(
                ["id_a", "id_b"]
            ).reset_index(drop=True)

    hits = None
    if cached is not None:
        # broadcast the cached (id_a, id_b, score) table ONCE via the
        # object store; exact two-column hash joins inside each task
        # (no composite-int collision surface)
        cache_ref = ray.put(cached)

        def drop_cached(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            keys = _resident_df(cache_ref)[["id_a", "id_b"]]
            m = df.merge(keys.assign(__hit=1), on=["id_a", "id_b"], how="left")
            return m[m["__hit"].isna()].drop(columns="__hit")

        def keep_cached(df: pd.DataFrame) -> pd.DataFrame:
            # per-pair cache LOOKUP (the reference resolver consults
            # its cache pair-by-pair, ai_matching/cache.py:60-100):
            # only pairs present in THIS run's ambiguous set pick up
            # their cached score — cached pairs foreign to the current
            # input are never injected into the output
            if len(df) == 0:
                return pd.DataFrame(
                    {"id_a": pd.Series(dtype="int64"),
                     "id_b": pd.Series(dtype="int64"),
                     "score0": pd.Series(dtype="float64"),
                     "score": pd.Series(dtype="float64")}
                )
            c = _resident_df(cache_ref)
            m = df.rename(columns={"score": "score0"}).merge(
                c, on=["id_a", "id_b"], how="inner"
            )
            return m[["id_a", "id_b", "score0", "score"]]

        to_score = ambiguous.map_batches(drop_cached, batch_format="pandas")
        hits = ambiguous.map_batches(keep_cached, batch_format="pandas")
    else:
        to_score = ambiguous

    texts = docs.select_columns(["doc_id", "text_norm"])

    def attach_a(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "score0", "text_a"]
        if len(l) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "score0": pd.Series(dtype="float64"),
                 "text_a": pd.Series(dtype="object")}
            )
        l = l[["id_a", "id_b", "score"]].rename(columns={"score": "score0"})
        if len(r) == 0:
            l = l.assign(text_a=pd.Series([None] * len(l), dtype="object"))
            return l[cols]
        m = l.merge(
            r.rename(columns={"doc_id": "id_a", "text_norm": "text_a"}),
            on="id_a", how="left",
        )
        return m[cols]

    with_a = cogroup_apply(to_score, texts, ["id_a"], ["doc_id"], P, attach_a)

    k, seed = cfg.shingle_k, cfg.seed
    use_arrow = cfg.use_arrow_strings

    def attach_b_score(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "score0": pd.Series(dtype="float64"),
             "score": pd.Series(dtype="float64")}
        )
        if len(l) == 0:
            return empty
        if len(r) == 0:
            m = l.assign(text_b=pd.Series([None] * len(l), dtype="object"))
        else:
            m = l.merge(
                r.rename(columns={"doc_id": "id_b", "text_norm": "text_b"}),
                on="id_b", how="left",
            )
        missing = (m["text_a"].isna() | m["text_b"].isna()).to_numpy()
        scores = _pair_jaccard(
            m["text_a"].fillna(""), m["text_b"].fillna(""), k, seed, use_arrow
        )
        scores = scores.astype(np.float64)
        scores[missing] = np.nan  # unresolvable: stays ambiguous
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy(), "id_b": m["id_b"].to_numpy(),
             "score0": m["score0"].to_numpy(), "score": scores}
        )

    # narrow (id_a, id_b, score0, score) over ambiguous pairs only —
    # pinned in the object store, never collected to the driver
    scored = cogroup_apply(
        with_a, texts, ["id_b"], ["doc_id"], P, attach_b_score
    ).materialize()

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)

        def cache_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["score"]))
            t = t.select(["id_a", "id_b", "score"])
            return t.append_column("cfg_fp", pa.array([fp] * len(t), pa.string()))

        # written in parallel from Ray write tasks (uuid part names —
        # appends, never clobbers)
        scored.map_batches(cache_rows, batch_format="pyarrow").write_parquet(
            cache_dir
        )

    jm, jn = cfg.jaccard_match, cfg.jaccard_no_match

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64"),
                 "decision": pd.Series(dtype="object"),
                 "tier": pd.Series(dtype="object")}
            )
        s = df["score"].to_numpy()
        unresolved = np.isnan(s)
        final = np.where(unresolved, df["score0"].to_numpy(), s)
        dec = np.full(len(df), "ambiguous", dtype=object)
        dec[s >= jm] = "match"
        dec[s <= jn] = "no_match"
        return pd.DataFrame(
            {"id_a": df["id_a"].to_numpy(), "id_b": df["id_b"].to_numpy(),
             "score": final, "decision": dec, "tier": "exact"}
        )

    resolved_src = scored if hits is None else scored.union(hits)
    resolved = resolved_src.map_batches(decide, batch_format="pandas")
    return rest.union(resolved)
