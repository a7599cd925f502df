"""Query battery over the driver's testdata tables (TESTDATA.md).

Re-expresses the reference's query surface (SURVEY.md §2.8 Q1-Q7:
filter+sort+paginate, distincts, joins, dashboard aggregates, daily
time series, review-queue top-k) plus the training-data-pipeline
operators (dedup family, text analysis, similarity search) as
Ray-Data-first implementations.  Each function takes ``sf_dir`` and
returns a pandas DataFrame or Dataset; ``__ray_entry__.oracle_sql``
carries the DuckDB-equivalent SQL with IDENTICAL column names.

Conventions for oracle parity:
- timestamps grouped/bucketed via strftime STRINGS (no tz/precision
  ambiguity between Arrow and DuckDB);
- float aggregates rounded (sum→2, avg/cos→6) on both sides;
- counts are int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions import hashing as H
from event_deduplication_ray.functions import textstats as TS
from event_deduplication_ray.stages.aggregate import (
    grouped_aggregate,
    grouped_aggregate_distributed,
)
from event_deduplication_ray.stages.shuffle import partition_apply


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


QCFG = DedupConfig(join_num_partitions=16)


def _with_schema(df: pd.DataFrame, cols: "dict[str, str]") -> pd.DataFrame:
    """Ray's to_pandas() drops a 0-row Dataset's schema (the q26
    fallback pattern): if any expected column is missing, rebuild the
    empty typed frame so downstream sort/groupby never KeyErrors."""
    if all(c in df.columns for c in cols):
        return df
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


# ---------------------------------------------------------------- relational

def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style dashboard aggregate (reference Q5 analog)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "sum", "l_quantity"),
            ("sum_base_price", "sum", "l_extendedprice"),
            ("avg_qty", "mean", "l_quantity"),
            ("avg_price", "mean", "l_extendedprice"),
            ("count_order", "count", "l_quantity"),
        ],
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_base_price"] = out["sum_base_price"].round(2)
    out["avg_qty"] = out["avg_qty"].round(6)
    out["avg_price"] = out["avg_price"].round(6)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q02_top_orders(sf_dir: str) -> pd.DataFrame:
    """Top-k sort with deterministic tie-break (reference Q7 analog)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.to_pandas()


def q03_distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """Distinct values (reference Q2/Q3 analog)."""
    ds = _read(sf_dir, "events", ["event_type"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    return parts.drop_duplicates().sort_values("event_type").reset_index(drop=True)


def q04_segment_revenue(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer (broadcast small side) → per-segment revenue."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_by_key = cust.set_index("c_custkey")["c_mktsegment"]
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df["c_mktsegment"] = df["o_custkey"].map(seg_by_key)
        return df[["c_mktsegment", "o_totalprice"]]

    joined = orders.map_batches(attach, batch_format="pandas")
    out = grouped_aggregate(
        joined, ["c_mktsegment"],
        [("n_orders", "count", "o_totalprice"),
         ("sum_price", "sum", "o_totalprice"),
         ("avg_price", "mean", "o_totalprice")],
    )
    out["sum_price"] = out["sum_price"].round(2)
    out["avg_price"] = out["avg_price"].round(6)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q05_daily_events(sf_dir: str) -> pd.DataFrame:
    """Daily time series (reference Q6 analog, dashboard.py:85-116)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return df[["day", "value"]]

    keyed = ds.map_batches(add_day, batch_format="pandas")
    out = grouped_aggregate(
        keyed, ["day"],
        [("n_events", "count", "value"), ("sum_value", "sum", "value")],
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values("day").reset_index(drop=True)


def q06_user_hourly_windows(sf_dir: str) -> Dataset:
    """Tumbling 1h windows per user — distributed combine (high-
    cardinality key)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        df["window_start"] = df["ts"].dt.strftime("%Y-%m-%d %H:00:00")
        return df[["user_id", "window_start", "value"]]

    keyed = ds.map_batches(add_hour, batch_format="pandas")
    agg = grouped_aggregate_distributed(
        keyed, ["user_id", "window_start"],
        [("n_events", "count", "value"), ("sum_value", "sum", "value")],
        num_parts=QCFG.join_num_partitions,
    )

    def final_round(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(4)
        return df

    return agg.map_batches(final_round, batch_format="pandas")


def q14_session_windows(sf_dir: str) -> Dataset:
    """Gap-based session windows per user (30-min inactivity gap) —
    the streaming-shaped workload pattern from the Ray guide: events
    partitioned by key, sorted by (ts, event_id) within the partition,
    sessionized with vectorized pandas; one shuffle."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff() > pd.Timedelta(minutes=30)
        df["session_id"] = (new_user | gap).cumsum()
        # renumber sessions within each user (1, 2, ...)
        firsts = df.groupby("user_id", sort=False)["session_id"].transform("min")
        df["session_id"] = (df["session_id"] - firsts + 1).astype("int64")
        g = df.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("event_id", "size"), sum_value=("value", "sum")
        )
        g["sum_value"] = g["sum_value"].round(4)
        return g

    from event_deduplication_ray.stages.shuffle import partition_apply

    return partition_apply(ds, ["user_id"], QCFG.join_num_partitions, sessionize)


def q15_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join as a hash-partitioned cogroup — the 100 TB-safe
    shape: orders is NOT a small side, so neither table is broadcast
    or collected; each partition sees every row whose key hashes to
    it and filters locally.  The orders side is pre-deduped per batch
    inside the split wave (combiner) so only distinct keys shuffle."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    okeys = _read(sf_dir, "orders", ["o_custkey"])

    def dedup_keys(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pa.array(
            np.unique(t["o_custkey"].to_numpy()))})

    okeys_sh = shuffle_to(okeys, ["o_custkey"], QCFG.join_num_partitions,
                          pre_fn=dedup_keys)

    def anti(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                                 "c_name": pd.Series(dtype="object")})
        if len(r) == 0:
            return l[["c_custkey", "c_name"]]
        mask = ~l["c_custkey"].isin(r["o_custkey"].unique())
        return l.loc[mask, ["c_custkey", "c_name"]]

    out = cogroup_apply(cust, okeys_sh, ["c_custkey"], ["o_custkey"],
                        QCFG.join_num_partitions, anti)
    df = out.to_pandas()
    if len(df.columns) == 0:   # legitimately-empty result keeps its schema
        df = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                           "c_name": pd.Series(dtype="object")})
    return df


def q12_filtered_export(sf_dir: str) -> Dataset:
    """Timestamp-filtered export (reference S9 filtered export)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"])

    def f(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["o_orderdate"], pa.scalar(pd.Timestamp("1997-01-01")))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q13_region_customers(sf_dir: str) -> pd.DataFrame:
    """3-way join with broadcast dims: region ⋈ nation ⋈ customer."""
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    rname_by_nation = dim.set_index("n_nationkey")["r_name"]
    cust = _read(sf_dir, "customer", ["c_nationkey"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df["r_name"] = df["c_nationkey"].map(rname_by_nation)
        return df[["r_name"]]

    joined = cust.map_batches(attach, batch_format="pandas")
    out = grouped_aggregate(joined, ["r_name"], [("n_customers", "count", "r_name")])
    return out.sort_values("r_name").reset_index(drop=True)


# ---------------------------------------------------------- text / documents

def q07_lang_distribution(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["lang"])
    out = grouped_aggregate(ds, ["lang"], [("n_docs", "count", "lang")])
    return out.sort_values("lang").reset_index(drop=True)


def q08_token_counts(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_tokens": TS.token_counts(df["text"])}
        )

    return ds.map_batches(f, batch_format="pandas")


def q09_doc_quality(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        q = TS.quality_features(df["text"])
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "n_chars": q["n_chars"],
             "n_words": q["n_words"],
             "mean_word_len": q["mean_word_len"].round(6)}
        )

    return ds.map_batches(f, batch_format="pandas")


def q10_exact_dedup(sf_dir: str) -> Dataset:
    """Exact dedup: hash-partition text groups, min-doc_id
    representative + duplicate count per distinct text."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(text_hash=H.hash_strings_u64(df["text"]).astype(np.int64))
        g = df.groupby("text_hash", as_index=False).agg(
            rep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )
        return g

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text_hash", as_index=False).agg(
            rep_doc_id=("rep_doc_id", "min"), n_dups=("n_dups", "sum")
        )
        return g[["rep_doc_id", "n_dups"]]

    return partition_apply(parts, ["text_hash"], QCFG.join_num_partitions, combine)


def q23_doc_fingerprints(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "fingerprint": TS.doc_fingerprints(df["text"])}
        )

    return ds.map_batches(f, batch_format="pandas")


def q24_langid(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang_pred": TS.language_id(df["text"])}
        )

    return ds.map_batches(f, batch_format="pandas")


# ----------------------------------------------- training-data pipeline ops

def q33_decontaminate(sf_dir: str) -> Dataset:
    """Train/test decontamination — the GPT-3/Pile-style overlap
    filter: flag every TRAIN doc that shares at least one token
    5-gram with any TEST doc (test = ``doc_id % 10 == 0``, a
    deterministic stand-in for a held-out benchmark suite).

    Scale shape: the TEST shingle-hash set is the genuinely small side
    (benchmarks are millions of shingles vs the corpus's trillions),
    so it is collected once and broadcast via ``ray.put``; the train
    side streams — per-batch ``np.isin`` against the broadcast set,
    contaminated doc ids deduped by a hash-partitioned combine, and
    the final flag attached with a cogroup (no driver-side join).
    Reuses the q28/q30 shingle machinery (``substring_mod_p=1`` =
    every distinct shingle, no sampling), so the DuckDB string-shingle
    oracle must match exactly.  Output: (doc_id, contaminated 0/1)
    for every train doc."""
    return _decontaminate(sf_dir, use_bloom=False)


def _decontaminate(sf_dir: str, use_bloom: bool) -> Dataset:
    """q33 core.  ``use_bloom=True`` broadcasts the test shingle set
    as a Bloom filter (functions/bloom.py) instead of the exact
    sorted array — the path for a test set too large to ship exactly.
    The per-PROBE fpr is 1e-4 (≈19 bits/key, ~3.4x smaller than the
    exact 64-bit keys): a doc is falsely flagged if ANY of its ~100
    shingle probes hits, so the doc-level fp rate is ≈ shingles x
    probe-fpr — size the probe fpr for the probe volume, not 1 %.
    False positives only OVER-flag (extra docs dropped, never a
    contaminated doc kept), so the bloom mode is conservative; its
    flags are pytest-gated as a superset of the exact mode's
    (test_bloom_decontaminate_superset)."""
    import ray

    from event_deduplication_ray.functions.bloom import (
        bloom_build,
        bloom_contains,
        bloom_params,
    )
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.shuffle import cogroup_apply
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir)
    fps = substring_fp_table(signature_stage(docs, cfg), cfg).materialize()

    def test_side(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        fp = t["fp_key"].to_numpy()
        return pa.table(
            {"fp_key": pa.array(np.unique(fp[did % 10 == 0]), pa.int64())}
        )

    tdf = fps.map_batches(test_side, batch_format="pyarrow").to_pandas()
    test_set = (np.unique(tdf["fp_key"].to_numpy())
                if len(tdf) else np.empty(0, np.int64))
    if use_bloom:
        m_bits, k = bloom_params(len(test_set), fpr=1e-4)
        ref = ray.put(bloom_build(test_set, m_bits, k))
    else:
        k = 0
        ref = ray.put(np.ascontiguousarray(test_set))

    def hits(t: pa.Table) -> pa.Table:
        ts = ray.get(ref)          # zero-copy numpy view from plasma
        did = t["doc_id"].to_numpy()
        fp = t["fp_key"].to_numpy()
        member = (bloom_contains(ts, fp, k) if use_bloom
                  else np.isin(fp, ts))
        m = (did % 10 != 0) & member
        return pa.table({"doc_id": pa.array(np.unique(did[m]), pa.int64())})

    hit_parts = fps.map_batches(hits, batch_format="pyarrow")

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    hit_ids = partition_apply(
        hit_parts, ["doc_id"], cfg.join_num_partitions, dedupe
    )

    def train_only(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(did[did % 10 != 0], pa.int64())})

    train_ids = docs.select_columns(["doc_id"]).map_batches(
        train_only, batch_format="pyarrow"
    )

    def flag(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        out = l[["doc_id"]].copy()
        out["contaminated"] = (
            l["doc_id"].isin(r["doc_id"]).to_numpy().astype(np.int64)
        )
        return out

    hit_schema = pa.schema([("doc_id", pa.int64())])
    return cogroup_apply(train_ids, hit_ids, ["doc_id"], ["doc_id"],
                         cfg.join_num_partitions, flag,
                         right_schema=hit_schema)


# percentile_disc fractions as exact rationals: DuckDB evaluates the
# fraction in exact decimal, k = ceil(p*n) = (num*n + den - 1) // den
# (verified against DuckDB for n in {7, 10, 100, 101, 500})
_QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def q34_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-lang EXACT length quantiles WITHOUT a sort shuffle: text
    lengths are bounded ints, so per-batch (lang, n_chars) value
    counts are the partial, a hash-partitioned combine sums them, and
    the quantile reads off the cumulative histogram — at 100 TB the
    shuffle carries one row per distinct (lang, length), not one per
    document.  Matches DuckDB percentile_disc (smallest value whose
    cumulative count reaches ceil(p*n), p exact)."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["text"].notna()
        g = pd.DataFrame({
            "lang": df.loc[m, "lang"],
            "n_chars": df.loc[m, "text"].str.len().astype(np.int64),
        })
        out = g.groupby(["lang", "n_chars"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False)["n"].sum()
        rows = []
        for lang, sub in g.groupby("lang"):   # loop over langs, not rows
            sub = sub.sort_values("n_chars")
            vals = sub["n_chars"].to_numpy()
            cum = np.cumsum(sub["n"].to_numpy())
            total = int(cum[-1])
            row = {"lang": lang}
            for name, num, den in _QUANTILES:
                k = (num * total + den - 1) // den
                row[name] = int(vals[np.searchsorted(cum, max(k, 1))])
            rows.append(row)
        return pd.DataFrame(rows)

    out = partition_apply(
        parts, ["lang"], QCFG.join_num_partitions, combine
    ).to_pandas()
    for c in ("p50", "p90", "p99"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q35_top_bigrams(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide heavy hitters: top-20 token bigrams by multiset
    count, tie-broken by ngram asc.  Partial bigram counts per batch
    (flat-token vectorized, no per-row loop), hash-partitioned
    combine on the DISTINCT ngram key, per-partition top-20, tiny
    driver merge — the shuffle carries one row per distinct bigram
    per batch, never one per occurrence."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        if n < 2:
            return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        # a bigram starts at every token that is not the last of its doc
        start_ok = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        start_ok[ends[lens > 0] - 1] = False
        idx = np.flatnonzero(start_ok[:-1])
        big = flat[idx] + " "
        big = big + flat[idx + 1]
        vc = pd.Series(big).value_counts()
        return pd.DataFrame({"ngram": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(dtype=np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", as_index=False)["n"].sum()
        return g.sort_values(["n", "ngram"],
                             ascending=[False, True]).head(20)

    parts = partition_apply(
        partials, ["ngram"], QCFG.join_num_partitions, combine
    ).to_pandas()
    out = parts.sort_values(["n", "ngram"], ascending=[False, True]).head(20)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def q36_pii_scrub(sf_dir: str) -> Dataset:
    """PII redaction pass (emails, IPv4) — the standard pre-training
    scrub step: per-batch vectorized regex replace + match counts on
    the original text.  Patterns are ASCII-explicit so Python re and
    the RE2-family engines (DuckDB oracle) match identically; planted
    PII is unit-tested in test_training_ops.py (the driver corpus is
    PII-free, so this entry gates the plumbing + regex parity)."""
    from event_deduplication_ray.functions.textstats import scrub_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = scrub_pii(df["text"])
        out.insert(0, "doc_id", df["doc_id"])
        return out

    return ds.map_batches(f, batch_format="pandas")


def q37_lang_cap(sf_dir: str) -> Dataset:
    """Per-group cap (corpus-mixture control): keep the 40 smallest
    doc_ids per lang — the deterministic stratified-downsample shape
    used to rebalance language mixes.  One hash shuffle on lang, then
    a vectorized groupby-head per partition; at 100 TB the per-group
    top-k would pre-prune inside the split wave (per-batch head) so
    only candidate rows shuffle — here groups are few and small."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "doc_id"])
        return df.groupby("lang", sort=False).head(40)

    def pre_cap(t: pa.Table) -> pa.Table:
        # combiner: per-batch head(40) per lang — only candidates shuffle
        df = t.to_pandas().sort_values(["lang", "doc_id"])
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(40), preserve_index=False
        )

    return partition_apply(ds, ["lang"], QCFG.join_num_partitions, cap,
                           pre_fn=pre_cap)


def q38_tfidf_topterms(sf_dir: str) -> Dataset:
    """Per-doc top-3 TF-IDF terms — the classic two-shuffle corpus
    statistic, shaped for scale: the (doc, token, tf) table is
    shuffled ONCE by token, and because a partition then owns every
    row of its tokens, document frequency is computed IN-PARTITION
    (transform('size')) with no separate DF table, no join and no
    broadcast vocabulary; scores chain straight into a doc_id shuffle
    (out_keys — zero driver barrier) for the per-doc top-k.  Scores
    are rounded to 6 dp before ranking on BOTH sides so the float-ulp
    ranking caveat (q11) is pinned; ties break token-asc.  Output
    (doc_id, token), <= 3 rows per doc."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets
    from event_deduplication_ray.stages.shuffle import shuffle_to

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()    # driver scalar (parquet metadata)

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        t = pd.DataFrame({"doc_id": doc, "token": flat})
        g = t.groupby(["doc_id", "token"], as_index=False).size()
        return g.rename(columns={"size": "tf"})

    # rows never split docs across batches, so per-batch (doc, token)
    # counts are already the final tf
    tf = ds.map_batches(tf_partial, batch_format="pandas")
    tf_sh = shuffle_to(tf, ["token"], QCFG.join_num_partitions)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("token")["doc_id"].transform("size")
        s = np.round(
            df["tf"].to_numpy() * np.log(n_docs / dfreq.to_numpy()), 6
        )
        out = df[["doc_id", "token"]].copy()
        out["score"] = s
        return out

    scored = partition_apply(
        tf_sh, ["token"], QCFG.join_num_partitions, score,
        out_keys=["doc_id"], out_parts=QCFG.join_num_partitions,
    )

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True])
        return df.groupby("doc_id", sort=False).head(3)[["doc_id", "token"]]

    return partition_apply(scored, ["doc_id"], QCFG.join_num_partitions, top3)

def _rep_features(texts: pd.Series) -> pd.DataFrame:
    """Per-doc repetition fractions (q39 core, shared with q46):
    top-token frac, top-bigram frac, type-token (distinct) ratio —
    rounded to 6 dp; NaN where a doc has no tokens/bigrams."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    flat, lens = tokenize_offsets(texts.str.lower())
    doc = np.repeat(np.arange(len(texts)), lens)
    idx = pd.RangeIndex(len(texts))
    cnt = pd.DataFrame({"i": doc, "tok": flat}).groupby(
        ["i", "tok"], sort=False).size()
    g = cnt.groupby(level=0)
    top_frac = (g.max() / g.sum()).reindex(idx)
    dis_frac = (g.size() / g.sum()).reindex(idx)
    same = doc[:-1] == doc[1:] if len(doc) else np.zeros(0, bool)
    bg = pd.DataFrame({
        "i": doc[:-1][same],
        "bg": pd.Series(flat[:-1][same]) + " " + pd.Series(flat[1:][same]),
    }).groupby(["i", "bg"], sort=False).size().groupby(level=0)
    bg_frac = (bg.max() / bg.sum()).reindex(idx)
    return pd.DataFrame({
        "top_token_frac": np.round(top_frac.to_numpy(), 6),
        "top_bigram_frac": np.round(bg_frac.to_numpy(), 6),
        "distinct_frac": np.round(dis_frac.to_numpy(), 6),
    })


def q39_repetition_filter(sf_dir: str) -> Dataset:
    """Gopher-style per-doc repetition quality filter (Rae et al. 2021
    §A1.1 repetition rules, re-shaped to this corpus's newline-free
    token soup): per doc, the fraction of tokens taken by the single
    most frequent token, the same for bigrams, and the type-token
    (distinct) ratio; ``keep`` applies the thresholds.  Entirely
    per-row → one vectorized map_batches pass, no shuffle, trivially
    100 TB-safe.  Fracs rounded to 6 dp on BOTH sides and ``keep``
    computed from the ROUNDED values so the float boundary is pinned
    (q11 convention).  Docs with < 2 tokens have no bigrams → NaN,
    matching the oracle's empty-aggregate NULL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        rep = _rep_features(df["text"])
        rep.insert(0, "doc_id", df["doc_id"].to_numpy())
        rep["keep"] = ((rep["top_token_frac"] <= 0.125)
                       & (rep["distinct_frac"] >= 0.35))
        return rep

    return ds.map_batches(f, batch_format="pandas")


def q40_event_asof_anchor(sf_dir: str) -> Dataset:
    """As-of join — an operator Ray Data lacks natively: every event
    joined to the most recent 'purchase' event (the anchor stream) of
    the same user at-or-before its timestamp (events with no prior
    anchor drop, i.e. inner as-of).  Both sides hash-shuffle ONCE on
    user_id into the SAME partitioning (cogroup); inside a partition
    one pd.merge_asof (sorted on ts, by=user_id) does the vectorized
    backward search — no per-row loop, no driver materialization.
    Anchors are deduped to one per (user_id, ts) (max event_id, batch
    partial + in-partition final) so the equal-timestamp choice is
    deterministic on both engines.  Partitioning assumption: a user's
    rows co-locate (hash on user_id); skew bounded by per-user event
    counts.  anchor_ts is emitted as a strftime STRING (module
    convention) to pin timestamp precision against the oracle."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    from event_deduplication_ray.stages.shuffle import cogroup_apply

    left = ev.map_batches(
        lambda df: df[["event_id", "ts", "user_id"]],
        batch_format="pandas",
    )

    def anchor_partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df.loc[df["event_type"] == "purchase", ["user_id", "ts", "event_id"]]
        return a.groupby(["user_id", "ts"], as_index=False)["event_id"].max() \
                .rename(columns={"event_id": "anchor_id"})

    anchors = ev.map_batches(anchor_partial, batch_format="pandas")

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("anchor_id", pa.int64()),
                            ("anchor_ts", pa.string())])

    def join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        l, r = lt.to_pandas(), rt.to_pandas()
        if len(r):
            r = r.groupby(["user_id", "ts"], as_index=False)["anchor_id"].max()
        r = r.assign(anchor_ts=r["ts"])
        l = l.sort_values("ts", kind="mergesort")
        r = r.sort_values("ts", kind="mergesort")
        out = pd.merge_asof(l, r, on="ts", by="user_id", direction="backward")
        out = out.dropna(subset=["anchor_id"])
        # explicit schema pins anchor_ts to Arrow string on EMPTY
        # partitions too (pandas inference would emit null type)
        return pa.Table.from_pandas(pd.DataFrame({
            "event_id": out["event_id"].to_numpy(),
            "anchor_id": out["anchor_id"].to_numpy(np.int64),
            "anchor_ts": out["anchor_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
        }), schema=out_schema, preserve_index=False)

    lschema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                         ("user_id", pa.int64())])
    rschema = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us")),
                         ("anchor_id", pa.int64())])
    return cogroup_apply(left, anchors, ["user_id"], ["user_id"],
                         QCFG.join_num_partitions, join,
                         batch_format="pyarrow",
                         left_schema=lschema, right_schema=rschema)


def q41_rolling_user_window(sf_dir: str) -> Dataset:
    """Sliding-window aggregate (7-day RANGE frame) per user over the
    event stream — the feature-engineering shape (trailing activity
    counts) Ray Data has no window operator for.  One hash shuffle on
    user_id, then a fully vectorized per-partition pass: sort by
    (user, ts), collapse user boundaries into ONE searchsorted by
    shifting each user's int64-µs timeline onto a disjoint range
    (margin > window, so frames never cross users), and read frame
    sums off a prefix-sum difference.  O(n log n) per partition, no
    per-user Python loop.  RANGE semantics (equal-ts peers share a
    frame) fall out of side='right'/side='left'.  Sums rounded to
    4 dp on both sides (prefix-sum differencing vs the oracle's exact
    per-frame sum differ at ~1e-10)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    window_us = 7 * 86_400 * 1_000_000

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "n_7d": np.empty(0, np.int64),
                                 "sum_7d": np.empty(0, np.float64)})
        codes = pd.factorize(df["user_id"], sort=False)[0].astype(np.int64)
        span = (ts.max() - ts.min()) + window_us + 2
        shifted = (ts - ts.min()) + codes * span
        lo = np.searchsorted(shifted, shifted - window_us, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        cum = np.concatenate([[0.0], np.cumsum(df["value"].to_numpy())])
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "n_7d": (hi - lo).astype(np.int64),
            "sum_7d": np.round(cum[hi] - cum[lo], 4),
        })

    return partition_apply(ev, ["user_id"], QCFG.join_num_partitions, roll)


def q42_semantic_dedup(sf_dir: str) -> Dataset:
    """SemDeDup-style embedding semantic dedup over the embeddings
    table: spherical-k-means coarse clusters (bounded sample), then
    within-cluster cosine >= 0.95 drops all but the min vec_id of
    each dense ball (stages/similarity.semantic_dedup).  Rows-only
    for the driver (k-means is not SQL-expressible; the driver
    embeddings carry no pairs above 0.48 cosine so every row keeps) —
    the drop semantics are pinned by the planted-clump pytest."""
    from event_deduplication_ray.stages.similarity import semantic_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(ds, n_lists=16, cos_threshold=0.95,
                          num_parts=QCFG.join_num_partitions)


# ------------------------------------------------------------ dedup pipelines

def _docs_from_documents(sf_dir: str) -> Dataset:
    """documents table → dedup-pipeline input shape (doc_id from the
    table, text as extracted text)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    from event_deduplication_ray.functions.text import normalize_text

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df["text_norm"] = normalize_text(df["text"])
        return df

    return ds.map_batches(prep, batch_format="pandas")


def q20_minhash_clusters(sf_dir: str) -> Dataset:
    """MinHash+LSH near-dup clustering of the documents table →
    (doc_id, cluster_id)."""
    from event_deduplication_ray.stages.banding import minhash_band_table
    from event_deduplication_ray.stages.cluster import (
        assignments_with_singletons,
        connected_components,
    )
    from event_deduplication_ray.stages.pairs import minhash_candidate_pairs
    from event_deduplication_ray.stages.signatures import signature_stage
    from event_deduplication_ray.stages.verify import match_edges, verify_pairs

    docs = _docs_from_documents(sf_dir)
    sigs = signature_stage(docs, QCFG).materialize()
    pairs = minhash_candidate_pairs(minhash_band_table(sigs, QCFG), QCFG)
    verified = verify_pairs(pairs, sigs, QCFG)
    labels = connected_components(
        match_edges(verified, QCFG).select_columns(["id_a", "id_b"]), QCFG
    )
    return assignments_with_singletons(docs, labels, QCFG)


def q28_ngram_jaccard_clusters(sf_dir: str) -> Dataset:
    """n-gram-Jaccard dedup, EXACT: pairs sharing >= 1 token 5-gram
    (shingle inverted-index join at substring_mod_p=1 — every distinct
    shingle, no sampling, no LSH candidate misses) verified by exact
    shingle-set Jaccard from shared counts, then clustered.
    (id_a,id_b) edges where exact 5-gram Jaccard >= 0.75 →
    (doc_id, cluster_id).  Deterministic end to end, so the DuckDB
    oracle (string shingles + recursive-CTE components) must match
    exactly."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.cluster import (
        assignments_with_singletons,
        connected_components,
    )
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir).materialize()
    sigs = signature_stage(docs, cfg)
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(sigs, cfg), cfg, threshold=cfg.jaccard_match
    )
    labels = connected_components(pairs.select_columns(["id_a", "id_b"]), cfg)
    return assignments_with_singletons(docs, labels, cfg)


def q30_containment_pairs_exact(sf_dir: str) -> pd.DataFrame:
    """Substring/containment dedup, EXACT: the same inverted-index
    shared-count machinery as q28 but scored as containment
    shared/min(|A|,|B|) >= substring_containment — the substring
    tier's decision rule with zero sampling error, so the DuckDB
    oracle (string shingles + least()) must match exactly.  Returns
    the (id_a, id_b) pair set (pair identity is the oracle-comparable
    part; see q26 for the float caveat).  Scale note: exact mode is
    the oracle/audit path — production containment at 100 TB is q22's
    mod-p sampled pass, which caps skew."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir)
    sigs = signature_stage(docs, cfg)
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(sigs, cfg), cfg,
        threshold=cfg.substring_containment, mode="containment",
    )
    df = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    if list(df.columns) != ["id_a", "id_b"]:
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                           "id_b": pd.Series(dtype="int64")})
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q21_simhash_pairs(sf_dir: str) -> Dataset:
    from event_deduplication_ray.stages.banding import simhash_band_table
    from event_deduplication_ray.stages.pairs import simhash_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    docs = _docs_from_documents(sf_dir)
    sigs = signature_stage(docs, QCFG)
    return simhash_match_pairs(simhash_band_table(sigs, QCFG), QCFG)


def q22_substring_pairs(sf_dir: str) -> Dataset:
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import substring_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    docs = _docs_from_documents(sf_dir)
    sigs = signature_stage(docs, QCFG)
    return substring_match_pairs(substring_fp_table(sigs, QCFG), QCFG)


# ------------------------------------------------------------- similarity

def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas()
    row = df[df["vec_id"] == 0].iloc[0]
    return np.asarray(row["embedding"], dtype=np.float64)


def q11_embedding_topk(sf_dir: str) -> pd.DataFrame:
    """Result carries only the ranked ids: cosine floats differ in the
    last ulps between numpy float64 and DuckDB's float32 kernel, so
    the float column itself is not hash-stable across engines."""
    from event_deduplication_ray.stages.similarity import brute_force_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(emb, _query_vec(sf_dir), k=10, exclude_ids={0})
    return out[["vec_id"]]


def q31_embedding_topk_batch(sf_dir: str) -> pd.DataFrame:
    """Batched ANN: top-10 per query for a 3-query matrix in ONE pass
    over the table (one (n,d)@(d,q) matmul per batch, local top-k per
    query — the realistic serving shape).  Ids only, same float-hash
    caveat as q11; self-matches kept (cos=1.0, rank 1)."""
    from event_deduplication_ray.stages.similarity import brute_force_topk_many

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas()
    qrows = df[df["vec_id"] < 3].sort_values("vec_id")
    qmat = np.vstack(qrows["embedding"].to_numpy()).astype(np.float64)
    qids = qrows["vec_id"].to_numpy()

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk_many(emb, qmat, k=10)
    out["query_id"] = qids[out["query_idx"].to_numpy()]
    return out[["query_id", "vec_id"]].reset_index(drop=True)


# sf_dir → materialized SRP index dir (built once per process; the
# 100 TB shape is a persisted index serving MANY queries, each reading
# only its <= n_bits+1 matching partitions)
_SRP_INDEX_CACHE: dict[str, str] = {}


def q25_lsh_topk(sf_dir: str) -> pd.DataFrame:
    import os
    import tempfile

    from event_deduplication_ray.stages.similarity import (
        srp_index_build,
        srp_index_topk,
    )

    idx = _SRP_INDEX_CACHE.get(sf_dir)
    if idx is None or not os.path.isdir(idx):
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        idx = tempfile.mkdtemp(prefix="edr_srp_idx_")
        srp_index_build(emb, idx)
        _SRP_INDEX_CACHE[sf_dir] = idx
    return srp_index_topk(idx, _query_vec(sf_dir), k=10)


_IVF_INDEX_CACHE: dict[str, str] = {}


def q32_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF-indexed ANN: build (once per process) the spherical-k-means
    inverted-file index, then serve vec_id=0's top-10 neighbors.

    Probes ALL lists so the answer is the exact global top-k — that
    makes this entry DuckDB-oracleable and gates the whole
    build→partition→serve path; the pruned n_probes<n_lists mode (the
    at-scale point) is gated by the planted-cluster pytest
    (tests/test_similarity_ivf.py).  Ids only, same float-hash caveat
    as q11; the self-match rides at rank 1 (cos=1.0)."""
    import os
    import tempfile

    from event_deduplication_ray.stages.similarity import (
        ivf_index_build,
        ivf_topk,
    )

    n_lists = 16
    idx = _IVF_INDEX_CACHE.get(sf_dir)
    if idx is None or not os.path.isdir(idx):
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        idx = tempfile.mkdtemp(prefix="edr_ivf_idx_")
        ivf_index_build(emb, idx, n_lists=n_lists)
        _IVF_INDEX_CACHE[sf_dir] = idx
    out = ivf_topk(idx, _query_vec(sf_dir), k=10, n_probes=n_lists)
    return out[["vec_id"]]


def q26_embedding_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Narrow (id_a, id_b) projection: pair identity is the oracle-
    comparable part (cosine floats differ in last ulps across engines,
    same caveat as q11).  Returned as pandas — the near-dup pair set
    is small by construction, and Ray's to_pandas drops the schema of
    a 0-row Dataset, which would break the gate's column compare."""
    from event_deduplication_ray.stages.similarity import embedding_dup_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_dup_pairs(emb, QCFG, cos_threshold=0.99)
    df = out.select_columns(["id_a", "id_b"]).to_pandas()
    if list(df.columns) != ["id_a", "id_b"]:
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                           "id_b": pd.Series(dtype="int64")})
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------------ multimodal

def q29_media_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Media near-dup clusters (first-class multimodal dedup pass):
    perceptual fingerprint → Hamming buckets → CC, over a
    deterministic fake-media corpus sized from this tier's documents
    table.  Rows-only check — frame decoding isn't SQL-expressible
    (and the real codec is the declared stub integration point)."""
    from event_deduplication_ray.stages.multimodal import (
        make_fake_media_table,
        media_dup_clusters,
    )

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    t = make_fake_media_table(
        n_groups=int(max(4, min(64, n_docs // 25))), members=4,
        singletons=int(min(n_docs, 500)), seed=42,
    )
    # multiple input blocks so the fingerprint actor pool parallelizes
    # (one from_arrow table = one block = one actor fed)
    chunks = [
        pa.Table.from_batches([b], schema=t.schema)
        for b in t.to_batches(max_chunksize=max(64, len(t) // 8))
    ]
    out = media_dup_clusters(rd.from_arrow(chunks), QCFG, decoder="fake",
                             radius=3)
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


# ------------------------------------------------------------- flagship

def q27_flagship_dedup(sf_dir: str) -> Dataset:
    """Full flagship pipeline over the deterministic CC-style corpus
    derived from this sf tier's documents table → (url, cluster_id).

    The corpus is capped at 4 000 docs: this entry exists for the
    per-round correctness gate (rows-only — hash-seeded clusters have
    no SQL oracle), so it runs a SMALLER corpus than entry()/bench.py,
    which exercise the same pipeline at 1 k and 500 k docs."""
    from event_deduplication_ray import fixtures as F
    from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n = int(min(4000, max(500, 2 * n_docs)))
    corpus = F.materialize_corpus(
        "/tmp/edr_corpora", n, seed=42, base_texts=F.load_base_texts(sf_dir)
    )
    cfg = DedupConfig(use_substring=True, use_simhash=True)
    res = dedup_path(f"{corpus}/docs", cfg)
    asn = res.assignments

    def attach_url(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return l.merge(r, on="doc_id", how="inner")[["url", "cluster_id"]]

    from event_deduplication_ray.stages.shuffle import cogroup_apply

    urls = res.docs.select_columns(["doc_id", "url"])
    labels_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    return cogroup_apply(urls, asn, ["doc_id"], ["doc_id"],
                         cfg.join_num_partitions, attach_url,
                         right_schema=labels_schema)


_CHUNK_W = 10   # tokens per dedup chunk (q43)


def _doc_chunks(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Non-overlapping ``_CHUNK_W``-token chunks per doc (last partial
    window is its own chunk).  Returns (doc_row_idx, chunk_strings) —
    one entry per chunk occurrence, in document order."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    flat, lens = tokenize_offsets(texts.str.lower())
    if len(flat) == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    doc = np.repeat(np.arange(len(texts)), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(len(flat)) - np.repeat(starts, lens)
    cid = pos // _CHUNK_W
    chunks = pd.Series(flat).groupby([doc, cid], sort=False).agg(" ".join)
    di = chunks.index.get_level_values(0).to_numpy().astype(np.int64)
    return di, chunks.to_numpy(dtype=object)


def q43_chunk_dedup(sf_dir: str) -> Dataset:
    """CCNet/C4-style paragraph-level dedup at fixed granularity: the
    corpus's texts are newline-free token soup, so the 'paragraph'
    unit is a non-overlapping 10-token chunk.  A chunk is boilerplate
    if it occurs in >= 2 distinct docs; a doc is kept while dup chunks
    are <= half its chunks.  Output per doc: (doc_id, n_chunks,
    n_dup_chunks, keep) — n_chunks counts all occurrences, boilerplate
    membership counts distinct docs.

    Scale shape (the q33 decontamination pattern): pass 1 streams the
    corpus emitting per-batch DISTINCT (chunk_hash → partial doc
    count) rows — docs never span batches, so summing partials over a
    hash-partitioned combine is the exact distinct-doc count; the
    boilerplate set (hashes with count >= 2) is the genuinely small
    side and is broadcast once via ``ray.put``; pass 2 streams again
    flagging occurrences with ``np.isin``.  The shuffle carries one
    row per distinct chunk per batch, never one per token.  Parity
    caveat: the engine compares 64-bit chunk hashes, the oracle exact
    strings (same acceptance as q33)."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ray.put(_chunk_boiler_set(ds))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        bs = ray.get(ref)          # zero-copy numpy view from plasma
        n_chunks, n_dup = _chunk_dup_counts(df["text"], bs)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chunks": n_chunks,
            "n_dup_chunks": n_dup,
            "keep": (2 * n_dup <= n_chunks).astype(np.int64),
        })

    return ds.map_batches(flag, batch_format="pandas")


def _chunk_boiler_set(ds: Dataset) -> np.ndarray:
    """Sorted int64 hashes of chunks occurring in >= 2 distinct docs
    (q43 pass 1, shared with q46): per-batch distinct (chunk, doc)
    partials → hash-partitioned combine → small driver collect."""
    from event_deduplication_ray.functions.hashing import hash_strings_u64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        di, ch = _doc_chunks(df["text"].fillna(""))
        if len(ch) == 0:
            return pd.DataFrame({"h": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        h = (hash_strings_u64(ch) >> np.uint64(1)).astype(np.int64)
        vc = pd.DataFrame({"d": di, "h": h}).drop_duplicates()["h"].value_counts()
        return pd.DataFrame({"h": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False)["n"].sum()
        return g[g["n"] >= 2][["h"]]

    boiler = partition_apply(
        partials, ["h"], QCFG.join_num_partitions, combine
    ).to_pandas()
    bset = np.sort(boiler["h"].to_numpy(np.int64)) if len(boiler) \
        else np.empty(0, np.int64)
    return np.ascontiguousarray(bset)


def _chunk_dup_counts(texts: pd.Series,
                      bset: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n_chunks, n_dup_chunks) per doc against a boilerplate set."""
    from event_deduplication_ray.functions.hashing import hash_strings_u64

    di, ch = _doc_chunks(texts.fillna(""))
    n_chunks = np.zeros(len(texts), np.int64)
    n_dup = np.zeros(len(texts), np.int64)
    if len(ch):
        h = (hash_strings_u64(ch) >> np.uint64(1)).astype(np.int64)
        np.add.at(n_chunks, di, 1)
        np.add.at(n_dup, di, np.isin(h, bset).astype(np.int64))
    return n_chunks, n_dup


def q44_quality_outliers(sf_dir: str) -> Dataset:
    """Per-lang z-score outlier flagging on document length — the
    'statistical quality gate' step of a corpus pipeline (drop docs
    whose length is anomalous FOR THEIR LANGUAGE).  Two passes: tiny
    per-batch (lang, count, sum, sumsq) partials combine on the
    driver (one row per lang per batch — genuinely small), per-lang
    mean/stddev_pop broadcast, then a vectorized streaming flag pass.
    Float parity: sums of integer lengths are exact in float64; z is
    rounded to 6 dp on BOTH sides and ``outlier`` computed from the
    ROUNDED z (q11 convention).  std == 0 langs define z = 0."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    ref = ray.put(_lang_length_stats(ds))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        mu_d, sd_d = ray.get(ref)
        ln = df["text"].fillna("").str.len().to_numpy(np.int64)
        zr = _length_z(ln, df["lang"], mu_d, sd_d)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "lang": df["lang"],
            "n_chars": ln,
            "z": zr,
            "outlier": (np.abs(zr) > 2).astype(np.int64),
        })

    return ds.map_batches(flag, batch_format="pandas")


def _lang_length_stats(ds: Dataset) -> tuple[dict, dict]:
    """Per-lang (mean, stddev_pop) of text length (q44 pass 1, shared
    with q46): per-batch (lang, n, Σ, Σ²) partials — one row per lang
    per batch — combined on the driver.  Sums of integer lengths are
    exact in float64, so the moments match the oracle's."""

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        ln = df["text"].fillna("").str.len().astype(np.float64)
        g = pd.DataFrame({"lang": df["lang"], "ln": ln, "ln2": ln * ln})
        return g.groupby("lang", as_index=False).agg(
            n=("ln", "size"), s=("ln", "sum"), s2=("ln2", "sum"))

    sp = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    agg = sp.groupby("lang", as_index=False)[["n", "s", "s2"]].sum()
    mu = agg["s"] / agg["n"]
    sd = np.sqrt(np.maximum(agg["s2"] / agg["n"] - mu * mu, 0.0))
    return dict(zip(agg["lang"], mu)), dict(zip(agg["lang"], sd))


def _length_z(ln: np.ndarray, langs: pd.Series,
              mu_d: dict, sd_d: dict) -> np.ndarray:
    """z = (len - mean)/stddev per lang, 0 where stddev is 0, rounded
    to 6 dp (the compare-on-rounded convention)."""
    mus = langs.map(mu_d).to_numpy(np.float64)
    sds = langs.map(sd_d).to_numpy(np.float64)
    z = np.where(sds == 0, 0.0, (ln - mus) / np.where(sds == 0, 1.0, sds))
    return np.round(z, 6)


def q45_props_rollup(sf_dir: str) -> pd.DataFrame:
    """Semi-structured payload extraction + rollup: pull the integer
    field ``k`` out of the JSON ``props`` column and aggregate per
    event_type — the 'parse the crawl metadata sidecar' shape.  The
    extraction is a VECTORIZED regex over the whole batch
    (``str.extract``), not a per-row ``json.loads`` loop; the oracle
    uses DuckDB's real ``json_extract`` so the test proves the fast
    path agrees with a genuine JSON parser on this payload shape
    (flat object, int value; malformed/missing rows → NULL, excluded
    from sum/avg but counted in n_events on both sides)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])
    partial_schema = pa.schema([
        ("event_type", pa.string()), ("n_events", pa.int64()),
        ("n_k", pa.int64()), ("sum_k", pa.float64()),
    ])

    def partial(df: pd.DataFrame) -> pa.Table:
        k = df["props"].str.extract(
            r'"k"\s*:\s*(-?\d+)', expand=False).astype("float64")
        g = pd.DataFrame({"event_type": df["event_type"], "k": k})
        out = g.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), n_k=("k", "count"), sum_k=("k", "sum"))
        # explicit schema: empty batches must not emit null-typed cols
        return pa.Table.from_pandas(out, schema=partial_schema,
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False)[
            ["n_events", "n_k", "sum_k"]].sum()
        g["avg_k"] = np.round(g["sum_k"] / g["n_k"].replace(0, np.nan), 6)
        g["sum_k"] = g["sum_k"].astype(np.int64)
        g["n_events"] = g["n_events"].astype(np.int64)
        return g[["event_type", "n_events", "sum_k", "avg_k"]]

    out = partition_apply(
        parts, ["event_type"], QCFG.join_num_partitions, combine
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q46_curation(sf_dir: str) -> Dataset:
    """End-to-end corpus curation: the fused composition a real
    training-data pipeline runs as ONE job — Gopher repetition filter
    (q39) + per-lang length-outlier gate (q44) + chunk-boilerplate
    gate (q43) + exact text dedup (keep the min doc_id per identical
    text), with ``keep`` the conjunction.  Per-doc decision table out:
    (doc_id, lang, n_chars, rep_keep, outlier, chunk_keep, exact_dup,
    keep).

    Fusion shape: the two small gate inputs (per-lang length moments;
    chunk boilerplate hash set) are computed first — both are
    broadcast-sized — then ONE streaming pass tokenizes each doc ONCE
    and evaluates repetition fracs, z-score, and chunk-dup counts
    together (vs three separate text scans running q39+q43+q44
    back-to-back); exact dedup then shuffles only the compact
    per-doc flag table keyed by text hash (16 B of key per row, no
    text moves).  Docs with no tokens define rep_keep = 1 (nothing to
    measure) — spelled out in the oracle too.  Hash-vs-string parity
    acceptance as q33/q43 (text_hash stands in for text equality)."""
    import ray

    from event_deduplication_ray.functions.hashing import hash_strings_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    ref = ray.put((*_lang_length_stats(ds), _chunk_boiler_set(ds)))

    def features(df: pd.DataFrame) -> pd.DataFrame:
        mu_d, sd_d, bs = ray.get(ref)
        texts = df["text"].fillna("")
        rep = _rep_features(texts)
        top_r = rep["top_token_frac"].to_numpy()
        dis_r = rep["distinct_frac"].to_numpy()
        rep_keep = np.where(
            np.isnan(top_r), 1,
            (top_r <= 0.125) & (dis_r >= 0.35)).astype(np.int64)
        ln = texts.str.len().to_numpy(np.int64)
        zr = _length_z(ln, df["lang"], mu_d, sd_d)
        n_chunks, n_dup = _chunk_dup_counts(texts, bs)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "lang": df["lang"],
            "n_chars": ln,
            "rep_keep": rep_keep,
            "outlier": (np.abs(zr) > 2).astype(np.int64),
            "chunk_keep": (2 * n_dup <= n_chunks).astype(np.int64),
            "th": (hash_strings_u64(texts) >> np.uint64(1)).astype(np.int64),
        })

    feats = ds.map_batches(features, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        gmin = df.groupby("th")["doc_id"].transform("min")
        dup = (df["doc_id"] != gmin).astype(np.int64)
        out = df.drop(columns=["th"]).copy()
        out["exact_dup"] = dup
        out["keep"] = ((out["rep_keep"] == 1) & (out["outlier"] == 0)
                       & (out["chunk_keep"] == 1)
                       & (dup == 0)).astype(np.int64)
        return out

    return partition_apply(feats, ["th"], QCFG.join_num_partitions, finalize)


def q47_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact distinct-count per group (count(DISTINCT user_id) per
    event_type), distributed: per-batch distinct (event_type, user)
    pairs are the partial, ONE hash shuffle on user_id co-locates all
    of a user's rows (so the in-partition distinct is globally
    correct), per-partition counts sum on the driver.  The shuffle
    carries one 16 B row per distinct pair per batch — the exact
    baseline q48's sketch replaces when that's too many rows."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    p = ds.map_batches(pairs, batch_format="pandas")

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        return d.groupby("event_type", as_index=False).size().rename(
            columns={"size": "n_users"})

    parts = partition_apply(
        p, ["user_id"], QCFG.join_num_partitions, cnt
    ).to_pandas()
    out = parts.groupby("event_type", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q48_distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-count per group via a mergeable
    HyperLogLog sketch (p=12, ~1.6 % σ): each batch folds its users
    into ONE 4 KB register row per group, a hash-partitioned combine
    merges by elementwise max, and the estimate reads off the merged
    registers.  At billions of distincts per group this ships a
    constant 4 KB per (group, batch) where q47's exact path ships one
    row per distinct pair.  rows-only (approximate by construction);
    the error bound vs the exact q47 is pytest-gated
    (test_sketch.py)."""
    from event_deduplication_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    sketch_schema = pa.schema([("event_type", pa.string()),
                               ("regs", pa.binary())])

    def partial(df: pd.DataFrame) -> pa.Table:
        rows = []
        for et, sub in df.groupby("event_type"):      # few groups
            regs = hll_partial(sub["user_id"].to_numpy(np.int64))
            rows.append({"event_type": et, "regs": regs.tobytes()})
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["event_type", "regs"]),
            schema=sketch_schema, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, sub in df.groupby("event_type"):
            merged = hll_merge(
                [np.frombuffer(b, np.uint8) for b in sub["regs"]])
            out.append({"event_type": et,
                        "n_users_est": int(round(hll_estimate(merged)))})
        return pd.DataFrame(out, columns=["event_type", "n_users_est"])

    est = partition_apply(
        parts, ["event_type"], QCFG.join_num_partitions, combine
    ).to_pandas()
    est["n_users_est"] = est["n_users_est"].astype("int64")
    return est.sort_values("event_type").reset_index(drop=True)


def q49_funnel(sf_dir: str) -> Dataset:
    """Funnel / ordered-sequence detection: for every user with a
    'view', did a 'purchase' follow AT OR AFTER their first view, and
    how long did conversion take — the product-analytics shape that
    needs a user's whole event sequence in one place.  Irrelevant
    event types are pruned per batch BEFORE the one user_id shuffle
    (only view/purchase rows move); per partition everything is two
    vectorized groupby-mins.  secs_to_convert is µs-exact divided by
    1e6 then rounded to 6 dp (both engines divide the same integer,
    so the float64s are identical); never-converted users carry NaN =
    oracle NULL (q39 convention)."""
    import pyarrow.compute as pc

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    # Arrow filter, not pandas: a zero-row pandas block with an object
    # column breaks Ray's block-size estimation (np.vectorize on size-0)
    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array(["view", "purchase"])))

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("first_view", pa.string()),
                            ("converted", pa.int64()),
                            ("secs_to_convert", pa.float64())])

    def funnel(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        v = df[df["event_type"] == "view"].groupby("user_id")["ts"].min()
        p = df[df["event_type"] == "purchase"][["user_id", "ts"]]
        p = p.assign(fv=p["user_id"].map(v))
        p = p[p["ts"] >= p["fv"]]
        fp = p.groupby("user_id")["ts"].min()
        fv_us = v.to_numpy().astype("datetime64[us]").astype(np.int64)
        fp_al = fp.reindex(v.index)
        fp_us = fp_al.to_numpy().astype("datetime64[us]").astype(np.float64)
        conv = fp_al.notna().to_numpy()
        # NaT casts to int64 min, NOT NaN — mask explicitly
        secs = np.where(conv, np.round((fp_us - fv_us) / 1e6, 6), np.nan)
        return pa.Table.from_pandas(pd.DataFrame({
            "user_id": v.index.to_numpy(np.int64),
            "first_view": v.dt.strftime("%Y-%m-%d %H:%M:%S.%f").to_numpy(),
            "converted": conv.astype(np.int64),
            "secs_to_convert": secs,
        }), schema=out_schema, preserve_index=False)

    pruned = ev.map_batches(prune, batch_format="pyarrow")
    return partition_apply(pruned, ["user_id"], QCFG.join_num_partitions,
                           funnel, batch_format="pyarrow")


def q50_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3-style shipping priority: the big-big fact⋈fact join
    (orders ⋈ lineitem) as a hash-partitioned cogroup — neither fact
    is broadcast or collected.  customer IS a dim, so its segment
    custkeys ship once in the task closure; lineitem pre-aggregates
    revenue per orderkey inside the split wave (combiner) so only one
    row per (orderkey, batch) shuffles; top-10 is per-partition
    top-10 → driver merge of P×10 rows.  Reference analog: the
    dashboard join aggregates (SURVEY §2.8 Q5)."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    cut = pd.Timestamp("1998-01-01")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg = np.unique(
        cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
        ["c_custkey"].to_numpy())

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def ofilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
        t = t.filter(pa.array(np.isin(t["o_custkey"].to_numpy(), seg)))
        return t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    ofil = orders.map_batches(ofilt, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def lpart(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        ok = t["l_orderkey"].to_numpy()
        rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(uk))
        np.add.at(s, inv, rev)
        return pa.table({"l_orderkey": uk, "rev": s})

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    empty = {"l_orderkey": pd.Series(dtype="int64"),
             "revenue": pd.Series(dtype="float64"),
             "o_orderdate": pd.Series(dtype="object"),
             "o_orderpriority": pd.Series(dtype="object")}

    def join10(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        agg = r.groupby("l_orderkey", as_index=False)["rev"].sum()
        m = l.merge(agg, left_on="o_orderkey", right_on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        m["revenue"] = m["rev"].round(2)
        m["o_orderdate"] = m["o_orderdate"].dt.strftime("%Y-%m-%d")
        m = m.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(10)
        return m[list(empty)]

    df = cogroup_apply(ofil, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, join10).to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame(empty)
    return (df.sort_values(["revenue", "l_orderkey"],
                           ascending=[False, True])
            .head(10).reset_index(drop=True))


def q51_doc_sample(sf_dir: str) -> Dataset:
    """Deterministic hash-Bernoulli sample (~10 %): keep rows where
    fmix32(doc_id) < 0.1·2³² — no RNG state, no coordination, stable
    under re-runs/resume and refreshable per partition, the sampling
    primitive a 100 TB curation pipeline uses for eval subsets.  The
    hash is exact-integer SQL-expressible (see the oracle), so the
    engine and a warehouse select the SAME rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    thresh = 429496729  # floor(0.1 * 2**32)

    def f(t: pa.Table) -> pa.Table:
        h = H.sample_hash32(t["doc_id"].to_numpy())
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(f, batch_format="pyarrow")


def q52_lang_source_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(lang, source): the leaf (lang, source) level is
    the only distributed pass (per-batch partial → one combine); the
    lang subtotals and grand total are derived from the leaf table on
    the driver — at 100 TB the leaf is #langs × #sources rows, so the
    rollup levels are free.  NULL marks a rolled-up column (SQL
    ROLLUP convention)."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    leaf = grouped_aggregate(ds, ["lang", "source"],
                             [("n_docs", "count", "n_chars"),
                              ("sum_chars", "sum", "n_chars")])
    lang = leaf.groupby("lang", as_index=False)[["n_docs", "sum_chars"]].sum()
    lang["source"] = None
    total = pd.DataFrame({"lang": [None], "source": [None],
                          "n_docs": [leaf["n_docs"].sum()],
                          "sum_chars": [leaf["sum_chars"].sum()]})
    out = pd.concat([leaf, lang, total], ignore_index=True)[
        ["lang", "source", "n_docs", "sum_chars"]]
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out.reset_index(drop=True)


def q53_big_spenders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18-style groupby-HAVING on the big fact, then join back:
    lineitem pre-aggregates quantity per orderkey per batch
    (combiner), ONE hash shuffle combines and applies HAVING
    sum_qty > 170 per partition, and the survivors stream — still
    partitioned by orderkey — into a cogroup with orders (no driver
    collect of the qualifying set).  customer is the broadcast dim
    for c_name.  l_quantity is integral, so the float sums and the
    HAVING cut are exact on both engines."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    name_by_key = cust.set_index("c_custkey")["c_name"]

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qpart(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(uk))
        np.add.at(s, inv, t["l_quantity"].to_numpy())
        return pa.table({"l_orderkey": uk, "qty": s})

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=qpart)

    empty = {"c_name": pd.Series(dtype="object"),
             "c_custkey": pd.Series(dtype="int64"),
             "o_orderkey": pd.Series(dtype="int64"),
             "o_orderdate": pd.Series(dtype="object"),
             "o_totalprice": pd.Series(dtype="float64"),
             "sum_qty": pd.Series(dtype="float64")}

    def big(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        agg = r.groupby("l_orderkey", as_index=False)["qty"].sum()
        agg = agg[agg["qty"] > 170.0]
        m = l.merge(agg, left_on="o_orderkey", right_on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        m["c_name"] = m["o_custkey"].map(name_by_key)
        m["c_custkey"] = m["o_custkey"]
        m["o_orderdate"] = m["o_orderdate"].dt.strftime("%Y-%m-%d")
        m["sum_qty"] = m["qty"].round(2)
        return m[list(empty)]

    df = cogroup_apply(orders, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, big).to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame(empty)
    return (df.sort_values(["sum_qty", "o_orderkey"],
                           ascending=[False, True]).reset_index(drop=True))


def q54_neardup_decontaminate(sf_dir: str) -> Dataset:
    """Near-dup train/test decontamination: flag every TRAIN doc whose
    MinHash-estimated Jaccard against ANY TEST doc (test = doc_id %
    10 == 0, q33's held-out stand-in) reaches ``jaccard_match`` —
    catches lightly-edited / paraphrased benchmark leaks whose
    similarity survives at the set level even where q33's exact
    5-gram overlap is diluted.

    Scale shape: the test side is the genuinely small one (benchmark
    suites vs a 100 TB corpus), so its band-key → sig8-row index is
    built once and broadcast via ``ray.put``; the train side STREAMS —
    per batch, band membership is a searchsorted against the
    broadcast sorted key array, candidate (train, test) pairs dedupe
    locally, and the folded-signature Jaccard estimator (the flagship
    verify scorer, ``hashing.signature_jaccard`` semantics on sig8)
    decides the flag.  Zero shuffles beyond the signature pass.
    rows-only (MinHash is hash-seeded); gated by the planted-leak
    pytest (test_training_ops.py)."""
    import ray

    from event_deduplication_ray.stages.signatures import signature_stage
    from event_deduplication_ray.stages.verify import _fsl_matrix

    cfg = QCFG
    n_bands, n_perms = cfg.lsh_bands, cfg.num_perms
    sigs = signature_stage(_docs_from_documents(sf_dir), cfg)

    def test_rows(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        return t.filter(pa.array(did % 10 == 0)).select(
            ["doc_id", "band_keys", "sig8"])

    t_parts = [ray.get(r) for r in
               sigs.map_batches(test_rows, batch_format="pyarrow")
               .to_arrow_refs()]
    t_parts = [p for p in t_parts if p.num_rows]
    if t_parts:
        ttab = pa.concat_tables(t_parts)
        n_test = ttab.num_rows
        tkeys = _fsl_matrix(ttab["band_keys"], n_bands).reshape(-1)
        trow = np.repeat(np.arange(n_test, dtype=np.int64), n_bands)
        order = np.argsort(tkeys, kind="stable")
        index = (tkeys[order], trow[order],
                 np.ascontiguousarray(_fsl_matrix(ttab["sig8"], n_perms)))
    else:
        index = (np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty((0, n_perms), np.uint8))
    idx_ref = ray.put(index)
    thresh = cfg.jaccard_match

    def flag_batch(t: pa.Table) -> pa.Table:
        keys_s, rows_s, tsig = ray.get(idx_ref)
        did_all = t["doc_id"].to_numpy()
        tt = t.filter(pa.array(did_all % 10 != 0))
        did = tt["doc_id"].to_numpy()
        n = len(did)
        flags = np.zeros(n, dtype=np.int64)
        out = lambda: pa.table({"doc_id": pa.array(did, pa.int64()),  # noqa: E731
                                "contaminated": pa.array(flags)})
        if n == 0 or len(keys_s) == 0:
            return out()
        bk = _fsl_matrix(tt["band_keys"], n_bands).reshape(-1)
        lo = np.searchsorted(keys_s, bk, side="left")
        cnt = np.searchsorted(keys_s, bk, side="right") - lo
        hit = cnt > 0
        if not hit.any():
            return out()
        tr_pos = np.repeat(np.arange(n, dtype=np.int64), n_bands)[hit]
        starts, counts = lo[hit], cnt[hit]
        total = int(counts.sum())
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        flat_idx = (np.arange(total, dtype=np.int64)
                    - np.repeat(offs, counts) + np.repeat(starts, counts))
        pair = np.repeat(tr_pos, counts) * len(tsig) + rows_s[flat_idx]
        upair = np.unique(pair)
        ptr, pte = upair // len(tsig), upair % len(tsig)
        sig_tr = _fsl_matrix(tt["sig8"], n_perms)[ptr]
        sim = (sig_tr == tsig[pte]).mean(axis=1)
        flags[ptr[sim >= thresh]] = 1
        return out()

    return sigs.map_batches(flag_batch, batch_format="pyarrow")


def q55_regional_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5-style multi-way join: revenue per nation for one
    region/year where the order's customer and the line's supplier
    share a nation.  Scale shape: region / nation / customer /
    supplier are DIMS — their key→nation maps ship once in the task
    closures; the only big-big exchange is orders ⋈ lineitem, the
    same hash-partitioned orderkey cogroup as q50.  lineitem
    pre-aggregates revenue per (orderkey, supp_nation) inside the
    split wave, the cogroup keeps cust_nation == supp_nation rows,
    and only #nations-row partials per partition reach the driver.
    Reference analog: dashboard join aggregates (SURVEY §2.8 Q5)."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    in_region = nation[nation["n_regionkey"] == rkey]
    name_by_nk = in_region.set_index("n_nationkey")["n_name"]

    def _key_to_nation(tab: pa.Table, key: str, nk: str):
        df = tab.to_pandas()
        df = df[df[nk].isin(name_by_nk.index)]
        keys = df[key].to_numpy(np.int64)
        order = np.argsort(keys)
        return keys[order], df[nk].to_numpy(np.int64)[order]

    ck, cn = _key_to_nation(
        pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    sk, sn = _key_to_nation(
        pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                             pc.less(t["o_orderdate"], pa.scalar(hi))))
        keys = t["o_custkey"].to_numpy()
        pos = np.searchsorted(ck, keys)
        pos = np.minimum(pos, max(len(ck) - 1, 0))
        hit = (len(ck) > 0) & (ck[pos] == keys) if len(ck) else np.zeros(len(keys), bool)
        t = t.filter(pa.array(hit))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "cust_nation": pa.array(cn[pos[hit]] if len(ck)
                                                 else np.empty(0, np.int64))})

    ofil = orders.map_batches(ofilt, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        keys = t["l_suppkey"].to_numpy()
        pos = np.searchsorted(sk, keys)
        pos = np.minimum(pos, max(len(sk) - 1, 0))
        hit = (len(sk) > 0) & (sk[pos] == keys) if len(sk) else np.zeros(len(keys), bool)
        t = t.filter(pa.array(hit))
        ok = t["l_orderkey"].to_numpy()
        nk = sn[pos[hit]]
        rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        comb = ok * 32 + nk  # nationkey < 25 fits 5 bits
        uk, inv = np.unique(comb, return_inverse=True)
        s = np.zeros(len(uk))
        np.add.at(s, inv, rev)
        return pa.table({"l_orderkey": uk // 32, "supp_nation": uk % 32,
                         "rev": s})

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    def npart(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"nk": pd.Series(dtype="int64"),
                                 "rev": pd.Series(dtype="float64")})
        m = l.merge(r, left_on=["o_orderkey", "cust_nation"],
                    right_on=["l_orderkey", "supp_nation"])
        g = m.groupby("cust_nation", as_index=False)["rev"].sum()
        return g.rename(columns={"cust_nation": "nk"})

    parts = cogroup_apply(ofil, li_sh, ["o_orderkey"], ["l_orderkey"],
                          QCFG.join_num_partitions, npart).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "revenue": pd.Series(dtype="float64")})
    tot = parts.groupby("nk", as_index=False)["rev"].sum()
    tot["n_name"] = tot["nk"].map(name_by_nk)
    tot["revenue"] = tot["rev"].round(2)
    return (tot[["n_name", "revenue"]]
            .sort_values(["revenue", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


def q56_split_assign(sf_dir: str) -> pd.DataFrame:
    """Deterministic 80/10/10 train/val/test split assignment —
    fmix32(doc_id) range → split label, no RNG state, stable under
    re-runs and refreshable per shard (the split primitive a training
    corpus uses so every pipeline stage agrees on membership).  The
    per-(split, lang) counts are a per-batch partial → tiny driver
    combine; the hash is exact-integer SQL-expressible, so engine and
    warehouse assign the SAME rows."""
    T_TRAIN = 3435973836  # floor(0.8 * 2**32)
    T_VAL = 3865470566    # floor(0.9 * 2**32)
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        h = H.sample_hash32(t["doc_id"].to_numpy())
        split = np.where(h < T_TRAIN, "train",
                         np.where(h < T_VAL, "val", "test"))
        return pa.table({"split": pa.array(split), "lang": t["lang"],
                         "doc_id": t["doc_id"]})

    out = grouped_aggregate(ds.map_batches(assign, batch_format="pyarrow"),
                            ["split", "lang"],
                            [("n_docs", "count", "doc_id")])
    return (out.sort_values(["split", "lang"]).reset_index(drop=True))


def q57_len_token_corr(sf_dir: str) -> pd.DataFrame:
    """Per-lang Pearson correlation between stored length and token
    count — the distributed MERGEABLE-moments pattern: each batch
    emits (lang, n, mean_x, mean_y, M2x, M2y, Cxy) centered partials
    and the driver folds them with the Chan/Welford pairwise-merge
    update, so the result is numerically stable (no raw Σx² blowup)
    and exact regardless of batch order.  The shuffle carries one row
    per (lang, batch)."""
    ds = _read(sf_dir, "documents", ["text", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_pandas(),
            "x": t["n_chars"].to_numpy().astype(np.float64),
            "y": TS.token_counts(t["text"].to_pandas()).astype(np.float64),
        })
        rows = []
        for lang, g in df.groupby("lang"):
            x, y = g["x"].to_numpy(), g["y"].to_numpy()
            mx, my = x.mean(), y.mean()
            rows.append((lang, len(g), mx, my,
                         ((x - mx) ** 2).sum(), ((y - my) ** 2).sum(),
                         ((x - mx) * (y - my)).sum()))
        return pa.table(dict(zip(
            ["lang", "n", "mean_x", "mean_y", "m2x", "m2y", "cxy"],
            map(list, zip(*rows)) if rows else [[]] * 7)))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for lang, g in parts.groupby("lang"):
        n, mx, my, m2x, m2y, cxy = 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
        for r in g.itertuples(index=False):
            nn = n + r.n
            dx, dy = r.mean_x - mx, r.mean_y - my
            m2x += r.m2x + dx * dx * n * r.n / nn
            m2y += r.m2y + dy * dy * n * r.n / nn
            cxy += r.cxy + dx * dy * n * r.n / nn
            mx += dx * r.n / nn
            my += dy * r.n / nn
            n = nn
        denom = np.sqrt(m2x * m2y)
        corr = cxy / denom if denom > 0 else np.nan
        out.append((lang, int(n), round(corr, 6)))
    return (pd.DataFrame(out, columns=["lang", "n_docs", "corr_len_tokens"])
            .sort_values("lang").reset_index(drop=True))


def q58_first_events(sf_dir: str) -> pd.DataFrame:
    """Keep-first dedup: the earliest event per (user_id, event_type)
    with a deterministic event_id tie-break — the 'first occurrence
    wins' policy of event/log dedup.  Per-batch argmin partial keeps
    one candidate row per (user, type) per batch, so ONE user_id
    shuffle carries at most #groups × #batches rows; the partition
    pass takes the final argmin.  Reference analog: idempotency-key
    dedup on ingest (SURVEY §2.1 S2)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    keys = ["user_id", "event_type"]
    order = keys + ["ts", "event_id"]

    def first_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order).groupby(keys, as_index=False).head(1)

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(first_rows(t.to_pandas()),
                                    preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = first_rows(df)
        df["ts"] = df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return df[["user_id", "event_type", "event_id", "ts"]]

    out = partition_apply(ds, ["user_id"], QCFG.join_num_partitions,
                          final, pre_fn=partial).to_pandas()
    return out.sort_values(keys).reset_index(drop=True)


def q59_normalized_dedup(sf_dir: str) -> Dataset:
    """C4-style normalized exact dedup: dedup AFTER case-folding,
    punctuation-strip, and whitespace-collapse — catches trivially
    reformatted web-text copies that byte-exact dedup (q10) misses.
    Same scale shape as q10: the normalization + hash + partial group
    run per batch, so ONE hash shuffle carries only the compact
    (hash, min_id, count) table.  The ASCII-explicit character class
    keeps the Python-re and DuckDB-RE2 normalizations identical."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        norm = (df["text"].fillna("").str.lower()
                .str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip())
        df = df.assign(text_hash=H.hash_strings_u64(norm).astype(np.int64))
        return df.groupby("text_hash", as_index=False).agg(
            rep_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text_hash", as_index=False).agg(
            rep_doc_id=("rep_doc_id", "min"), n_copies=("n_copies", "sum"))
        return g[["rep_doc_id", "n_copies"]]

    return partition_apply(parts, ["text_hash"], QCFG.join_num_partitions,
                           combine)


def q60_gap_quantiles(sf_dir: str) -> pd.DataFrame:
    """Inter-event-gap quantiles per event type: the lag-window +
    exact-histogram composition.  ONE user_id shuffle orders each
    user's events and emits per-partition (event_type, gap_s) VALUE
    COUNTS (gap attributed to the later event; floor seconds computed
    in exact integer µs so Ray and SQL agree); a second tiny shuffle
    on event_type combines histograms and reads the quantiles off the
    cumulative counts (q34's percentile_disc machinery).  The second
    shuffle carries one row per distinct (type, gap) per partition,
    never one per event."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        same = np.zeros(len(df), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = np.zeros(len(df), np.int64)
        gap[1:] = us[1:] - us[:-1]
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "gap_s": gap // 1_000_000})[same]
        out = g.groupby(["event_type", "gap_s"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = partition_apply(ds, ["user_id"], QCFG.join_num_partitions, gaps)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "gap_s"], as_index=False)["n"].sum()
        rows = []
        for et, sub in g.groupby("event_type"):
            sub = sub.sort_values("gap_s")
            vals = sub["gap_s"].to_numpy()
            cum = np.cumsum(sub["n"].to_numpy())
            total = int(cum[-1])
            row = {"event_type": et}
            for name, num, den in _QUANTILES:
                k = (num * total + den - 1) // den
                row[name] = int(vals[np.searchsorted(cum, max(k, 1))])
            rows.append(row)
        return pd.DataFrame(rows)

    out = partition_apply(parts, ["event_type"], QCFG.join_num_partitions,
                          combine).to_pandas()
    for c in ("p50", "p90", "p99"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q61_view_attribution(sf_dir: str) -> pd.DataFrame:
    """Range (band) join: attribute each purchase to every view by
    the same user in the preceding hour — the interval-join shape Ray
    Data has no native operator for.  Composition: Arrow-prune to the
    two relevant types, ONE user_id shuffle co-locates each user's
    rows, and per partition a sorted searchsorted pair enumerates
    matches vectorized (two binary searches per purchase, flat-index
    expansion — no per-row loop, no cross join).  Output size is
    bounded by the window width; the partitioning assumption is that
    one user's events fit a partition (same as q14/q49).  secs_before
    divides the exact integer µs difference, so Ray and SQL produce
    identical float64s.  Returned as pandas with the q26 empty-schema
    fallback (Ray's to_pandas drops a 0-row Dataset's schema)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    window_us = 3_600_000_000  # 1 hour

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array(["view", "purchase"])))

    out_schema = pa.schema([("purchase_id", pa.int64()),
                            ("view_id", pa.int64()),
                            ("secs_before", pa.float64())])

    def attrib(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if len(df) == 0:
            return out_schema.empty_table()
        # q41's shifted-timeline trick: map each user's µs timeline
        # onto a disjoint int64 range (margin > window) so ONE pair of
        # searchsorted calls finds every purchase's view window — no
        # per-user or per-purchase Python loop
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        codes = pd.factorize(df["user_id"], sort=False)[0].astype(np.int64)
        span = (ts_us.max() - ts_us.min()) + window_us + 2
        key = (ts_us - ts_us.min()) + codes * span
        et = df["event_type"].to_numpy()
        eid = df["event_id"].to_numpy()
        is_v, is_p = et == "view", et == "purchase"
        vo = np.argsort(key[is_v], kind="stable")
        v_key, v_eid, v_ts = key[is_v][vo], eid[is_v][vo], ts_us[is_v][vo]
        p_key, p_eid, p_ts = key[is_p], eid[is_p], ts_us[is_p]
        # v.ts > p.ts - 1h (strict) and v.ts <= p.ts (inclusive)
        lo = np.searchsorted(v_key, p_key - window_us, side="right")
        hi = np.searchsorted(v_key, p_key, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        flat = (np.arange(total, dtype=np.int64)
                - np.repeat(offs, counts) + np.repeat(lo, counts))
        secs = np.round((np.repeat(p_ts, counts) - v_ts[flat]) / 1e6, 6)
        return pa.table({"purchase_id": np.repeat(p_eid, counts),
                         "view_id": v_eid[flat], "secs_before": secs},
                        schema=out_schema)

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    df = partition_apply(pruned, ["user_id"], QCFG.join_num_partitions,
                         attrib, batch_format="pyarrow").to_pandas()
    if list(df.columns) != ["purchase_id", "view_id", "secs_before"]:
        df = pd.DataFrame({"purchase_id": pd.Series(dtype="int64"),
                           "view_id": pd.Series(dtype="int64"),
                           "secs_before": pd.Series(dtype="float64")})
    return df.sort_values(["purchase_id", "view_id"]).reset_index(drop=True)


def q62_event_debounce(sf_dir: str) -> pd.DataFrame:
    """Windowed debounce dedup (streaming-shaped): drop an event that
    lands within 5 minutes of the PREVIOUS event of the same
    (user, type) — log/telemetry de-noising.  Unlike q58's argmin,
    kept-ness depends on the immediate neighbor, so no per-batch
    partial is possible: ONE user_id shuffle moves the (already
    narrow) rows, then a vectorized lag-diff per partition.  Exact
    integer µs comparison keeps Ray and the SQL lag window
    bit-identical, including equal-timestamp ties (diff 0 → dropped,
    event_id orders the peers)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    gap_us = 300_000_000  # 5 minutes

    def debounce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        keep = np.ones(len(df), dtype=bool)
        same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        keep[1:] = ~same | (us[1:] - us[:-1] > gap_us)
        out = df[keep].copy()
        out["ts"] = out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return out[["user_id", "event_type", "event_id", "ts"]]

    out = partition_apply(ds, ["user_id"], QCFG.join_num_partitions,
                          debounce).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "event_type": pd.Series(dtype="object"),
                            "event_id": pd.Series(dtype="int64"),
                            "ts": pd.Series(dtype="object")})
    return (out.sort_values(["user_id", "event_type", "event_id"])
            .reset_index(drop=True))


def q63_line_filter(sf_dir: str) -> Dataset:
    """C4-style line-level cleaning stats: split each doc into lines,
    keep a line iff it has >= 4 tokens, contains no '{' (code smell),
    and either ends in terminal punctuation or is a long (>= 20
    token) paragraph — the classic boilerplate-line gate.  Fully
    vectorized explode (np.repeat doc ids, pandas str kernels per
    line), no per-row Python; at 100 TB this is a pure map stage —
    nothing shuffles.  Lines are trimmed of SPACES only so the
    Python and DuckDB trim() semantics match byte-for-byte."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"].fillna("").str.split("\n")
        n_lines = lines.str.len().to_numpy(np.int64)
        doc_id = np.repeat(df["doc_id"].to_numpy(np.int64), n_lines)
        flat = pd.Series(
            np.concatenate([np.asarray(v, dtype=object) for v in lines])
            if len(lines) else np.array([], dtype=object)
        ).str.strip(" ")
        n_tok = flat.str.count(r"\S+").to_numpy(np.int64)
        keep = (
            (n_tok >= 4)
            & ~flat.str.contains("{", regex=False).to_numpy()
            & (flat.str.contains(r'[.!?"]$', regex=True).to_numpy()
               | (n_tok >= 20))
        )
        kept_chars = np.where(keep, flat.str.len().to_numpy(np.int64), 0)
        per_line = pd.DataFrame({"doc_id": doc_id,
                                 "keep": keep.astype(np.int64),
                                 "kept_chars": kept_chars})
        g = per_line.groupby("doc_id", as_index=False).agg(
            n_kept=("keep", "sum"), kept_chars=("kept_chars", "sum"))
        per_doc = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                                "n_lines": n_lines})
        g = per_doc.merge(g, on="doc_id", how="left")
        for c in ("n_kept", "kept_chars"):
            g[c] = g[c].fillna(0).astype(np.int64)
        return g[["doc_id", "n_lines", "n_kept", "kept_chars"]]

    return ds.map_batches(f, batch_format="pandas")


def q64_bigram_lm(sf_dir: str) -> pd.DataFrame:
    """Corpus bigram-LM quality score (CCNet-style perplexity proxy):
    pass 1 counts unigrams + bigrams (per-batch value_counts partials
    → hash-partitioned combine, so the shuffle carries one row per
    DISTINCT ngram per batch); pass 2 broadcasts the model once
    (ray.put; natural-language vocab is bounded — at open-web scale
    prune to top-K ngrams or swap the lookup for a cogroup join) and
    scores each doc as the mean add-one-smoothed log-probability
    mean_i ln((c(w_{i-1} w_i)+1) / (c(w_{i-1})+V)).  Tokenization is
    lower + whitespace, identical to the DuckDB oracle's
    regexp_extract_all(lower(text), '\\S+')."""
    import ray

    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_frame(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        if n < 2:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "w1": pd.Series(dtype="object"),
                                 "w2": pd.Series(dtype="object")})
        start_ok = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        start_ok[ends[lens > 0] - 1] = False
        idx = np.flatnonzero(start_ok[:-1])
        doc_of = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        return pd.DataFrame({"doc_id": doc_of[idx],
                             "w1": flat[idx], "w2": flat[idx + 1]})

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        uni = pd.Series(flat).value_counts()
        bg = bigram_frame(df)
        bc = bg.groupby(["w1", "w2"], as_index=False).size()
        u = pd.DataFrame({"w1": uni.index.to_numpy(dtype=object),
                          "w2": "", "n": uni.to_numpy(np.int64),
                          "kind": "u"})
        b = pd.DataFrame({"w1": bc["w1"], "w2": bc["w2"],
                          "n": bc["size"].astype(np.int64), "kind": "b"})
        return pd.concat([u, b], ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["kind", "w1", "w2"], as_index=False)["n"].sum()

    counts = partition_apply(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["w1"], QCFG.join_num_partitions, combine,
    ).to_pandas()
    uni = counts[counts["kind"] == "u"].set_index("w1")["n"]
    big = counts[counts["kind"] == "b"].set_index(["w1", "w2"])["n"]
    v = int(len(uni))
    model_ref = ray.put((uni, big, v))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        u, b, vv = ray.get(model_ref)
        bg = bigram_frame(df)
        if not len(bg):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_bigrams": pd.Series(dtype="int64"),
                                 "lm_score": pd.Series(dtype="float64")})
        cb = b.reindex(pd.MultiIndex.from_arrays(
            [bg["w1"], bg["w2"]])).to_numpy(np.float64)
        cu = u.reindex(bg["w1"]).to_numpy(np.float64)
        bg["lnp"] = np.log((cb + 1.0) / (cu + vv))
        g = bg.groupby("doc_id", as_index=False).agg(
            n_bigrams=("lnp", "size"), lm_score=("lnp", "mean"))
        g["n_bigrams"] = g["n_bigrams"].astype(np.int64)
        g["lm_score"] = g["lm_score"].round(6)
        return g

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q65_quantile_gate(sf_dir: str) -> pd.DataFrame:
    """Percentile-threshold quality gate: per-lang exact p10 of token
    count, then how many docs pass (tokens >= p10) — the 'drop the
    shortest decile per language' mixture-control step.  Token counts
    are small bounded ints, so the q34 exact-histogram pattern
    applies: per-batch (lang, n_tok) value counts shuffle (one row
    per distinct count per batch), threshold AND the kept-count both
    read off the same cumulative histogram — no second pass over the
    data.  p10 matches DuckDB percentile_disc's exact-decimal
    ceil(p*n) via (n + 9) // 10."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "lang": df["lang"],
            "n_tok": TS.token_counts(df["text"]),
        })
        out = g.groupby(["lang", "n_tok"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_tok"], as_index=False)["n"].sum()
        rows = []
        for lang, sub in g.groupby("lang"):
            sub = sub.sort_values("n_tok")
            vals = sub["n_tok"].to_numpy()
            cnts = sub["n"].to_numpy()
            cum = np.cumsum(cnts)
            total = int(cum[-1])
            k = max((total + 9) // 10, 1)          # ceil(0.1 * n), exact
            ti = int(np.searchsorted(cum, k))
            thr = int(vals[ti])
            n_kept = int(cnts[ti:].sum())           # tokens >= thr
            rows.append((lang, thr, total, n_kept))
        return pd.DataFrame(rows, columns=["lang", "p10_tokens",
                                           "n_docs", "n_kept"])

    out = partition_apply(
        parts, ["lang"], QCFG.join_num_partitions, combine
    ).to_pandas()
    for c in ("p10_tokens", "n_docs", "n_kept"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q66_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Greedy sequence packing (pretraining batch prep): within each
    lang, docs in doc_id order are packed into contiguous bins of at
    most 512 tokens; a doc that would overflow starts the next pack
    (an oversized single doc gets its own pack).  Token counts ride a
    narrow per-batch map, ONE lang shuffle moves (doc_id, lang,
    n_tok), and the per-partition packer is O(n_packs · log n) —
    cumsum + searchsorted per pack boundary, no per-doc Python loop.
    Greedy reset-cumsum is inherently sequential, so this is
    rows-only (pytest invariants: budget respected, order preserved,
    packing maximal)."""
    budget = 512
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def narrow(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "lang": df["lang"],
            "n_tok": TS.token_counts(df["text"]),
        })

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        pack_id = np.zeros(len(df), dtype=np.int64)
        for _, idx in df.groupby("lang", sort=False).indices.items():
            tok = df["n_tok"].to_numpy()[idx]
            cum = np.cumsum(tok)
            s, pid = 0, 0
            while s < len(idx):
                base = cum[s - 1] if s else 0
                # furthest j with cum[j] - base <= budget; always >= s
                j = int(np.searchsorted(cum, base + budget, side="right"))
                j = max(j, s + 1)
                pack_id[idx[s:j]] = pid
                s, pid = j, pid + 1
        out = df[["doc_id", "lang", "n_tok"]].copy()
        out["pack_id"] = pack_id
        return out

    out = partition_apply(ds.map_batches(narrow, batch_format="pandas"),
                          ["lang"], QCFG.join_num_partitions, pack).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "lang": pd.Series(dtype="object"),
                            "n_tok": pd.Series(dtype="int64"),
                            "pack_id": pd.Series(dtype="int64")})
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def q67_head_dedup(sf_dir: str) -> Dataset:
    """Head-fingerprint dedup with source-priority keep: group docs by
    their first-8-token prefix (boilerplate-header duplicates) and
    keep ONE doc per group — lowest source priority (numeric suffix
    of 'srcN') then lowest doc_id — the multi-source curation policy
    of 'prefer the cleaner feed when both carry the page'.  Same
    compact shape as q10: the prefix hashes per batch, a per-batch
    argmin partial keeps one candidate + count, and ONE hash shuffle
    carries (hash, best_prio, best_doc, best_source, n) rows only."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        head = (df["text"].fillna("").str.lower()
                .str.findall(r"\S+").str[:8].str.join(" "))
        prio = df["source"].str[3:].astype(np.int64)
        g = pd.DataFrame({
            "key": H.hash_strings_u64(head).astype(np.int64),
            "prio": prio,
            "doc_id": df["doc_id"].astype(np.int64),
            "source": df["source"],
        })
        g = g.sort_values(["key", "prio", "doc_id"])
        best = g.groupby("key", as_index=False).first()
        best["n_group"] = g.groupby("key").size().to_numpy(np.int64)
        return best

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "prio", "doc_id"])
        best = df.groupby("key", as_index=False).first()
        best["n_group"] = df.groupby("key")["n_group"].sum().to_numpy(np.int64)
        return best[["doc_id", "source", "n_group"]]

    return partition_apply(parts, ["key"], QCFG.join_num_partitions, combine)


def q68_global_rank(sf_dir: str) -> pd.DataFrame:
    """Distributed global rank + ntile WITHOUT a global sort barrier:
    rank docs by (n_chars, doc_id) and assign 8 ntile buckets — the
    range-partitioned-output / percentile-rank primitive.  Because the
    sort key's first component is a bounded int, pass 1 builds its
    exact histogram (per-batch value counts → tiny driver combine →
    ray.put broadcast of the cum-below offsets), and pass 2 shuffles
    ONCE on n_chars so each tie group co-locates: global rank =
    cum_below[n_chars] + rank-within-tie(doc_id).  The bucket formula
    reproduces SQL ntile exactly (first n%k buckets get ceil(n/k)
    rows).  At 100 TB nothing materializes but the histogram (one row
    per distinct key value)."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def hpart(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = (ds.map_batches(hpart, batch_format="pandas").to_pandas()
            .groupby("n_chars", as_index=False)["n"].sum()
            .sort_values("n_chars").reset_index(drop=True))
    n_total = int(hist["n"].sum())
    cum_below = pd.Series(
        np.concatenate([[0], np.cumsum(hist["n"].to_numpy())[:-1]]),
        index=hist["n_chars"].to_numpy(),
    )
    k = 8
    q, rem = divmod(n_total, k)
    off_ref = ray.put(cum_below)

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        local = df.groupby("n_chars").cumcount().to_numpy(np.int64) + 1
        rnk = off.reindex(df["n_chars"]).to_numpy(np.int64) + local
        big = q + 1
        cut = rem * big
        bucket = np.where(
            rnk <= cut,
            (rnk - 1) // big + 1,
            rem + (np.maximum(rnk - cut, 1) - 1) // max(q, 1) + 1,
        ).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                             "n_chars": df["n_chars"].astype(np.int64),
                             "rnk": rnk, "bucket": bucket})

    out = partition_apply(ds, ["n_chars"], QCFG.join_num_partitions,
                          rank_part).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame({c: pd.Series(dtype="int64")
                            for c in ("doc_id", "n_chars", "rnk", "bucket")})
    return out.sort_values("doc_id").reset_index(drop=True)


def q69_top_bigrams_mg(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries approximate heavy hitters — the bounded-memory
    scale path for q35's exact top-bigram count: each batch keeps at
    most 4096 decremented counters (one MG summary per batch), the
    combine sums summaries per key and the final prune re-applies the
    MG decrement, carrying the accumulated error bound.  Guarantee:
    est <= true <= est + err for every surviving key, so any bigram
    whose true count exceeds err is present.  Rows-only (approximate
    by design); test_training_ops gates it against exact q35 counts."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    cap = 4096
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        if n < 2:
            return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "err": pd.Series(dtype="int64")})
        start_ok = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        start_ok[ends[lens > 0] - 1] = False
        idx = np.flatnonzero(start_ok[:-1])
        vc = pd.Series(flat[idx] + " " + flat[idx + 1]).value_counts()
        err = 0
        if len(vc) > cap:
            dec = int(vc.iloc[cap])        # (cap+1)-th largest
            vc = vc.iloc[:cap] - dec
            vc = vc[vc > 0]
            err = dec
        # a real bigram always contains a space, so "" is a safe
        # sentinel key carrying this batch's decrement
        return pd.DataFrame({
            "ngram": np.concatenate([vc.index.to_numpy(dtype=object),
                                     np.array([""], dtype=object)]),
            "n": np.concatenate([vc.to_numpy(np.int64),
                                 np.array([err], dtype=np.int64)]),
        })

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("ngram", as_index=False)["n"].sum()

    g = partition_apply(parts, ["ngram"], QCFG.join_num_partitions,
                        combine).to_pandas()
    if not len(g):
        return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                             "n_est": pd.Series(dtype="int64"),
                             "err_bound": pd.Series(dtype="int64")})
    sent = g["ngram"] == ""
    err_total = int(g.loc[sent, "n"].sum())
    g = g[~sent]
    if len(g) > cap:
        g = g.sort_values(["n", "ngram"], ascending=[False, True])
        dec = int(g["n"].iloc[cap])
        g = g.iloc[:cap].assign(n=g["n"].iloc[:cap] - dec)
        g = g[g["n"] > 0]
        err_total += dec
    out = (g.sort_values(["n", "ngram"], ascending=[False, True]).head(20)
           .rename(columns={"n": "n_est"}))
    out["n_est"] = out["n_est"].astype("int64")
    out["err_bound"] = np.int64(err_total)
    return out.reset_index(drop=True)


def q70_rolling_distinct(sf_dir: str) -> pd.DataFrame:
    """7-day rolling distinct users (WAU): for every OBSERVED day,
    the count of distinct users active in [day-6, day].  Rolling
    DISTINCT doesn't decompose like a sum, so the scale trick is
    bounded expansion: per-batch distinct (day, user) pairs explode
    to the ≤ 7 observed window days they contribute to (the tiny
    sorted day vocabulary is broadcast once), then ONE
    (window_day, user) hash shuffle dedupes pairs globally and counts
    per day — the shuffle carries at most 7 rows per distinct
    (day, user), never one per event."""
    import ray

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def day_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "day": df["ts"].dt.strftime("%Y-%m-%d"),
            "user_id": df["user_id"].astype(np.int64),
        })
        return out.drop_duplicates()

    pairs = ds.map_batches(day_pairs, batch_format="pandas")
    days = np.sort(pairs.select_columns(["day"]).to_pandas()["day"].unique())
    days_ref = ray.put(days)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        dv = ray.get(days_ref)
        if not len(df):
            return pd.DataFrame({"day": pd.Series(dtype="object"),
                                 "user_id": pd.Series(dtype="int64")})
        d64 = df["day"].to_numpy().astype("datetime64[D]")
        dv64 = dv.astype("datetime64[D]")
        lo = np.searchsorted(dv64, d64, side="left")
        hi = np.searchsorted(dv64, d64 + np.timedelta64(6, "D"),
                             side="right")
        reps = hi - lo
        idx = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]) \
            if reps.sum() else np.array([], dtype=np.int64)
        return pd.DataFrame({
            "day": dv[idx],
            "user_id": np.repeat(df["user_id"].to_numpy(np.int64), reps),
        })

    exploded = pairs.map_batches(expand, batch_format="pandas")

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        g = d.groupby("day", as_index=False).size()
        return g.rename(columns={"size": "wau"})

    parts = partition_apply(exploded, ["day", "user_id"],
                            QCFG.join_num_partitions, count_part).to_pandas()
    if not len(parts):
        return pd.DataFrame({"day": pd.Series(dtype="object"),
                             "wau": pd.Series(dtype="int64")})
    out = parts.groupby("day", as_index=False)["wau"].sum()
    out["wau"] = out["wau"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def q71_vocab(sf_dir: str) -> pd.DataFrame:
    """Corpus vocabulary build: token → frequency → dense global id
    ordered by (freq desc, token asc), min-count 5 — the id-assignment
    step of tokenizer/vocab construction.  Token count partials
    shuffle once on the token hash (one row per distinct token per
    batch); the global rank reuses q68's no-sort-barrier shape: the
    FREQUENCY histogram (tiny — one row per distinct freq) broadcasts
    cum-below offsets, a second shuffle on freq co-locates each tie
    group, and token_id = offset + rank-within-freq(token)."""
    import ray

    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["text"])
    min_count = 5

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "freq": vc.to_numpy(np.int64)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["freq"].sum()
        return g[g["freq"] >= min_count]

    counts = partition_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["token"], QCFG.join_num_partitions, combine,
    )

    def freq_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("freq", as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = (counts.map_batches(freq_hist, batch_format="pandas").to_pandas()
            .groupby("freq", as_index=False)["n"].sum()
            .sort_values("freq", ascending=False).reset_index(drop=True))
    if not len(hist):
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "freq": pd.Series(dtype="int64"),
                             "token_id": pd.Series(dtype="int64")})
    cum_below = pd.Series(
        np.concatenate([[0], np.cumsum(hist["n"].to_numpy())[:-1]]),
        index=hist["freq"].to_numpy(),
    )
    off_ref = ray.put(cum_below)

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(["freq", "token"],
                            ascending=[False, True]).reset_index(drop=True)
        local = df.groupby("freq", sort=False).cumcount().to_numpy(np.int64) + 1
        df["token_id"] = off.reindex(df["freq"]).to_numpy(np.int64) + local
        return df[["token", "freq", "token_id"]]

    out = partition_apply(counts, ["freq"], QCFG.join_num_partitions,
                          rank_part).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame({"token": pd.Series(dtype="object"),
                            "freq": pd.Series(dtype="int64"),
                            "token_id": pd.Series(dtype="int64")})
    for c in ("freq", "token_id"):
        out[c] = out[c].astype("int64")
    return out.sort_values("token_id").reset_index(drop=True)


def q73_mixed_media_dedup(sf_dir: str) -> pd.DataFrame:
    """Mixed image+audio near-dup dedup through ONE fingerprint stage
    (per-row kind dispatch: block-mean phash for frames, energy-delta
    afp64 for clips) and the shared Hamming-bucket → CC machinery.
    Rows-only (codec-bound, like q29); the kind-separation and planted
    -group invariants are pytest-gated in test_multimodal.py."""
    import pyarrow as pa_  # local alias, mirrors q29's corpus sizing

    import ray.data as rd_

    from event_deduplication_ray.stages.multimodal import (
        make_fake_audio_table,
        make_fake_media_table,
        media_dup_clusters,
    )

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    groups = int(max(2, min(32, n_docs // 50)))
    img = make_fake_media_table(n_groups=groups, members=3,
                                singletons=int(min(n_docs, 200)), seed=42)
    aud = make_fake_audio_table(n_groups=groups, members=3,
                                singletons=int(min(n_docs, 200)), seed=7)
    aud = aud.set_column(0, "media_id",
                         pa_.array(aud["media_id"].to_numpy() + 5_000_000))
    t = pa_.concat_tables([img, aud])
    out = media_dup_clusters(rd_.from_arrow(t), QCFG, decoder="fake",
                             radius=3).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q72_chunk_windows(sf_dir: str) -> Dataset:
    """Context-window chunking for training prep: split each doc into
    overlapping 64-token windows at stride 48 (a doc of n tokens
    yields 1 window if n <= 64 else ceil((n-64)/48)+1; empty docs
    yield one empty window).  A pure flat_map-shaped stage — nothing
    shuffles; window boundaries, ids and lengths are all computed
    vectorized over the flat token array (np.repeat/arange), with the
    only per-window Python being the final token join (string
    materialization, same cost class as writing the output)."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    win, stride = 64, 48
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]]) \
            if len(lens) else np.array([], dtype=np.int64)
        nc = np.where(lens <= win, 1,
                      (lens - win + stride - 1) // stride + 1).astype(np.int64)
        total = int(nc.sum())
        cum_nc = np.concatenate([[0], np.cumsum(nc)[:-1]]) \
            if len(nc) else np.array([], dtype=np.int64)
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(cum_nc, nc)
        rel_start = chunk_idx * stride
        n_tok = np.minimum(win, np.repeat(lens, nc) - rel_start)
        s = np.repeat(doc_start, nc) + rel_start
        e = s + n_tok
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), nc),
            "chunk_idx": chunk_idx,
            "n_tok": n_tok.astype(np.int64),
            "chunk_text": [" ".join(flat[a:b]) for a, b in zip(s, e)],
        })

    return ds.map_batches(f, batch_format="pandas")


def q74_order_count_histogram(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13-style customer order-count histogram: how many
    customers placed exactly k orders, including k=0.  The textbook
    formulation is a LEFT OUTER join customer⟕orders; at 100 TB the
    outer join is unnecessary because orders.o_custkey is a foreign
    key into customer (q15's anti-join returns 0 rows on these
    tables), so the k=0 bin is |customer| − |custkeys with ≥1 order|
    — O(1) driver arithmetic on a metadata count.  Shape: per-batch
    partial counts per custkey → ONE custkey shuffle that sums the
    partials AND emits its partition's histogram, so the second
    "group by count" never shuffles row-level data — only P tiny
    (c_count, custdist) frames reach the driver."""
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size()
        return g.rename(columns={"size": "n"})

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("o_custkey")["n"].sum()
        h = per_cust.value_counts()
        return pd.DataFrame({"c_count": h.index.astype("int64"),
                             "custdist": h.to_numpy(np.int64)})

    pre = orders.map_batches(partial, batch_format="pandas")
    parts = partition_apply(pre, ["o_custkey"], QCFG.join_num_partitions,
                            hist).to_pandas()
    out = parts.groupby("c_count", as_index=False)["custdist"].sum()
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    zero = int(n_customers) - int(out["custdist"].sum())
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return (out.sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))


def q75_priority_shipments(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12-style conditional aggregation over the fact⋈fact
    join: per ship month, how many lineitems belong to HIGH-priority
    (1-URGENT/2-HIGH) orders vs lower ones.  lineitem pre-aggregates
    (orderkey, month, n) inside the split wave, so only one row per
    (orderkey, month, batch) shuffles; orders ships as a narrow
    (orderkey, is_high) projection through q50's hash-cogroup; the
    month-level combine is a driver concat of P partial frames, each
    at most |months| rows."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def oproj(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({"o_orderkey": t["o_orderkey"], "is_high": hi})

    oproj_ds = orders.map_batches(oproj, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def lpart(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ship_month"] = df["l_shipdate"].dt.strftime("%Y-%m")
        g = (df.groupby(["l_orderkey", "ship_month"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    empty = {"ship_month": pd.Series(dtype="object"),
             "high_line_count": pd.Series(dtype="int64"),
             "low_line_count": pd.Series(dtype="int64")}

    def joinagg(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        m = r.merge(l, left_on="l_orderkey", right_on="o_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        hi = m["is_high"].to_numpy(bool)
        n = m["n"].to_numpy(np.int64)
        m = pd.DataFrame({"ship_month": m["ship_month"],
                          "high_line_count": np.where(hi, n, 0),
                          "low_line_count": np.where(hi, 0, n)})
        return m.groupby("ship_month", as_index=False).sum()

    df = cogroup_apply(oproj_ds, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, joinagg).to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame(empty)
    out = df.groupby("ship_month", as_index=False).sum()
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("ship_month").reset_index(drop=True)


def q76_user_running_total(sf_dir: str) -> pd.DataFrame:
    """Running-total window (SUM OVER ... ROWS UNBOUNDED PRECEDING +
    row_number) — the cumulative-window shape q60/q62's lag machinery
    doesn't cover.  ONE user_id shuffle co-locates each user's
    events; the partition body is a segmented cumsum over the
    lexsorted frame (group-offset subtraction — no per-user loop).
    value is floored to exact integer cents BEFORE accumulating so
    Ray's np.cumsum and DuckDB's windowed SUM see identical int64
    streams; float running sums are order-sensitive and would drift
    between engines at round(6)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def cum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        cents = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
        uid = df["user_id"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(df)))
        cs = np.cumsum(cents)
        offsets = np.repeat(cs[starts] - cents[starts], sizes)
        seq = np.arange(len(df), dtype=np.int64) - np.repeat(starts, sizes) + 1
        return pd.DataFrame({"user_id": uid,
                             "event_id": df["event_id"].to_numpy(np.int64),
                             "seq": seq,
                             "cum_cents": cs - offsets})

    out = partition_apply(ds, ["user_id"], QCFG.join_num_partitions,
                          cum).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "event_id": pd.Series(dtype="int64"),
                            "seq": pd.Series(dtype="int64"),
                            "cum_cents": pd.Series(dtype="int64")})
    return out.sort_values(["user_id", "seq"]).reset_index(drop=True)


# GPT-2-style pre-tokenizer restricted to ASCII classes, trailing-space
# lookahead dropped: lookaheads aren't RE2-compatible, and Python re and
# DuckDB's RE2 must run the EXACT same pattern for oracle parity.
# Whitespace is the explicit ASCII class (Python \s is unicode-wide,
# RE2's is not — the explicit class removes the divergence).
BPE_TOKEN_RX = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                r"| ?[^A-Za-z0-9 \t\n\r\f\v]+|[ \t\n\r\f\v]+")


def q77_bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """BPE-ish regex token counter alongside q08's whitespace counter
    (the two tokenization granularities a training-data pipeline
    budgets with).  Pure map stage — pandas str.count ≡ len(findall)
    ≡ DuckDB len(regexp_extract_all) on the shared ASCII pattern;
    nothing shuffles."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_bpe_tokens": t.str.count(BPE_TOKEN_RX).astype("int64"),
        })

    out = _with_schema(
        ds.map_batches(f, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_bpe_tokens": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q78_line_dedup_rewrite(sf_dir: str) -> Dataset:
    """Corpus-level duplicate-LINE removal with document rewrite —
    the C4/CCNet 'drop repeated spans across the corpus, keep the
    first occurrence' transform as a REWRITING operator (q43 only
    flags).  A line participates iff it has >= 5 tokens (short lines
    — bullets, headers — always stay); keep = smallest
    (doc_id, line_idx) among equal lines, including within-doc
    repeats; every other occurrence is dropped and the doc is
    reassembled from its surviving lines.

    Scale shape: pass 1 explodes (line, doc_id, line_idx) for LONG
    lines only and hash-partitions by the line string, so equal
    lines co-locate and each partition emits only its LOSERS — the
    drop set is the genuinely small side (two int64s per dropped
    line).  Pass 2 re-reads the pruned docs and cogroups them with
    the drop set by doc_id; only affected docs are re-split, the
    rest pass through untouched.  Text bodies cross the wire twice
    (line explode, doc cogroup) and never sit on the driver."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"].fillna("").str.split("\n")
        nl = lines.str.len().to_numpy(np.int64)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), nl)
        flat = pd.Series(
            np.concatenate([np.asarray(v, dtype=object) for v in lines])
            if len(lines) else np.array([], dtype=object))
        starts = np.concatenate([[0], np.cumsum(nl)[:-1]]) \
            if len(nl) else np.array([], dtype=np.int64)
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, nl)
        long = flat.str.count(r"\S+").to_numpy(np.int64) >= 5
        return pd.DataFrame({"line": flat[long].reset_index(drop=True),
                             "doc_id": doc[long], "line_idx": idx[long]})

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["line", "doc_id", "line_idx"], kind="stable")
        first = ~df["line"].duplicated()
        return df.loc[~first, ["doc_id", "line_idx"]]

    drops = partition_apply(ds.map_batches(explode, batch_format="pandas"),
                            ["line"], QCFG.join_num_partitions, losers)
    drops_sh = shuffle_to(drops, ["doc_id"], QCFG.join_num_partitions)

    empty = {"doc_id": pd.Series(dtype="int64"),
             "clean_text": pd.Series(dtype="object"),
             "n_dropped": pd.Series(dtype="int64")}

    def rewrite(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(empty)
        out = pd.DataFrame({"doc_id": l["doc_id"].to_numpy(np.int64),
                            "clean_text": l["text"].fillna(""),
                            "n_dropped": np.zeros(len(l), np.int64)})
        if len(r) == 0:
            return out
        hit = out["doc_id"].isin(r["doc_id"].unique()).to_numpy()
        aff = l[hit]
        lines = aff["text"].fillna("").str.split("\n")
        nl = lines.str.len().to_numpy(np.int64)
        flat_doc = np.repeat(aff["doc_id"].to_numpy(np.int64), nl)
        flat = pd.Series(
            np.concatenate([np.asarray(v, dtype=object) for v in lines]))
        starts = np.concatenate([[0], np.cumsum(nl)[:-1]])
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, nl)
        e = pd.DataFrame({"doc_id": flat_doc, "line_idx": idx, "line": flat})
        m = e.merge(r.assign(_drop=1), on=["doc_id", "line_idx"], how="left")
        kept = m[m["_drop"].isna()]
        joined = kept.groupby("doc_id")["line"].agg("\n".join)
        ndrop = m[m["_drop"].notna()].groupby("doc_id").size()
        out.loc[hit, "clean_text"] = (
            out.loc[hit, "doc_id"].map(joined).fillna("").to_numpy())
        out.loc[hit, "n_dropped"] = (
            out.loc[hit, "doc_id"].map(ndrop).fillna(0).to_numpy(np.int64))
        return out

    return cogroup_apply(ds, drops_sh, ["doc_id"], ["doc_id"],
                         QCFG.join_num_partitions, rewrite)


def q80_video_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Video near-dup dedup: frame-sample (every 2nd frame, <= 8 per
    clip) → per-frame phash → the shared Hamming-bucket pair
    machinery at frame granularity → media pairs voting with
    >= 2 shared near-identical frames → CC.  Rows-only (codec-bound,
    like q29/q73); sampler determinism, length tolerance and the
    shared-frame vote are pytest-gated in test_multimodal.py."""
    import ray.data as rd_

    from event_deduplication_ray.stages.multimodal import (
        make_fake_video_table,
        video_dup_clusters,
    )

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    groups = int(max(2, min(24, n_docs // 50)))
    t = make_fake_video_table(n_groups=groups, members=3,
                              singletons=int(min(n_docs, 100)), seed=19)
    out = video_dup_clusters(rd_.from_arrow(t), QCFG, decoder="fake",
                             radius=3).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q83_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-event-type quantiles over a DOUBLE column without a
    sort shuffle — q34's histogram machinery lifted to monetary
    values: the values carry at most a few decimals (driver corpus =
    exact cents, fuzz corpus = 3 decimals), so round(value·10⁶) is a
    lossless int64 key, the histogram is exact, and micros/10⁶
    reproduces the original double bit-for-bit (both engines round
    the same decimal to the same float64).  Per-batch (type, micros)
    value-count partials → ONE event_type shuffle combines histograms
    and reads p50/p90/p99 off the cumulative counts with the
    DuckDB-proven exact-ceil formula.  The shuffle carries one row
    per distinct (type, value) per batch, never one per event."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["value"].to_numpy(np.float64) * 1e6).astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "cents": cents}).groupby(
            ["event_type", "cents"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "cents"], as_index=False)["n"].sum()
        rows = []
        for et, sub in g.groupby("event_type"):
            sub = sub.sort_values("cents")
            vals = sub["cents"].to_numpy()
            cum = np.cumsum(sub["n"].to_numpy())
            total = int(cum[-1])
            row = {"event_type": et}
            for name, num, den in _QUANTILES:
                k = (num * total + den - 1) // den
                row[name] = vals[np.searchsorted(cum, max(k, 1))] / 1e6
            rows.append(row)
        return pd.DataFrame(rows)

    out = _with_schema(
        partition_apply(parts, ["event_type"], QCFG.join_num_partitions,
                        combine).to_pandas(),
        {"event_type": "object", "p50": "float64", "p90": "float64",
         "p99": "float64"})
    return out.sort_values("event_type").reset_index(drop=True)


def q84_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """Row-level LEFT OUTER join (q74 keeps only the histogram; this
    keeps every left row): customer ⟕ per-custkey order counts, zero
    for order-less customers.  orders pre-aggregates per custkey in
    the split wave so only (custkey, n) partials shuffle; customer
    rows cogroup against them and fill the misses — the outer join
    never materializes a wide table or broadcasts the fact side."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def opart(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("o_custkey", as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    o_sh = shuffle_to(orders, ["o_custkey"], QCFG.join_num_partitions,
                      pre_fn=opart)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    empty = {"c_custkey": pd.Series(dtype="int64"),
             "c_name": pd.Series(dtype="object"),
             "n_orders": pd.Series(dtype="int64")}

    def join(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(empty)
        if len(r):
            agg = r.groupby("o_custkey", as_index=False)["n"].sum()
            m = l.merge(agg, left_on="c_custkey", right_on="o_custkey",
                        how="left")
            n = m["n"].fillna(0).to_numpy(np.int64)
        else:
            n = np.zeros(len(l), np.int64)
        return pd.DataFrame({"c_custkey": l["c_custkey"].to_numpy(np.int64),
                             "c_name": l["c_name"].to_numpy(object),
                             "n_orders": n})

    df = cogroup_apply(cust, o_sh, ["c_custkey"], ["o_custkey"],
                       QCFG.join_num_partitions, join).to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame(empty)
    return df.sort_values("c_custkey").reset_index(drop=True)


def q85_promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14-style ratio aggregate over the part⋈lineitem join:
    per ship month, the share of discounted revenue coming from PROMO
    parts.  lineitem pre-aggregates (partkey, month, revenue) in the
    split wave; part ships as a narrow (partkey, is_promo) projection
    through the hash-cogroup (q75's machinery on the other fact
    pair); per-partition (month, promo_rev, total_rev) partials are
    summed on the driver and the DIVISION happens exactly once there
    — a ratio of sums must never be computed per partition.  Revenue
    accumulates in EXACT int64 (cents(price) · pct(1−discount),
    both lossless for the 2-decimal inputs): float sums of this
    magnitude drift across summation orders right past a round(2)
    half-cent boundary — observed at sf0.001 before this fix."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def pproj(t: pa.Table) -> pa.Table:
        return pa.table({"p_partkey": t["p_partkey"],
                         "is_promo": pc.equal(t["p_type"], "PROMO")})

    p_ds = part.map_batches(pproj, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ship_month"] = df["l_shipdate"].dt.strftime("%Y-%m")
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100).astype(np.int64)
        df["rev"] = cents * pct          # exact, unit = 1e-4 dollars
        g = df.groupby(["l_partkey", "ship_month"], as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_partkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    empty = {"ship_month": pd.Series(dtype="object"),
             "promo_u": pd.Series(dtype="int64"),
             "total_u": pd.Series(dtype="int64")}

    def joinagg(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        m = r.merge(l, left_on="l_partkey", right_on="p_partkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        promo = np.where(m["is_promo"].to_numpy(bool),
                         m["rev"].to_numpy(np.int64), 0)
        g = pd.DataFrame({"ship_month": m["ship_month"],
                          "promo_u": promo,
                          "total_u": m["rev"].to_numpy(np.int64)})
        return g.groupby("ship_month", as_index=False).sum()

    df = cogroup_apply(p_ds, li_sh, ["p_partkey"], ["l_partkey"],
                       QCFG.join_num_partitions, joinagg).to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame(empty)
    out = df.groupby("ship_month", as_index=False).sum()
    out["promo_rev"] = out["promo_u"].to_numpy(np.int64) / 1e4
    out["total_rev"] = out["total_u"].to_numpy(np.int64) / 1e4
    out["promo_share"] = (out["promo_u"].to_numpy(np.int64)
                          / out["total_u"].to_numpy(np.int64)).round(6)
    return (out[["ship_month", "promo_rev", "total_rev", "promo_share"]]
            .sort_values("ship_month").reset_index(drop=True))


def q86_top_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Distributed grouped top-k (k=3 orders per market segment by
    totalprice): each batch keeps its LOCAL top-k per segment (a
    partial that never grows past k·|segments| rows), one tiny
    segment shuffle re-selects the global top-k — q02's global top-k
    lifted to per-group, no sort barrier, no window shuffle of the
    fact table.  Ties break on o_orderkey asc, matching the oracle's
    row_number ORDER BY."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_by_key = cust.set_index("c_custkey")["c_mktsegment"]
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    k = 3

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c_mktsegment"] = df["o_custkey"].map(seg_by_key)
        df = df.sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("c_mktsegment").head(k)
        return out[["c_mktsegment", "o_orderkey", "o_totalprice"]]

    parts = orders.map_batches(local_topk, batch_format="pandas")

    def global_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("c_mktsegment").head(k).copy()
        out["rk"] = out.groupby("c_mktsegment").cumcount() + 1
        out["rk"] = out["rk"].astype("int64")
        return out

    out = partition_apply(parts, ["c_mktsegment"], QCFG.join_num_partitions,
                          global_topk).to_pandas()
    return (out.sort_values(["c_mktsegment", "rk"])
            .reset_index(drop=True))


def q87_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Retention-cohort matrix: users cohorted by their FIRST active
    calendar day; cell (cohort_day, day_offset) counts users from
    that cohort active offset days later.  ONE user_id shuffle
    co-locates each user's events; the partition body computes
    distinct (user, day), the per-user min day and integer day
    offsets fully vectorized (epoch-day arithmetic — no tz/precision
    ambiguity), emitting one row per (user, cohort, offset); a second
    tiny shuffle on (cohort_day, day_offset) sums the partials.  The
    second shuffle carries one row per distinct cell per partition,
    never one per event."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].to_numpy("datetime64[us]")
               .astype("datetime64[D]").astype(np.int64))
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "day": day}).drop_duplicates()
        first = d.groupby("user_id")["day"].transform("min")
        cohort = pd.to_datetime(
            first.to_numpy(np.int64).astype("datetime64[D]"))
        out = pd.DataFrame({
            "cohort_day": cohort.strftime("%Y-%m-%d"),
            "day_offset": (d["day"].to_numpy(np.int64)
                           - first.to_numpy(np.int64))})
        g = out.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = partition_apply(ds, ["user_id"], QCFG.join_num_partitions, cells)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cohort_day", "day_offset"], as_index=False)["n"].sum()
        return g.rename(columns={"n": "n_users"})

    out = _with_schema(
        partition_apply(parts, ["cohort_day", "day_offset"],
                        QCFG.join_num_partitions, combine).to_pandas(),
        {"cohort_day": "object", "day_offset": "int64",
         "n_users": "int64"})
    out["day_offset"] = out["day_offset"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return (out.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True))


def q88_event_type_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Pairwise co-occurrence (market-basket shape): for every
    unordered event-type pair, how many users did BOTH.  ONE user_id
    shuffle; the partition body dedups (user, type) and self-merges
    on user — the per-user set is bounded by the type vocabulary, so
    the 'self-join' explodes at most |types|² rows per user; per-pair
    partials then sum on the driver (the pair vocabulary is tiny).
    The classic SQL is a self-join no row-level engine should run at
    corpus scale; partitioning by user makes it linear."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        g = (m.groupby(["event_type_x", "event_type_y"], as_index=False)
             .size().rename(columns={"size": "n", "event_type_x": "type_a",
                                     "event_type_y": "type_b"}))
        return g

    parts = _with_schema(
        partition_apply(ds, ["user_id"], QCFG.join_num_partitions,
                        pairs).to_pandas(),
        {"type_a": "object", "type_b": "object", "n": "int64"})
    out = parts.groupby(["type_a", "type_b"], as_index=False)["n"].sum() \
        .rename(columns={"n": "n_users"})
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def q89_token_and_search(sf_dir: str) -> pd.DataFrame:
    """Corpus curation search: find every doc containing ALL query
    terms (AND semantics) — the query here is the corpus's two most
    frequent tokens, derived deterministically so the operator is
    self-contained and oracle-checkable.  Phase 1 is q71's count
    partials → hash combine → per-partition top-2 → driver pick
    (freq desc, token asc tie-break).  Phase 2 broadcasts the tiny
    query set in the task closure and streams the corpus ONCE: a doc
    qualifies iff its token set covers the query set, tested
    vectorized (isin over the exploded tokens + per-doc distinct-hit
    count) — no inverted-index shuffle is needed for AND queries
    because containment is decidable per doc.  A persisted posting
    list (token-partitioned Parquet, the SRP-index pattern) is the
    swap-in when queries outnumber corpus scans."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy(np.int64)})

    def top2_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n"].sum()
        return g.sort_values(["n", "token"],
                             ascending=[False, True]).head(2)

    cand = _with_schema(
        partition_apply(
            ds.map_batches(tok_partial, batch_format="pandas"),
            ["token"], QCFG.join_num_partitions, top2_part).to_pandas(),
        {"token": "object", "n": "int64"})
    query = (cand.sort_values(["n", "token"], ascending=[False, True])
             .head(2)["token"].tolist())

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        q = pd.Index(query)
        code = q.get_indexer(flat) if len(flat) else np.zeros(0, np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        n_hit = np.zeros(len(df), np.int64)
        for qi in range(len(query)):
            c = np.concatenate([[0], np.cumsum(code == qi)]).astype(np.int64)
            n_hit += (c[ends] - c[starts]) > 0
        keep = n_hit == len(query)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep]})

    out = ds.map_batches(hits, batch_format="pandas").to_pandas()
    if "doc_id" not in out.columns:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


_TOKEN_INDEX_CACHE: dict[str, str] = {}


def q91_dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Dup-cluster-size histogram — the graph-analytics readout every
    dedup report leads with (how much of the corpus sits in 2-member
    clusters vs giant boilerplate balls).  Runs q28's EXACT clustering
    (deterministic, so the recursive-CTE oracle gates the whole
    CC machinery again through a second lens) and folds (doc_id,
    cluster_id) → per-partition cluster counts → size histogram: one
    cluster_id shuffle of 16 B rows, then P tiny histogram frames."""
    assign = q28_ngram_jaccard_clusters(sf_dir)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("cluster_id").size()
        h = sizes.value_counts()
        return pd.DataFrame({"cluster_size": h.index.astype("int64"),
                             "n_clusters": h.to_numpy(np.int64)})

    parts = partition_apply(assign, ["cluster_id"],
                            QCFG.join_num_partitions, hist).to_pandas()
    out = parts.groupby("cluster_size", as_index=False)["n_clusters"].sum()
    out["cluster_size"] = out["cluster_size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    return out.sort_values("cluster_size").reset_index(drop=True)


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that",
                     "have", "with")


def q101_top_pmi_bigrams(sf_dir: str) -> pd.DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual
    information, PMI = ln(N·c(ab) / (c(a)·c(b))) over corpus unigram/
    bigram counts with a support floor of 5 — the classic phrase
    detector (word2vec's phrase pass, NLTK collocations).  ONE tagged
    counting pass (q82's machinery: per-batch value_counts partials
    for unigrams AND bigrams) → hash combine → the qualifying bigram
    set is small, so the PMI arithmetic runs on the driver over exact
    int64 counts; both engines ln identical rationals and the output
    drops the float (selection by (round(pmi, 6), ngram) only)."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        uni = pd.Series(flat).value_counts() if n else pd.Series(dtype="int64")
        frames = [pd.DataFrame({"w1": uni.index.to_numpy(dtype=object),
                                "w2": "", "n": uni.to_numpy(np.int64),
                                "kind": "u"})]
        if n >= 2:
            start_ok = np.ones(n, dtype=bool)
            ends = np.cumsum(lens)
            start_ok[ends[lens > 0] - 1] = False
            idx = np.flatnonzero(start_ok[:-1])
            bc = (pd.DataFrame({"w1": flat[idx], "w2": flat[idx + 1]})
                  .groupby(["w1", "w2"], as_index=False).size())
            frames.append(pd.DataFrame({
                "w1": bc["w1"], "w2": bc["w2"],
                "n": bc["size"].astype(np.int64), "kind": "b"}))
        return pd.concat(frames, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["kind", "w1", "w2"], as_index=False)["n"].sum()

    counts = _with_schema(
        partition_apply(
            ds.map_batches(count_partial, batch_format="pandas"),
            ["w1"], QCFG.join_num_partitions, combine).to_pandas(),
        {"kind": "object", "w1": "object", "w2": "object", "n": "int64"})
    uni = counts[counts["kind"] == "u"].set_index("w1")["n"]
    big = counts[counts["kind"] == "b"]
    big = big[big["n"] >= 5].copy()
    n_tokens = int(uni.sum())
    if len(big) == 0:
        return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "pmi": pd.Series(dtype="float64")})
    ca = uni.reindex(big["w1"]).to_numpy(np.float64)
    cb = uni.reindex(big["w2"]).to_numpy(np.float64)
    big["pmi"] = np.round(
        np.log(n_tokens * big["n"].to_numpy(np.float64) / (ca * cb)), 6)
    big["ngram"] = big["w1"] + " " + big["w2"]
    out = (big.sort_values(["pmi", "ngram"], ascending=[False, True])
           .head(20)[["ngram", "n", "pmi"]])
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def q100_cross_source_dup_matrix(sf_dir: str) -> pd.DataFrame:
    """Cross-source duplication matrix — which feeds mirror each
    other: for every unordered source pair, the number of
    same-cluster doc pairs under q28's EXACT clustering (the
    'prefer-the-cleaner-feed' policy of q67 needs exactly this
    evidence).  Shape: the (doc_id, cluster_id) assignment joins the
    narrow (doc_id, source) projection via ONE cluster_id shuffle;
    within-cluster pair expansion is bounded by cluster sizes (the
    same cap argument as the dedup tiers); the (source, source)
    output vocabulary is tiny."""
    src = _read(sf_dir, "documents", ["doc_id", "source"])
    assign = q28_ngram_jaccard_clusters(sf_dir)

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    src_sh = shuffle_to(src, ["doc_id"], QCFG.join_num_partitions)

    def attach(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"cluster_id": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype="object")})
        return l.merge(r, on="doc_id")[["cluster_id", "source"]]

    tagged = cogroup_apply(assign, src_sh, ["doc_id"], ["doc_id"],
                           QCFG.join_num_partitions, attach)

    def within(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, sub in df.groupby("cluster_id"):
            if len(sub) < 2:
                continue
            s = np.sort(sub["source"].to_numpy(object))
            i, j = np.triu_indices(len(s), k=1)
            out.append(pd.DataFrame({"source_a": s[i], "source_b": s[j]}))
        if not out:
            return pd.DataFrame({"source_a": pd.Series(dtype="object"),
                                 "source_b": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        cat = pd.concat(out, ignore_index=True)
        return (cat.groupby(["source_a", "source_b"], as_index=False)
                .size().rename(columns={"size": "n"}))

    parts = _with_schema(
        partition_apply(tagged, ["cluster_id"], QCFG.join_num_partitions,
                        within).to_pandas(),
        {"source_a": "object", "source_b": "object", "n": "int64"})
    out = parts.groupby(["source_a", "source_b"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def q99_event_transitions(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type transition counts (the Markov/bigram view
    of behavioral streams — sessionization's sequel): for each
    consecutive pair of events of ONE user ordered by (ts, event_id),
    count (from_type, to_type).  ONE user shuffle; the partition body
    is q60's vectorized lag trick at type level (boundary mask kills
    cross-user pairs); the (from, to) vocabulary is tiny so the
    partials concat on the driver."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def trans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy(object)
        same = uid[1:] == uid[:-1]
        g = pd.DataFrame({"from_type": et[:-1][same],
                          "to_type": et[1:][same]})
        out = g.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = _with_schema(
        partition_apply(ds, ["user_id"], QCFG.join_num_partitions,
                        trans).to_pandas(),
        {"from_type": "object", "to_type": "object", "n": "int64"})
    out = parts.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["from_type", "to_type"])
            .reset_index(drop=True))


def q98_embedding_audit(sf_dir: str) -> pd.DataFrame:
    """Embedding-column hygiene audit — the checks a 100 TB pipeline
    runs before trusting an encoder's output: per label, the vector
    count, degenerate rows (zero/near-zero norm — a failed encoder's
    signature), wrong-dimension rows, and the mean L2 norm.  One
    streaming pass of (label, n, n_zero, n_bad_dim, Σnorm) partials →
    tiny label combine.  Norms accumulate in float64 from the float32
    storage on BOTH engines (the oracle casts to DOUBLE[] — DuckDB's
    float32 list_inner_product would drift at round(6))."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    dim = 64

    def partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy().astype(np.int64)
        vecs = t["embedding"].to_numpy(zero_copy_only=False)
        lens = np.array([len(v) for v in vecs], np.int64)
        norms = np.array(
            [float(np.sqrt(np.dot(v.astype(np.float64),
                                  v.astype(np.float64)))) for v in vecs])
        df = pd.DataFrame({
            "label": lab,
            "one": np.ones(len(lab), np.int64),
            "zero": (norms < 1e-12).astype(np.int64),
            "bad": (lens != dim).astype(np.int64),
            "s": norms,
        })
        g = df.groupby("label", as_index=False).agg(
            n=("one", "sum"), n_zero=("zero", "sum"),
            n_bad_dim=("bad", "sum"), s=("s", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = _with_schema(
        emb.map_batches(partial, batch_format="pyarrow").to_pandas(),
        {"label": "int64", "n": "int64", "n_zero": "int64",
         "n_bad_dim": "int64", "s": "float64"})
    out = parts.groupby("label", as_index=False).agg(
        n_vecs=("n", "sum"), n_zero_norm=("n_zero", "sum"),
        n_bad_dim=("n_bad_dim", "sum"), s=("s", "sum"))
    out["mean_norm"] = (out["s"] / out["n_vecs"]).round(6)
    for c in ("n_vecs", "n_zero_norm", "n_bad_dim"):
        out[c] = out[c].astype("int64")
    return (out[["label", "n_vecs", "n_zero_norm", "n_bad_dim",
                 "mean_norm"]]
            .sort_values("label").reset_index(drop=True))


def q97_length_drift_psi(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor: Population Stability Index of the
    token-length distribution between two deterministic corpus halves
    (even vs odd doc_id — the stand-in for yesterday's snapshot vs
    today's), per lang.  PSI = Σ (p−q)·ln(p/q) over fixed length bins
    with add-one smoothing; > 0.2 conventionally flags drift.  Shape:
    per-batch (lang, split, bin) count partials → ONE lang shuffle
    computes the PSI from exact integer counts — the logs touch only
    the final per-(lang, bin) ratios, so both engines divide and ln
    identical rationals."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    edges = np.array([25, 50, 75, 100], np.int64)
    n_bins = len(edges) + 1
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        b = np.searchsorted(edges, lens.astype(np.int64), side="left")
        g = pd.DataFrame({
            "lang": df["lang"].to_numpy(object),
            "split": (df["doc_id"].to_numpy(np.int64) % 2),
            "bin": b,
        }).groupby(["lang", "split", "bin"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pandas")

    def psi(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in df.groupby("lang"):
            g = sub.groupby(["split", "bin"])["n"].sum()
            tot = sub.groupby("split")["n"].sum()
            na, nb = int(tot.get(0, 0)), int(tot.get(1, 0))
            val = 0.0
            for b in range(n_bins):
                ca = int(g.get((0, b), 0)) + 1
                cb = int(g.get((1, b), 0)) + 1
                p = ca / (na + n_bins)
                q = cb / (nb + n_bins)
                val += (p - q) * np.log(p / q)
            rows.append({"lang": lang, "n_even": na, "n_odd": nb,
                         "psi": round(val, 6)})
        return pd.DataFrame(rows,
                            columns=["lang", "n_even", "n_odd", "psi"])

    out = _with_schema(
        partition_apply(parts, ["lang"], QCFG.join_num_partitions,
                        psi).to_pandas(),
        {"lang": "object", "n_even": "int64", "n_odd": "int64",
         "psi": "float64"})
    out["n_even"] = out["n_even"].astype("int64")
    out["n_odd"] = out["n_odd"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q96_value_quantiles_kll(sf_dir: str) -> pd.DataFrame:
    """Approximate per-type value quantiles via the KLL/MRL rank
    sketch — the scale path when even q83's exact distinct-value
    histogram is too big (unbounded/continuous domains): per-batch
    sketches of FIXED size merge through any reduce-tree shape, so
    the shuffle carries O(k·log n) floats per (type, batch) instead
    of one row per distinct value.  Rows-only (approximate by
    design); tests gate the observed rank error against exact q83 and
    the merge≡single-stream property."""
    from event_deduplication_ray.functions.sketch import (
        kll_deserialize,
        kll_merge,
        kll_new,
        kll_quantile,
        kll_serialize,
        kll_update,
    )

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def sk_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type"):
            s = kll_update(kll_new(), sub["value"].to_numpy(np.float64))
            rows.append({"event_type": et, "kll": kll_serialize(s)})
        return pd.DataFrame(rows, columns=["event_type", "kll"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type"):
            s = kll_new()
            for b in sub["kll"]:
                s = kll_merge(s, kll_deserialize(b))
            rows.append({"event_type": et,
                         "p50": kll_quantile(s, 0.5),
                         "p90": kll_quantile(s, 0.9),
                         "p99": kll_quantile(s, 0.99)})
        return pd.DataFrame(rows,
                            columns=["event_type", "p50", "p90", "p99"])

    parts = ds.map_batches(sk_partial, batch_format="pandas")
    out = _with_schema(
        partition_apply(parts, ["event_type"], QCFG.join_num_partitions,
                        combine).to_pandas(),
        {"event_type": "object", "p50": "float64", "p90": "float64",
         "p99": "float64"})
    return out.sort_values("event_type").reset_index(drop=True)


def q95_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-Res):
    each doc draws u = (fmix32(doc_id)+1)/2³² and competes with key
    ln(u)/w (w = token count, heavier docs more likely); the global
    top-k by key IS a weighted sample without replacement — all with
    zero RNG state, so re-runs, resumes and the SQL oracle select the
    SAME rows (q51's hash-Bernoulli primitive upgraded to weights).
    Shape: per-batch local top-k partials (k rows per batch) → driver
    combine; keys are never shuffled for the full corpus.  The key
    itself stays internal — ulp-level libm differences can't reorder
    distinct keys, and only (doc_id, n_tok) is compared."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    k = 10

    def local(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        w = lens.astype(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        h = H.sample_hash32(ids).astype(np.float64)
        u = (h + 1.0) / 4294967296.0
        with np.errstate(divide="ignore"):
            key = np.log(u) / np.maximum(w, 1)
        m = w > 0
        out = pd.DataFrame({"doc_id": ids[m], "n_tok": w[m],
                            "key": key[m]})
        return out.sort_values(["key", "doc_id"],
                               ascending=[False, True]).head(k)

    parts = _with_schema(
        ds.map_batches(local, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_tok": "int64", "key": "float64"})
    out = (parts.sort_values(["key", "doc_id"], ascending=[False, True])
           .head(k)[["doc_id", "n_tok"]])
    return out.reset_index(drop=True)


def q94_late_orders_by_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4-style SEMI-join (EXISTS): count orders per priority
    having at least one lineitem shipped more than 90 days after the
    order date — the semi-join completes the relational primitive set
    next to q15's anti-join.  Shape: lineitem pre-dedups candidate
    orderkeys per batch (one row per distinct key per batch — the
    EXISTS needs presence, not multiplicity); orders cogroup against
    them on orderkey carrying (o_orderdate, priority); the late test
    runs vectorized in exact integer µs inside the partition; the
    per-priority counts are P tiny partial frames."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    late_us = 90 * 86_400_000_000

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def lpart(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ship_us"] = df["l_shipdate"].astype("datetime64[us]") \
            .astype("int64")
        g = df.groupby("l_orderkey", as_index=False)["ship_us"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    empty = {"o_orderpriority": pd.Series(dtype="object"),
             "n_late_orders": pd.Series(dtype="int64")}

    def semi(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        mx = r.groupby("l_orderkey", as_index=False)["ship_us"].max()
        m = l.merge(mx, left_on="o_orderkey", right_on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        od_us = m["o_orderdate"].astype("datetime64[us]") \
            .astype("int64").to_numpy()
        late = m[m["ship_us"].to_numpy() > od_us + late_us]
        g = (late.groupby("o_orderpriority", as_index=False).size()
             .rename(columns={"size": "n_late_orders"}))
        return g

    df = cogroup_apply(orders, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, semi).to_pandas()
    df = _with_schema(df, empty_cols := {"o_orderpriority": "object",
                                         "n_late_orders": "int64"})
    out = df.groupby("o_orderpriority", as_index=False)["n_late_orders"].sum()
    out = _with_schema(out, empty_cols)
    out["n_late_orders"] = out["n_late_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q93_gopher_rules(sf_dir: str) -> pd.DataFrame:
    """Gopher quality rules (Rae et al. 2021, §A1.1) — the classic
    named rule-set a web-text pipeline gates on, one flag column per
    rule plus the conjunction: word count in [50, 100 000]; mean word
    length in [3, 10]; '#'/'…' symbol-to-word ratio <= 0.1; < 90 % of
    lines start with a bullet; <= 30 % end with an ellipsis; > 80 %
    of words contain an alphabetic char; >= 2 distinct stop words.
    Every threshold is evaluated in EXACT integer cross-multiplication
    (e.g. ``3·n_words <= n_chars <= 10·n_words``) so the Ray and SQL
    engines can never disagree on a ratio rounding.  Pure map stage —
    one tokenization + one line split per batch, nothing shuffles."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    stop = frozenset(_GOPHER_STOPWORDS)

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        flat, lens = tokenize_offsets(text.str.lower())
        ends = np.cumsum(lens)
        starts = ends - lens
        n_words = lens.astype(np.int64)

        def per_doc(mask: np.ndarray) -> np.ndarray:
            c = np.concatenate([[0], np.cumsum(mask)]).astype(np.int64)
            return c[ends] - c[starts]

        tok = pd.Series(flat) if len(flat) else pd.Series(dtype=object)
        tok_len = tok.str.len().to_numpy(np.int64) if len(flat) \
            else np.zeros(0, np.int64)
        c = np.concatenate([[0], np.cumsum(tok_len)]).astype(np.int64)
        n_chars = c[ends] - c[starts]
        alpha = tok.str.contains("[A-Za-z]", regex=True).to_numpy() \
            if len(flat) else np.zeros(0, bool)
        n_alpha = per_doc(alpha)
        # distinct stopword hits per doc
        doc_of = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        is_stop = tok.isin(stop).to_numpy() if len(flat) \
            else np.zeros(0, bool)
        if is_stop.any():
            ds_pairs = pd.DataFrame({"d": doc_of[is_stop],
                                     "t": tok.to_numpy(object)[is_stop]})
            n_stop = np.zeros(len(df), np.int64)
            g = ds_pairs.drop_duplicates().groupby("d").size()
            n_stop[g.index.to_numpy()] = g.to_numpy(np.int64)
        else:
            n_stop = np.zeros(len(df), np.int64)
        # symbols: '#' occurrences + '...' (non-overlapping) + '…'
        n_sym = (text.str.count("#")
                 + text.str.count(r"\.\.\.")).to_numpy(np.int64)
        # line stats
        lines = text.str.split("\n")
        nl = lines.str.len().to_numpy(np.int64)
        lf = pd.Series(
            np.concatenate([np.asarray(v, object) for v in lines])
            if len(lines) else np.array([], object)).str.strip(" ")
        lends = np.cumsum(nl)
        lstarts = lends - nl
        bullet = lf.str.startswith(("- ", "* ")).to_numpy() \
            if len(lf) else np.zeros(0, bool)
        ell = lf.str.endswith("...").to_numpy() if len(lf) \
            else np.zeros(0, bool)
        cb = np.concatenate([[0], np.cumsum(bullet)]).astype(np.int64)
        ce = np.concatenate([[0], np.cumsum(ell)]).astype(np.int64)
        n_bullet = cb[lends] - cb[lstarts]
        n_ell = ce[lends] - ce[lstarts]

        r_words = ((n_words >= 50) & (n_words <= 100_000))
        r_wordlen = ((3 * n_words <= n_chars) & (n_chars <= 10 * n_words)
                     & (n_words > 0))
        r_symbol = 10 * n_sym <= n_words
        r_bullets = 10 * n_bullet < 9 * nl
        r_ellipsis = 10 * n_ell <= 3 * nl
        r_alpha = 5 * n_alpha > 4 * n_words
        r_stop = n_stop >= 2
        keep = (r_words & r_wordlen & r_symbol & r_bullets
                & r_ellipsis & r_alpha & r_stop)
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "rule_words": r_words, "rule_wordlen": r_wordlen,
            "rule_symbol": r_symbol, "rule_bullets": r_bullets,
            "rule_ellipsis": r_ellipsis, "rule_alpha": r_alpha,
            "rule_stop": r_stop, "keep": keep})
        for col in out.columns[1:]:
            out[col] = out[col].astype("int64")
        return out

    out = _with_schema(
        ds.map_batches(rules, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "rule_words": "int64", "rule_wordlen": "int64",
         "rule_symbol": "int64", "rule_bullets": "int64",
         "rule_ellipsis": "int64", "rule_alpha": "int64",
         "rule_stop": "int64", "keep": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q92_centroid_confusion(sf_dir: str) -> pd.DataFrame:
    """Nearest-centroid assignment audit (clustering-quality shape):
    per-label centroids from ONE pass of mergeable (sum-matrix, n)
    partials — each batch emits a 10×64 float64 block packed as
    bytes, the driver folds them — then a second streaming pass
    assigns every vector to its max-cosine centroid and emits
    (label, assigned_label) confusion partials.  Ties break to the
    smallest label (argmax-first ≡ the oracle's ORDER BY).  Same
    float-argmax caveat as q11: distinct-label centroids are far
    apart, so the 1e-16 summation-order drift can't flip a winner."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def cent_partial(t: pa.Table) -> pa.Table:
        m = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        lab = t["label"].to_numpy().astype(np.int64)
        labs = np.unique(lab)
        sums = np.zeros((len(labs), m.shape[1]))
        ns = np.zeros(len(labs), np.int64)
        for j, lv in enumerate(labs):
            sel = lab == lv
            sums[j] = m[sel].sum(axis=0)
            ns[j] = int(sel.sum())
        return pa.table({"label": pa.array(labs),
                         "n": pa.array(ns),
                         "s": pa.array([r.tobytes() for r in sums],
                                       pa.binary())})

    parts = emb.map_batches(cent_partial, batch_format="pyarrow").to_pandas()
    parts["sv"] = parts["s"].map(lambda b: np.frombuffer(b, np.float64))
    g = parts.groupby("label")
    labels = np.array(sorted(g.groups), np.int64)
    cents = np.vstack([
        np.sum(np.vstack(g.get_group(lv)["sv"].to_numpy()), axis=0)
        / g.get_group(lv)["n"].sum() for lv in labels])
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    ref = ray.put((labels, cn))

    def assign(t: pa.Table) -> pa.Table:
        labs, c = ray.get(ref)
        m = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        best = labs[np.argmax(mn @ c.T, axis=1)]
        df = pd.DataFrame({"label": t["label"].to_numpy().astype(np.int64),
                           "assigned_label": best})
        out = df.groupby(["label", "assigned_label"], as_index=False).size()
        return pa.Table.from_pandas(out.rename(columns={"size": "n"}),
                                    preserve_index=False)

    out = emb.map_batches(assign, batch_format="pyarrow").to_pandas()
    out = out.groupby(["label", "assigned_label"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["label", "assigned_label"])
            .reset_index(drop=True))


def q90_token_index_search(sf_dir: str) -> pd.DataFrame:
    """Index-served AND search: q89's exact query answered from the
    persisted posting-list index (`stages/textindex.py`) instead of a
    corpus scan — build once per process (the q25/q32 index-cache
    pattern), serve by reading ONLY the shard directories the query
    terms hash into.  Same oracle as q89: the two paths must return
    the identical doc set, which SQL-gates the whole
    build→partition→serve machinery."""
    import os
    import tempfile

    from event_deduplication_ray.functions.hashing import tokenize_offsets
    from event_deduplication_ray.stages.textindex import (
        token_index_build,
        token_index_search,
    )

    idx = _TOKEN_INDEX_CACHE.get(sf_dir)
    if idx is None or not os.path.isdir(idx):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        idx = tempfile.mkdtemp(prefix="edr_tok_idx_")
        token_index_build(docs, idx)
        _TOKEN_INDEX_CACHE[sf_dir] = idx

    # q89's deterministic query: corpus top-2 tokens
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy(np.int64)})

    def top2_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n"].sum()
        return g.sort_values(["n", "token"], ascending=[False, True]).head(2)

    cand = partition_apply(
        ds.map_batches(tok_partial, batch_format="pandas"),
        ["token"], QCFG.join_num_partitions, top2_part).to_pandas()
    query = (cand.sort_values(["n", "token"], ascending=[False, True])
             .head(2)["token"].tolist())
    return token_index_search(idx, query, mode="and")


def q82_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, 'Data
    Selection with Importance Resampling'): log w(x) =
    log p_target(x) − log p_raw(x) under two add-one-smoothed bigram
    LMs — target = the English subset (the 'high-quality/in-domain'
    side), raw = the whole corpus.  Docs whose phrasing looks more
    target-like than corpus-average score > 0 and would be kept by
    importance resampling.

    Scale shape: ONE counting pass emits per-batch value_counts
    partials TAGGED with the model they feed (raw rows once, target
    rows once more for the en subset) → one hash combine; both models
    broadcast together via ``ray.put``; the scoring pass is q64's
    vectorized reindex, done twice per batch.  Exact-string feature
    space (no feature hashing) keeps the DuckDB oracle equivalent;
    at open-web scale swap the broadcast for DSIR's 10^4-bucket
    hashed features.  Requires a non-empty target subset."""
    import ray

    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def bigram_frame(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        if n < 2:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "w1": pd.Series(dtype="object"),
                                 "w2": pd.Series(dtype="object")})
        start_ok = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        start_ok[ends[lens > 0] - 1] = False
        idx = np.flatnonzero(start_ok[:-1])
        doc_of = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        return pd.DataFrame({"doc_id": doc_of[idx],
                             "w1": flat[idx], "w2": flat[idx + 1]})

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for model, sub in (("r", df), ("t", df[df["lang"] == "en"])):
            flat, _ = tokenize_offsets(sub["text"].str.lower())
            uni = pd.Series(flat).value_counts()
            bc = bigram_frame(sub).groupby(["w1", "w2"], as_index=False).size()
            frames.append(pd.DataFrame({
                "w1": uni.index.to_numpy(dtype=object), "w2": "",
                "n": uni.to_numpy(np.int64), "kind": "u", "model": model}))
            frames.append(pd.DataFrame({
                "w1": bc["w1"], "w2": bc["w2"],
                "n": bc["size"].astype(np.int64), "kind": "b",
                "model": model}))
        return pd.concat(frames, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["model", "kind", "w1", "w2"],
                          as_index=False)["n"].sum()

    counts = _with_schema(
        partition_apply(
            ds.map_batches(count_partial, batch_format="pandas"),
            ["w1"], QCFG.join_num_partitions, combine,
        ).to_pandas(),
        {"model": "object", "kind": "object", "w1": "object",
         "w2": "object", "n": "int64"})

    def model_of(tag: str):
        c = counts[counts["model"] == tag]
        uni = c[c["kind"] == "u"].set_index("w1")["n"]
        big = c[c["kind"] == "b"].set_index(["w1", "w2"])["n"]
        return uni, big, max(int(len(uni)), 1)

    model_ref = ray.put((model_of("r"), model_of("t")))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        (ur, br, vr), (ut, bt, vt) = ray.get(model_ref)
        bg = bigram_frame(df)
        if not len(bg):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_bigrams": pd.Series(dtype="int64"),
                                 "dsir_logratio": pd.Series(dtype="float64")})
        mi = pd.MultiIndex.from_arrays([bg["w1"], bg["w2"]])
        cbr = br.reindex(mi).fillna(0).to_numpy(np.float64)
        cur = ur.reindex(bg["w1"]).fillna(0).to_numpy(np.float64)
        cbt = bt.reindex(mi).fillna(0).to_numpy(np.float64)
        cut = ut.reindex(bg["w1"]).fillna(0).to_numpy(np.float64)
        bg["lr"] = (np.log((cbt + 1.0) / (cut + vt))
                    - np.log((cbr + 1.0) / (cur + vr)))
        g = bg.groupby("doc_id", as_index=False).agg(
            n_bigrams=("lr", "size"), dsir_logratio=("lr", "sum"))
        g["n_bigrams"] = g["n_bigrams"].astype(np.int64)
        g["dsir_logratio"] = g["dsir_logratio"].round(6)
        return g

    out = _with_schema(
        ds.map_batches(score, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_bigrams": "int64",
         "dsir_logratio": "float64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q81_top_bigrams_cms(sf_dir: str) -> pd.DataFrame:
    """Sketch-ONLY heavy hitters: Misra-Gries surfaces WHICH bigrams
    are heavy (q69, one-sided underestimate), a Count-Min sketch
    answers HOW OFTEN with a one-sided overestimate — composed, the
    true count is bracketed n_mg <= true <= n_cms without any per-key
    shuffle anywhere (both sketches merge by elementwise ops through
    a reduce tree: per-batch partial → per-part sum → driver merge of
    P fixed-size matrices).  The scale story vs exact q35: shuffle
    bytes are O(P · d · w) regardless of corpus size.  Rows-only
    (approximate by design); test_training_ops gates the bracket and
    the CMS error bound against exact counts."""
    from event_deduplication_ray.functions.hashing import (
        hash_strings_u64,
        tokenize_offsets,
    )
    from event_deduplication_ray.functions.sketch import (
        cms_merge,
        cms_partial,
        cms_query,
    )

    mg = q69_top_bigrams_mg(sf_dir)
    ds = _read(sf_dir, "documents", ["text"])

    def cms_pass(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        if n < 2:
            M = cms_partial(np.zeros(0, np.uint64), np.zeros(0, np.int64))
        else:
            start_ok = np.ones(n, dtype=bool)
            ends = np.cumsum(lens)
            start_ok[ends[lens > 0] - 1] = False
            idx = np.flatnonzero(start_ok[:-1])
            vc = pd.Series(flat[idx] + " " + flat[idx + 1]).value_counts()
            keys = hash_strings_u64(vc.index.to_numpy(dtype=object))
            M = cms_partial(keys, vc.to_numpy(np.int64))
        part = int(M.sum()) % 8
        return pd.DataFrame({"part": np.array([part], np.int64),
                             "cms": [M.tobytes()]})

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"part": pd.Series(dtype="int64"),
                                 "cms": pd.Series(dtype="object")})
        mats = [np.frombuffer(b, np.int64).reshape(4, -1)
                for b in df["cms"]]
        return pd.DataFrame({"part": np.array([df["part"].iloc[0]], np.int64),
                             "cms": [cms_merge(mats).tobytes()]})

    parts = partition_apply(
        ds.map_batches(cms_pass, batch_format="pandas"),
        ["part"], 8, sum_part).to_pandas()
    M = cms_merge([np.frombuffer(b, np.int64).reshape(4, -1)
                   for b in parts["cms"]])

    out = mg.copy()
    keys = hash_strings_u64(out["ngram"].to_numpy(dtype=object)) \
        if len(out) else np.zeros(0, np.uint64)
    out["n_cms"] = cms_query(M, keys)
    return out.reset_index(drop=True)


def q79_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Tokenizer-coverage audit: fraction of each doc's tokens that
    fall outside the corpus vocabulary (tokens with global freq >= 5,
    q71's cutoff).  Pass 1 is q71's count-partial combine, but only
    the qualifying token strings return to the driver (the vocab is
    the genuinely small side) and broadcast once via ``ray.put``;
    pass 2 streams docs, explodes tokens and counts membership
    vectorized.  The rate ships as integer parts-per-million computed
    in exact int64 arithmetic — a float division would be
    tie-sensitive at round(6) between numpy and DuckDB."""
    import ray

    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy(np.int64)})

    def vocab_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n"].sum()
        return g[g["n"] >= 5][["token"]]

    vocab = _with_schema(
        partition_apply(
            ds.map_batches(tok_partial, batch_format="pandas"),
            ["token"], QCFG.join_num_partitions, vocab_part).to_pandas(),
        {"token": "object"})
    vocab_ref = ray.put(frozenset(vocab["token"].tolist()))

    def rate(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        flat, lens = tokenize_offsets(df["text"].str.lower())
        inv = pd.Series(flat).isin(v).to_numpy() if len(flat) \
            else np.array([], dtype=bool)
        ends = np.cumsum(lens)
        starts = ends - lens
        c = np.concatenate([[0], np.cumsum(~inv)]).astype(np.int64)
        n_oov = c[ends] - c[starts]
        n_tok = lens.astype(np.int64)
        ppm = np.where(n_tok > 0, (n_oov * 1_000_000) // np.maximum(n_tok, 1),
                       0).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_tok": n_tok, "n_oov": n_oov,
                             "oov_ppm": ppm})

    out = _with_schema(
        ds.map_batches(rate, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_tok": "int64", "n_oov": "int64",
         "oov_ppm": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q108_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75, Lucene idf) — the
    ranked counterpart of q89's boolean AND-search, completing the
    curation-search family (AND scan → posting-list index → ranked
    top-k).  Query = the corpus's two most frequent tokens, derived
    deterministically (q89's machinery).  Pass 1: tiny (n_docs, Σdl,
    df_t) partials per batch — the ONLY global state, broadcast in a
    closure.  Pass 2: one streaming pass scores every doc vectorized
    (per-term tf via the cumsum window trick) and keeps a per-batch
    top-10 partial; the driver merges P×10 rows.  Float parity with
    the SQL oracle holds because both engines evaluate the IDENTICAL
    expression tree on identical (tf, dl, df, N, Σdl) integers —
    constant literals (2.2, 1.2, 0.25, 0.75) are written, never
    derived — and the two-term sum is order-insensitive in IEEE
    (a+b == b+a); ties break on doc_id."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy(np.int64)})

    def top2_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n"].sum()
        return g.sort_values(["n", "token"],
                             ascending=[False, True]).head(2)

    cand = _with_schema(
        partition_apply(
            ds.map_batches(tok_partial, batch_format="pandas"),
            ["token"], QCFG.join_num_partitions, top2_part).to_pandas(),
        {"token": "object", "n": "int64"})
    query = (cand.sort_values(["n", "token"], ascending=[False, True])
             .head(2)["token"].tolist())

    def _tf_dl(df: pd.DataFrame):
        flat, lens = tokenize_offsets(df["text"].str.lower())
        q = pd.Index(query)
        code = q.get_indexer(flat) if len(flat) else np.zeros(0, np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        tf = np.zeros((len(query), len(df)), np.int64)
        for qi in range(len(query)):
            c = np.concatenate([[0], np.cumsum(code == qi)]).astype(np.int64)
            tf[qi] = c[ends] - c[starts]
        return tf, lens.astype(np.int64)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _tf_dl(df)
        row = {"n_docs": [len(df)], "sum_dl": [int(dl.sum())]}
        for qi in range(len(query)):
            row[f"df_{qi}"] = [int((tf[qi] > 0).sum())]
        return pd.DataFrame(row)

    st_cols = {"n_docs": "int64", "sum_dl": "int64",
               **{f"df_{qi}": "int64" for qi in range(len(query))}}
    st = _with_schema(
        ds.map_batches(stats_partial, batch_format="pandas").to_pandas(),
        st_cols)
    n_docs = int(st["n_docs"].sum())
    sum_dl = int(st["sum_dl"].sum())
    dfs = [int(st[f"df_{qi}"].sum()) for qi in range(len(query))]
    avgdl = sum_dl / n_docs if n_docs else 1.0

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        tf, dl = _tf_dl(df)
        dlf = dl.astype(np.float64)
        score = np.zeros(len(df))
        for qi in range(len(query)):
            idf = np.log((n_docs - dfs[qi] + 0.5) / (dfs[qi] + 0.5) + 1.0)
            tff = tf[qi].astype(np.float64)
            score = score + idf * (tff * 2.2) \
                / (tff + 1.2 * (0.25 + 0.75 * dlf / avgdl))
        ids = df["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, -score))[:10]
        return pd.DataFrame({"doc_id": ids[order], "score": score[order]})

    parts = _with_schema(
        ds.map_batches(score_topk, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "score": "float64"})
    parts = parts.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(10)
    parts["bm25"] = parts["score"].round(6)
    return parts[["doc_id", "bm25"]].reset_index(drop=True)


def q109_lexical_diversity(sf_dir: str) -> pd.DataFrame:
    """Lexical-diversity audit: per-doc type-token ratio and hapax
    (once-only) rate — the MTLD/TTR family of quality signals a
    curation pipeline gates on (templated/spam pages sit at extreme
    TTRs).  Pure map stage: one tokenization per batch, per-doc
    distinct/hapax counts via a single vectorized groupby over
    (doc, token-code) pairs — no per-row loops, nothing shuffles.
    Ratios are exact int64 ppm (floor division) so no float rounding
    can split the engines (the q79 lesson)."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n_tok = lens.astype(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        if len(flat) == 0:
            z = np.zeros(len(df), np.int64)
            return pd.DataFrame({"doc_id": ids, "n_tok": n_tok,
                                 "n_types": z, "n_hapax": z,
                                 "ttr_ppm": z, "hapax_ppm": z})
        codes = pd.factorize(flat)[0].astype(np.int64)
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        pair = pd.DataFrame({"d": doc_idx, "c": codes})
        cnt = pair.groupby(["d", "c"], sort=False).size()
        per = cnt.groupby(level="d")
        n_types = np.zeros(len(df), np.int64)
        n_hapax = np.zeros(len(df), np.int64)
        n_types[per.size().index.to_numpy()] = per.size().to_numpy(np.int64)
        hap = cnt[cnt == 1].groupby(level="d").size()
        n_hapax[hap.index.to_numpy()] = hap.to_numpy(np.int64)
        denom = np.maximum(n_tok, 1)
        return pd.DataFrame({
            "doc_id": ids, "n_tok": n_tok, "n_types": n_types,
            "n_hapax": n_hapax,
            "ttr_ppm": np.where(n_tok > 0,
                                (n_types * 1_000_000) // denom, 0),
            "hapax_ppm": np.where(n_tok > 0,
                                  (n_hapax * 1_000_000) // denom, 0)})

    cols = {"doc_id": "int64", "n_tok": "int64", "n_types": "int64",
            "n_hapax": "int64", "ttr_ppm": "int64", "hapax_ppm": "int64"}
    out = _with_schema(
        ds.map_batches(stats, batch_format="pandas").to_pandas(), cols)
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q110_quality_mix_sample(sf_dir: str) -> pd.DataFrame:
    """Quality-bucketed mixing sample (pretraining data-mix prep):
    keep every doc at/above its language's EXACT median token count,
    and deterministically downsample the below-median bucket to 25 %.
    Composes two proven-parity primitives: q34's histogram-partial
    exact percentile (the median ships as a tiny broadcast) and q51's
    fmix32 hash-Bernoulli (threshold 2^30 = exactly 0.25), so the
    kept set is bit-reproducible across engines AND across resumes —
    no RNG state anywhere.  Two streaming passes; the only shuffle
    carries one row per distinct (lang, n_tok)."""
    from event_deduplication_ray.functions.hashing import (
        sample_hash32,
        tokenize_offsets,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        g = pd.DataFrame({"lang": df["lang"].to_numpy(),
                          "n_tok": lens.astype(np.int64)})
        out = g.groupby(["lang", "n_tok"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    def median_of(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_tok"], as_index=False)["n"].sum()
        rows = []
        for lang, sub in g.groupby("lang"):
            sub = sub.sort_values("n_tok")
            vals = sub["n_tok"].to_numpy()
            cum = np.cumsum(sub["n"].to_numpy())
            total = int(cum[-1])
            k = (total + 1) // 2          # ceil(0.5 * n), exact
            rows.append({"lang": lang,
                         "med": int(vals[np.searchsorted(cum, max(k, 1))])})
        return pd.DataFrame(rows)

    med = _with_schema(
        partition_apply(ds.map_batches(tok_partial, batch_format="pandas"),
                        ["lang"], QCFG.join_num_partitions,
                        median_of).to_pandas(),
        {"lang": "object", "med": "int64"})
    med_map = dict(zip(med["lang"], med["med"].astype(int)))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        n_tok = lens.astype(np.int64)
        meds = df["lang"].map(med_map).to_numpy(np.int64)
        hi = n_tok >= meds
        ids = df["doc_id"].to_numpy(np.int64)
        keep = hi | (sample_hash32(ids) < np.uint64(1_073_741_824))
        return pd.DataFrame({
            "doc_id": ids[keep],
            "lang": df["lang"].to_numpy()[keep],
            "n_tok": n_tok[keep],
            "bucket": np.where(hi[keep], "hi", "lo")})

    out = _with_schema(
        ds.map_batches(pick, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "lang": "object", "n_tok": "int64",
         "bucket": "object"})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_tok"] = out["n_tok"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q111_domain_mix_report(sf_dir: str) -> pd.DataFrame:
    """Domain-mixing report (multinomial/temperature sampling prep):
    per source, doc and token counts, the EXACT int64 ppm token
    share, and the α=0.5 temperature-scaled sampling weight
    √(share) — the standard up-weight-the-tail transform used when
    drawing a pretraining mixture.  w_temp is left UNNORMALIZED
    (normalizing means dividing by a float sum whose accumulation
    order differs between engines; the caller divides by Σw once).
    One streaming pass of tiny (source, n_docs, n_tok) partials; the
    sqrt runs on the identical share double in both engines."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        g = pd.DataFrame({"source": df["source"].to_numpy(),
                          "n_tok": lens.astype(np.int64)})
        out = g.groupby("source", as_index=False).agg(
            n_docs=("n_tok", "size"), n_tokens=("n_tok", "sum"))
        return out

    parts = _with_schema(
        ds.map_batches(partial, batch_format="pandas").to_pandas(),
        {"source": "object", "n_docs": "int64", "n_tokens": "int64"})
    comb = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
    total = int(comb["n_tokens"].sum())
    comb["n_docs"] = comb["n_docs"].astype("int64")
    comb["n_tokens"] = comb["n_tokens"].astype("int64")
    if total > 0:
        comb["share_ppm"] = (comb["n_tokens"].to_numpy(np.int64)
                             * 1_000_000) // total
        comb["w_temp"] = np.round(np.sqrt(
            comb["n_tokens"].to_numpy(np.int64) / total), 6)
    else:
        comb["share_ppm"] = np.int64(0)
        comb["w_temp"] = 0.0
    comb["share_ppm"] = comb["share_ppm"].astype("int64")
    return comb.sort_values("source").reset_index(drop=True)


def q112_semantic_outliers(sf_dir: str) -> pd.DataFrame:
    """Semantic-outlier audit (embedding-space quality control, the
    distributional complement of q98's norm hygiene): the 5 vectors
    per label FARTHEST from their own label centroid by cosine —
    mislabeled or contaminated points surface here first (the
    SemDeDup-family 'prune far-from-centroid' signal).  Pass 1 is
    q92's mergeable (sum-matrix, n) centroid partials; pass 2 streams
    once computing dot/(‖v‖·‖c‖) — the same expression tree as SQL's
    list_cosine_similarity — and keeps per-(label, batch) bottom-5
    partials, so only P×5×|labels| tiny rows reach the driver.
    Float caveat (q11 class): cosines differ across engines at ~1e-16
    summation order; round(6) absorbs it away from measure-zero
    boundaries."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def cent_partial(t: pa.Table) -> pa.Table:
        m = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        lab = t["label"].to_numpy().astype(np.int64)
        labs = np.unique(lab)
        sums = np.zeros((len(labs), m.shape[1]))
        ns = np.zeros(len(labs), np.int64)
        for j, lv in enumerate(labs):
            sel = lab == lv
            sums[j] = m[sel].sum(axis=0)
            ns[j] = int(sel.sum())
        return pa.table({"label": pa.array(labs),
                         "n": pa.array(ns),
                         "s": pa.array([r.tobytes() for r in sums],
                                       pa.binary())})

    parts = emb.map_batches(cent_partial, batch_format="pyarrow").to_pandas()
    parts["sv"] = parts["s"].map(lambda b: np.frombuffer(b, np.float64))
    g = parts.groupby("label")
    labels = np.array(sorted(g.groups), np.int64)
    cents = np.vstack([
        np.sum(np.vstack(g.get_group(lv)["sv"].to_numpy()), axis=0)
        / g.get_group(lv)["n"].sum() for lv in labels])
    cnorm = np.linalg.norm(cents, axis=1)
    ref = ray.put((labels, cents, cnorm))

    def bottom5(t: pa.Table) -> pa.Table:
        labs, c, cn = ray.get(ref)
        m = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        lab = t["label"].to_numpy().astype(np.int64)
        pos = np.searchsorted(labs, lab)
        vn = np.linalg.norm(m, axis=1)
        dot = np.einsum("ij,ij->i", m, c[pos])
        cos = dot / (vn * cn[pos])
        ids = t["vec_id"].to_numpy().astype(np.int64)
        out = {"label": [], "vec_id": [], "cos": []}
        for lv in np.unique(lab):
            sel = np.flatnonzero(lab == lv)
            order = sel[np.lexsort((ids[sel], cos[sel]))[:5]]
            out["label"].extend([lv] * len(order))
            out["vec_id"].extend(ids[order])
            out["cos"].extend(cos[order])
        return pa.table({"label": pa.array(out["label"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "cos": pa.array(out["cos"], pa.float64())})

    df = _with_schema(
        emb.map_batches(bottom5, batch_format="pyarrow").to_pandas(),
        {"label": "int64", "vec_id": "int64", "cos": "float64"})
    df = df.sort_values(["label", "cos", "vec_id"]).groupby("label") \
        .head(5)
    df["cos"] = df["cos"].round(6)
    return df.reset_index(drop=True)[["label", "vec_id", "cos"]]


def q113_late_data_drop(sf_dir: str) -> pd.DataFrame:
    """Streaming watermark semantics as a deterministic batch op: per
    user, events are processed in event_id (arrival) order and an
    event is DROPPED when its timestamp is more than 10 minutes
    behind the user's high-water mark (max event-time seen so far) —
    the allowed-lateness rule of a streaming engine, reproducible in
    batch because arrival order is a column.  ONE user shuffle, then
    a vectorized per-user shifted cummax in exact integer µs; the
    boundary is strict (exactly 10 min behind is kept).  Returns the
    dropped rows with how far behind the mark each was."""
    from event_deduplication_ray.stages.shuffle import partition_apply

    late_us = 10 * 60 * 1_000_000

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def drops(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "event_id": pd.Series(dtype="int64"),
                              "ts": pd.Series(dtype="object"),
                              "behind_us": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        t_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        df["_ts_us"] = t_us
        cm = df.groupby("user_id")["_ts_us"].cummax() \
            .to_numpy(np.int64)                 # int64 end to end
        first = np.concatenate([[True], u[1:] != u[:-1]])
        hwm = np.empty(len(u), np.int64)
        hwm[0] = 0
        hwm[1:] = cm[:-1]                        # prior event's cummax
        late = (~first) & (t_us < hwm - late_us)
        if not late.any():
            return empty
        out = df.loc[late]
        return pd.DataFrame({
            "user_id": u[late],
            "event_id": out["event_id"].to_numpy(np.int64),
            "ts": out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "behind_us": hwm[late] - t_us[late]})

    out = _with_schema(
        partition_apply(ds, ["user_id"], QCFG.join_num_partitions,
                        drops).to_pandas(),
        {"user_id": "int64", "event_id": "int64", "ts": "object",
         "behind_us": "int64"})
    out["user_id"] = out["user_id"].astype("int64")
    out["event_id"] = out["event_id"].astype("int64")
    out["behind_us"] = out["behind_us"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q114_lang_embedding_coherence(sf_dir: str) -> pd.DataFrame:
    """Cross-table audit joining the text and embedding modalities on
    their shared id (doc_id = vec_id): per language, how tightly that
    language's documents cluster in embedding space — mean cosine to
    the language centroid.  A language whose coherence collapses
    signals mislabeled lang-id or a contaminated embedding batch.
    Shape: the embeddings shuffle ONCE (`shuffle_to`) and BOTH passes
    cogroup the narrow (doc_id, lang) side against it — pass 1 emits
    per-lang (n, Σvec) centroid partials, pass 2 per-lang (n, Σcos)
    — so vectors cross the wire exactly once.  Float caveat: q112's
    (summation-order ulp under round 6)."""
    import ray

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to
    from event_deduplication_ray.stages.similarity import _emb_matrix

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    emb_sh = shuffle_to(emb, ["vec_id"], QCFG.join_num_partitions)
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _aligned(l: pa.Table, r: pa.Table):
        ids_r = r["vec_id"].to_numpy()
        m = _emb_matrix(r["embedding"])
        order = np.argsort(ids_r, kind="stable")
        ids_s = ids_r[order]
        ids_l = l["doc_id"].to_numpy()
        pos = np.searchsorted(ids_s, ids_l)
        pos_c = np.minimum(pos, max(len(ids_s) - 1, 0))
        sel = (len(ids_s) > 0) & (ids_s[pos_c] == ids_l)
        langs = np.asarray(l["lang"].to_numpy(zero_copy_only=False))[sel]
        return langs, m[order[pos_c[sel]]]

    def cent_partial(l: pa.Table, r: pa.Table) -> pa.Table:
        if len(l) == 0 or len(r) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.binary())})
        langs, m = _aligned(l, r)
        uls = np.unique(langs)
        return pa.table({
            "lang": pa.array(uls),
            "n": pa.array([int((langs == lv).sum()) for lv in uls],
                          pa.int64()),
            "s": pa.array([m[langs == lv].sum(axis=0).tobytes()
                           for lv in uls], pa.binary())})

    parts = cogroup_apply(docs, emb_sh, ["doc_id"], ["vec_id"],
                          QCFG.join_num_partitions, cent_partial,
                          batch_format="pyarrow").to_pandas()
    parts = _with_schema(parts, {"lang": "object", "n": "int64",
                                 "s": "object"})
    cents = {}
    for lv, sub in parts.groupby("lang"):
        s = np.sum(np.vstack([np.frombuffer(b, np.float64)
                              for b in sub["s"]]), axis=0)
        c = s / sub["n"].sum()
        cents[lv] = (c, np.linalg.norm(c))
    ref = ray.put(cents)

    def cos_partial(l: pa.Table, r: pa.Table) -> pa.Table:
        if len(l) == 0 or len(r) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "sc": pa.array([], pa.float64())})
        cmap = ray.get(ref)
        langs, m = _aligned(l, r)
        vn = np.linalg.norm(m, axis=1)
        uls = np.unique(langs)
        ns, scs = [], []
        for lv in uls:
            sel = langs == lv
            c, cn = cmap[lv]
            cos = (m[sel] @ c) / (vn[sel] * cn)
            ns.append(int(sel.sum()))
            scs.append(float(cos.sum()))
        return pa.table({"lang": pa.array(uls),
                         "n": pa.array(ns, pa.int64()),
                         "sc": pa.array(scs, pa.float64())})

    out = cogroup_apply(docs, emb_sh, ["doc_id"], ["vec_id"],
                        QCFG.join_num_partitions, cos_partial,
                        batch_format="pyarrow").to_pandas()
    out = _with_schema(out, {"lang": "object", "n": "int64",
                             "sc": "float64"})
    g = out.groupby("lang", as_index=False).agg(
        n_vecs=("n", "sum"), sc=("sc", "sum"))
    g["n_vecs"] = g["n_vecs"].astype("int64")
    g["mean_cos"] = (g["sc"] / g["n_vecs"]).round(6)
    return g[["lang", "n_vecs", "mean_cos"]] \
        .sort_values("lang").reset_index(drop=True)


def q115_mixture_draw(sf_dir: str, n_target: int = 100) -> pd.DataFrame:
    """Materialize a deterministic training mixture (the draw step
    after q111's report): each source gets an integer quota
    ⌊N·share_ppm/10⁶⌋ proportional to its EXACT token share, and its
    quota is filled by the docs with the smallest fmix32 hash — a
    reproducible 'random' draw with zero RNG state, stable under
    resume and across engines.  Pass 1 reuses q111's tiny per-source
    partials for the quotas; pass 2 streams once keeping per-batch
    per-source bottom-quota partials (the q86 eviction-safe shape),
    so at most P·Σquota rows reach the driver."""
    from event_deduplication_ray.functions.hashing import (
        sample_hash32,
        tokenize_offsets,
    )

    rep = q111_domain_mix_report(sf_dir)
    total = int(rep["n_tokens"].sum())
    if total == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "source": pd.Series(dtype="object"),
                             "h": pd.Series(dtype="int64")})
    quota = {s: (n_target * int(p)) // 1_000_000
             for s, p in zip(rep["source"], rep["share_ppm"])}
    max_q = max(quota.values())

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def bottomq(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = sample_hash32(ids).astype(np.int64)
        d = pd.DataFrame({"doc_id": ids,
                          "source": df["source"].to_numpy(), "h": h})
        d = d.sort_values(["h", "doc_id"])
        return d.groupby("source", sort=False).head(max_q)

    parts = _with_schema(
        ds.map_batches(bottomq, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "source": "object", "h": "int64"})
    parts = parts.sort_values(["h", "doc_id"])
    out = []
    for s, sub in parts.groupby("source", sort=False):
        q = quota.get(s, 0)
        if q > 0:
            out.append(sub.head(q))
    if not out:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "source": pd.Series(dtype="object"),
                             "h": pd.Series(dtype="int64")})
    res = pd.concat(out)
    res["doc_id"] = res["doc_id"].astype("int64")
    res["h"] = res["h"].astype("int64")
    return res[["doc_id", "source", "h"]] \
        .sort_values("doc_id").reset_index(drop=True)


def q116_packed_shards(sf_dir: str) -> pd.DataFrame:
    """Tokenize→ids→pack→shard sink (pipelines/tokenize_pack.py) run
    over this tier's documents table into a scratch dir; returns the
    per-lang shard summary.  Rows-only: the real gate is the
    round-trip pytest (shards decode back to every doc's in-vocab
    token stream in order, OOV holds position, budget respected)."""
    import tempfile

    from event_deduplication_ray.pipelines.tokenize_pack import (
        write_packed_shards,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    out = tempfile.mkdtemp(prefix="edr_shards_", dir="/tmp")
    return write_packed_shards(ds, out, budget=512,
                               num_partitions=QCFG.join_num_partitions)


def q117_bpe_merges(sf_dir: str, n_merges: int = 20) -> pd.DataFrame:
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016
    — the tokenizer-TRAINING verb beside q77's tokenizer-APPLICATION):
    greedy top-pair merges over character sequences weighted by word
    frequency.  The distributed part is the word-count pass (q71's
    partials — at 100 TB the corpus streams, the distinct-word table
    is vocab-bounded); the merge loop then runs on the driver over
    that bounded frequency table, exactly like the contracted
    union-find: per-iteration cost scales with |vocab|, never corpus
    size.  Deterministic: ties break on the lexicographically
    smallest (left, right) pair.  Rows-only (iterative algorithm —
    no SQL equivalent); pytest pins the merge sequence on a
    hand-worked corpus."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["text"])

    def wc_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"word": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy(np.int64)})

    def wc_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", as_index=False)["n"].sum()

    wf = _with_schema(
        partition_apply(ds.map_batches(wc_partial, batch_format="pandas"),
                        ["word"], QCFG.join_num_partitions,
                        wc_combine).to_pandas(),
        {"word": "object", "n": "int64"})

    words = [(tuple(w), int(n)) for w, n in zip(wf["word"], wf["n"])]
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l_s, r_s), cnt = best
        merges.append({"rank": rank, "left": l_s, "right": r_s,
                       "pair_count": cnt})
        joined = l_s + r_s
        new_words = []
        for syms, n in words:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l_s
                        and syms[i + 1] == r_s):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), n))
        words = new_words
    out = pd.DataFrame(merges, columns=["rank", "left", "right",
                                        "pair_count"])
    out["rank"] = out["rank"].astype("int64")
    out["pair_count"] = out["pair_count"].astype("int64")
    return out


def q118_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6-style forecast-revenue change: one streaming
    predicate pass (ship year 1997, discount 5–7 %, quantity < 24)
    summing l_extendedprice·l_discount in EXACT int64 cents·pct
    units — the simplest classic shape, zero shuffles, one tiny
    partial per batch.  Discount bounds compare as exact integer
    pct (the floats 0.05/0.07 are not exactly representable)."""
    import pyarrow.compute as pc

    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1998-01-01")

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"],
                                              pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        pct = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.round(t["l_quantity"].to_numpy()).astype(np.int64)
        keep = (pct >= 5) & (pct <= 7) & (qty < 24)
        cents = np.round(t["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        return pa.table({"rev_u": [int((cents * pct[keep]).sum())]})

    parts = _with_schema(
        li.map_batches(partial, batch_format="pyarrow").to_pandas(),
        {"rev_u": "int64"})
    return pd.DataFrame({"revenue": [int(parts["rev_u"].sum()) / 10000.0]})


def q119_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8-style market share: NATION_3's share of PROMO-part
    revenue sold to customers of NATION_0–4 ("the region"), per order
    year.  All the small sides (promo partkeys, region custkeys,
    supplier→nation) broadcast; lineitem pre-aggregates (orderkey,
    is_target_supp, rev) in the split wave; the ONLY big-big exchange
    is the q50 orderkey cogroup against date-filtered orders.  The
    share divides once per year on the driver from exact int64
    units (the q85 rule)."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1998-01-01")
    region_nations = {0, 1, 2, 3, 4}
    target_nation = 3

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = np.unique(part["p_partkey"].to_numpy()[
        np.asarray(part["p_type"].to_numpy(zero_copy_only=False)
                   == "PROMO")])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    target_supp = np.unique(sup["s_suppkey"].to_numpy()[
        sup["s_nationkey"].to_numpy() == target_nation])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    region_cust = np.unique(cust["c_custkey"].to_numpy()[
        np.isin(cust["c_nationkey"].to_numpy(),
                sorted(region_nations))])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        keep = np.isin(t["l_partkey"].to_numpy(), promo)
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy()[keep],
            "is_target": np.isin(t["l_suppkey"].to_numpy()[keep],
                                 target_supp)})
        cents = np.round(t["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        pct = np.round((1.0 - t["l_discount"].to_numpy()[keep])
                       * 100).astype(np.int64)
        df["rev_u"] = cents * pct
        g = df.groupby(["l_orderkey", "is_target"],
                       as_index=False)["rev_u"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"],
                                              pa.scalar(lo)),
                             pc.less(t["o_orderdate"], pa.scalar(hi))))
        keep = np.isin(t["o_custkey"].to_numpy(), region_cust)
        df = t.to_pandas()[keep]
        df["o_year"] = df["o_orderdate"].dt.strftime("%Y")
        return pa.Table.from_pandas(df[["o_orderkey", "o_year"]],
                                    preserve_index=False)

    o_ds = orders.map_batches(ofilt, batch_format="pyarrow")

    empty = {"o_year": pd.Series(dtype="object"),
             "target_u": pd.Series(dtype="int64"),
             "total_u": pd.Series(dtype="int64")}

    def joinagg(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        m = r.merge(l, left_on="l_orderkey", right_on="o_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        tgt = np.where(m["is_target"].to_numpy(bool),
                       m["rev_u"].to_numpy(np.int64), 0)
        g = pd.DataFrame({"o_year": m["o_year"], "target_u": tgt,
                          "total_u": m["rev_u"].to_numpy(np.int64)})
        return g.groupby("o_year", as_index=False).sum()

    df = cogroup_apply(o_ds, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, joinagg).to_pandas()
    df = _with_schema(df, {"o_year": "object", "target_u": "int64",
                           "total_u": "int64"})
    out = df.groupby("o_year", as_index=False).sum()
    out["target_u"] = out["target_u"].astype("int64")
    out["total_u"] = out["total_u"].astype("int64")
    out["mkt_share"] = (out["target_u"] / out["total_u"]).round(6)
    out = out.rename(columns={"target_u": "nation_u",
                              "total_u": "region_u"})
    return out[["o_year", "nation_u", "region_u", "mkt_share"]] \
        .sort_values("o_year").reset_index(drop=True)


def q120_dup_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Dup-graph degree distribution (graph diagnostics beside q91's
    cluster sizes): how many docs carry 0, 1, 2… exact-Jaccard dup
    edges — the readout that separates pairwise dups (degree 1) from
    boilerplate hubs (high degree) and tells the hot-band capping
    machinery what the real world looks like.  Engine: q28's exact
    edge table (deterministic, hence SQL-checkable) → both directions
    explode → per-batch per-doc degree partials → ONE compact doc_id
    shuffle → histogram; degree-0 count is derived on the driver from
    the table's row count (the q74 k=0 trick — no LEFT JOIN
    materializes)."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.shuffle import partition_apply
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir).materialize()
    n_docs = docs.count()
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(docs, cfg), cfg),
        cfg, threshold=cfg.jaccard_match)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df["id_a"].to_numpy(np.int64),
                              df["id_b"].to_numpy(np.int64)])
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"doc_id": u, "deg": c.astype(np.int64)})

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)["deg"].sum()
        h = g.groupby("deg", as_index=False).size()
        return h.rename(columns={"size": "n_docs"})

    parts = _with_schema(
        partition_apply(pairs.map_batches(explode, batch_format="pandas"),
                        ["doc_id"], QCFG.join_num_partitions,
                        hist).to_pandas(),
        {"deg": "int64", "n_docs": "int64"})
    out = parts.groupby("deg", as_index=False)["n_docs"].sum()
    n_with_edges = int(out["n_docs"].sum())
    zero = pd.DataFrame({"deg": [0], "n_docs": [n_docs - n_with_edges]})
    out = pd.concat([zero, out], ignore_index=True)
    out["deg"] = out["deg"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("deg").reset_index(drop=True)


def q121_user_entropy(sf_dir: str) -> pd.DataFrame:
    """Behavioral-diversity audit: per-user Shannon entropy of the
    event-type distribution (bots/monitors sit at 0; organic users
    spread).  Per-batch (user, type) count partials → ONE user
    shuffle → H = ln(n) − Σc·ln(c)/n per user, evaluated from exact
    integer counts so both engines ln the identical rationals (the
    q64 summed-logs precedent: a handful of ln terms under round 6).
    Output is one row per user."""
    from event_deduplication_ray.stages.shuffle import partition_apply

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False)["c"].sum()
        c = g["c"].to_numpy(np.int64).astype(np.float64)
        clnc = c * np.log(c)
        per = pd.DataFrame({"user_id": g["user_id"], "clnc": clnc,
                            "c": g["c"].to_numpy(np.int64)})
        agg = per.groupby("user_id", as_index=False).agg(
            n=("c", "sum"), s=("clnc", "sum"),
            n_types=("c", "size"))
        n = agg["n"].to_numpy(np.int64).astype(np.float64)
        agg["entropy"] = np.round(np.log(n) - agg["s"].to_numpy() / n, 6)
        agg["n"] = agg["n"].astype("int64")
        agg["n_types"] = agg["n_types"].astype("int64")
        return agg[["user_id", "n", "n_types", "entropy"]]

    out = _with_schema(
        partition_apply(ds.map_batches(partial, batch_format="pandas"),
                        ["user_id"], QCFG.join_num_partitions,
                        entropy).to_pandas(),
        {"user_id": "int64", "n": "int64", "n_types": "int64",
         "entropy": "float64"})
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["n_types"] = out["n_types"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q122_length_percentile(sf_dir: str) -> pd.DataFrame:
    """Exact per-lang percent-rank normalization: each doc's token
    count mapped to its in-language rank ppm ((n_smaller·10⁶)//(n−1)
    — the window-function percent_rank made EXACT-integer so no
    float rank can split the engines).  The per-lang value histogram
    broadcasts (one row per distinct (lang, n_tok) — q34's compact
    state), and the rank pass is a streaming searchsorted per batch;
    no row-level sort shuffle anywhere (the q68 no-sort-barrier
    shape, made per-group)."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets
    from event_deduplication_ray.stages.shuffle import partition_apply

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        g = pd.DataFrame({"lang": df["lang"].to_numpy(),
                          "n_tok": lens.astype(np.int64)})
        out = g.groupby(["lang", "n_tok"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    hist = _with_schema(
        partition_apply(ds.map_batches(tok_partial, batch_format="pandas"),
                        ["lang", "n_tok"], QCFG.join_num_partitions,
                        lambda df: df.groupby(["lang", "n_tok"],
                                              as_index=False)["n"].sum())
        .to_pandas(),
        {"lang": "object", "n_tok": "int64", "n": "int64"})
    cum = {}
    for lang, sub in hist.groupby("lang"):
        sub = sub.sort_values("n_tok")
        vals = sub["n_tok"].to_numpy(np.int64)
        below = np.concatenate([[0], np.cumsum(sub["n"].to_numpy())[:-1]]) \
            .astype(np.int64)
        cum[lang] = (vals, below, int(sub["n"].sum()))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        n_tok = lens.astype(np.int64)
        langs = df["lang"].to_numpy()
        ppm = np.zeros(len(df), np.int64)
        for lang in pd.unique(langs):
            vals, below, n = cum[lang]
            sel = langs == lang
            pos = np.searchsorted(vals, n_tok[sel])
            smaller = below[np.minimum(pos, len(below) - 1)]
            ppm[sel] = (smaller * 1_000_000) // max(n - 1, 1)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "lang": langs, "n_tok": n_tok,
                             "pr_ppm": ppm})

    out = _with_schema(
        ds.map_batches(rank, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "lang": "object", "n_tok": "int64",
         "pr_ppm": "int64"})
    for c in ("doc_id", "n_tok", "pr_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q123_dup_pagerank(sf_dir: str, n_iters: int = 8,
                      damping: float = 0.85) -> pd.DataFrame:
    """PageRank over the exact-Jaccard dup graph — the iterative
    graph op beyond union-find's reachability: boilerplate hubs
    accumulate rank that plain degree (q120) undersells when hubs
    chain.  Shape: the bidirectional edge table hash-partitions ONCE
    by src and stays resident (`shuffle_to`); each iteration
    broadcasts the current (node → rank/degree) map (bounded by docs
    WITH edges — the graph's vertex set, not the corpus), scatters
    contributions inside the partitions, and folds per-partition
    partial sums on the driver — the union-find round loop's shape
    with float mass instead of min-labels.  Rows-only (iterative
    float fixpoint); isolated docs hold the teleport floor by
    construction and are reported via the n_isolated column of the
    summary row."""
    import ray

    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.shuffle import partition_apply, shuffle_to
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir).materialize()
    n_docs = docs.count()
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(docs, cfg), cfg),
        cfg, threshold=cfg.jaccard_match)

    def bidir(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    edges_sh = shuffle_to(pairs.map_batches(bidir, batch_format="pyarrow"),
                          ["src"], QCFG.join_num_partitions)

    deg = partition_apply(
        edges_sh, ["src"], QCFG.join_num_partitions,
        lambda df: df.groupby("src", as_index=False).size()
        .rename(columns={"size": "deg"})).to_pandas()
    deg = _with_schema(deg, {"src": "int64", "deg": "int64"})
    if len(deg) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="float64"),
                             "n_isolated": pd.Series(dtype="int64")})
    nodes = deg["src"].to_numpy(np.int64)
    degs = deg["deg"].to_numpy(np.int64)
    order = np.argsort(nodes)
    nodes, degs = nodes[order], degs[order]
    n_nodes = len(nodes)
    rank = np.full(n_nodes, 1.0 / n_nodes)

    for _ in range(n_iters):
        contrib = rank / degs
        ref = ray.put((nodes, contrib))

        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            nd, cb = ray.get(ref)
            pos = np.searchsorted(nd, df["src"].to_numpy(np.int64))
            g = pd.DataFrame({"dst": df["dst"].to_numpy(np.int64),
                              "m": cb[pos]})
            return g.groupby("dst", as_index=False)["m"].sum()

        parts = partition_apply(edges_sh, ["src"],
                                QCFG.join_num_partitions,
                                scatter).to_pandas()
        parts = _with_schema(parts, {"dst": "int64", "m": "float64"})
        inc = parts.groupby("dst")["m"].sum()
        mass = np.zeros(n_nodes)
        pos = np.searchsorted(nodes, inc.index.to_numpy(np.int64))
        mass[pos] = inc.to_numpy()
        rank = (1 - damping) / n_nodes + damping * mass

    out = pd.DataFrame({"doc_id": nodes, "rank": np.round(rank, 8)})
    out = out.sort_values(["rank", "doc_id"],
                          ascending=[False, True]).head(50)
    out["n_isolated"] = np.int64(n_docs - n_nodes)
    return out.reset_index(drop=True)


def q124_cluster_labels(sf_dir: str) -> pd.DataFrame:
    """Cluster labeling: the top-3 TF-IDF terms of every multi-doc
    dup cluster — the explainability readout a reviewer sees next to
    a merge decision (reference Q4's detail join, re-keyed to 'WHY
    did these cluster').  Shape: q28's deterministic assignments
    reduce to the multi-cluster membership (bounded by dup docs — a
    small corpus fraction); one streaming pass counts (cluster,
    term) for member docs; document frequencies are computed ONLY
    for the cluster terms (their set broadcasts); score = n·ln(N/df)
    from exact integer counts, ties break on the term."""
    from event_deduplication_ray.functions.text import normalize_text
    from event_deduplication_ray.stages.shuffle import partition_apply

    asn = q28_ngram_jaccard_clusters(sf_dir)

    def multi_members(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id")["doc_id"].transform("size")
        return df[g >= 2]

    members = _with_schema(
        partition_apply(asn, ["cluster_id"], QCFG.join_num_partitions,
                        multi_members).to_pandas(),
        {"doc_id": "int64", "cluster_id": "int64"})
    if len(members) == 0:
        return pd.DataFrame({"cluster_id": pd.Series(dtype="int64"),
                             "token": pd.Series(dtype="object"),
                             "score": pd.Series(dtype="float64")})
    mem_map = dict(zip(members["doc_id"].astype(int),
                       members["cluster_id"].astype(int)))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def term_counts(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["doc_id"].isin(mem_map)
        if not keep.any():
            return pd.DataFrame({"cluster_id": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        sub = df[keep]
        toks = normalize_text(sub["text"]).str.split()
        rows = pd.DataFrame({
            "cluster_id": np.repeat(
                sub["doc_id"].map(mem_map).to_numpy(np.int64),
                toks.str.len().to_numpy(np.int64)),
            "token": np.concatenate([np.asarray(t, object)
                                     for t in toks if len(t)])
            if toks.str.len().sum() else np.array([], object)})
        g = rows.groupby(["cluster_id", "token"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    tc = _with_schema(
        docs.map_batches(term_counts, batch_format="pandas").to_pandas(),
        {"cluster_id": "int64", "token": "object", "n": "int64"})
    tc = tc.groupby(["cluster_id", "token"], as_index=False)["n"].sum()
    needed = frozenset(tc["token"])

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = normalize_text(df["text"]).str.split()
        uniq = [np.unique(np.asarray(t, object)) for t in toks if len(t)]
        if not uniq:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64")})
        flat = np.concatenate(uniq)
        flat = flat[pd.Series(flat).isin(needed).to_numpy()]
        u, c = np.unique(flat, return_counts=True)
        return pd.DataFrame({"token": u, "df": c.astype(np.int64)})

    dfs = _with_schema(
        docs.map_batches(df_partial, batch_format="pandas").to_pandas(),
        {"token": "object", "df": "int64"})
    dfs = dfs.groupby("token", as_index=False)["df"].sum()

    sc = tc.merge(dfs, on="token")
    sc["score"] = np.round(
        sc["n"].to_numpy(np.int64)
        * np.log(n_docs / sc["df"].to_numpy(np.int64)), 6)
    sc = sc.sort_values(["cluster_id", "score", "token"],
                        ascending=[True, False, True])
    out = sc.groupby("cluster_id").head(3).copy()
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out[["cluster_id", "token", "score"]].reset_index(drop=True)


def q125_effective_tokens(sf_dir: str) -> pd.DataFrame:
    """Dedup-adjusted corpus size — the 'how much data do I really
    have' readout a pretraining plan is built on: total tokens vs
    tokens surviving exact-Jaccard dedup (one representative = min
    doc_id per cluster), and the duplicated share in exact ppm.
    Shape: q28's assignments reduce to the NON-representative member
    set (bounded by dup docs); one streaming token-count pass emits
    (total, dropped) partials per batch with the member set
    broadcast; a single summary row leaves the driver."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets
    from event_deduplication_ray.stages.shuffle import partition_apply

    asn = q28_ngram_jaccard_clusters(sf_dir)

    def non_reps(df: pd.DataFrame) -> pd.DataFrame:
        rep = df.groupby("cluster_id")["doc_id"].transform("min")
        out = df[df["doc_id"] != rep]
        return out[["doc_id"]]

    nr = _with_schema(
        partition_apply(asn, ["cluster_id"], QCFG.join_num_partitions,
                        non_reps).to_pandas(),
        {"doc_id": "int64"})
    dropped_ids = frozenset(nr["doc_id"].astype(int))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        n_tok = lens.astype(np.int64)
        dropped = df["doc_id"].isin(dropped_ids).to_numpy()
        return pd.DataFrame({
            "n_docs": [len(df)],
            "total_tokens": [int(n_tok.sum())],
            "dropped_tokens": [int(n_tok[dropped].sum())],
            "n_dropped_docs": [int(dropped.sum())]})

    parts = _with_schema(
        docs.map_batches(tok_partial, batch_format="pandas").to_pandas(),
        {"n_docs": "int64", "total_tokens": "int64",
         "dropped_tokens": "int64", "n_dropped_docs": "int64"})
    n_docs = int(parts["n_docs"].sum())
    total = int(parts["total_tokens"].sum())
    dropped = int(parts["dropped_tokens"].sum())
    n_dropped = int(parts["n_dropped_docs"].sum())
    return pd.DataFrame({
        "n_docs": pd.Series([n_docs], dtype="int64"),
        "n_kept_docs": pd.Series([n_docs - n_dropped], dtype="int64"),
        "total_tokens": pd.Series([total], dtype="int64"),
        "kept_tokens": pd.Series([total - dropped], dtype="int64"),
        "dup_token_ppm": pd.Series(
            [(dropped * 1_000_000) // total if total else 0],
            dtype="int64")})


def q126_doc_neighbors(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc near-dup lookup — the review-surface query 'show me
    THIS doc's nearest neighbors' (reference Q4's detail view,
    re-keyed to MinHash space).  Query docs = the 3 lowest doc_ids
    (deterministic, self-contained).  Shape: the signature stage's
    precomputed band keys select candidate buckets (the query docs'
    key set broadcasts — genuinely small); only colliding docs'
    folded signatures are compared, estimated Jaccard ranks the
    top-k per query with (sim desc, doc_id) tie-break.  Rows-only:
    MinHash estimates are hash-seeded (q20's class)."""
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG
    docs = _docs_from_documents(sf_dir).materialize()
    sigs = signature_stage(docs, cfg).materialize()

    # query docs: members of the SMALLEST colliding band key —
    # deterministic, and guarantees the lookup exercises a real
    # neighbor wherever any near-dup exists (the 3 lowest doc_ids of
    # a mostly-unique corpus would gate nothing); falls back to the
    # lowest doc_ids on a collision-free corpus
    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        bk = df["band_keys"].to_numpy()
        lens = np.fromiter((len(b) for b in bk), dtype=np.int64,
                           count=len(bk))
        if lens.sum() == 0:
            return pd.DataFrame({"key": pd.Series(dtype="uint64"),
                                 "doc_id": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "key": np.concatenate([np.asarray(b) for b in bk]),
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), lens)})

    def min_colliding(df: pd.DataFrame) -> pd.DataFrame:
        # per partition: the smallest key with >= 2 distinct docs
        # (plus the partition's min doc_id as the fallback seed) —
        # only ONE tiny row per partition reaches the driver
        out = {"key": [], "doc_a": [], "doc_b": [], "doc_c": [],
               "min_doc": []}
        md = int(df["doc_id"].min()) if len(df) else -1
        g = df.drop_duplicates(["key", "doc_id"]).groupby("key")
        sizes = g["doc_id"].nunique()
        coll = sizes[sizes >= 2]
        if len(coll):
            kmin = coll.index.min()
            ids = sorted(df.loc[df["key"] == kmin, "doc_id"].unique())
            ids = (ids + [-1, -1, -1])[:3]
            out["key"].append(np.uint64(kmin))
            out["doc_a"].append(ids[0])
            out["doc_b"].append(ids[1])
            out["doc_c"].append(ids[2])
            out["min_doc"].append(md)
        else:
            out["key"].append(np.uint64(0xFFFFFFFFFFFFFFFF))
            out["doc_a"].append(-1)
            out["doc_b"].append(-1)
            out["doc_c"].append(-1)
            out["min_doc"].append(md)
        return pd.DataFrame(out)

    from event_deduplication_ray.stages.shuffle import partition_apply as _pa

    kd = _with_schema(
        _pa(sigs.map_batches(key_partial, batch_format="pandas"),
            ["key"], QCFG.join_num_partitions, min_colliding).to_pandas(),
        {"key": "uint64", "doc_a": "int64", "doc_b": "int64",
         "doc_c": "int64", "min_doc": "int64"})
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    hits = kd[kd["key"] != sentinel]
    if len(hits):
        best = hits.sort_values("key").iloc[0]
        qids = [int(i) for i in (best["doc_a"], best["doc_b"],
                                 best["doc_c"]) if i >= 0]
    else:
        qids = sorted(int(i) for i in kd["min_doc"] if i >= 0)[:3]
    qset = set(qids)

    qrows = sigs.map_batches(
        lambda df: df[df["doc_id"].isin(qset)],
        batch_format="pandas").to_pandas()
    qrows = _with_schema(qrows, {"doc_id": "int64", "band_keys": "object",
                                 "sig8": "object"})
    qkeys = {}
    qsig = {}
    for _, r in qrows.iterrows():
        qkeys[int(r["doc_id"])] = set(np.asarray(r["band_keys"]).tolist())
        qsig[int(r["doc_id"])] = np.asarray(r["sig8"], dtype=np.uint8)
    all_qkeys = frozenset().union(*qkeys.values()) if qkeys else frozenset()

    empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "doc_id": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        bk = df["band_keys"].to_numpy()
        lens = np.fromiter((len(b) for b in bk), dtype=np.int64,
                           count=len(bk))
        flat = (np.concatenate([np.asarray(b) for b in bk])
                if lens.sum() else np.array([], dtype=np.uint64))
        ends = np.cumsum(lens)
        starts = ends - lens
        ids = df["doc_id"].to_numpy(np.int64)
        frames = []
        for qid, keys in qkeys.items():
            karr = np.fromiter(keys, dtype=flat.dtype if len(flat)
                               else np.uint64)
            hitf = np.isin(flat, karr)
            c = np.concatenate([[0], np.cumsum(hitf)]).astype(np.int64)
            hit_docs = np.flatnonzero((c[ends] - c[starts]) > 0)
            hit_docs = hit_docs[ids[hit_docs] != qid]
            if len(hit_docs) == 0:
                continue
            sigm = np.vstack([np.asarray(df["sig8"].iloc[i],
                                         dtype=np.uint8)
                              for i in hit_docs])
            sim = (sigm == qsig[qid]).mean(axis=1)
            frames.append(pd.DataFrame({
                "query_id": qid, "doc_id": ids[hit_docs], "sim": sim}))
        if not frames:
            return empty
        out = pd.concat(frames, ignore_index=True)
        return (out.sort_values(["query_id", "sim", "doc_id"],
                                ascending=[True, False, True])
                .groupby("query_id").head(k))

    parts = _with_schema(
        sigs.map_batches(candidates, batch_format="pandas").to_pandas(),
        {"query_id": "int64", "doc_id": "int64", "sim": "float64"})
    out = (parts.sort_values(["query_id", "sim", "doc_id"],
                             ascending=[True, False, True])
           .groupby("query_id").head(k))
    out["sim"] = out["sim"].round(6)
    out["query_id"] = out["query_id"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.reset_index(drop=True)


def q127_quality_representatives(sf_dir: str) -> pd.DataFrame:
    """Quality-aware representative selection: per exact-Jaccard dup
    cluster keep the member with the MOST tokens (doc_id tie-break) —
    the reference's 'longest/most-complete field wins' synthesis
    strategy (C3a) applied at cluster granularity, and the policy a
    real pipeline prefers over keep-first when copies differ in
    completeness.  Shape: q28's assignments cogroup with a narrow
    (doc_id, n_tok) table on doc_id; ONE cluster-keyed shuffle picks
    per-cluster argmax; output one row per cluster."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    asn = q28_ngram_jaccard_clusters(sf_dir)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def ntok(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = tokenize_offsets(df["text"].str.lower())
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_tok": lens.astype(np.int64)})

    tok_sh = shuffle_to(docs.map_batches(ntok, batch_format="pandas"),
                        ["doc_id"], QCFG.join_num_partitions)

    empty = {"cluster_id": pd.Series(dtype="int64"),
             "rep_doc_id": pd.Series(dtype="int64"),
             "rep_n_tok": pd.Series(dtype="int64"),
             "n_members": pd.Series(dtype="int64")}

    def attach(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"cluster_id": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "n_tok": pd.Series(dtype="int64")})
        return l.merge(r, on="doc_id")

    tagged = cogroup_apply(asn, tok_sh, ["doc_id"], ["doc_id"],
                           QCFG.join_num_partitions, attach,
                           out_keys=["cluster_id"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(empty)
        df = df.sort_values(["cluster_id", "n_tok", "doc_id"],
                            ascending=[True, False, True])
        g = df.groupby("cluster_id", as_index=False)
        best = g.head(1).rename(columns={"doc_id": "rep_doc_id",
                                         "n_tok": "rep_n_tok"})
        sizes = df.groupby("cluster_id", as_index=False).size() \
            .rename(columns={"size": "n_members"})
        return best.merge(sizes, on="cluster_id")[list(empty)]

    from event_deduplication_ray.stages.shuffle import partition_apply as _pa

    out = _with_schema(
        _pa(tagged, ["cluster_id"], QCFG.join_num_partitions,
            pick).to_pandas(), {k: str(v.dtype) for k, v in empty.items()})
    for c in empty:
        out[c] = out[c].astype("int64")
    return out.sort_values("cluster_id").reset_index(drop=True)


def q128_repetition_signals(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition-REMOVAL signals (Rae et al. 2021, §A1.1
    "repetitious documents") — the line/char-mass companion to q39's
    token-fraction rules and q93's quality rules: per doc the
    duplicate-line fraction, duplicate-line CHARACTER fraction,
    top-bigram character mass and duplicate-5-gram character mass,
    each an exact integer ppm ((num*1_000_000)//den — float division
    is tie-sensitive across engines), plus ``keep`` evaluated in exact
    integer cross-multiplication (thresholds 0.30/0.20/0.20/0.15).
    Two deliberate, documented divergences from the paper's prose:
    ``top2_char_ppm`` maximizes freq·charlen (repeated character MASS,
    deterministic) rather than the charlen of the argmax-by-freq
    bigram (tie-ambiguous across engines), and ``dup5_char_ppm``
    counts overlapping occurrences without de-overlap (may exceed
    1e6; still monotone in repetition).  Lines are space-trimmed with
    empties dropped (q63 recipe); tokens are lower + whitespace split
    (module convention).  Pure map stage — one tokenization + one
    line split per batch, nothing shuffles, trivially 100 TB-safe."""
    from event_deduplication_ray.functions.hashing import tokenize_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    cols = ["doc_id", "dup_line_ppm", "dup_line_char_ppm",
            "top2_char_ppm", "dup5_char_ppm", "keep"]

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        text = df["text"].fillna("")
        idx = np.arange(n, dtype=np.int64)

        def seg(series_by_doc: pd.Series, default: int = 0) -> np.ndarray:
            out = np.full(n, default, dtype=np.int64)
            if len(series_by_doc):
                out[series_by_doc.index.to_numpy(np.int64)] = \
                    series_by_doc.to_numpy(np.int64)
            return out

        # ---- lines: trimmed (spaces only), empties dropped
        lines = text.str.split("\n")
        nl_raw = lines.str.len().to_numpy(np.int64)
        flat_l = pd.Series(
            np.concatenate([np.asarray(v, object) for v in lines])
            if n else np.array([], object)).str.strip(" ")
        ldoc = np.repeat(idx, nl_raw)
        nonempty = (flat_l.to_numpy(object) != "") if len(flat_l) \
            else np.zeros(0, bool)
        lf = flat_l[nonempty]
        ldf = pd.DataFrame({
            "d": ldoc[nonempty], "s": lf.to_numpy(object),
            "c": lf.str.len().to_numpy(np.int64)})
        if len(ldf):
            g = ldf.groupby(["d", "s"], sort=False) \
                .agg(cnt=("c", "size"), c=("c", "first")).reset_index()
            d = g["d"]
            n_lines = seg(g["cnt"].groupby(d).sum())
            dup_lines = n_lines - seg(g.groupby("d").size())
            dup_lchars = seg(((g["cnt"] - 1) * g["c"]).groupby(d).sum())
            tot_lchars = seg((g["cnt"] * g["c"]).groupby(d).sum())
        else:
            n_lines = dup_lines = dup_lchars = tot_lchars = \
                np.zeros(n, np.int64)

        # ---- tokens
        flat, lens = tokenize_offsets(text.str.lower())
        doc_of = np.repeat(idx, lens)
        tok_len = pd.Series(flat).str.len().to_numpy(np.int64) \
            if len(flat) else np.zeros(0, np.int64)
        ends = np.cumsum(lens)
        c = np.concatenate([[0], np.cumsum(tok_len)]).astype(np.int64)
        n_chars = c[ends] - c[ends - lens]

        # ---- bigrams: max repeated character mass per doc
        if len(flat) >= 2:
            same = doc_of[1:] == doc_of[:-1]
            bdf = pd.DataFrame({
                "d": doc_of[:-1][same],
                "w1": flat[:-1][same], "w2": flat[1:][same],
                "c": (tok_len[:-1] + tok_len[1:])[same]})
        else:
            bdf = pd.DataFrame({"d": [], "w1": [], "w2": [], "c": []})
        if len(bdf):
            bg = bdf.groupby(["d", "w1", "w2"], sort=False) \
                .agg(f=("c", "size"), c=("c", "first")).reset_index()
            top2 = seg((bg["f"] * bg["c"]).groupby(bg["d"]).max())
        else:
            top2 = np.zeros(n, np.int64)

        # ---- 5-grams: duplicated character mass (overlap-unaware)
        if len(flat) >= 5:
            m5 = doc_of[4:] == doc_of[:-4]
            clen5 = (tok_len[:-4] + tok_len[1:-3] + tok_len[2:-2]
                     + tok_len[3:-1] + tok_len[4:])
            gdf = pd.DataFrame({
                "d": doc_of[:-4][m5],
                "w1": flat[:-4][m5], "w2": flat[1:-3][m5],
                "w3": flat[2:-2][m5], "w4": flat[3:-1][m5],
                "w5": flat[4:][m5], "c": clen5[m5]})
        else:
            gdf = pd.DataFrame()
        if len(gdf):
            g5 = gdf.groupby(["d", "w1", "w2", "w3", "w4", "w5"],
                             sort=False) \
                .agg(f=("c", "size"), c=("c", "first")).reset_index()
            dupm = g5[g5["f"] > 1]
            dup5 = seg((dupm["f"] * dupm["c"]).groupby(dupm["d"]).sum())
        else:
            dup5 = np.zeros(n, np.int64)

        M = np.int64(1_000_000)
        keep = ((10 * dup_lines <= 3 * n_lines)
                & (5 * dup_lchars <= tot_lchars)
                & (5 * top2 <= n_chars)
                & (20 * dup5 <= 3 * n_chars))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "dup_line_ppm": np.where(
                n_lines > 0, dup_lines * M // np.maximum(n_lines, 1), 0),
            "dup_line_char_ppm": np.where(
                tot_lchars > 0,
                dup_lchars * M // np.maximum(tot_lchars, 1), 0),
            "top2_char_ppm": np.where(
                n_chars > 0, top2 * M // np.maximum(n_chars, 1), 0),
            "dup5_char_ppm": np.where(
                n_chars > 0, dup5 * M // np.maximum(n_chars, 1), 0),
            "keep": keep.astype(np.int64)})

    out = _with_schema(
        ds.map_batches(rep, batch_format="pandas").to_pandas(),
        {k: "int64" for k in cols})
    for col in cols:
        out[col] = out[col].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SUBSTR_B = np.uint64(0x100000001B3)            # odd → invertible mod 2^64
_SUBSTR_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


# h carried as int64 (bit view of the u64 hash — equality and
# partition hashing are bit-pattern based, so the view is lossless);
# a fixed Arrow schema keeps empty and non-empty batches identical
_HDP_SCHEMA = pa.schema([("h", pa.int64()), ("doc_id", pa.int64()),
                         ("pos", pa.int64())])


def _empty_hdp() -> pa.Table:
    return _HDP_SCHEMA.empty_table()


def _win_hash_frame(df: pd.DataFrame, W: int) -> pa.Table:
    """(h, doc_id, pos) for every length-W window: u64 polynomial
    rolling hash over code points via prefix sums + the modular
    inverse of the odd base — O(chars), no per-window loop; windows
    never cross doc boundaries.  pos is the 1-based char index
    (matches SQL substr)."""
    text = df["text"].fillna("")
    lens = text.str.len().to_numpy(np.int64)
    N = int(lens.sum())
    if len(df) == 0 or N < W:
        return _empty_hdp()
    c = np.frombuffer("".join(text.tolist()).encode("utf-32-le"),
                      dtype="<u4").astype(np.uint64)
    doc_of = np.repeat(np.arange(len(df), dtype=np.int64), lens)
    with np.errstate(over="ignore"):
        Bp = np.concatenate([
            [np.uint64(1)],
            np.multiply.accumulate(
                np.full(N - 1, _SUBSTR_B, dtype=np.uint64))])
        Binvp = np.concatenate([
            [np.uint64(1)],
            np.multiply.accumulate(
                np.full(N - 1, _SUBSTR_BINV, dtype=np.uint64))])
        S = np.concatenate([[np.uint64(0)],
                            np.cumsum(c * Bp[::-1], dtype=np.uint64)])
        # H_i = (S[i+W]-S[i]) * B^-(N-W-i)  — window hash at i
        h = (S[W:] - S[:-W]) * Binvp[: N - W + 1][::-1]
    valid = doc_of[: N - W + 1] == doc_of[W - 1:]
    starts = np.cumsum(lens) - lens
    gpos = np.arange(N - W + 1, dtype=np.int64)
    d = doc_of[: N - W + 1][valid]
    return pa.table({
        "h": pa.array(h[valid].view(np.int64)),
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)[d]),
        "pos": pa.array(gpos[valid] - starts[d] + 1)})


def _substr_hash_cands(df: pd.DataFrame) -> pd.DataFrame:
    """Positions whose window HASH occurs in >= 2 distinct docs — a
    candidate superset (collisions only add, never lose)."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pos": pd.Series(dtype="int64")})
    nd = df.drop_duplicates(["h", "doc_id"]).groupby("h")["doc_id"].size()
    return df[df["h"].isin(nd[nd >= 2].index)][["doc_id", "pos"]]


def _substr_extract(W: int):
    """Cogroup fn: slice the actual window string for each candidate
    (bounded Python zip — candidates only, post-prefilter)."""
    def extract(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"win": pd.Series(dtype=object),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        m = l.merge(r[["doc_id", "text"]], on="doc_id")
        wins = [t[p - 1:p - 1 + W] for t, p in
                zip(m["text"].to_numpy(object), m["pos"].to_numpy())]
        return pd.DataFrame({"win": np.asarray(wins, dtype=object),
                             "doc_id": m["doc_id"].to_numpy(np.int64),
                             "pos": m["pos"].to_numpy(np.int64)})
    return extract


def q129_exact_substring_spans(sf_dir: str, win: int = 64) -> pd.DataFrame:
    """Character-EXACT cross-document substring duplication — the
    north rule's 'suffix-array substring pass for exact-substring
    dupes' re-expressed for a streaming shuffle engine: per doc, the
    characters covered by length-``win`` substrings that also occur
    VERBATIM in at least one other document (the span-coverage metric
    of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", whose single-machine tool builds a corpus suffix
    array — a global sorted structure a distributed engine should not
    build; reference analog: the substring tier,
    /root/reference/src/event_dedup/matching/candidate_pairs.py).
    Exactly the same answer comes from three bounded shuffles:

      1. every window position emits an 8-byte ROLLING HASH (u64
         polynomial over code points via prefix sums + the modular
         inverse of an odd base — O(chars) fully vectorized, windows
         never cross doc boundaries); a hash-keyed pass keeps
         positions whose hash occurs in >= 2 distinct docs.  Hash
         collisions only ADD candidates, never lose one;
      2. candidates cogroup back to their docs to slice the actual
         window STRING; a string-keyed pass keeps positions whose
         window occurs verbatim in >= 2 distinct docs (exactness —
         hash quality affects cost, never the answer);
      3. a doc-keyed interval union (same-length windows merge while
         consecutive starts gap <= win) yields dup_chars / n_spans.

    Pass 1 shuffles 24 B per character — the honest cost of exact
    substring dedup (the suffix array is likewise O(corpus)); passes
    2-3 touch only candidate positions.  ppm = dup_chars*1e6 //
    n_chars in exact int64.  q22/q30 remain the sampled token-level
    production tier; this is the character-exact audit beside them."""
    from event_deduplication_ray.stages.shuffle import (
        cogroup_apply,
        partition_apply,
    )

    P = QCFG.join_num_partitions
    W = int(win)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def win_hashes(df: pd.DataFrame) -> pd.DataFrame:
        return _win_hash_frame(df, W)

    hash_cands = _substr_hash_cands
    extract = _substr_extract(W)

    def str_cands(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        nd = df.drop_duplicates(["win", "doc_id"]) \
            .groupby("win")["doc_id"].size()
        return df[df["win"].isin(nd[nd >= 2].index)][["doc_id", "pos"]]

    cov_empty = {"doc_id": pd.Series(dtype="int64"),
                 "dup_chars": pd.Series(dtype="int64"),
                 "n_spans": pd.Series(dtype="int64")}

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(cov_empty)
        df = df.drop_duplicates(["doc_id", "pos"]) \
            .sort_values(["doc_id", "pos"])
        d = df["doc_id"].to_numpy(np.int64)
        p = df["pos"].to_numpy(np.int64)
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > W)
        first = np.flatnonzero(brk)
        last = np.concatenate([first[1:] - 1, [len(d) - 1]])
        span = p[last] + W - p[first]
        out = pd.DataFrame({"doc_id": d[first], "span": span})
        return out.groupby("doc_id", as_index=False) \
            .agg(dup_chars=("span", "sum"), n_spans=("span", "size"))

    cands = partition_apply(ds.map_batches(win_hashes, batch_format="pandas",
                                           batch_size=1024),
                            ["h"], P, hash_cands, out_keys=["doc_id"])
    strs = cogroup_apply(cands, ds, ["doc_id"], ["doc_id"], P, extract,
                         out_keys=["win"])
    final = partition_apply(strs, ["win"], P, str_cands,
                            out_keys=["doc_id"])
    cov = _with_schema(
        partition_apply(final, ["doc_id"], P, coverage).to_pandas(),
        {k: "int64" for k in cov_empty})

    lens_df = ds.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": df["text"].fillna("").str.len()
            .to_numpy(np.int64)}),
        batch_format="pandas").to_pandas()
    out = lens_df.merge(cov, on="doc_id", how="left").fillna(0)
    out["dup_char_ppm"] = np.where(
        out["n_chars"] > 0,
        out["dup_chars"].astype(np.int64) * np.int64(1_000_000)
        // np.maximum(out["n_chars"].to_numpy(np.int64), 1), 0)
    for c in ("doc_id", "n_chars", "dup_chars", "n_spans", "dup_char_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q130_substring_dedup_rewrite(sf_dir: str, win: int = 64) -> pd.DataFrame:
    """Exact-substring dedup as a document REWRITE (Lee et al. 2022's
    actual transform; the q129 detector's q78-style counterpart):
    every length-``win`` window occurring verbatim in >= 2 distinct
    docs keeps exactly its FIRST occurrence (global min (doc_id,pos) —
    deterministic keep-first, including within-owner-doc repeats) and
    every other occurrence is cut; per doc the cut positions union
    into maximal spans and the doc is reassembled from the kept
    segments.  Passes 1-2 are q129's (rolling-hash prefilter →
    string-verify); pass 3 ranks occurrences per window INSIDE the
    window's partition (no global sort — the window string is the
    shuffle key, so its occurrences co-locate); pass 4 cogroups the
    loser POSITIONS with the docs by doc_id — islands are computed
    there, where a doc's full position set co-locates — and only
    affected docs re-slice, the rest pass through untouched.  Text
    crosses the wire once (the rewrite cogroup); all span arithmetic
    exact int64."""
    from event_deduplication_ray.stages.shuffle import (
        cogroup_apply,
        partition_apply,
        shuffle_to,
    )

    P = QCFG.join_num_partitions
    W = int(win)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        nd = df.drop_duplicates(["win", "doc_id"]) \
            .groupby("win")["doc_id"].size()
        sh = df[df["win"].isin(nd[nd >= 2].index)]
        sh = sh.sort_values(["win", "doc_id", "pos"])
        return sh[sh.duplicated("win", keep="first")][["doc_id", "pos"]]

    span_empty = {"doc_id": pd.Series(dtype="int64"),
                  "s": pd.Series(dtype="int64"),
                  "e": pd.Series(dtype="int64")}

    def cut_spans(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(span_empty)
        df = df.drop_duplicates(["doc_id", "pos"]) \
            .sort_values(["doc_id", "pos"])
        d = df["doc_id"].to_numpy(np.int64)
        p = df["pos"].to_numpy(np.int64)
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > W)
        first = np.flatnonzero(brk)
        last = np.concatenate([first[1:] - 1, [len(d) - 1]])
        return pd.DataFrame({"doc_id": d[first], "s": p[first],
                             "e": p[last] + W})

    out_empty = {"doc_id": pd.Series(dtype="int64"),
                 "n_chars": pd.Series(dtype="int64"),
                 "cut_chars": pd.Series(dtype="int64"),
                 "text_clean": pd.Series(dtype=object)}

    def rewrite(lpos: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(r) == 0:
            return pd.DataFrame(out_empty)
        # islands from THIS doc-partition's full position set (the
        # cogroup co-locates every loser position of a doc)
        l = cut_spans(lpos) if len(lpos) else pd.DataFrame(span_empty)
        text = r["text"].fillna("").to_numpy(object)
        clean = text.copy()
        if len(l):
            pos_of = {int(did): i for i, did in
                      enumerate(r["doc_id"].to_numpy())}
            # bounded Python loop: AFFECTED docs only
            for did, grp in l.sort_values(["doc_id", "s"]) \
                    .groupby("doc_id", sort=False):
                i = pos_of.get(int(did))
                if i is None:
                    continue
                t = text[i]
                parts, prev = [], 1
                for s, e in zip(grp["s"].to_numpy(), grp["e"].to_numpy()):
                    parts.append(t[prev - 1:s - 1])
                    prev = int(e)
                parts.append(t[prev - 1:])
                clean[i] = "".join(parts)
        n_chars = np.asarray([len(t) for t in text], dtype=np.int64)
        kept = np.asarray([len(t) for t in clean], dtype=np.int64)
        return pd.DataFrame({
            "doc_id": r["doc_id"].to_numpy(np.int64),
            "n_chars": n_chars,
            "cut_chars": n_chars - kept,
            "text_clean": clean})

    docs_sh = shuffle_to(ds, ["doc_id"], P)
    cands = partition_apply(ds.map_batches(
        lambda df: _win_hash_frame(df, W),
        batch_format="pandas", batch_size=1024),
        ["h"], P, _substr_hash_cands, out_keys=["doc_id"])
    strs = cogroup_apply(cands, docs_sh, ["doc_id"], ["doc_id"], P,
                         _substr_extract(W), out_keys=["win"])
    lose = partition_apply(strs, ["win"], P, losers,
                           out_keys=["doc_id"])
    out = _with_schema(
        cogroup_apply(lose, docs_sh, ["doc_id"], ["doc_id"], P,
                      rewrite).to_pandas(),
        {"doc_id": "int64", "n_chars": "int64", "cut_chars": "int64",
         "text_clean": "object"})
    for c in ("doc_id", "n_chars", "cut_chars"):
        out[c] = out[c].astype("int64")
    out["text_clean"] = out["text_clean"].fillna("").astype(str)
    return out.sort_values("doc_id").reset_index(drop=True)


def q131_global_range_join(sf_dir: str) -> pd.DataFrame:
    """GLOBAL range join (NO equality key): every purchase counts the
    view events of ALL users in the 10 minutes before it — window
    [ts-10min, ts), inclusive lower / strict upper.  q61 is the
    banded per-user variant (user_id gives the shuffle an equi-key);
    with no equi-key the distributed technique is TIME-BUCKET
    REPLICATION: time splits into window-sized buckets, each purchase
    replicates to the <= 2 buckets its window overlaps, views shuffle
    by their own bucket, and inside a co-located bucket one sorted
    searchsorted pair counts matches vectorized (q61's shifted-
    timeline trick, keyed by bucket code).  Each replica counts only
    the intersection of its window with ITS bucket's time range, so
    summing replica partials per purchase never double-counts.  One
    events read, one bucket shuffle (replication factor 2 on the
    purchase side only), one event_id combine; all boundary
    arithmetic exact int64 µs."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import partition_apply

    P = QCFG.join_num_partitions
    W = np.int64(600_000_000)              # 10 min in µs
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def tag(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["view", "purchase"])))
        df = t.to_pandas()
        if len(df) == 0:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "is_p": pd.Series(dtype="int64"),
                                 "ts_us": pd.Series(dtype="int64"),
                                 "event_id": pd.Series(dtype="int64")})
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid = df["event_id"].to_numpy(np.int64)
        is_p = (df["event_type"].to_numpy() == "purchase")
        v_ts, p_ts, p_eid = ts_us[~is_p], ts_us[is_p], eid[is_p]
        # purchase replicas: window [p-W, p) overlaps buckets
        # (p-W)//W and (p-1)//W (equal when p ≡ 0 mod W)
        b0, b1 = (p_ts - W) // W, (p_ts - 1) // W
        dup = b1 != b0
        out = pd.DataFrame({
            "bucket": np.concatenate([v_ts // W, b0, b1[dup]]),
            "is_p": np.concatenate([
                np.zeros(len(v_ts), np.int64),
                np.ones(len(p_ts), np.int64),
                np.ones(int(dup.sum()), np.int64)]),
            "ts_us": np.concatenate([v_ts, p_ts, p_ts[dup]]),
            "event_id": np.concatenate([
                np.zeros(len(v_ts), np.int64), p_eid, p_eid[dup]])})
        return out

    part_empty = {"event_id": pd.Series(dtype="int64"),
                  "n": pd.Series(dtype="int64")}

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["is_p"] == 1]
        if len(p) == 0:
            return pd.DataFrame(part_empty)
        v = df[df["is_p"] == 0]
        # shared bucket codes; per-bucket offset stays in [0, W]
        codes, uniq = pd.factorize(
            np.concatenate([v["bucket"].to_numpy(np.int64),
                            p["bucket"].to_numpy(np.int64)]), sort=False)
        span = np.int64(W + 2)
        vc, pc_ = codes[:len(v)], codes[len(v):]
        vb = uniq[vc] * W
        vkey = np.sort(vc * span + (v["ts_us"].to_numpy(np.int64) - vb))
        pb = uniq[pc_] * W
        pts = p["ts_us"].to_numpy(np.int64)
        lo = np.maximum(pts - W, pb) - pb
        hi = np.minimum(pts, pb + W) - pb
        n = (np.searchsorted(vkey, pc_ * span + hi, side="left")
             - np.searchsorted(vkey, pc_ * span + lo, side="left"))
        return pd.DataFrame({"event_id": p["event_id"].to_numpy(np.int64),
                             "n": n.astype(np.int64)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "n_views_10m": pd.Series(dtype="int64")})
        return df.groupby("event_id", as_index=False)["n"].sum() \
            .rename(columns={"n": "n_views_10m"})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    parts = partition_apply(tagged, ["bucket"], P, count_bucket,
                            out_keys=["event_id"])
    out = _with_schema(
        partition_apply(parts, ["event_id"], P, combine).to_pandas(),
        {"event_id": "int64", "n_views_10m": "int64"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------- TPC-H join shapes (batch 2)

def q102_nation_trade_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7-style two-nation trade volume: revenue shipped between
    NATION_1 and NATION_2 per (supp_nation, cust_nation, year).
    supplier/customer/nation are dims — their key→nation projections
    ship once in task closures; the only big-big exchange is the
    orderkey cogroup (q50's machinery).  lineitem pre-aggregates
    (orderkey, supp_nation, year, rev) inside the split wave; revenue
    accumulates in EXACT int64 cents·pct units (the q85 lesson — float
    sums of this magnitude drift across summation orders) and is
    divided once on the driver.  Reference analog: dashboard join
    aggregates (SURVEY §2.8 Q5)."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1998-01-01")
    nat = {1: "NATION_1", 2: "NATION_2"}

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    snk = sup["s_nationkey"].to_numpy()
    sup_keys = {n: np.unique(sup["s_suppkey"].to_numpy()[snk == n])
                for n in nat}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cnk = cust["c_nationkey"].to_numpy()
    cust_keys = {n: np.unique(cust["c_custkey"].to_numpy()[cnk == n])
                 for n in nat}

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        df = t.to_pandas()
        sk = df["l_suppkey"].to_numpy()
        sn = np.zeros(len(df), dtype=np.int8)
        for n, keys in sup_keys.items():
            sn[np.isin(sk, keys)] = n
        df = df[sn > 0].copy()
        df["supp_nation"] = sn[sn > 0]
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100).astype(np.int64)
        df["rev_u"] = cents * pct
        df["l_year"] = df["l_shipdate"].dt.strftime("%Y")
        g = df.groupby(["l_orderkey", "supp_nation", "l_year"],
                       as_index=False)["rev_u"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def oproj(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy()
        cn = np.zeros(len(ck), dtype=np.int8)
        for n, keys in cust_keys.items():
            cn[np.isin(ck, keys)] = n
        keep = cn > 0
        return pa.table({"o_orderkey": t["o_orderkey"].to_numpy()[keep],
                         "cust_nation": cn[keep]})

    o_ds = orders.map_batches(oproj, batch_format="pyarrow")

    empty = {"supp_nation": pd.Series(dtype="int8"),
             "cust_nation": pd.Series(dtype="int8"),
             "l_year": pd.Series(dtype="object"),
             "rev_u": pd.Series(dtype="int64")}

    def joinagg(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        m = r.merge(l, left_on="l_orderkey", right_on="o_orderkey")
        m = m[m["supp_nation"] != m["cust_nation"]]
        if len(m) == 0:
            return pd.DataFrame(empty)
        return m.groupby(["supp_nation", "cust_nation", "l_year"],
                         as_index=False)["rev_u"].sum()

    df = cogroup_apply(o_ds, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, joinagg).to_pandas()
    df = _with_schema(df, {k: str(v.dtype) for k, v in empty.items()})
    out = df.groupby(["supp_nation", "cust_nation", "l_year"],
                     as_index=False)["rev_u"].sum()
    out["supp_nation"] = out["supp_nation"].map(nat)
    out["cust_nation"] = out["cust_nation"].map(nat)
    out["revenue"] = out["rev_u"].astype("int64") / 10000.0
    out = out.drop(columns=["rev_u"])
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


def q103_returned_item_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10-style returned-item report: top-20 customers by
    revenue on RETURNED lineitems for orders placed in 1996Q1.
    lineitem filters to returnflag='R' and pre-aggregates revenue per
    orderkey in the split wave (exact int64 units); orders prune to
    the quarter; the orderkey cogroup emits per-partition custkey
    partials, and only the tiny (custkey, rev) combine + the top-20
    run on the driver, where the customer/nation dims join in.
    Tie-break: (revenue desc, c_custkey asc) — exact because the sort
    key is the int64 unit sum."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1996-04-01")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        df = t.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100).astype(np.int64)
        df["rev_u"] = cents * pct
        g = df.groupby("l_orderkey", as_index=False)["rev_u"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                             pc.less(t["o_orderdate"], pa.scalar(hi))))
        return t.select(["o_orderkey", "o_custkey"])

    o_ds = orders.map_batches(ofilt, batch_format="pyarrow")

    empty = {"o_custkey": pd.Series(dtype="int64"),
             "rev_u": pd.Series(dtype="int64")}

    def joinagg(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        agg = r.groupby("l_orderkey", as_index=False)["rev_u"].sum()
        m = l.merge(agg, left_on="o_orderkey", right_on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        return m.groupby("o_custkey", as_index=False)["rev_u"].sum()

    df = cogroup_apply(o_ds, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, joinagg).to_pandas()
    df = _with_schema(df, {"o_custkey": "int64", "rev_u": "int64"})
    comb = df.groupby("o_custkey", as_index=False)["rev_u"].sum()
    comb = comb.sort_values(["rev_u", "o_custkey"],
                            ascending=[False, True]).head(20)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = comb.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out["revenue"] = out["rev_u"].astype("int64") / 10000.0
    out = out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]
    out = _with_schema(out, {"c_custkey": "int64", "c_name": "object",
                             "revenue": "float64", "c_acctbal": "float64",
                             "n_name": "object"})
    return out.sort_values(["revenue", "c_custkey"],
                           ascending=[False, True]).reset_index(drop=True)


def q104_small_qty_order_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17-style correlated-average subquery: yearly revenue
    lost to small-quantity orders of Brand#3 parts (quantity below
    20 % of that part's average order quantity).  The brand's partkey
    set broadcasts (part is a dim); lineitem prunes to it and
    hash-partitions ONCE by partkey, so each partition holds every
    order line of its parts and evaluates the correlated average
    locally.  The < 0.2·avg test runs as EXACT integer
    cross-multiplication (5·qty·n < Σqty — quantities are
    integer-valued), so no float-division rounding can split the
    engines; kept revenue accumulates in int64 cents and divides by
    7 exactly once on the driver."""

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    mask = np.asarray(
        part["p_brand"].to_numpy(zero_copy_only=False) == "Brand#3")
    pkeys = np.unique(part["p_partkey"].to_numpy()[mask])

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        keep = np.isin(t["l_partkey"].to_numpy(), pkeys)
        qty = np.round(t["l_quantity"].to_numpy()[keep]).astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"].to_numpy()[keep],
                         "qty_i": qty, "price_c": cents})

    def small_qty(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"kept_c": pd.Series(dtype="int64")})
        g = df.groupby("l_partkey")["qty_i"]
        n = g.transform("size").to_numpy(np.int64)
        s = g.transform("sum").to_numpy(np.int64)
        kept = df["price_c"].to_numpy(np.int64)[
            5 * df["qty_i"].to_numpy(np.int64) * n < s]
        return pd.DataFrame({"kept_c": [int(kept.sum())]})

    parts = partition_apply(li, ["l_partkey"], QCFG.join_num_partitions,
                            small_qty, pre_fn=proj).to_pandas()
    parts = _with_schema(parts, {"kept_c": "int64"})
    total_c = int(parts["kept_c"].sum())
    return pd.DataFrame({"avg_yearly": [round(total_c / 100.0 / 7.0, 2)]})


def q105_disjunctive_part_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19-style disjunctive predicate join: revenue from three
    OR'd (brand, size-range, quantity-range) branches.  The part dim
    resolves each branch to a partkey set ONCE on the driver; the
    lineitem pass is then a pure streaming map — per-batch branch
    masks (isin + integer quantity range) → one int64 revenue partial
    per batch, nothing shuffles.  The disjunction never becomes a
    join: OR-of-ANDs over a dim is a membership test."""

    branches = [("Brand#1", 1, 5, 1, 11),
                ("Brand#2", 1, 10, 10, 20),
                ("Brand#3", 1, 15, 20, 30)]
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    pb = part["p_brand"].to_numpy(zero_copy_only=False)
    psz = part["p_size"].to_numpy()
    sets = [(np.unique(pk[(pb == b) & (psz >= slo) & (psz <= shi)]), qlo, qhi)
            for b, slo, shi, qlo, qhi in branches]

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        lpk = t["l_partkey"].to_numpy()
        qty = np.round(t["l_quantity"].to_numpy()).astype(np.int64)
        keep = np.zeros(len(lpk), dtype=bool)
        for keys, qlo, qhi in sets:
            keep |= np.isin(lpk, keys) & (qty >= qlo) & (qty <= qhi)
        cents = np.round(t["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        pct = np.round((1.0 - t["l_discount"].to_numpy()[keep])
                       * 100).astype(np.int64)
        return pa.table({"rev_u": [int((cents * pct).sum())]})

    parts = _with_schema(
        li.map_batches(rev_partial, batch_format="pyarrow").to_pandas(),
        {"rev_u": "int64"})
    return pd.DataFrame({"revenue": [int(parts["rev_u"].sum()) / 10000.0]})


def q106_lone_late_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21-style waiting-supplier report (adapted to this
    schema's columns): for FINALIZED ('F') multi-supplier orders,
    count per supplier the orders where that supplier was the ONLY
    late one (latest shipment > orderdate + 60 days — the schema has
    no receipt/commit dates).  lineitem pre-aggregates max-shipdate
    per (orderkey, suppkey) in the split wave; the orderkey cogroup
    evaluates the exists/not-exists pair as per-order counts
    (n_supp ≥ 2, n_late = 1) vectorized in exact integer µs; only
    tiny per-suppkey count partials leave the partitions."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    late_us = 60 * 86_400_000_000

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])

    def lpart(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ship_us"] = df["l_shipdate"].astype("datetime64[us]") \
            .astype("int64")
        g = df.groupby(["l_orderkey", "l_suppkey"],
                       as_index=False)["ship_us"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_sh = shuffle_to(li, ["l_orderkey"], QCFG.join_num_partitions,
                       pre_fn=lpart)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return t.select(["o_orderkey", "o_orderdate"])

    o_ds = orders.map_batches(ofilt, batch_format="pyarrow")

    empty = {"l_suppkey": pd.Series(dtype="int64"),
             "numwait": pd.Series(dtype="int64")}

    def lone_late(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty)
        sup = r.groupby(["l_orderkey", "l_suppkey"],
                        as_index=False)["ship_us"].max()
        m = sup.merge(l, left_on="l_orderkey", right_on="o_orderkey")
        if len(m) == 0:
            return pd.DataFrame(empty)
        od_us = m["o_orderdate"].astype("datetime64[us]") \
            .astype("int64").to_numpy()
        m["late"] = m["ship_us"].to_numpy() > od_us + late_us
        grp = m.groupby("l_orderkey")
        n_supp = grp["l_suppkey"].transform("size").to_numpy()
        n_late = grp["late"].transform("sum").to_numpy()
        w = m[(n_supp >= 2) & (n_late == 1) & m["late"].to_numpy()]
        g = (w.groupby("l_suppkey", as_index=False).size()
             .rename(columns={"size": "numwait"}))
        return g

    df = cogroup_apply(o_ds, li_sh, ["o_orderkey"], ["l_orderkey"],
                       QCFG.join_num_partitions, lone_late).to_pandas()
    df = _with_schema(df, {"l_suppkey": "int64", "numwait": "int64"})
    comb = df.groupby("l_suppkey", as_index=False)["numwait"].sum()

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    out = comb.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out = out[["s_name", "numwait"]]
    out = _with_schema(out, {"s_name": "object", "numwait": "int64"})
    out["numwait"] = out["numwait"].astype("int64")
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]).reset_index(drop=True)


def q107_rich_idle_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22-style global-average + anti-join: per nation, the
    count and total balance of customers whose balance beats the
    global average of positive balances but who placed no order since
    1999-01-01.  Pass 1 reduces customers to (n, Σcents) partials —
    the scalar subquery — and the richness test is EXACT integer
    cross-multiplication (bal_c·n > Σcents), never a float-average
    compare.  Pass 2 is q15's anti-join cogroup on custkey (recent
    orders pre-dedup per batch), emitting tiny per-nation (count,
    Σcents) partials; the nation dim joins on the driver."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    cut = pd.Timestamp("1999-01-01")

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy()
        cents = np.round(bal[bal > 0] * 100).astype(np.int64)
        return pa.table({"n": [len(cents)], "s": [int(cents.sum())]})

    pos = _with_schema(
        cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas(),
        {"n": "int64", "s": "int64"})
    n_pos = int(pos["n"].sum())
    s_pos = int(pos["s"].sum())

    okeys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cut)))
        return pa.table({"o_custkey": pa.array(
            np.unique(t["o_custkey"].to_numpy()))})

    okeys_sh = shuffle_to(okeys, ["o_custkey"], QCFG.join_num_partitions,
                          pre_fn=recent_keys)

    empty = {"c_nationkey": pd.Series(dtype="int64"),
             "numcust": pd.Series(dtype="int64"),
             "bal_c": pd.Series(dtype="int64")}

    def rich_idle(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(empty)
        bal_c = np.round(l["c_acctbal"].to_numpy() * 100).astype(np.int64)
        rich = bal_c * n_pos > s_pos
        idle = ~l["c_custkey"].isin(r["o_custkey"].unique()).to_numpy() \
            if len(r) else np.ones(len(l), dtype=bool)
        keep = rich & idle
        if not keep.any():
            return pd.DataFrame(empty)
        g = pd.DataFrame({"c_nationkey": l["c_nationkey"].to_numpy()[keep],
                          "bal_c": bal_c[keep]})
        out = g.groupby("c_nationkey", as_index=False).agg(
            numcust=("bal_c", "size"), bal_c=("bal_c", "sum"))
        return out[["c_nationkey", "numcust", "bal_c"]]

    df = cogroup_apply(cust, okeys_sh, ["c_custkey"], ["o_custkey"],
                       QCFG.join_num_partitions, rich_idle).to_pandas()
    df = _with_schema(df, {"c_nationkey": "int64", "numcust": "int64",
                           "bal_c": "int64"})
    comb = df.groupby("c_nationkey", as_index=False).agg(
        numcust=("numcust", "sum"), bal_c=("bal_c", "sum"))
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = comb.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["bal_c"].astype("int64") / 100.0
    out = out[["n_name", "numcust", "totacctbal"]]
    out = _with_schema(out, {"n_name": "object", "numcust": "int64",
                             "totacctbal": "float64"})
    return out.sort_values("n_name").reset_index(drop=True)


def q132_dup_triangles(sf_dir: str) -> pd.DataFrame:
    """Dup-graph triangle counts per doc — the transitivity readout
    beside q120's degrees and q123's PageRank: a doc in many triangles
    sits inside a tight mutual-duplicate clique (template families),
    while bridge docs (high degree, zero triangles) are the hub
    artifacts the hot-band caps worry about.  Engine: q28's exact
    edge table (deterministic, hence SQL-checkable) → ONE shuffle by
    the LOWER endpoint (the apex) emits wedges (apex, v, w) over each
    apex's higher neighbors (all pairs per apex — the audit-mode
    caveat shared with q28: dup-cluster degrees are bounded, and the
    production tiers cap hot groups upstream) → wedges union the edge
    table and ONE (w_a, w_b) shuffle closes them (a wedge is a
    triangle iff its far edge exists in the same partition) → corner
    explode, per-partition count partials, small driver combine.
    Each triangle a<b<c is generated exactly once (apex=a, wedge
    (b,c)) and credited to all three corners."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.shuffle import cogroup_apply
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir)
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(docs, cfg), cfg),
        cfg, threshold=cfg.jaccard_match)
    P = QCFG.join_num_partitions
    _triu_cache: dict = {}

    def _triu(g: int):
        if g not in _triu_cache:
            _triu_cache[g] = np.triu_indices(g, 1)
        return _triu_cache[g]

    def _wedge_frame(apex, w_a, w_b) -> pd.DataFrame:
        return pd.DataFrame({
            "apex": np.asarray(apex, np.int64),
            "w_a": np.asarray(w_a, np.int64),
            "w_b": np.asarray(w_b, np.int64)})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # sees EVERY edge of each apex: upstream shuffle keys on id_a,
        # the canonical lower endpoint
        if len(df) == 0:
            return _wedge_frame([], [], [])
        ida = df["id_a"].to_numpy(np.int64)
        idb = df["id_b"].to_numpy(np.int64)
        a = np.minimum(ida, idb)
        b = np.maximum(ida, idb)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        oa, ow, ov = [], [], []
        for s, e in zip(starts, ends):   # loop over APEX groups, not rows
            g = int(e - s)
            if g < 2:
                continue
            nb = b[s:e]
            iu, ju = _triu(g)
            oa.append(np.full(iu.size, a[s], np.int64))
            ow.append(nb[iu])
            ov.append(nb[ju])
        if not oa:
            return _wedge_frame([], [], [])
        return _wedge_frame(np.concatenate(oa), np.concatenate(ow),
                            np.concatenate(ov))

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        ida = df["id_a"].to_numpy(np.int64)
        idb = df["id_b"].to_numpy(np.int64)
        return pd.DataFrame({"w_a": np.minimum(ida, idb),
                             "w_b": np.maximum(ida, idb)})

    pairs = pairs.select_columns(["id_a", "id_b"]).materialize()
    wedge_ds = partition_apply(pairs, ["id_a"], P, wedges)
    edge_ds = pairs.map_batches(edge_rows, batch_format="pandas")

    def close(w: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        if len(w) == 0 or len(e) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        m = w.merge(e[["w_a", "w_b"]].drop_duplicates(),
                    on=["w_a", "w_b"], how="inner")
        corners = np.concatenate([m["apex"].to_numpy(np.int64),
                                  m["w_a"].to_numpy(np.int64),
                                  m["w_b"].to_numpy(np.int64)])
        u, c = np.unique(corners, return_counts=True)
        return pd.DataFrame({"doc_id": u, "n": c.astype(np.int64)})

    parts = _with_schema(
        cogroup_apply(wedge_ds, edge_ds, ["w_a", "w_b"], ["w_a", "w_b"],
                      P, close).to_pandas(),
        {"doc_id": "int64", "n": "int64"})
    out = parts.groupby("doc_id", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_tri"})
    out = _with_schema(out, {"doc_id": "int64", "n_tri": "int64"})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_tri"] = out["n_tri"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q133_compression_gate(sf_dir: str) -> pd.DataFrame:
    """zlib compression-ratio quality gate (the classic web-text
    entropy proxy: boilerplate/repetitive spam compresses far below
    normal prose, while mis-decoded binary / base64 junk barely
    compresses at all).  Rows-only: SQL has no deflate.  Per-batch
    map; the per-row loop only drives zlib's C entry point (same
    contract as the textstats scorers); the ratio is exact integer
    ppm.  The gate applies to docs of >= ``min_len`` raw bytes —
    zlib's ~8-byte header makes short-doc ratios meaningless (the
    driver corpus's short docs 'expand' past 1.0) — shorter docs pass
    ungated.  Defaults bracket the measured long-doc corpus band
    (398k–560k ppm): keep 100k <= ratio <= 750k."""
    import zlib

    LO, HI, MIN_LEN = 100_000, 750_000, 256
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        raws = [t.encode("utf-8") if isinstance(t, str) else b""
                for t in df["text"]]
        n = len(raws)
        rl = np.fromiter((len(r) for r in raws), np.int64, n)
        cl = np.fromiter((len(zlib.compress(r, 6)) for r in raws),
                         np.int64, n)
        ratio = cl * 1_000_000 // np.maximum(rl, 1)
        keep = (rl < MIN_LEN) | ((ratio >= LO) & (ratio <= HI))
        return pd.DataFrame({"doc_id": ids, "raw_len": rl, "comp_len": cl,
                             "ratio_ppm": ratio, "keep": keep})

    out = _with_schema(
        ds.map_batches(score, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "raw_len": "int64", "comp_len": "int64",
         "ratio_ppm": "int64", "keep": "bool"})
    for c in ("doc_id", "raw_len", "comp_len", "ratio_ppm"):
        out[c] = out[c].astype("int64")
    out["keep"] = out["keep"].astype(bool)
    return out.sort_values("doc_id").reset_index(drop=True)


def q134_event_rate_anomaly(sf_dir: str) -> pd.DataFrame:
    """Per-type hourly event-rate anomaly — the stream-health monitor
    beside q44's per-doc quality z: hours whose event count is
    anomalous FOR THEIR TYPE (ingest gaps, bot bursts, replayed
    feeds).  Per-batch (type, hour) count partials → ONE compact
    shuffle combine → tiny per-type moments (count rows = types ×
    observed hours) on the driver → vectorized z.  Float parity: the
    q44 recipe — moments from exact integer sums, z rounded to 6 dp
    on BOTH sides, the flag computed from the ROUNDED z, sd == 0
    types define z = 0.  Hours with zero events don't exist on either
    side (z is over OBSERVED hours; a gap shows up as a missing row,
    not a negative z — documented contract)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["ts"].dt.strftime("%Y-%m-%d %H:00:00")})
        return g.groupby(["event_type", "hour"], as_index=False).size() \
            .rename(columns={"size": "n"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "hour": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return df.groupby(["event_type", "hour"], as_index=False)["n"].sum()

    c = _with_schema(
        partition_apply(ds.map_batches(partial, batch_format="pandas"),
                        ["event_type", "hour"], QCFG.join_num_partitions,
                        combine).to_pandas(),
        {"event_type": "object", "hour": "object", "n": "int64"})
    n = c["n"].to_numpy(np.int64).astype(np.float64)
    agg = pd.DataFrame({"event_type": c["event_type"], "n": n,
                        "n2": n * n}).groupby(
        "event_type", as_index=False).agg(
        cnt=("n", "size"), s=("n", "sum"), s2=("n2", "sum"))
    mu = (agg["s"] / agg["cnt"]).to_numpy()
    sd = np.sqrt(np.maximum(
        agg["s2"].to_numpy() / agg["cnt"].to_numpy() - mu * mu, 0.0))
    mu_d = dict(zip(agg["event_type"], mu))
    sd_d = dict(zip(agg["event_type"], sd))
    mus = c["event_type"].map(mu_d).to_numpy(np.float64)
    sds = c["event_type"].map(sd_d).to_numpy(np.float64)
    z = np.round(np.where(sds == 0, 0.0,
                          (n - mus) / np.where(sds == 0, 1.0, sds)), 6)
    out = pd.DataFrame({"event_type": c["event_type"], "hour": c["hour"],
                        "n": c["n"].astype("int64"), "z": z,
                        "anomaly": (np.abs(z) > 3).astype(np.int64)})
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def _winnow_select(hh: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection over one doc's k-gram hash stream: the
    rightmost minimum of each length-``w`` window (Schleimer et al.
    2003).  Pure kernel — property-tested for the window-coverage and
    shared-substring guarantees in test_properties.py."""
    m = len(hh)
    if m <= w:
        return np.array([m - 1 - int(np.argmin(hh[::-1]))])
    sw = np.lib.stride_tricks.sliding_window_view(hh, w)
    j = w - 1 - np.argmin(sw[:, ::-1], axis=1)
    return np.unique(np.arange(m - w + 1) + j)


def q135_winnow_dedup(sf_dir: str, k: int = 32, w: int = 16,
                      min_shared: int = 2,
                      max_fp_docs: int = 64) -> pd.DataFrame:
    """Winnowing-fingerprint dedup (Schleimer, Wilkerson & Aiken 2003,
    the MOSS algorithm) — the guarantee-carrying fingerprint family
    beside q23's rolling hash and q129's every-position pass: from
    each window of ``w`` consecutive char ``k``-gram hashes keep the
    MINIMUM (rightmost on ties), so any shared substring of length
    >= w+k-1 chars is GUARANTEED to share a fingerprint while only
    ~2/(w+1) of positions are kept.  Engine: q129's vectorized
    prefix-sum rolling hash (`_win_hash_frame`) → per-doc rightmost-
    argmin over a zero-copy sliding window view → ONE fp shuffle
    emits per-group pairs (fp groups larger than ``max_fp_docs``
    distinct docs are dropped as boilerplate, the q22
    substring_drop_group convention) → ONE pair shuffle sums shared
    counts and keeps pairs with >= ``min_shared`` fingerprints.
    Rows-only: the selection order is the u64 rolling-hash order,
    which SQL cannot reproduce; the planted gates carry the window
    guarantee, the shared-chunk detection and the boilerplate cap.
    Defaults k=32/w=16 (guarantee threshold 47 chars) sit above
    natural-text phrase noise: at k=8 the synthetic corpus yields
    ~68 k spurious pairs, at k=32 exactly the real dup families."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    P = QCFG.join_num_partitions

    def winnow(df: pd.DataFrame) -> pd.DataFrame:
        t = _win_hash_frame(df, k)
        if t.num_rows == 0:
            return pd.DataFrame({"fp": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64")})
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_fp, out_id = [], []
        starts = np.flatnonzero(np.r_[True, dids[1:] != dids[:-1]])
        ends = np.r_[starts[1:], len(dids)]
        for s, e in zip(starts, ends):   # loop over DOCS, not rows
            hh = h[s:e]
            sel = _winnow_select(hh, w)
            out_fp.append(hh[sel].view(np.int64))
            out_id.append(np.full(len(sel), dids[s], np.int64))
        return pd.DataFrame({"fp": np.concatenate(out_fp),
                             "doc_id": np.concatenate(out_id)})

    def fp_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["fp", "doc_id"])
        sizes = d.groupby("fp")["doc_id"].transform("size")
        d = d[(sizes >= 2) & (sizes <= max_fp_docs)]
        fa, fb, oa, ob = [], [], [], []
        fp = d["fp"].to_numpy(np.int64)
        ids = d["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]])
        ends = np.r_[starts[1:], len(fp)]
        for s, e in zip(starts, ends):   # loop over FP groups
            g = int(e - s)
            iu, ju = np.triu_indices(g, 1)
            gi = ids[s:e]
            oa.append(gi[iu])
            ob.append(gi[ju])
        a = np.concatenate(oa) if oa else np.array([], np.int64)
        b = np.concatenate(ob) if ob else np.array([], np.int64)
        out = pd.DataFrame({"id_a": a, "id_b": b})
        out = out.groupby(["id_a", "id_b"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "n_shared": pd.Series(dtype="int64")})
        g = df.groupby(["id_a", "id_b"], as_index=False)["n"].sum() \
            .rename(columns={"n": "n_shared"})
        return g[g["n_shared"] >= min_shared]

    fps = ds.map_batches(winnow, batch_format="pandas")
    pairs = partition_apply(fps, ["fp"], P, fp_pairs,
                            out_keys=["id_a", "id_b"])
    out = _with_schema(
        partition_apply(pairs, ["id_a", "id_b"], P, combine).to_pandas(),
        {"id_a": "int64", "id_b": "int64", "n_shared": "int64"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q136_hopping_windows(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) window aggregate — the streaming window shape
    the battery's tumbling (q06), session (q14), per-user rolling
    (q41) and late-data (q113) ops don't cover: 1-hour windows
    hopping every 15 min, so each event lands in exactly 4 windows.
    Engine: replicate each event to its 4 window starts inside the
    batch map (pure numpy, 16 B/row), ONE window-start shuffle, per-
    partition count + distinct-user count (windows are complete per
    partition).  Exact-integer µs bucket arithmetic mirrors the SQL's
    epoch_us floor-div; window_start is emitted as a strftime string
    (the M8/M9 timestamp-parity convention)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    HOP = 15 * 60 * 1_000_000
    NSUB = 4

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        b = us // HOP * HOP
        uid = df["user_id"].to_numpy(np.int64)
        ws = np.concatenate([b - j * HOP for j in range(NSUB)])
        return pd.DataFrame({"ws_us": ws, "user_id": np.tile(uid, NSUB)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"ws_us": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        g = df.groupby("ws_us").agg(
            n_events=("user_id", "size"), n_users=("user_id", "nunique"))
        return g.reset_index()

    out = _with_schema(
        partition_apply(ds.map_batches(replicate, batch_format="pandas"),
                        ["ws_us"], QCFG.join_num_partitions,
                        combine).to_pandas(),
        {"ws_us": "int64", "n_events": "int64", "n_users": "int64"})
    out["window_start"] = pd.to_datetime(
        out["ws_us"].astype("int64"), unit="us").dt.strftime(
        "%Y-%m-%d %H:%M:%S")
    out["n_events"] = out["n_events"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out[["window_start", "n_events", "n_users"]] \
        .sort_values("window_start").reset_index(drop=True)


def q137_containment_directed(sf_dir: str) -> pd.DataFrame:
    """Directed containment edges — WHICH doc is contained in which
    (quote/aggregator/expanded-repost relationships), the asymmetric
    complement of q30's undirected pair set: inner = the doc with
    fewer distinct shingles (doc_id breaks ties), cont_ppm = exact
    integer shared·10⁶ // |inner|, kept when it crosses the
    substring_containment threshold via float-free cross-
    multiplication.  Same exact inverted-index machinery and audit-
    mode caveat as q28/q30."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir)
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(docs, cfg), cfg), cfg,
        threshold=cfg.substring_containment, mode="containment_directed")
    df = _with_schema(pairs.to_pandas(),
                      {"inner_id": "int64", "outer_id": "int64",
                       "cont_ppm": "int64"})
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(["inner_id", "outer_id"]).reset_index(drop=True)


def q138_cross_label_nn(sf_dir: str) -> pd.DataFrame:
    """Nearest CROSS-label neighbor per vector — the margin audit
    beside q112's own-centroid outliers: a vector whose closest
    neighbor under a different label is very close is a labeling-
    boundary (or mislabel) candidate.  Engine: the reference matrix
    (ids, labels, L2-normalized rows) is broadcast ONCE via ray.put
    (bounded: it is the ANN reference table, ~0.5 KB/vector — the
    same budget srp/ivf index builds hold; at 100 TB the reference
    side is the per-label IVF index, q32, and this exact pass is the
    audit mode), the table then STREAMS through one matmul per batch
    with same-label columns masked; exact-tie top-1 resolves to the
    minimal nn_id (the q31 convention).  Output is ranking-only
    (vec_id, nn_id, nn_label) — float cos stays out of the compare,
    the q31/q32 precedent."""
    import ray as _ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def norm_part(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        keep = n[:, 0] > 0
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64)[keep],
            "label": df["label"].to_numpy(np.int64)[keep],
            "e": [r.tobytes() for r in (m[keep] / n[keep])]})

    ref = ds.map_batches(norm_part, batch_format="pandas").to_pandas()
    d = len(np.frombuffer(ref["e"].iloc[0])) if len(ref) else 0
    ids = ref["vec_id"].to_numpy(np.int64)
    labels = ref["label"].to_numpy(np.int64)
    M = (np.frombuffer(b"".join(ref["e"]), dtype=np.float64)
         .reshape(len(ref), d) if len(ref) else np.zeros((0, 0)))
    ref_obj = _ray.put((ids, labels, M.T.copy()))

    def nn(df: pd.DataFrame) -> pd.DataFrame:
        r_ids, r_lab, r_mt = _ray.get(ref_obj)
        if len(df) == 0 or len(r_ids) == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "nn_id": pd.Series(dtype="int64"),
                                 "nn_label": pd.Series(dtype="int64")})
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        keep = n[:, 0] > 0
        m = m[keep] / n[keep]
        qids = df["vec_id"].to_numpy(np.int64)[keep]
        qlab = df["label"].to_numpy(np.int64)[keep]
        cos = m @ r_mt
        cos[qlab[:, None] == r_lab[None, :]] = -np.inf
        mx = cos.max(axis=1)
        big = np.int64(2**62)
        nnid = np.where(cos == mx[:, None], r_ids[None, :], big).min(axis=1)
        lab_of = dict(zip(r_ids, r_lab))
        return pd.DataFrame({
            "vec_id": qids, "nn_id": nnid,
            "nn_label": np.array([lab_of[i] for i in nnid], np.int64)})

    out = _with_schema(
        ds.map_batches(nn, batch_format="pandas").to_pandas(),
        {"vec_id": "int64", "nn_id": "int64", "nn_label": "int64"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def q139_source_dup_rate(sf_dir: str) -> pd.DataFrame:
    """Per-source duplication rate — the headline ops readout over
    q28's exact clustering (q100 gives the pairwise matrix; this
    gives each feed's own duplicated share, the number a crawl
    operator actually watches): docs sitting in a multi-doc cluster
    / docs, per source, as exact integer ppm.  ONE cluster_id shuffle
    flags dup membership (out_keys chains straight into the doc_id
    cogroup with the narrow source projection — no driver barrier),
    per-partition (source, n, n_dup) partials, tiny driver combine."""
    from event_deduplication_ray.stages.shuffle import cogroup_apply, shuffle_to

    P = QCFG.join_num_partitions
    src = _read(sf_dir, "documents", ["doc_id", "source"])
    assign = q28_ngram_jaccard_clusters(sf_dir)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "isdup": pd.Series(dtype="int64")})
        sz = df.groupby("cluster_id")["doc_id"].transform("size")
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "isdup": (sz >= 2).astype("int64")})

    flags = partition_apply(assign, ["cluster_id"], P, flag,
                            out_keys=["doc_id"])

    def partial(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "n_docs": pd.Series(dtype="int64"),
                                 "n_dup": pd.Series(dtype="int64")})
        m = l.merge(r, on="doc_id")
        return m.groupby("source", as_index=False).agg(
            n_docs=("isdup", "size"), n_dup=("isdup", "sum"))

    parts = _with_schema(
        cogroup_apply(flags, shuffle_to(src, ["doc_id"], P),
                      ["doc_id"], ["doc_id"], P, partial).to_pandas(),
        {"source": "object", "n_docs": "int64", "n_dup": "int64"})
    out = parts.groupby("source", as_index=False)[["n_docs", "n_dup"]].sum()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_dup"] = out["n_dup"].astype("int64")
    out["dup_ppm"] = (out["n_dup"] * 1_000_000 // out["n_docs"]) \
        .astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q140_dup_kcore(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition of the exact-Jaccard dup graph — the
    density readout completing the graph family (CC q28, degrees
    q120, triangles q132, PageRank q123): a doc's core number is the
    largest k such that it survives in a subgraph where every member
    keeps >= k duplicate edges — template cliques sit in high cores,
    chain/bridge artifacts peel out at core 1.  Distributed peeling:
    the bidirectional edge table hash-partitions ONCE by src and
    stays resident (q123's shape); each round broadcasts the alive
    vertex set (bounded by docs WITH edges), partitions emit alive-
    degree partials, the driver kills nodes below the current k and
    repeats — rounds are bounded by the peel-wave count, small for
    capped dup graphs.  Rows-only (iterative peeling has no SQL
    form); only docs with >= 1 edge appear (isolates are core 0 by
    convention, the q123 vertex-set contract)."""
    import ray

    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.shuffle import shuffle_to
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir).materialize()
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(docs, cfg), cfg),
        cfg, threshold=cfg.jaccard_match)

    def bidir(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    P = QCFG.join_num_partitions
    edges_sh = shuffle_to(pairs.map_batches(bidir, batch_format="pyarrow"),
                          ["src"], P)

    def alive_degrees(alive_nodes: np.ndarray) -> pd.DataFrame:
        ref = ray.put(alive_nodes)

        def part_deg(df: pd.DataFrame) -> pd.DataFrame:
            an = ray.get(ref)
            s = df["src"].to_numpy(np.int64)
            d = df["dst"].to_numpy(np.int64)
            ok = (an[np.searchsorted(an, np.clip(s, an[0], an[-1]))] == s) \
                & (an[np.searchsorted(an, np.clip(d, an[0], an[-1]))] == d) \
                if len(an) else np.zeros(len(s), bool)
            g = pd.DataFrame({"src": s[ok]})
            return g.groupby("src", as_index=False).size() \
                .rename(columns={"size": "deg"})

        out = _with_schema(
            partition_apply(edges_sh, ["src"], P, part_deg).to_pandas(),
            {"src": "int64", "deg": "int64"})
        return out.groupby("src", as_index=False)["deg"].sum()

    deg0 = _with_schema(
        partition_apply(edges_sh, ["src"], P,
                        lambda df: df.groupby("src", as_index=False).size()
                        .rename(columns={"size": "deg"})).to_pandas(),
        {"src": "int64", "deg": "int64"})
    deg0 = deg0.groupby("src", as_index=False)["deg"].sum()
    if len(deg0) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "core": pd.Series(dtype="int64")})
    nodes = np.sort(deg0["src"].to_numpy(np.int64))
    core = np.zeros(len(nodes), np.int64)
    alive = np.ones(len(nodes), bool)
    k = 1
    while alive.any():
        while True:
            an = nodes[alive]
            deg = alive_degrees(an)
            d = np.zeros(len(nodes), np.int64)
            pos = np.searchsorted(nodes, deg["src"].to_numpy(np.int64))
            d[pos] = deg["deg"].to_numpy(np.int64)
            kill = alive & (d < k)
            if not kill.any():
                break
            core[kill] = k - 1
            alive &= ~kill
            if not alive.any():
                break
        if alive.any():
            core[alive] = k       # survived the k-core
            k += 1

    out = pd.DataFrame({"doc_id": nodes, "core": core})
    return out.sort_values("doc_id").reset_index(drop=True)


def q141_hashed_embedding(sf_dir: str) -> pd.DataFrame:
    """Feature-hashing doc embeddings (the hashing trick, Weinberger
    et al. 2009) — the deterministic text→vector "model inference"
    verb: pass 1 builds the corpus vocab (per-batch token-count
    partials → ONE token shuffle; min_count=2 prunes hapaxes — the
    open-web-scale move is a top-K prune, q64's note); each kept
    token's vocab rank (count DESC, token ASC — DuckDB's binary utf8
    collation == Python code-point order) feeds the SQL-mirrored
    fmix32 (hashing.sample_hash32), giving dim = h % 64 and a ±1 sign
    from the next hash bit; pass 2 broadcasts the token→(dim, sign)
    model ONCE (ray.put) and scores each batch vectorized — one
    bincount per batch, ZERO shuffles, since a doc's tokens are
    row-local — into long-form (doc_id, dim, val) int64 rows.  Exact
    integer arithmetic end-to-end, so the DuckDB oracle reproduces
    every embedding coordinate value-exactly (unlike float projection
    embeddings, whose summation order drifts across engines).
    Reference parity: the scoring pass is the same broadcast-model
    actor shape as the reference's tiered scorers (SURVEY §2 T2)."""
    import ray

    from event_deduplication_ray.functions.hashing import (
        sample_hash32,
        tokenize_offsets,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    D = 64

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"tok": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(np.int64)})

    vocab = _with_schema(
        partition_apply(
            ds.map_batches(count_partial, batch_format="pandas"),
            ["tok"], QCFG.join_num_partitions,
            lambda df: df.groupby("tok", as_index=False)["n"].sum(),
        ).to_pandas(),
        {"tok": "object", "n": "int64"})
    vocab = vocab[vocab["n"] >= 2]
    vocab = vocab.sort_values(["n", "tok"], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    vid = np.arange(1, len(vocab) + 1, dtype=np.int64)
    h = sample_hash32(vid).astype(np.int64)
    dim = h % D
    sgn = np.where((h // D) % 2 == 0, 1, -1).astype(np.int64)
    model_ref = ray.put((pd.Index(vocab["tok"]), dim, sgn))

    def embed(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "dim": pd.Series(dtype="int64"),
                              "val": pd.Series(dtype="int64")})
        toks, dims, sgns = ray.get(model_ref)
        flat, lens = tokenize_offsets(df["text"].str.lower())
        if not len(flat) or not len(toks):
            return empty
        doc_of = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        idx = toks.get_indexer(flat)
        ok = idx >= 0
        if not ok.any():
            return empty
        key = doc_of[ok] * D + dims[idx[ok]]
        size = len(df) * D
        # ±1 sums fit float64 exactly up to 2**53 tokens per cell
        val = np.bincount(key, weights=sgns[idx[ok]].astype(np.float64),
                          minlength=size)
        cnt = np.bincount(key, minlength=size)
        present = np.flatnonzero(cnt > 0)
        doc_ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": doc_ids[present // D],
                             "dim": (present % D).astype(np.int64),
                             "val": val[present].astype(np.int64)})

    out = _with_schema(
        ds.map_batches(embed, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "dim": "int64", "val": "int64"})
    return out.sort_values(["doc_id", "dim"]).reset_index(drop=True)


def q142_contract_audit(sf_dir: str) -> pd.DataFrame:
    """Data-contract / schema-validation audit (the Great-Expectations
    verb a curation pipeline runs BEFORE spending compute): five
    integrity rules over the events feed — negative value, empty/null
    props, future timestamp (>= 2030-01-01, a frozen literal on both
    sides), null user, duplicate event_id — each reported as
    (n_violations, n_rows, bad_ppm) in exact integers.  The four
    row-local rules fold to one tiny per-batch partial (no shuffle);
    the uniqueness rule is total rows minus distinct event_ids, where
    per-batch DEDUPED ids hash-partition once and each partition
    reports its distinct count (disjoint key ranges sum exactly).
    bad_ppm is exact int64 (v*1e6 // n) — float division is
    tie-sensitive across engines (the q79 lesson)."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value", "props"])
    FUTURE = pd.Timestamp("2030-01-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "n": np.int64(len(df)),
            "neg": np.int64((df["value"] < 0).sum()),
            "ep": np.int64((df["props"].isna()
                            | (df["props"] == "")).sum()),
            "fut": np.int64((df["ts"] >= FUTURE).sum()),
            "nu": np.int64(df["user_id"].isna().sum()),
        }])

    sums = ds.map_batches(partial, batch_format="pandas").to_pandas()
    sums = _with_schema(sums, {"n": "int64", "neg": "int64", "ep": "int64",
                               "fut": "int64", "nu": "int64"}).sum()

    ids = ds.map_batches(
        lambda df: pd.DataFrame(
            {"event_id": pd.unique(df["event_id"].to_numpy(np.int64))}),
        batch_format="pandas")
    nd = _with_schema(
        partition_apply(
            ids, ["event_id"], QCFG.join_num_partitions,
            lambda df: pd.DataFrame(
                [{"d": np.int64(df["event_id"].nunique())}]),
        ).to_pandas(), {"d": "int64"})["d"].sum()

    n = int(sums["n"])
    rules = [("dup_event_id", n - int(nd)),
             ("empty_props", int(sums["ep"])),
             ("future_ts", int(sums["fut"])),
             ("negative_value", int(sums["neg"])),
             ("null_user", int(sums["nu"]))]
    out = pd.DataFrame(
        [(r, np.int64(v), np.int64(n),
          np.int64(v * 1_000_000 // max(n, 1))) for r, v in rules],
        columns=["rule", "n_violations", "n_rows", "bad_ppm"])
    return out.sort_values("rule").reset_index(drop=True)


def q143_table_profile(sf_dir: str) -> pd.DataFrame:
    """Exact per-column table profile (the `describe` verb a pipeline
    runs before writing transforms against an unfamiliar feed):
    n_rows / n_null / n_distinct for every events column, in exact
    integers.  Null counts fold to one tiny per-batch partial;
    distinct counts ship per-batch DEDUPED values keyed (col, val) —
    one shuffle for all columns at once, each partition reporting
    nunique per column over its disjoint value range.  Value keys are
    injective strings: timestamps as epoch µs, floats via shortest-
    roundtrip repr (distinctness is computed on the real values, the
    string is only the shuffle key).  At 100 TB swap exact distinct
    for the q48 per-group HLL (constant registers per column); exact
    mode is the audit/oracle path."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ds = _read(sf_dir, "events", cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            s = df[c]
            vals = s.dropna()
            if c == "ts":
                key = vals.astype("datetime64[us]").astype("int64") \
                    .astype(str)
            elif pd.api.types.is_float_dtype(vals):
                # -0.0 + 0.0 == 0.0: SQL DISTINCT treats them equal
                key = (vals.astype(np.float64) + 0.0).astype(str)
            else:
                key = vals.astype(str)
            u = pd.unique(key.to_numpy(dtype=object))
            frames.append(pd.DataFrame({
                "col": c, "val": u, "n": np.int64(0),
                "n_null": np.int64(0), "kind": "d"}))
            frames.append(pd.DataFrame({
                "col": [c], "val": "", "n": np.int64(len(s)),
                "n_null": np.int64(s.isna().sum()), "kind": "c"}))
        return pd.concat(frames, ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["kind"] == "d"]
        dd = d.groupby("col")["val"].nunique().rename("n_distinct") \
            .reset_index()
        c = df[df["kind"] == "c"].groupby("col", as_index=False) \
            [["n", "n_null"]].sum()
        return dd.merge(c, on="col", how="outer").fillna(0)

    agg = _with_schema(
        partition_apply(parts, ["col", "val"], QCFG.join_num_partitions,
                        combine).to_pandas(),
        {"col": "object", "n_distinct": "int64", "n": "int64",
         "n_null": "int64"})
    out = agg.groupby("col", as_index=False).sum()
    out = pd.DataFrame({
        "col": out["col"],
        "n_rows": out["n"].astype(np.int64),
        "n_null": out["n_null"].astype(np.int64),
        "n_distinct": out["n_distinct"].astype(np.int64),
    })
    return out.sort_values("col").reset_index(drop=True)


def q144_join_size_cms(sf_dir: str) -> pd.DataFrame:
    """Sketch-only join-cardinality estimate (the planner primitive:
    size |views ⋈ purchases ON user_id| BEFORE paying for the join):
    one linear pass folds each side's per-batch user_id counts into a
    Count-Min matrix; the join size Σ_k aₖ·bₖ is estimated as
    min over rows r of Σ_j A[r,j]·B[r,j] — each row is a one-sided
    OVERestimate (hash collisions only add cross terms), so the min
    never undershoots the truth and exceeds it by ≤ ε·N_a·N_b per row
    with prob 1−2⁻ᵈ (Cormode & Muthukrishnan 2005 §4.2).  Zero
    shuffles of either input: P fixed-size matrices reduce per
    partition, then on the driver.  Rows-only (approximate by
    design); the bracket gate vs the exact join is in
    test_training_ops."""
    from event_deduplication_ray.functions.sketch import (
        cms_merge,
        cms_partial,
    )

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for side, etype in (("a", "view"), ("b", "purchase")):
            ids = df.loc[df["event_type"] == etype, "user_id"] \
                .to_numpy(np.int64)
            vc = pd.Series(ids).value_counts()
            M = cms_partial(vc.index.to_numpy(np.int64).view(np.uint64),
                            vc.to_numpy(np.int64))
            rows.append({"part": int(M.sum()) % 8, "side": side,
                         "cms": M.tobytes(), "n": np.int64(len(ids))})
        return pd.DataFrame(rows, columns=["part", "side", "cms", "n"])

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (part, side), sub in df.groupby(["part", "side"]):
            mats = [np.frombuffer(b, np.int64).reshape(4, -1)
                    for b in sub["cms"]]
            out.append({"part": part, "side": side,
                        "cms": cms_merge(mats).tobytes(),
                        "n": np.int64(sub["n"].sum())})
        return pd.DataFrame(out, columns=["part", "side", "cms", "n"])

    parts = _with_schema(
        partition_apply(ds.map_batches(partial, batch_format="pandas"),
                        ["part", "side"], 8, sum_part).to_pandas(),
        {"part": "int64", "side": "object", "cms": "object", "n": "int64"})
    sides = {}
    counts = {}
    for side in ("a", "b"):
        sub = parts[parts["side"] == side]
        mats = [np.frombuffer(b, np.int64).reshape(4, -1)
                for b in sub["cms"]]
        sides[side] = cms_merge(mats) if mats else np.zeros((4, 8192),
                                                            np.int64)
        counts[side] = int(sub["n"].sum())
    est = int(np.min(np.einsum("rw,rw->r", sides["a"], sides["b"])))
    return pd.DataFrame([{
        "n_view_rows": np.int64(counts["a"]),
        "n_purchase_rows": np.int64(counts["b"]),
        "join_size_est": np.int64(est),
    }])


def q155_corpus_drift(sf_dir: str) -> pd.DataFrame:
    """Corpus-level drift sketch: MinHash fingerprints (1 KB each,
    min-mergeable — `stages/signatures.corpus_minhash`) of the even-
    and odd-doc_id halves of the corpus, plus the estimated shingle-
    set Jaccard between them — the snapshot-to-snapshot drift monitor
    that never re-reads the OLD snapshot (persist its 1 KB
    fingerprint; compare against every new crawl).  Rows-only
    (probabilistic estimate); accuracy gates in the planted pytest
    (identical → 1.0, disjoint → ~0, half-overlap within 4σ)."""
    from event_deduplication_ray.stages.signatures import (
        corpus_jaccard_estimate,
        corpus_minhash,
    )

    docs = _docs_from_documents(sf_dir)
    even = docs.filter(lambda r: r["doc_id"] % 2 == 0)
    odd = docs.filter(lambda r: r["doc_id"] % 2 == 1)
    sa = corpus_minhash(even, QCFG)
    sb = corpus_minhash(odd, QCFG)
    return pd.DataFrame([{
        "n_perms": np.int64(len(sa)),
        "jaccard_est": round(corpus_jaccard_estimate(sa, sb), 6),
    }])


def q157_ascii_ratio(sf_dir: str) -> pd.DataFrame:
    """Script-mix audit: per doc, printable-ASCII characters vs total
    characters in exact integer ppm — the cheap signal that catches
    mojibake, binary spill, and script-mislabeled docs before the
    heavier langid pass (q24's stopword vote assumes the script is
    sane).  Both counts are the same regex class on both engines
    ('[ -~]' = 0x20..0x7E), ppm is integer division; zero shuffles."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        n_chars = t.str.len().to_numpy(np.int64)
        n_ascii = t.str.count(r"[ -~]").to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": n_chars,
            "n_ascii": n_ascii,
            "ascii_ppm": np.where(
                n_chars > 0, n_ascii * 1_000_000 // np.maximum(n_chars, 1),
                np.int64(0)).astype(np.int64),
        })

    out = _with_schema(
        ds.map_batches(counts, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_chars": "int64", "n_ascii": "int64",
         "ascii_ppm": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q156_source_similarity_sketch(sf_dir: str) -> pd.DataFrame:
    """Per-SOURCE corpus fingerprints → pairwise shingle-set Jaccard
    estimates: the sketch counterpart of q100's exact cross-source dup
    matrix (q100 joins shingles; this ships one 1 KB min-mergeable
    fingerprint per (source, batch) and estimates every pair on the
    driver — feed-mirroring surveillance at a cost independent of
    corpus size).  Rows-only (probabilistic); planted gate pins a
    mirrored source at 1.0 and disjoint sources near 0."""
    import ray

    from event_deduplication_ray.functions import hashing as H2
    from event_deduplication_ray.stages.signatures import (
        corpus_jaccard_estimate,
    )

    cfg = QCFG
    mults, adds = H2.perm_constants(cfg.num_perms, cfg.seed)
    k, seed = cfg.shingle_k, cfg.seed
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from event_deduplication_ray.functions.text import normalize_text

        df = df.assign(text_norm=normalize_text(df["text"]))
        rows = []
        for src, sub in df.groupby("source"):
            flat, lens = H2.tokenize_offsets(sub["text_norm"])
            th = H2.hash_strings_u64(flat)
            sh, spd = H2.shingle_hashes(th, lens, k, seed)
            sig = H2.minhash_signatures(sh, spd, mults, adds)
            colmin = sig.min(axis=0) if len(sig) else np.full(
                cfg.num_perms, np.iinfo(np.uint64).max, np.uint64)
            rows.append({"source": src, "sig": colmin.tobytes()})
        return pd.DataFrame(rows, columns=["source", "sig"])

    parts = _with_schema(
        partition_apply(
            docs.map_batches(partial, batch_format="pandas"),
            ["source"], QCFG.join_num_partitions,
            lambda df: df.groupby("source", as_index=False)
            .agg(sig=("sig", lambda bs: np.minimum.reduce(
                [np.frombuffer(b, np.uint64) for b in bs]).tobytes())),
        ).to_pandas(),
        {"source": "object", "sig": "object"})
    fps = {r["source"]: np.frombuffer(r["sig"], np.uint64)
           for _, r in parts.iterrows()}
    srcs = sorted(fps)
    rows = [(a, b, round(corpus_jaccard_estimate(fps[a], fps[b]), 6))
            for i, a in enumerate(srcs) for b in srcs[i + 1:]]
    return pd.DataFrame(rows, columns=["source_a", "source_b",
                                       "jaccard_est"])


def q153_keep_n_dedup(sf_dir: str, n_keep: int = 2) -> pd.DataFrame:
    """Partial dedup — keep up to ``n_keep`` copies per dup family
    (the duplication-curve middle ground between q127's keep-one and
    q151's keep-all-downweighted: a little duplication of high-
    quality families is often benign or helpful, catastrophic only at
    high counts).  Deterministic: within a cluster the n_keep SMALLEST
    doc_ids survive.  One cluster_id shuffle ranks members in place
    (the q37 per-group head pattern)."""
    asn = q28_ngram_jaccard_clusters(sf_dir)
    if not isinstance(asn, pd.DataFrame):
        asn = asn.to_pandas()

    import ray.data as rd2

    def head_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["cluster_id", "doc_id"])
        out["rnk"] = out.groupby("cluster_id").cumcount() + 1
        out["keep"] = out["rnk"] <= n_keep
        return out

    res = _with_schema(
        partition_apply(rd2.from_pandas(asn), ["cluster_id"],
                        QCFG.join_num_partitions, head_rank).to_pandas(),
        {"doc_id": "int64", "cluster_id": "int64", "rnk": "int64",
         "keep": "bool"})
    res["keep"] = res["keep"].astype(bool)
    return res[["doc_id", "cluster_id", "rnk", "keep"]] \
        .sort_values("doc_id").reset_index(drop=True)


def q154_readability_counts(sf_dir: str) -> pd.DataFrame:
    """Readability raw counts (the Flesch inputs, kept exact-integer —
    the caller applies the float formula once, the q111 convention):
    per doc, n_words (whitespace tokens), n_sentences (maximal runs of
    [.!?], min 1), n_vowel_groups (maximal runs of [aeiouy] in the
    lowered text — the standard syllable proxy).  All three are
    regex-countable identically in DuckDB, so parity is exact.
    Vectorized str.count per batch; zero shuffles."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        low = t.str.lower()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_words": t.str.count(r"\S+").to_numpy(np.int64),
            "n_sentences": np.maximum(
                t.str.count(r"[.!?]+").to_numpy(np.int64), 1),
            "n_vowel_groups": low.str.count(r"[aeiouy]+")
            .to_numpy(np.int64),
        })

    out = _with_schema(
        ds.map_batches(counts, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_words": "int64", "n_sentences": "int64",
         "n_vowel_groups": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q152_contamination_pairs(sf_dir: str) -> pd.DataFrame:
    """Contamination REPORT: q33 flags which train docs overlap the
    test set; this emits the evidence — every (train, test) doc pair
    sharing >= 1 token 5-gram, with the distinct shared-shingle count
    and overlap_ppm = n_shared·1e6 // |test shingles| (how much of
    the BENCHMARK doc leaks).  Same shingle machinery as q28/q33
    (substring_mod_p=1 — the audit mode; join fan-out per shared
    shingle is the documented q28 all-pairs caveat, acceptable
    because the test side is benchmark-sized): one fp_key cogroup
    emits per-partition (train, test, shared) partials that sum
    exactly across disjoint key ranges."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir)
    fps = substring_fp_table(signature_stage(docs, cfg), cfg)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"train_id": pd.Series(dtype="int64"),
                              "test_id": pd.Series(dtype="int64"),
                              "n_shared": pd.Series(dtype="int64"),
                              "n_te": pd.Series(dtype="int64")})
        te = df[df["doc_id"] % 10 == 0]
        tr = df[df["doc_id"] % 10 != 0]
        if not len(te) or not len(tr):
            return empty
        m = tr.merge(te, on="fp_key", suffixes=("_tr", "_te"))
        if not len(m):
            return empty
        g = m.groupby(["doc_id_tr", "doc_id_te"]).agg(
            n_shared=("fp_key", "size"),
            n_te=("n_fps_te", "first")).reset_index()
        return g.rename(columns={"doc_id_tr": "train_id",
                                 "doc_id_te": "test_id"}) \
            .astype({"train_id": "int64", "test_id": "int64",
                     "n_shared": "int64", "n_te": "int64"})

    parts = partition_apply(fps, ["fp_key"], QCFG.join_num_partitions,
                            pair_partial)
    out = _with_schema(
        partition_apply(parts, ["train_id", "test_id"],
                        QCFG.join_num_partitions,
                        lambda df: df.groupby(["train_id", "test_id"],
                                              as_index=False)
                        .agg(n_shared=("n_shared", "sum"),
                             n_te=("n_te", "max"))).to_pandas(),
        {"train_id": "int64", "test_id": "int64",
         "n_shared": "int64", "n_te": "int64"})
    out["overlap_ppm"] = (out["n_shared"] * 1_000_000
                          // out["n_te"].clip(lower=1)).astype(np.int64)
    return out[["train_id", "test_id", "n_shared", "overlap_ppm"]] \
        .sort_values(["train_id", "test_id"]).reset_index(drop=True)


def q151_dedup_loss_weights(sf_dir: str) -> pd.DataFrame:
    """Soft dedup: per-doc training-loss weight = 1/cluster_size over
    the exact-Jaccard dup clusters (keep every copy, downweight so
    each dup FAMILY contributes one doc's worth of gradient — the
    alternative to q127's hard drop when dups carry distribution
    signal).  Exact integers: weight_ppm = 1e6 // cluster_size; one
    cluster_id shuffle computes sizes and joins them back (the q91
    machinery re-keyed to the doc level)."""
    asn = q28_ngram_jaccard_clusters(sf_dir)
    if not isinstance(asn, pd.DataFrame):
        asn = asn.to_pandas()

    import ray.data as rd2

    def size_join(df: pd.DataFrame) -> pd.DataFrame:
        sz = df.groupby("cluster_id")["doc_id"].transform("size") \
            .astype(np.int64)
        out = df.copy()
        out["cluster_size"] = sz
        out["weight_ppm"] = (1_000_000 // sz).astype(np.int64)
        return out

    res = _with_schema(
        partition_apply(rd2.from_pandas(asn), ["cluster_id"],
                        QCFG.join_num_partitions, size_join).to_pandas(),
        {"doc_id": "int64", "cluster_id": "int64",
         "cluster_size": "int64", "weight_ppm": "int64"})
    return res[["doc_id", "cluster_id", "cluster_size", "weight_ppm"]] \
        .sort_values("doc_id").reset_index(drop=True)


_IVFPQ_INDEX_CACHE: dict[str, str] = {}


def q150_ivfpq_topk(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ-served ANN (the FAISS IVFADC scale path,
    `stages/similarity.ivfpq_index_build/ivfpq_topk`): 8-byte ADC
    codes, probe-pruned lists — the battery-visible entry for the
    compressed serving path.  Rows-only: PQ quantization error makes
    ranks approximate by design (the planted-clump pytest carries the
    recall semantics); this entry gates that the build→encode→probe→
    ADC pipeline runs end-to-end on the driver tables and returns k
    ids."""
    import os
    import tempfile

    from event_deduplication_ray.stages.similarity import (
        ivfpq_index_build,
        ivfpq_topk,
    )

    idx = _IVFPQ_INDEX_CACHE.get(sf_dir)
    if idx is None or not os.path.isdir(idx):
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        idx = tempfile.mkdtemp(prefix="edr_ivfpq_idx_")
        ivfpq_index_build(emb, idx, n_lists=16, m=8, n_codes=16)
        _IVFPQ_INDEX_CACHE[sf_dir] = idx
    out = ivfpq_topk(idx, _query_vec(sf_dir), k=10, n_probes=4)
    return out[["vec_id"]]


def q149_dbscan_clusters(sf_dir: str) -> pd.DataFrame:
    """Density clustering over the embeddings table (DBSCAN with
    cosine ε-balls, `stages/similarity.dbscan_embeddings`): core /
    border / noise roles with deterministic min-id labels — the
    density member of the clustering family (k-means q92, threshold-
    CC q42).  Rows-only (iterative CC + role logic have no SQL form);
    the planted angle-geometry pytest pins every role."""
    from event_deduplication_ray.stages.similarity import dbscan_embeddings

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dbscan_embeddings(emb, QCFG, cos_threshold=0.99, min_pts=3)


def q148_fd_audit(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency audit (the q143 profiler's structural
    sibling): does column A determine column B?  A → B holds iff
    n_distinct(A) == n_distinct(A, B); the violation count
    n_distinct(A, B) − n_distinct(A) says how many extra (A, B)
    combinations break it.  Checked FDs over events: event_id → ts
    and event_id → user_id (hold when event_id is a proper key),
    event_type → props and user_id → event_type (expected to fail on
    real data — the audit quantifies by how much).  Exact integers:
    per-batch DEDUPED (A, B) pairs shuffle once per FD (distinct
    counts sum across disjoint hash ranges); at 100 TB swap the exact
    distinct for per-column HLL registers (q48)."""
    fds = [("event_id", "ts"), ("event_id", "user_id"),
           ("event_type", "props"), ("user_id", "event_type")]
    cols = sorted({c for fd in fds for c in fd})
    ds = _read(sf_dir, "events", cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for i, (a, b) in enumerate(fds):
            av = df[a]
            bv = df[b]
            ak = av.astype("datetime64[us]").astype("int64").astype(str) \
                if a == "ts" else av.astype(str)
            bk = bv.astype("datetime64[us]").astype("int64").astype(str) \
                if b == "ts" else bv.astype(str)
            d = pd.DataFrame({"fd": np.int64(i), "a": ak, "b": bk}) \
                .drop_duplicates()
            frames.append(d)
        return pd.concat(frames, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for i, sub in df.groupby("fd"):
            sub = sub.drop_duplicates()
            out.append({"fd": np.int64(i),
                        "n_a": np.int64(sub["a"].nunique()),
                        "n_ab": np.int64(len(sub.drop_duplicates(
                            ["a", "b"])))})
        return pd.DataFrame(out, columns=["fd", "n_a", "n_ab"])

    agg = _with_schema(
        partition_apply(ds.map_batches(partial, batch_format="pandas"),
                        ["fd", "a"], QCFG.join_num_partitions, combine)
        .to_pandas(),
        {"fd": "int64", "n_a": "int64", "n_ab": "int64"})
    agg = agg.groupby("fd", as_index=False)[["n_a", "n_ab"]].sum()
    rows = []
    for i, (a, b) in enumerate(fds):
        r = agg[agg["fd"] == i]
        n_a = int(r["n_a"].iloc[0]) if len(r) else 0
        n_ab = int(r["n_ab"].iloc[0]) if len(r) else 0
        rows.append((f"{a}->{b}", np.int64(n_a), np.int64(n_ab),
                     np.int64(n_ab - n_a), bool(n_ab == n_a)))
    out = pd.DataFrame(rows, columns=["fd", "n_lhs", "n_pairs",
                                      "n_violations", "holds"])
    return out.sort_values("fd").reset_index(drop=True)


def bpe_apply_word(word: str, ranks: "dict[tuple[str, str], int]") \
        -> "list[str]":
    """Apply learned BPE merges to ONE word (Sennrich et al. 2016
    inference): repeatedly merge the best-ranked adjacent pair, all
    its non-overlapping occurrences left-to-right, until no learned
    pair remains.  Matches q117's training-side merge application
    exactly (same left-to-right scan), so encoding the training
    corpus reproduces training's final symbol sequences."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        l_s, r_s = best_pair
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l_s and syms[i + 1] == r_s:
                out.append(l_s + r_s)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def q147_bpe_subword_counts(sf_dir: str) -> pd.DataFrame:
    """Tokenizer train→APPLY composition: encode every doc with the
    corpus-learned BPE merge table (q117) and report per-doc subword
    counts — the number that actually prices a document against a
    token budget under the corpus's own tokenizer (q77's regex
    counter approximates it with a fixed pre-tokenizer).  The rank
    table broadcasts once; each batch encodes only its DISTINCT words
    (bounded by the batch vocab — the per-word merge loop is the
    q117-documented driver-loop shape moved per-batch) and maps
    counts back vectorized.  Rows-only (the merge table is learned
    iteratively — no SQL form); gates: hand-worked planted corpus,
    concat-roundtrip and bounds properties."""
    import ray

    from event_deduplication_ray.functions.hashing import tokenize_offsets

    merges = q117_bpe_merges(sf_dir)
    ranks = {(l, r): int(k) for k, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}
    ranks_ref = ray.put(ranks)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        rk = ray.get(ranks_ref)
        flat, lens = tokenize_offsets(df["text"].str.lower())
        if not len(flat):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_subwords": pd.Series(dtype="int64")})
        uniq, inv = np.unique(flat, return_inverse=True)
        n_sub = np.array([len(bpe_apply_word(w, rk)) for w in uniq],
                         dtype=np.int64)
        per_tok = n_sub[inv]
        doc_of = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        sums = np.bincount(doc_of, weights=per_tok.astype(np.float64),
                           minlength=len(df)).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_subwords": sums})

    out = _with_schema(
        ds.map_batches(encode, batch_format="pandas").to_pandas(),
        {"doc_id": "int64", "n_subwords": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q146_crosslingual_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Cross-lingual near-duplicates: embedding-cosine dup pairs
    (q26's SRP-bucketed machinery) whose DOCUMENTS carry different
    langs — the translation-duplicate audit a multilingual corpus
    needs before per-lang mixing (q37/q110 caps treat translations as
    distinct; this surfaces them).  Ids align 1:1 across
    documents/embeddings (the q114 contract).  The pair set is small
    by construction, so langs attach driver-side; at corpus scale the
    attach is one (doc_id) cogroup of a 16 B/row lang table against
    the pair list."""
    from event_deduplication_ray.stages.similarity import embedding_dup_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_dup_pairs(emb, QCFG, cos_threshold=0.99)
    df = out.select_columns(["id_a", "id_b"]).to_pandas()
    if list(df.columns) != ["id_a", "id_b"]:
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                           "id_b": pd.Series(dtype="int64")})
    langs = _read(sf_dir, "documents", ["doc_id", "lang"]).to_pandas()
    lk = langs.set_index("doc_id")["lang"]
    df["lang_a"] = df["id_a"].map(lk)
    df["lang_b"] = df["id_b"].map(lk)
    df = df[df["lang_a"].notna() & df["lang_b"].notna()
            & (df["lang_a"] != df["lang_b"])]
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True) \
        .astype({"id_a": "int64", "id_b": "int64"})


_PHRASE_INDEX_CACHE: dict[str, str] = {}


def q145_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Exact ordered-phrase search served from the POSITIONAL posting
    index (`stages/textindex.phrase_index_build/phrase_search`) — the
    phrase-query member of the retrieval family (q89 streaming AND,
    q90 index AND, q108 BM25 ranking).  The query is self-derived and
    deterministic (the q89 pattern): the corpus's top bigram by count
    (ties: w1, w2 asc).  A doc matches at start p iff w1 sits at p and
    w2 at p+1; the serve path reads only the two terms' shards and
    shuffles (doc_id, p, term_idx) triples of the query's postings —
    never the corpus.  Returns (doc_id, n_phrase) with overlapping
    occurrences counted, which for k=2 equals the bigram occurrence
    count — exactly what the SQL oracle computes from the q64
    list_transform enumeration."""
    import os
    import tempfile

    from event_deduplication_ray.functions.hashing import tokenize_offsets
    from event_deduplication_ray.stages.textindex import (
        phrase_index_build,
        phrase_search,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    idx = _PHRASE_INDEX_CACHE.get(sf_dir)
    if idx is None or not os.path.isdir(idx):
        idx = tempfile.mkdtemp(prefix="edr_phrase_idx_")
        phrase_index_build(ds, idx)
        _PHRASE_INDEX_CACHE[sf_dir] = idx

    def bg_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_offsets(df["text"].str.lower())
        n = len(flat)
        empty = pd.DataFrame({"w1": pd.Series(dtype="object"),
                              "w2": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        if n < 2:
            return empty
        start_ok = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        start_ok[ends[lens > 0] - 1] = False
        i = np.flatnonzero(start_ok[:-1])
        if not len(i):
            return empty
        g = pd.DataFrame({"w1": flat[i], "w2": flat[i + 1]}) \
            .groupby(["w1", "w2"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    top = _with_schema(
        partition_apply(
            ds.map_batches(bg_partial, batch_format="pandas"),
            ["w1", "w2"], QCFG.join_num_partitions,
            lambda df: df.groupby(["w1", "w2"], as_index=False)["n"].sum()
            .sort_values(["n", "w1", "w2"],
                         ascending=[False, True, True]).head(1),
        ).to_pandas(),
        {"w1": "object", "w2": "object", "n": "int64"})
    if not len(top):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_phrase": pd.Series(dtype="int64")})
    top = top.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True]).iloc[0]
    return phrase_search(idx, [top["w1"], top["w2"]])


def q158_leakfree_split(sf_dir: str) -> pd.DataFrame:
    """Leakage-free train/val/test split: q56's fmix32 range split
    applied at the DUP-CLUSTER level — the split key is the exact-
    Jaccard cluster id (min member doc_id from q28's CC), so a dup
    family can never straddle a split boundary.  Doc-level hashing
    (q56) leaks train text into val/test whenever a family splits —
    the eval-contamination mechanism Lee et al. 2022 measure; hashing
    the cluster id removes it at zero extra shuffles past q28's.
    Exact-integer fmix32 thresholds shared with q56's oracle chain
    (cluster ids are min doc_ids, hence nonnegative — the domain where
    engine and SQL hashes agree)."""
    T_TRAIN = 3435973836  # floor(0.8 * 2**32)
    T_VAL = 3865470566    # floor(0.9 * 2**32)
    asn = q28_ngram_jaccard_clusters(sf_dir)
    if not isinstance(asn, pd.DataFrame):
        asn = asn.to_pandas()
    asn = _with_schema(asn, {"doc_id": "int64", "cluster_id": "int64"})
    h = H.sample_hash32(asn["cluster_id"].to_numpy())
    out = asn.copy()
    out["split"] = np.where(h < T_TRAIN, "train",
                            np.where(h < T_VAL, "val", "test"))
    return (out[["doc_id", "cluster_id", "split"]]
            .sort_values("doc_id").reset_index(drop=True))


def q159_key_skew(sf_dir: str) -> pd.DataFrame:
    """Key-skew audit: exact per-key frequency statistics for the
    shuffle keys this engine would partition the events stream by —
    the operational readout behind every salting/hot-key decision
    (n_keys, max, exact p99 of per-key counts, top-1 share).  Shape:
    per-batch count partials → ONE key shuffle per audited column →
    each partition folds its keys to a count-of-counts histogram, so
    driver traffic is O(distinct count values), never O(keys).  The
    p99 index uses DuckDB percentile_disc's exact-decimal ceil(p·n)
    (= (99·n+99)//100 — float ceil is wrong at n=100); the top-1
    share is exact integer ppm.  Contract: an EMPTY events table
    yields no row for that key (SQL would emit one all-NULL row) —
    observed-keys-only, like q134's observed-hours contract."""
    rows = []
    for key_col in ("event_type", "user_id"):
        ds = _read(sf_dir, "events", [key_col])

        def partial(df: pd.DataFrame, kc=key_col) -> pd.DataFrame:
            g = df.groupby(kc, as_index=False).size()
            g = g.rename(columns={kc: "k", "size": "n"})
            g["k"] = g["k"].astype(str)
            return g

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("k", as_index=False)["n"].sum()
            h = g.groupby("n", as_index=False).size()
            return h.rename(columns={"size": "n_keys"})

        hist = _with_schema(
            partition_apply(
                ds.map_batches(partial, batch_format="pandas"),
                ["k"], QCFG.join_num_partitions, fold).to_pandas(),
            {"n": "int64", "n_keys": "int64"})
        hist = hist.groupby("n", as_index=False)["n_keys"].sum() \
            .sort_values("n").reset_index(drop=True)
        if not len(hist):
            continue
        nk = int(hist["n_keys"].sum())
        total = int((hist["n"] * hist["n_keys"]).sum())
        mx = int(hist["n"].max())
        idx = (99 * nk + 99) // 100  # 1-based exact ceil(0.99 * nk)
        cum = hist["n_keys"].cumsum()
        p99 = int(hist.loc[cum >= idx, "n"].iloc[0])
        rows.append((key_col, nk, total, mx, p99,
                     1_000_000 * mx // total))
    return pd.DataFrame(
        rows, columns=["key_col", "n_keys", "total_rows", "max_count",
                       "p99_count", "top1_share_ppm"]
    ).astype({"n_keys": "int64", "total_rows": "int64",
              "max_count": "int64", "p99_count": "int64",
              "top1_share_ppm": "int64"}).sort_values("key_col") \
        .reset_index(drop=True)


def q160_quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Learned quality classifier over the embeddings table
    (`stages/classify.logreg_fit/logreg_score`): full-batch logistic
    regression (label 0 = positive seed) trained with resident
    partitions — one linear scan per round, O(P·d) driver traffic —
    then the whole table scored in one streaming pass (the GPT-3
    WebText-classifier / CCNet-filter verb).  Readouts: exact train
    accuracy, rank-AUC of the score against the seed labels (the
    driver embeddings are only weakly label-clustered, so AUC — not
    0/1 accuracy — is the informative number), and the top-(seed-
    size) keep count.  The AUC rides per-partition RANK-HISTOGRAM
    partials — each batch scores AND bins (label already on the row,
    so no join) into a sparse (bin, n_pos, n_neg) table; the driver
    merges <= min(rows, 2^20) tiny rows per partition and computes
    the rank-sum U from bin cumulatives (scores within one 1.2e-4-
    wide bin tie at half credit — the average-rank convention the
    exact formula uses for equal floats).  Nothing O(table) reaches
    the driver.  seed_recall counts positives among the global
    top-n_pos scores; the boundary bin contributes proportionally
    (deterministic, partition-order-free).  Rows-only (iterative
    float fixpoint); planted-separability, determinism and
    partition-invariance gates in tests/test_classify.py."""
    from event_deduplication_ray.stages.classify import logreg_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    fit = logreg_fit(emb, QCFG, positive=0, n_iters=30, lr=12.0, l2=1e-4)

    from event_deduplication_ray.stages.classify import (
        _emb_matrix,
        _normalize_rows,
    )

    wv = np.asarray(fit["w"], np.float64)
    B, Z = 1 << 20, 64.0          # bins over clipped margin [-Z, Z]

    def hist_partial(t: pa.Table) -> pa.Table:
        X = _normalize_rows(_emb_matrix(t["embedding"]))
        if not len(X):
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64()),
                             "n_neg": pa.array([], pa.int64())})
        z = np.clip(X @ wv[:-1] + wv[-1], -Z, Z)
        bins = np.minimum((z + Z) * (B / (2 * Z)), B - 1).astype(np.int64)
        y = t["label"].to_numpy(zero_copy_only=False).astype(np.int64) == 0
        u_bins = np.unique(bins)
        pos = np.bincount(np.searchsorted(u_bins, bins[y]),
                          minlength=len(u_bins))
        neg = np.bincount(np.searchsorted(u_bins, bins[~y]),
                          minlength=len(u_bins))
        return pa.table({"bin": pa.array(u_bins),
                         "n_pos": pa.array(pos.astype(np.int64)),
                         "n_neg": pa.array(neg.astype(np.int64))})

    h = (emb.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
         .groupby("bin", as_index=False).sum().sort_values("bin"))
    n_p = int(h["n_pos"].sum()) if len(h) else 0
    n_n = int(h["n_neg"].sum()) if len(h) else 0
    if n_p and n_n:
        npos = h["n_pos"].to_numpy(np.float64)
        nneg = h["n_neg"].to_numpy(np.float64)
        cum_neg_below = np.concatenate([[0.0], np.cumsum(nneg)[:-1]])
        u = float((npos * (cum_neg_below + 0.5 * nneg)).sum())
        auc_ppm = int(1_000_000 * u / (n_p * n_n))
    else:
        auc_ppm = 0
    if n_p:
        # top-n_p cutoff walked from the highest bin; the boundary
        # bin's positives count proportionally to the rows taken
        tot = (h["n_pos"] + h["n_neg"]).to_numpy(np.int64)[::-1]
        posr = h["n_pos"].to_numpy(np.int64)[::-1]
        cum = np.cumsum(tot)
        k = int(np.searchsorted(cum, n_p))         # boundary bin idx
        full = int(posr[:k].sum())
        taken = n_p - (int(cum[k - 1]) if k else 0)
        frac = (taken * int(posr[k])) // max(int(tot[k]), 1) \
            if k < len(tot) else 0
        seed_recall_ppm = 1_000_000 * (full + frac) // n_p
    else:
        seed_recall_ppm = 0
    return pd.DataFrame({
        "n": [np.int64(fit["n"])],
        "n_pos": [np.int64(fit["n_pos"])],
        "train_accuracy_ppm": [np.int64(fit["accuracy_ppm"])],
        "auc_ppm": [np.int64(auc_ppm)],
        "seed_recall_at_seed_ppm": [np.int64(seed_recall_ppm)],
    })


def q162_hard_negatives(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Hard-negative mining for matcher training: candidate pairs
    that COLLIDED in an LSH band (lexically close enough to bucket
    together) but whose verified signature Jaccard is <= the no-match
    threshold — the adversarial non-duplicates a pairwise model must
    learn to reject (reference E2/E3 plant these by hand in fixtures;
    this mines them at corpus scale).  Reuses q20's signature→band→
    pair→verify machinery plus one filter, and the substring tier's
    opt-in sub-threshold emission (shared real substrings, low
    containment — where boilerplate-driven negatives actually live;
    a minhash band collision at Jaccard <= 0.35 needs 8 agreeing
    hashes and is vanishingly rare).  The hardest k (highest score
    below each tier's bar) survive a per-batch local top-k before
    the driver concat, so driver traffic is O(batches·k).  Rows-only
    (hash-seeded bands decide which negatives surface)."""
    import pyarrow.compute as pc

    from event_deduplication_ray.stages.banding import (
        minhash_band_table,
        substring_fp_table,
    )
    from event_deduplication_ray.stages.pairs import (
        minhash_candidate_pairs,
        substring_match_pairs,
    )
    from event_deduplication_ray.stages.signatures import signature_stage
    from event_deduplication_ray.stages.verify import verify_pairs

    docs = _docs_from_documents(sf_dir)
    sigs = signature_stage(docs, QCFG).materialize()
    pairs = minhash_candidate_pairs(minhash_band_table(sigs, QCFG), QCFG)
    verified = verify_pairs(pairs, sigs, QCFG)
    sub = substring_match_pairs(substring_fp_table(sigs, QCFG), QCFG,
                                emit_below=0.1)

    def neg_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["decision"], "no_match"))
        df = t.select(["id_a", "id_b", "score", "tier"]).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["score", "id_a", "id_b"],
                           ascending=[False, True, True]).head(k),
            preserve_index=False)

    frames = []
    for src in (verified, sub):
        f = src.map_batches(neg_topk, batch_format="pyarrow").to_pandas()
        frames.append(_with_schema(
            f, {"id_a": "int64", "id_b": "int64", "score": "float64",
                "tier": "object"}))
    out = pd.concat(frames, ignore_index=True)
    return (out.sort_values(["score", "id_a", "id_b"],
                            ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def q163_fragile_clusters(sf_dir: str, max_cluster: int = 128) -> pd.DataFrame:
    """Fragile-cluster audit: articulation docs — members whose
    removal DISCONNECTS their dup cluster (the doc a GDPR delete or
    review split turns into a cluster split: `incremental_remove`
    implements that split, this op predicts where it can happen).
    Shape: q28's exact edges are tagged with their cluster id (the
    multi-member slice of the assignment table — bounded by dup docs,
    the q124 argument — broadcasts once) and hash-partition ONCE by
    cluster_id; each partition runs the exact per-cluster articulation
    test (remove x, BFS the rest — O(v·(v+e)), v bounded by
    ``max_cluster``; larger boilerplate clusters are REPORTED with
    checked=False, never silently skipped).  Rows-only (per-vertex
    reachability-after-removal has no tractable SQL form); planted
    path/triangle/star gates carry the semantics."""
    import ray

    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    asn = q28_ngram_jaccard_clusters(sf_dir)
    if not isinstance(asn, pd.DataFrame):
        asn = asn.to_pandas()
    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    docs = _docs_from_documents(sf_dir)
    pairs = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(docs, cfg), cfg),
        cfg, threshold=cfg.jaccard_match)

    sz = asn.groupby("cluster_id")["doc_id"].transform("size")
    mem = asn[sz >= 2]
    empty = pd.DataFrame({
        "cluster_id": pd.Series(dtype="int64"),
        "doc_id": pd.Series(dtype="int64"),
        "n_members": pd.Series(dtype="int64"),
        "checked": pd.Series(dtype="bool")})
    if not len(mem):
        return empty
    mids = mem["doc_id"].to_numpy(np.int64)
    mcl = mem["cluster_id"].to_numpy(np.int64)
    order = np.argsort(mids)
    ref = ray.put((mids[order], mcl[order]))

    def tag(t: pa.Table) -> pa.Table:
        ids_s, cl_s = ray.get(ref)
        a = t["id_a"].to_numpy()
        return pa.table({
            "cluster_id": pa.array(cl_s[np.searchsorted(ids_s, a)]),
            "id_a": t["id_a"], "id_b": t["id_b"]})

    def artic(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cid, g in df.groupby("cluster_id"):
            va = g["id_a"].to_numpy(np.int64)
            vb = g["id_b"].to_numpy(np.int64)
            verts = np.unique(np.concatenate([va, vb]))
            v = len(verts)
            if v > max_cluster:
                rows.append((int(cid), -1, v, False))
                continue
            pos = {int(x): i for i, x in enumerate(verts)}
            adj: list[set] = [set() for _ in range(v)]
            for x, y in zip(va, vb):
                adj[pos[int(x)]].add(pos[int(y)])
                adj[pos[int(y)]].add(pos[int(x)])
            for rm in range(v):
                start = 0 if rm != 0 else 1
                seen = {start}
                stack = [start]
                while stack:
                    cur = stack.pop()
                    for nxt in adj[cur]:
                        if nxt != rm and nxt not in seen:
                            seen.add(nxt)
                            stack.append(nxt)
                if len(seen) < v - 1:
                    rows.append((int(cid), int(verts[rm]), v, True))
        return pd.DataFrame(
            rows, columns=["cluster_id", "doc_id", "n_members", "checked"])

    out = _with_schema(
        partition_apply(pairs.map_batches(tag, batch_format="pyarrow"),
                        ["cluster_id"], QCFG.join_num_partitions,
                        artic).to_pandas(),
        {"cluster_id": "int64", "doc_id": "int64", "n_members": "int64",
         "checked": "bool"})
    return (out.astype({"cluster_id": "int64", "doc_id": "int64",
                        "n_members": "int64", "checked": "bool"})
            .sort_values(["cluster_id", "doc_id"]).reset_index(drop=True))


def q164_ann_recall(sf_dir: str, n_queries: int = 10, k: int = 10) -> pd.DataFrame:
    """ANN serving-quality audit (the FAISS-bench shape): recall@k of
    every persisted index family — SRP (Hamming-1 partitions), IVF
    (probe-4) and IVF-PQ (probe-4, 8-byte ADC codes) — against the
    exact brute-force answer over the first ``n_queries`` vectors, as
    ONE exact-integer-ppm number per family per round.  Probe-limited
    modes are the at-scale serving points, so recall < 1.0 is the
    designed trade, not a bug; per-family planted recall gates live
    in tests/test_similarity*.py.  Indexes reuse the battery's cached
    builds; rows-only (recall depends on hash/k-means layout)."""
    from event_deduplication_ray.stages.similarity import (
        _emb_matrix,
        brute_force_topk_many,
        ivf_topk,
        ivfpq_topk,
        srp_index_topk,
    )

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def head_rows(t: pa.Table) -> pa.Table:
        m = t["vec_id"].to_numpy() < n_queries
        return t.filter(pa.array(m))

    qdf = emb.map_batches(head_rows, batch_format="pyarrow").to_pandas()
    if "vec_id" not in qdf.columns or not len(qdf):
        return pd.DataFrame({"family": pd.Series(dtype="object"),
                             "recall_ppm": pd.Series(dtype="int64")})
    qdf = qdf.sort_values("vec_id").reset_index(drop=True)
    Q = _emb_matrix(qdf["embedding"])
    nq = len(qdf)

    exact = brute_force_topk_many(emb, Q, k=k)
    truth = {int(i): set(g["vec_id"].astype(int))
             for i, g in exact.groupby("query_idx")}

    # ensure the cached index dirs exist (side effect of the battery
    # entries; cheap single-query serves)
    q25_lsh_topk(sf_dir)
    q32_ivf_topk(sf_dir)
    q150_ivfpq_topk(sf_dir)
    srp_dir = _SRP_INDEX_CACHE[sf_dir]
    ivf_dir = _IVF_INDEX_CACHE[sf_dir]
    pq_dir = _IVFPQ_INDEX_CACHE[sf_dir]

    serves = {
        "srp_hamming1": lambda v: srp_index_topk(srp_dir, v, k=k),
        "ivf_probe4": lambda v: ivf_topk(ivf_dir, v, k=k, n_probes=4),
        "ivfpq_probe4": lambda v: ivfpq_topk(pq_dir, v, k=k, n_probes=4),
    }
    rows = [("brute_force", 1_000_000)]
    denom = sum(len(truth.get(i, ())) for i in range(nq))
    for fam, serve in serves.items():
        hits = 0
        for i in range(nq):
            got = set(serve(Q[i])["vec_id"].astype(int))
            hits += len(got & truth.get(i, set()))
        rows.append((fam, 1_000_000 * hits // max(denom, 1)))
    return pd.DataFrame(rows, columns=["family", "recall_ppm"]) \
        .astype({"recall_ppm": "int64"}) \
        .sort_values("family").reset_index(drop=True)


_SCREEN_RUN_CACHE: dict[str, str] = {}


def q161_corpus_screen(sf_dir: str) -> pd.DataFrame:
    """Admission-control screening on the driver tables
    (`pipelines/incremental.screen_docs`): even-doc_id documents form
    the checkpointed corpus (one cached resumable run per sf_dir),
    odd-doc_id documents arrive as the candidate batch — every
    odd doc gets a read-only verdict (is_dup, dup_of, tier) at
    O(batch) shuffle cost.  The driver corpus's dup families straddle
    the parity split, so both dup and novel verdicts are exercised.
    Rows-only (verdicts ride hash-seeded tiers); the planted
    semantics + read-only gates live in tests/test_incremental.py."""
    import os
    import tempfile

    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import (
        dedup_path_resumable,
    )
    from event_deduplication_ray.pipelines.incremental import screen_docs

    cfg = DedupConfig(use_substring=True, join_num_partitions=8)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    d = docs.to_pandas()
    corpus, batch = d[d["doc_id"] % 2 == 0], d[d["doc_id"] % 2 == 1]

    root = _SCREEN_RUN_CACHE.get(sf_dir)
    if root is None or not os.path.isdir(root):
        root = tempfile.mkdtemp(prefix="edr_screen_")
        pa_tbl = pa.Table.from_pandas(corpus, preserve_index=False)
        pq.write_table(pa_tbl, f"{root}/corpus.parquet")
        dedup_path_resumable(f"{root}/corpus.parquet",
                             f"{root}/run", cfg)
        _SCREEN_RUN_CACHE[sf_dir] = root
    batch_path = f"{root}/batch.parquet"
    if not os.path.exists(batch_path):
        pq.write_table(pa.Table.from_pandas(batch, preserve_index=False),
                       batch_path)
    out = screen_docs(f"{root}/run", batch_path, cfg)
    return out[["doc_id", "is_dup", "dup_of", "tier"]]


def _lev1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance-1 test for two DISTINCT strings
    (callers never pass equal keys): O(len) two-pointer check instead
    of the full DP — equal lengths need exactly one substitution,
    lengths off by one need the shorter to equal the longer minus one
    character."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def q165_editdist_dedup(sf_dir: str) -> pd.DataFrame:
    """Edit-distance near-dup pairs via deletion-neighborhood (FastSS)
    banding — the character-granularity dedup family beside token
    5-grams (q28), lines (q78), 64-char windows (q129) and simhash
    bits (q21): typo/OCR-variant heads that no shingle tier can pair.
    Keys are the first 16 chars of the q59 ASCII normalization; docs
    collapse to DISTINCT keys first (min doc_id + copy count —
    distance-0 dups are q59's job), each key emits itself plus its
    ≤16 single-deletion variants, ONE variant-hash shuffle co-locates
    candidates (FastSS guarantee: two strings at Levenshtein 1 share
    a variant — a substitution pair at the both-sides deletion, an
    indel pair at the shorter string itself), the two-pointer verify
    keeps exact distance-1 pairs, and a second tiny shuffle dedups
    pairs colliding in several buckets.  At 100 TB only (u64 hash,
    i64 id, ≤16-char key) rows per DISTINCT key move — corpus text
    never enters a shuffle, and bucket fan-out is bounded by key
    length + 1.  Oracle: DuckDB levenshtein() all-pairs over the
    distinct keys (audit-mode cross check, q28 precedent)."""
    klen = 16

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        norm = (df["text"].fillna("").str.lower()
                .str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip())
        g = pd.DataFrame({"key": norm.str.slice(0, klen),
                          "doc_id": df["doc_id"].astype(np.int64)})
        g = g[g["key"] != ""]
        return g.groupby("key", as_index=False).agg(
            doc_id=("doc_id", "min"), n_docs=("doc_id", "size"))

    parts = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pandas")

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", as_index=False).agg(
            doc_id=("doc_id", "min"), n_docs=("n_docs", "sum"))
        vs: list[str] = []
        doc: list[int] = []
        key: list[str] = []
        nd: list[int] = []
        for k, d, n in zip(g["key"], g["doc_id"], g["n_docs"]):
            seen = {k}
            for i in range(len(k)):
                seen.add(k[:i] + k[i + 1:])
            vs.extend(seen)
            doc.extend([int(d)] * len(seen))
            key.extend([k] * len(seen))
            nd.extend([int(n)] * len(seen))
        # one vectorized hash per partition; >>1 keeps vh a
        # non-negative int64 (doc_ids_for_urls precedent) — stray
        # hash collisions only co-locate keys, _lev1 still verifies
        vh = ((H.hash_strings_u64(pd.Series(vs, dtype="object"))
               >> np.uint64(1)).astype(np.int64)
              if vs else np.array([], dtype=np.int64))
        return pd.DataFrame({
            "vh": vh,
            "doc_id": np.asarray(doc, dtype=np.int64),
            "key": pd.Series(key, dtype="object"),
            "n_docs": np.asarray(nd, dtype=np.int64),
        })

    vtab = partition_apply(parts, ["key"], QCFG.join_num_partitions, variants)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple[int, int, str, str, int, int]] = []
        for _, grp in df.groupby("vh"):
            if len(grp) < 2:
                continue
            recs = list(zip(grp["doc_id"], grp["key"], grp["n_docs"]))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    (da, ka, na), (db, kb, nb) = recs[i], recs[j]
                    if ka == kb or not _lev1(ka, kb):
                        continue
                    if db < da:
                        da, db, ka, kb, na, nb = db, da, kb, ka, nb, na
                    out.append((int(da), int(db), ka, kb, int(na), int(nb)))
        cols = ["id_a", "id_b", "key_a", "key_b", "n_docs_a", "n_docs_b"]
        if not out:
            return pd.DataFrame({
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "key_a": pd.Series(dtype="object"),
                "key_b": pd.Series(dtype="object"),
                "n_docs_a": pd.Series(dtype="int64"),
                "n_docs_b": pd.Series(dtype="int64"),
            })
        return pd.DataFrame(out, columns=cols).drop_duplicates(
            ["id_a", "id_b"])

    cands = partition_apply(vtab, ["vh"], QCFG.join_num_partitions,
                            bucket_pairs)
    out = _with_schema(cands.to_pandas(), {
        "id_a": "int64", "id_b": "int64", "key_a": "object",
        "key_b": "object", "n_docs_a": "int64", "n_docs_b": "int64",
    })
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)[
        ["id_a", "id_b", "key_a", "key_b", "n_docs_a", "n_docs_b"]]


def q166_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-doc novelty: the share of a doc's DISTINCT token 5-gram
    shingles whose FIRST corpus occurrence (min doc_id over all docs
    containing the shingle) is the doc itself — the redundancy /
    memorization readout used to order training curricula and to
    price marginal data (an all-novel doc scores 1e6 ppm, an exact
    copy of an earlier doc 0, boilerplate-heavy docs in between).
    Same exact shingle contract as q28/q33/q152 (substring_mod_p=1,
    short-doc stub shingle; reference parity: the reference's
    blocking keys are its analogous per-record token evidence,
    src/event_dedup/matching/blocking.py).  Scale shape: ONE fp_key
    shuffle both resolves each shingle's owner (all rows of an fp
    land in one partition, so min is exact) and folds per-doc
    (n, novel) partials in the same pass; a second narrow doc_id
    shuffle sums partials — shuffle bytes are (fp_key, doc_id) plus
    two int64 partial columns, never text.  Docs with zero tokens
    emit no shingles and are absent (the oracle's dsh matches)."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.signatures import signature_stage

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    fps = substring_fp_table(signature_stage(_docs_from_documents(sf_dir),
                                             cfg), cfg)

    def per_fp(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_part": pd.Series(dtype="int64"),
                                 "novel_part": pd.Series(dtype="int64")})
        owner = df.groupby("fp_key")["doc_id"].transform("min")
        g = (df.assign(novel=(df["doc_id"] == owner).astype(np.int64))
             .groupby("doc_id", as_index=False)
             .agg(n_part=("fp_key", "size"), novel_part=("novel", "sum")))
        return g.astype({"doc_id": "int64", "n_part": "int64",
                         "novel_part": "int64"})

    parts = partition_apply(fps, ["fp_key"], QCFG.join_num_partitions,
                            per_fp)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_shingles=("n_part", "sum"), n_novel=("novel_part", "sum"))
        g["novel_ppm"] = (g["n_novel"] * 1_000_000
                          // g["n_shingles"]).astype(np.int64)
        return g.astype({"doc_id": "int64", "n_shingles": "int64",
                         "n_novel": "int64", "novel_ppm": "int64"})

    out = _with_schema(
        partition_apply(parts, ["doc_id"], QCFG.join_num_partitions,
                        per_doc).to_pandas(),
        {"doc_id": "int64", "n_shingles": "int64", "n_novel": "int64",
         "novel_ppm": "int64"})
    return out[["doc_id", "n_shingles", "n_novel", "novel_ppm"]] \
        .sort_values("doc_id").reset_index(drop=True)


def q167_template_dedup(sf_dir: str) -> pd.DataFrame:
    """Templated-boilerplate detection: q59's normalized exact dedup
    with DIGIT RUNS masked to '#' first, so machine-generated page
    families ("weather report for 2024 01 02 ...") that differ only
    in numbers collapse to one template — the synthetic/templated-
    content gate crawl curation needs beside true dup removal.  Per
    template (>= 2 docs, non-empty key): template_id = min doc_id,
    n_copies, and n_variants = distinct q59-normalized texts inside
    the group — n_variants >= 2 separates real templating from plain
    exact copies.  Scale shape is q59's: normalization + both hashes
    run per batch, per-batch distinct partials, then ONE template-
    hash shuffle folds counts and resolves variant distinctness
    exactly (all rows of a template land in one partition).  ASCII-
    explicit classes keep Python re and DuckDB RE2 identical (q59 /
    q77 precedent)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].fillna("").str.lower()
        tk = (low.str.replace(r"[0-9]+", "#", regex=True)
              .str.replace(r"[^a-z#]+", " ", regex=True).str.strip())
        nk = (low.str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip())
        g = pd.DataFrame({
            "tkey": H.hash_strings_u64(tk).astype(np.int64),
            "nkey": H.hash_strings_u64(nk).astype(np.int64),
            "doc_id": df["doc_id"].astype(np.int64),
        })[tk != ""]
        return g.groupby(["tkey", "nkey"], as_index=False).agg(
            min_doc=("doc_id", "min"), n=("doc_id", "size"))

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tkey").agg(
            template_id=("min_doc", "min"), n_copies=("n", "sum"),
            n_variants=("nkey", "nunique")).reset_index(drop=True)
        g = g[g["n_copies"] >= 2]
        return g.astype({"template_id": "int64", "n_copies": "int64",
                         "n_variants": "int64"})

    out = _with_schema(
        partition_apply(parts, ["tkey"], QCFG.join_num_partitions,
                        combine).to_pandas(),
        {"template_id": "int64", "n_copies": "int64", "n_variants": "int64"})
    return out.sort_values("template_id").reset_index(drop=True)


_STITCH_W = 8


def _stitch_edges(sf_dir: str) -> pd.DataFrame:
    """Shared q168/q169 edge pass: ordered (id_a, id_b) pairs where
    doc A's last 8 normalized tokens equal doc B's first 8."""
    W = _STITCH_W
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        norm = (df["text"].fillna("").str.lower()
                .str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip())
        toks = norm.str.split()
        ok = toks.str.len() >= W
        toks, ids = toks[ok], df["doc_id"][ok].astype(np.int64)
        head = toks.str[:W].str.join(" ")
        tail = toks.str[-W:].str.join(" ")
        hh = H.hash_strings_u64(head).astype(np.int64)
        th = H.hash_strings_u64(tail).astype(np.int64)
        return pd.DataFrame({
            "key": np.concatenate([th, hh])
            if len(ids) else np.array([], dtype=np.int64),
            "doc_id": np.concatenate([ids.to_numpy(), ids.to_numpy()])
            if len(ids) else np.array([], dtype=np.int64),
            "is_tail": np.concatenate([np.ones(len(ids), dtype=np.int8),
                                       np.zeros(len(ids), dtype=np.int8)]),
        })

    parts = ds.map_batches(keys, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["is_tail"] == 1]
        h = df[df["is_tail"] == 0]
        if not len(t) or not len(h):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        m = t.merge(h, on="key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] != m["doc_id_b"]]
        return (m[["doc_id_a", "doc_id_b"]]
                .rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})
                .drop_duplicates().astype("int64"))

    out = _with_schema(
        partition_apply(parts, ["key"], QCFG.join_num_partitions,
                        pairs).to_pandas(),
        {"id_a": "int64", "id_b": "int64"})
    return (out.drop_duplicates().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


def _assemble_stitch_chains(df: pd.DataFrame) -> pd.DataFrame:
    """q169's per-partition chain assembly over co-located members
    (chain_id, pos, norm).  Edges come from u64 seam-hash equality;
    unlike the report-only q168, trimming here REWRITES text, so each
    non-head fragment's first W tokens are confirmed as STRINGS
    against the predecessor's last W (texts are already co-located —
    the check is O(W) per seam) and the whole chain is dropped on a
    collision rather than emitting a corrupted merge."""
    recs = []
    for cid, grp in df.groupby("chain_id"):
        grp = grp.sort_values("pos")
        parts_txt = []
        prev_toks: "list[str] | None" = None
        ok = True
        for p, t in zip(grp["pos"], grp["norm"]):
            toks = t.split()
            if p == 0:
                parts_txt.append(t)
            else:
                if (prev_toks is None
                        or toks[:_STITCH_W] != prev_toks[-_STITCH_W:]):
                    ok = False
                    break
                parts_txt.append(" ".join(toks[_STITCH_W:]))
            prev_toks = toks
        if not ok:
            continue
        merged = " ".join(s for s in parts_txt if s)
        recs.append((int(cid), int(len(grp)), merged))
    if not recs:
        return pd.DataFrame({"chain_id": pd.Series(dtype="int64"),
                             "n_fragments": pd.Series(dtype="int64"),
                             "text_merged": pd.Series(dtype="object")})
    return pd.DataFrame(recs,
                        columns=["chain_id", "n_fragments",
                                 "text_merged"]) \
        .astype({"chain_id": "int64", "n_fragments": "int64"})


def q168_overlap_stitch(sf_dir: str) -> pd.DataFrame:
    """Fragment stitching: ordered pairs (id_a, id_b) where the LAST
    8 normalized tokens of doc A equal the FIRST 8 of doc B — the
    pagination/continuation detector (a crawl that split one article
    into consecutive pages leaves exactly this tail==head signature;
    Lee et al. 2022 §4 reassembles such fragments before dedup).
    Asymmetric positional join, not a similarity tier: each doc
    emits ONE head key and ONE tail key (docs < 8 tokens emit none),
    so the shuffle carries two 16 B rows per doc and the per-bucket
    pair product is tails × heads of ONE key — no hot-group capping
    needed.  Hash equality stands in for string equality (u64,
    q59/q165 precedent).  An 8-token doc's head == its own tail;
    exact-copy 8-token docs therefore stitch in BOTH directions
    (documented, planted-tested)."""
    return _stitch_edges(sf_dir)


def q169_stitch_rewrite(sf_dir: str) -> pd.DataFrame:
    """Fragment REASSEMBLY — the transform behind q168's report (the
    q78/q130 pattern: detector first, rewrite second).  Unambiguous
    stitch chains (every member's in- and out-degree <= 1 after
    dropping ambiguous edges; cycles have no head and are skipped)
    are concatenated head-to-tail on the NORMALIZED token stream,
    trimming the 8 duplicated seam tokens of every non-head fragment
    once.  Output: one row per >= 2-fragment chain (chain_id = head
    doc_id, n_fragments, text_merged).  Scale shape: the edge table
    is dup-structure-sized (walked on the driver — q117's bounded
    driver-loop precedent), member texts are filtered by a broadcast
    id set and co-located with ONE chain_id shuffle; corpus docs off
    any chain never move.  Oracle: recursive-CTE chain walk +
    ORDER BY pos string_agg over the same normalization."""
    e = _stitch_edges(sf_dir)
    if len(e):
        # unambiguous continuations only: unique source AND target
        e = e[e.groupby("id_a")["id_b"].transform("size").eq(1)
              & e.groupby("id_b")["id_a"].transform("size").eq(1)]
    empty = pd.DataFrame({"chain_id": pd.Series(dtype="int64"),
                          "n_fragments": pd.Series(dtype="int64"),
                          "text_merged": pd.Series(dtype="object")})
    if not len(e):
        return empty
    nxt = dict(zip(e["id_a"].tolist(), e["id_b"].tolist()))
    heads = set(nxt) - set(nxt.values())
    rows: list[tuple[int, int, int]] = []        # (doc_id, chain, pos)
    for h in sorted(heads):
        cur, pos = h, 0
        while True:
            rows.append((cur, h, pos))
            if cur not in nxt:
                break
            cur, pos = nxt[cur], pos + 1
    if not rows:
        return empty
    members = pd.DataFrame(rows, columns=["doc_id", "chain_id", "pos"])
    member_ids = set(members["doc_id"].tolist())

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def member_norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"].isin(member_ids)]
        norm = (df["text"].fillna("").str.lower()
                .str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip())
        out = pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                            "norm": norm})
        return out.merge(members, on="doc_id")

    got = _with_schema(
        partition_apply(ds.map_batches(member_norm, batch_format="pandas"),
                        ["chain_id"], QCFG.join_num_partitions,
                        _assemble_stitch_chains).to_pandas(),
        {"chain_id": "int64", "n_fragments": "int64",
         "text_merged": "object"})
    got = got[got["n_fragments"] >= 2]
    return got.sort_values("chain_id").reset_index(drop=True)


def q170_corpus_growth(sf_dir: str) -> pd.DataFrame:
    """Corpus growth (Heaps-law) curve: distinct-shingle yield per
    doc_id decile — bucket b's n_new_shingles counts shingles whose
    FIRST occurrence (min doc_id owner, q166's pass) lands in that
    tenth of the id range, and cum_new_shingles is the running
    vocabulary size.  A flattening curve is the direct marginal-
    value-of-more-data readout crawl acquisition decisions use.
    Exact integer bucketing ((doc_id-lo)*10 // (hi-lo+1)) mirrors
    the SQL; the fp shuffle emits 10-row partials per partition, so
    driver traffic is O(P), never O(shingles)."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.signatures import signature_stage

    ids = _read(sf_dir, "documents", ["doc_id"])

    def id_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lo": [df["doc_id"].min()],
                             "hi": [df["doc_id"].max()],
                             "n": [len(df)]})

    idp = ids.map_batches(id_partial, batch_format="pandas").to_pandas()
    if not len(idp) or not int(idp["n"].sum()):
        return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                             "n_docs": pd.Series(dtype="int64"),
                             "n_new_shingles": pd.Series(dtype="int64"),
                             "cum_new_shingles": pd.Series(dtype="int64")})
    lo, hi = int(idp["lo"].min()), int(idp["hi"].max())
    span = hi - lo + 1

    def bucket_of(doc: pd.Series) -> pd.Series:
        return ((doc - lo) * 10 // span).clip(upper=9).astype(np.int64)

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = bucket_of(df["doc_id"]).value_counts()
        return pd.DataFrame({"bucket": vc.index.astype(np.int64),
                             "n_docs": vc.to_numpy().astype(np.int64)})

    dc = (ids.map_batches(doc_partial, batch_format="pandas").to_pandas()
          .groupby("bucket", as_index=False)["n_docs"].sum())

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    fps = substring_fp_table(signature_stage(_docs_from_documents(sf_dir),
                                             cfg), cfg)

    def owner_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "n_new": pd.Series(dtype="int64")})
        owner = df.groupby("fp_key", as_index=False)["doc_id"].min()
        vc = bucket_of(owner["doc_id"]).value_counts()
        return pd.DataFrame({"bucket": vc.index.astype(np.int64),
                             "n_new": vc.to_numpy().astype(np.int64)})

    nb = _with_schema(
        partition_apply(fps, ["fp_key"], QCFG.join_num_partitions,
                        owner_partial).to_pandas(),
        {"bucket": "int64", "n_new": "int64"})
    nb = nb.groupby("bucket", as_index=False)["n_new"].sum()
    out = dc.merge(nb, on="bucket", how="left").fillna({"n_new": 0})
    out = out.sort_values("bucket").reset_index(drop=True)
    out["n_new_shingles"] = out["n_new"].astype(np.int64)
    out["cum_new_shingles"] = out["n_new_shingles"].cumsum().astype(np.int64)
    return out[["bucket", "n_docs", "n_new_shingles", "cum_new_shingles"]] \
        .astype({"bucket": "int64", "n_docs": "int64"})


def q171_source_uniqueness(sf_dir: str) -> pd.DataFrame:
    """Exact per-source vocabulary uniqueness — the audit-mode
    counterpart of q156's sketch ESTIMATES: per source, the distinct
    shingle count, how many of those shingles appear in NO other
    source, and unique_ppm — the direct "what does this feed add
    that nothing else carries" acquisition readout.  Scale shape:
    one doc_id cogroup attaches source to the fp table and dedups
    (fp, source) per partition BEFORE the wide move, then ONE fp
    shuffle resolves each shingle's distinct-source set exactly and
    per-source ~|sources|-row partials come back per partition.
    Source rides the fp row as a dictionary-encodable short string;
    at 100 TB swap it for a source-id int — the shape is
    unchanged."""
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.signatures import signature_stage

    from event_deduplication_ray.stages.shuffle import cogroup_apply

    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    fps = substring_fp_table(signature_stage(_docs_from_documents(sf_dir),
                                             cfg), cfg)
    src = _read(sf_dir, "documents", ["doc_id", "source"])

    def attach(fp_df: pd.DataFrame, s_df: pd.DataFrame) -> pd.DataFrame:
        if not len(fp_df) or not len(s_df):
            return pd.DataFrame({"fp_key": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype="object")})
        m = fp_df[["fp_key", "doc_id"]].merge(
            s_df.drop_duplicates("doc_id"), on="doc_id")
        return m[["fp_key", "source"]].drop_duplicates()

    pairs = cogroup_apply(fps, src, ["doc_id"], ["doc_id"],
                          QCFG.join_num_partitions, attach)

    def per_fp(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "n_shingles": pd.Series(dtype="int64"),
                                 "n_unique": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["fp_key", "source"])
        nsrc = d.groupby("fp_key")["source"].transform("nunique")
        d = d.assign(u=(nsrc == 1).astype(np.int64))
        g = d.groupby("source", as_index=False).agg(
            n_shingles=("fp_key", "size"), n_unique=("u", "sum"))
        return g.astype({"n_shingles": "int64", "n_unique": "int64"})

    out = _with_schema(
        partition_apply(pairs, ["fp_key"], QCFG.join_num_partitions,
                        per_fp).to_pandas(),
        {"source": "object", "n_shingles": "int64", "n_unique": "int64"})
    out = out.groupby("source", as_index=False).sum()
    out["unique_ppm"] = (out["n_unique"] * 1_000_000
                         // out["n_shingles"].clip(lower=1)).astype(np.int64)
    return out.sort_values("source").reset_index(drop=True).astype(
        {"n_shingles": "int64", "n_unique": "int64"})


def q172_audience_overlap_hll(sf_dir: str) -> pd.DataFrame:
    """Sketch-composed set algebra: |viewers ∩ purchasers| estimated
    by inclusion–exclusion over three mergeable HLLs (|A| + |B| −
    |A∪B|; the union sketch is the elementwise max of A's and B's
    registers — no third pass) — the audience-overlap readout that at
    100 TB replaces a distinct-pair join with three 4 KB registers
    per batch and ZERO key shuffles (partials ride a single-row
    combine).  Rows-only by construction (estimates); accuracy is
    pytest-gated against the exact intersection (q48's 3σ pattern —
    note inclusion–exclusion VARIANCE is the sum of the three
    sketches', so the gate uses the summed σ, not one sketch's)."""
    from event_deduplication_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    sk_schema = pa.schema([("side", pa.string()), ("regs", pa.binary())])

    def partial(df: pd.DataFrame) -> pa.Table:
        rows = []
        for side, et in (("view", "view"), ("purchase", "purchase")):
            u = df.loc[df["event_type"] == et, "user_id"] \
                .to_numpy(np.int64)
            if len(u):
                rows.append({"side": side,
                             "regs": hll_partial(u).tobytes()})
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["side", "regs"]),
            schema=sk_schema, preserve_index=False)

    parts = _with_schema(
        ds.map_batches(partial, batch_format="pandas").to_pandas(),
        {"side": "object", "regs": "object"})
    merged = {
        side: hll_merge([np.frombuffer(b, np.uint8) for b in sub["regs"]])
        for side, sub in parts.groupby("side")
    }
    # A missing side (e.g. zero purchase events) contributes an empty
    # sketch — the present side's cardinality is still reported, and
    # an empty-register HLL estimates ~0 via linear counting.
    empty = hll_partial(np.array([], dtype=np.int64))
    a = merged.get("view", empty)
    b = merged.get("purchase", empty)
    na, nb = hll_estimate(a), hll_estimate(b)
    nu = hll_estimate(np.maximum(a, b))
    return pd.DataFrame({
        "n_viewers_est": pd.Series([int(round(na))], dtype="int64"),
        "n_purchasers_est": pd.Series([int(round(nb))], dtype="int64"),
        "n_both_est": pd.Series([max(0, int(round(na + nb - nu)))],
                                dtype="int64"),
    })


def q173_boilerplate_lines(sf_dir: str) -> pd.DataFrame:
    """Boilerplate-line MINING: the top 20 exact lines by distinct-
    document frequency (df >= 2) — this DERIVES the boilerplate set
    that q43/q63-style gates consume as a static input (CCNet builds
    its list exactly this way: rank shared lines, then strip them).
    Scale shape: vectorized line explode (q63's kernel) → per-batch
    distinct (line, doc) → ONE line-hash shuffle with the line string
    riding (strings move once, deduped per batch first) → per-
    partition df counts and a top-20 partial (safe: a line's rows
    all land in one partition, q86's eviction argument) → driver
    merges P×20 rows.  Ties break on the line string ascending so
    both engines order identically.  Lines trimmed of SPACES only
    (q63's byte-parity rule); empty lines excluded."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"].fillna("").str.split("\n")
        n_lines = lines.str.len().to_numpy(np.int64)
        doc_id = np.repeat(df["doc_id"].to_numpy(np.int64), n_lines)
        flat = pd.Series(
            np.concatenate([np.asarray(v, dtype=object) for v in lines])
            if len(lines) else np.array([], dtype=object)
        ).str.strip(" ")
        out = pd.DataFrame({"line": flat, "doc_id": doc_id})
        out = out[out["line"] != ""].drop_duplicates()
        out["lkey"] = H.hash_strings_u64(out["line"]).astype(np.int64)
        return out[["lkey", "line", "doc_id"]]

    parts = ds.map_batches(explode, batch_format="pandas")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"line": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["lkey", "doc_id"])
        g = d.groupby(["lkey", "line"], as_index=False).agg(
            df=("doc_id", "nunique"))
        g = g[g["df"] >= 2]
        g = g.sort_values(["df", "line"], ascending=[False, True]).head(20)
        return g[["line", "df"]].astype({"df": "int64"})

    out = _with_schema(
        partition_apply(parts, ["lkey"], QCFG.join_num_partitions,
                        topk).to_pandas(),
        {"line": "object", "df": "int64"})
    out = out.sort_values(["df", "line"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


RAY_QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_top_orders": q02_top_orders,
    "q03_distinct_event_types": q03_distinct_event_types,
    "q04_segment_revenue": q04_segment_revenue,
    "q05_daily_events": q05_daily_events,
    "q06_user_hourly_windows": q06_user_hourly_windows,
    "q07_lang_distribution": q07_lang_distribution,
    "q08_token_counts": q08_token_counts,
    "q09_doc_quality": q09_doc_quality,
    "q10_exact_dedup": q10_exact_dedup,
    "q11_embedding_topk": q11_embedding_topk,
    "q12_filtered_export": q12_filtered_export,
    "q13_region_customers": q13_region_customers,
    "q14_session_windows": q14_session_windows,
    "q15_customers_without_orders": q15_customers_without_orders,
    "q20_minhash_clusters": q20_minhash_clusters,
    "q21_simhash_pairs": q21_simhash_pairs,
    "q22_substring_pairs": q22_substring_pairs,
    "q23_doc_fingerprints": q23_doc_fingerprints,
    "q24_langid": q24_langid,
    "q25_lsh_topk": q25_lsh_topk,
    "q26_embedding_dup_pairs": q26_embedding_dup_pairs,
    "q27_flagship_dedup": q27_flagship_dedup,
    "q28_ngram_jaccard_clusters": q28_ngram_jaccard_clusters,
    "q29_media_dup_clusters": q29_media_dup_clusters,
    "q30_containment_pairs_exact": q30_containment_pairs_exact,
    "q31_embedding_topk_batch": q31_embedding_topk_batch,
    "q32_ivf_topk": q32_ivf_topk,
    "q33_decontaminate": q33_decontaminate,
    "q34_length_quantiles": q34_length_quantiles,
    "q35_top_bigrams": q35_top_bigrams,
    "q36_pii_scrub": q36_pii_scrub,
    "q37_lang_cap": q37_lang_cap,
    "q38_tfidf_topterms": q38_tfidf_topterms,
    "q39_repetition_filter": q39_repetition_filter,
    "q40_event_asof_anchor": q40_event_asof_anchor,
    "q41_rolling_user_window": q41_rolling_user_window,
    "q42_semantic_dedup": q42_semantic_dedup,
    "q43_chunk_dedup": q43_chunk_dedup,
    "q44_quality_outliers": q44_quality_outliers,
    "q45_props_rollup": q45_props_rollup,
    "q46_curation": q46_curation,
    "q47_distinct_users": q47_distinct_users,
    "q48_distinct_users_hll": q48_distinct_users_hll,
    "q49_funnel": q49_funnel,
    "q50_shipping_priority": q50_shipping_priority,
    "q51_doc_sample": q51_doc_sample,
    "q52_lang_source_rollup": q52_lang_source_rollup,
    "q53_big_spenders": q53_big_spenders,
    "q54_neardup_decontaminate": q54_neardup_decontaminate,
    "q55_regional_revenue": q55_regional_revenue,
    "q56_split_assign": q56_split_assign,
    "q57_len_token_corr": q57_len_token_corr,
    "q58_first_events": q58_first_events,
    "q59_normalized_dedup": q59_normalized_dedup,
    "q60_gap_quantiles": q60_gap_quantiles,
    "q61_view_attribution": q61_view_attribution,
    "q62_event_debounce": q62_event_debounce,
    "q63_line_filter": q63_line_filter,
    "q64_bigram_lm": q64_bigram_lm,
    "q65_quantile_gate": q65_quantile_gate,
    "q66_pack_sequences": q66_pack_sequences,
    "q67_head_dedup": q67_head_dedup,
    "q68_global_rank": q68_global_rank,
    "q69_top_bigrams_mg": q69_top_bigrams_mg,
    "q70_rolling_distinct": q70_rolling_distinct,
    "q71_vocab": q71_vocab,
    "q72_chunk_windows": q72_chunk_windows,
    "q73_mixed_media_dedup": q73_mixed_media_dedup,
    "q74_order_count_histogram": q74_order_count_histogram,
    "q75_priority_shipments": q75_priority_shipments,
    "q76_user_running_total": q76_user_running_total,
    "q77_bpe_token_counts": q77_bpe_token_counts,
    "q78_line_dedup_rewrite": q78_line_dedup_rewrite,
    "q79_oov_rate": q79_oov_rate,
    "q80_video_dup_clusters": q80_video_dup_clusters,
    "q81_top_bigrams_cms": q81_top_bigrams_cms,
    "q82_dsir_weights": q82_dsir_weights,
    "q83_value_quantiles": q83_value_quantiles,
    "q84_customer_order_counts": q84_customer_order_counts,
    "q85_promo_revenue_share": q85_promo_revenue_share,
    "q86_top_orders_per_segment": q86_top_orders_per_segment,
    "q87_retention_cohorts": q87_retention_cohorts,
    "q88_event_type_cooccurrence": q88_event_type_cooccurrence,
    "q89_token_and_search": q89_token_and_search,
    "q90_token_index_search": q90_token_index_search,
    "q91_dup_cluster_sizes": q91_dup_cluster_sizes,
    "q92_centroid_confusion": q92_centroid_confusion,
    "q93_gopher_rules": q93_gopher_rules,
    "q94_late_orders_by_priority": q94_late_orders_by_priority,
    "q95_weighted_sample": q95_weighted_sample,
    "q96_value_quantiles_kll": q96_value_quantiles_kll,
    "q97_length_drift_psi": q97_length_drift_psi,
    "q98_embedding_audit": q98_embedding_audit,
    "q99_event_transitions": q99_event_transitions,
    "q100_cross_source_dup_matrix": q100_cross_source_dup_matrix,
    "q101_top_pmi_bigrams": q101_top_pmi_bigrams,
    "q102_nation_trade_volume": q102_nation_trade_volume,
    "q103_returned_item_revenue": q103_returned_item_revenue,
    "q104_small_qty_order_revenue": q104_small_qty_order_revenue,
    "q105_disjunctive_part_revenue": q105_disjunctive_part_revenue,
    "q106_lone_late_supplier": q106_lone_late_supplier,
    "q107_rich_idle_customers": q107_rich_idle_customers,
    "q108_bm25_topk": q108_bm25_topk,
    "q109_lexical_diversity": q109_lexical_diversity,
    "q110_quality_mix_sample": q110_quality_mix_sample,
    "q111_domain_mix_report": q111_domain_mix_report,
    "q112_semantic_outliers": q112_semantic_outliers,
    "q113_late_data_drop": q113_late_data_drop,
    "q114_lang_embedding_coherence": q114_lang_embedding_coherence,
    "q115_mixture_draw": q115_mixture_draw,
    "q116_packed_shards": q116_packed_shards,
    "q117_bpe_merges": q117_bpe_merges,
    "q118_forecast_revenue": q118_forecast_revenue,
    "q119_market_share": q119_market_share,
    "q120_dup_degree_histogram": q120_dup_degree_histogram,
    "q121_user_entropy": q121_user_entropy,
    "q122_length_percentile": q122_length_percentile,
    "q123_dup_pagerank": q123_dup_pagerank,
    "q124_cluster_labels": q124_cluster_labels,
    "q125_effective_tokens": q125_effective_tokens,
    "q126_doc_neighbors": q126_doc_neighbors,
    "q127_quality_representatives": q127_quality_representatives,
    "q128_repetition_signals": q128_repetition_signals,
    "q129_exact_substring_spans": q129_exact_substring_spans,
    "q130_substring_dedup_rewrite": q130_substring_dedup_rewrite,
    "q131_global_range_join": q131_global_range_join,
    "q132_dup_triangles": q132_dup_triangles,
    "q133_compression_gate": q133_compression_gate,
    "q134_event_rate_anomaly": q134_event_rate_anomaly,
    "q135_winnow_dedup": q135_winnow_dedup,
    "q136_hopping_windows": q136_hopping_windows,
    "q137_containment_directed": q137_containment_directed,
    "q138_cross_label_nn": q138_cross_label_nn,
    "q139_source_dup_rate": q139_source_dup_rate,
    "q140_dup_kcore": q140_dup_kcore,
    "q141_hashed_embedding": q141_hashed_embedding,
    "q142_contract_audit": q142_contract_audit,
    "q143_table_profile": q143_table_profile,
    "q144_join_size_cms": q144_join_size_cms,
    "q145_phrase_search": q145_phrase_search,
    "q146_crosslingual_dup_pairs": q146_crosslingual_dup_pairs,
    "q147_bpe_subword_counts": q147_bpe_subword_counts,
    "q148_fd_audit": q148_fd_audit,
    "q149_dbscan_clusters": q149_dbscan_clusters,
    "q150_ivfpq_topk": q150_ivfpq_topk,
    "q151_dedup_loss_weights": q151_dedup_loss_weights,
    "q152_contamination_pairs": q152_contamination_pairs,
    "q153_keep_n_dedup": q153_keep_n_dedup,
    "q154_readability_counts": q154_readability_counts,
    "q155_corpus_drift": q155_corpus_drift,
    "q156_source_similarity_sketch": q156_source_similarity_sketch,
    "q157_ascii_ratio": q157_ascii_ratio,
    "q158_leakfree_split": q158_leakfree_split,
    "q159_key_skew": q159_key_skew,
    "q160_quality_classifier": q160_quality_classifier,
    "q161_corpus_screen": q161_corpus_screen,
    "q162_hard_negatives": q162_hard_negatives,
    "q163_fragile_clusters": q163_fragile_clusters,
    "q164_ann_recall": q164_ann_recall,
    "q165_editdist_dedup": q165_editdist_dedup,
    "q166_novelty": q166_novelty,
    "q167_template_dedup": q167_template_dedup,
    "q168_overlap_stitch": q168_overlap_stitch,
    "q169_stitch_rewrite": q169_stitch_rewrite,
    "q170_corpus_growth": q170_corpus_growth,
    "q171_source_uniqueness": q171_source_uniqueness,
    "q172_audience_overlap_hll": q172_audience_overlap_hll,
    "q173_boilerplate_lines": q173_boilerplate_lines,
}


# Shared recursive-CTE core of the exact n-gram-Jaccard clustering
# oracle: normalization → token 5-gram shingles → inverted-index join
# → exact-Jaccard edges → connected components via transitive closure
# → per-doc min-reachable cluster id (the `assign` CTE).  q28 selects
# the assignment, q91 aggregates the size histogram off it.
_SHINGLE_SQL = """
    WITH RECURSIVE norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                    replace(replace(replace(replace(lower(coalesce(text, '')),
                        chr(228), 'ae'), chr(246), 'oe'), chr(252), 'ue'), chr(223), 'ss'),
                    '[^\\w\\s-]+', ' ', 'g'), '\\s+', ' ', 'g')) AS tn
        FROM documents
    ), toks AS (
        SELECT doc_id, list_filter(string_split(tn, ' '), x -> x <> '') AS ws
        FROM norm
    ), sh AS (
        SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS shingle
        FROM toks, unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)
        UNION ALL
        -- hashing.shingle_hashes: a doc with 0 < n < 5 tokens gets ONE
        -- stub shingle over all its tokens (exact short dups collide);
        -- a stub can never equal a real 5-gram (different token counts)
        SELECT doc_id, array_to_string(ws, ' ') AS shingle
        FROM toks WHERE len(ws) BETWEEN 1 AND 4
    ), dsh AS (
        SELECT DISTINCT doc_id, shingle FROM sh
    ), counts AS (
        SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id
    )
"""


_NGRAM_CC_SQL = _SHINGLE_SQL + """
    , inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), edges AS (
        SELECT id_a, id_b FROM inter
        JOIN counts ca ON ca.doc_id = inter.id_a
        JOIN counts cb ON cb.doc_id = inter.id_b
        WHERE shared::DOUBLE / (ca.n + cb.n - shared) >= 0.75
    ), bi AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL
        SELECT id_b, id_a FROM edges
    ), reach(src, dst) AS (
        SELECT src, dst FROM bi
        UNION
        SELECT r.src, b.dst FROM reach r JOIN bi b ON r.dst = b.src
    ), assign AS (
        SELECT d.doc_id,
               least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_id
        FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        GROUP BY d.doc_id
    )
"""


ORACLE_SQL = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)        AS sum_qty,
               round(sum(l_extendedprice), 2)   AS sum_base_price,
               round(avg(l_quantity), 6)        AS avg_qty,
               round(avg(l_extendedprice), 6)   AS avg_price,
               count(*)                         AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "q03_distinct_event_types": """
        SELECT DISTINCT event_type FROM events ORDER BY event_type
    """,
    "q04_segment_revenue": """
        SELECT c_mktsegment,
               count(*)                          AS n_orders,
               round(sum(o_totalprice), 2)       AS sum_price,
               round(avg(o_totalprice), 6)       AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "q05_daily_events": """
        SELECT strftime(ts, '%Y-%m-%d')          AS day,
               count(*)                          AS n_events,
               round(sum(value), 4)              AS sum_value
        FROM events GROUP BY day ORDER BY day
    """,
    "q06_user_hourly_windows": """
        SELECT user_id,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
               count(*)                          AS n_events,
               round(sum(value), 4)              AS sum_value
        FROM events GROUP BY user_id, window_start
    """,
    "q07_lang_distribution": """
        SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
    """,
    "q08_token_counts": """
        SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens
        FROM documents
    """,
    "q09_doc_quality": """
        SELECT doc_id,
               length(text)                          AS n_chars,
               len(regexp_extract_all(text, '\\S+')) AS n_words,
               round(length(regexp_replace(text, '\\s', '', 'g'))
                     / greatest(len(regexp_extract_all(text, '\\S+')), 1), 6)
                                                     AS mean_word_len
        FROM documents
    """,
    "q10_exact_dedup": """
        SELECT min(doc_id) AS rep_doc_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "q11_embedding_topk": """
        SELECT vec_id
        FROM embeddings
        WHERE vec_id != 0
        ORDER BY list_cosine_similarity(
                   embedding,
                   (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                 vec_id
        LIMIT 10
    """,
    "q12_filtered_export": """
        SELECT o_orderkey, o_orderdate, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    "q13_region_customers": """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "q14_session_windows": """
        WITH marked AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_id, value,
                   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
    "q15_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q24_langid": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ), scored AS (
            SELECT doc_id, len(ws) AS n,
                CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                    len(list_filter(ws, x -> list_contains(
                        ['der','die','das','und','ist','nicht','ein','eine','mit','von','zu','den','im','auf','fuer'], x)))::DOUBLE / len(ws) END AS s_de,
                CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                    len(list_filter(ws, x -> list_contains(
                        ['the','and','of','to','in','is','that','it','for','was','with','as','his','on','be','at','by'], x)))::DOUBLE / len(ws) END AS s_en,
                CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                    len(list_filter(ws, x -> list_contains(
                        ['el','la','los','las','y','de','un','una','es','en','que','por','con','no','para'], x)))::DOUBLE / len(ws) END AS s_es,
                CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                    len(list_filter(ws, x -> list_contains(
                        ['le','la','les','et','de','des','un','une','est','pour','dans','que','qui','sur','pas'], x)))::DOUBLE / len(ws) END AS s_fr
            FROM toks
        )
        SELECT doc_id,
               CASE WHEN n = 0 THEN 'und'
                    WHEN greatest(s_de, s_en, s_es, s_fr) < 0.05 THEN 'und'
                    WHEN s_de >= greatest(s_en, s_es, s_fr) AND s_de > 0 THEN 'de'
                    WHEN s_en >= greatest(s_es, s_fr) AND s_en > 0 THEN 'en'
                    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'und' END AS lang_pred
        FROM scored
    """,
    "q26_embedding_dup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
    """,
    "q28_ngram_jaccard_clusters": _NGRAM_CC_SQL + """
        SELECT doc_id, cluster_id FROM assign
        ORDER BY doc_id
    """,
    "q91_dup_cluster_sizes": _NGRAM_CC_SQL + """
        , sizes AS (
            SELECT cluster_id, count(*)::BIGINT AS cluster_size
            FROM assign GROUP BY cluster_id
        )
        SELECT cluster_size, count(*)::BIGINT AS n_clusters
        FROM sizes GROUP BY cluster_size
        ORDER BY cluster_size
    """,
    "q101_top_pmi_bigrams": """
        WITH arrs AS (
          SELECT regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        uni AS (SELECT tok, count(*)::BIGINT AS c
                FROM (SELECT unnest(a) AS tok FROM arrs) GROUP BY tok),
        nt AS (SELECT sum(c)::BIGINT AS n_tokens FROM uni),
        bge AS (
          SELECT bg.w1 AS w1, bg.w2 AS w2
          FROM (SELECT unnest(list_transform(range(1, len(a)),
                       i -> struct_pack(w1 := a[i], w2 := a[i+1]))) AS bg
                FROM arrs WHERE len(a) >= 2)
        ),
        bc AS (SELECT w1, w2, count(*)::BIGINT AS n FROM bge
               GROUP BY w1, w2 HAVING count(*) >= 5)
        SELECT bc.w1 || ' ' || bc.w2 AS ngram, bc.n,
               round(ln(nt.n_tokens * bc.n * 1.0 / (ua.c * ub.c)), 6)
                   AS pmi
        FROM bc
        JOIN uni ua ON ua.tok = bc.w1
        JOIN uni ub ON ub.tok = bc.w2
        CROSS JOIN nt
        ORDER BY pmi DESC, ngram
        LIMIT 20
    """,
    "q102_nation_trade_volume": """
        WITH j AS (
          SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                 strftime(l_shipdate, '%Y') AS l_year,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_u
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ns ON s_nationkey = ns.n_nationkey
          JOIN nation nc ON c_nationkey = nc.n_nationkey
          WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
                 OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
        )
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(rev_u) AS BIGINT) / 10000.0 AS revenue
        FROM j GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q103_returned_item_revenue": """
        WITH j AS (
          SELECT o_custkey,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_u
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1996-04-01'
        ),
        per AS (
          SELECT o_custkey, CAST(sum(rev_u) AS BIGINT) AS rev_u
          FROM j GROUP BY o_custkey
          ORDER BY rev_u DESC, o_custkey LIMIT 20
        )
        SELECT c_custkey, c_name, per.rev_u / 10000.0 AS revenue,
               c_acctbal, n_name
        FROM per
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
    """,
    "q104_small_qty_order_revenue": """
        WITH li AS (
          SELECT l_partkey,
                 CAST(round(l_quantity) AS BIGINT) AS qty_i,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ),
        st AS (
          SELECT l_partkey, count(*)::BIGINT AS n,
                 CAST(sum(qty_i) AS BIGINT) AS sum_qty
          FROM li GROUP BY l_partkey
        )
        SELECT round(CAST(coalesce(sum(li.price_c), 0) AS BIGINT)
                     / 100.0 / 7.0, 2) AS avg_yearly
        FROM li JOIN st USING (l_partkey)
        WHERE 5 * li.qty_i * st.n < st.sum_qty
    """,
    "q105_disjunctive_part_revenue": """
        WITH li AS (
          SELECT p_brand, p_size,
                 CAST(round(l_quantity) AS BIGINT) AS qty_i,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_u
          FROM lineitem JOIN part ON l_partkey = p_partkey
        )
        SELECT CAST(coalesce(sum(rev_u), 0) AS BIGINT) / 10000.0 AS revenue
        FROM li
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND qty_i BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND qty_i BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND qty_i BETWEEN 20 AND 30)
    """,
    "q106_lone_late_supplier": """
        WITH l AS (
          SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ship
          FROM lineitem GROUP BY l_orderkey, l_suppkey
        ),
        j AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 (l.ship > o.o_orderdate + INTERVAL 60 DAY) AS late
          FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
        ),
        per AS (
          SELECT l_orderkey, count(*)::BIGINT AS n_supp,
                 sum(CASE WHEN late THEN 1 ELSE 0 END)::BIGINT AS n_late
          FROM j GROUP BY l_orderkey
        )
        SELECT s_name, count(*)::BIGINT AS numwait
        FROM j
        JOIN per USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE j.late AND per.n_supp >= 2 AND per.n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    "q107_rich_idle_customers": """
        WITH pos AS (
          SELECT count(*)::BIGINT AS n,
                 CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                      AS BIGINT) AS s
          FROM customer WHERE c_acctbal > 0
        ),
        rich AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer, pos
          WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
        ),
        idle AS (
          SELECT r.* FROM rich r
          WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = r.c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01')
        )
        SELECT n_name, count(*)::BIGINT AS numcust,
               CAST(sum(bal_c) AS BIGINT) / 100.0 AS totacctbal
        FROM idle JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "q108_bm25_topk": """
        WITH tok AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        freq AS (
          SELECT t AS token, count(*)::BIGINT AS n
          FROM (SELECT unnest(a) AS t FROM tok) GROUP BY t
        ),
        q AS (SELECT token FROM freq
              ORDER BY n DESC, token LIMIT 2),
        stats AS (
          SELECT count(*)::BIGINT AS n_docs,
                 CAST(sum(len(a)) AS BIGINT) AS sum_dl
          FROM tok
        ),
        tf AS (
          SELECT tok.doc_id, q.token,
                 len(list_filter(tok.a, x -> x = q.token))::BIGINT AS tf,
                 len(tok.a)::BIGINT AS dl
          FROM tok CROSS JOIN q
        ),
        df AS (
          SELECT token,
                 count(*) FILTER (WHERE tf > 0)::BIGINT AS df
          FROM tf GROUP BY token
        ),
        sc AS (
          SELECT tf.doc_id,
                 sum(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl
                        / (stats.sum_dl * 1.0 / stats.n_docs)))) AS s
          FROM tf JOIN df USING (token) CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(s, 6) AS bm25
        FROM sc ORDER BY s DESC, doc_id LIMIT 10
    """,
    "q109_lexical_diversity": """
        WITH tok AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        cnt AS (
          SELECT doc_id, t, count(*)::BIGINT AS c
          FROM (SELECT doc_id, unnest(a) AS t FROM tok)
          GROUP BY doc_id, t
        ),
        per AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_tok,
                 count(*)::BIGINT AS n_types,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_hapax
          FROM cnt GROUP BY doc_id
        )
        SELECT tok.doc_id,
               coalesce(per.n_tok, 0)::BIGINT AS n_tok,
               coalesce(per.n_types, 0)::BIGINT AS n_types,
               coalesce(per.n_hapax, 0)::BIGINT AS n_hapax,
               CASE WHEN coalesce(per.n_tok, 0) > 0
                    THEN (per.n_types * 1000000) // per.n_tok
                    ELSE 0 END::BIGINT AS ttr_ppm,
               CASE WHEN coalesce(per.n_tok, 0) > 0
                    THEN (per.n_hapax * 1000000) // per.n_tok
                    ELSE 0 END::BIGINT AS hapax_ppm
        FROM tok LEFT JOIN per USING (doc_id)
        ORDER BY doc_id
    """,
    "q110_quality_mix_sample": """
        WITH tc AS (
          SELECT doc_id, lang,
                 len(regexp_extract_all(lower(coalesce(text, '')),
                     '\\S+'))::BIGINT AS n_tok
          FROM documents
        ),
        med AS (
          SELECT lang,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tok) AS m
          FROM tc GROUP BY lang
        ),
        f0 AS (
          SELECT tc.doc_id, tc.lang, tc.n_tok, (tc.n_tok >= med.m) AS hi,
                 xor(tc.doc_id, tc.doc_id // 4294967296)
                   % 4294967296 AS v
          FROM tc JOIN med USING (lang)
        ),
        f1 AS (SELECT *, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                          AS v1 FROM f0),
        f2 AS (SELECT *, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT *, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                          AS v3 FROM f2),
        f4 AS (SELECT *, xor(v3, v3 // 65536) AS h  FROM f3)
        SELECT doc_id, lang, n_tok,
               CASE WHEN hi THEN 'hi' ELSE 'lo' END AS bucket
        FROM f4
        WHERE hi OR h < 1073741824
        ORDER BY doc_id
    """,
    "q111_domain_mix_report": """
        WITH tc AS (
          SELECT source,
                 len(regexp_extract_all(lower(coalesce(text, '')),
                     '\\S+'))::BIGINT AS n_tok
          FROM documents
        ),
        per AS (
          SELECT source, count(*)::BIGINT AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM tc GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per)
        SELECT source, n_docs, n_tokens,
               CAST((n_tokens * 1000000) // tot.t AS BIGINT) AS share_ppm,
               round(sqrt(n_tokens * 1.0 / tot.t), 6) AS w_temp
        FROM per CROSS JOIN tot
        ORDER BY source
    """,
    "q112_semantic_outliers": """
        WITH cent AS (
          SELECT label, i, avg(embedding[CAST(i AS BIGINT) + 1]) AS c
          FROM embeddings, unnest(range(0, 64)) AS t(i)
          GROUP BY label, i
        ),
        centv AS (
          SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label
        ),
        sc AS (
          SELECT e.label, e.vec_id,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        c.cv) AS cos
          FROM embeddings e JOIN centv c USING (label)
        )
        SELECT label, vec_id, round(cos, 6) AS cos
        FROM (
          SELECT *, row_number() OVER (PARTITION BY label
                                       ORDER BY cos, vec_id) AS rk
          FROM sc
        ) WHERE rk <= 5
        ORDER BY label, cos, vec_id
    """,
    "q113_late_data_drop": """
        WITH w AS (
          SELECT user_id, event_id, ts,
                 max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS hwm
          FROM events
        )
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               CAST(date_diff('microseconds', ts, hwm) AS BIGINT)
                   AS behind_us
        FROM w
        WHERE hwm IS NOT NULL
          AND ts < hwm - INTERVAL 10 MINUTE
        ORDER BY event_id
    """,
    "q114_lang_embedding_coherence": """
        WITH j AS (
          SELECT d.lang, CAST(e.embedding AS DOUBLE[]) AS v
          FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        ),
        cent AS (
          SELECT lang, i, avg(v[CAST(i AS BIGINT) + 1]) AS c
          FROM j, unnest(range(0, 64)) AS t(i)
          GROUP BY lang, i
        ),
        centv AS (
          SELECT lang, list(c ORDER BY i) AS cv FROM cent GROUP BY lang
        ),
        sc AS (
          SELECT j.lang, list_cosine_similarity(j.v, c.cv) AS cos
          FROM j JOIN centv c USING (lang)
        )
        SELECT lang, count(*)::BIGINT AS n_vecs,
               round(avg(cos), 6) AS mean_cos
        FROM sc GROUP BY lang ORDER BY lang
    """,
    "q115_mixture_draw": """
        WITH tc AS (
          SELECT doc_id, source,
                 len(regexp_extract_all(lower(coalesce(text, '')),
                     '\\S+'))::BIGINT AS n_tok
          FROM documents
        ),
        per AS (
          SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM tc GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
        qt AS (
          SELECT source,
                 (100 * ((n_tokens * 1000000) // tot.t)) // 1000000 AS q
          FROM per CROSS JOIN tot
        ),
        f0 AS (
          SELECT doc_id, source,
                 xor(doc_id, doc_id // 4294967296) % 4294967296 AS v
          FROM documents
        ),
        f1 AS (SELECT *, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                          AS v1 FROM f0),
        f2 AS (SELECT *, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT *, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                          AS v3 FROM f2),
        f4 AS (SELECT *, xor(v3, v3 // 65536) AS h  FROM f3),
        r AS (
          SELECT doc_id, source, h,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY h, doc_id) AS rk
          FROM f4
        )
        SELECT doc_id, source, CAST(h AS BIGINT) AS h
        FROM r JOIN qt USING (source)
        WHERE rk <= qt.q
        ORDER BY doc_id
    """,
    "q118_forecast_revenue": """
        SELECT CAST(coalesce(sum(
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT)), 0)
               AS BIGINT) / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND CAST(round(l_quantity) AS BIGINT) < 24
    """,
    "q119_market_share": """
        WITH j AS (
          SELECT strftime(o_orderdate, '%Y') AS o_year,
                 (s_nationkey = 3) AS is_target,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_u
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE p_type = 'PROMO'
            AND c_nationkey IN (0, 1, 2, 3, 4)
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN is_target THEN rev_u ELSE 0 END)
                    AS BIGINT) AS nation_u,
               CAST(sum(rev_u) AS BIGINT) AS region_u,
               round(sum(CASE WHEN is_target THEN rev_u ELSE 0 END)
                     * 1.0 / sum(rev_u), 6) AS mkt_share
        FROM j GROUP BY o_year ORDER BY o_year
    """,
    "q120_dup_degree_histogram": _NGRAM_CC_SQL + """
        , deg AS (
            SELECT src AS doc_id, count(*)::BIGINT AS deg
            FROM bi GROUP BY src
        ), dd AS (
            SELECT coalesce(deg.deg, 0) AS deg
            FROM documents d LEFT JOIN deg ON deg.doc_id = d.doc_id
        )
        SELECT CAST(deg AS BIGINT) AS deg, count(*)::BIGINT AS n_docs
        FROM dd GROUP BY deg ORDER BY deg
    """,
    "q132_dup_triangles": _NGRAM_CC_SQL + """
        , tri AS (
            SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
            FROM edges e1
            JOIN edges e2 ON e2.id_a = e1.id_b
            JOIN edges e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
        ), corners AS (
            SELECT a AS doc_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT doc_id, count(*)::BIGINT AS n_tri
        FROM corners GROUP BY doc_id ORDER BY doc_id
    """,
    "q134_event_rate_anomaly": """
        WITH c AS (
            SELECT event_type,
                   strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:00:00') AS hour,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sd
            FROM c GROUP BY event_type
        ), z AS (
            SELECT c.event_type, c.hour, c.n,
                   round(CASE WHEN s.sd = 0 THEN 0.0
                              ELSE (c.n - s.mu) / s.sd END, 6) AS z
            FROM c JOIN s USING (event_type)
        )
        SELECT event_type, hour, n, z,
               CAST(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END AS BIGINT)
                   AS anomaly
        FROM z ORDER BY event_type, hour
    """,
    "q139_source_dup_rate": _NGRAM_CC_SQL + """
        , sz AS (
            SELECT cluster_id, count(*) AS sz
            FROM assign GROUP BY cluster_id
        ), d AS (
            SELECT a.doc_id,
                   CASE WHEN sz.sz >= 2 THEN 1 ELSE 0 END AS isdup
            FROM assign a JOIN sz USING (cluster_id)
        )
        SELECT doc.source,
               count(*)::BIGINT AS n_docs,
               sum(isdup)::BIGINT AS n_dup,
               CAST(sum(isdup) * 1000000 // count(*) AS BIGINT) AS dup_ppm
        FROM documents doc JOIN d ON d.doc_id = doc.doc_id
        GROUP BY doc.source ORDER BY doc.source
    """,
    # ranking-only like q31/q32; DOUBLE[] cast per the q98 float32
    # accumulation lesson; zero-norm vectors excluded on both sides
    "q138_cross_label_nn": """
        WITH n AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS e
            FROM embeddings
            WHERE list_inner_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[]) > 0
        )
        SELECT a.vec_id, b.vec_id AS nn_id,
               CAST(b.label AS BIGINT) AS nn_label
        FROM n a JOIN n b ON a.label <> b.label
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(b.e, a.e) DESC, b.vec_id
        ) = 1
        ORDER BY a.vec_id
    """,
    "q137_containment_directed": _NGRAM_CC_SQL + """
        , dirc AS (
            SELECT CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND id_a < id_b)
                        THEN id_a ELSE id_b END AS inner_id,
                   CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND id_a < id_b)
                        THEN id_b ELSE id_a END AS outer_id,
                   shared, least(ca.n, cb.n) AS n_inner
            FROM inter
            JOIN counts ca ON ca.doc_id = inter.id_a
            JOIN counts cb ON cb.doc_id = inter.id_b
            -- substring_containment = 0.8 (config.py), cross-multiplied
            WHERE shared * 1000000 >= 800000 * least(ca.n, cb.n)
        )
        SELECT inner_id, outer_id,
               CAST(shared * 1000000 // n_inner AS BIGINT) AS cont_ppm
        FROM dirc ORDER BY inner_id, outer_id
    """,
    "q136_hopping_windows": """
        WITH x AS (
            SELECT user_id,
                   (epoch_us(ts) // 900000000) * 900000000
                       - j * 900000000::BIGINT AS ws
            FROM events, unnest([0, 1, 2, 3]) AS t(j)
        )
        SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               count(*)::BIGINT AS n_events,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM x GROUP BY 1 ORDER BY 1
    """,
    "q121_user_entropy": """
        WITH c AS (
          SELECT user_id, event_type, count(*)::BIGINT AS c
          FROM events GROUP BY user_id, event_type
        ),
        per AS (
          SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
                 count(*)::BIGINT AS n_types,
                 sum(c * ln(c)) AS s
          FROM c GROUP BY user_id
        )
        SELECT user_id, n, n_types,
               round(ln(n) - s / n, 6) AS entropy
        FROM per ORDER BY user_id
    """,
    "q122_length_percentile": """
        WITH tc AS (
          SELECT doc_id, lang,
                 len(regexp_extract_all(lower(coalesce(text, '')),
                     '\\S+'))::BIGINT AS n_tok
          FROM documents
        ),
        r AS (
          SELECT doc_id, lang, n_tok,
                 (rank() OVER (PARTITION BY lang ORDER BY n_tok) - 1)
                     AS n_smaller,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM tc
        )
        SELECT doc_id, lang, n_tok,
               CAST((n_smaller * 1000000) // greatest(n - 1, 1)
                    AS BIGINT) AS pr_ppm
        FROM r ORDER BY doc_id
    """,
    "q124_cluster_labels": _NGRAM_CC_SQL + """
        , multi AS (
            SELECT cluster_id FROM assign
            GROUP BY cluster_id HAVING count(*) >= 2
        ), mem AS (
            SELECT a.doc_id, a.cluster_id
            FROM assign a JOIN multi USING (cluster_id)
        ), tokc AS (
            SELECT m.cluster_id, t.tok AS token, count(*)::BIGINT AS n
            FROM toks JOIN mem m USING (doc_id), unnest(toks.ws) AS t(tok)
            GROUP BY m.cluster_id, t.tok
        ), dfreq AS (
            SELECT tok AS token, count(DISTINCT doc_id)::BIGINT AS df
            FROM (SELECT doc_id, unnest(ws) AS tok FROM toks)
            WHERE tok IN (SELECT DISTINCT token FROM tokc)
            GROUP BY tok
        ), nd AS (SELECT count(*)::BIGINT AS n FROM documents),
        sc AS (
            SELECT cluster_id, token,
                   round(tokc.n * ln(nd.n * 1.0 / dfreq.df), 6) AS score
            FROM tokc JOIN dfreq USING (token) CROSS JOIN nd
        )
        SELECT cluster_id, token, score FROM (
            SELECT *, row_number() OVER (PARTITION BY cluster_id
                      ORDER BY score DESC, token) AS rk FROM sc
        ) WHERE rk <= 3
        ORDER BY cluster_id, score DESC, token
    """,
    "q125_effective_tokens": _NGRAM_CC_SQL + """
        , reps AS (
            SELECT cluster_id, min(doc_id) AS rep
            FROM assign GROUP BY cluster_id
        ), tok2 AS (
            SELECT doc_id,
                   len(regexp_extract_all(lower(coalesce(text, '')),
                       '\\S+'))::BIGINT AS n_tok
            FROM documents
        ), j AS (
            SELECT t.doc_id, t.n_tok, (a.doc_id <> r.rep) AS dropped
            FROM tok2 t
            JOIN assign a USING (doc_id)
            JOIN reps r USING (cluster_id)
        )
        SELECT count(*)::BIGINT AS n_docs,
               CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_kept_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN dropped THEN 0 ELSE n_tok END)
                    AS BIGINT) AS kept_tokens,
               CAST((sum(CASE WHEN dropped THEN n_tok ELSE 0 END)
                     * 1000000) // greatest(sum(n_tok), 1)
                    AS BIGINT) AS dup_token_ppm
        FROM j
    """,
    "q127_quality_representatives": _NGRAM_CC_SQL + """
        , tok2 AS (
            SELECT doc_id,
                   len(regexp_extract_all(lower(coalesce(text, '')),
                       '\\S+'))::BIGINT AS n_tok
            FROM documents
        ), j AS (
            SELECT a.cluster_id, a.doc_id, t.n_tok
            FROM assign a JOIN tok2 t USING (doc_id)
        ), r AS (
            SELECT *, row_number() OVER (PARTITION BY cluster_id
                        ORDER BY n_tok DESC, doc_id) AS rk,
                      count(*) OVER (PARTITION BY cluster_id)
                          AS n_members
            FROM j
        )
        SELECT cluster_id, doc_id AS rep_doc_id, n_tok AS rep_n_tok,
               CAST(n_members AS BIGINT) AS n_members
        FROM r WHERE rk = 1 ORDER BY cluster_id
    """,
    "q100_cross_source_dup_matrix": _NGRAM_CC_SQL + """
        , tagged AS (
            SELECT a.doc_id, a.cluster_id, d.source
            FROM assign a JOIN documents d USING (doc_id)
        )
        SELECT least(x.source, y.source) AS source_a,
               greatest(x.source, y.source) AS source_b,
               count(*)::BIGINT AS n
        FROM tagged x JOIN tagged y
          ON x.cluster_id = y.cluster_id AND x.doc_id < y.doc_id
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """,
    "q99_event_transitions": """
        WITH s AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM events
        )
        SELECT event_type AS from_type, nxt AS to_type,
               count(*)::BIGINT AS n
        FROM s WHERE nxt IS NOT NULL
        GROUP BY from_type, to_type
        ORDER BY from_type, to_type
    """,
    "q98_embedding_audit": """
        SELECT label,
               count(*)::BIGINT AS n_vecs,
               sum(CASE WHEN sqrt(list_inner_product(
                       embedding::DOUBLE[], embedding::DOUBLE[])) < 1e-12
                   THEN 1 ELSE 0 END)::BIGINT AS n_zero_norm,
               sum(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0
                   END)::BIGINT AS n_bad_dim,
               round(avg(sqrt(list_inner_product(
                   embedding::DOUBLE[], embedding::DOUBLE[]))), 6)
                   AS mean_norm
        FROM embeddings
        GROUP BY label
        ORDER BY label
    """,
    "q97_length_drift_psi": """
        WITH t AS (
          SELECT lang, doc_id % 2 AS split,
                 CASE WHEN n_tok <= 25 THEN 0
                      WHEN n_tok <= 50 THEN 1
                      WHEN n_tok <= 75 THEN 2
                      WHEN n_tok <= 100 THEN 3
                      ELSE 4 END AS bin
          FROM (SELECT doc_id, lang,
                       len(regexp_extract_all(lower(coalesce(text, '')),
                                              '\\S+'))::BIGINT AS n_tok
                FROM documents)
        ),
        c AS (SELECT lang, split, bin, count(*)::BIGINT AS n
              FROM t GROUP BY lang, split, bin),
        tot AS (SELECT lang, split, sum(n)::BIGINT AS tot
                FROM c GROUP BY lang, split),
        grid AS (
          SELECT l.lang, b.bin,
                 coalesce(ca.n, 0) + 1 AS ca,
                 coalesce(cb.n, 0) + 1 AS cb,
                 coalesce(ta.tot, 0) AS na,
                 coalesce(tb.tot, 0) AS nb
          FROM (SELECT DISTINCT lang FROM t) l
          CROSS JOIN (SELECT unnest(range(0, 5)) AS bin) b
          LEFT JOIN c ca ON ca.lang = l.lang AND ca.split = 0
                        AND ca.bin = b.bin
          LEFT JOIN c cb ON cb.lang = l.lang AND cb.split = 1
                        AND cb.bin = b.bin
          LEFT JOIN tot ta ON ta.lang = l.lang AND ta.split = 0
          LEFT JOIN tot tb ON tb.lang = l.lang AND tb.split = 1
        )
        SELECT lang,
               CAST(max(na) AS BIGINT) AS n_even,
               CAST(max(nb) AS BIGINT) AS n_odd,
               round(sum((ca * 1.0 / (na + 5) - cb * 1.0 / (nb + 5))
                         * ln((ca * 1.0 / (na + 5))
                              / (cb * 1.0 / (nb + 5)))), 6) AS psi
        FROM grid
        GROUP BY lang
        ORDER BY lang
    """,
    "q95_weighted_sample": """
        WITH t AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(coalesce(text, '')),
                                        '\\S+'))::BIGINT AS n_tok
          FROM documents
        ),
        f0 AS (SELECT doc_id, n_tok,
                      xor(doc_id, doc_id // 4294967296) % 4294967296 AS v
               FROM t WHERE n_tok > 0),
        f1 AS (SELECT *, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                          AS v1 FROM f0),
        f2 AS (SELECT *, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT *, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                          AS v3 FROM f2),
        f4 AS (SELECT *, xor(v3, v3 // 65536) AS h  FROM f3)
        SELECT doc_id, n_tok
        FROM f4
        ORDER BY ln((h + 1.0) / 4294967296.0) / n_tok DESC, doc_id
        LIMIT 10
    """,
    "q94_late_orders_by_priority": """
        SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q93_gopher_rules": """
        WITH t AS (
          SELECT doc_id,
                 coalesce(text, '') AS tx,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a,
                 string_split(coalesce(text, ''), chr(10)) AS ls
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 len(a)::BIGINT AS n_words,
                 coalesce(list_sum(list_transform(a, x -> len(x))),
                          0)::BIGINT AS n_chars,
                 len(list_filter(a, x -> regexp_matches(x, '[A-Za-z]')))
                     ::BIGINT AS n_alpha,
                 len(list_intersect(list_distinct(a),
                     ['the','be','to','of','and','that','have','with']))
                     ::BIGINT AS n_stop,
                 (len(regexp_extract_all(tx, '#'))
                  + len(regexp_extract_all(tx, '\\.\\.\\.')))::BIGINT
                     AS n_sym,
                 len(ls)::BIGINT AS n_lines,
                 len(list_filter(ls, x -> starts_with(trim(x, ' '), '- ')
                                  OR starts_with(trim(x, ' '), '* ')))
                     ::BIGINT AS n_bullet,
                 len(list_filter(ls, x -> trim(x, ' ') LIKE '%...'))
                     ::BIGINT AS n_ell
          FROM t
        )
        SELECT doc_id,
               CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT)
                   AS rule_words,
               CAST(3 * n_words <= n_chars AND n_chars <= 10 * n_words
                    AND n_words > 0 AS BIGINT) AS rule_wordlen,
               CAST(10 * n_sym <= n_words AS BIGINT) AS rule_symbol,
               CAST(10 * n_bullet < 9 * n_lines AS BIGINT) AS rule_bullets,
               CAST(10 * n_ell <= 3 * n_lines AS BIGINT) AS rule_ellipsis,
               CAST(5 * n_alpha > 4 * n_words AS BIGINT) AS rule_alpha,
               CAST(n_stop >= 2 AS BIGINT) AS rule_stop,
               CAST(n_words >= 50 AND n_words <= 100000
                    AND 3 * n_words <= n_chars AND n_chars <= 10 * n_words
                    AND n_words > 0
                    AND 10 * n_sym <= n_words
                    AND 10 * n_bullet < 9 * n_lines
                    AND 10 * n_ell <= 3 * n_lines
                    AND 5 * n_alpha > 4 * n_words
                    AND n_stop >= 2 AS BIGINT) AS keep
        FROM m
        ORDER BY doc_id
    """,
    "q92_centroid_confusion": """
        WITH cent AS (
          SELECT label, i, avg(embedding[CAST(i AS BIGINT) + 1]) AS c
          FROM embeddings, unnest(range(0, 64)) AS t(i)
          GROUP BY label, i
        ),
        centv AS (
          SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label
        ),
        a AS (
          SELECT e.label,
                 (SELECT c.label FROM centv c
                  ORDER BY list_cosine_similarity(e.embedding, c.cv) DESC,
                           c.label
                  LIMIT 1) AS assigned_label
          FROM embeddings e
        )
        SELECT label, assigned_label, count(*)::BIGINT AS n
        FROM a GROUP BY label, assigned_label
        ORDER BY label, assigned_label
    """,
    "q30_containment_pairs_exact": """
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                        replace(replace(replace(replace(lower(coalesce(text, '')),
                            chr(228), 'ae'), chr(246), 'oe'), chr(252), 'ue'), chr(223), 'ss'),
                        '[^\\w\\s-]+', ' ', 'g'), '\\s+', ' ', 'g')) AS tn
            FROM documents
        ), toks AS (
            SELECT doc_id, list_filter(string_split(tn, ' '), x -> x <> '') AS ws
            FROM norm
        ), sh AS (
            SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS shingle
            FROM toks, unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)
            UNION ALL
            -- short-doc stub shingle, mirrors hashing.shingle_hashes
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM toks WHERE len(ws) BETWEEN 1 AND 4
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh
        ), counts AS (
            SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b FROM inter
        JOIN counts ca ON ca.doc_id = inter.id_a
        JOIN counts cb ON cb.doc_id = inter.id_b
        WHERE shared::DOUBLE / least(ca.n, cb.n) >= 0.8
        ORDER BY id_a, id_b
    """,
    "q31_embedding_topk_batch": """
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id
        FROM embeddings q CROSS JOIN embeddings e
        WHERE q.vec_id < 3
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                     e.vec_id
        ) <= 10
        ORDER BY query_id, vec_id
    """,
    # exact top-k incl. the self-match: q32 probes all IVF lists, so
    # the indexed answer must equal the global cosine ranking
    "q32_ivf_topk": """
        SELECT vec_id
        FROM embeddings
        ORDER BY list_cosine_similarity(
                   embedding,
                   (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                 vec_id
        LIMIT 10
    """,
    # same normalization + token-5-gram shingles as q28/q30, plus the
    # short-doc stub (docs with 1-4 tokens contribute ONE shingle of
    # all their tokens — mirrors hashing.shingle_hashes)
    "q33_decontaminate": """
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                        replace(replace(replace(replace(lower(coalesce(text, '')),
                            chr(228), 'ae'), chr(246), 'oe'), chr(252), 'ue'), chr(223), 'ss'),
                        '[^\\w\\s-]+', ' ', 'g'), '\\s+', ' ', 'g')) AS tn
            FROM documents
        ), toks AS (
            SELECT doc_id, list_filter(string_split(tn, ' '), x -> x <> '') AS ws
            FROM norm
        ), sh AS (
            SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS shingle
            FROM toks, unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM toks WHERE len(ws) BETWEEN 1 AND 4
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh
        ), test_sh AS (
            SELECT DISTINCT shingle FROM dsh WHERE doc_id % 10 = 0
        ), hits AS (
            SELECT DISTINCT s.doc_id
            FROM dsh s JOIN test_sh t ON s.shingle = t.shingle
            WHERE s.doc_id % 10 <> 0
        )
        SELECT d.doc_id,
               CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 10 <> 0
        ORDER BY d.doc_id
    """,
    "q34_length_quantiles": """
        SELECT lang,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY length(text)) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY length(text)) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY length(text)) AS p99
        FROM documents
        GROUP BY lang ORDER BY lang
    """,
    "q35_top_bigrams": """
        WITH toks AS (
            SELECT list_filter(
                       regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> '') AS ws
            FROM documents
        ), bg AS (
            SELECT ws[i] || ' ' || ws[i+1] AS ngram
            FROM toks, unnest(range(1, greatest(len(ws), 1))) AS t(i)
        )
        SELECT ngram, count(*) AS n
        FROM bg GROUP BY ngram
        ORDER BY n DESC, ngram
        LIMIT 20
    """,
    # counts on the ORIGINAL text; redaction order email -> ipv4
    # (mirrors textstats.PII_PATTERNS iteration order)
    "q36_pii_scrub": """
        SELECT doc_id,
               regexp_replace(regexp_replace(coalesce(text, ''),
                   '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+',
                   '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                   '<IPV4>', 'g') AS text_clean,
               len(regexp_extract_all(coalesce(text, ''),
                   '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+'))
                   AS n_email,
               len(regexp_extract_all(coalesce(text, ''),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                   AS n_ipv4
        FROM documents
    """,
    "q37_lang_cap": """
        SELECT doc_id, lang
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 40
        ORDER BY lang, doc_id
    """,
    # score rounded to 6 dp BEFORE ranking on both sides (float-ulp
    # ranking caveat, see q11); ties break token-asc
    "q38_tfidf_topterms": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                                     '\\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ), tf AS (
            SELECT doc_id, t.x AS token, count(*) AS tf
            FROM toks, unnest(ws) AS t(x)
            GROUP BY doc_id, t.x
        ), df AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        ), n AS (
            SELECT count(*) AS n FROM documents
        )
        SELECT doc_id, token
        FROM tf JOIN df USING (token), n
        QUALIFY row_number() OVER (
            PARTITION BY doc_id
            ORDER BY round(tf * ln(n::DOUBLE / df), 6) DESC, token
        ) <= 3
        ORDER BY doc_id, token
    """,
    "q39_repetition_filter": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> '') AS ws
            FROM documents
        ), tok_cnt AS (
            SELECT doc_id, ws[i] AS tok, count(*) AS n
            FROM toks, unnest(range(1, len(ws) + 1)) AS t(i)
            GROUP BY doc_id, tok
        ), tok_agg AS (
            SELECT doc_id, max(n) AS top_n, sum(n) AS n_tok,
                   count(*) AS n_distinct
            FROM tok_cnt GROUP BY doc_id
        ), bg_cnt AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg, count(*) AS n
            FROM toks, unnest(range(1, greatest(len(ws), 1))) AS t(i)
            GROUP BY doc_id, bg
        ), bg_agg AS (
            SELECT doc_id, max(n) AS top_bg, sum(n) AS n_bg
            FROM bg_cnt GROUP BY doc_id
        )
        SELECT d.doc_id,
               round(top_n * 1.0 / n_tok, 6)       AS top_token_frac,
               round(top_bg * 1.0 / n_bg, 6)       AS top_bigram_frac,
               round(n_distinct * 1.0 / n_tok, 6)  AS distinct_frac,
               (round(top_n * 1.0 / n_tok, 6) <= 0.125
                AND round(n_distinct * 1.0 / n_tok, 6) >= 0.35) AS keep
        FROM documents d
        LEFT JOIN tok_agg USING (doc_id)
        LEFT JOIN bg_agg USING (doc_id)
        ORDER BY doc_id
    """,
    "q40_event_asof_anchor": """
        WITH anchors AS (
            SELECT user_id, ts, max(event_id) AS anchor_id
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT e.event_id, a.anchor_id,
               strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS anchor_ts
        FROM events e ASOF JOIN anchors a
          ON e.user_id = a.user_id AND a.ts <= e.ts
        ORDER BY event_id
    """,
    "q41_rolling_user_window": """
        SELECT event_id,
               count(*) OVER w          AS n_7d,
               round(sum(value) OVER w, 4) AS sum_7d
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    # 'paragraph' = non-overlapping 10-token chunk (ws[a:b] is 1-based
    # INCLUSIVE); boilerplate = chunk in >= 2 distinct docs; n_chunks
    # counts occurrences.  Engine compares chunk hashes, oracle exact
    # strings (q33 acceptance).
    "q43_chunk_dedup": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> '') AS ws
            FROM documents
        ), ch AS (
            SELECT doc_id,
                   array_to_string(ws[(i-1)*10+1 : least(i*10, len(ws))], ' ')
                       AS chunk
            FROM toks, unnest(range(1, (len(ws) + 9) // 10 + 1)) AS t(i)
        ), boiler AS (
            SELECT chunk
            FROM (SELECT DISTINCT doc_id, chunk FROM ch)
            GROUP BY chunk HAVING count(*) >= 2
        ), agg AS (
            SELECT c.doc_id,
                   count(*) AS n_chunks,
                   sum(CASE WHEN b.chunk IS NULL THEN 0 ELSE 1 END)
                       AS n_dup_chunks
            FROM ch c LEFT JOIN boiler b USING (chunk)
            GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_chunks, 0) AS BIGINT)     AS n_chunks,
               CAST(coalesce(a.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
               CAST(CASE WHEN 2 * coalesce(a.n_dup_chunks, 0)
                              <= coalesce(a.n_chunks, 0)
                         THEN 1 ELSE 0 END AS BIGINT)      AS keep
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """,
    # z rounded to 6 dp BEFORE the outlier compare on both sides;
    # stddev_pop from exact-integer sums keeps float parity
    "q44_quality_outliers": """
        WITH s AS (
            SELECT lang,
                   avg(length(coalesce(text, '')))        AS mu,
                   stddev_pop(length(coalesce(text, ''))) AS sd
            FROM documents GROUP BY lang
        ), z AS (
            SELECT d.doc_id, d.lang,
                   CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars,
                   round(CASE WHEN s.sd = 0 THEN 0.0
                              ELSE (length(coalesce(d.text, '')) - s.mu) / s.sd
                         END, 6) AS z
            FROM documents d JOIN s USING (lang)
        )
        SELECT doc_id, lang, n_chars, z,
               CAST(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END AS BIGINT)
                   AS outlier
        FROM z ORDER BY doc_id
    """,
    # real JSON parser on the oracle side vs the engine's vectorized
    # regex fast path; NULL k excluded from sum/avg, counted in n_events
    "q45_props_rollup": """
        WITH x AS (
            SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               count(*)                     AS n_events,
               CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
               round(avg(k), 6)             AS avg_k
        FROM x GROUP BY event_type ORDER BY event_type
    """,
    # conjunction of the q39/q43/q44 gates + exact text dedup (min
    # doc_id per identical text wins); token-less docs: rep_keep = 1
    "q46_curation": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> '') AS ws
            FROM documents
        ), tok_cnt AS (
            SELECT doc_id, ws[i] AS tok, count(*) AS n
            FROM toks, unnest(range(1, len(ws) + 1)) AS t(i)
            GROUP BY doc_id, tok
        ), tok_agg AS (
            SELECT doc_id, max(n) AS top_n, sum(n) AS n_tok,
                   count(*) AS n_distinct
            FROM tok_cnt GROUP BY doc_id
        ), rep AS (
            SELECT d.doc_id,
                   CASE WHEN n_tok IS NULL THEN 1
                        WHEN round(top_n * 1.0 / n_tok, 6) <= 0.125
                         AND round(n_distinct * 1.0 / n_tok, 6) >= 0.35
                        THEN 1 ELSE 0 END AS rep_keep
            FROM documents d LEFT JOIN tok_agg USING (doc_id)
        ), s AS (
            SELECT lang,
                   avg(length(coalesce(text, '')))        AS mu,
                   stddev_pop(length(coalesce(text, ''))) AS sd
            FROM documents GROUP BY lang
        ), outl AS (
            SELECT d.doc_id,
                   CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars,
                   CASE WHEN abs(round(CASE WHEN s.sd = 0 THEN 0.0
                             ELSE (length(coalesce(d.text, '')) - s.mu) / s.sd
                             END, 6)) > 2 THEN 1 ELSE 0 END AS outlier
            FROM documents d JOIN s USING (lang)
        ), ch AS (
            SELECT doc_id,
                   array_to_string(ws[(i-1)*10+1 : least(i*10, len(ws))], ' ')
                       AS chunk
            FROM toks, unnest(range(1, (len(ws) + 9) // 10 + 1)) AS t(i)
        ), boiler AS (
            SELECT chunk
            FROM (SELECT DISTINCT doc_id, chunk FROM ch)
            GROUP BY chunk HAVING count(*) >= 2
        ), chagg AS (
            SELECT c.doc_id, count(*) AS n_chunks,
                   sum(CASE WHEN b.chunk IS NULL THEN 0 ELSE 1 END) AS n_dup
            FROM ch c LEFT JOIN boiler b USING (chunk)
            GROUP BY c.doc_id
        ), chk AS (
            SELECT d.doc_id,
                   CASE WHEN 2 * coalesce(a.n_dup, 0)
                             <= coalesce(a.n_chunks, 0)
                        THEN 1 ELSE 0 END AS chunk_keep
            FROM documents d LEFT JOIN chagg a USING (doc_id)
        ), dup AS (
            SELECT doc_id,
                   CASE WHEN row_number() OVER (
                            PARTITION BY coalesce(text, '')
                            ORDER BY doc_id) > 1
                        THEN 1 ELSE 0 END AS exact_dup
            FROM documents
        )
        SELECT d.doc_id, d.lang, o.n_chars,
               CAST(r.rep_keep AS BIGINT)   AS rep_keep,
               CAST(o.outlier AS BIGINT)    AS outlier,
               CAST(c.chunk_keep AS BIGINT) AS chunk_keep,
               CAST(p.exact_dup AS BIGINT)  AS exact_dup,
               CAST(CASE WHEN r.rep_keep = 1 AND o.outlier = 0
                          AND c.chunk_keep = 1 AND p.exact_dup = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM documents d
        JOIN rep r USING (doc_id)
        JOIN outl o USING (doc_id)
        JOIN chk c USING (doc_id)
        JOIN dup p USING (doc_id)
        ORDER BY d.doc_id
    """,
    "q47_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # epoch(interval) divides the same integer µs on both engines →
    # identical float64 before the 6-dp round; NULL = never converted
    "q49_funnel": """
        WITH v AS (
            SELECT user_id, min(ts) AS fv
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS fp
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= v.fv
            GROUP BY e.user_id
        )
        SELECT v.user_id,
               strftime(v.fv, '%Y-%m-%d %H:%M:%S.%f') AS first_view,
               CAST(CASE WHEN p.fp IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS converted,
               round(epoch(p.fp - v.fv), 6) AS secs_to_convert
        FROM v LEFT JOIN p USING (user_id)
        ORDER BY v.user_id
    """,
    "q50_shipping_priority": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1998-01-01'
          AND l_shipdate  > DATE '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    # fmix32 finalizer in exact integer SQL: xor = xor(), >> k = // 2**k,
    # 32-bit multiply via HUGEINT then % 2**32 (fits INT128, no overflow)
    "q51_doc_sample": """
        WITH f0 AS (
            SELECT doc_id, lang, n_chars,
                   xor(doc_id, doc_id // 4294967296) % 4294967296 AS v
            FROM documents
        ),
        f1 AS (SELECT *, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                          AS v1 FROM f0),
        f2 AS (SELECT *, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT *, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                          AS v3 FROM f2),
        f4 AS (SELECT *, xor(v3, v3 // 65536) AS h  FROM f3)
        SELECT doc_id, lang, n_chars FROM f4
        WHERE h < 429496729
        ORDER BY doc_id
    """,
    "q52_lang_source_rollup": """
        SELECT lang, source,
               count(*)              AS n_docs,
               sum(n_chars)::BIGINT  AS sum_chars
        FROM documents
        GROUP BY ROLLUP(lang, source)
    """,
    "q53_big_spenders": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING sum(l_quantity) > 170
        ORDER BY sum_qty DESC, o_orderkey
    """,
    "q55_regional_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
                     AND c_nationkey = s_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1997-01-01'
          AND o_orderdate <  DATE '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    # same fmix32 chain as q51; CASE ranges are floor(0.8|0.9 * 2**32)
    "q56_split_assign": """
        WITH f0 AS (
            SELECT doc_id, lang,
                   xor(doc_id, doc_id // 4294967296) % 4294967296 AS v
            FROM documents
        ),
        f1 AS (SELECT *, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                          AS v1 FROM f0),
        f2 AS (SELECT *, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT *, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                          AS v3 FROM f2),
        f4 AS (SELECT *, xor(v3, v3 // 65536) AS h  FROM f3)
        SELECT CASE WHEN h < 3435973836 THEN 'train'
                    WHEN h < 3865470566 THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n_docs
        FROM f4
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
    "q57_len_token_corr": """
        SELECT lang, count(*) AS n_docs,
               round(corr(n_chars,
                          len(regexp_extract_all(text, '\\S+'))), 6)
                   AS corr_len_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "q58_first_events": """
        SELECT user_id, event_type, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) = 1
        ORDER BY user_id, event_type
    """,
    "q59_normalized_dedup": """
        SELECT min(doc_id) AS rep_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
        ORDER BY rep_doc_id
    """,
    "q60_gap_quantiles": """
        WITH g AS (
            SELECT event_type,
                   (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000
                       AS gap_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            QUALIFY lag(ts) OVER w IS NOT NULL
        )
        SELECT event_type,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY gap_s) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY gap_s) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_s) AS p99
        FROM g
        GROUP BY event_type
        ORDER BY event_type
    """,
    # exact integer µs difference / 1e6 → identical float64 on both
    "q61_view_attribution": """
        SELECT p.event_id AS purchase_id,
               v.event_id AS view_id,
               round((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0, 6)
                   AS secs_before
        FROM events p
        JOIN events v
          ON p.user_id = v.user_id
         AND v.ts >  p.ts - INTERVAL 1 HOUR
         AND v.ts <= p.ts
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        ORDER BY purchase_id, view_id
    """,
    "q62_event_debounce": """
        SELECT user_id, event_type, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id)
        QUALIFY lag(ts) OVER w IS NULL
             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
        ORDER BY user_id, event_type, event_id
    """,
    # trim() strips spaces only (matches pandas .str.strip(' '))
    "q63_line_filter": """
        SELECT doc_id,
               len(lines)::BIGINT AS n_lines,
               len(kept)::BIGINT  AS n_kept,
               coalesce(list_sum(list_transform(kept, x -> len(x))), 0)::BIGINT
                   AS kept_chars
        FROM (
          SELECT doc_id, lines,
                 list_filter(lines,
                   x -> len(regexp_extract_all(x, '\\S+')) >= 4
                    AND NOT contains(x, '{')
                    AND (regexp_matches(x, '[.!?"]$')
                         OR len(regexp_extract_all(x, '\\S+')) >= 20)) AS kept
          FROM (SELECT doc_id,
                       list_transform(string_split(coalesce(text, ''), chr(10)),
                                      x -> trim(x)) AS lines
                FROM documents)
        )
        ORDER BY doc_id
    """,
    "q64_bigram_lm": """
        WITH arrs AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        uni AS (SELECT tok, count(*)::BIGINT AS c
                FROM (SELECT unnest(a) AS tok FROM arrs) GROUP BY tok),
        v AS (SELECT count(*)::BIGINT AS vv FROM uni),
        bge AS (
          SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(a)),
                              i -> struct_pack(w1 := a[i], w2 := a[i+1]))) AS bg
                FROM arrs WHERE len(a) >= 2)
        ),
        bc AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bge GROUP BY w1, w2)
        SELECT bge.doc_id,
               count(*)::BIGINT AS n_bigrams,
               round(avg(ln((bc.cb + 1.0) / (uni.c + v.vv))), 6) AS lm_score
        FROM bge
        JOIN bc USING (w1, w2)
        JOIN uni ON uni.tok = bge.w1
        CROSS JOIN v
        GROUP BY bge.doc_id
        ORDER BY bge.doc_id
    """,
    "q65_quantile_gate": """
        WITH t AS (
          SELECT lang,
                 len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT
                     AS n_tok
          FROM documents
        ),
        q AS (
          SELECT lang,
                 percentile_disc(0.1) WITHIN GROUP (ORDER BY n_tok)::BIGINT
                     AS p10_tokens
          FROM t GROUP BY lang
        )
        SELECT t.lang,
               q.p10_tokens,
               count(*)::BIGINT AS n_docs,
               count(*) FILTER (t.n_tok >= q.p10_tokens)::BIGINT AS n_kept
        FROM t JOIN q USING (lang)
        GROUP BY t.lang, q.p10_tokens
        ORDER BY lang
    """,
    # q66_pack_sequences: greedy reset-cumsum packing is sequential
    # per group — not window-expressible; rows-only (invariant-gated).
    "q67_head_dedup": """
        SELECT doc_id, source, n_group
        FROM (
          SELECT doc_id, source,
                 count(*) OVER (PARTITION BY key)::BIGINT AS n_group,
                 row_number() OVER (
                   PARTITION BY key
                   ORDER BY CAST(substr(source, 4) AS BIGINT), doc_id) AS rn
          FROM (SELECT doc_id, source,
                       array_to_string(list_slice(
                         regexp_extract_all(lower(coalesce(text, '')), '\\S+'),
                         1, 8), ' ') AS key
                FROM documents)
        )
        WHERE rn = 1
        ORDER BY doc_id
    """,
    "q68_global_rank": """
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id)::BIGINT AS rnk,
               ntile(8)     OVER (ORDER BY n_chars, doc_id)::BIGINT AS bucket
        FROM documents
        ORDER BY doc_id
    """,
    # q69_top_bigrams_mg: approximate by design (Misra-Gries);
    # rows-only — gated against exact q35 counts in pytest.
    "q70_rolling_distinct": """
        WITH du AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
                    FROM events),
        days AS (SELECT DISTINCT day FROM du)
        SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS wau
        FROM days d
        JOIN du u
          ON u.day <= d.day
         AND u.day >= strftime(CAST(d.day AS DATE) - INTERVAL 6 DAY,
                               '%Y-%m-%d')
        GROUP BY d.day
        ORDER BY d.day
    """,
    "q71_vocab": """
        WITH c AS (
          SELECT tok AS token, count(*)::BIGINT AS freq
          FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '\\S+')) AS tok
                FROM documents)
          GROUP BY tok
          HAVING count(*) >= 5
        )
        SELECT token, freq,
               row_number() OVER (ORDER BY freq DESC, token)::BIGINT
                   AS token_id
        FROM c
        ORDER BY token_id
    """,
    "q72_chunk_windows": """
        WITH arrs AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        w AS (
          SELECT doc_id, a,
                 unnest(range(0, CASE WHEN len(a) <= 64 THEN 1
                        ELSE CAST(ceil((len(a) - 64) / 48.0) AS BIGINT) + 1
                        END)) AS chunk_idx
          FROM arrs
        )
        SELECT doc_id, chunk_idx,
               least(64, len(a) - chunk_idx * 48)::BIGINT AS n_tok,
               array_to_string(list_slice(a, chunk_idx * 48 + 1,
                                          chunk_idx * 48 + 64), ' ')
                   AS chunk_text
        FROM w
        ORDER BY doc_id, chunk_idx
    """,
    "q74_order_count_histogram": """
        SELECT c_count, count(*)::BIGINT AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q75_priority_shipments": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY ship_month
        ORDER BY ship_month
    """,
    "q76_user_running_total": """
        SELECT user_id, event_id,
               CAST(row_number() OVER w AS BIGINT) AS seq,
               CAST(sum(CAST(floor(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, seq
    """,
    "q77_bpe_token_counts": """
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text, ''),
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f\\v]+|[ \\t\\n\\r\\f\\v]+'))::BIGINT
                   AS n_bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    "q78_line_dedup_rewrite": """
        WITH l AS (
          SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
          FROM documents
        ),
        e AS (
          SELECT doc_id, CAST(t.i AS BIGINT) AS line_idx,
                 ls[CAST(t.i AS BIGINT) + 1] AS line
          FROM l, UNNEST(range(0, len(ls))) AS t(i)
        ),
        d AS (
          SELECT doc_id, line_idx, line,
                 CASE WHEN len(regexp_extract_all(line, '\\S+')) >= 5
                      THEN row_number() OVER (PARTITION BY line
                                              ORDER BY doc_id, line_idx)
                      ELSE 1 END AS rn
          FROM e
        ),
        agg AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY line_idx) AS clean_text,
                 count(*)::BIGINT AS n_kept
          FROM d WHERE rn = 1 GROUP BY doc_id
        )
        SELECT l.doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               (len(l.ls) - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
        FROM l LEFT JOIN agg a USING (doc_id)
        ORDER BY l.doc_id
    """,
    "q79_oov_rate": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '\\S+')) AS t
          FROM documents
        ),
        v AS (SELECT t FROM tok GROUP BY t HAVING count(*) >= 5),
        per AS (
          SELECT doc_id, count(*)::BIGINT AS n_tok,
                 sum(CASE WHEN t IN (SELECT t FROM v) THEN 0 ELSE 1
                     END)::BIGINT AS n_oov
          FROM tok GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_tok, 0)::BIGINT AS n_tok,
               coalesce(p.n_oov, 0)::BIGINT AS n_oov,
               coalesce((p.n_oov * 1000000) // NULLIF(p.n_tok, 0),
                        0)::BIGINT AS oov_ppm
        FROM documents d LEFT JOIN per p USING (doc_id)
        ORDER BY d.doc_id
    """,
    "q82_dsir_weights": """
        WITH arrs AS (
          SELECT doc_id, lang,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        uni_r AS (SELECT tok, count(*)::BIGINT AS c
                  FROM (SELECT unnest(a) AS tok FROM arrs) GROUP BY tok),
        v_r AS (SELECT greatest(count(*), 1)::BIGINT AS vv FROM uni_r),
        uni_t AS (SELECT tok, count(*)::BIGINT AS c
                  FROM (SELECT unnest(a) AS tok FROM arrs
                        WHERE lang = 'en') GROUP BY tok),
        v_t AS (SELECT greatest(count(*), 1)::BIGINT AS vv FROM uni_t),
        bge AS (
          SELECT doc_id, lang, bg.w1 AS w1, bg.w2 AS w2
          FROM (SELECT doc_id, lang,
                       unnest(list_transform(range(1, len(a)),
                              i -> struct_pack(w1 := a[i], w2 := a[i+1]))) AS bg
                FROM arrs WHERE len(a) >= 2)
        ),
        bc_r AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bge
                 GROUP BY w1, w2),
        bc_t AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bge
                 WHERE lang = 'en' GROUP BY w1, w2)
        SELECT bge.doc_id,
               count(*)::BIGINT AS n_bigrams,
               round(sum(ln((coalesce(bt.cb, 0) + 1.0)
                            / (coalesce(ut.c, 0) + v_t.vv))
                         - ln((br.cb + 1.0) / (ur.c + v_r.vv))), 6)
                   AS dsir_logratio
        FROM bge
        JOIN bc_r br ON br.w1 = bge.w1 AND br.w2 = bge.w2
        JOIN uni_r ur ON ur.tok = bge.w1
        LEFT JOIN bc_t bt ON bt.w1 = bge.w1 AND bt.w2 = bge.w2
        LEFT JOIN uni_t ut ON ut.tok = bge.w1
        CROSS JOIN v_r CROSS JOIN v_t
        GROUP BY bge.doc_id
        ORDER BY bge.doc_id
    """,
    "q83_value_quantiles": """
        SELECT event_type,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q84_customer_order_counts": """
        SELECT c.c_custkey, c.c_name,
               count(o.o_orderkey)::BIGINT AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY c.c_custkey
    """,
    "q85_promo_revenue_share": """
        WITH j AS (
          SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_u,
                 (p_type = 'PROMO') AS is_promo
          FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        m AS (
          SELECT ship_month,
                 CAST(sum(CASE WHEN is_promo THEN rev_u ELSE 0 END)
                      AS BIGINT) AS promo_u,
                 CAST(sum(rev_u) AS BIGINT) AS total_u
          FROM j GROUP BY ship_month
        )
        SELECT ship_month,
               promo_u / 10000.0 AS promo_rev,
               total_u / 10000.0 AS total_rev,
               round(promo_u * 1.0 / total_u, 6) AS promo_share
        FROM m
        ORDER BY ship_month
    """,
    "q86_top_orders_per_segment": """
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                                    ORDER BY o.o_totalprice DESC,
                                             o.o_orderkey) AS rk
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        )
        WHERE rk <= 3
        ORDER BY c_mktsegment, rk
    """,
    "q87_retention_cohorts": """
        WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                   FROM events),
        c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id)
        SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
               date_diff('day', c.cohort, d.day)::BIGINT AS day_offset,
               count(*)::BIGINT AS n_users
        FROM d JOIN c USING (user_id)
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    "q88_event_type_cooccurrence": """
        WITH s AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*)::BIGINT AS n_users
        FROM s a JOIN s b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY type_a, type_b
        ORDER BY type_a, type_b
    """,
    "q89_token_and_search": """
        WITH tok AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        freq AS (
          SELECT t AS token, count(*)::BIGINT AS n
          FROM (SELECT unnest(a) AS t FROM tok) GROUP BY t
        ),
        q AS (SELECT token FROM freq
              ORDER BY n DESC, token LIMIT 2)
        SELECT doc_id FROM tok
        WHERE NOT EXISTS (
          SELECT 1 FROM q WHERE NOT list_contains(tok.a, q.token)
        )
        ORDER BY doc_id
    """,
    "q90_token_index_search": """
        WITH tok AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        freq AS (
          SELECT t AS token, count(*)::BIGINT AS n
          FROM (SELECT unnest(a) AS t FROM tok) GROUP BY t
        ),
        q AS (SELECT token FROM freq
              ORDER BY n DESC, token LIMIT 2)
        SELECT doc_id FROM tok
        WHERE NOT EXISTS (
          SELECT 1 FROM q WHERE NOT list_contains(tok.a, q.token)
        )
        ORDER BY doc_id
    """,
    # integer ppm via // (floor division of exact int64 numerators);
    # lines = q63 recipe (trim spaces, drop empties); keep uses exact
    # integer cross-multiplication so no float boundary exists
    "q128_repetition_signals": """
        WITH arrs AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ),
        toklen AS (
          SELECT doc_id,
                 coalesce(list_sum(list_transform(a, x -> len(x))), 0)::BIGINT
                     AS n_chars
          FROM arrs
        ),
        lns AS (
          SELECT doc_id,
                 unnest(list_filter(
                   list_transform(string_split(coalesce(text, ''), chr(10)),
                                  x -> trim(x)),
                   x -> x <> '')) AS line
          FROM documents
        ),
        lc AS (SELECT doc_id, line, count(*)::BIGINT AS cnt,
                      len(line)::BIGINT AS c
               FROM lns GROUP BY doc_id, line),
        lagg AS (SELECT doc_id,
                        sum(cnt)::BIGINT            AS n_lines,
                        sum(cnt - 1)::BIGINT        AS dup_lines,
                        sum((cnt - 1) * c)::BIGINT  AS dup_lchars,
                        sum(cnt * c)::BIGINT        AS tot_lchars
                 FROM lc GROUP BY doc_id),
        bge AS (
          SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(a)),
                              i -> struct_pack(w1 := a[i], w2 := a[i+1])))
                           AS bg
                FROM arrs WHERE len(a) >= 2)
        ),
        bc AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS f,
                      (len(w1) + len(w2))::BIGINT AS c
               FROM bge GROUP BY doc_id, w1, w2),
        bagg AS (SELECT doc_id, max(f * c)::BIGINT AS top2
                 FROM bc GROUP BY doc_id),
        g5e AS (
          SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3,
                 g.w4 AS w4, g.w5 AS w5
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(a) - 3),
                              i -> struct_pack(w1 := a[i], w2 := a[i+1],
                                               w3 := a[i+2], w4 := a[i+3],
                                               w5 := a[i+4]))) AS g
                FROM arrs WHERE len(a) >= 5)
        ),
        g5c AS (SELECT doc_id, count(*)::BIGINT AS f,
                       (len(w1) + len(w2) + len(w3) + len(w4)
                        + len(w5))::BIGINT AS c
                FROM g5e GROUP BY doc_id, w1, w2, w3, w4, w5),
        g5agg AS (SELECT doc_id,
                         sum(CASE WHEN f > 1 THEN f * c ELSE 0 END)::BIGINT
                             AS dup5
                  FROM g5c GROUP BY doc_id)
        SELECT t.doc_id,
               (CASE WHEN coalesce(l.n_lines, 0) > 0
                     THEN coalesce(l.dup_lines, 0) * 1000000 // l.n_lines
                     ELSE 0 END)::BIGINT AS dup_line_ppm,
               (CASE WHEN coalesce(l.tot_lchars, 0) > 0
                     THEN coalesce(l.dup_lchars, 0) * 1000000 // l.tot_lchars
                     ELSE 0 END)::BIGINT AS dup_line_char_ppm,
               (CASE WHEN t.n_chars > 0
                     THEN coalesce(b.top2, 0) * 1000000 // t.n_chars
                     ELSE 0 END)::BIGINT AS top2_char_ppm,
               (CASE WHEN t.n_chars > 0
                     THEN coalesce(g.dup5, 0) * 1000000 // t.n_chars
                     ELSE 0 END)::BIGINT AS dup5_char_ppm,
               CAST(10 * coalesce(l.dup_lines, 0)
                        <= 3 * coalesce(l.n_lines, 0)
                    AND 5 * coalesce(l.dup_lchars, 0)
                        <= coalesce(l.tot_lchars, 0)
                    AND 5 * coalesce(b.top2, 0) <= t.n_chars
                    AND 20 * coalesce(g.dup5, 0) <= 3 * t.n_chars
                    AS BIGINT) AS keep
        FROM toklen t
        LEFT JOIN lagg  l USING (doc_id)
        LEFT JOIN bagg  b USING (doc_id)
        LEFT JOIN g5agg g USING (doc_id)
        ORDER BY doc_id
    """,
    # every 64-char window (1-based char positions, code-point
    # semantics on both engines); shared = verbatim in >= 2 distinct
    # docs; interval union via gaps-and-islands (same-length windows:
    # same island while consecutive starts gap <= 64)
    "q129_exact_substring_spans": """
        WITH w AS (
          SELECT doc_id, i AS pos, substr(coalesce(text, ''), i, 64) AS win
          FROM documents,
               unnest(range(1, len(coalesce(text, '')) - 62)) AS t(i)
        ),
        shared AS (
          SELECT win FROM w GROUP BY win
          HAVING count(DISTINCT doc_id) >= 2
        ),
        m AS (SELECT DISTINCT doc_id, pos FROM w JOIN shared USING (win)),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER
                          (PARTITION BY doc_id ORDER BY pos) > 64
                      OR lag(pos) OVER
                          (PARTITION BY doc_id ORDER BY pos) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM m),
        isl2 AS (SELECT doc_id, pos,
                        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS g
                 FROM isl),
        sp AS (SELECT doc_id, g,
                      (max(pos) + 64 - min(pos))::BIGINT AS span
               FROM isl2 GROUP BY doc_id, g),
        cov AS (SELECT doc_id, sum(span)::BIGINT AS dup_chars,
                       count(*)::BIGINT AS n_spans
                FROM sp GROUP BY doc_id)
        SELECT d.doc_id,
               len(coalesce(d.text, ''))::BIGINT AS n_chars,
               coalesce(c.dup_chars, 0)::BIGINT AS dup_chars,
               coalesce(c.n_spans, 0)::BIGINT AS n_spans,
               (CASE WHEN len(coalesce(d.text, '')) > 0
                     THEN coalesce(c.dup_chars, 0) * 1000000
                          // len(coalesce(d.text, ''))
                     ELSE 0 END)::BIGINT AS dup_char_ppm
        FROM documents d
        LEFT JOIN cov c USING (doc_id)
        ORDER BY d.doc_id
    """,
    # keep-first = global min (doc_id,pos) per shared window string
    # (row_number over the window); kept segments assembled with
    # string_agg ORDER BY segment start — all char arithmetic exact
    "q130_substring_dedup_rewrite": """
        WITH w AS (
          SELECT doc_id, i AS pos, substr(coalesce(text, ''), i, 64) AS win
          FROM documents,
               unnest(range(1, len(coalesce(text, '')) - 62)) AS t(i)
        ),
        shared AS (
          SELECT win FROM w GROUP BY win
          HAVING count(DISTINCT doc_id) >= 2
        ),
        occ AS (
          SELECT w.doc_id, w.pos,
                 row_number() OVER (PARTITION BY w.win
                                    ORDER BY w.doc_id, w.pos) AS rn
          FROM w JOIN shared USING (win)
        ),
        m AS (SELECT DISTINCT doc_id, pos FROM occ WHERE rn > 1),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER
                          (PARTITION BY doc_id ORDER BY pos) > 64
                      OR lag(pos) OVER
                          (PARTITION BY doc_id ORDER BY pos) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM m),
        isl2 AS (SELECT doc_id, pos,
                        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS g
                 FROM isl),
        sp AS (SELECT doc_id, min(pos)::BIGINT AS s,
                      (max(pos) + 64)::BIGINT AS e
               FROM isl2 GROUP BY doc_id, g),
        segs AS (
          SELECT doc_id,
                 coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s),
                          1) AS ks,
                 s AS ke
          FROM sp
          UNION ALL
          SELECT d.doc_id, coalesce(mx.e, 1) AS ks,
                 len(coalesce(d.text, '')) + 1 AS ke
          FROM documents d
          LEFT JOIN (SELECT doc_id, max(e) AS e FROM sp
                     GROUP BY doc_id) mx USING (doc_id)
        ),
        clean AS (
          SELECT s.doc_id,
                 string_agg(substr(coalesce(d.text, ''), s.ks::INT,
                                   (s.ke - s.ks)::INT),
                            '' ORDER BY s.ks) AS text_clean
          FROM segs s JOIN documents d USING (doc_id)
          GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               len(coalesce(d.text, ''))::BIGINT AS n_chars,
               (len(coalesce(d.text, ''))
                - len(coalesce(c.text_clean, '')))::BIGINT AS cut_chars,
               coalesce(c.text_clean, '') AS text_clean
        FROM documents d
        LEFT JOIN clean c USING (doc_id)
        ORDER BY d.doc_id
    """,
    # inequality-only join (DuckDB IEJoin); [ts-10min, ts) window,
    # inclusive lower / strict upper — mirrors the exact µs boundaries
    "q131_global_range_join": """
        SELECT p.event_id,
               count(v.event_id)::BIGINT AS n_views_10m
        FROM events p
        LEFT JOIN events v
          ON v.event_type = 'view'
         AND v.ts >= p.ts - INTERVAL 10 MINUTE
         AND v.ts <  p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
        ORDER BY p.event_id
    """,
    # feature-hashing embedding: vocab rank -> fmix32 (q51 chain) ->
    # (dim, sign); exact integer sums so coordinates match value-exactly
    "q141_hashed_embedding": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text, '')),
                                             '\\S+')) AS tok
            FROM documents
        ), vocab AS (
            SELECT tok, count(*) AS n FROM toks
            GROUP BY tok HAVING count(*) >= 2
        ), ranked AS (
            SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS vid
            FROM vocab
        ), f0 AS (
            SELECT tok, xor(vid, vid // 4294967296) % 4294967296 AS v
            FROM ranked
        ),
        f1 AS (SELECT tok, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                            AS v1 FROM f0),
        f2 AS (SELECT tok, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT tok, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                            AS v3 FROM f2),
        f4 AS (SELECT tok, xor(v3, v3 // 65536) AS h  FROM f3),
        hashed AS (
            SELECT tok, (h % 64)::BIGINT AS dim,
                   CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
            FROM f4
        )
        SELECT t.doc_id, h.dim, sum(h.sgn)::BIGINT AS val
        FROM toks t JOIN hashed h USING (tok)
        GROUP BY t.doc_id, h.dim
        ORDER BY t.doc_id, h.dim
    """,
    # contract audit: exact-integer violation counts; bad_ppm is
    # integer division (float division is tie-sensitive across engines)
    "q142_contract_audit": """
        WITH t AS (
            SELECT count(*)::BIGINT AS n,
                   coalesce(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END),
                            0)::BIGINT AS neg,
                   coalesce(sum(CASE WHEN props IS NULL OR props = ''
                                     THEN 1 ELSE 0 END), 0)::BIGINT AS ep,
                   coalesce(sum(CASE WHEN ts >= TIMESTAMP '2030-01-01'
                                     THEN 1 ELSE 0 END), 0)::BIGINT AS fut,
                   coalesce(sum(CASE WHEN user_id IS NULL
                                     THEN 1 ELSE 0 END), 0)::BIGINT AS nu,
                   (count(*) - count(DISTINCT event_id))::BIGINT AS dup
            FROM events
        ), rules AS (
            SELECT 'dup_event_id'   AS rule, dup AS n_violations, n FROM t
            UNION ALL SELECT 'empty_props',    ep,  n FROM t
            UNION ALL SELECT 'future_ts',      fut, n FROM t
            UNION ALL SELECT 'negative_value', neg, n FROM t
            UNION ALL SELECT 'null_user',      nu,  n FROM t
        )
        SELECT rule, n_violations, n AS n_rows,
               (n_violations * 1000000 // greatest(n, 1))::BIGINT AS bad_ppm
        FROM rules
        ORDER BY rule
    """,
    # exact describe: count(DISTINCT) excludes NULLs on both sides
    "q143_table_profile": """
        SELECT 'event_id' AS col, count(*)::BIGINT AS n_rows,
               (count(*) - count(event_id))::BIGINT AS n_null,
               count(DISTINCT event_id)::BIGINT AS n_distinct FROM events
        UNION ALL
        SELECT 'event_type', count(*), count(*) - count(event_type),
               count(DISTINCT event_type) FROM events
        UNION ALL
        SELECT 'props', count(*), count(*) - count(props),
               count(DISTINCT props) FROM events
        UNION ALL
        SELECT 'ts', count(*), count(*) - count(ts),
               count(DISTINCT ts) FROM events
        UNION ALL
        SELECT 'user_id', count(*), count(*) - count(user_id),
               count(DISTINCT user_id) FROM events
        UNION ALL
        SELECT 'value', count(*), count(*) - count(value),
               count(DISTINCT value) FROM events
        ORDER BY col
    """,
    "q145_phrase_search": """
        WITH arrs AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS a
          FROM documents
        ), bge AS (
          SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(a)),
                              i -> struct_pack(w1 := a[i],
                                               w2 := a[i+1]))) AS bg
                FROM arrs WHERE len(a) >= 2)
        ), top AS (
          SELECT w1, w2
          FROM (SELECT w1, w2, count(*) AS n FROM bge GROUP BY w1, w2)
          ORDER BY n DESC, w1, w2 LIMIT 1
        )
        SELECT b.doc_id, count(*)::BIGINT AS n_phrase
        FROM bge b JOIN top t USING (w1, w2)
        GROUP BY b.doc_id
        ORDER BY b.doc_id
    """,
    # q26's pair oracle + the 1:1 doc join and lang-mismatch filter
    "q146_crosslingual_dup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               da.lang AS lang_a, db.lang AS lang_b
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        JOIN documents da ON da.doc_id = a.vec_id
        JOIN documents db ON db.doc_id = b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
          AND da.lang <> db.lang
        ORDER BY id_a, id_b
    """,
    # FD audit: A -> B holds iff distinct(A) == distinct(A, B)
    "q148_fd_audit": """
        WITH m AS (
            SELECT 'event_id->ts' AS fd,
                   (SELECT count(DISTINCT event_id) FROM events) AS n_lhs,
                   (SELECT count(*) FROM
                       (SELECT DISTINCT event_id, ts FROM events)) AS n_pairs
            UNION ALL
            SELECT 'event_id->user_id',
                   (SELECT count(DISTINCT event_id) FROM events),
                   (SELECT count(*) FROM
                       (SELECT DISTINCT event_id, user_id FROM events))
            UNION ALL
            SELECT 'event_type->props',
                   (SELECT count(DISTINCT event_type) FROM events),
                   (SELECT count(*) FROM
                       (SELECT DISTINCT event_type, props FROM events))
            UNION ALL
            SELECT 'user_id->event_type',
                   (SELECT count(DISTINCT user_id) FROM events),
                   (SELECT count(*) FROM
                       (SELECT DISTINCT user_id, event_type FROM events))
        )
        SELECT fd, n_lhs::BIGINT AS n_lhs, n_pairs::BIGINT AS n_pairs,
               (n_pairs - n_lhs)::BIGINT AS n_violations,
               n_pairs = n_lhs AS holds
        FROM m ORDER BY fd
    """,
    # soft dedup: integer ppm weights over the recursive-CTE CC
    "q151_dedup_loss_weights": _NGRAM_CC_SQL + """
        , sizes AS (
            SELECT cluster_id, count(*)::BIGINT AS cluster_size
            FROM assign GROUP BY cluster_id
        )
        SELECT a.doc_id, a.cluster_id, s.cluster_size,
               (1000000 // s.cluster_size)::BIGINT AS weight_ppm
        FROM assign a JOIN sizes s USING (cluster_id)
        ORDER BY a.doc_id
    """,
    # contamination evidence pairs over the shared shingle CTE
    "q152_contamination_pairs": _SHINGLE_SQL + """
        , pr AS (
            SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
                   count(*) AS n_shared
            FROM dsh tr JOIN dsh te ON tr.shingle = te.shingle
            WHERE te.doc_id % 10 = 0 AND tr.doc_id % 10 <> 0
            GROUP BY 1, 2
        )
        SELECT pr.train_id, pr.test_id, pr.n_shared::BIGINT AS n_shared,
               (pr.n_shared * 1000000 // c.n)::BIGINT AS overlap_ppm
        FROM pr JOIN counts c ON c.doc_id = pr.test_id
        ORDER BY train_id, test_id
    """,
    # keep-N partial dedup: rank by doc_id within the CC cluster
    "q153_keep_n_dedup": _NGRAM_CC_SQL + """
        SELECT doc_id, cluster_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY doc_id)::BIGINT AS rnk,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY doc_id) <= 2 AS keep
        FROM assign
        ORDER BY doc_id
    """,
    # Flesch raw inputs as exact regex counts
    "q154_readability_counts": """
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text, ''),
                                      '\\S+'))::BIGINT AS n_words,
               greatest(len(regexp_extract_all(coalesce(text, ''),
                                               '[.!?]+')), 1)::BIGINT
                   AS n_sentences,
               len(regexp_extract_all(lower(coalesce(text, '')),
                                      '[aeiouy]+'))::BIGINT
                   AS n_vowel_groups
        FROM documents
        ORDER BY doc_id
    """,
    # script-mix audit: identical regex class both engines, int ppm
    "q157_ascii_ratio": """
        WITH t AS (
            SELECT doc_id,
                   length(coalesce(text, ''))::BIGINT AS n_chars,
                   len(regexp_extract_all(coalesce(text, ''),
                                          '[ -~]'))::BIGINT AS n_ascii
            FROM documents
        )
        SELECT doc_id, n_chars, n_ascii,
               CASE WHEN n_chars > 0
                    THEN n_ascii * 1000000 // n_chars
                    ELSE 0 END::BIGINT AS ascii_ppm
        FROM t ORDER BY doc_id
    """,
    # cluster-level fmix32 split over the exact-Jaccard CC: the q56
    # hash chain applied to assign.cluster_id (nonnegative min doc_id)
    "q158_leakfree_split": _NGRAM_CC_SQL + """
        , f0 AS (
            SELECT doc_id, cluster_id,
                   xor(cluster_id, cluster_id // 4294967296)
                       % 4294967296 AS v
            FROM assign
        ),
        f1 AS (SELECT *, ((v::HUGEINT * 2246822507) % 4294967296)::BIGINT
                          AS v1 FROM f0),
        f2 AS (SELECT *, xor(v1, v1 // 8192)  AS v2 FROM f1),
        f3 AS (SELECT *, ((v2::HUGEINT * 3266489909) % 4294967296)::BIGINT
                          AS v3 FROM f2),
        f4 AS (SELECT *, xor(v3, v3 // 65536) AS h  FROM f3)
        SELECT doc_id, cluster_id,
               CASE WHEN h < 3435973836 THEN 'train'
                    WHEN h < 3865470566 THEN 'val'
                    ELSE 'test' END AS split
        FROM f4 ORDER BY doc_id
    """,
    # percentile_disc is DuckDB's exact-decimal ceil(p*n) index — the
    # engine mirrors it as (99*n+99)//100 over the count histogram
    "q159_key_skew": """
        WITH ce AS (
            SELECT event_type::VARCHAR AS k, count(*)::BIGINT AS n
            FROM events GROUP BY 1
        ), cu AS (
            SELECT user_id::VARCHAR AS k, count(*)::BIGINT AS n
            FROM events GROUP BY 1
        ), s AS (
            SELECT 'event_type' AS key_col, count(*)::BIGINT AS n_keys,
                   sum(n)::BIGINT AS total_rows, max(n)::BIGINT AS max_count,
                   percentile_disc(0.99) WITHIN GROUP (ORDER BY n)::BIGINT
                       AS p99_count
            FROM ce
            UNION ALL
            SELECT 'user_id', count(*)::BIGINT, sum(n)::BIGINT,
                   max(n)::BIGINT,
                   percentile_disc(0.99) WITHIN GROUP (ORDER BY n)::BIGINT
            FROM cu
        )
        SELECT key_col, n_keys, total_rows, max_count, p99_count,
               (1000000 * max_count // total_rows)::BIGINT AS top1_share_ppm
        FROM s ORDER BY key_col
    """,
    # all-pairs levenshtein over DISTINCT normalized 16-char head keys
    # (audit-mode cross check of the FastSS deletion-variant banding;
    # the normalization chain mirrors q59's ASCII-explicit class)
    "q165_editdist_dedup": """
        WITH keys AS (
            SELECT substr(trim(regexp_replace(lower(coalesce(text, '')),
                          '[^a-z0-9]+', ' ', 'g')), 1, 16) AS k,
                   min(doc_id)::BIGINT AS doc_id,
                   count(*)::BIGINT    AS n_docs
            FROM documents
            GROUP BY 1
            HAVING k <> ''
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.k AS key_a, b.k AS key_b,
               a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
        FROM keys a JOIN keys b
          ON a.doc_id < b.doc_id AND levenshtein(a.k, b.k) = 1
        ORDER BY id_a, id_b
    """,
    # per-doc novelty over the shared shingle CTE: first-occurrence
    # owner = min doc_id per shingle, exact-integer ppm
    "q166_novelty": _SHINGLE_SQL + """
        , owners AS (
            SELECT shingle, min(doc_id) AS owner FROM dsh GROUP BY shingle
        ), per AS (
            SELECT d.doc_id,
                   count(*) AS n_shingles,
                   count(*) FILTER (WHERE o.owner = d.doc_id) AS n_novel
            FROM dsh d JOIN owners o ON o.shingle = d.shingle
            GROUP BY d.doc_id
        )
        SELECT doc_id,
               n_shingles::BIGINT AS n_shingles,
               n_novel::BIGINT AS n_novel,
               (n_novel * 1000000 // n_shingles)::BIGINT AS novel_ppm
        FROM per ORDER BY doc_id
    """,
    # digit-masked template groups; ASCII-explicit classes (q59/q77)
    "q167_template_dedup": """
        WITH t AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                        lower(coalesce(text, '')),
                        '[0-9]+', '#', 'g'), '[^a-z#]+', ' ', 'g')) AS tk,
                   trim(regexp_replace(lower(coalesce(text, '')),
                        '[^a-z0-9]+', ' ', 'g')) AS nk
            FROM documents
        )
        SELECT min(doc_id)::BIGINT          AS template_id,
               count(*)::BIGINT             AS n_copies,
               count(DISTINCT nk)::BIGINT   AS n_variants
        FROM t WHERE tk <> ''
        GROUP BY tk HAVING count(*) >= 2
        ORDER BY template_id
    """,
    # tail==head 8-token stitch join (1-based inclusive list slices)
    "q168_overlap_stitch": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(trim(regexp_replace(
                       lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g')),
                       ' '), x -> x <> '') AS ws
            FROM documents
        ), keys AS (
            SELECT doc_id,
                   array_to_string(ws[1:8], ' ')               AS head,
                   array_to_string(ws[len(ws)-7:len(ws)], ' ') AS tail
            FROM toks WHERE len(ws) >= 8
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM keys a JOIN keys b
          ON a.tail = b.head AND a.doc_id <> b.doc_id
        ORDER BY id_a, id_b
    """,
    # chain walk over unambiguous stitch edges; seam tokens trimmed
    # once per non-head fragment; 8-token fragments trim to NULL so
    # string_agg skips them (engine drops empty parts the same way)
    "q169_stitch_rewrite": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(string_split(trim(regexp_replace(
                       lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g')),
                       ' '), x -> x <> '') AS ws
            FROM documents
        ), keys AS (
            SELECT doc_id,
                   array_to_string(ws[1:8], ' ')               AS head,
                   array_to_string(ws[len(ws)-7:len(ws)], ' ') AS tail
            FROM toks WHERE len(ws) >= 8
        ), edges AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM keys a JOIN keys b
              ON a.tail = b.head AND a.doc_id <> b.doc_id
        ), e1 AS (
            SELECT id_a, id_b FROM edges
            QUALIFY count(*) OVER (PARTITION BY id_a) = 1
                AND count(*) OVER (PARTITION BY id_b) = 1
        ), chain(doc_id, chain_id, pos) AS (
            SELECT id_a, id_a, 0 FROM e1
            WHERE id_a NOT IN (SELECT id_b FROM e1)
            UNION ALL
            SELECT e.id_b, c.chain_id, c.pos + 1
            FROM chain c JOIN e1 e ON e.id_a = c.doc_id
        ), parts AS (
            SELECT c.chain_id, c.pos,
                   CASE WHEN c.pos = 0 THEN array_to_string(t.ws, ' ')
                        ELSE array_to_string(t.ws[9:len(t.ws)], ' ')
                   END AS part
            FROM chain c JOIN toks t ON t.doc_id = c.doc_id
        )
        SELECT chain_id::BIGINT AS chain_id,
               count(*)::BIGINT AS n_fragments,
               string_agg(nullif(part, ''), ' ' ORDER BY pos)
                   AS text_merged
        FROM parts GROUP BY chain_id HAVING count(*) >= 2
        ORDER BY chain_id
    """,
    # Heaps-law growth curve off the shared shingle CTE: first-
    # occurrence owners bucketed into exact-integer doc_id deciles
    "q170_corpus_growth": _SHINGLE_SQL + """
        , mm AS (
            SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
        ), owners AS (
            SELECT shingle, min(doc_id) AS owner FROM dsh GROUP BY shingle
        ), nb AS (
            SELECT least(9, ((owner - mm.lo) * 10) // (mm.hi - mm.lo + 1))
                       AS bucket,
                   count(*) AS n_new
            FROM owners, mm GROUP BY 1
        ), dc AS (
            SELECT least(9, ((doc_id - mm.lo) * 10) // (mm.hi - mm.lo + 1))
                       AS bucket,
                   count(*) AS n_docs
            FROM documents, mm GROUP BY 1
        )
        SELECT dc.bucket::BIGINT AS bucket,
               dc.n_docs::BIGINT AS n_docs,
               coalesce(nb.n_new, 0)::BIGINT AS n_new_shingles,
               sum(coalesce(nb.n_new, 0))
                   OVER (ORDER BY dc.bucket)::BIGINT AS cum_new_shingles
        FROM dc LEFT JOIN nb ON nb.bucket = dc.bucket
        ORDER BY bucket
    """,
    # exact per-source vocabulary uniqueness off the shingle CTE
    "q171_source_uniqueness": _SHINGLE_SQL + """
        , ss AS (
            SELECT DISTINCT d.shingle, doc.source
            FROM dsh d JOIN documents doc ON doc.doc_id = d.doc_id
        ), nsrc AS (
            SELECT shingle, count(*) AS n_sources FROM ss GROUP BY shingle
        ), per AS (
            SELECT ss.source,
                   count(*) AS n_shingles,
                   count(*) FILTER (WHERE nsrc.n_sources = 1) AS n_unique
            FROM ss JOIN nsrc ON nsrc.shingle = ss.shingle
            GROUP BY ss.source
        )
        SELECT source,
               n_shingles::BIGINT AS n_shingles,
               n_unique::BIGINT AS n_unique,
               (n_unique * 1000000 // greatest(n_shingles, 1))::BIGINT
                   AS unique_ppm
        FROM per ORDER BY source
    """,
    # top boilerplate lines by distinct-doc frequency; spaces-only
    # trim (q63 parity), (df desc, line asc) deterministic order
    "q173_boilerplate_lines": """
        WITH ln AS (
            SELECT DISTINCT doc_id,
                   trim(l, ' ') AS line
            FROM documents,
                 unnest(string_split(coalesce(text, ''), chr(10))) AS t(l)
        ), g AS (
            SELECT line, count(DISTINCT doc_id) AS df
            FROM ln WHERE line <> ''
            GROUP BY line HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT line, df::BIGINT AS df
        FROM g ORDER BY df DESC, line ASC LIMIT 20
    """,
}
