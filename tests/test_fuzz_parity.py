"""Differential fuzzing: randomized documents tables run through the
documents-only operators on BOTH engines (Ray impl vs DuckDB oracle),
compared the same way the driver compares.  Planted structure per
seed: exact-dup docs, shared 10-token runs (chunk-boundary material),
single-token docs, heavy repetition, and 9/10/11-token lengths that
straddle the q43 chunk width.

Every doc carries >= 1 token: the q39 contract for token-less docs is
NULL fracs (documented, planted-tested elsewhere) and the driver
corpus has none, so the fuzz domain matches the oracle contract.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FUZZED = ["q34_length_quantiles", "q35_top_bigrams",
          "q39_repetition_filter", "q43_chunk_dedup",
          "q44_quality_outliers", "q46_curation",
          "q56_split_assign", "q57_len_token_corr",
          "q59_normalized_dedup", "q63_line_filter", "q64_bigram_lm",
          "q65_quantile_gate", "q67_head_dedup", "q68_global_rank",
          "q71_vocab", "q72_chunk_windows", "q77_bpe_token_counts",
          "q78_line_dedup_rewrite", "q79_oov_rate", "q82_dsir_weights",
          "q89_token_and_search", "q91_dup_cluster_sizes",
          "q93_gopher_rules", "q95_weighted_sample",
          "q97_length_drift_psi", "q100_cross_source_dup_matrix",
          "q101_top_pmi_bigrams", "q108_bm25_topk",
          "q109_lexical_diversity", "q110_quality_mix_sample",
          "q111_domain_mix_report", "q115_mixture_draw",
          "q120_dup_degree_histogram", "q122_length_percentile",
          "q128_repetition_signals", "q129_exact_substring_spans",
          "q130_substring_dedup_rewrite", "q132_dup_triangles",
          "q137_containment_directed", "q139_source_dup_rate",
          "q141_hashed_embedding", "q145_phrase_search",
          "q151_dedup_loss_weights", "q152_contamination_pairs",
          "q153_keep_n_dedup", "q154_readability_counts",
          "q157_ascii_ratio", "q158_leakfree_split",
          "q165_editdist_dedup", "q166_novelty", "q167_template_dedup",
          "q168_overlap_stitch", "q169_stitch_rewrite",
          "q170_corpus_growth", "q171_source_uniqueness",
          "q173_boilerplate_lines"]

VOCAB = [f"t{i}" for i in range(40)]


def _corpus(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts, n = [], int(rng.integers(30, 70))
    for _ in range(n):
        ln = int(rng.integers(1, 60))
        texts.append(" ".join(rng.choice(VOCAB, ln)))
    # chunk-width straddlers
    for ln in (9, 10, 11, 1):
        texts.append(" ".join(rng.choice(VOCAB, ln)))
    # exact dups + shared 10-token run grafted into two hosts
    texts.append(texts[0])
    run = " ".join(rng.choice(VOCAB, 10))
    texts.append(run + " " + " ".join(rng.choice(VOCAB, 7)))
    texts.append(" ".join(rng.choice(VOCAB, 13)) + " " + run)
    texts.append("loop " * int(rng.integers(5, 30)) + "loop")  # repetitive
    # reformatted copy: q59 must collapse case/punct variants
    texts.append(texts[1].upper().replace(" ", ",  "))
    # multi-line doc (q63 line gate): short line, punctuated line,
    # code-smell line, long paragraph — with stray spaces to trim
    texts.append("\n".join([
        "tiny one",
        "  This planted line ends with a period.  ",
        "code { " + " ".join(rng.choice(VOCAB, 6)),
        " ".join(rng.choice(VOCAB, 25)),
    ]))
    # long docs straddling the q72 64-token window / 48 stride
    for ln in (64, 65, 112, 113, int(rng.integers(120, 200))):
        texts.append(" ".join(rng.choice(VOCAB, ln)))
    # shared 8-token head in two docs (q67 head-dedup groups)
    head = " ".join(rng.choice(VOCAB, 8))
    texts.append(head + " " + " ".join(rng.choice(VOCAB, 5)))
    texts.append(head + " " + " ".join(rng.choice(VOCAB, 9)))
    # duplicate-line doc (q128 repetition signals): 3x one line
    dl = " ".join(rng.choice(VOCAB, 6))
    texts.append("\n".join([dl, dl, " ".join(rng.choice(VOCAB, 12)), dl]))
    # typo variants inside the first 16 normalized chars (q165
    # edit-distance pairs): substitution, deletion, and a distance-2
    # non-pair off one random host doc
    host = " ".join(rng.choice(VOCAB, 12))
    texts.append("x" + host[1:])          # substitution at pos 0
    texts.append(host[:7] + host[8:])     # deletion inside the head
    texts.append("zz" + host[2:])         # distance 2 from host
    # stitch pair (q168): doc A's last 8 tokens == doc B's first 8
    seam = " ".join(rng.choice(VOCAB, 8))
    texts.append(" ".join(rng.choice(VOCAB, 9)) + " " + seam)
    texts.append(seam + " " + " ".join(rng.choice(VOCAB, 6)))
    return pd.DataFrame({
        "doc_id": np.arange(1, len(texts) + 1, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], len(texts)),
        "source": rng.choice([f"src{i}" for i in range(12)], len(texts)),
        "text": texts,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]) or \
                pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("seed", [1, 7, 23])
@pytest.mark.parametrize("name", FUZZED)
def test_fuzz_parity(name, seed, ray_session, tmp_path):
    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        RAY_QUERIES,
    )

    docs = _corpus(seed * 1000 + sum(map(ord, name)) % 997)  # stable seed
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = RAY_QUERIES[name](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b), f"{name} seed={seed}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)


# ---------------------------------------------------------------- events

EV_FUZZED = ["q06_user_hourly_windows", "q14_session_windows",
             "q47_distinct_users", "q49_funnel", "q58_first_events",
             "q60_gap_quantiles", "q61_view_attribution",
             "q62_event_debounce", "q76_user_running_total",
             "q83_value_quantiles", "q87_retention_cohorts",
             "q88_event_type_cooccurrence", "q99_event_transitions",
             "q113_late_data_drop", "q121_user_entropy",
             "q131_global_range_join", "q134_event_rate_anomaly",
             "q136_hopping_windows", "q142_contract_audit",
             "q143_table_profile", "q148_fd_audit", "q159_key_skew"]


def _events(seed: int) -> pd.DataFrame:
    """Randomized events with planted adversarial structure: exact
    timestamp ties (same user, same ts, different event_id), gaps of
    exactly 1800 s (the q14 session boundary is STRICTLY > 30 min)
    and 1801 s, single-event users, and shuffled physical row order
    so per-batch partials can't rely on arrival order."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    types = np.array(["view", "click", "purchase", "signup", "error"])
    rows = []
    for u in range(1, int(rng.integers(5, 11))):
        t = base + pd.Timedelta(minutes=int(rng.integers(0, 5000)))
        for _ in range(int(rng.integers(1, 12))):
            rows.append((u, t, str(rng.choice(types)),
                         round(float(rng.normal()) * 10, 3)))
            step = int(rng.choice([0, 1, 7, 599, 600, 1800, 1801, 3600, 86400]))
            t = t + pd.Timedelta(seconds=step)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
    df["event_id"] = (rng.permutation(len(df)) + 1).astype(np.int64)
    df["props"] = '{"k": 1}'
    df["ts"] = df["ts"].astype("datetime64[us]")
    df = df.sample(frac=1.0, random_state=seed % 2**32).reset_index(drop=True)
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


@pytest.mark.parametrize("seed", [3, 11, 29])
@pytest.mark.parametrize("name", EV_FUZZED)
def test_fuzz_parity_events(name, seed, ray_session, tmp_path):
    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        RAY_QUERIES,
    )

    ev = _events(seed * 1000 + sum(map(ord, name)) % 997)
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = RAY_QUERIES[name](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM ev")
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b), f"{name} seed={seed}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)


TPCH_FUZZED = [
    "q15_customers_without_orders", "q53_big_spenders",
    "q74_order_count_histogram", "q75_priority_shipments",
    "q84_customer_order_counts", "q85_promo_revenue_share",
    "q86_top_orders_per_segment", "q94_late_orders_by_priority",
    "q102_nation_trade_volume", "q103_returned_item_revenue",
    "q104_small_qty_order_revenue", "q105_disjunctive_part_revenue",
    "q106_lone_late_supplier", "q107_rich_idle_customers",
    "q118_forecast_revenue", "q119_market_share",
]


def _tpch(seed: int) -> dict:
    """Randomized TPC-H-shaped tables with planted join/predicate
    edge cases: exact +60/+90-day lateness boundaries, the 5–7 %
    discount and qty-24 edges, Q19's size/quantity range corners,
    window-boundary order dates (1996-01-01 / 1996-03-31 /
    1996-04-01 / 1999-01-01), customers without orders, and
    multi-supplier F-orders with exactly-one-late vs both-late."""
    rng = np.random.default_rng(seed)

    nation = pd.DataFrame({
        "n_nationkey": np.arange(6, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(6)],
        "n_regionkey": np.array([0, 0, 1, 1, 2, 2], dtype=np.int64)})
    region = pd.DataFrame({
        "r_regionkey": np.arange(3, dtype=np.int64),
        "r_name": ["REGION_0", "REGION_1", "REGION_2"]})
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(1, 6, dtype=np.int64),
        "s_name": [f"Supplier#{i}" for i in range(1, 6)],
        "s_nationkey": np.array([1, 2, 3, 3, 5], dtype=np.int64),
        "s_acctbal": np.round(rng.uniform(-100, 1000, 5), 2)})
    part = pd.DataFrame({
        "p_partkey": np.arange(1, 13, dtype=np.int64),
        "p_name": [f"part{i}" for i in range(1, 13)],
        "p_brand": rng.choice(["Brand#1", "Brand#2", "Brand#3",
                               "Brand#9"], 12).tolist(),
        "p_type": rng.choice(["PROMO", "STANDARD", "ECONOMY"],
                             12).tolist(),
        # straddle every q105 size corner
        "p_size": np.array([1, 5, 6, 10, 11, 15, 16, 30, 50, 2, 7,
                            12], dtype=np.int64)})
    n_cust = 14
    customer = pd.DataFrame({
        "c_custkey": np.arange(1, n_cust + 1, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": rng.integers(0, 6, n_cust).astype(np.int64),
        "c_acctbal": np.round(rng.uniform(-500, 5000, n_cust), 2),
        "c_mktsegment": rng.choice(["BUILDING", "MACHINERY"],
                                   n_cust).tolist()})

    n_ord = 40
    dates = pd.to_datetime(rng.integers(
        pd.Timestamp("1995-01-01").value // 10**9,
        pd.Timestamp("2001-06-01").value // 10**9, n_ord), unit="s") \
        .floor("D")
    dates = dates.to_numpy()
    # plant window boundaries
    for i, d in enumerate(["1996-01-01", "1996-03-31", "1996-04-01",
                           "1999-01-01", "1998-12-31"]):
        dates[i] = np.datetime64(d)
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_ord + 1, dtype=np.int64),
        # custkeys 13/14 never order → q15/q107 anti-join rows
        "o_custkey": rng.integers(1, n_cust - 1, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_ord).tolist(),
        "o_totalprice": np.round(rng.uniform(10, 3000, n_ord), 2),
        "o_orderdate": pd.Series(dates).astype("datetime64[us]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "3-MEDIUM", "5-LOW"], n_ord).tolist()})

    n_li = 120
    ok = rng.integers(1, n_ord + 1, n_li).astype(np.int64)
    od = orders.set_index("o_orderkey")["o_orderdate"]
    ship = (od.loc[ok].reset_index(drop=True)
            + pd.to_timedelta(rng.integers(1, 200, n_li), unit="D"))
    ship = ship.to_numpy()
    base = od.loc[ok].reset_index(drop=True).to_numpy()
    # exact lateness boundaries: +60 and +90 days, and one-late vs
    # both-late F-orders (orderkeys 1 and 2 forced below)
    ship[0] = base[0] + np.timedelta64(60, "D")
    ship[1] = base[1] + np.timedelta64(90, "D")
    ship[2] = base[2] + np.timedelta64(61, "D")
    ship[3] = base[3] + np.timedelta64(91, "D")
    qty = rng.integers(1, 51, n_li).astype(float)
    qty[:8] = [24, 23, 11, 12, 20, 21, 30, 31]  # q118/q105 corners
    disc = rng.integers(0, 11, n_li) / 100.0
    disc[:4] = [0.05, 0.07, 0.04, 0.08]         # q118 corners
    lineitem = pd.DataFrame({
        "l_orderkey": ok,
        "l_partkey": rng.integers(1, 13, n_li).astype(np.int64),
        "l_suppkey": rng.integers(1, 6, n_li).astype(np.int64),
        "l_linenumber": np.arange(n_li, dtype=np.int64),
        "l_quantity": qty,
        "l_extendedprice": np.round(rng.uniform(10, 5000, n_li), 2),
        "l_discount": disc,
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["R", "N", "A"], n_li).tolist(),
        "l_linestatus": rng.choice(["O", "F"], n_li).tolist(),
        "l_shipdate": pd.Series(ship).astype("datetime64[us]")})
    return {"nation": nation, "region": region, "supplier": supplier,
            "part": part, "customer": customer, "orders": orders,
            "lineitem": lineitem}


@pytest.mark.parametrize("seed", [3, 11])
@pytest.mark.parametrize("name", TPCH_FUZZED)
def test_fuzz_parity_tpch(name, seed, ray_session, tmp_path):
    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        RAY_QUERIES,
    )

    tables = _tpch(seed * 100 + sum(map(ord, name)) % 97)
    con = duckdb.connect()
    for tname, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / f"{tname}.parquet"))
        con.register(f"_{tname}", df)
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM _{tname}")
    got = RAY_QUERIES[name](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b), f"{name} seed={seed}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)


EMB_FUZZED = [
    "q11_embedding_topk", "q26_embedding_dup_pairs",
    "q31_embedding_topk_batch", "q32_ivf_topk",
    "q92_centroid_confusion", "q98_embedding_audit",
    "q112_semantic_outliers", "q114_lang_embedding_coherence",
    "q138_cross_label_nn",
]


def _embeddings(seed: int, with_zeros: bool = False):
    """Randomized label-clustered embeddings + a matching documents
    table: per-label gaussian clumps (stable centroid geometry for
    the confusion/outlier audits), planted near-dup pairs for q26,
    and a handful of docs/vecs without a cross-table partner so
    q114's inner join is exercised.  ``with_zeros`` plants two
    zero-norm vectors — ONLY for q98, whose oracle counts them;
    DuckDB's list_cosine_similarity ERRORS on zero vectors where the
    engine guards the norm, so the cosine queries' fuzz domain
    matches their oracle contract (the driver table has no zeros)."""
    rng = np.random.default_rng(seed)
    # d = 64 is part of the embeddings-table contract the oracles
    # encode (range(0, 64) per-dim centroids)
    n_labels, per, d = 4, 15, 64
    rows, labels = [], []
    centers = rng.standard_normal((n_labels, d)) * 3
    for li in range(n_labels):
        # noise sized so WITHIN-cluster cosines sit well below q26's
        # dup threshold (its SRP candidate generation is approximate
        # near the threshold by design — the oracle-equality domain
        # is planted tight pairs + sub-threshold background)
        m = centers[li] + 1.2 * rng.standard_normal((per, d))
        rows.extend(m)
        labels.extend([li] * per)
    m = np.vstack(rows)
    m[7] = m[3] + 0.001 * rng.standard_normal(d)   # planted near-dup
    if with_zeros:
        m[20] = 0.0
        m[41] = 0.0
    n = len(m)
    emb = pd.DataFrame({
        # ids from 0: q11/q31 derive their query vectors from the
        # low fixed ids (vec_id 0 and < 3), mirroring the driver table
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in m],
        "label": np.array(labels, dtype=np.int32)})
    docs = pd.DataFrame({
        # ids 0..n-4 match vectors; n+10.. are docless on the vec side
        "doc_id": np.concatenate([np.arange(0, n - 3),
                                  np.arange(n + 10, n + 13)]).astype(np.int64),
        "lang": rng.choice(["en", "de", "fr"], n).tolist(),
        "text": ["body"] * n})
    return emb, docs


@pytest.mark.parametrize("seed", [5, 19])
@pytest.mark.parametrize("name", EMB_FUZZED)
def test_fuzz_parity_embeddings(name, seed, ray_session, tmp_path):
    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        RAY_QUERIES,
    )

    emb, docs = _embeddings(seed * 1000 + sum(map(ord, name)) % 997,
                            with_zeros=(name == "q98_embedding_audit"))
    pq.write_table(pa.Table.from_pandas(emb, preserve_index=False),
                   str(tmp_path / "embeddings.parquet"))
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = RAY_QUERIES[name](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM emb")
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b), f"{name} seed={seed}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)
