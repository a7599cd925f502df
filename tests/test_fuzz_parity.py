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
          "q120_dup_degree_histogram", "q122_length_percentile"]

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
             "q113_late_data_drop", "q121_user_entropy"]


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
            step = int(rng.choice([0, 1, 7, 1800, 1801, 3600, 86400]))
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
