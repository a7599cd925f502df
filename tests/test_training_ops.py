"""Unit checks for the training-data pipeline operators (q33-q35).

The full Ray-vs-DuckDB parity runs in test_queries_sf0001.py; these
pin the operator-local math that parity alone would hide behind the
fixture corpus.
"""

import duckdb
import numpy as np

from event_deduplication_ray.pipelines.queries import _QUANTILES


def test_percentile_disc_formula_matches_duckdb():
    """k = (num*n + den - 1) // den must reproduce DuckDB's
    percentile_disc index for every small n (exact-decimal ceil,
    NOT float ceil — float ceil(0.99*100) = 100, DuckDB says 99)."""
    con = duckdb.connect()
    for n in list(range(1, 60)) + [100, 101, 499, 500, 997]:
        con.execute(
            f"CREATE OR REPLACE TABLE t AS SELECT unnest(range(1, {n + 1})) AS x"
        )
        for name, num, den in _QUANTILES:
            frac = num / den
            want = con.execute(
                f"SELECT percentile_disc({frac}) WITHIN GROUP (ORDER BY x) FROM t"
            ).fetchone()[0]
            k = max((num * n + den - 1) // den, 1)
            assert k == want, (n, name, k, want)


def test_scrub_pii_planted():
    """The driver corpus is PII-free, so the oracle-parity run can't
    prove the redaction itself — plant PII here and check counts,
    redaction order, and None handling."""
    import pandas as pd

    from event_deduplication_ray.functions.textstats import scrub_pii

    df = scrub_pii(pd.Series([
        "mail a.b+c@ex-1.co.uk or ping 10.0.0.1 twice 10.0.0.1",
        "clean",
        None,
        "x@y.z x@y.z",
        "an email at an ip: root@192.168.0.1",
    ]))
    assert df["n_email"].tolist() == [1, 0, 0, 2, 1]
    assert df["n_ipv4"].tolist() == [2, 0, 0, 0, 1]
    assert df["text_clean"].iloc[0] == "mail <EMAIL> or ping <IPV4> twice <IPV4>"
    assert df["text_clean"].iloc[2] == ""
    # email wins where both overlap (applied first, mirrors the oracle)
    assert df["text_clean"].iloc[4] == "an email at an ip: <EMAIL>"


def test_scrub_pii_matches_duckdb_on_planted_rows():
    """Regex-engine parity (Python re vs DuckDB RE2) on rows the
    fixture corpus can't provide."""
    import pandas as pd

    from event_deduplication_ray.functions.textstats import scrub_pii
    from event_deduplication_ray.pipelines.queries import ORACLE_SQL

    texts = [
        "a@b.cd then c@d-e.f.g end",
        "ips 1.2.3.4 99.999.9.9 and 1234.5.6.7",
        "email-at-ip root@10.0.0.1 trailing",
        "dots a.b.c.d.e@f.gh",
        None, "", "   ",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT unnest(range(7)) AS doc_id, "
                "unnest(?::VARCHAR[]) AS text", [texts])
    want = con.execute(ORACLE_SQL["q36_pii_scrub"]).fetchdf()
    got = scrub_pii(pd.Series(texts))
    assert got["text_clean"].tolist() == want["text_clean"].tolist()
    assert got["n_email"].tolist() == want["n_email"].astype(int).tolist()
    assert got["n_ipv4"].tolist() == want["n_ipv4"].astype(int).tolist()


def test_histogram_quantile_matches_duckdb_on_random_multisets():
    """The full q34 read-off (cumulative histogram + searchsorted)
    against DuckDB percentile_disc over random multisets with heavy
    ties — covers the duplicate-value paths the fixture corpus's
    mostly-unique lengths never exercise."""
    rng = np.random.default_rng(7)
    con = duckdb.connect()
    for trial in range(25):
        n = int(rng.integers(1, 400))
        vals = rng.integers(0, 12, size=n).astype(np.int64)  # many ties
        con.execute(
            "CREATE OR REPLACE TABLE t AS SELECT unnest(?::BIGINT[]) AS x",
            [vals.tolist()],
        )
        want = con.execute(
            "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY x),"
            "       percentile_disc(0.9) WITHIN GROUP (ORDER BY x),"
            "       percentile_disc(0.99) WITHIN GROUP (ORDER BY x) FROM t"
        ).fetchone()
        uniq, counts = np.unique(vals, return_counts=True)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        got = []
        for _, num, den in _QUANTILES:
            k = max((num * total + den - 1) // den, 1)
            got.append(int(uniq[np.searchsorted(cum, k)]))
        assert tuple(got) == tuple(want), (trial, n, got, want)


def test_bigram_partial_respects_doc_boundaries():
    """No bigram may span two documents: the last token of doc i and
    the first of doc i+1 never pair."""
    import pandas as pd

    from event_deduplication_ray.functions.hashing import tokenize_offsets

    texts = pd.Series(["a b c", "d e", "", "f"])
    flat, lens = tokenize_offsets(texts.str.lower())
    n = len(flat)
    start_ok = np.ones(n, dtype=bool)
    ends = np.cumsum(lens)
    start_ok[ends[lens > 0] - 1] = False
    idx = np.flatnonzero(start_ok[:-1])
    big = flat[idx] + " "
    big = big + flat[idx + 1]
    assert sorted(big) == ["a b", "b c", "d e"]


def _write_tbl(tmp_path, name, df):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def test_repetition_filter_planted(ray_session, tmp_path):
    """Hand-computed repetition fracs: 'a a a a b' → top 0.8,
    top-bigram 0.75 ('a a' 3/4), distinct 0.4; single-token doc has
    NaN bigram frac (oracle NULL); keep thresholds applied to the
    rounded values."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q39_repetition_filter

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a a b", "solo", "p q r s t u v w"],
    }))
    got = q39_repetition_filter(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["top_token_frac"].tolist() == [0.8, 1.0, 0.125]
    assert got["top_bigram_frac"].iloc[0] == 0.75
    assert np.isnan(got["top_bigram_frac"].iloc[1])
    assert got["distinct_frac"].tolist() == [0.4, 1.0, 1.0]
    assert got["keep"].tolist() == [False, False, True]


def test_chunk_dedup_planted(ray_session, tmp_path):
    """The driver corpus shares no 10-token chunks across docs, so the
    oracle-parity run only proves the no-op path — plant shared,
    partial-window, within-doc-repeated and empty cases here and check
    BOTH the hand-computed flags and full DuckDB-oracle parity."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q43_chunk_dedup,
    )

    shared = " ".join(f"w{i}" for i in range(10))       # one full chunk
    uniq = " ".join(f"u{i}" for i in range(15))         # 1.5 chunks
    rep = " ".join(f"r{i}" for i in range(10))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            shared + " " + uniq,          # 25 tok: chunks [sh, u0-9, u10-14]
            shared,                       # the shared chunk only
            "",                           # no tokens → 0 chunks
            " ".join(f"x{i}" for i in range(12)),   # 2 chunks, unique
            rep + " " + rep,              # same chunk TWICE within one doc
        ],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q43_chunk_dedup(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["n_chunks"].tolist() == [3, 1, 0, 2, 2]
    # within-doc repetition (doc 5) is NOT boilerplate (1 distinct doc)
    assert got["n_dup_chunks"].tolist() == [1, 1, 0, 0, 0]
    assert got["keep"].tolist() == [1, 0, 1, 1, 1]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL["q43_chunk_dedup"]).fetchdf()
    for c in ("doc_id", "n_chunks", "n_dup_chunks", "keep"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c


def test_quality_outliers_planted(ray_session, tmp_path):
    """z-score edge cases the fixture corpus won't pin: a single-doc
    lang (stddev 0 → z defined as 0, not NULL/inf) and a planted
    far-outlier; full DuckDB-oracle parity on the same rows."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q44_quality_outliers,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(1, 9, dtype=np.int64),
        "lang": ["en"] * 6 + ["fr"] + ["de"],
        "text": ["a" * 10] * 5 + ["a" * 100] + ["bonjour"] + [""],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q44_quality_outliers(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got.loc[got["doc_id"] == 6, "outlier"].item() == 1   # the 100-char doc
    assert (got.loc[got["doc_id"] < 6, "outlier"] == 0).all()
    # single-doc langs: sd == 0 → z = 0, not NaN
    assert got.loc[got["doc_id"] == 7, "z"].item() == 0.0
    assert got.loc[got["doc_id"] == 8, "z"].item() == 0.0

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL["q44_quality_outliers"]).fetchdf()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, atol=1e-6)


def test_curation_planted_gates(ray_session, tmp_path):
    """One doc per curation gate: a repetitive doc (rep gate), an
    exact-dup pair (dedup gate, min doc_id wins), a boilerplate-heavy
    doc (chunk gate), an empty doc (rep_keep defined = 1), and clean
    docs; full DuckDB-oracle parity on the same rows.  The z-score
    gate fires on nothing here (lengths are close) — its planted case
    lives in test_quality_outliers_planted."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q46_curation,
    )

    clean = " ".join(f"c{i}" for i in range(40))        # diverse, unique
    shared = " ".join(f"w{i}" for i in range(10))       # one shared chunk
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en"] * 6,
        "text": [
            clean,
            "spam " * 39 + "spam",    # 40x one token → rep gate drops
            clean,                    # exact dup of doc 1 → dedup gate
            shared,                   # 100% boilerplate → chunk gate
            shared + " " + " ".join(f"y{i}" for i in range(30)),  # 25% boiler → kept
            "",                       # no tokens: rep_keep=1, kept
        ],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q46_curation(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["rep_keep"].tolist() == [1, 0, 1, 1, 1, 1]
    assert got["exact_dup"].tolist() == [0, 0, 1, 0, 0, 0]
    # docs 1/3 are identical texts → every chunk of theirs occurs in
    # 2 distinct docs → the chunk gate fires on BOTH (exact dups trip
    # the boilerplate gate as well, as in a real pipeline)
    assert got["chunk_keep"].tolist() == [0, 1, 0, 0, 1, 1]
    assert got["keep"].tolist() == [0, 0, 0, 0, 1, 1]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL["q46_curation"]).fetchdf()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, atol=1e-6)


def test_funnel_boundaries(ray_session, tmp_path):
    """Funnel edges: a purchase exactly AT the first view converts
    (>=); a purchase BEFORE the first view does not count; a user
    with purchases but no view is excluded entirely."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q49_funnel

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    ev = pd.DataFrame({
        "event_id": range(1, 8),
        "ts": [t0, t0,                          # u1: view + purchase AT t0
               t0, t0 - pd.Timedelta("1h"),     # u2: purchase BEFORE view
               t0, t0 + pd.Timedelta("90s"),    # u3: converts in 90 s
               t0],                             # u4: purchase, never views
        "user_id": [1, 1, 2, 2, 3, 3, 4],
        "event_type": ["view", "purchase", "view", "purchase",
                       "view", "purchase", "purchase"],
        "value": [1.0] * 7,
        "props": [""] * 7,
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q49_funnel(sf).to_pandas().set_index("user_id").sort_index()
    assert got.index.tolist() == [1, 2, 3]      # u4 has no view
    assert got["converted"].tolist() == [1, 0, 1]
    assert got.loc[1, "secs_to_convert"] == 0.0
    assert np.isnan(got.loc[2, "secs_to_convert"])
    assert got.loc[3, "secs_to_convert"] == 90.0


def test_asof_anchor_tie_and_boundary(ray_session, tmp_path):
    """Equal-ts anchors resolve to max event_id; an event AT the
    anchor ts matches it (<=); events before any anchor drop."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q40_event_asof_anchor

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [t0, t0, t0 + pd.Timedelta("1h"),
               t0 - pd.Timedelta("1h"), t0, t0 + pd.Timedelta("2h")],
        "user_id": [7, 7, 7, 7, 7, 8],
        "event_type": ["purchase", "purchase", "view",
                       "view", "view", "view"],
        "value": [1.0] * 6,
        "props": [""] * 6,
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q40_event_asof_anchor(sf).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    # event 4 precedes every anchor → dropped; user 8 has none → dropped
    assert got["event_id"].tolist() == [1, 2, 3, 5]
    assert got["anchor_id"].tolist() == [2, 2, 2, 2]


def test_rolling_window_boundary_and_peers(ray_session, tmp_path):
    """RANGE frame semantics: a row exactly 7 days back is IN the
    frame; equal-ts peers share one frame (each counts the other)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q41_rolling_user_window

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "ts": [t0, t0 + pd.Timedelta(days=7), t0 + pd.Timedelta(days=7),
               t0 + pd.Timedelta(days=7, microseconds=1),
               t0 + pd.Timedelta(days=3)],
        "user_id": [1, 1, 1, 1, 2],
        "event_type": ["view"] * 5,
        "value": [1.0, 10.0, 100.0, 1000.0, 5.0],
        "props": [""] * 5,
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q41_rolling_user_window(sf).to_pandas().set_index("event_id")
    assert got.loc[1, "n_7d"] == 1 and got.loc[1, "sum_7d"] == 1.0
    # peers at t0+7d: both see {1, 2, 3} (boundary row included)
    assert got.loc[2, "n_7d"] == 3 and got.loc[2, "sum_7d"] == 111.0
    assert got.loc[3, "n_7d"] == 3 and got.loc[3, "sum_7d"] == 111.0
    # one µs later: boundary row 1 falls out of the frame
    assert got.loc[4, "n_7d"] == 3 and got.loc[4, "sum_7d"] == 1110.0
    assert got.loc[5, "n_7d"] == 1 and got.loc[5, "sum_7d"] == 5.0


def test_neardup_decontaminate_planted(ray_session, tmp_path):
    """q54: plant an exact copy and a one-token-edit near-dup of a
    TEST doc (doc_id % 10 == 0) into the train side → both flagged;
    an unrelated doc, a heavy rewrite (true Jaccard ≪ 0.75) and an
    empty doc stay clean.  Every train doc gets exactly one row."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q54_neardup_decontaminate,
    )

    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(400)]
    base = list(rng.choice(words, size=120))
    near = list(base)
    near[60] = "EDITED"                     # 1/120 tokens → J ≈ 0.92
    heavy = list(base)
    heavy[::2] = rng.choice(words, size=len(heavy[::2]))   # ~50 % rewrite
    other = list(rng.choice(words, size=120))
    test2 = list(rng.choice(words, size=120))

    docs = pd.DataFrame({
        "doc_id": [10, 20, 11, 12, 13, 14, 21],
        "text": [" ".join(base), " ".join(test2),      # test side
                 " ".join(near), " ".join(other),
                 " ".join(base), "", " ".join(heavy)],  # train side
        "lang": ["en"] * 7,
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = (q54_neardup_decontaminate(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [11, 12, 13, 14, 21]
    flags = dict(zip(got["doc_id"], got["contaminated"]))
    assert flags[11] == 1, "one-token near-dup of a test doc must flag"
    assert flags[13] == 1, "exact copy of a test doc must flag"
    assert flags[12] == 0 and flags[21] == 0 and flags[14] == 0


def test_normalized_dedup_planted(ray_session, tmp_path):
    """The driver corpus has no normalized duplicates, so the q59
    oracle parity is trivially green — plant reformatted copies here:
    case/punct/whitespace variants collapse to one group, a real
    content change does not."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q59_normalized_dedup

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [5, 2, 3, 4, 1],
        "text": ["Hello, World!", "hello   world", "HELLO-WORLD",
                 "hello worlds",            # real difference survives
                 "  hello world  "],
    }))
    got = (q59_normalized_dedup(sf).to_pandas()
           .sort_values("rep_doc_id").reset_index(drop=True))
    assert got["rep_doc_id"].tolist() == [1, 4]
    assert dict(zip(got["rep_doc_id"], got["n_copies"])) == {1: 4, 4: 1}


def test_first_events_tie_break(ray_session, tmp_path):
    """Equal-timestamp events must resolve by smallest event_id, and
    the per-batch partial must not lose the cross-batch minimum (two
    rows far apart in doc order share a key)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q58_first_events

    ts = pd.Timestamp("2024-01-05 12:00:00")
    ev = pd.DataFrame({
        "event_id": [9, 3, 7, 1],
        "ts": [ts, ts, ts - pd.Timedelta("1h"), ts + pd.Timedelta("1h")],
        "user_id": [1, 1, 2, 2],
        "event_type": ["view", "view", "click", "click"],
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q58_first_events(sf)
    assert got["event_id"].tolist() == [3, 7]
    assert got["ts"].iloc[0] == "2024-01-05 12:00:00.000000"


def test_line_filter_planted(ray_session, tmp_path):
    """Line-gate semantics on hand-built docs: short lines, code-smell
    '{' lines and punctuation-less short paragraphs drop; terminal
    punctuation or a >=20-token paragraph keeps; trailing spaces are
    trimmed before the end-punctuation check."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q63_line_filter

    long_para = " ".join(["tok"] * 20)                       # kept (>=20)
    doc1 = "\n".join([
        "This line ends with a period.",                     # kept
        "short line",                                        # 2 toks: drop
        "code block { return 0; }",                          # '{': drop
        "four tokens no punctuation",                        # drop
        long_para,                                           # kept
        'He said "stop right there!"   ',                    # kept (trim)
    ])
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2], "text": [doc1, ""],
    }))
    got = q63_line_filter(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["n_lines"].tolist() == [6, 1]
    assert got["n_kept"].tolist() == [3, 0]
    assert got["kept_chars"].iloc[0] == (
        len("This line ends with a period.") + len(long_para)
        + len('He said "stop right there!"'))
    assert got["kept_chars"].iloc[1] == 0


def test_bigram_lm_planted(ray_session, tmp_path):
    """Hand-computed add-one bigram LM: corpus 'a b' + 'a b c' + 'x'
    → V=4, c(a)=2, c(b)=2, c(a b)=2, c(b c)=1; doc1 score
    ln(3/6); doc2 avg(ln(3/6), ln(2/6)); the 1-token doc is excluded
    (no bigrams)."""
    import math

    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q64_bigram_lm

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["a b", "a b c", "x"],
    }))
    got = q64_bigram_lm(sf)
    assert got["doc_id"].tolist() == [1, 2]
    assert got["n_bigrams"].tolist() == [1, 2]
    assert got["lm_score"].iloc[0] == round(math.log(3 / 6), 6)
    assert got["lm_score"].iloc[1] == round(
        (math.log(3 / 6) + math.log(2 / 6)) / 2, 6)


def test_pack_sequences_invariants(ray_session, tmp_path):
    """Greedy packing invariants on a mixed corpus: every pack within
    budget unless it is a single oversized doc; doc order preserved
    inside each lang (pack ids non-decreasing with doc_id); packing
    is maximal (the first doc of pack k+1 would not have fit in pack
    k); oversized docs isolated."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q66_pack_sequences

    rng = np.random.default_rng(7)
    n = 300
    toks = rng.integers(1, 200, size=n)
    toks[10] = 900                                 # oversized singleton
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.where(np.arange(n) % 3 == 0, "en", "de"),
        "text": [" ".join(["w"] * int(t)) for t in toks],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q66_pack_sequences(sf)
    assert len(got) == n
    budget = 512
    for lang, g in got.groupby("lang"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # order preserved: pack ids non-decreasing in doc order
        assert (g["pack_id"].diff().fillna(0) >= 0).all()
        sizes = g.groupby("pack_id")["n_tok"].sum()
        counts = g.groupby("pack_id")["n_tok"].size()
        over = sizes[sizes > budget]
        assert (counts.loc[over.index] == 1).all()   # only singletons overflow
        # maximality: first doc of each later pack would overflow previous
        firsts = g.groupby("pack_id").head(1).set_index("pack_id")["n_tok"]
        for pid in sizes.index[1:]:
            assert sizes.loc[pid - 1] + firsts.loc[pid] > budget
    assert (got.loc[got["doc_id"] == 10, "n_tok"] == 900).all()
    solo = got[got["doc_id"] == 10]
    same_pack = got[(got["lang"] == solo["lang"].iloc[0])
                    & (got["pack_id"] == solo["pack_id"].iloc[0])]
    assert len(same_pack) == 1


def test_head_dedup_priority_keep(ray_session, tmp_path):
    """Two docs sharing an 8-token head must resolve to the LOWER
    source number (src2 beats src10 numerically), doc_id breaking
    ties; distinct heads stay separate."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q67_head_dedup

    head = "alpha beta gamma delta epsilon zeta eta theta"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [5, 3, 9],
        "source": ["src10", "src2", "src1"],
        "text": [head + " tail one", head + " tail two", "different " + head],
    }))
    got = q67_head_dedup(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [3, 9]
    assert got.loc[got["doc_id"] == 3, "n_group"].iloc[0] == 2
    assert got.loc[got["doc_id"] == 3, "source"].iloc[0] == "src2"


def test_top_bigrams_mg_vs_exact(ray_session):
    """Misra-Gries top-bigrams vs the exact q35 counts at sf0.001:
    every key the sketch reports must satisfy est <= true <= est +
    err_bound, and with the 4096-counter cap the corpus fits without
    decrements (err_bound == 0) so the top-20 must match exactly."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q35_top_bigrams,
        q69_top_bigrams_mg,
    )

    sf = "/root/testdata/sf0.001"
    exact = q35_top_bigrams(sf).set_index("ngram")["n"]
    mg = q69_top_bigrams_mg(sf)
    assert (mg["err_bound"] >= 0).all()
    err = int(mg["err_bound"].iloc[0])
    for row in mg.itertuples(index=False):
        if row.ngram in exact.index:
            true = int(exact.loc[row.ngram])
            assert row.n_est <= true <= row.n_est + err
    if err == 0:
        got = mg[["ngram", "n_est"]].rename(columns={"n_est": "n"})
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            q35_top_bigrams(sf).reset_index(drop=True))


def test_top_bigrams_mg_decrement_bound(ray_session, tmp_path):
    """Force decrements: a tiny cap is monkeypatched via a skewed
    corpus whose distinct-bigram count exceeds 4096 is impractical at
    unit scale, so instead plant one dominant bigram among noise and
    assert the heavy hitter survives with est <= true."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q69_top_bigrams_mg

    rng = np.random.default_rng(3)
    noise = [" ".join(f"w{v}" for v in rng.integers(0, 5000, size=12))
             for _ in range(400)]
    heavy = ["hot pair " * 6] * 50         # 'hot pair'/'pair hot' dominate
    docs = pd.DataFrame({
        "doc_id": np.arange(450, dtype=np.int64),
        "text": noise + heavy,
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    mg = q69_top_bigrams_mg(sf)
    assert "hot pair" in set(mg["ngram"])
    est = int(mg.loc[mg["ngram"] == "hot pair", "n_est"].iloc[0])
    true = 50 * 6  # 'hot pair' bigrams per doc: positions 1,3,5,7,9,11
    assert est <= true <= est + int(mg["err_bound"].iloc[0])


def test_global_rank_tie_and_ntile(ray_session, tmp_path):
    """Ties on n_chars resolve by doc_id; ntile with n=10, k=8 puts 2
    rows in buckets 1-2 and 1 in each of 3-8 (first n%k buckets get
    ceil(n/k))."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q68_global_rank

    docs = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64)[::-1],   # reversed ids
        "text": ["x"] * 10,
        "n_chars": np.int64([5, 5, 5, 1, 1, 9, 9, 9, 9, 2]),
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q68_global_rank(sf).sort_values("rnk").reset_index(drop=True)
    # rank order: n_chars asc, doc_id asc
    want_order = sorted(zip(docs["n_chars"], docs["doc_id"]))
    assert list(zip(got["n_chars"], got["doc_id"])) == want_order
    assert got["bucket"].tolist() == [1, 1, 2, 2, 3, 4, 5, 6, 7, 8]


def test_rolling_distinct_window_boundaries(ray_session, tmp_path):
    """Sparse-day corpus: a user active on day 1 counts toward an
    observed day exactly 6 days later but not 7; unobserved days in
    between produce NO rows; same-user repeats within the window
    count once."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q70_rolling_distinct

    ev = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-03-01 10:00", "2024-03-01 11:00",   # u1 twice on day 1
            "2024-03-07 09:00",                        # u2, exactly +6
            "2024-03-08 09:00",                        # u3, +7 from day 1
        ]),
        "user_id": np.int64([1, 1, 2, 3]),
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q70_rolling_distinct(sf)
    assert got["day"].tolist() == ["2024-03-01", "2024-03-07", "2024-03-08"]
    # 03-07 window [03-01..03-07] holds u1+u2; 03-08 window drops u1
    assert got["wau"].tolist() == [1, 2, 2]


def test_vocab_rank_and_cutoff(ray_session, tmp_path):
    """min-count 5 drops rare tokens; ids are dense by (freq desc,
    token asc) with ties broken lexicographically."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q71_vocab

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["b b b b b a a a a a c c c c c rare",
                 "a a a b b b z z z z z"],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q71_vocab(sf)
    # freqs: a=8, b=8, c=5, z=5, rare=1 (dropped)
    assert got["token"].tolist() == ["a", "b", "c", "z"]
    assert got["freq"].tolist() == [8, 8, 5, 5]
    assert got["token_id"].tolist() == [1, 2, 3, 4]


def test_chunk_windows_boundaries(ray_session, tmp_path):
    """Window math at the edges: n=64 → one full window; n=65 → two
    (second holds 17 tokens: 65-48); n=113 → three; n=0 → one empty
    window; overlap region repeats tokens 49..64."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q72_chunk_windows

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [words(64, "a"), words(65, "b"), words(113, "c"), ""],
    }))
    got = q72_chunk_windows(sf).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    per = got.groupby("doc_id")["chunk_idx"].size()
    assert per.loc[1] == 1 and per.loc[2] == 2
    assert per.loc[3] == 3 and per.loc[4] == 1
    assert got.loc[(got.doc_id == 2) & (got.chunk_idx == 1),
                   "n_tok"].iloc[0] == 17
    # overlap: second window of doc 2 starts at token 48 (0-based)
    t = got.loc[(got.doc_id == 2) & (got.chunk_idx == 1),
                "chunk_text"].iloc[0]
    assert t.startswith("b48 ") and t.endswith("b64")
    assert got.loc[got.doc_id == 4, "n_tok"].iloc[0] == 0
    assert got.loc[got.doc_id == 4, "chunk_text"].iloc[0] == ""


def test_order_count_histogram_zero_bin(ray_session, tmp_path):
    """The k=0 bin must appear when a customer has no orders — the
    driver corpus has none (q15 is empty there), so the arithmetic
    zero-bin path only runs here.  cust 1 → 3 orders, cust 2 → 1,
    cust 3 → 0."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q74_order_count_histogram,
    )

    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [1, 2, 3]}))
    sf = _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [10, 11, 12, 13],
        "o_custkey": [1, 1, 1, 2]}))
    got = q74_order_count_histogram(sf)
    assert list(zip(got["c_count"], got["custdist"])) == [
        (3, 1), (1, 1), (0, 1)]


def test_priority_shipments_planted(ray_session, tmp_path):
    """Conditional-agg split: order 1 is 1-URGENT (high), order 2 is
    5-LOW; lineitems land in two ship months.  2024-01 sees 2 high +
    1 low lines, 2024-02 sees 1 high + 0 low."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q75_priority_shipments,
    )

    _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderpriority": ["1-URGENT", "5-LOW"]}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_orderkey": [1, 1, 2, 1],
        "l_shipdate": pd.to_datetime([
            "2024-01-03", "2024-01-20", "2024-01-21", "2024-02-02",
        ]).astype("datetime64[us]")}))
    got = q75_priority_shipments(sf)
    assert got.values.tolist() == [["2024-01", 2, 1], ["2024-02", 1, 0]]


def test_user_running_total_planted(ray_session, tmp_path):
    """Running-total semantics pinned by hand: cents are FLOORED per
    event before accumulating (1.005 → 100, not 101; -0.011 → -2),
    equal timestamps order by event_id, and seq restarts per user."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q76_user_running_total,
    )

    ts = pd.Timestamp("2024-05-01 08:00:00")
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": [5, 2, 9, 1],
        "ts": pd.Series([ts, ts, ts + pd.Timedelta("1h"), ts]
                        ).astype("datetime64[us]"),
        "user_id": [1, 1, 1, 2],
        "value": [1.005, 2.999, 10.0, -0.011]}))
    got = q76_user_running_total(sf)
    # user 1: event 2 (ts tie, smaller id) → 299; event 5 → +100;
    # event 9 (later ts) → +1000
    assert got[got.user_id == 1]["event_id"].tolist() == [2, 5, 9]
    assert got[got.user_id == 1]["cum_cents"].tolist() == [299, 399, 1399]
    assert got[got.user_id == 1]["seq"].tolist() == [1, 2, 3]
    assert got[got.user_id == 2]["cum_cents"].tolist() == [-2]
    assert got[got.user_id == 2]["seq"].tolist() == [1]


def test_bpe_token_counts_planted(ray_session, tmp_path):
    """Each alternation branch of the BPE-ish pattern exercised by
    hand-counted strings: contractions split ('s/'t), leading-space
    fusion, digit runs, punctuation runs, bare whitespace runs, and
    the double-space case where the whitespace branch must absorb the
    run the letter branch can't."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q77_bpe_token_counts,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["it's 2 cats!!  ok", "hello world", "a1b", "",
                 "a\tb\nc", "don't stop-me now's"]}))
    got = q77_bpe_token_counts(sf)
    assert got["n_bpe_tokens"].tolist() == [7, 2, 3, 0, 5, 7]


def test_line_dedup_rewrite_planted(ray_session, tmp_path):
    """Rewrite semantics pinned by hand: a >=5-token line repeated
    across docs keeps only its first (doc_id, line_idx) occurrence —
    including a within-doc repeat — short dup lines always stay, and
    a doc made entirely of dropped lines rewrites to ''."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q78_line_dedup_rewrite,
    )

    boiler = "this exact boilerplate line repeats everywhere verbatim"
    short = "tiny line"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"{boiler}\nunique alpha words here today\n{boiler}",
            f"{short}\n{boiler}\nanother unique beta sentence here",
            boiler,
            f"{short}\n{short}",
        ]}))
    got = (q78_line_dedup_rewrite(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 1 keeps the FIRST boiler occurrence, drops its own repeat
    assert got.loc[0, "clean_text"] == f"{boiler}\nunique alpha words here today"
    assert got.loc[0, "n_dropped"] == 1
    # doc 2 loses boiler but keeps the short line
    assert got.loc[1, "clean_text"] == f"{short}\nanother unique beta sentence here"
    assert got.loc[1, "n_dropped"] == 1
    # doc 3 was only the boiler → rewrites to empty
    assert got.loc[2, "clean_text"] == "" and got.loc[2, "n_dropped"] == 1
    # short dup lines are never deduped
    assert got.loc[3, "clean_text"] == f"{short}\n{short}"
    assert got.loc[3, "n_dropped"] == 0


def test_oov_rate_planted(ray_session, tmp_path):
    """Vocab cutoff and ppm arithmetic by hand: 'a' occurs 7 times
    (in-vocab), 'z' and 'b' once (OOV); ppm is exact int64 floor
    division."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q79_oov_rate

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a", "a a a a z", "b"]}))
    got = q79_oov_rate(sf)
    assert got["n_tok"].tolist() == [3, 5, 1]
    assert got["n_oov"].tolist() == [0, 1, 1]
    assert got["oov_ppm"].tolist() == [0, 200000, 1000000]


def test_top_bigrams_cms_brackets_exact(ray_session):
    """MG + CMS composition: for every reported bigram the TRUE count
    (exact q35) must satisfy n_est (MG, underestimate) <= true <=
    n_cms (CMS, overestimate)."""
    from event_deduplication_ray.pipelines.queries import (
        q35_top_bigrams, q81_top_bigrams_cms,
    )

    sf = "/root/testdata/sf0.001"
    exact = q35_top_bigrams(sf).set_index("ngram")["n"]
    got = q81_top_bigrams_cms(sf)
    assert len(got) > 0
    for _, row in got.iterrows():
        true = int(exact.get(row["ngram"], 0)) or None
        if true is None:
            # MG may surface a key below q35's top-k cutoff; the
            # bracket still must hold against the CMS overestimate
            assert row["n_est"] <= row["n_cms"]
            continue
        assert row["n_est"] <= true <= row["n_cms"], row["ngram"]


def test_dsir_weights_planted(ray_session, tmp_path):
    """Directionality pinned by hand: a doc phrased like the English
    target subset must out-score a doc phrased like the off-target
    rest, and a target-set member scores positive on its own
    phrasing."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q82_dsir_weights

    en = "the quick brown fox jumps over the lazy dog again today"
    de = "der schnelle braune fuchs springt heute wieder darüber hinweg"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en", "en", "en", "de", "de", "de"],
        "text": [en, en, "the quick brown fox jumps", de, de,
                 "der schnelle braune fuchs springt"]}))
    got = q82_dsir_weights(str(tmp_path)).set_index("doc_id")
    # en-phrased probe (doc 3) beats the de-phrased probe (doc 6)
    assert got.loc[3, "dsir_logratio"] > got.loc[6, "dsir_logratio"]
    # target members score above off-target members
    assert got.loc[1, "dsir_logratio"] > got.loc[4, "dsir_logratio"]


def test_value_quantiles_planted(ray_session, tmp_path):
    """Cents-histogram exactness on a hand-built distribution,
    including a float-hostile cent (6.55*100 = 655.0000000000001 must
    round, not floor) and the p99 read-off at small n."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q83_value_quantiles

    vals = [6.55] * 5 + [1.0] * 4 + [100.25]
    ts = pd.Timestamp("2024-01-01")
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": range(1, 11),
        "ts": pd.Series([ts] * 10).astype("datetime64[us]"),
        "user_id": [1] * 10,
        "event_type": ["view"] * 10,
        "value": vals}))
    got = q83_value_quantiles(str(tmp_path))
    assert got.loc[0, "p50"] == 6.55     # ceil(0.5*10)=5th of sorted
    assert got.loc[0, "p90"] == 6.55     # 9th
    assert got.loc[0, "p99"] == 100.25   # ceil(9.9)=10th


def test_customer_order_counts_left_join(ray_session, tmp_path):
    """Row-level outer-join semantics: order-less customers appear
    with n_orders = 0, counts aggregate across split orders."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q84_customer_order_counts,
    )

    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_name": ["a", "b", "c"]}))
    sf = _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 1, 3]}))
    got = q84_customer_order_counts(sf)
    assert got["n_orders"].tolist() == [2, 0, 1]


def test_promo_share_planted(ray_session, tmp_path):
    """Ratio-of-sums semantics by hand: one PROMO and one STANDARD
    part in one month → share = promo revenue / total, computed in
    exact integer units (10.00 * 0.90 discount handled)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q85_promo_revenue_share,
    )

    _write_tbl(tmp_path, "part", pd.DataFrame({
        "p_partkey": [1, 2],
        "p_type": ["PROMO", "STANDARD"]}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_partkey": [1, 2, 1],
        "l_shipdate": pd.to_datetime(
            ["2024-01-05", "2024-01-09", "2024-02-01"]
        ).astype("datetime64[us]"),
        "l_extendedprice": [10.0, 30.0, 5.0],
        "l_discount": [0.10, 0.0, 0.0]}))
    got = q85_promo_revenue_share(sf)
    jan = got[got.ship_month == "2024-01"].iloc[0]
    assert jan["promo_rev"] == 9.0 and jan["total_rev"] == 39.0
    assert jan["promo_share"] == round(9.0 / 39.0, 6)
    feb = got[got.ship_month == "2024-02"].iloc[0]
    assert feb["promo_share"] == 1.0


def test_top_orders_per_segment_partial_safe(ray_session, tmp_path):
    """Grouped top-k: the global winner must survive even when a
    batch-local top-k would have evicted it (two heavy orders in one
    segment placed far apart in row order), ties break on orderkey."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q86_top_orders_per_segment,
    )

    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [1, 2],
        "c_mktsegment": ["A", "B"]}))
    sf = _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5, 6],
        "o_custkey": [1, 1, 1, 1, 2, 2],
        "o_totalprice": [50.0, 10.0, 20.0, 50.0, 7.0, 7.0]}))
    got = q86_top_orders_per_segment(sf)
    a = got[got.c_mktsegment == "A"]
    assert a["o_orderkey"].tolist() == [1, 4, 3]  # 50-tie → key asc, then 20
    assert a["rk"].tolist() == [1, 2, 3]
    b = got[got.c_mktsegment == "B"]
    assert b["o_orderkey"].tolist() == [5, 6]     # k=3 but only 2 orders


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Cohort arithmetic by hand: user 1 first active day D, returns
    D+2; user 2 first active D (same cohort); user 3 cohorts at D+1;
    midnight-boundary event (23:59 vs 00:01) lands on the next day."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q87_retention_cohorts,
    )

    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": range(1, 6),
        "ts": pd.to_datetime([
            "2024-03-01 10:00", "2024-03-03 09:00",   # user 1: D, D+2
            "2024-03-01 23:59",                       # user 2: D
            "2024-03-02 00:01", "2024-03-02 12:00",   # user 3: D+1 twice
        ]).astype("datetime64[us]"),
        "user_id": [1, 1, 2, 3, 3]}))
    got = q87_retention_cohorts(sf)
    rows = {(r.cohort_day, r.day_offset): r.n_users
            for r in got.itertuples()}
    assert rows == {("2024-03-01", 0): 2, ("2024-03-01", 2): 1,
                    ("2024-03-02", 0): 1}


def test_event_cooccurrence_planted(ray_session, tmp_path):
    """Unordered-pair semantics: duplicate events don't double-count
    a user, pairs are canonical (a < b), users with one type emit
    nothing."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q88_event_type_cooccurrence,
    )

    ts = pd.Timestamp("2024-01-01")
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": range(1, 7),
        "ts": pd.Series([ts] * 6).astype("datetime64[us]"),
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_type": ["view", "view", "click", "click", "view", "error"]}))
    got = q88_event_type_cooccurrence(sf)
    assert got.values.tolist() == [["click", "view", 2]]


def test_token_and_search_planted(ray_session, tmp_path):
    """AND semantics pinned by hand: the two globally most frequent
    tokens are 'aa' and 'bb' (tie broken lexicographically against
    'cc' at equal freq); only docs containing BOTH qualify."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q89_token_and_search,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["aa bb aa", "aa aa bb cc", "aa cc", "bb"]}))
    # freqs: aa=5, bb=3, cc=2 → query = [aa, bb]
    got = q89_token_and_search(sf)
    assert got["doc_id"].tolist() == [1, 2]


def test_token_index_build_and_search(ray_session, tmp_path):
    """Posting-list index: AND serving equals per-doc containment, OR
    unions, shard pruning reads only the query terms' shard dirs."""
    import os

    import pandas as pd
    import ray.data as rd

    from event_deduplication_ray.stages import textindex as TI

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["aa bb cc", "aa bb", "aa", "dd bb"]})
    idx = str(tmp_path / "tok_idx")
    TI.token_index_build(rd.from_pandas(docs), idx)

    got_and = TI.token_index_search(idx, ["aa", "bb"], mode="and")
    assert got_and["doc_id"].tolist() == [1, 2]
    got_or = TI.token_index_search(idx, ["cc", "dd"], mode="or")
    assert got_or["doc_id"].tolist() == [1, 4]
    # case folding + dedup of the terms list
    assert TI.token_index_search(idx, ["AA", "aa"], mode="and")[
        "doc_id"].tolist() == [1, 2, 3]
    # pruning: the paths consulted for one term are a strict subset
    shard_dirs = [d for d in os.listdir(idx) if d.startswith("tok_shard=")]
    one = TI._token_shards(__import__("numpy").asarray(["aa"], object),
                           TI.N_SHARDS_DEFAULT)
    assert len(TI._shard_paths(idx, set(one.tolist()))) < sum(
        len(os.listdir(os.path.join(idx, d))) for d in shard_dirs)
    # unknown term → empty
    assert len(TI.token_index_search(idx, ["zz", "aa"], mode="and")) == 0


def test_dup_cluster_sizes_planted(ray_session, tmp_path):
    """Histogram semantics on planted exact-dup structure: a 3-clone
    group, a 2-clone group and 2 singletons → sizes {3:1, 2:1, 1:2};
    total mass equals the doc count."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q91_dup_cluster_sizes,
    )

    tri = ("exactly the same boilerplate paragraph repeated verbatim "
           "across three different hosts today")
    duo = ("another shared press release body that two outlets "
           "published without any edits at all")
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "lang": ["en"] * 7,
        "source": ["s"] * 7,
        "text": [tri, tri, tri, duo, duo,
                 "a fully unique document about gardening tips",
                 "a second unique document on winter cycling routes"]}))
    got = q91_dup_cluster_sizes(sf)
    rows = dict(zip(got["cluster_size"], got["n_clusters"]))
    assert rows == {1: 2, 2: 1, 3: 1}
    assert int((got["cluster_size"] * got["n_clusters"]).sum()) == 7


def test_centroid_confusion_planted(ray_session, tmp_path):
    """Geometry by hand: two orthogonal 4-dim blobs assign perfectly;
    a mislabeled vector pointing at the other blob lands in the
    off-diagonal cell."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.queries import (
        q92_centroid_confusion,
    )

    vecs = [
        (0, [1.0, 0.0, 0.05, 0.0]),
        (0, [0.9, 0.1, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.1]),
        (1, [0.0, 0.05, 0.9, 0.0]),
        (0, [0.0, 0.0, 1.0, 0.0]),   # mislabeled → assigned 1
    ]
    t = pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "label": pa.array([v[0] for v in vecs], pa.int32()),
        "embedding": pa.array([np.asarray(v[1], np.float32)
                               for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = q92_centroid_confusion(str(tmp_path))
    cells = {(r.label, r.assigned_label): r.n for r in got.itertuples()}
    assert cells == {(0, 0): 2, (0, 1): 1, (1, 1): 2}


def test_gopher_rules_planted(ray_session, tmp_path):
    """Each Gopher rule flipped by one hand-built doc: a good doc
    passes all; too-short fails rule_words; long-token spam fails
    rule_wordlen; '#'-dense fails rule_symbol; bullet-wall fails
    rule_bullets; ellipsis-wall fails rule_ellipsis; digit soup fails
    rule_alpha; stopword-free fails rule_stop."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q93_gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and then "
            "rests with great joy because that was a fine effort "
            "to have made today ") * 3          # 84 words, stopwords rich
    short = "the dog and that have with be of"  # 8 words
    longtok = " ".join(["the", "of", "and"] + [
        "supercalifragilistic" * 3] * 60)       # mean len > 10
    symbols = ("the of and " + "# " * 40) + "word " * 40  # sym ratio > 0.1
    bullets = "\n".join(["- the item of and"] * 10)       # 100 % bullets
    ellipsis = "\n".join(["the story of and trails off..."] * 10)
    digits = "the of " + " ".join(str(i) for i in range(80))
    nostop = "word " * 60
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": list(range(1, 9)),
        "text": [good, short, longtok, symbols, bullets, ellipsis,
                 digits, nostop]}))
    got = q93_gopher_rules(sf).set_index("doc_id")
    assert got.loc[1, "keep"] == 1
    assert got.loc[2, "rule_words"] == 0
    assert got.loc[3, "rule_wordlen"] == 0
    assert got.loc[4, "rule_symbol"] == 0
    assert got.loc[5, "rule_bullets"] == 0
    assert got.loc[6, "rule_ellipsis"] == 0
    assert got.loc[7, "rule_alpha"] == 0
    assert got.loc[8, "rule_stop"] == 0
    # each failing doc is rejected overall
    assert got.loc[2:, "keep"].sum() == 0


def test_new_ops_tolerate_empty_tables(ray_session, tmp_path):
    """Zero-row inputs must produce zero-row (or empty-histogram)
    results, not schema crashes — the bug class q49's NaT fix came
    from.  Runs every session-8+ documents/events operator against
    an empty table of the right schema."""
    import pandas as pd

    from event_deduplication_ray.pipelines import queries as Q

    docs = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                         "lang": pd.Series(dtype="object"),
                         "source": pd.Series(dtype="object"),
                         "text": pd.Series(dtype="object")})
    _write_tbl(tmp_path, "documents", docs)
    ev = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                       "ts": pd.Series(dtype="datetime64[us]"),
                       "user_id": pd.Series(dtype="int64"),
                       "event_type": pd.Series(dtype="object"),
                       "value": pd.Series(dtype="float64")})
    sf = _write_tbl(tmp_path, "events", ev)

    for name in ["q77_bpe_token_counts", "q78_line_dedup_rewrite",
                 "q79_oov_rate", "q82_dsir_weights", "q89_token_and_search",
                 "q93_gopher_rules", "q76_user_running_total",
                 "q83_value_quantiles", "q87_retention_cohorts",
                 "q88_event_type_cooccurrence", "q166_novelty",
                 "q167_template_dedup", "q168_overlap_stitch",
                 "q169_stitch_rewrite", "q170_corpus_growth",
                 "q171_source_uniqueness"]:
        got = Q.RAY_QUERIES[name](sf)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        assert len(got) == 0, name
    # q172 on an empty events table reports zero estimates, not rows
    got = Q.RAY_QUERIES["q172_audience_overlap_hll"](sf)
    assert got["n_both_est"].tolist() == [0]


def test_late_orders_semi_join_planted(ray_session, tmp_path):
    """EXISTS semantics by hand: one late lineitem marks the whole
    order once (no multiplicity), on-time-only orders don't count,
    the 90-day boundary is strict (exactly +90 days is NOT late)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q94_late_orders_by_priority,
    )

    od = pd.Timestamp("2024-01-01")
    _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": pd.Series([od] * 3).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"]}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 3],
        "l_shipdate": pd.Series([
            od + pd.Timedelta(days=91),   # late
            od + pd.Timedelta(days=120),  # late again (counted once)
            od + pd.Timedelta(days=5),
            od + pd.Timedelta(days=90),   # boundary: NOT late
            od + pd.Timedelta(days=200),  # late
        ]).astype("datetime64[us]")}))
    got = q94_late_orders_by_priority(sf)
    assert got.values.tolist() == [["1-URGENT", 1], ["5-LOW", 1]]


def test_weighted_sample_bias(ray_session, tmp_path):
    """A-Res semantics: with one doc carrying ~all the weight, it must
    be selected; zero-token docs never appear; statistical bias check
    over many tiny corpora — heavy docs win far more often than light
    ones (deterministic given the fixed hash, so the assertion is
    stable)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q95_weighted_sample

    heavy_hits, light_hits = 0, 0
    for base in range(0, 4000, 40):
        docs = pd.DataFrame({
            "doc_id": [base + 1, base + 2, base + 3],
            "text": ["w " * 400, "w", ""]})
        sf = _write_tbl(tmp_path, "documents", docs)
        got = q95_weighted_sample(sf)
        # only 2 docs have tokens; k=10 keeps both — check ORDER
        assert got["doc_id"].tolist()[0] in (base + 1, base + 2)
        assert (base + 3) not in got["doc_id"].tolist()
        if got["doc_id"].iloc[0] == base + 1:
            heavy_hits += 1
        else:
            light_hits += 1
    # 400:1 weights → the heavy doc should rank first ~99% of trials
    assert heavy_hits >= 90 and heavy_hits + light_hits == 100


def test_value_quantiles_kll_rank_error_bounded(ray_session):
    """The KLL path guarantees RANK error, not value error (a 2% rank
    slice of a heavy tail can span a wide value range): for every
    (type, quantile) the approx value's rank among the exact sorted
    values must sit within 2.5% · n of the target rank."""
    import numpy as np
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.queries import (
        q96_value_quantiles_kll,
    )

    sf = "/root/testdata/sf0.01"
    approx = q96_value_quantiles_kll(sf).set_index("event_type")
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for et, sub in ev.groupby("event_type"):
        srt = np.sort(sub["value"].to_numpy())
        n = len(srt)
        for c, frac in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            a = approx.loc[et, c]
            lo = np.searchsorted(srt, a, side="left")
            hi = np.searchsorted(srt, a, side="right")
            t = frac * n
            err = 0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t))
            assert err <= 0.025 * n, (et, c, err, t, n)


def test_length_drift_psi_planted(ray_session, tmp_path):
    """PSI semantics by hand: identical even/odd length distributions
    → PSI ~0 (smoothing only); a deliberately shifted odd half →
    large PSI; bin boundary 25 is INCLUSIVE (a 25-token doc lands in
    bin 0 on both engines)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q97_length_drift_psi,
    )

    same = ["w " * 10] * 8          # all bin 0, both splits
    shifted = (["w " * 10] * 4      # even: bin 0
               + ["w " * 120] * 4)  # odd: bin 4
    docs = pd.DataFrame({
        "doc_id": list(range(2, 18)),
        "lang": ["a"] * 8 + ["b"] * 8,
        "text": same + [shifted[i] for i in
                        [0, 4, 1, 5, 2, 6, 3, 7]]})
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q97_length_drift_psi(sf).set_index("lang")
    assert abs(got.loc["a", "psi"]) < 1e-9
    assert got.loc["b", "psi"] > 1.0
    assert got.loc["a", "n_even"] == 4 and got.loc["a", "n_odd"] == 4


def test_embedding_audit_planted(ray_session, tmp_path):
    """Hygiene flags by hand: a zero vector counts as zero-norm, a
    3-dim vector as bad-dim, mean_norm over the label's vectors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.queries import (
        q98_embedding_audit,
    )

    good = np.zeros(64, np.float32)
    good[0] = 3.0
    good2 = np.zeros(64, np.float32)
    good2[1] = 5.0
    t = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "label": pa.array([0, 0, 0, 1], pa.int32()),
        "embedding": pa.array(
            [good, good2, np.zeros(64, np.float32),
             np.ones(3, np.float32)],
            pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = q98_embedding_audit(str(tmp_path)).set_index("label")
    assert got.loc[0, "n_vecs"] == 3
    assert got.loc[0, "n_zero_norm"] == 1
    assert got.loc[0, "n_bad_dim"] == 0
    assert abs(got.loc[0, "mean_norm"] - (3 + 5 + 0) / 3) < 1e-6
    assert got.loc[1, "n_bad_dim"] == 1


def test_event_transitions_planted(ray_session, tmp_path):
    """Transition pairs never cross users, ties order by event_id,
    single-event users emit nothing."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q99_event_transitions,
    )

    ts = pd.Timestamp("2024-04-01")
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": pd.Series([ts, ts, ts + pd.Timedelta("1m"),
                         ts, ts + pd.Timedelta("1m"), ts]
                        ).astype("datetime64[us]"),
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_type": ["view", "click", "purchase",
                       "view", "error", "signup"]}))
    got = q99_event_transitions(sf)
    rows = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
    # user 1: view→click (tie by event_id), click→purchase; user 2:
    # view→error; user 3: nothing
    assert rows == {("view", "click"): 1, ("click", "purchase"): 1,
                    ("view", "error"): 1}


def test_cross_source_dup_matrix_planted(ray_session, tmp_path):
    """Pair accounting by hand: a 3-doc cluster across sources
    (A, A, B) yields pairs {AA:1, AB:2}; singletons contribute
    nothing; pair keys are canonical (a <= b)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q100_cross_source_dup_matrix,
    )

    tri = ("the very same syndicated article body pushed verbatim to "
           "three subscriber sites this morning")
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "source": ["A", "A", "B", "C"],
        "text": [tri, tri, tri,
                 "an unrelated unique document about alpine flora"]}))
    got = q100_cross_source_dup_matrix(sf)
    rows = {(r.source_a, r.source_b): r.n for r in got.itertuples()}
    assert rows == {("A", "A"): 1, ("A", "B"): 2}


def test_top_pmi_bigrams_planted(ray_session, tmp_path):
    """PMI ranks the exclusive pair above the promiscuous one: 'san
    francisco' always co-occurs (high PMI) while 'the cat' pairs a
    ubiquitous token (low PMI); support floor drops rare pairs."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q101_top_pmi_bigrams,
    )

    exclusive = "san francisco " * 6
    common = ("the cat " + "the dog " + "the fox " + "the owl "
              + "the cat " * 4)
    rare = "quantum entanglement "  # support 1 < 5 → dropped
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [exclusive, common, rare]}))
    got = q101_top_pmi_bigrams(str(tmp_path))
    assert "quantum entanglement" not in set(got["ngram"])
    pmi = got.set_index("ngram")["pmi"]
    assert pmi["san francisco"] > pmi["the cat"]
    assert got["ngram"].iloc[0] == "san francisco"


def test_nation_trade_volume_planted(ray_session, tmp_path):
    """Q7 shape by hand: cross-nation revenue counts in BOTH
    directions as separate rows; same-nation shipping and lineitems
    outside the ship-date window never contribute."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q102_nation_trade_volume,
    )

    _write_tbl(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": [1, 2, 3],
        "n_name": ["NATION_1", "NATION_2", "NATION_3"]}))
    _write_tbl(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": [10, 20], "s_nationkey": [1, 2]}))
    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [100, 200, 300], "c_nationkey": [1, 2, 3]}))
    _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [200, 100, 100, 300]}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        # o1: N1 supp → N2 cust (counts); o2: N2 supp → N1 cust
        # (counts, other direction); o3: N1 supp → N1 cust (same
        # nation, dropped); o4: N3 cust (dropped); last row: window.
        "l_orderkey": [1, 2, 3, 4, 1],
        "l_suppkey": [10, 20, 10, 10, 10],
        "l_shipdate": pd.to_datetime(
            ["1996-06-01", "1997-06-01", "1996-06-01", "1996-06-01",
             "1998-06-01"]).astype("datetime64[us]"),
        "l_extendedprice": [10.0, 20.0, 5.0, 7.0, 100.0],
        "l_discount": [0.10, 0.0, 0.0, 0.0, 0.0]}))
    got = q102_nation_trade_volume(sf)
    assert got[["supp_nation", "cust_nation", "l_year", "revenue"]] \
        .values.tolist() == [
            ["NATION_1", "NATION_2", "1996", 9.0],
            ["NATION_2", "NATION_1", "1997", 20.0]]


def test_returned_item_revenue_planted(ray_session, tmp_path):
    """Q10 shape by hand: only flag-R lineitems of orders inside the
    quarter contribute; revenue applies the discount; output carries
    the customer dim columns and sorts revenue-desc."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q103_returned_item_revenue,
    )

    _write_tbl(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": [1], "n_name": ["NATION_1"]}))
    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [1, 2], "c_name": ["Customer#1", "Customer#2"],
        "c_acctbal": [11.5, 22.5], "c_nationkey": [1, 1]}))
    _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [1, 2, 1],
        "o_orderdate": pd.to_datetime(
            ["1996-02-01", "1996-03-31", "1996-04-01"]  # o3 outside
        ).astype("datetime64[us]")}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_returnflag": ["R", "N", "R", "R"],
        "l_extendedprice": [10.0, 100.0, 5.0, 50.0],
        "l_discount": [0.10, 0.0, 0.0, 0.0]}))
    got = q103_returned_item_revenue(sf)
    assert got[["c_custkey", "revenue", "c_acctbal", "n_name"]] \
        .values.tolist() == [
            [1, 9.0, 11.5, "NATION_1"],
            [2, 5.0, 22.5, "NATION_1"]]


def test_small_qty_order_revenue_planted(ray_session, tmp_path):
    """Q17 shape by hand: part avg qty = 31/4; only the qty-1 line
    sits below 0.2·avg (exact test 5·1·4=20 < 31); other-brand parts
    never contribute even with tiny quantities."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q104_small_qty_order_revenue,
    )

    _write_tbl(tmp_path, "part", pd.DataFrame({
        "p_partkey": [1, 2], "p_brand": ["Brand#3", "Brand#1"]}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_partkey": [1, 1, 1, 1, 2],
        "l_quantity": [1.0, 10.0, 10.0, 10.0, 1.0],
        "l_extendedprice": [70.0, 9.0, 9.0, 9.0, 999.0]}))
    got = q104_small_qty_order_revenue(sf)
    assert got["avg_yearly"].tolist() == [10.0]   # 70.00 / 7


def test_disjunctive_part_revenue_planted(ray_session, tmp_path):
    """Q19 shape by hand: one qualifying lineitem per branch; a
    wrong-brand, an out-of-size and an out-of-quantity line each
    miss every branch."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q105_disjunctive_part_revenue,
    )

    _write_tbl(tmp_path, "part", pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5],
        "p_brand": ["Brand#1", "Brand#2", "Brand#3", "Brand#9",
                    "Brand#1"],
        "p_size": [3, 8, 12, 3, 40]}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_partkey": [1, 2, 3, 4, 5, 1],
        #             b1 b2  b3 wrong-brand  size40  qty-out
        "l_quantity": [5.0, 15.0, 25.0, 5.0, 5.0, 40.0],
        "l_extendedprice": [10.0, 20.0, 40.0, 999.0, 999.0, 999.0],
        "l_discount": [0.0, 0.0, 0.25, 0.0, 0.0, 0.0]}))
    got = q105_disjunctive_part_revenue(sf)
    assert got["revenue"].tolist() == [60.0]      # 10 + 20 + 40·0.75


def test_lone_late_supplier_planted(ray_session, tmp_path):
    """Q21 shape by hand: counted only when the supplier is the ONLY
    late one in a multi-supplier finalized order; two-late orders,
    single-supplier orders, open orders and the exact +60-day
    boundary all drop out."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q106_lone_late_supplier,
    )

    od = pd.Timestamp("2024-01-01")
    _write_tbl(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": [1, 2], "s_name": ["Supp#A", "Supp#B"]}))
    _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_orderstatus": ["F", "F", "F", "O", "F"],
        "o_orderdate": pd.Series([od] * 5).astype("datetime64[us]")}))
    late = od + pd.Timedelta(days=61)
    ok = od + pd.Timedelta(days=5)
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4, 5, 5],
        "l_suppkey": [1, 2, 1, 2, 1, 1, 2, 1, 2],
        "l_shipdate": pd.Series([
            late, ok,          # o1: A lone-late → counts
            late, late,        # o2: both late → nobody
            late,              # o3: single supplier → nobody
            late, ok,          # o4: status O → nobody
            od + pd.Timedelta(days=60), ok,   # o5: boundary NOT late
        ]).astype("datetime64[us]")}))
    got = q106_lone_late_supplier(sf)
    assert got.values.tolist() == [["Supp#A", 1]]


def test_rich_idle_customers_planted(ray_session, tmp_path):
    """Q22 shape by hand: the global positive-balance average uses
    exact cents·n cross-multiplication; a rich customer with a recent
    order is not idle; an old order doesn't count as activity;
    negative balances stay out of the average."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q107_rich_idle_customers,
    )

    _write_tbl(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": [1, 2], "n_name": ["NATION_1", "NATION_2"]}))
    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [1, 2, 3, 4],
        "c_nationkey": [1, 1, 2, 2],
        # avg of positives = 70; rich = {c1, c3}
        "c_acctbal": [100.0, 10.0, 100.0, -50.0]}))
    sf = _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_custkey": [1, 3],
        "o_orderdate": pd.to_datetime(
            ["2000-06-01",   # c1 recent → not idle
             "1998-06-01"]   # c3 old → still idle
        ).astype("datetime64[us]")}))
    got = q107_rich_idle_customers(sf)
    assert got.values.tolist() == [["NATION_2", 1, 100.0]]


def test_bm25_topk_planted(ray_session, tmp_path):
    """BM25 by hand against an independent scalar reimplementation:
    the term-dense short doc outranks a long doc with the same counts
    (length normalization), a doc with neither query term scores 0
    and ranks last by doc_id."""
    import math

    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q108_bm25_topk

    texts = {
        1: "apple banana",                      # both terms, short
        2: "apple banana " + " ".join(f"filler{i}" for i in range(20)),
        # ^ both terms, long (padding tokens all distinct so the
        #   frequency-derived query stays apple/banana)
        3: "apple apple apple",                 # one term, repeated
        4: "cherry date elderberry",            # neither term
    }
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": list(texts), "text": list(texts.values())}))
    got = q108_bm25_topk(sf)

    # independent reference: query = top-2 tokens = apple(5), banana(2)
    toks = {d: t.split() for d, t in texts.items()}
    n_docs, sum_dl = 4, sum(len(v) for v in toks.values())
    avgdl = sum_dl / n_docs
    df = {"apple": 3, "banana": 2}
    def bm25(d):
        s = 0.0
        for term in ["apple", "banana"]:
            tf = toks[d].count(term)
            idf = math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
        return round(s, 6)
    want = sorted(((bm25(d), d) for d in toks), key=lambda x: (-x[0], x[1]))
    assert got["doc_id"].tolist() == [d for _, d in want]
    assert got["bm25"].tolist() == [s for s, _ in want]
    assert got.set_index("doc_id")["bm25"][4] == 0.0
    # length normalization: doc 1 beats doc 2 despite identical tf
    assert got.set_index("doc_id")["bm25"][1] > got.set_index("doc_id")["bm25"][2]


def test_lexical_diversity_planted(ray_session, tmp_path):
    """Hand-computed TTR/hapax: 'a a b' → 3 tokens, 2 types, 1 hapax,
    ttr 666666 ppm (floor); an all-distinct doc hits 1e6 on both;
    an all-same doc has 0 hapax; empty text → all zeros."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q109_lexical_diversity,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a a b", "x y z", "w w w w", ""]}))
    got = q109_lexical_diversity(sf).set_index("doc_id")
    assert got.loc[1].tolist() == [3, 2, 1, 666666, 333333]
    assert got.loc[2].tolist() == [3, 3, 3, 1000000, 1000000]
    assert got.loc[3].tolist() == [4, 1, 0, 250000, 0]
    assert got.loc[4].tolist() == [0, 0, 0, 0, 0]


def test_quality_mix_sample_planted(ray_session, tmp_path):
    """Median gate + deterministic Bernoulli by hand: five en docs of
    1..5 tokens → exact median 3 (percentile_disc), so docs with >= 3
    tokens always survive with bucket 'hi'; below-median docs survive
    iff fmix32(doc_id) < 2^30, which the test recomputes with the
    same primitive; a second lang gets its own median."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.functions.hashing import sample_hash32
    from event_deduplication_ray.pipelines.queries import (
        q110_quality_mix_sample,
    )

    rows = [(i, "en", " ".join(["w"] * i)) for i in range(1, 6)]
    rows += [(10, "de", "a"), (11, "de", "a b c d e f g")]  # median: 1|7
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame(
        rows, columns=["doc_id", "lang", "text"]))
    got = q110_quality_mix_sample(sf)

    hi = got[got.bucket == "hi"]["doc_id"].tolist()
    # en median 3 → docs 3,4,5 hi; de median 1 → both de docs hi
    assert hi == [3, 4, 5, 10, 11]
    lo_expect = [d for d in (1, 2)
                 if sample_hash32(np.array([d]))[0] < 2**30]
    assert got[got.bucket == "lo"]["doc_id"].tolist() == lo_expect


def test_domain_mix_report_planted(ray_session, tmp_path):
    """Token shares and √-temperature weights by hand: sources with
    90/10 token split → share_ppm 900000/100000 (floor), w_temp
    √0.9/√0.1; doc counts independent of token counts."""
    import math

    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q111_domain_mix_report,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["big", "big", "small"],
        "text": ["w " * 45, "w " * 45, "w " * 10]}))
    got = q111_domain_mix_report(sf).set_index("source")
    assert got.loc["big", "n_docs"] == 2
    assert got.loc["big", "n_tokens"] == 90
    assert got.loc["big", "share_ppm"] == 900000
    assert got.loc["small", "share_ppm"] == 100000
    assert got.loc["big", "w_temp"] == round(math.sqrt(0.9), 6)
    assert got.loc["small", "w_temp"] == round(math.sqrt(0.1), 6)


def test_semantic_outliers_planted(ray_session, tmp_path):
    """Orthogonal-blob construction: six e1-axis vectors plus one
    e2-axis outlier under label 0 → the outlier has the smallest
    cosine to the label centroid and heads the bottom-5; a clean
    3-vector label returns all three rows, none below cos≈1."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q112_semantic_outliers,
    )

    dim = 8
    def vec(axis, jitter, seed):
        rng = np.random.default_rng(seed)
        v = np.zeros(dim); v[axis] = 1.0
        return (v + jitter * rng.standard_normal(dim)).astype(np.float32)

    rows = []
    for i in range(6):
        rows.append((i, 0, vec(0, 0.01, i)))
    rows.append((99, 0, vec(1, 0.01, 99)))        # the outlier
    for i in range(3):
        rows.append((200 + i, 1, vec(2, 0.01, 50 + i)))
    sf = _write_tbl(tmp_path, "embeddings", pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "label": np.array([r[1] for r in rows], dtype=np.int32),
        "embedding": [r[2].tolist() for r in rows]}))
    got = q112_semantic_outliers(sf)

    l0 = got[got.label == 0]
    assert len(l0) == 5
    assert l0.iloc[0]["vec_id"] == 99          # farthest from centroid
    assert l0.iloc[0]["cos"] < 0.6 < l0.iloc[1]["cos"]
    l1 = got[got.label == 1]
    assert len(l1) == 3 and (l1["cos"] > 0.99).all()


def test_token_index_incremental_add(ray_session, tmp_path):
    """Index maintenance without rebuild: build on the first half,
    token_index_add the second half → every search (AND and OR, old
    terms, new-only terms, cross-half terms) answers identically to a
    full rebuild; doc_ids reports the union; adding an empty batch
    changes nothing."""
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.stages import textindex as TI

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["aa bb", "aa cc", "bb cc dd",
                 "newterm aa", "newterm only", "dd newterm"]})
    half1, half2 = docs.iloc[:3], docs.iloc[3:]

    inc = str(tmp_path / "inc")
    TI.token_index_build(rd.from_pandas(half1), inc)
    TI.token_index_add(rd.from_pandas(half2), inc)

    full = str(tmp_path / "full")
    TI.token_index_build(rd.from_pandas(docs), full)

    for terms, mode in [(["aa", "bb"], "and"), (["aa"], "or"),
                        (["newterm"], "or"), (["newterm", "aa"], "and"),
                        (["dd", "newterm"], "and"), (["zz"], "or")]:
        a = TI.token_index_search(inc, terms, mode=mode)
        b = TI.token_index_search(full, terms, mode=mode)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), (terms, mode)

    assert TI.token_index_doc_ids(inc).tolist() == [1, 2, 3, 4, 5, 6]

    TI.token_index_add(rd.from_pandas(docs.iloc[:0]), inc)
    assert TI.token_index_search(inc, ["aa"], mode="or")["doc_id"] \
        .tolist() == [1, 2, 4]


def test_late_data_drop_planted(ray_session, tmp_path):
    """Watermark semantics by hand: an event 15 min behind the user's
    high-water mark drops (behind_us exact); EXACTLY 10 min behind is
    kept (strict boundary); mild out-of-order within lateness is
    kept; the first event per user can never drop; watermarks never
    leak across users."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q113_late_data_drop,
    )

    t0 = pd.Timestamp("2024-01-01 10:00:00")
    mins = pd.Timedelta(minutes=1)
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 1, 1, 2, 2],
        "ts": pd.Series([
            t0,                 # e1 first
            t0 + 30 * mins,     # e2 advances hwm to 10:30
            t0 + 15 * mins,     # e3: 15 min behind 10:30 → DROP
            t0 + 20 * mins,     # e4: exactly 10 min behind → keep
            t0 + 25 * mins,     # e5: 5 min behind → keep
            t0 + 100 * mins,    # e6: user 2 first (late vs user 1's
                                #     clock but hwm is per-user)
            t0,                 # e7: 100 min behind user 2's hwm → DROP
        ]).astype("datetime64[us]")}))
    got = q113_late_data_drop(sf)
    assert got["event_id"].tolist() == [3, 7]
    assert got["behind_us"].tolist() == [15 * 60_000_000,
                                         100 * 60_000_000]


def test_lang_embedding_coherence_planted(ray_session, tmp_path):
    """Cross-modal join by hand: a language whose vectors share one
    axis scores mean_cos ≈ 1; a language split across two orthogonal
    axes scores ≈ cos(45°); embeddings without a matching doc_id and
    docs without a vector are silently excluded by the inner join."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q114_lang_embedding_coherence,
    )

    dim = 4
    def axis(i):
        v = np.zeros(dim); v[i] = 1.0
        return v.tolist()

    _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 99],
        "lang": ["en", "en", "xx", "xx", "de"]}))   # 99 has no vector
    sf = _write_tbl(tmp_path, "embeddings", pd.DataFrame({
        "vec_id": [1, 2, 3, 4, 500],                # 500 has no doc
        "embedding": [axis(0), axis(0), axis(1), axis(2), axis(3)]}))
    got = q114_lang_embedding_coherence(sf).set_index("lang")

    assert "de" not in got.index and len(got) == 2
    assert got.loc["en", "n_vecs"] == 2
    assert got.loc["en", "mean_cos"] == 1.0
    assert got.loc["xx", "n_vecs"] == 2
    assert got.loc["xx", "mean_cos"] == round(1 / np.sqrt(2), 6)


def test_mixture_draw_planted(ray_session, tmp_path):
    """Quota arithmetic + deterministic draw by hand: a 90/10 token
    split at N=100 gives quotas 90/10; each source's picks are its
    lowest-fmix32-hash doc_ids (recomputed in the test with the same
    primitive); a source smaller than its quota contributes all its
    docs; repeated calls return the identical frame."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.functions.hashing import sample_hash32
    from event_deduplication_ray.pipelines.queries import q115_mixture_draw

    # big: 180 docs x 5 tokens = 900 tok; small: 10 docs x 10 = 100 tok
    big_ids = list(range(1000, 1180))
    small_ids = list(range(2000, 2010))
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": big_ids + small_ids,
        "source": ["big"] * 180 + ["small"] * 10,
        "text": ["a b c d e"] * 180 + ["x " * 10] * 10}))
    got = q115_mixture_draw(sf)

    assert (got[got.source == "big"].shape[0] == 90
            and got[got.source == "small"].shape[0] == 10)
    ids = np.array(big_ids, dtype=np.int64)
    h = sample_hash32(ids).astype(np.int64)
    want_big = sorted(ids[np.lexsort((ids, h))[:90]].tolist())
    assert got[got.source == "big"]["doc_id"].tolist() == want_big
    assert sorted(got[got.source == "small"]["doc_id"]) == small_ids
    again = q115_mixture_draw(sf)
    pd.testing.assert_frame_equal(got, again)


def test_bpe_merges_planted(ray_session, tmp_path):
    """BPE learning by hand: corpus 'aaab'x3 + 'aab'x2 → pair counts
    (a,a)=8, (a,b)=5 → first merge (a,a); after rewriting, (a,b)=3
    ties (aa,a)=3 and the lexicographically smaller (a,b) wins the
    second merge; merge ranks are contiguous and counts exact."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q117_bpe_merges

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["aaab aaab aaab", "aab aab"]}))
    got = q117_bpe_merges(sf, n_merges=3)
    assert got[["left", "right", "pair_count"]].values.tolist()[:2] == [
        ["a", "a", 8],
        ["a", "b", 3],
    ]
    assert got["rank"].tolist() == list(range(len(got)))


def test_packed_shards_roundtrip(ray_session, tmp_path):
    """The packed-shard sink round-trips: reading the written shards
    and decoding ids through the saved vocab reproduces every doc's
    in-vocab tokens in doc_id order; OOV tokens hold their position
    as UNK_ID; no pack exceeds the budget except a single oversized
    doc; n_unk is exact."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data as rd
    from event_deduplication_ray.pipelines.tokenize_pack import (
        UNK_ID,
        write_packed_shards,
    )

    # 'common' appears 6x (in vocab at min_count 5); rare words are OOV
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en", "en", "en", "de", "de"],
        "text": ["common common rare1",
                 "common rare2 common",
                 " ".join(["common"] * 2 + ["filler"] * 30),  # oversized
                 "common rare3",
                 ""]})
    out = str(tmp_path / "shards")
    summary = write_packed_shards(rd.from_pandas(docs), out,
                                  budget=8, min_count=5)

    vocab = pq.read_table(f"{out}/vocab.parquet").to_pandas()
    assert set(vocab["token"]) == {"common", "filler"}
    id_of = dict(zip(vocab["token_id"], vocab["token"]))

    shards = []
    for d in sorted(os.listdir(out)):
        if d.startswith("lang="):
            lang = d.split("=")[1]
            for f in sorted(os.listdir(os.path.join(out, d))):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(out, d, f)).to_pandas()
                    t["lang"] = lang
                    shards.append(t)
    packs = pd.concat(shards)

    # budget invariant: oversized packs are single-doc
    over = packs[packs["n_tok"] > 8]
    assert (over["n_docs"] == 1).all()
    # exact unk accounting: rare1..3 are the only OOV tokens
    assert packs["n_unk"].sum() == 3
    assert summary.set_index("lang")["n_unk"].sum() == 3

    # round-trip: concatenating a lang's packs in pack order yields
    # the docs' token streams in doc_id order, UNK holding position
    for lang, want_docs in (("en", [1, 2, 3]), ("de", [4, 5])):
        sub = packs[packs["lang"] == lang].sort_values("pack_id")
        flat = [i for ids in sub["ids"] for i in ids]
        expect = []
        for d in want_docs:
            toks = docs.set_index("doc_id").loc[d, "text"].lower().split()
            expect.extend(
                [UNK_ID if t not in {"common", "filler"} else t
                 for t in toks])
        got = [UNK_ID if i == UNK_ID else id_of[i] for i in flat]
        assert got == expect, lang
    assert summary.set_index("lang").loc["en", "n_docs"] == 3


def test_corpus_diff_planted(ray_session):
    """Snapshot diff by hand: one doc edited, one removed, one added,
    one untouched — each lands in exactly its category with the right
    sampled ids; diffing a snapshot against itself is all-unchanged."""
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.pipelines.snapshot import corpus_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["alpha", "beta", "gamma"]})
    new = pd.DataFrame({"doc_id": [1, 2, 4],
                        "text": ["alpha", "beta EDITED", "delta"]})
    d = corpus_diff(rd.from_pandas(old), rd.from_pandas(new))
    s = d["summary"].set_index("status")["n"]
    assert s.to_dict() == {"added": 1, "changed": 1,
                           "removed": 1, "unchanged": 1}
    by = d["samples"].groupby("status")["doc_id"].apply(list).to_dict()
    assert by == {"added": [4], "changed": [2],
                  "removed": [3], "unchanged": [1]}

    same = corpus_diff(rd.from_pandas(old), rd.from_pandas(old))
    s2 = same["summary"].set_index("status")["n"]
    assert s2["unchanged"] == 3 and s2[["added", "removed",
                                        "changed"]].sum() == 0


def test_forecast_revenue_planted(ray_session, tmp_path):
    """Q6 by hand: only the in-window, 5–7 % discount, qty<24 line
    contributes price·discount; the 4 %-discount, qty-24 and
    out-of-window lines all miss."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q118_forecast_revenue,
    )

    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        "l_shipdate": pd.to_datetime(
            ["1997-06-01", "1997-06-01", "1997-06-01", "1996-06-01"]
        ).astype("datetime64[us]"),
        "l_discount": [0.06, 0.04, 0.06, 0.06],
        "l_quantity": [10.0, 10.0, 24.0, 10.0],
        "l_extendedprice": [100.0, 999.0, 999.0, 999.0]}))
    got = q118_forecast_revenue(sf)
    assert got["revenue"].tolist() == [6.0]     # 100 * 0.06


def test_market_share_planted(ray_session, tmp_path):
    """Q8 by hand: two PROMO lineitems to region customers in one
    year, one from the target nation's supplier → share = its
    revenue fraction; non-PROMO parts, out-of-region customers and
    out-of-window orders all drop."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q119_market_share,
    )

    _write_tbl(tmp_path, "part", pd.DataFrame({
        "p_partkey": [1, 2], "p_type": ["PROMO", "STANDARD"]}))
    _write_tbl(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": [10, 20], "s_nationkey": [3, 7]}))
    _write_tbl(tmp_path, "customer", pd.DataFrame({
        "c_custkey": [100, 200], "c_nationkey": [0, 9]}))
    _write_tbl(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [100, 100, 200],
        "o_orderdate": pd.to_datetime(
            ["1996-05-01", "1995-05-01", "1996-05-01"]
        ).astype("datetime64[us]")}))
    sf = _write_tbl(tmp_path, "lineitem", pd.DataFrame({
        # o1: target-supp promo 30, other-supp promo 10, non-promo 999
        # o2: out of window; o3: out-of-region customer
        "l_orderkey": [1, 1, 1, 2, 3],
        "l_partkey": [1, 1, 2, 1, 1],
        "l_suppkey": [10, 20, 10, 10, 10],
        "l_extendedprice": [30.0, 10.0, 999.0, 999.0, 999.0],
        "l_discount": [0.0] * 5}))
    got = q119_market_share(sf)
    assert got[["o_year", "mkt_share"]].values.tolist() == [
        ["1996", 0.75]]
    assert got["nation_u"].tolist() == [30 * 100 * 100]


def test_dup_degree_histogram_planted(ray_session, tmp_path):
    """Degree semantics by hand: three exact copies form a triangle
    (degree 2 each), one pairwise dup pair (degree 1 each), two
    unique docs (degree 0) — bins exact and summing to the corpus."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q120_dup_degree_histogram,
    )

    tri = "the same exact words repeated here for this document body"
    pair = "another shared body of text with plenty of tokens inside it"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "lang": ["en"] * 7,
        "text": [tri, tri, tri, pair, pair,
                 "totally unrelated first content string with many words",
                 "equally unrelated second content string more words"]}))
    got = q120_dup_degree_histogram(sf)
    assert got.values.tolist() == [[0, 2], [1, 2], [2, 3]]


def test_user_entropy_planted(ray_session, tmp_path):
    """Entropy by hand: a uniform 4-type user scores ln(4), a
    single-type bot scores exactly 0, a 3:1 split matches the closed
    form; counts and type cardinality ride along."""
    import math

    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q121_user_entropy

    rows = ([(1, t) for t in ("a", "b", "c", "d")]
            + [(2, "a")] * 5
            + [(3, "a")] * 3 + [(3, "b")])
    sf = _write_tbl(tmp_path, "events", pd.DataFrame(
        rows, columns=["user_id", "event_type"]))
    got = q121_user_entropy(sf).set_index("user_id")
    assert got.loc[1, "entropy"] == round(math.log(4), 6)
    assert got.loc[1, "n_types"] == 4
    assert got.loc[2, "entropy"] == 0.0
    h3 = math.log(4) - (3 * math.log(3) + 1 * math.log(1)) / 4
    assert got.loc[3, "entropy"] == round(h3, 6)


def test_length_percentile_planted(ray_session, tmp_path):
    """Exact percent-rank by hand: five docs of 1..5 tokens → ppm
    0/250000/500000/750000/1000000; ties share the min rank (two
    3-token docs both at 2 smaller of n-1=5); a second lang ranks
    independently; a single-doc lang is 0 (n-1 floor)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q122_length_percentile,
    )

    rows = [(i, "en", " ".join(["w"] * i)) for i in range(1, 6)]
    rows += [(10, "en", "w w w")]          # tie with doc 3
    rows += [(20, "de", "w w")]            # singleton lang
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame(
        rows, columns=["doc_id", "lang", "text"]))
    got = q122_length_percentile(sf).set_index("doc_id")
    n1 = 5  # en docs: 6 → n-1 = 5
    assert got.loc[1, "pr_ppm"] == 0
    assert got.loc[2, "pr_ppm"] == 1_000_000 // n1
    assert got.loc[3, "pr_ppm"] == (2 * 1_000_000) // n1
    assert got.loc[10, "pr_ppm"] == (2 * 1_000_000) // n1   # tie→min
    assert got.loc[4, "pr_ppm"] == (4 * 1_000_000) // n1
    assert got.loc[5, "pr_ppm"] == 1_000_000
    assert got.loc[20, "pr_ppm"] == 0


def test_new_ops_partition_count_invariant(ray_session, monkeypatch):
    """Results must not depend on the shuffle fan-out: rerunning the
    session's shuffle-dependent operators with join_num_partitions=3
    instead of 16 yields identical frames on the sf0.001 tables (the
    8-vs-32-width determinism argument at the operator level)."""
    import pandas as pd

    from event_deduplication_ray import config as C
    from event_deduplication_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    names = ["q103_returned_item_revenue", "q106_lone_late_supplier",
             "q110_quality_mix_sample", "q115_mixture_draw",
             "q121_user_entropy", "q122_length_percentile"]
    base = {n: Q.RAY_QUERIES[n](sf) for n in names}
    monkeypatch.setattr(Q, "QCFG",
                        C.DedupConfig(join_num_partitions=3))
    try:
        for n in names:
            again = Q.RAY_QUERIES[n](sf)
            pd.testing.assert_frame_equal(
                base[n].reset_index(drop=True),
                again.reset_index(drop=True), check_dtype=False), n
    finally:
        monkeypatch.undo()


def test_dup_pagerank_planted(ray_session, tmp_path):
    """PageRank on a planted triangle + 2-clique + isolate: the
    disconnected regular union has the exactly-uniform closed-form
    solution under teleport, symmetric members tie exactly, total
    graph mass is 1, and the isolated doc is counted out."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q123_dup_pagerank

    clique = "one identical body of text shared by a triangle of docs"
    pair = "a different duplicated body for the two-clique side here"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en"] * 6,
        "text": [clique, clique, clique, pair, pair,
                 "an isolated unique document with no duplicate at all"]}))
    got = q123_dup_pagerank(sf)
    r = got.set_index("doc_id")["rank"]
    assert set(r.index) == {1, 2, 3, 4, 5}
    # closed form: on a disconnected union of REGULAR components the
    # teleport equation's unique solution is exactly uniform (1/5) —
    # a sharp check of the rank/degree scatter (dropping the degree
    # division, or leaking mass between components, breaks it)
    assert r[1] == r[2] == r[3]
    assert r[4] == r[5]
    assert abs(r[1] - 0.2) < 1e-9 and abs(r[4] - 0.2) < 1e-9
    assert got["n_isolated"].iloc[0] == 1
    assert abs(r.sum() - 1.0) < 1e-6


def test_cluster_labels_planted(ray_session, tmp_path):
    """Label semantics by hand: a 2-doc cluster whose members share a
    distinctive token ranks it above corpus-wide stopwords (df
    drives the idf down); singletons produce no labels; <= 3 rows
    per cluster with (score desc, token) order."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q124_cluster_labels

    import math

    dup = "zebra common filler"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "text": [dup, dup,
                 "common filler words unrelated body here",
                 "common filler words another unrelated body there"]}))
    got = q124_cluster_labels(sf)
    assert got["cluster_id"].nunique() == 1       # only the dup pair
    # zebra: n=2 in-cluster, df=2 of 4 → 2·ln 2; common/filler: df=4
    # → idf 0, tie broken alphabetically
    assert got["token"].tolist() == ["zebra", "common", "filler"]
    assert got["score"].tolist() == [round(2 * math.log(2), 6), 0.0, 0.0]


def test_effective_tokens_planted(ray_session, tmp_path):
    """Arithmetic by hand: a 3-copy cluster (4 tokens each) keeps one
    representative (min doc_id) and drops 8 of 12 tokens; a unique
    doc keeps its 5; dup_token_ppm = 8/17 exactly floored."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q125_effective_tokens,
    )

    dup = "four tokens exactly here"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "text": [dup, dup, dup, "five more tokens right here"]}))
    got = q125_effective_tokens(sf)
    assert got.iloc[0].to_dict() == {
        "n_docs": 4, "n_kept_docs": 2,
        "total_tokens": 17, "kept_tokens": 9,
        "dup_token_ppm": (8 * 1_000_000) // 17}


def test_doc_neighbors_planted(ray_session, tmp_path):
    """Neighbor lookup by hand: the query set is the smallest
    colliding band bucket — here the planted dup pair — and each
    member finds the other at estimated similarity 1.0; unrelated
    docs never appear in any neighbor list."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q126_doc_neighbors

    dup = ("a long enough shared body of text for banding to engage "
           "with well over twenty distinct tokens present so shingles "
           "and minhash bands are all defined properly here")
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 50],
        "lang": ["en"] * 4,
        "text": [dup,                      # query 1
                 "a second unique document with its own words entirely "
                 "different from everything else in this tiny corpus",
                 "third query document also fully unique in content and "
                 "sharing nothing with the other texts at all today",
                 dup]}))                   # dup of doc 1
    got = q126_doc_neighbors(sf)
    assert set(got["query_id"]) == {1, 50}   # the colliding pair
    n1 = got[got.query_id == 1]
    assert n1["doc_id"].tolist() == [50]
    assert n1["sim"].iloc[0] == 1.0
    n50 = got[got.query_id == 50]
    assert n50["doc_id"].tolist() == [1]
    assert set(got["doc_id"]) <= {1, 50}     # 2 and 3 never appear


def test_quality_representatives_planted(ray_session, tmp_path):
    """Keep-the-best-copy by hand: a dup pair where the LATER doc is
    the longer one → it wins representation (not keep-first); a
    singleton represents itself; member counts exact."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q127_quality_representatives,
    )

    short = ("shared body of duplicated text content here with many "
             "more tokens so the five gram shingle sets overlap well "
             "above threshold")
    longer = short + " extra"      # J = 16/17 ≈ 0.94 ≥ 0.75
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 9],
        "lang": ["en"] * 3,
        "text": [short, longer,
                 "an unrelated singleton document entirely its own"]}))
    got = q127_quality_representatives(sf).set_index("cluster_id")
    # cluster of {1, 2}: doc 2 is longer → representative despite
    # the higher id
    dup_row = got.loc[1]
    assert dup_row["rep_doc_id"] == 2
    assert dup_row["n_members"] == 2
    sing = got.loc[9]
    assert sing["rep_doc_id"] == 9 and sing["n_members"] == 1


def test_repetition_signals_planted(ray_session, tmp_path):
    """The driver corpus is newline-free token soup (no dup lines, no
    repeated 5-grams), so oracle parity alone only proves the no-op
    path — plant each signal and check hand-computed ppm values plus
    full DuckDB parity on the planted frame.

    doc 1 trips everything: 'a b c' x3 + 'd e f' → dup_line 2/4,
    dup-line chars 10/20, top bigram mass 3*2/12, dup 5-gram mass
    20/12 (overlap-unaware > 1e6 by design);
    doc 3 trips top2 (and dup5) with one line;
    doc 5 trips ONLY dup5 (run repeated far apart, bigram mass small);
    doc 2 (30 distinct tokens) and doc 4 (empty) keep."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q128_repetition_signals,
    )

    run = "r0 r1 r2 r3 r4"
    filler = " ".join(f"f{i}" for i in range(20))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c\na b c\na b c\nd e f",
            " ".join(f"t{i}" for i in range(30)),
            "x y x y x y x y",
            "",
            run + " " + filler + " " + run,
        ],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q128_repetition_signals(sf)

    assert got["dup_line_ppm"].tolist() == [500_000, 0, 0, 0, 0]
    assert got["dup_line_char_ppm"].tolist() == [500_000, 0, 0, 0, 0]
    assert got["top2_char_ppm"].iloc[0] == 500_000         # 6*1e6//12
    assert got["top2_char_ppm"].iloc[2] == 1_000_000       # 8*1e6//8
    assert got["dup5_char_ppm"].iloc[0] == 1_666_666       # 20*1e6//12
    assert got["dup5_char_ppm"].iloc[4] == 285_714         # 20*1e6//70
    # doc 5: bigram mass 2*4=8, 5*8 <= 70 → top2 rule passes there
    assert 5 * 8 <= 70 and got["keep"].tolist() == [0, 1, 0, 1, 0]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL["q128_repetition_signals"]).fetchdf()
    for c in got.columns:
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c


def test_exact_substring_spans_planted(ray_session, tmp_path):
    """Character-exact substring coverage (q129): two docs sharing an
    85-char run flanked by spaces on both sides → one island of 87
    covered chars in each; two docs sharing EXACTLY 64 chars → one
    64-char island; unrelated/short/empty docs → 0.  Hand-computed
    values + full DuckDB parity (the oracle enumerates every window
    via lateral unnest + gaps-and-islands)."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q129_exact_substring_spans,
    )

    run = ("the quick brown fox jumps over the lazy dog while the "
           "band plays on through the night")
    ex64 = "0123456789" * 6 + "abcd"
    assert len(ex64) == 64
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "text": [
            "PREFIX one " + run + " SUFFIX alpha",
            "different lead-in text " + run + " and a different tail",
            "totally unrelated content that shares nothing with the "
            "others at all, long enough to have windows",
            "short",
            "",
            "AA" + ex64 + "BB",
            "CCC" + ex64 + "DDD",
        ]})
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q129_exact_substring_spans(sf).set_index("doc_id")
    # shared region = " " + run + " " (flanking spaces match too)
    assert got.loc[1, "dup_chars"] == len(run) + 2
    assert got.loc[2, "dup_chars"] == len(run) + 2
    assert got.loc[1, "n_spans"] == 1
    assert got.loc[6, "dup_chars"] == 64 and got.loc[7, "dup_chars"] == 64
    assert got.loc[3, "dup_chars"] == 0
    assert got.loc[4, "dup_chars"] == 0 and got.loc[5, "n_chars"] == 0

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL["q129_exact_substring_spans"]).fetchdf()
    g = got.reset_index()
    for c in g.columns:
        assert g[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c


def test_substring_dedup_rewrite_planted(ray_session, tmp_path):
    """Keep-first rewrite semantics (q130): global min (doc_id, pos)
    occurrence of each shared 64-char window survives; every other
    occurrence is cut (including a second occurrence INSIDE a later
    doc); unaffected/short/empty docs pass through byte-identical.
    Hand-checked cuts + full DuckDB parity (string_agg reassembly)."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q130_substring_dedup_rewrite,
    )

    run = ("the quick brown fox jumps over the lazy dog while the "
           "band plays on through the night")
    ex64 = "0123456789" * 6 + "abcd"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "PREFIX one " + run + " SUFFIX alpha",
            "different lead-in text " + run + " and a tail",
            "short",
            "",
            "AA" + ex64 + "BB",
            "CCC" + ex64 + "DDD" + ex64 + "EEE",
        ]})
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q130_substring_dedup_rewrite(sf)
    g = got.set_index("doc_id")
    assert g.loc[1, "cut_chars"] == 0                 # owner untouched
    assert g.loc[1, "text_clean"] == docs["text"][0]
    assert g.loc[2, "cut_chars"] == len(run) + 2      # flanked run cut
    assert g.loc[3, "cut_chars"] == 0 and g.loc[4, "n_chars"] == 0
    assert g.loc[5, "cut_chars"] == 0                 # ex64 owner
    assert g.loc[6, "cut_chars"] == 128               # BOTH later occurrences
    assert g.loc[6, "text_clean"] == "CCCDDDEEE"

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = con.execute(ORACLE_SQL["q130_substring_dedup_rewrite"]).fetchdf()
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c


def test_global_range_join_planted(ray_session, tmp_path):
    """q131 boundary + replication semantics: a view exactly 600 s
    before a purchase COUNTS (inclusive lower), a view at the
    purchase's own ts does NOT (strict upper), cross-user views count
    (no equi-key), a purchase exactly on a bucket boundary (ts ≡ 0
    mod 10 min) takes the single-replica path, and both replicas of a
    straddling window sum without double-counting."""
    import duckdb
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q131_global_range_join,
    )

    T = pd.Timestamp("2024-03-01 00:00:00")
    S = pd.Timedelta(seconds=1)
    ev = pd.DataFrame([
        # purchase 1 at +1000s (window [400, 1000) straddles buckets)
        (1, T + 1000 * S, 1, "purchase", 0.0),
        (2, T + 400 * S, 2, "view", 0.0),      # == lower bound: counts
        (3, T + 399 * S, 2, "view", 0.0),      # just below: no
        (4, T + 999 * S, 3, "view", 0.0),      # inside: counts
        (5, T + 1000 * S, 3, "view", 0.0),     # == purchase ts: no
        (6, T + 550 * S, 4, "view", 0.0),      # bucket 0 side: counts
        # purchase 7 at exactly +1200s (≡ 0 mod 600 → one replica)
        (7, T + 1200 * S, 5, "purchase", 0.0),
        (8, T + 600 * S, 6, "view", 0.0),      # == lower bound: counts
        (9, T + 1199 * S, 6, "view", 0.0),     # inside: counts
        # purchase 10 with no views around it
        (10, T + 90000 * S, 7, "purchase", 0.0),
    ], columns=["event_id", "ts", "user_id", "event_type", "value"])
    ev["props"] = "{}"
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write_tbl(tmp_path, "events", ev)
    got = q131_global_range_join(sf).set_index("event_id")
    assert got.loc[1, "n_views_10m"] == 4     # ids 2, 4, 6, 8
    assert got.loc[7, "n_views_10m"] == 4     # ids 4, 5, 8, 9
    assert got.loc[10, "n_views_10m"] == 0

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM ev")
    want = con.execute(ORACLE_SQL["q131_global_range_join"]).fetchdf()
    g = got.reset_index()
    for c in g.columns:
        assert g[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c


def test_dup_triangles_planted(ray_session, tmp_path):
    """Triangle semantics by hand: four exact copies form a K4 (four
    triangles; each corner sits in C(3,2)=3 of them), a pairwise dup
    pair has an edge but no triangle, and unique docs are absent from
    the output entirely."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q132_dup_triangles

    k4 = "the same exact words repeated here for this document body"
    pair = "another shared body of text with plenty of tokens inside it"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "lang": ["en"] * 7,
        "text": [k4, k4, k4, k4, pair, pair,
                 "totally unrelated first content string with many words"]}))
    got = q132_dup_triangles(sf)
    assert got.values.tolist() == [[1, 3], [2, 3], [3, 3], [4, 3]]


def test_compression_gate_planted(ray_session, tmp_path):
    """Gate semantics by hand: a long repetitive doc compresses far
    below the keep band (flagged), a long high-entropy base64 doc
    barely compresses (flagged), a long prose doc lands inside the
    band (kept), and a short doc passes ungated regardless of its
    ratio (zlib header overhead dominates short payloads)."""
    import base64
    import hashlib

    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q133_compression_gate

    prose = ("The quick brown fox jumps over the lazy dog while two "
             "engineers argue about shuffle partitioning strategies "
             "and the merits of exact integer arithmetic in oracles. ") * 4
    rep = "spam " * 200
    junk = base64.b64encode(b"".join(
        hashlib.sha256(bytes([i])).digest() for i in range(40))).decode()
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "text": [prose, rep, junk, "tiny"]}))
    got = q133_compression_gate(sf).set_index("doc_id")
    assert len(got) == 4
    assert bool(got.loc[1, "keep"]) is True
    assert bool(got.loc[2, "keep"]) is False      # ratio below 100k ppm
    assert got.loc[2, "ratio_ppm"] < 100_000
    assert bool(got.loc[3, "keep"]) is False      # ratio above 750k ppm
    assert got.loc[3, "ratio_ppm"] > 750_000
    assert bool(got.loc[4, "keep"]) is True       # short doc: ungated
    assert got.loc[4, "raw_len"] < 256
    # exact integer ppm invariant
    row = got.loc[1]
    assert row["ratio_ppm"] == row["comp_len"] * 1_000_000 // row["raw_len"]


def test_event_rate_anomaly_planted(ray_session, tmp_path):
    """Anomaly semantics by hand: a constant-rate type has sd=0 →
    z=0 everywhere, never anomalous; a type with 24 quiet hours and
    one 40-event spike puts only the spike past |z|>3; hours with no
    events produce NO row (documented observed-hours contract)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        q134_event_rate_anomaly,
    )

    T = pd.Timestamp("2024-03-01 00:30:00")
    H = pd.Timedelta(hours=1)
    rows = []
    # 'steady': exactly 2 events in each of 10 consecutive hours
    for h in range(10):
        rows += [(T + h * H, "steady")] * 2
    # 'bursty': 1 event in each of 24 hours, then a 40-event spike
    for h in range(24):
        rows.append((T + h * H, "bursty"))
    rows += [(T + 26 * H, "bursty")] * 40   # hour 25 empty: no row
    ev = pd.DataFrame(rows, columns=["ts", "event_type"])
    ev["event_id"] = np.arange(1, len(ev) + 1, dtype=np.int64)
    ev["user_id"] = 1
    ev["value"] = 0.0
    ev["props"] = "{}"
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write_tbl(tmp_path, "events",
                    ev[["event_id", "ts", "user_id", "event_type",
                        "value", "props"]])
    got = q134_event_rate_anomaly(sf)
    st = got[got["event_type"] == "steady"]
    assert len(st) == 10 and (st["z"] == 0.0).all() \
        and (st["anomaly"] == 0).all()
    bu = got[got["event_type"] == "bursty"]
    assert len(bu) == 25               # 24 quiet + spike; empty hour absent
    mu = (24 * 1 + 40) / 25
    sd = np.sqrt((24 * 1 + 1600) / 25 - mu * mu)
    spike = bu[bu["n"] == 40].iloc[0]
    assert spike["anomaly"] == 1
    assert spike["z"] == round((40 - mu) / sd, 6)
    assert (bu[bu["n"] == 1]["anomaly"] == 0).all()

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM ev")
    want = con.execute(ORACLE_SQL["q134_event_rate_anomaly"]).fetchdf()
    g = got.reset_index(drop=True)
    assert g["z"].tolist() == want["z"].tolist()
    assert g["n"].astype("int64").tolist() == \
        want["n"].astype("int64").tolist()


def test_winnow_dedup_guarantee_and_cap(ray_session, tmp_path):
    """The MOSS guarantee by construction: a shared chunk of exactly
    w+k-1 = 47 chars MUST yield >= 1 shared fingerprint (pair found
    at min_shared=1); a 200-char shared chunk clears min_shared=2;
    unrelated docs never pair; and a chunk shared by MORE than
    max_fp_docs docs is dropped as boilerplate while reappearing
    when the cap is lifted."""
    import hashlib

    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q135_winnow_dedup

    def junk(tag: str, n: int) -> str:
        out = []
        i = 0
        while sum(len(x) for x in out) < n:
            out.append(hashlib.sha256(f"{tag}{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    chunk47 = junk("chunk47", 47)
    chunk200 = junk("chunk200", 200)
    boiler = junk("boiler", 120)
    docs = {
        1: junk("a", 150) + chunk47 + junk("b", 150),
        2: junk("c", 150) + chunk47 + junk("d", 150),
        3: junk("e", 100) + chunk200 + junk("f", 100),
        4: junk("g", 100) + chunk200 + junk("h", 100),
        5: junk("solo1", 400),
        6: junk("solo2", 400),
    }
    # 6 IDENTICAL boilerplate docs: identical hash streams → identical
    # selections → every selected fp is shared by all 6 docs, so the
    # cap (4) drops the whole group deterministically.  (With distinct
    # surroundings the selection near the boundaries can split an fp's
    # doc count below the cap — the cap is on SELECTED occurrences,
    # the MOSS semantic, not substring frequency.)
    for i in range(7, 13):
        docs[i] = boiler
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": list(docs), "lang": ["en"] * len(docs),
        "text": list(docs.values())}))

    got1 = q135_winnow_dedup(sf, min_shared=1, max_fp_docs=4)
    pairs1 = set(map(tuple, got1[["id_a", "id_b"]].values.tolist()))
    assert (1, 2) in pairs1                  # 47-char guarantee
    assert (3, 4) in pairs1
    assert not any(5 in p or 6 in p for p in pairs1)
    assert not any(a >= 7 and b >= 7 for a, b in pairs1)  # cap drops boiler

    got2 = q135_winnow_dedup(sf, min_shared=2, max_fp_docs=64)
    pairs2 = set(map(tuple, got2[["id_a", "id_b"]].values.tolist()))
    assert (3, 4) in pairs2                  # 200-char chunk: many fps
    boiler_pairs = [p for p in pairs2 if p[0] >= 7 and p[1] >= 7]
    assert len(boiler_pairs) == 15           # C(6,2): cap lifted


def test_winnow_dedup_agrees_with_exact_families(ray_session):
    """Winnowed pairs on the driver corpus recover the exact-Jaccard
    dup families: every q28-exact edge (near-identical docs) is also
    a winnowed pair, and winnowing adds only containment-style pairs
    (its guarantee is substring-based, not whole-doc)."""
    from event_deduplication_ray.pipelines.queries import (
        QCFG,
        _docs_from_documents,
        q135_winnow_dedup,
    )
    from event_deduplication_ray.stages.banding import substring_fp_table
    from event_deduplication_ray.stages.pairs import ngram_jaccard_match_pairs
    from event_deduplication_ray.stages.signatures import signature_stage

    sf = "/root/testdata/sf0.001"
    cfg = QCFG.with_overrides(substring_mod_p=1, substring_min_fps=1)
    exact = ngram_jaccard_match_pairs(
        substring_fp_table(signature_stage(_docs_from_documents(sf), cfg),
                           cfg), cfg, threshold=cfg.jaccard_match) \
        .to_pandas()
    exact_pairs = set(map(tuple, exact[["id_a", "id_b"]].values.tolist()))
    win = q135_winnow_dedup(sf)
    win_pairs = set(map(tuple, win[["id_a", "id_b"]].values.tolist()))
    assert exact_pairs <= win_pairs


def test_hopping_windows_planted(ray_session, tmp_path):
    """Window membership by hand: an event at 01:07 belongs to the
    four 1-hour windows starting 00:15/00:30/00:45/01:00; an event at
    exactly 01:00 belongs to 00:15..01:00 (bucket floor is its own
    window start); distinct-user counting collapses a same-user pair
    inside a shared window but not the event count."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q136_hopping_windows

    T = pd.Timestamp("2024-03-01")
    ev = pd.DataFrame({
        "ts": [T + pd.Timedelta(minutes=67),       # 01:07, user 1
               T + pd.Timedelta(minutes=60),       # 01:00, user 1
               T + pd.Timedelta(minutes=67)],      # 01:07, user 2
        "user_id": [1, 1, 2]})
    ev["event_id"] = np.arange(1, 4, dtype=np.int64)
    ev["event_type"] = "view"
    ev["value"] = 0.0
    ev["props"] = "{}"
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write_tbl(tmp_path, "events",
                    ev[["event_id", "ts", "user_id", "event_type",
                        "value", "props"]])
    got = q136_hopping_windows(sf).set_index("window_start")
    assert got.loc["2024-03-01 01:00:00", "n_events"] == 3
    assert got.loc["2024-03-01 01:00:00", "n_users"] == 2
    assert got.loc["2024-03-01 00:15:00", "n_events"] == 3
    assert got.loc["2024-03-01 00:30:00", "n_events"] == 3
    assert got.loc["2024-03-01 00:45:00", "n_events"] == 3
    # 01:07 events drop out of windows ending before them; 01:00 stays
    assert "2024-03-01 01:15:00" not in got.index  # no event >= 01:15
    assert len(got) == 4


def test_containment_directed_planted(ray_session, tmp_path):
    """Direction semantics by hand: a 10-token doc fully quoted inside
    a 40-token doc → (inner=quote, outer=host, cont_ppm=1e6); partial
    overlap below 0.8 emits nothing; equal-size exact copies break the
    tie by doc_id."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q137_containment_directed,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    host = ("intro words before the quotation now begins here " + quote
            + " and plenty of trailing commentary follows the quoted part"
            + " padding tokens one two three four five six seven")
    twin = "identical twin document body with exactly these same tokens"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en"] * 5,
        "text": [quote, host, twin, twin,
                 "completely unrelated filler text with distinct words"]}))
    got = q137_containment_directed(sf)
    rows = {(r.inner_id, r.outer_id): r.cont_ppm
            for r in got.itertuples()}
    assert rows[(1, 2)] == 1_000_000        # quote fully inside host
    assert rows[(3, 4)] == 1_000_000        # tie → smaller id is inner
    assert len(rows) == 2                   # nothing else crosses 0.8


def test_cross_label_nn_planted(ray_session, tmp_path):
    """Cross-label semantics by hand: a vector whose nearest SAME-label
    twin is nearly identical must still report the best OTHER-label
    vector; exact duplicate vectors under different labels tie-break
    to the minimal nn_id; zero-norm vectors are excluded entirely."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q138_cross_label_nn

    d = 8
    e = np.eye(d, dtype=np.float32)
    rows = [
        (1, 0, e[0]),                          # axis 0, label 0
        (2, 0, (e[0] * 0.99 + e[1] * 0.01)),   # near-twin, SAME label
        (3, 1, (e[0] * 0.7 + e[2] * 0.3)),     # best cross-label for 1
        (4, 1, e[3]),                          # orthogonal
        (5, 2, e[0].copy()),                   # exact dup of 1, label 2
        (6, 2, e[0].copy()),                   # exact dup again
        (7, 3, np.zeros(d, np.float32)),       # zero-norm: excluded
    ]
    sf = _write_tbl(tmp_path, "embeddings", pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "embedding": [r[2].astype(np.float32) for r in rows],
        "label": np.array([r[1] for r in rows], np.int32)}))
    got = q138_cross_label_nn(sf).set_index("vec_id")
    assert 7 not in got.index
    # vec 1's best cross-label is its exact duplicate — tie → min id 5
    assert got.loc[1, "nn_id"] == 5 and got.loc[1, "nn_label"] == 2
    assert got.loc[5, "nn_id"] == 1          # symmetric, label 0 wins order
    assert got.loc[4, "nn_id"] in (1, 2, 3, 5, 6)  # anything non-label-1
    assert got.loc[3, "nn_id"] in (1, 5, 6)  # closest to axis 0 family


def test_source_dup_rate_planted(ray_session, tmp_path):
    """Rate semantics by hand: a feed whose 2 of 4 docs are exact
    copies scores 500000 ppm; a clean feed scores 0; a cross-source
    dup counts in BOTH feeds (cluster membership, not pair origin)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q139_source_dup_rate

    dup = "one shared body of duplicated text with plenty of tokens here"
    xdup = "a second duplicated body crossing two different feeds entirely"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "lang": ["en"] * 8,
        "source": ["feedA"] * 4 + ["feedB"] * 2 + ["feedC"] * 2,
        "text": [dup, dup,
                 "unique first content string with many distinct words",
                 "unique second content string more distinct words here",
                 xdup,
                 "feedB unique doc with its own completely distinct text",
                 xdup,
                 "feedC unique doc carrying yet another distinct body"]}))
    got = q139_source_dup_rate(sf).set_index("source")
    assert got.loc["feedA", "n_docs"] == 4
    assert got.loc["feedA", "n_dup"] == 2
    assert got.loc["feedA", "dup_ppm"] == 500_000
    assert got.loc["feedB", "dup_ppm"] == 500_000   # xdup counts here
    assert got.loc["feedC", "dup_ppm"] == 500_000   # ... and here


def test_dup_kcore_planted(ray_session, tmp_path):
    """Core numbers by hand: five exact copies form a K5 (core 4);
    a separate exact pair is core 1; unique docs are isolates (core 0
    by convention: absent from the output, the q123 vertex contract).
    Invariant: core <= degree everywhere."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q120_dup_degree_histogram,
        q140_dup_kcore,
    )

    k5 = "the same exact words repeated here for this document body"
    pair = "another shared body of text with plenty of tokens inside it"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "lang": ["en"] * 8,
        "text": [k5, k5, k5, k5, k5, pair, pair,
                 "totally unrelated first content string with many words"]}))
    got = q140_dup_kcore(sf).set_index("doc_id")
    assert got.loc[[1, 2, 3, 4, 5], "core"].tolist() == [4] * 5
    assert got.loc[[6, 7], "core"].tolist() == [1, 1]
    assert 8 not in got.index


def test_hashed_embedding_planted(ray_session, tmp_path):
    """Hand-pinned feature-hashing: vocab is alpha(5) vid=1, beta(3)
    vid=2 (gamma/rare are hapaxes, pruned by min_count=2); fmix32
    gives vid 1 -> h 1364076727 (dim 55, sign +1) and vid 2 ->
    h 821347078 (dim 6, sign +1).  So 'alpha alpha beta' embeds as
    {dim 6: +1, dim 55: +2}; the pruned doc emits nothing; exact-dup
    docs embed identically."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q141_hashed_embedding

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "text": ["alpha alpha beta", "alpha beta gamma", "rare",
                 "alpha alpha beta"]}))
    got = q141_hashed_embedding(sf)
    assert 3 not in set(got["doc_id"])
    d1 = got[got["doc_id"] == 1][["dim", "val"]].reset_index(drop=True)
    assert d1.values.tolist() == [[6, 1], [55, 2]]
    d2 = got[got["doc_id"] == 2][["dim", "val"]].reset_index(drop=True)
    assert d2.values.tolist() == [[6, 1], [55, 1]]   # gamma pruned
    d4 = got[got["doc_id"] == 4][["dim", "val"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(d1, d4)


def test_contract_audit_planted(ray_session, tmp_path):
    """Hand-counted violations over 10 rows: one duplicated event_id
    (10 rows, 9 distinct), two negative values, empty-string + null
    props, one 2031 timestamp, one null user — each ppm is the exact
    integer v*1e6 // 10."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q142_contract_audit

    ts = [pd.Timestamp("2024-01-01")] * 9 + [pd.Timestamp("2031-06-01")]
    ev = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 9], np.int64),
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "user_id": pd.array([1, 2, 3, 4, 5, None, 7, 8, 9, 10],
                            dtype="Int64"),
        "event_type": ["view"] * 10,
        "value": [1.0, -2.0, 3.0, -0.5, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        "props": ["{}", "{}", "", None, "{}", "{}", "{}", "{}", "{}", "{}"],
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q142_contract_audit(sf).set_index("rule")
    assert got.loc["dup_event_id", "n_violations"] == 1
    assert got.loc["negative_value", "n_violations"] == 2
    assert got.loc["empty_props", "n_violations"] == 2
    assert got.loc["future_ts", "n_violations"] == 1
    assert got.loc["null_user", "n_violations"] == 1
    assert (got["n_rows"] == 10).all()
    assert got.loc["negative_value", "bad_ppm"] == 200_000
    assert got.loc["dup_event_id", "bad_ppm"] == 100_000


def test_table_profile_planted(ray_session, tmp_path):
    """Hand-counted profile over 6 rows: duplicate event_ids and ts,
    a null user, a null and duplicate props, -0.0 vs 0.0 collapsing
    to ONE distinct value (IEEE equality, the SQL DISTINCT
    semantics)."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q143_table_profile

    ev = pd.DataFrame({
        "event_id": np.array([1, 1, 2, 3, 4, 5], np.int64),
        "ts": pd.Series([pd.Timestamp("2024-01-01")] * 2
                        + [pd.Timestamp("2024-01-02")] * 4
                        ).astype("datetime64[us]"),
        "user_id": pd.array([1, 2, None, 2, 3, 3], dtype="Int64"),
        "event_type": ["view", "view", "click", "view", "click", "buy"],
        "value": [0.0, -0.0, 1.5, 1.5, 2.0, 3.0],
        "props": ["{}", None, "{}", "x", "y", "y"],
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q143_table_profile(sf).set_index("col")
    assert (got["n_rows"] == 6).all()
    assert got.loc["event_id", "n_distinct"] == 5
    assert got.loc["ts", "n_distinct"] == 2
    assert got.loc["user_id", "n_null"] == 1
    assert got.loc["user_id", "n_distinct"] == 3
    assert got.loc["value", "n_distinct"] == 4     # -0.0 == 0.0
    assert got.loc["props", "n_null"] == 1
    assert got.loc["props", "n_distinct"] == 3


def test_join_size_cms_bracket(ray_session, tmp_path):
    """CMS inner-product join estimate: never below the exact join
    size (one-sided), and within the ε·N_a·N_b Count-Min bound of it.
    Planted multiplicities: user 1 has 3 views × 2 purchases, user 2
    has 1 × 1, user 3 views only, user 4 purchases only → true 7."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q144_join_size_cms

    rows = []
    eid = 1
    for u, et, k in [(1, "view", 3), (1, "purchase", 2),
                     (2, "view", 1), (2, "purchase", 1),
                     (3, "view", 4), (4, "purchase", 5)]:
        for _ in range(k):
            rows.append((eid, pd.Timestamp("2024-01-01"), u, et, 1.0, "{}"))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write_tbl(tmp_path, "events", ev)
    got = q144_join_size_cms(sf).iloc[0]
    true = 3 * 2 + 1 * 1
    assert got["n_view_rows"] == 8 and got["n_purchase_rows"] == 8
    assert got["join_size_est"] >= true
    bound = np.e / 8192 * 8 * 8 + 1
    assert got["join_size_est"] <= true + bound


def test_join_size_cms_matches_exact_sf0001(ray_session):
    """At sf0.001 the estimate must bracket the exact join size
    computed independently (pandas merge)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.queries import q144_join_size_cms

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    v = ev[ev["event_type"] == "view"].groupby("user_id").size()
    p = ev[ev["event_type"] == "purchase"].groupby("user_id").size()
    true = int((v * p).dropna().sum())
    got = q144_join_size_cms(sf).iloc[0]
    assert got["join_size_est"] >= true
    bound = np.e / 8192 * got["n_view_rows"] * got["n_purchase_rows"] + 1
    assert got["join_size_est"] <= true + bound


def test_phrase_search_planted(ray_session, tmp_path):
    """Positional phrase search by hand: [a b a] matches 'a b a b a'
    at starts 0 and 2 (overlaps count); a doc with the tokens but not
    the order does NOT match; absent terms → empty frame."""
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.stages.textindex import (
        phrase_index_build,
        phrase_search,
    )

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a", "b a x a b", "c c c"]})
    idx = str(tmp_path / "pidx")
    phrase_index_build(rd.from_pandas(docs), idx)

    got = phrase_search(idx, ["a", "b", "a"]).set_index("doc_id")
    assert got["n_phrase"].to_dict() == {1: 2}     # overlapping starts

    got2 = phrase_search(idx, ["a", "b"]).set_index("doc_id")
    assert got2["n_phrase"].to_dict() == {1: 2, 2: 1}

    assert len(phrase_search(idx, ["zz", "a"])) == 0
    assert len(phrase_search(idx, [])) == 0


def test_q145_phrase_search_planted(ray_session, tmp_path):
    """Self-derived top bigram: 'go go' wins with count 3 (2 in doc 1
    via overlap of 'go go go', 1 in doc 2); the result counts
    per-doc occurrences of exactly that phrase."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q145_phrase_search

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "lang": ["en"] * 3,
        "text": ["go go go", "stop go go", "halt halt"]}))
    got = q145_phrase_search(sf).set_index("doc_id")
    assert got["n_phrase"].to_dict() == {1: 2, 2: 1}


def test_crosslingual_dup_pairs_planted(ray_session, tmp_path):
    """Two tight embedding pairs: (1,2) cross-lang en/fr survives,
    (3,4) same-lang en/en is filtered; background vectors pair with
    nothing."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q146_crosslingual_dup_pairs,
    )

    rng = np.random.default_rng(9)
    d = 64
    base1 = rng.standard_normal(d)
    base2 = rng.standard_normal(d)
    vecs = {
        1: base1, 2: base1 + 1e-4,
        3: base2, 4: base2 + 1e-4,
        5: rng.standard_normal(d), 6: rng.standard_normal(d),
    }
    emb = pd.DataFrame({
        "vec_id": list(vecs),
        "embedding": [v.astype(np.float32).tolist() for v in vecs.values()],
        "label": np.int32(0),
    })
    docs = pd.DataFrame({
        "doc_id": list(vecs),
        "lang": ["en", "fr", "en", "en", "de", "de"],
        "text": ["x"] * 6,
    })
    _write_tbl(tmp_path, "embeddings", emb)
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q146_crosslingual_dup_pairs(sf)
    assert got[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert got.iloc[0]["lang_a"] == "en" and got.iloc[0]["lang_b"] == "fr"


def test_phrase_index_add_matches_rebuild(ray_session, tmp_path):
    """Incremental positional indexing: build half, add half — every
    phrase query answers identically to a full rebuild."""
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.stages.textindex import (
        phrase_index_add,
        phrase_index_build,
        phrase_search,
    )

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a b", "b a", "a b c", "c a b a"]})
    inc = str(tmp_path / "inc")
    phrase_index_build(rd.from_pandas(docs.iloc[:2]), inc)
    phrase_index_add(rd.from_pandas(docs.iloc[2:]), inc)
    full = str(tmp_path / "full")
    phrase_index_build(rd.from_pandas(docs), full)
    for terms in (["a", "b"], ["a", "b", "a"], ["c", "a"], ["zz"]):
        a = phrase_search(inc, terms)
        b = phrase_search(full, terms)
        pd.testing.assert_frame_equal(a, b)


def test_bpe_encode_planted_and_properties(ray_session, tmp_path):
    """Hand-worked BPE apply: corpus 'gogo gogo go' learns merges
    (g,o)->go then (go,go)->gogo; encoding gives 'gogo'->1 subword,
    'go'->1, so doc counts are exact.  Properties: concat(subwords)
    == word; n_words <= n_subwords <= n_chars."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        bpe_apply_word,
        q117_bpe_merges,
        q147_bpe_subword_counts,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2],
        "lang": ["en", "en"],
        "text": ["gogo gogo go", "gopher go"]}))
    merges = q117_bpe_merges(sf)
    pairs = list(zip(merges["left"], merges["right"]))
    assert pairs[0] == ("g", "o")
    ranks = {(l, r): int(k) for k, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}
    assert bpe_apply_word("gogo", ranks) == ["gogo"]
    assert bpe_apply_word("go", ranks) == ["go"]
    assert "".join(bpe_apply_word("gopher", ranks)) == "gopher"

    got = q147_bpe_subword_counts(sf).set_index("doc_id")
    assert got.loc[1, "n_subwords"] == 3      # gogo + gogo + go
    # properties on arbitrary words
    for w in ("zebra", "gg", "o", "gogogo"):
        subs = bpe_apply_word(w, ranks)
        assert "".join(subs) == w
        assert 1 <= len(subs) <= len(w)


def test_fd_audit_planted(ray_session, tmp_path):
    """Hand-built FDs: duplicate event_id with two DIFFERENT ts values
    breaks event_id->ts by exactly 1; event_type->props violation
    count = distinct pairs − distinct types."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q148_fd_audit

    ev = pd.DataFrame({
        "event_id": np.array([1, 1, 2, 3], np.int64),
        "ts": pd.Series([pd.Timestamp("2024-01-01"),
                         pd.Timestamp("2024-01-02"),   # same id, new ts
                         pd.Timestamp("2024-01-03"),
                         pd.Timestamp("2024-01-04")]).astype("datetime64[us]"),
        "user_id": np.array([1, 1, 2, 2], np.int64),
        "event_type": ["view", "view", "view", "click"],
        "value": [1.0] * 4,
        "props": ["{}", "{}", "x", "y"],
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q148_fd_audit(sf).set_index("fd")
    assert not got.loc["event_id->ts", "holds"]
    assert got.loc["event_id->ts", "n_violations"] == 1
    assert got.loc["event_id->user_id", "holds"]          # 1->1 both rows
    # view maps to {}, x ; click maps to y  → 3 pairs, 2 types
    assert got.loc["event_type->props", "n_violations"] == 1
    assert not got.loc["event_type->props", "holds"]


def test_dedup_loss_weights_planted(ray_session, tmp_path):
    """A 3-copy family weights 333333 ppm each, a pair 500000, a
    unique doc 1000000; weights × size sum to ~1e6 per family."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q151_dedup_loss_weights,
    )

    tri = "the same exact words repeated here for this document body"
    pair = "another shared body of text with plenty of tokens inside it"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en"] * 6,
        "text": [tri, tri, tri, pair, pair,
                 "totally unrelated first content string with many words"]}))
    got = q151_dedup_loss_weights(sf).set_index("doc_id")
    assert got.loc[[1, 2, 3], "weight_ppm"].tolist() == [333333] * 3
    assert got.loc[[4, 5], "weight_ppm"].tolist() == [500000] * 2
    assert got.loc[6, "weight_ppm"] == 1_000_000
    assert (got["cluster_size"] * got["weight_ppm"] <= 1_000_000).all()


def test_contamination_pairs_planted(ray_session, tmp_path):
    """Hand-computed leak evidence: test doc 10 has 2 shingles; train
    doc 1 (exact copy) shares both → ppm 1e6; train doc 2 shares one
    → 500000; train doc 3 shares none and emits no row."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q152_contamination_pairs,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [10, 1, 2, 3],
        "lang": ["en"] * 4,
        "text": ["a b c d e f",          # test: shingles abcde, bcdef
                 "a b c d e f",          # train: both shared
                 "a b c d e x",          # train: shares abcde only
                 "q r s t u v"]}))       # train: disjoint
    got = q152_contamination_pairs(sf).set_index("train_id")
    assert sorted(got.index) == [1, 2]
    assert got.loc[1, "n_shared"] == 2
    assert got.loc[1, "overlap_ppm"] == 1_000_000
    assert got.loc[2, "n_shared"] == 1
    assert got.loc[2, "overlap_ppm"] == 500_000
    assert (got["test_id"] == 10).all()


def test_keep_n_dedup_planted(ray_session, tmp_path):
    """3-copy family keeps its two smallest doc_ids; a pair keeps
    both; a unique doc keeps."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q153_keep_n_dedup

    tri = "the same exact words repeated here for this document body"
    pair = "another shared body of text with plenty of tokens inside it"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [5, 2, 9, 4, 7, 6],
        "lang": ["en"] * 6,
        "text": [tri, tri, tri, pair, pair,
                 "totally unrelated first content string with many words"]}))
    got = q153_keep_n_dedup(sf).set_index("doc_id")
    assert got.loc[2, "keep"] and got.loc[5, "keep"]
    assert not got.loc[9, "keep"]               # third copy dropped
    assert got.loc[[4, 7], "keep"].all()
    assert got.loc[6, "keep"]
    assert got.loc[9, "rnk"] == 3


def test_corpus_minhash_drift_gates(ray_session, tmp_path):
    """Corpus fingerprint semantics: identical corpora estimate
    J = 1.0 exactly; disjoint-vocab corpora ~0; A vs A∪B (equal-size
    disjoint shingle sets) lands within 4σ of 1/2.  Merge = column
    min: fingerprint(A∪B) == min(fp(A), fp(B))."""
    import numpy as np
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.signatures import (
        corpus_jaccard_estimate,
        corpus_minhash,
    )

    cfg = DedupConfig(join_num_partitions=4)
    rng = np.random.default_rng(3)

    def corpus(vocab, n_docs, ln=40):
        return rd.from_pandas(pd.DataFrame({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text_norm": [" ".join(rng.choice(vocab, ln))
                          for _ in range(n_docs)]}))

    va = [f"a{i}" for i in range(30)]
    vb = [f"b{i}" for i in range(30)]
    A = corpus(va, 40)
    fa = corpus_minhash(A, cfg)
    assert corpus_jaccard_estimate(fa, fa) == 1.0

    B = corpus(vb, 40)
    fb = corpus_minhash(B, cfg)
    assert corpus_jaccard_estimate(fa, fb) < 0.1

    # A vs A∪B where |shingles(A)| ≈ |shingles(B)|, disjoint → J ≈ 1/2
    fab = np.minimum(fa, fb)          # the merge IS the union sketch
    j = corpus_jaccard_estimate(fa, fab)
    sigma = (0.5 * 0.5 / len(fa)) ** 0.5
    assert abs(j - 0.5) < 4 * sigma + 0.1


def test_source_similarity_sketch_planted(ray_session, tmp_path):
    """Two mirrored feeds estimate J = 1.0 (identical shingle sets);
    a disjoint-vocab feed estimates near 0 against both."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q156_source_similarity_sketch,
    )

    rng = np.random.default_rng(5)
    va = [f"w{i}" for i in range(30)]
    vz = [f"z{i}" for i in range(30)]
    texts_a = [" ".join(rng.choice(va, 40)) for _ in range(20)]
    texts_z = [" ".join(rng.choice(vz, 40)) for _ in range(20)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "lang": ["en"] * 60,
        "source": ["feedA"] * 20 + ["feedB"] * 20 + ["feedZ"] * 20,
        "text": texts_a + texts_a + texts_z,   # B mirrors A exactly
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q156_source_similarity_sketch(sf).set_index(
        ["source_a", "source_b"])
    assert got.loc[("feedA", "feedB"), "jaccard_est"] == 1.0
    assert got.loc[("feedA", "feedZ"), "jaccard_est"] < 0.1
    assert got.loc[("feedB", "feedZ"), "jaccard_est"] < 0.1


def test_readability_counts_planted(ray_session, tmp_path):
    """Hand counts: 'Hello there. How are you?!' → 5 words, 2
    sentence runs ('.'; '?!'), vowel groups he-llo-the-re-how-a-re-you
    = 8; a punctuation-free doc floors n_sentences at 1."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q154_readability_counts,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2],
        "lang": ["en"] * 2,
        "text": ["Hello there. How are you?!", "no punctuation here"]}))
    got = q154_readability_counts(sf).set_index("doc_id")
    assert got.loc[1, "n_words"] == 5
    assert got.loc[1, "n_sentences"] == 2
    assert got.loc[1, "n_vowel_groups"] == 8
    assert got.loc[2, "n_sentences"] == 1


def test_leakfree_split_planted(ray_session, tmp_path):
    """Dup-family members must land in the SAME split (the property
    q56's doc-level hash lacks): plant an exact-dup pair whose two
    doc-level q56 splits DIFFER, assert q158 gives them one split —
    the fmix32 of their cluster id (= min member doc_id)."""
    import pandas as pd

    from event_deduplication_ray.functions.hashing import sample_hash32
    from event_deduplication_ray.pipelines.queries import q158_leakfree_split

    T_TRAIN, T_VAL = 3435973836, 3865470566

    def split_of(key: int) -> str:
        h = int(sample_hash32(np.array([key], dtype=np.int64))[0])
        return "train" if h < T_TRAIN else ("val" if h < T_VAL else "test")

    # find a partner id whose DOC-level split differs from id 1's
    base = 1
    partner = next(i for i in range(2, 4000)
                   if split_of(i) != split_of(base))
    dup_text = "the quick brown fox jumps over the lazy sleeping dog again"
    docs = pd.DataFrame({
        "doc_id": [base, partner, 9001, 9002],
        "lang": ["en"] * 4,
        "text": [dup_text, dup_text,
                 "completely different first unique document body text here",
                 "another entirely unrelated second unique document body"],
    })
    sf = _write_tbl(tmp_path, "documents", docs)
    got = q158_leakfree_split(sf).set_index("doc_id")
    # the dup pair clusters together and shares ONE split ...
    assert got.loc[base, "cluster_id"] == got.loc[partner, "cluster_id"] == base
    assert got.loc[base, "split"] == got.loc[partner, "split"] == split_of(base)
    # ... even though their doc-level (q56) splits disagree
    assert split_of(base) != split_of(partner)
    # singletons hash their own id
    for d in (9001, 9002):
        assert got.loc[d, "cluster_id"] == d
        assert got.loc[d, "split"] == split_of(d)


def test_key_skew_planted(ray_session, tmp_path):
    """Hand-counted skew stats: user counts [5,1,1,1] → p99 index
    ceil(.99*4)=4 → 5, top1 5/8 = 625000 ppm; event_type counts
    [6,2] → p99 index 2 → 6, top1 750000 ppm."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q159_key_skew

    ev = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": pd.to_datetime(["2025-01-01"] * 8),
        "user_id": np.array([1, 1, 1, 1, 1, 2, 3, 4], dtype=np.int64),
        "event_type": ["a", "a", "a", "a", "a", "a", "b", "b"],
        "value": np.ones(8),
        "props": ["{}"] * 8,
    })
    sf = _write_tbl(tmp_path, "events", ev)
    got = q159_key_skew(sf).set_index("key_col")
    u = got.loc["user_id"]
    assert (u["n_keys"], u["total_rows"], u["max_count"]) == (4, 8, 5)
    assert u["p99_count"] == 5 and u["top1_share_ppm"] == 625000
    t = got.loc["event_type"]
    assert (t["n_keys"], t["total_rows"], t["max_count"]) == (2, 8, 6)
    assert t["p99_count"] == 6 and t["top1_share_ppm"] == 750000


def test_hard_negatives_planted(ray_session, tmp_path):
    """Mined hard negatives: two docs sharing a real 40-token
    boilerplate block inside otherwise-disjoint bodies collide in the
    substring tier with low containment → mined with decision-below-
    threshold semantics; exact duplicates (a true match) must NOT
    appear as negatives."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q162_hard_negatives

    shared = " ".join(f"boiler{i}" for i in range(40))
    ta = shared + " " + " ".join(f"alpha{i} body" for i in range(120))
    tb = shared + " " + " ".join(f"beta{i} text" for i in range(120))
    dup = "identical twin document body " * 10
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en"] * 5,
        "text": [ta, tb,
                 "totally unrelated filler about glacier moraines and "
                 "sediment transport in braided river systems",
                 dup, dup],
    }))
    got = q162_hard_negatives(sf)
    mined = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in mined
    row = got.set_index(["id_a", "id_b"]).loc[(1, 2)]
    assert row["tier"] == "substring"
    assert 0.1 <= row["score"] < 0.8
    assert (4, 5) not in mined          # true dups are not negatives


def test_fragile_clusters_planted(ray_session, tmp_path):
    """Exact shingle arithmetic plants a star and a triangle: hub H
    (60 tokens, 56 shingles) vs leaves differing in ONE token at
    spaced positions → J(H, leaf) = 51/61 ≈ 0.836 (edge) while leaf
    pairs share 46/66 ≈ 0.697 (< 0.75, no edge) — removing H splits
    the cluster, so H alone is the articulation doc; three exact
    copies form a triangle with NO articulation."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q163_fragile_clusters

    toks = [f"tok{i:02d}" for i in range(60)]
    hub = " ".join(toks)

    def leaf(pos):
        t = list(toks)
        t[pos] = f"changed{pos}"
        return " ".join(t)

    tri = "three identical triangle documents sharing every shingle " * 3
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 10, 11, 12, 20],
        "lang": ["en"] * 8,
        "text": [hub, leaf(10), leaf(30), leaf(50),
                 tri, tri, tri,
                 "a lone unrelated document about tidal estuaries"],
    }))
    got = q163_fragile_clusters(sf)
    # the star cluster (id 1) reports exactly the hub; all checked
    assert got["checked"].all()
    star = got[got["cluster_id"] == 1]
    assert star["doc_id"].tolist() == [1]
    assert star["n_members"].tolist() == [4]
    # the triangle cluster (id 10) has no articulation rows
    assert (got["cluster_id"] != 10).all()
    # singletons never appear
    assert (got["cluster_id"] != 20).all()


def test_editdist_dedup_planted(ray_session, tmp_path):
    """The driver corpus has no head-level typo variants, so the q165
    oracle parity is near-trivial — plant the three FastSS cases:
    a substitution pair (equal-length keys), an indel pair (15- vs
    16-char keys), a distance-2 non-pair, and a normalized exact copy
    that must collapse into the key's n_docs instead of pairing."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q165_editdist_dedup

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["quick brown fox!",      # key "quick brown fox"
                 "Quick brown fix",       # substitution: o -> i
                 "quick brown foxy",      # insertion: trailing y
                 "QUICK, brown fox",      # distance-0 copy of doc 1
                 "quack brawn fix",       # distance 2 from doc 2
                 ""],                     # empty key filtered
    }))
    got = q165_editdist_dedup(sf)
    assert list(zip(got["id_a"], got["id_b"])) == [(1, 2), (1, 3)]
    sub = got.iloc[0]
    assert sub["key_a"] == "quick brown fox" and sub["n_docs_a"] == 2
    assert sub["key_b"] == "quick brown fix" and sub["n_docs_b"] == 1
    indel = got.iloc[1]
    assert indel["key_b"] == "quick brown foxy"


def test_novelty_planted(ray_session, tmp_path):
    """Hand-computed novelty ppm: an original 6-token doc owns both
    of its 5-gram shingles (1e6), its exact copy owns none (0), a
    1-token-shifted doc shares one shingle and owns two (666666),
    and the short-doc stub shingle behaves the same way (owner gets
    1e6, its copy 0).  A zero-token doc emits no shingles and is
    absent from the result."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q166_novelty

    six = "w0 w1 w2 w3 w4 w5"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en"] * 6,
        "text": [six,                       # shingles {01234, 12345}
                 six,                       # exact copy: 0 novel
                 "w1 w2 w3 w4 w5 w6 w7",    # {12345, 23456, 34567}
                 "x y",                     # stub shingle, novel
                 "x y",                     # stub copy: 0 novel
                 ""],                       # no shingles: absent
    }))
    got = q166_novelty(sf)
    assert got["doc_id"].tolist() == [1, 2, 3, 4, 5]
    by = got.set_index("doc_id")
    assert by.loc[1, "n_shingles"] == 2 and by.loc[1, "novel_ppm"] == 1_000_000
    assert by.loc[2, "n_shingles"] == 2 and by.loc[2, "novel_ppm"] == 0
    assert (by.loc[3, "n_shingles"], by.loc[3, "n_novel"]) == (3, 2)
    assert by.loc[3, "novel_ppm"] == 666_666
    assert by.loc[4, "novel_ppm"] == 1_000_000
    assert by.loc[5, "novel_ppm"] == 0


def test_template_dedup_planted(ray_session, tmp_path):
    """Digit-masked template grouping: two weather pages differing
    only in the date plus an exact copy form ONE template (n_copies 3,
    n_variants 2 — the copy collapses into its variant); a digit-free
    exact-dup pair degenerates to q59 semantics (n_variants 1);
    digit-only docs all mask to the template '#' and group together
    (number-only pages ARE one template family); a unique doc emits
    nothing."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q167_template_dedup

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": ["Weather report for 2024-01-02: sunny",
                 "Weather report for 2024-01-03: sunny",
                 "weather report for 2024 01 02  sunny",  # exact variant copy
                 "hello world", "Hello, world!",          # digit-free dups
                 "12345", "67890",                        # both template '#'
                 "a unique document about estuaries"],
    }))
    got = q167_template_dedup(sf)
    assert got["template_id"].tolist() == [1, 4, 6]
    assert got["n_copies"].tolist() == [3, 2, 2]
    assert got["n_variants"].tolist() == [2, 1, 2]


def test_overlap_stitch_planted(ray_session, tmp_path):
    """Stitch semantics: doc 2 begins with doc 1's last 8 tokens
    (pair (1,2)); doc 3 shares doc 1's HEAD instead (no pair); doc 4
    is a 7-token fragment (below W, emits no keys); docs 5/6 are
    identical 8-token docs, so head == tail both ways and they stitch
    in BOTH directions — the documented W-token-copy edge."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q168_overlap_stitch

    w = [f"w{i}" for i in range(20)]
    eight = " ".join(w[9:17])                       # doc 1's last 8
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [" ".join(w[:17]),                  # tokens w0..w16
                 eight + " tail continues here",    # starts with seam
                 " ".join(w[:9]),                   # shares doc1 head
                 " ".join(w[:7]),                   # too short
                 "a b c d e f g h",
                 "a b c d e f g h"],
    }))
    got = q168_overlap_stitch(sf)
    assert list(zip(got["id_a"], got["id_b"])) == [(1, 2), (5, 6), (6, 5)]


def test_stitch_rewrite_planted(ray_session, tmp_path):
    """Chain reassembly semantics: a 3-fragment chain 1→2→3 merges
    with both 8-token seams trimmed once (hand-built expected token
    stream); an ambiguous fork (4's tail continues into BOTH 5 and 6)
    is dropped entirely; a 2-cycle of identical 8-token docs has no
    head and never assembles."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q169_stitch_rewrite

    w = [f"w{i}" for i in range(40)]
    f1 = " ".join(w[0:16])        # w0..w15
    f2 = " ".join(w[8:28])        # starts with f1's last 8 (w8..w15)
    f3 = " ".join(w[20:30])       # starts with f2's last 8 (w20..w27)
    fork = " ".join(w[30:38])
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": [f1, f2, f3,
                 "lead in tokens here " + fork,   # tail = fork key
                 fork + " branch one after",      # head = fork key
                 fork + " branch two after",      # head = fork key
                 "a b c d e f g h",               # 2-cycle pair
                 "a b c d e f g h"],
    }))
    got = q169_stitch_rewrite(sf)
    assert got["chain_id"].tolist() == [1]
    assert got["n_fragments"].tolist() == [3]
    assert got["text_merged"].tolist() == [" ".join(w[0:30])]


def test_corpus_growth_planted(ray_session, tmp_path):
    """Hand-computed growth curve over ids 0..9 (bucket == doc_id):
    doc 0 owns its 2 shingles; doc 1 is an exact copy (0 new); doc 5
    shifts by one token (1 new of 2); docs 2-4 and 6-9 are short stub
    docs — 2/3/4 share one stub family (owner 2), 6-9 are distinct.
    Cumulative column must sum exactly."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import q170_corpus_growth

    six = "w0 w1 w2 w3 w4 w5"
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": list(range(10)),
        "lang": ["en"] * 10,
        "text": [six, six, "s s", "s s", "s s",
                 "w1 w2 w3 w4 w5 w6",
                 "u0", "u1", "u2", "u3"],
    }))
    got = q170_corpus_growth(sf)
    assert got["bucket"].tolist() == list(range(10))
    assert got["n_docs"].tolist() == [1] * 10
    assert got["n_new_shingles"].tolist() == [2, 0, 1, 0, 0, 1, 1, 1, 1, 1]
    assert got["cum_new_shingles"].tolist() == [2, 2, 3, 3, 3, 4, 5, 6, 7, 8]


def test_source_uniqueness_planted(ray_session, tmp_path):
    """Hand-worked uniqueness: feed A's 6-token doc owns 2 shingles,
    one of which feed B republishes verbatim — A is 2 shingles / 1
    unique (500000 ppm), B's doc shares one and adds two of its own
    (3 / 2 = 666666 ppm), and feed C's stub doc is fully unique
    (1 / 1).  Exact counts, not sketch estimates (q156's contract)."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q171_source_uniqueness,
    )

    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "lang": ["en"] * 3,
        "source": ["feedA", "feedB", "feedC"],
        "text": ["w0 w1 w2 w3 w4 w5",        # {01234, 12345}
                 "w1 w2 w3 w4 w5 w6 w7",     # {12345, 23456, 34567}
                 "tiny stub"],               # one stub shingle
    }))
    got = q171_source_uniqueness(sf)
    assert got["source"].tolist() == ["feedA", "feedB", "feedC"]
    assert got["n_shingles"].tolist() == [2, 3, 1]
    assert got["n_unique"].tolist() == [1, 2, 1]
    assert got["unique_ppm"].tolist() == [500_000, 666_666, 1_000_000]


def test_audience_overlap_hll(ray_session, tmp_path):
    """Inclusion-exclusion over HLLs: planted 10k-viewer / 10k-
    purchaser table with exactly 5k shared users — each estimate
    within 3σ where the intersection's σ is the SUM of the three
    sketches' (p=12 → 1.63 % each); and on the real sf0.001 events
    the estimate brackets the exact pandas intersection the same
    way."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq_

    from event_deduplication_ray.pipelines.queries import (
        q172_audience_overlap_hll,
    )

    viewers = np.arange(10_000, dtype=np.int64)
    buyers = np.arange(5_000, 15_000, dtype=np.int64)
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(20_000, dtype=np.int64),
        "event_type": ["view"] * 10_000 + ["purchase"] * 10_000,
        "user_id": np.concatenate([viewers, buyers]),
        "ts": pd.Timestamp("2024-01-01"),
        "value": 1.0,
        "props": "{}",
    }))
    got = q172_audience_overlap_hll(sf)
    sig = 1.04 / np.sqrt(4096)
    assert abs(got["n_viewers_est"][0] - 10_000) <= 3 * sig * 10_000
    assert abs(got["n_purchasers_est"][0] - 10_000) <= 3 * sig * 10_000
    # intersection error compounds all three sketches
    assert abs(got["n_both_est"][0] - 5_000) <= 3 * sig * (10_000 + 10_000 + 15_000)

    ev = pq_.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["event_type", "user_id"]).to_pandas()
    va = set(ev.loc[ev["event_type"] == "view", "user_id"])
    pa_ = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    exact = len(va & pa_)
    got2 = q172_audience_overlap_hll("/root/testdata/sf0.001")
    tol = 3 * sig * (len(va) + len(pa_) + len(va | pa_))
    assert abs(got2["n_both_est"][0] - exact) <= max(tol, 5)


def test_boilerplate_lines_planted(ray_session, tmp_path):
    """Mining semantics: a cookie-banner line shared by 3 docs ranks
    first, a footer in 2 docs second; a line REPEATED inside one doc
    counts that doc once (distinct-doc df); the (df desc, line asc)
    tie-break is deterministic; df=1 lines never appear."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q173_boilerplate_lines,
    )

    banner = "We use cookies to improve your experience."
    footer = "All rights reserved."
    sf = _write_tbl(tmp_path, "documents", pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"{banner}\nunique alpha\n{footer}",
                 f"{banner}\n{banner}\nunique beta",   # in-doc repeat
                 f"intro text\n{banner}\n{footer}"],
    }))
    got = q173_boilerplate_lines(sf)
    assert got["line"].tolist() == [banner, footer]
    assert got["df"].tolist() == [3, 2]


def test_audience_overlap_hll_one_sided(ray_session, tmp_path):
    """A present side's cardinality survives the other side being
    absent (views exist, zero purchase events): viewers estimate is
    within sketch error, purchasers/intersection are ~0, and all
    three columns are explicit int64 regardless of which branch
    built them."""
    import numpy as np
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        q172_audience_overlap_hll,
    )

    viewers = np.arange(8_000, dtype=np.int64)
    sf = _write_tbl(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(8_000, dtype=np.int64),
        "event_type": ["view"] * 8_000,
        "user_id": viewers,
        "ts": pd.Timestamp("2024-01-01"),
        "value": 1.0,
        "props": "{}",
    }))
    got = q172_audience_overlap_hll(sf)
    sig = 1.04 / np.sqrt(4096)
    assert abs(got["n_viewers_est"][0] - 8_000) <= 3 * sig * 8_000
    # empty-register HLL linear-counts to ~0; intersection clamps at 0
    assert got["n_purchasers_est"][0] == 0
    assert got["n_both_est"][0] == 0
    assert all(str(got[c].dtype) == "int64" for c in got.columns)


def test_stitch_rewrite_drops_seam_hash_collision():
    """A u64 seam-hash COLLISION between two different 8-token seams
    must not produce a corrupted merged document: the assembly kernel
    string-verifies each seam before trimming and drops the whole
    chain.  Drives `_assemble_stitch_chains` directly with a forged
    collision chain (the Ray path can't plant a real u64 collision);
    a genuine chain in the same partition still assembles."""
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import (
        _STITCH_W,
        _assemble_stitch_chains,
    )

    w = [f"w{i}" for i in range(30)]
    good_a = " ".join(w[0:16])        # tail = w8..w15
    good_b = " ".join(w[8:24])        # head = w8..w15 (true seam)
    bad_a = " ".join(w[0:16])
    bad_b = " ".join(["x"] * _STITCH_W + ["after", "collision"])
    df = pd.DataFrame({
        "chain_id": [1, 1, 2, 2],
        "pos": [0, 1, 0, 1],
        "norm": [good_a, good_b, bad_a, bad_b],
    })
    got = _assemble_stitch_chains(df)
    # chain 2's seam tokens don't match → dropped, not corrupted
    assert got["chain_id"].tolist() == [1]
    assert got["text_merged"].tolist() == [" ".join(w[0:24])]
