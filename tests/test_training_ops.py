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
