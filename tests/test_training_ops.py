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
