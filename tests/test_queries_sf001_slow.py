"""Slow sweep: queries() vs oracle_sql() at sf0.01 (VERDICT r3 §gap 1).

The default suite oracle-checks every SQL-expressible query at
sf0.001 only — one partition per key for many shuffles, so a
partial-combine bug that needs multiple partitions per key could
hide.  This sweep re-runs the SAME gate lists at sf0.01 (10× rows,
multi-partition groups on every shuffle path) under `-m slow`
(excluded from the default run; `python -m pytest -m slow -q` runs
it).  The lists are imported from test_queries_sf0001 so the two
gates can never drift.
"""

import duckdb
import pandas as pd
import pytest

from test_queries_sf0001 import (
    ROWS_ONLY,
    SQL_CHECKED,
    TABLES,
    _canon,
    _to_pandas,
)

pytestmark = pytest.mark.slow

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con01():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query_sf001(name, con01):
    from event_deduplication_ray.pipelines.queries import ORACLE_SQL, RAY_QUERIES

    got = _canon(_to_pandas(RAY_QUERIES[name](SF01)))
    want = _canon(con01.execute(ORACLE_SQL[name]).fetchdf())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs_sf001(name):
    from event_deduplication_ray.pipelines.queries import RAY_QUERIES

    got = _to_pandas(RAY_QUERIES[name](SF01))
    assert got is not None
    if len(got) > 0:
        assert len(got.columns) > 0
