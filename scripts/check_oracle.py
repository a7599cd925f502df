"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf and compare to oracle_sql() via DuckDB
(row count + sorted-column order-insensitive value comparison)."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(obj, Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        status = "ok  "
        if len(got) != len(want):
            status = "FAIL"
            detail = f"rows {len(got)} != {len(want)}"
        elif list(got.columns) != list(want.columns):
            status = "FAIL"
            detail = f"cols {list(got.columns)} != {list(want.columns)}"
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            detail = f"values differ in {bad_cols}"
            status = "FAIL"
        else:
            detail = f"rows={len(got)}"
        if status == "FAIL":
            failures += 1
            print(f"{status} {name}: {detail} [{dt:.1f}s]")
            for c in got.columns:
                if not got[c].equals(want[c]):
                    mask = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
                    if mask.any():
                        i = mask.idxmax()
                        print(f"      first diff col={c} row={i}: "
                              f"got={got[c][i]!r} want={want[c][i]!r}")
        else:
            print(f"{status} {name}: {detail} [{dt:.1f}s]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # optional argv[2]: comma-separated query-name prefixes to run
    flt = None
    if len(sys.argv) > 2:
        prefixes = [p for p in sys.argv[2].split(",") if p]
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as _E

        flt = {n for n in _E.queries()
               if any(n.startswith(p) for p in prefixes)}
    raise SystemExit(main(sf, flt))
