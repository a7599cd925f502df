"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-dup pipeline on the deterministic CC-style corpus
    derived from /root/testdata/sf0.001 → canonical representative
    table (one row per cluster)."""
    from event_deduplication_ray import fixtures as F
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path

    corpus = F.materialize_corpus(
        "/tmp/edr_corpora", 1000, seed=42,
        base_texts=F.load_base_texts("/root/testdata/sf0.001"),
    )
    cfg = DedupConfig(use_substring=True, use_simhash=True)
    res = dedup_path(f"{corpus}/docs", cfg)
    return res.canonical


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator (SURVEY.md §2)."""
    from event_deduplication_ray.pipelines.queries import RAY_QUERIES

    return dict(RAY_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for the SQL-expressible queries; dedup /
    similarity / fingerprint pipelines are rows-only checked."""
    from event_deduplication_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
