"""event_deduplication_ray — Ray-Data-native near-duplicate detection engine.

A from-scratch re-expression of the capability stack of the reference
repo skarl/event_deduplication (blocking → candidate pairs → pairwise
verification → threshold decision → graph clustering → canonical
synthesis → evaluation → idempotent ingestion → review edits → export)
as an idiomatic ``ray.data.Dataset`` pipeline over Parquet tables of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``.

Design stance (not a port):
- every stage is a ``map_batches`` transform over zero-copy Arrow
  batches or a groupby shuffle; no row loops in hot paths;
- stateful stages (MinHash permutation banks) are actor pools;
- the only all-to-all exchanges are LSH band grouping, candidate-pair
  dedup, union-find label rounds and per-cluster synthesis — each with
  an explicitly chosen key (see SURVEY.md §7.4);
- library code never calls ``ray.init`` (driver contract).
"""

def _tune_allocators() -> None:
    """Keep freed pages in-process instead of returning them to the OS.

    Page faults in this environment cost ~15-20 µs (virtualized EPT +
    mmap_lock contention across 32 workers); default allocator policy
    (glibc munmap of >128 KB blocks, jemalloc dirty-page decay)
    re-faults the same working set continuously — measured 30M faults
    (~120 GB re-touched) for a 2M-doc pipeline pass.  Raising the
    glibc mmap/trim thresholds and disabling jemalloc decay makes
    freed blocks reusable while still warm.  Runs once per process at
    import (workers import this package inside every task fn).
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD, M_TRIM_THRESHOLD = -3, -1
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass
    try:
        import pyarrow as _pa

        _pa.jemalloc_set_decay_ms(1_000_000)
    except Exception:
        pass


_tune_allocators()

from event_deduplication_ray.config import DedupConfig  # noqa: E402


def __getattr__(name):  # lazy public API (avoids importing ray at package import)
    if name in ("dedup_docs", "dedup_path", "dedup_path_resumable", "DedupResult"):
        from event_deduplication_ray.pipelines import dedup_pipeline as _dp

        return getattr(_dp, name)
    if name == "incremental_add":
        from event_deduplication_ray.pipelines.incremental import incremental_add

        return incremental_add
    if name == "evaluate_pairs":
        from event_deduplication_ray.pipelines.eval import evaluate_pairs

        return evaluate_pairs
    raise AttributeError(name)


__all__ = [
    "DedupConfig", "dedup_docs", "dedup_path", "dedup_path_resumable",
    "DedupResult", "incremental_add", "evaluate_pairs",
]
__version__ = "0.1.0"
