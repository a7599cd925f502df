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

from event_deduplication_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
