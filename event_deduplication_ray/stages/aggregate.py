"""Scalable grouped aggregation: per-batch partial aggregates
(vectorized pandas inside map_batches) + combine.

The guide's "pre-aggregate inside map_batches before a groupby"
pattern: each batch emits one row per (key, partial) — data shrinks by
orders of magnitude before any shuffle.  Two combine strategies:

- ``grouped_aggregate``: driver-side combine (tiny result — dashboards,
  TPC-H-style reports with bounded group counts; reference analog Q5
  dashboard aggregates, /root/reference/src/event_dedup/api/routes/
  dashboard.py:27-84);
- ``grouped_aggregate_distributed``: partition_apply combine for
  high-cardinality keys (per-user, per-document) — stays distributed.

Supported specs: sum, count, min, max, mean (decomposed into
sum+count so partials merge exactly).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from event_deduplication_ray.stages.shuffle import partition_apply

_PARTIAL_KINDS = {"sum", "count", "min", "max"}


def _normalize_specs(aggs: Sequence[tuple[str, str, str]]):
    """aggs: (out_name, kind, col).  mean decomposes to sum+count."""
    partial_specs: list[tuple[str, str, str]] = []   # (tmp_name, kind, col)
    finals: list[tuple[str, str, str]] = []          # (out, kind, tmp_or_pair)
    for out, kind, col in aggs:
        if kind == "mean":
            partial_specs.append((f"__s_{out}", "sum", col))
            partial_specs.append((f"__c_{out}", "count", col))
            finals.append((out, "mean", f"__s_{out}|__c_{out}"))
        elif kind in _PARTIAL_KINDS:
            partial_specs.append((f"__{kind}_{out}", kind, col))
            finals.append((out, kind, f"__{kind}_{out}"))
        else:
            raise ValueError(f"unsupported agg kind {kind!r}")
    return partial_specs, finals


def _partial_frame(df: pd.DataFrame, keys: list[str], partial_specs) -> pd.DataFrame:
    g = df.groupby(keys, dropna=False, sort=False)
    cols = {}
    for tmp, kind, col in partial_specs:
        if kind == "count":
            cols[tmp] = g[col].count() if col != "*" else g.size()
        elif kind == "sum":
            cols[tmp] = g[col].sum()
        elif kind == "min":
            cols[tmp] = g[col].min()
        elif kind == "max":
            cols[tmp] = g[col].max()
    return pd.DataFrame(cols).reset_index()


def _combine_frame(parts: pd.DataFrame, keys: list[str], partial_specs, finals) -> pd.DataFrame:
    g = parts.groupby(keys, dropna=False, sort=False)
    merged = {}
    for tmp, kind, _ in partial_specs:
        if kind in ("sum", "count"):
            merged[tmp] = g[tmp].sum()
        elif kind == "min":
            merged[tmp] = g[tmp].min()
        elif kind == "max":
            merged[tmp] = g[tmp].max()
    m = pd.DataFrame(merged)
    out = pd.DataFrame(index=m.index)
    for name, kind, src in finals:
        if kind == "mean":
            s, c = src.split("|")
            out[name] = m[s] / m[c]
        elif kind == "count":
            out[name] = m[src].astype(np.int64)
        else:
            out[name] = m[src]
    return out.reset_index()


def grouped_aggregate(
    ds: Dataset, keys: list[str], aggs: Sequence[tuple[str, str, str]]
) -> pd.DataFrame:
    """Low-cardinality grouped aggregate → pandas DataFrame.

    aggs: sequence of (output_name, kind, column) with kind in
    {sum, count, min, max, mean}; column "*" allowed for count.
    """
    partial_specs, finals = _normalize_specs(aggs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _partial_frame(df, keys, partial_specs)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(columns=keys + [f[0] for f in finals])
    return _combine_frame(parts, keys, partial_specs, finals)


def grouped_aggregate_distributed(
    ds: Dataset, keys: list[str], aggs: Sequence[tuple[str, str, str]],
    num_parts: int = 32,
) -> Dataset:
    """High-cardinality grouped aggregate → Dataset (stays distributed).

    Keys must be hashable int64-like columns for partitioning; the
    partial stage shrinks rows before the single shuffle.
    """
    partial_specs, finals = _normalize_specs(aggs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _partial_frame(df, keys, partial_specs)

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return _combine_frame(df, keys, partial_specs, finals)

    return partition_apply(parts, keys, num_parts, combine)
