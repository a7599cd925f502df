"""Vectorized shuffle primitives on top of Ray Data.

Ray Data's ``groupby(key).aggregate(...)`` accumulates per row in
Python — measured ~100k rows/s on this box — far too slow for band
tables with 16 rows per document.  The scalable pattern used by every
wide stage in this engine instead is:

1. append a partition id ``p = hash(key) % P`` in a vectorized
   ``map_batches`` (pure numpy);
2. ``groupby("p").map_groups(fn)`` where ``fn`` receives ALL rows of
   one partition as a single pandas DataFrame and does the real work
   with C-speed pandas/numpy groupbys, merges and sorts.

Because identical keys always land in the same partition, any
per-key aggregation done inside ``fn`` is globally correct.  ``P`` is
the unit of shuffle parallelism — size it to ~cluster cores (or data
size / target partition bytes at scale); it is a config knob, not a
hard-coded constant.  Skew: a single hot *key* still lands in one
partition, but all per-partition work is vectorized so a hot band key
costs numpy time, not Python time; pair-enumeration caps handle the
quadratic part (see pairs.py).

Joins use the same trick (tag sides, union, cogroup per partition) —
``cogroup_apply`` — which beats ``Dataset.join`` (measured 13 s for a
5M×3.5M join) by doing per-partition ``pd.merge``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_PART_COL = "__part"


def _key_to_part(arrs: list[np.ndarray], num_parts: int) -> np.ndarray:
    """Mix key column(s) (int-like or string) into a partition id."""
    acc = np.zeros(len(arrs[0]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for a in arrs:
            if a.dtype.kind not in "iuf":
                v = pd.util.hash_array(np.asarray(a, dtype=object))
            elif a.dtype.kind == "f":
                v = pd.util.hash_array(a)
            else:
                v = a.astype(np.uint64, copy=False)
            acc ^= v + np.uint64(0x9E3779B97F4A7C15) + (acc << np.uint64(6)) + (acc >> np.uint64(2))
        z = (acc ^ (acc >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(31)
    return (z % np.uint64(num_parts)).astype(np.int32)


def with_partition_col(ds: Dataset, key_cols: list[str], num_parts: int) -> Dataset:
    """Append the partition id column (vectorized, no shuffle)."""

    def add_part(b: pa.Table) -> pa.Table:
        arrs = [b[c].to_numpy(zero_copy_only=False) for c in key_cols]
        return b.append_column(_PART_COL, pa.array(_key_to_part(arrs, num_parts)))

    return ds.map_batches(add_part, batch_format="pyarrow")


def partition_apply(
    ds: Dataset,
    key_cols: list[str],
    num_parts: int,
    fn: Callable,
    batch_format: str = "pandas",
) -> Dataset:
    """Shuffle by hash(key_cols) into num_parts partitions and apply a
    vectorized function to each whole partition.

    ``fn`` sees every row whose key hashes to the partition — same keys
    are never split — and must be vectorized (pandas groupby / merge /
    numpy or pyarrow.compute), never a Python loop over rows.  Use
    ``batch_format="pyarrow"`` when the rows carry list columns
    (signatures) that must not round-trip through pandas object dtype.
    """
    parted = with_partition_col(ds, key_cols, num_parts)

    from event_deduplication_ray.functions.hashing import warm_numpy_heap

    if batch_format == "pandas":
        def run(g: pd.DataFrame) -> pd.DataFrame:
            warm_numpy_heap()
            return fn(g.drop(columns=[_PART_COL]))
    else:
        def run(t: pa.Table) -> pa.Table:
            warm_numpy_heap()
            return fn(t.drop_columns([_PART_COL]))

    return parted.groupby(_PART_COL).map_groups(run, batch_format=batch_format)


def cogroup_apply(
    left: Dataset,
    right: Dataset,
    left_key: list[str],
    right_key: list[str],
    num_parts: int,
    fn: Callable,
    batch_format: str = "pandas",
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
) -> Dataset:
    """Co-partition two datasets on their keys and apply ``fn(l, r)``
    per partition (a vectorized partitioned hash join / cogroup).

    Schemas of the two sides may differ; sides are tagged, unioned
    (one shuffle), split back inside the partition.  Key columns must
    be int64-like.  With ``batch_format="pyarrow"`` the two sides are
    passed as pa.Tables and ``fn`` must return a pa.Table — use this
    when rows carry fixed-size-list signature columns (a pandas
    round-trip turns them into per-row Python objects).

    Pass ``left_schema``/``right_schema`` (pa.Schema) whenever the
    input is a LAZY dataset whose schema would otherwise be probed
    with ``.schema()`` — for a shuffle-rooted dataset that probe
    executes the whole upstream once just to see one block, and the
    real run then executes it again (a silent 2x).
    """
    import pyarrow.compute as pc

    l_schema = left_schema if left_schema is not None else left.schema()
    r_schema = right_schema if right_schema is not None else right.schema()
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    # unified physical schema: left cols ∪ right cols (+part/side);
    # missing side gets typed nulls so int64 fidelity survives the
    # union (never let a 64-bit id pass through pandas float64).
    all_fields = dict(zip(l_schema.names, l_schema.types))
    for n, t in zip(r_schema.names, r_schema.types):
        all_fields.setdefault(n, t)
    order = list(all_fields)

    def pad(side: int, own: list[str]):
        def f(b: pa.Table) -> pa.Table:
            cols = {}
            for n in order:
                cols[n] = b[n] if n in own else pa.nulls(len(b), all_fields[n])
            cols["__side"] = pa.array(np.full(len(b), side, dtype=np.int8))
            cols[_PART_COL] = b[_PART_COL]
            return pa.table(cols)
        return f

    lt = with_partition_col(left, left_key, num_parts).map_batches(
        pad(0, l_names), batch_format="pyarrow"
    )
    rt = with_partition_col(right, right_key, num_parts).map_batches(
        pad(1, r_names), batch_format="pyarrow"
    )
    both = lt.union(rt)

    if batch_format == "pyarrow":
        def run(g: pa.Table) -> pa.Table:
            from event_deduplication_ray.functions.hashing import warm_numpy_heap

            warm_numpy_heap()
            sides = g["__side"]
            l = g.filter(pc.equal(sides, 0)).select(l_names)
            r = g.filter(pc.equal(sides, 1)).select(r_names)
            return fn(l, r)
    else:
        def run(g: pa.Table) -> pa.Table:
            from event_deduplication_ray.functions.hashing import warm_numpy_heap

            warm_numpy_heap()
            sides = g["__side"]
            l = g.filter(pc.equal(sides, 0)).select(l_names).to_pandas()
            r = g.filter(pc.equal(sides, 1)).select(r_names).to_pandas()
            out = fn(l, r)
            return pa.Table.from_pandas(out, preserve_index=False)

    return both.groupby(_PART_COL).map_groups(run, batch_format="pyarrow")
