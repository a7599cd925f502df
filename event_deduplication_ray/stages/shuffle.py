"""Vectorized shuffle primitives on top of Ray Data + Ray core.

Ray Data's ``groupby(key)`` machinery is the wrong tool for this
engine's wide stages, twice over (both measured on this box, Ray
2.49):

1. ``groupby(key).aggregate(...)`` accumulates per row in Python
   (~100k rows/s);
2. ``groupby(key).map_groups(fn)`` shuffles through a SORT whose map
   and reduce phases execute as ONE task each — a 9.4M-row cogroup
   sort ran serially for 66 s while 31 cores idled.

So the shuffle itself is the one place this engine drops to raw Ray
tasks (the documented last resort): an explicit, fully parallel
hash shuffle —

- split: one task per input block partitions its rows by
  ``hash(key) % P`` (vectorized take + zero-copy slices) and returns
  P sub-tables (``num_returns=P``);
- merge: one task per partition concatenates its B sub-tables and
  applies the caller's vectorized function.

Identical keys always land in the same partition, so per-key
aggregation inside the merge fn is globally correct.  ``P`` is the
unit of shuffle parallelism — size it to ~cluster cores (or data
size / target partition bytes at scale).  Skew: a hot KEY still lands
in one partition, but partition work is vectorized, and the pair
generators cap quadratic blowup (see pairs.py).

The result returns to the Dataset API via ``from_arrow_refs`` — the
escape hatch is local to this module.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_PART_COL = "__part"


def _task_cpus() -> float:
    """num_cpus per shuffle task.  Default 1; EDR_TASK_CPUS widens it
    to cap the number of CONCURRENTLY page-faulting tasks — on hosts
    where fault cost is globally contended (this sandbox; see
    BASELINE.md "Scaling"), fewer simultaneous allocators can be
    faster end-to-end than full task-level parallelism."""
    import os

    return float(os.environ.get("EDR_TASK_CPUS", "1"))


@dataclass
class Shuffled:
    """Handle to an already-shuffled ref matrix: ``refs[p]`` is the
    list of sub-table ObjectRefs whose rows hash to partition ``p`` of
    ``num_parts`` under ``key_cols``.

    This is the barrier-free chaining primitive: a merge task can
    partition its OUTPUT by the next stage's key (``out_keys``) and
    return a Shuffled instead of a Dataset, so consecutive wide stages
    chain as one Ray task DAG — the driver submits everything up
    front and never blocks between waves (the round-1 profile showed
    ~7 s of serial per-wave scheduling across the flagship's shuffle
    barriers; see BASELINE.md "Scaling").
    """

    refs: list          # list[list[ray.ObjectRef]]
    key_cols: list
    num_parts: int

    def to_dataset(self) -> Dataset:
        import ray.data as rd

        merge = ray.remote(num_cpus=_task_cpus())(_concat_tables_task)
        return rd.from_arrow_refs([merge.remote(*p) for p in self.refs])


def _concat_tables_task(*tables: pa.Table) -> pa.Table:
    return _concat(list(tables))


def _codec() -> str:
    """Shuffle sub-table wire format.  'off' (default) ships raw
    pa.Tables — zero-copy through the object store.  'lz4' ships each
    sub-table as an Arrow-IPC LZ4 buffer: fewer bytes and plasma
    pages per hop, at the price of an encode+decode CPU pass per
    sub-table.  Measured on this single-node host (flagship, 500 k
    docs, 32 cpus, 2 interleaved A/B trials): off 21.4/24.5 s vs
    lz4 32.9/23.6 s — the compression CPU costs more than local
    shared-memory plasma transfers save.  On a multi-node cluster whose shuffle crosses a
    NETWORK (the 100 TB deployment), the bytes-vs-cpu trade reverses;
    the knob exists for that case (EDR_SHUFFLE_CODEC=lz4)."""
    import os

    return os.environ.get("EDR_SHUFFLE_CODEC", "off")


def _enc(t: pa.Table):
    if _codec() == "off" or t is None or not isinstance(t, pa.Table):
        return t
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(
        sink, t.schema, options=pa.ipc.IpcWriteOptions(compression="lz4")
    ) as w:
        w.write_table(t)
    return sink.getvalue()


def _dec(x) -> pa.Table:
    if x is None or isinstance(x, pa.Table):
        return x
    return pa.ipc.open_stream(x).read_all()


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
    return (z % np.uint64(num_parts)).astype(np.int64)


def with_partition_col(ds: Dataset, key_cols: list[str], num_parts: int) -> Dataset:
    """Append the partition id column (vectorized, no shuffle)."""

    def add_part(b: pa.Table) -> pa.Table:
        arrs = [b[c].to_numpy(zero_copy_only=False) for c in key_cols]
        return b.append_column(_PART_COL, pa.array(_key_to_part(arrs, num_parts)))

    return ds.map_batches(add_part, batch_format="pyarrow")


def _split_table(block: pa.Table, key_cols: list[str], num_parts: int) -> list:
    """One table → P sub-tables by key hash (1 take + zero-copy
    slices), each encoded for the wire (see _codec).  Every call site
    is a remote-task return, so this is the single encode point."""
    if len(block) == 0 or len(block.column_names) == 0:
        e = _enc(block)
        return [e] * num_parts
    arrs = [block[c].to_numpy(zero_copy_only=False) for c in key_cols]
    pid = _key_to_part(arrs, num_parts)
    order = np.argsort(pid, kind="stable")
    tbl = block.take(pa.array(order))
    sorted_pid = pid[order]
    bounds = np.searchsorted(sorted_pid, np.arange(num_parts + 1))
    return [_enc(tbl.slice(bounds[p], bounds[p + 1] - bounds[p]))
            for p in range(num_parts)]


def _split_blocks(
    key_cols: list[str], num_parts: int, pre_fn, *blocks: pa.Table
) -> list[pa.Table]:
    """Partition a group of blocks into P sub-tables
    (concat + optional fused map + 1 take + zero-copy slices).

    ``pre_fn`` (pa.Table -> pa.Table) runs INSIDE the split task —
    fusing a row-exploding map (e.g. LSH banding) into the shuffle
    removes both a stage barrier and an intermediate object-store
    table."""
    block = _concat(list(blocks))
    if pre_fn is not None and len(block.column_names):
        block = pre_fn(block)
    return _split_table(block, key_cols, num_parts)


def _shuffle_refs(
    ds: Dataset, key_cols: list[str], num_parts: int, pre_fn=None
) -> list[list["ray.ObjectRef"]]:
    """All-to-all: returns per-partition lists of sub-table refs.

    Input blocks are coalesced into ~num_parts split tasks so the
    shuffle creates O(P^2) objects, not O(B*P) (object-creation page
    churn is a measured cost in this environment)."""
    block_refs = ds.to_arrow_refs()
    n_split = max(1, min(len(block_refs), max(num_parts, 16)))
    groups: list[list] = [[] for _ in range(n_split)]
    for i, b in enumerate(block_refs):
        groups[i % n_split].append(b)
    groups = [g for g in groups if g]

    split = ray.remote(num_returns=num_parts, num_cpus=_task_cpus())(_split_blocks)
    outs = [split.remote(key_cols, num_parts, pre_fn, *g) for g in groups]
    if num_parts == 1:
        outs = [[o] for o in outs]
    # transpose: partition p ← [group_i's part p]
    return [[outs[i][p] for i in range(len(outs))] for p in range(num_parts)]


def _concat(tables: list[pa.Table]) -> pa.Table:
    tables = [_dec(t) for t in tables]
    nonempty = [t for t in tables if t is not None and len(t)]
    if not nonempty:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(nonempty, promote_options="default")


def _input_parts(
    ds, key_cols: list[str], num_parts: int, pre_fn=None
) -> list:
    """Ref matrix for a Dataset (split wave) or a Shuffled (reuse —
    must already be partitioned by the same keys and P)."""
    if isinstance(ds, Shuffled):
        if ds.key_cols != list(key_cols) or ds.num_parts != num_parts:
            raise ValueError(
                f"Shuffled({ds.key_cols}, {ds.num_parts}) cannot feed a "
                f"stage keyed on {key_cols} x{num_parts}"
            )
        if pre_fn is not None:
            raise ValueError("pre_fn is a split-task fusion; Shuffled input has no split task")
        return ds.refs
    return _shuffle_refs(ds, key_cols, num_parts, pre_fn=pre_fn)


def shuffle_to(ds, key_cols: list[str], num_parts: int, pre_fn=None) -> Shuffled:
    """Explicit shuffle of a Dataset into a reusable Shuffled handle —
    use when SEVERAL downstream stages consume the same partitioning
    (e.g. the folded signature table feeding both verify cogroups):
    the split wave runs once instead of per consumer."""
    return Shuffled(
        _shuffle_refs(ds, key_cols, num_parts, pre_fn=pre_fn),
        list(key_cols), num_parts,
    )


def _wrap_fn(fn: Callable, batch_format: str) -> Callable:
    if batch_format == "pandas":
        def apply(t: pa.Table) -> pa.Table:
            if len(t.column_names) == 0:
                return t
            out = fn(t.to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False)
    else:
        def apply(t: pa.Table) -> pa.Table:
            if len(t.column_names) == 0:
                return t
            return fn(t)
    return apply


def _transpose(outs: list, out_parts: int) -> list:
    if out_parts == 1:
        outs = [[o] for o in outs]
    return [[outs[i][q] for i in range(len(outs))] for q in range(out_parts)]


def partition_apply(
    ds,
    key_cols: list[str],
    num_parts: int,
    fn: Callable,
    batch_format: str = "pandas",
    pre_fn: Callable | None = None,
    out_keys: list[str] | None = None,
    out_parts: int | None = None,
):
    """Hash-shuffle by key_cols into num_parts partitions and apply a
    vectorized function to each whole partition.

    ``fn`` sees every row whose key hashes to the partition — same keys
    are never split — and must be vectorized (pandas groupby / merge /
    numpy or pyarrow.compute), never a Python loop over rows.  Use
    ``batch_format="pyarrow"`` when rows carry list columns
    (signatures) that must not round-trip through pandas object dtype.

    ``ds`` may be a Dataset (a split wave shuffles it) or a Shuffled
    from an upstream stage (refs feed the merge tasks directly — no
    split wave, no driver barrier).

    With ``out_keys`` the merge tasks ALSO partition their output by
    those keys into ``out_parts`` sub-tables and the call returns a
    Shuffled for the next stage — consecutive wide stages then chain
    as one Ray DAG with zero driver-side barriers (the round-1 serial
    scheduling term).  Without it, returns a Dataset
    (from_arrow_refs).
    """
    import ray.data as rd

    parts = _input_parts(ds, key_cols, num_parts, pre_fn=pre_fn)
    apply = _wrap_fn(fn, batch_format)

    if out_keys is None:
        def merge_apply(*tables) -> pa.Table:
            return apply(_concat(list(tables)))

        merge = ray.remote(num_cpus=_task_cpus())(merge_apply)
        return rd.from_arrow_refs([merge.remote(*p) for p in parts])

    op = out_parts or num_parts

    def merge_split(*tables) -> list[pa.Table]:
        return _split_table(apply(_concat(list(tables))), out_keys, op)

    merge = ray.remote(num_returns=op, num_cpus=_task_cpus())(merge_split)
    outs = [merge.remote(*p) for p in parts]
    return Shuffled(_transpose(outs, op), list(out_keys), op)


def cogroup_apply(
    left,
    right,
    left_key: list[str],
    right_key: list[str],
    num_parts: int,
    fn: Callable,
    batch_format: str = "pandas",
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
    out_keys: list[str] | None = None,
    out_parts: int | None = None,
    left_pre_fn=None,
    right_pre_fn=None,
):
    """Co-partition two datasets on their keys and apply ``fn(l, r)``
    per partition (a fully parallel partitioned hash join / cogroup).

    Sides are shuffled independently (no union, no null padding —
    each side keeps its own schema end to end).  With
    ``batch_format="pyarrow"`` the sides are passed as pa.Tables and
    ``fn`` must return a pa.Table.  The *_schema parameters are unused
    (kept for call-site compatibility with the former union-based
    implementation).

    Either side may be a Shuffled (see partition_apply) — in
    particular a small side shuffled ONCE via ``shuffle_to`` and
    reused across several cogroups.  ``out_keys``/``out_parts`` chain
    the output into the next shuffle without a barrier.
    """
    import ray.data as rd

    del left_schema, right_schema
    # left/right_pre_fn fuse a projection/explode into the side's
    # split tasks (same contract as partition_apply's pre_fn) — a
    # separate select_columns/map wave never materializes
    l_parts = _input_parts(left, left_key, num_parts, pre_fn=left_pre_fn)
    r_parts = _input_parts(right, right_key, num_parts, pre_fn=right_pre_fn)

    if batch_format == "pandas":
        def apply2(lt: pa.Table, rt: pa.Table) -> pa.Table:
            l = lt.to_pandas() if len(lt.column_names) else pd.DataFrame()
            r = rt.to_pandas() if len(rt.column_names) else pd.DataFrame()
            return pa.Table.from_pandas(fn(l, r), preserve_index=False)
    else:
        def apply2(lt: pa.Table, rt: pa.Table) -> pa.Table:
            return fn(lt, rt)

    if out_keys is None:
        def merge_apply(n_left: int, *tables) -> pa.Table:
            return apply2(_concat(list(tables[:n_left])),
                          _concat(list(tables[n_left:])))

        merge = ray.remote(num_cpus=_task_cpus())(merge_apply)
        return rd.from_arrow_refs(
            [merge.remote(len(lp), *lp, *rp) for lp, rp in zip(l_parts, r_parts)]
        )

    op = out_parts or num_parts

    def merge_split(n_left: int, *tables) -> list[pa.Table]:
        out = apply2(_concat(list(tables[:n_left])),
                     _concat(list(tables[n_left:])))
        return _split_table(out, out_keys, op)

    merge = ray.remote(num_returns=op, num_cpus=_task_cpus())(merge_split)
    outs = [merge.remote(len(lp), *lp, *rp) for lp, rp in zip(l_parts, r_parts)]
    return Shuffled(_transpose(outs, op), list(out_keys), op)
