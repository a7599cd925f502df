"""Array-based union-find over arbitrary int64 node ids.

Used inside map_batches for the partition-parallel contraction step of
distributed connected components (north rule: "partition-parallel
union-find whose inter-partition edges are resolved via iterative
groupby-merge rounds").  Replaces the reference's single-process
NetworkX connected components
(/root/reference/src/event_dedup/clustering/graph_cluster.py:37-97).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def union_find_contract(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Collapse an edge list to (node, root) star edges.

    Roots are the minimum node id of each local component —
    deterministic min-id labels (FIXTURES.md §3 invariant).

    Fully vectorized: min-label propagation over the edge list +
    pointer jumping (label = label[label]), O(E log D) numpy ops with
    no per-edge Python loop.  np.unique returns nodes sorted, so the
    minimum label INDEX is the minimum node id.
    """
    # ONE argsort of the 2E value array does triple duty: the sorted
    # run starts give the node universe, the group ids give the
    # inverse mapping (what np.unique(return_inverse) would have
    # re-sorted to produce), and the permutation gives the per-node
    # segment layout for minimum.reduceat (np.minimum.at is slow;
    # reduceat over one gathered array is SIMD-friendly).
    n = len(src)
    combined = np.concatenate([src, dst])
    perm = np.argsort(combined, kind="stable")
    sorted_vals = combined[perm]
    first = np.empty(len(sorted_vals), dtype=bool)
    if len(sorted_vals):
        first[0] = True
        first[1:] = sorted_vals[1:] != sorted_vals[:-1]
    nodes = sorted_vals[first]
    m = len(nodes)
    gid = np.cumsum(first) - 1
    inv = np.empty(len(combined), np.int64)
    inv[perm] = gid
    e_src = inv[:n]
    e_dst = inv[n:]
    starts = np.flatnonzero(first)
    label = np.arange(m, dtype=np.int64)
    while True:
        before = label.copy()
        edge_min = np.minimum(label[e_src], label[e_dst])
        vals = np.concatenate([edge_min, edge_min])[perm]
        mins = np.minimum.reduceat(vals, starts) if m else label
        label = np.minimum(label, mins)
        # FULL path compression between rounds: label arrays are
        # m-sized (cheap) while the propagation above is E-sized
        # (expensive) — compressing chains here converges long-path
        # graphs in a handful of E-sized rounds instead of O(chain)
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    return nodes, nodes[label]


def connected_components_pandas(edges: pd.DataFrame) -> pd.DataFrame:
    """(id_a, id_b) edge frame → (doc_id, cluster_id) with min-id labels.

    Driver-side helper for tests/eval on bounded edge sets (the
    reference's in-memory clustering analog).
    """
    nodes, roots = union_find_contract(
        edges["id_a"].to_numpy(np.int64), edges["id_b"].to_numpy(np.int64)
    )
    return pd.DataFrame({"doc_id": nodes, "cluster_id": roots})
