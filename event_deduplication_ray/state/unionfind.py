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
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    m = len(nodes)
    e_src = inv[: len(src)]
    e_dst = inv[len(src):]
    label = np.arange(m, dtype=np.int64)
    # per-node segment layout computed ONCE (np.minimum.at is slow;
    # argsort + minimum.reduceat is SIMD-friendly and reusable)
    combined = np.concatenate([e_src, e_dst])
    perm = np.argsort(combined, kind="stable")
    sorted_nodes = combined[perm]
    starts = np.flatnonzero(
        np.r_[True, sorted_nodes[1:] != sorted_nodes[:-1]]
    )
    uniq = sorted_nodes[starts]
    while True:
        before = label.copy()
        edge_min = np.minimum(label[e_src], label[e_dst])
        vals = np.concatenate([edge_min, edge_min])[perm]
        mins = np.minimum.reduceat(vals, starts)
        label[uniq] = np.minimum(label[uniq], mins)
        label = label[label]              # pointer jumping
        if np.array_equal(label, before):
            break
    # full compression (labels point at component-min indices)
    while True:
        nxt = label[label]
        if np.array_equal(nxt, label):
            break
        label = nxt
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
