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
    deterministic min-id labels (FIXTURES.md §3 invariant).  O(E α(E))
    with path compression + union by min.
    """
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)
    e_src = inv[: len(src)]
    e_dst = inv[len(src):]

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:          # path compression
            parent[i], i = root, parent[i]
        return root

    for a, b in zip(e_src.tolist(), e_dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min ORIGINAL id → deterministic labels
            if nodes[ra] <= nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb

    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    return nodes, nodes[roots]


def connected_components_pandas(edges: pd.DataFrame) -> pd.DataFrame:
    """(id_a, id_b) edge frame → (doc_id, cluster_id) with min-id labels.

    Driver-side helper for tests/eval on bounded edge sets (the
    reference's in-memory clustering analog).
    """
    nodes, roots = union_find_contract(
        edges["id_a"].to_numpy(np.int64), edges["id_b"].to_numpy(np.int64)
    )
    return pd.DataFrame({"doc_id": nodes, "cluster_id": roots})
