"""Stage 5 — distributed connected components (clustering).

Reference analog: C1 graph clustering — one line of NetworkX in the
reference (/root/reference/src/event_dedup/clustering/graph_cluster.py:78)
— re-expressed for scale as:

1. **partition-parallel union-find** (map_batches over edge blocks):
   each block's edges are contracted to (node, local_root) star edges
   with deterministic min-id roots (state/unionfind.py);
2. **iterative hash-to-min rounds** (groupby-merge): each round every
   node's neighborhood minimum is broadcast to the neighborhood
   (vectorized per hash partition); converges in O(log diameter)
   rounds, detected by an exact two-prime modular fingerprint of the
   edge multiset (labels only decrease, so a stable fingerprint twice
   means a fixpoint);
3. **labels**: after convergence label(v) = min(neighbors ∪ v);
   singletons (docs with no edges) get label = own doc_id via a
   left cogroup against the doc table (the reference's singleton
   preservation, graph_cluster.py:65-67).

Each round materializes only the narrow (u, v) int64 edge table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.state.unionfind import union_find_contract
from event_deduplication_ray.stages.shuffle import cogroup_apply, partition_apply

_P1 = (1 << 31) - 1          # prime
_P2 = (1 << 29) - 3          # prime


def _edge_fingerprint(edges: Dataset) -> tuple[int, int, int]:
    """Exact (count, modsum_p1, modsum_p2) of the edge multiset.

    31-bit residues summed in int64 are exact up to 2^32 rows per
    block; a fingerprint collision across rounds needs simultaneous
    collisions in both primes AND an unchanged count (~2^-60)."""

    def partial(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.uint64)
        v = t["v"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            mix = (u * np.uint64(0x9E3779B97F4A7C15)) ^ v
        s1 = int((mix % np.uint64(_P1)).sum(dtype=np.uint64) % np.uint64(_P1))
        s2 = int((mix % np.uint64(_P2)).sum(dtype=np.uint64) % np.uint64(_P2))
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "s1": pa.array([s1], pa.int64()),
                         "s2": pa.array([s2], pa.int64())})

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        int(parts["n"].sum()),
        int(parts["s1"].sum() % _P1),
        int(parts["s2"].sum() % _P2),
    )


def local_unionfind_contract(edges: Dataset) -> Dataset:
    """(id_a, id_b) → per-block contracted (u, v) star edges."""

    def contract(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        nodes, roots = union_find_contract(
            t["id_a"].to_numpy(), t["id_b"].to_numpy()
        )
        return pa.table({"u": pa.array(nodes), "v": pa.array(roots)})

    return edges.map_batches(contract, batch_format="pyarrow")


def _hash_to_min_round(df: pd.DataFrame) -> pd.DataFrame:
    """One vectorized hash-to-min round for a whole hash partition.

    Input rows (u, v) contain every edge incident (as u) to the
    partition's nodes, in both directions.  For each u:
    m = min(neighbors ∪ {u}); emit (v, m) and (m, v) for all v — the
    neighborhood collapses toward the minimum.
    """
    m = df.groupby("u")["v"].transform("min")
    m = np.minimum(m.to_numpy(), df["u"].to_numpy())
    out = pd.DataFrame(
        {"u": np.concatenate([df["v"].to_numpy(), m]),
         "v": np.concatenate([m, df["v"].to_numpy()])}
    )
    out = out[out["u"] != out["v"]].drop_duplicates()
    return out


def connected_components(edges: Dataset, cfg: DedupConfig) -> Dataset:
    """Distributed CC: (id_a, id_b) edges → (doc_id, cluster_id) labels
    for every node that appears in an edge (min-id cluster labels).

    Hybrid: after the distributed per-block union-find contraction the
    graph has at most one (node, root) edge per node.  If that
    contracted table is provably small (< cfg.cc_driver_edge_limit) it
    is collected and finished with one driver-side union-find — same
    labels, no iterative shuffles (the guide's "union-find on the
    driver only if the candidate set is provably small").  Otherwise
    the iterative hash-to-min groupby-merge rounds run fully
    distributed (the 100 TB path, exercised directly in tests)."""
    import ray.data as rd

    P = cfg.join_num_partitions

    # two-level contraction: per-block union-find (map), then a
    # second union-find per hash partition of u — the same node's
    # star edges from different blocks co-locate and collapse, so the
    # table entering the driver (or the iterative rounds) is ~one row
    # per node instead of one per (block, node) (measured 4.1M → the
    # driver collect + UF was the dominant serial term at 500k docs).
    def contract_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        nodes, roots = union_find_contract(
            t["u"].to_numpy(), t["v"].to_numpy()
        )
        return pa.table({"u": pa.array(nodes), "v": pa.array(roots)})

    def pre_contract(t: pa.Table) -> pa.Table:
        # per-block union-find FUSED into the split tasks (pre_fn):
        # the (id_a, id_b) → (u, v) star contraction happens inside
        # the shuffle's own wave instead of as a separate map stage —
        # one fewer task wave + no intermediate star table in the
        # object store.  Final labels are component minima, invariant
        # to how blocks are grouped for contraction.
        if len(t) == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        nodes, roots = union_find_contract(
            t["id_a"].to_numpy(), t["id_b"].to_numpy()
        )
        return pa.table({"u": pa.array(nodes), "v": pa.array(roots)})

    star = partition_apply(
        edges, ["u"], P, contract_part,
        pre_fn=pre_contract, batch_format="pyarrow",
    ).materialize()
    n_star = star.count()
    if n_star == 0:
        # duplicate-free input: no edges at all — every doc becomes a
        # singleton downstream (assignments_with_singletons)
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "cluster_id": pd.Series(dtype="int64")}
        )
        return rd.from_pandas(empty)
    if n_star <= cfg.cc_driver_edge_limit:
        df = star.to_pandas().rename(columns={"u": "id_a", "v": "id_b"})
        from event_deduplication_ray.state.unionfind import (
            connected_components_pandas,
        )

        labels = connected_components_pandas(df)
        return rd.from_pandas(labels)
    return _connected_components_distributed(star, cfg)


def _connected_components_distributed(star: Dataset, cfg: DedupConfig) -> Dataset:
    P = cfg.join_num_partitions

    def bidir(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        return pa.table(
            {"u": pa.array(np.concatenate([u, v])),
             "v": pa.array(np.concatenate([v, u]))}
        )

    cur = star.map_batches(bidir, batch_format="pyarrow").materialize()
    prev_fp = None
    for _ in range(cfg.max_cc_rounds):
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
        cur = partition_apply(cur, ["u"], P, _hash_to_min_round).materialize()

    def label(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", as_index=False)["v"].min()
        lab = np.minimum(g["u"].to_numpy(), g["v"].to_numpy())
        return pd.DataFrame({"doc_id": g["u"].to_numpy(), "cluster_id": lab})

    return partition_apply(cur, ["u"], P, label)


def assignments_with_singletons(
    docs: Dataset, labels: Dataset, cfg: DedupConfig
) -> Dataset:
    """All docs left-cogrouped with labels; unlabeled docs become their
    own singleton cluster (cluster_id = doc_id)."""
    P = cfg.join_num_partitions
    ids = docs.select_columns(["doc_id"])
    ids_schema = pa.schema([("doc_id", pa.int64())])
    labels_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    def attach(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "cluster_id": pd.Series(dtype="int64")}
            )
        if len(r) == 0:  # no labels in this partition: all singletons
            ids_np = l["doc_id"].to_numpy()
            return pd.DataFrame({"doc_id": ids_np, "cluster_id": ids_np})
        # left join introduces NaNs; keep 64-bit ids exact with the
        # nullable Int64 dtype (a float64 round-trip silently corrupts
        # ids above 2^53)
        r = r.copy()
        r["cluster_id"] = r["cluster_id"].astype("Int64")
        m = l.merge(r, on="doc_id", how="left")
        cid = m["cluster_id"].fillna(m["doc_id"]).astype(np.int64)
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(), "cluster_id": cid})

    return cogroup_apply(ids, labels, ["doc_id"], ["doc_id"], P, attach,
                         left_schema=ids_schema, right_schema=labels_schema)
