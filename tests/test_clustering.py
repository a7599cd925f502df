"""Clustering invariants (reference pattern: tests/test_clustering.py
transitive closure / singleton preservation / deterministic labels)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.cluster import (
    assignments_with_singletons,
    connected_components,
)
from event_deduplication_ray.state.unionfind import (
    connected_components_pandas,
    union_find_contract,
)

CFG = DedupConfig(join_num_partitions=4)
# cc_driver_edge_limit=0 forces the distributed hash-to-min rounds —
# the 100 TB path must stay covered even though small graphs normally
# take the driver union-find shortcut
CFG_DIST = DedupConfig(join_num_partitions=4, cc_driver_edge_limit=0)


@pytest.fixture(params=["driver", "distributed"])
def cc_cfg(request):
    return CFG if request.param == "driver" else CFG_DIST


def _cc(edges: list[tuple[int, int]], cfg=CFG) -> dict[int, int]:
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["id_a", "id_b"]).astype(np.int64)
    )
    out = connected_components(ds, cfg).to_pandas()
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_local_unionfind_min_labels():
    nodes, roots = union_find_contract(
        np.array([5, 3, 9]), np.array([3, 1, 5])
    )
    lab = dict(zip(nodes, roots))
    assert lab[5] == lab[3] == lab[1] == lab[9] == 1


def test_transitive_closure(cc_cfg):
    lab = _cc([(1, 2), (2, 3), (3, 4), (10, 11)], cc_cfg)
    assert lab[1] == lab[2] == lab[3] == lab[4] == 1
    assert lab[10] == lab[11] == 10
    assert lab[1] != lab[10]


def test_long_chain_converges(cc_cfg):
    # path graph 0-1-2-...-40: worst case for label propagation
    lab = _cc([(i, i + 1) for i in range(40)], cc_cfg)
    assert set(lab.values()) == {0}


def test_two_components_deterministic(cc_cfg):
    edges = [(7, 3), (3, 9), (100, 50), (50, 60)]
    lab1 = _cc(edges, cc_cfg)
    lab2 = _cc(list(reversed(edges)), cc_cfg)
    assert lab1 == lab2
    assert lab1[9] == 3 and lab1[60] == 50


def test_singletons_preserved():
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64)}))
    edges = rd.from_pandas(
        pd.DataFrame({"id_a": [0], "id_b": [1]}).astype(np.int64)
    )
    labels = connected_components(edges, CFG)
    asn = assignments_with_singletons(docs, labels, CFG).to_pandas()
    asn = dict(zip(asn["doc_id"], asn["cluster_id"]))
    assert asn[0] == asn[1] == 0
    for s in (2, 3, 4, 5):
        assert asn[s] == s


def test_pandas_cc_matches_distributed(cc_cfg):
    rng = np.random.default_rng(5)
    edges = pd.DataFrame(
        {"id_a": rng.integers(0, 300, 500), "id_b": rng.integers(0, 300, 500)}
    ).astype(np.int64)
    edges = edges[edges.id_a != edges.id_b]
    expected = connected_components_pandas(edges).set_index("doc_id")["cluster_id"]
    got = _cc(list(zip(edges["id_a"], edges["id_b"])), cc_cfg)
    for node, lab in expected.items():
        assert got[node] == lab
