"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: broadcast query matrix (ray.put once),
  per-batch numpy matmul + local top-k, tiny driver combine;
- SRP/LSH-bucketed variant: signed-random-projection bucket keys
  prune the search to buckets near the query's bucket (the scale
  path — touches a fraction of rows, same shape of answer);
- IVF variant: spherical-k-means coarse quantizer (trained on a
  bounded sample) partitions the corpus into inverted lists; a query
  reads only its n_probes nearest lists — data-adaptive counterpart
  of the SRP index with the same persisted-partition serving shape;
- embedding near-dup pairs: SRP bucket → within-bucket cosine pairs
  above a threshold (feeds the same edges→union-find clustering as
  the text passes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.pairs import minhash_pair_table
from event_deduplication_ray.stages.shuffle import (
    cogroup_apply,
    partition_apply,
    shuffle_to,
)


def _emb_matrix(col) -> np.ndarray:
    """Arrow list<float> column (or pandas object series) → (n, d) float64."""
    if isinstance(col, (pa.ChunkedArray, pa.Array)):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        if n == 0:          # reshape(0, -1) raises; recover d from the type
            d = getattr(col.type, "list_size", None) or 0
            return np.zeros((0, d), np.float64)
        return flat.reshape(n, -1)
    return np.vstack(col.to_numpy()).astype(np.float64)


def _probe_dim(embeddings: Dataset, emb_col: str) -> int:
    """Embedding dimensionality, resolved ONCE on the driver: from the
    Arrow schema when the column is fixed_size_list (metadata-only),
    else a single-row probe (the driver tables store plain
    list<float>).  Returns 0 for an empty table."""
    try:
        sch = embeddings.schema()
        t = dict(zip(sch.names, sch.types)).get(emb_col)
        size = getattr(t, "list_size", None)
        if size:
            return int(size)
    except Exception:
        pass
    head = embeddings.limit(1).to_pandas()
    if not len(head):
        return 0
    return int(len(head[emb_col].iloc[0]))


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def brute_force_topk(
    embeddings: Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: set[int] | None = None,
) -> pd.DataFrame:
    """Top-k rows by cosine similarity to one query vector.

    Per-batch local top-k keeps the driver combine at
    O(num_batches * k) rows.  Returns (vec_id, cos) sorted desc with
    deterministic vec_id tie-break; cos rounded to 6 decimals.
    """
    q = query_vec.astype(np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    q_ref = ray.put(q)
    excl = exclude_ids or set()

    def local_topk(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        cos = m @ qv
        ids = t[id_col].to_numpy()
        if excl:
            mask = ~np.isin(ids, list(excl))
            cos, ids = cos[mask], ids[mask]
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]), "cos": pa.array(cos[top])})

    parts = embeddings.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(6)
    return parts.reset_index(drop=True)


def brute_force_topk_many(
    embeddings: Dataset,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Batched ANN baseline: top-k rows by cosine for EVERY query row
    of a (q, d) matrix in one pass over the table.

    The normalized query matrix is broadcast once (``ray.put``); each
    batch computes one (n, d) @ (d, q) matmul and keeps a local top-k
    per query, so the driver combine is O(num_batches * q * k) rows —
    independent of table size.  Returns (query_idx, vec_id, cos)
    sorted by (query_idx, -cos, vec_id), k rows per query.
    """
    qm = _normalize_rows(np.atleast_2d(query_mat).astype(np.float64))
    nq = qm.shape[0]
    q_ref = ray.put(qm.T)  # (d, q)

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        if len(ids) == 0:                          # empty block: argpartition
            return pa.table({                      # on a 0-row axis raises
                "query_idx": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            })
        qt = ray.get(q_ref)
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        cos = m @ qt                               # (n, q)
        kk = min(k, len(ids))
        # bulk prune with one argpartition per query column, then make
        # the boundary exact under the (cos desc, vec_id asc) order:
        # keep every row tied with the kth value and lexsort those, so
        # the local winner set matches the q31 oracle's row_number
        # tie-break even when an exact-cosine tie straddles k
        part = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, q)
        qi_out = np.empty(kk * nq, dtype=np.int64)
        ri_out = np.empty(kk * nq, dtype=np.int64)
        for qi in range(nq):
            thresh = cos[part[:, qi], qi].min()
            cand = np.flatnonzero(cos[:, qi] >= thresh)
            order = np.lexsort((ids[cand], -cos[cand, qi]))[:kk]
            qi_out[qi * kk:(qi + 1) * kk] = qi
            ri_out[qi * kk:(qi + 1) * kk] = cand[order]
        return pa.table({
            "query_idx": pa.array(qi_out, pa.int64()),
            id_col: pa.array(ids[ri_out]),
            "cos": pa.array(cos[ri_out, qi_out]),
        })

    parts = embeddings.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["query_idx", "cos", id_col],
                              ascending=[True, False, True])
    out = parts.groupby("query_idx", as_index=False).head(k).copy()
    out["cos"] = out["cos"].round(6)
    return out.reset_index(drop=True)


def srp_bucket_codes(m: np.ndarray, n_bits: int, seed: int, dim: int) -> np.ndarray:
    """Signed-random-projection bucket codes (uint64)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    bits = (m @ planes) > 0
    code = np.zeros(len(m), dtype=np.uint64)
    for b in range(n_bits):
        code |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return code


def lsh_topk(
    embeddings: Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Bucketed ANN: only score rows whose SRP bucket is within
    Hamming distance 1 of the query bucket (recall/cost trade-off —
    the 100TB path; the brute-force variant is the correctness
    baseline)."""
    q = query_vec.astype(np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    dim = len(q)
    q_code = int(srp_bucket_codes(qn[None, :], n_bits, seed, dim)[0])
    near = {q_code} | {q_code ^ (1 << b) for b in range(n_bits)}
    near_arr = np.array(sorted(near), dtype=np.uint64)
    q_ref = ray.put(qn)

    def local(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        codes = srp_bucket_codes(m, n_bits, seed, dim)
        mask = np.isin(codes, near_arr)
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        cos = m[mask] @ qv
        ids = t[id_col].to_numpy()[mask]
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]), "cos": pa.array(cos[top])})

    parts = embeddings.map_batches(local, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(6)
    return parts.reset_index(drop=True)


def srp_index_build(
    embeddings: Dataset,
    index_dir: str,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Materialize the SRP-bucketed ANN index: one linear pass computes
    each vector's bucket code and writes Parquet PARTITIONED by it
    (hive layout, ``srp_code=<c>/``).

    This is the scale path for repeated top-k queries (round-2 VERDICT:
    ``lsh_topk`` re-scanned the whole table per query, recomputing SRP
    codes and pruning only the cosine, not the I/O).  With the code as
    a stored partition key, a query touches at most n_bits+1 partition
    directories — rows read scale with bucket occupancy, not table
    size.  Vectors are stored L2-normalized so serving skips the
    normalization too."""

    def code_batch(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        codes = srp_bucket_codes(m, n_bits, seed, m.shape[1])
        n, d = m.shape
        norm = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), d
        )
        return pa.table({
            id_col: t[id_col],
            "emb_norm": norm,
            "srp_code": pa.array(codes.astype(np.int64)),
        })

    embeddings.map_batches(code_batch, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["srp_code"]
    )


def srp_index_add(
    new_embeddings: Dataset,
    index_dir: str,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Incrementally index NEW vectors into an existing SRP index
    WITHOUT rebuilding.  The SRP code is data-INdependent (fixed
    seeded hyperplanes), so appending run-unique Parquet files into
    the existing ``srp_code=`` partitions yields byte-for-byte the
    same serving behavior as a full rebuild — the strongest possible
    maintenance guarantee of the three index families.  The caller
    must pass the SAME (n_bits, seed) the index was built with and
    only ids not already present (the token_index_add contract)."""
    srp_index_build(new_embeddings, index_dir, n_bits=n_bits, seed=seed,
                    id_col=id_col, emb_col=emb_col)


def ivf_index_add(
    new_embeddings: Dataset,
    index_dir: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Incrementally index NEW vectors into an existing IVF index:
    the persisted centroids are read back (they are the index's frozen
    coarse quantizer — real IVF deployments retrain only on drift)
    and the standard streaming assignment pass appends to the
    matching ``ivf_list=`` partitions.  Full-probe serving over the
    grown index stays EXACT over the union; pruned-probe recall
    degrades only as far as the new data shifts the (unchanged)
    centroid geometry."""
    import os

    import pyarrow.parquet as pq

    ct = pq.read_table(f"{index_dir}/centroids.parquet")
    cent_col = ct["centroid"].combine_chunks()
    d = cent_col.type.list_size
    cent = cent_col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(len(ct), d)
    c_ref = ray.put(cent.T)

    def assign_batch(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        lists = (m @ ray.get(c_ref)).argmax(axis=1).astype(np.int64)
        norm = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), m.shape[1]
        )
        return pa.table({
            id_col: t[id_col],
            "emb_norm": norm,
            "ivf_list": pa.array(lists),
        })

    new_embeddings.map_batches(
        assign_batch, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["ivf_list"])


def _partition_paths(dirs: list[str]) -> list[str]:
    import os

    return [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]


def _serve_topk(paths: list[str], qn: np.ndarray, k: int, id_col: str) -> pd.DataFrame:
    """Top-k cosine over pre-normalized ``emb_norm`` index partitions
    (shared serving path of the SRP and IVF indexes)."""
    import ray.data as rd

    empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          "cos": pd.Series(dtype="float64")})
    if not paths:
        return empty
    q_ref = ray.put(qn)

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        col = t["emb_norm"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.type.list_size
        m = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), d)
        cos = m @ ray.get(q_ref)
        ids = t[id_col].to_numpy()
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]), "cos": pa.array(cos[top])})

    ds = rd.read_parquet(paths, columns=[id_col, "emb_norm"])
    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return empty
    parts = parts.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(6)
    return parts.reset_index(drop=True)


def srp_index_topk(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Serve a bucketed ANN query from an ``srp_index_build`` index by
    reading ONLY the partitions within Hamming distance 1 of the
    query's bucket (same candidate set and answer as ``lsh_topk``,
    without the per-query full scan)."""
    import os

    q = query_vec.astype(np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    q_code = int(srp_bucket_codes(qn[None, :], n_bits, seed, len(q))[0])
    near = {q_code} | {q_code ^ (1 << b) for b in range(n_bits)}
    dirs = [
        p for c in sorted(near)
        if os.path.isdir(p := os.path.join(index_dir, f"srp_code={c}"))
    ]
    return _serve_topk(_partition_paths(dirs), qn, k, id_col)


def spherical_kmeans(
    sample: np.ndarray, n_lists: int, n_iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Train L2-normalized centroids by spherical k-means (cosine
    assignment) on an in-memory sample.  Deterministic for a given
    (sample, seed); empty lists are reseeded to the point worst-served
    by the current centroids, so all ``n_lists`` rows stay distinct
    when the sample has enough distinct directions."""
    x = _normalize_rows(np.asarray(sample, dtype=np.float64))
    n = len(x)
    n_lists = max(1, min(n_lists, n))
    rng = np.random.default_rng(seed)
    # farthest-first seeding (kmeans++-style, deterministic): each new
    # seed is the point least similar to its nearest existing seed —
    # on separated clumps this lands one seed per clump instead of the
    # random-init collisions that split a clump across two lists
    seeds = [int(rng.integers(n))]
    best_sim = x @ x[seeds[0]]
    for _ in range(n_lists - 1):
        nxt = int(np.argmin(best_sim))
        seeds.append(nxt)
        best_sim = np.maximum(best_sim, x @ x[nxt])
    c = x[seeds]
    for _ in range(n_iters):
        sim = x @ c.T                       # (n, n_lists)
        assign = sim.argmax(axis=1)
        best = sim[np.arange(n), assign]
        new_c = np.zeros_like(c)
        np.add.at(new_c, assign, x)
        empty = ~np.isin(np.arange(n_lists), assign)
        if empty.any():                     # reseed to worst-served points
            far = np.argsort(best)[: int(empty.sum())]
            new_c[np.flatnonzero(empty)] = x[far]
        c = _normalize_rows(new_c)
    return c


def ivf_index_build(
    embeddings: Dataset,
    index_dir: str,
    n_lists: int = 16,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Materialize an IVF (inverted-file) ANN index: train ``n_lists``
    spherical-k-means centroids on a BOUNDED sample, then one linear
    assignment pass writes Parquet partitioned by nearest-centroid id
    (``ivf_list=<i>/`` under ``index_dir``; centroids in
    ``index_dir/centroids.parquet``).

    Complement of the SRP index: data-adaptive coarse quantization
    (clustered corpora get tight lists where SRP's fixed hyperplanes
    split clusters), same at-scale serving shape — a query reads only
    its ``n_probes`` nearest lists.  The sample is the only
    driver-side materialization and is capped at ``sample_size`` rows
    regardless of table size (the 100 TB shape: train on a sample,
    assign in a streaming pass)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    sample = embeddings.limit(sample_size).to_pandas()
    cent = spherical_kmeans(
        np.vstack(sample[emb_col].to_numpy()), n_lists, n_iters, seed
    )
    d = cent.shape[1]
    pq.write_table(
        pa.table({
            "ivf_list": pa.array(np.arange(len(cent), dtype=np.int64)),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(cent.reshape(-1), pa.float64()), d
            ),
        }),
        f"{index_dir}/centroids.parquet",
    )
    c_ref = ray.put(cent.T)  # (d, n_lists)

    def assign_batch(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        lists = (m @ ray.get(c_ref)).argmax(axis=1).astype(np.int64)
        norm = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), m.shape[1]
        )
        return pa.table({
            id_col: t[id_col],
            "emb_norm": norm,
            "ivf_list": pa.array(lists),
        })

    embeddings.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ivf_list"]
    )


def ivf_topk(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Serve a top-k cosine query from an ``ivf_index_build`` index,
    reading only the ``n_probes`` lists whose centroids are nearest
    the query (``n_probes >= n_lists`` degrades gracefully to an exact
    scan through the index layout — the correctness-gate mode; small
    ``n_probes`` is the at-scale recall/cost trade-off)."""
    import os

    import pyarrow.parquet as pq

    q = query_vec.astype(np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    ct = pq.read_table(f"{index_dir}/centroids.parquet")
    cent_col = ct["centroid"].combine_chunks()
    d = cent_col.type.list_size
    cent = cent_col.flatten().to_numpy(zero_copy_only=False).reshape(len(ct), d)
    list_ids = ct["ivf_list"].to_numpy()
    order = np.argsort(-(cent @ qn), kind="stable")[: max(1, n_probes)]
    dirs = [
        p for li in list_ids[order]
        if os.path.isdir(p := os.path.join(index_dir, f"ivf_list={li}"))
    ]
    return _serve_topk(_partition_paths(dirs), qn, k, id_col)


def embedding_dup_pairs(
    embeddings: Dataset,
    cfg: DedupConfig,
    cos_threshold: float = 0.95,
    n_bits: int = 12,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Embedding-cosine near-dup pairs via SRP buckets.

    Explode each vector into its bucket + the n_bits 1-bit-flip
    neighbor buckets (multi-probe → a pair within small angular
    distance shares at least one probe bucket w.h.p.), enumerate
    pairs per bucket, verify cosine >= threshold.
    Output: id_a, id_b, score, decision, tier='embedding'.

    Scale shape (round-2 rework): ONLY (band_key, vec_id) rows — 16
    bytes each — go through the banding shuffle; the multi-probe
    explode previously replicated the full vector column ×(n_bits+1)
    through the object store.  Vectors now reach the candidate pairs
    via the same two hash-partitioned cogroups the MinHash verify
    stage uses (attach emb_a by id_a, then attach emb_b + cosine by
    id_b); the normalized vector table is shuffled by vec_id ONCE and
    its partitions feed both cogroups, so the embeddings are read,
    normalized and shipped a single time regardless of n_bits.
    """
    seed = cfg.seed
    P = cfg.join_num_partitions
    # resolve d ONCE on the driver: empty shuffle batches must still
    # emit correctly-typed fixed_size_list columns (a tiny corpus can
    # hand norm_tbl a zero-row block, where m.shape[1] is 0)
    d0 = _probe_dim(embeddings, emb_col)
    if d0 == 0:
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "decision": pa.array([], pa.string()),
            "tier": pa.array([], pa.string()),
        }))

    def explode(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        dim = m.shape[1]
        codes = srp_bucket_codes(m, n_bits, seed, dim)
        ids = t[id_col].to_numpy()
        all_codes = [codes]
        for b in range(n_bits):
            all_codes.append(codes ^ (np.uint64(1) << np.uint64(b)))
        band_key = np.concatenate(all_codes).astype(np.int64)
        doc_id = np.tile(ids, n_bits + 1)
        return pa.table({"band_key": pa.array(band_key), "doc_id": pa.array(doc_id)})

    keyed = embeddings.map_batches(explode, batch_format="pyarrow")

    def gen(t: pa.Table) -> pa.Table:
        # numpy pair core (pairs.py): dedup within the partition; the
        # global dedup happens in the attach_a cogroup below
        # (partitioned by id_a — all copies of a pair land together),
        # as in minhash_candidate_pairs
        return minhash_pair_table(t, cfg.max_block_pairs)

    pairs = partition_apply(keyed, ["band_key"], P, gen, out_keys=["id_a"],
                            batch_format="pyarrow")

    # normalized vectors as fixed_size_list<double> — zero-copy numpy
    # view inside the cogroup merges
    def norm_tbl(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        n = m.shape[0]
        d = m.shape[1] if n else d0      # typed empty for 0-row blocks
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), d
        )
        return pa.table({"vec_id": t[id_col], "emb": fsl})

    # shuffled by vec_id ONCE and reused by both cogroups (the verify
    # stage's folded_sigs_by_id pattern): the embedding table is read
    # and normalized a single time instead of once per cogroup, and
    # the normalization runs inside the split tasks (pre_fn)
    vecs = shuffle_to(embeddings, ["vec_id"], P, pre_fn=norm_tbl)

    def _dim(r: pa.Table) -> int:
        return r.schema.field("emb").type.list_size

    def _emb_mat(col, d: int) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), d)

    def _gather(ids: np.ndarray, r_ids: np.ndarray, r_mat: np.ndarray):
        order = np.argsort(r_ids, kind="stable")
        srt = r_ids[order]
        pos = np.searchsorted(srt, ids)
        pos_c = np.minimum(pos, len(srt) - 1) if len(srt) else pos
        mask = (srt[pos_c] == ids) if len(srt) else np.zeros(len(ids), bool)
        idx = order[pos_c[mask]] if len(srt) else np.empty(0, np.int64)
        return mask, r_mat[idx]

    def attach_a(l: pa.Table, r: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "emb_a": pa.array([], pa.list_(pa.float64())),
        })
        if len(l) == 0 or len(r) == 0:
            return empty
        uniq = np.unique(
            np.stack([l["id_a"].to_numpy(), l["id_b"].to_numpy()], axis=1), axis=0
        )
        ia, ib = uniq[:, 0], uniq[:, 1]
        d = _dim(r)
        mask, rows = _gather(ia, r["vec_id"].to_numpy(), _emb_mat(r["emb"], d))
        n = int(mask.sum())
        offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
        return pa.table({
            "id_a": pa.array(ia[mask]), "id_b": pa.array(ib[mask]),
            "emb_a": pa.ListArray.from_arrays(
                offsets, pa.array(rows.reshape(-1), pa.float64())
            ),
        })

    with_a = cogroup_apply(pairs, vecs, ["id_a"], ["vec_id"], P, attach_a,
                           batch_format="pyarrow", out_keys=["id_b"])

    def attach_b_score(l: pa.Table, r: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "decision": pa.array([], pa.string()), "tier": pa.array([], pa.string()),
        })
        if len(l) == 0 or len(r) == 0:
            return empty
        d = _dim(r)
        ib = l["id_b"].to_numpy()
        mask, eb = _gather(ib, r["vec_id"].to_numpy(), _emb_mat(r["emb"], d))
        kept = l.filter(pa.array(mask))
        ea_col = kept["emb_a"]
        if isinstance(ea_col, pa.ChunkedArray):
            ea_col = ea_col.combine_chunks()
        ea = ea_col.flatten().to_numpy(zero_copy_only=False).reshape(len(kept), d)
        cos = np.round((ea * eb).sum(axis=1), 6)
        keep = cos >= cos_threshold
        return pa.table({
            "id_a": pa.array(kept["id_a"].to_numpy()[keep]),
            "id_b": pa.array(kept["id_b"].to_numpy()[keep]),
            "score": pa.array(cos[keep]),
            "decision": pa.array(np.full(int(keep.sum()), "match"), pa.string()),
            "tier": pa.array(np.full(int(keep.sum()), "embedding"), pa.string()),
        })

    out = cogroup_apply(with_a, vecs, ["id_b"], ["vec_id"], P, attach_b_score,
                        batch_format="pyarrow")
    # schema anchor: when EVERY partition is empty the shuffle yields
    # column-less blocks and the Dataset loses its schema — union one
    # typed zero-row table so consumers always see the 5 columns
    import ray.data as rd

    anchor = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
        "decision": pa.array([], pa.string()), "tier": pa.array([], pa.string()),
    }))
    return anchor.union(out)


def semantic_dedup(
    embeddings: Dataset,
    n_lists: int = 16,
    cos_threshold: float = 0.95,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_parts: int | None = None,
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the corpus with a spherical-k-means coarse quantizer
    (trained on a BOUNDED sample — the only driver materialization),
    then WITHIN each cluster drop every vector that has a
    lower-vec_id neighbor with cosine >= threshold.  Output one row
    per vector: (vec_id, ivf_list, keep).

    Drop rule (deterministic, fully vectorized): sort a cluster's
    members by vec_id, one matmul for the member cosine matrix, drop
    row i iff any j < i has cos(i, j) >= threshold — every dense
    semantic ball keeps exactly its minimal vec_id.  Known SemDeDup
    approximation: near-dup pairs STRADDLING a cluster boundary are
    not examined (the SRP-banded q26 path is the exhaustive
    alternative); recall grows with n_lists accuracy, precision is
    exact.

    Scale shape: vectors shuffle ONCE (hash on ivf_list); per-cluster
    work is O(m^2) vectorized, bounded by growing n_lists with corpus
    size (SemDeDup used 50 k clusters at LAION scale) — the cluster,
    not the corpus, is the unit a worker must hold.
    """
    P = num_parts or 16
    sample = embeddings.limit(sample_size).to_pandas()
    cent = spherical_kmeans(
        np.vstack(sample[emb_col].to_numpy()), n_lists, n_iters, seed
    )
    c_ref = ray.put(cent.T)  # (d, n_lists)

    def assign(t: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(t[emb_col]))
        lists = (m @ ray.get(c_ref)).argmax(axis=1).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "emb_norm": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float64()), m.shape[1]
            ),
            "ivf_list": pa.array(lists),
        })

    assigned = embeddings.map_batches(assign, batch_format="pyarrow")

    def dedup_cluster(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "ivf_list": pa.array([], pa.int64()),
                          "keep": pa.array([], pa.bool_())})
        if len(t) == 0:
            return empty
        ids_all, lists_all, keep_all = [], [], []
        df_lists = t["ivf_list"].to_numpy()
        m_all = _emb_matrix(t["emb_norm"])
        ids_col = t[id_col].to_numpy()
        for li in np.unique(df_lists):
            sel = df_lists == li
            ids = ids_col[sel]
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            m = m_all[sel][order]
            cos = m @ m.T
            dom = (cos >= cos_threshold) & np.tri(len(ids), k=-1, dtype=bool)
            drop = dom.any(axis=1)
            ids_all.append(ids)
            lists_all.append(np.full(len(ids), li, dtype=np.int64))
            keep_all.append(~drop)
        if not ids_all:
            return empty
        return pa.table({
            id_col: pa.array(np.concatenate(ids_all)),
            "ivf_list": pa.array(np.concatenate(lists_all)),
            "keep": pa.array(np.concatenate(keep_all)),
        })

    return partition_apply(assigned, ["ivf_list"], P, dedup_cluster,
                           batch_format="pyarrow")


# ------------------------------------------------- PCA compression

def pca_fit(embeddings: Dataset, k: int = 16,
            emb_col: str = "embedding") -> dict:
    """Fit a PCA projection from mergeable second-moment partials —
    the embedding-compression scale path (project d→k before ANN so
    index bytes and matmul cost drop d/k-fold at a measured recall
    trade).  Each batch emits (n, Σx, ΣxxT) with the d×d matrix
    packed as bytes (the q92 pattern); any fold order gives the same
    covariance up to float addition, and the eigendecomposition runs
    once on the driver over the d×d matrix — never over data.
    Deterministic sign: each component's largest-|coordinate| entry
    is made positive.  Returns {mean (d,), components (k, d),
    explained_var (k,)}."""

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t[emb_col])
        return pa.table({
            "n": pa.array([len(m)], pa.int64()),
            "s1": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
            "s2": pa.array([(m.T @ m).tobytes()], pa.binary()),
            "d": pa.array([m.shape[1]], pa.int64()),
        })

    parts = embeddings.map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    s1 = np.sum(np.vstack([np.frombuffer(b, np.float64)
                           for b in parts["s1"]]), axis=0)
    s2 = np.sum(np.stack([np.frombuffer(b, np.float64).reshape(d, d)
                          for b in parts["s2"]]), axis=0)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    comps = evecs[:, order].T               # (k, d)
    for i in range(len(comps)):             # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps,
            "explained_var": evals[order]}


def pca_transform(embeddings: Dataset, model: dict,
                  id_col: str = "vec_id",
                  emb_col: str = "embedding") -> Dataset:
    """Project vectors through a `pca_fit` model in one streaming
    pass (model broadcast once via ray.put); output column ``proj``
    is a fixed-size float64 list of length k, ready for the same
    brute-force / SRP / IVF serving paths."""
    ref = ray.put((model["mean"], model["components"].T))  # (d, k)

    def proj(t: pa.Table) -> pa.Table:
        mean, ct = ray.get(ref)
        m = _emb_matrix(t[emb_col])
        p = (m - mean) @ ct
        return pa.table({
            id_col: t[id_col],
            "proj": pa.FixedSizeListArray.from_arrays(
                pa.array(p.reshape(-1), pa.float64()), p.shape[1]),
        })

    return embeddings.map_batches(proj, batch_format="pyarrow")


# ------------------------------------------- int8 quantization

def quantize_fit(embeddings: Dataset,
                 emb_col: str = "embedding") -> dict:
    """Fit per-dimension affine int8 quantization bounds from
    mergeable (min, max) partials — elementwise extrema fold exactly
    in any order, so the model is batch-layout-independent (unlike
    float sums).  The scale path that cuts index bytes 4× (float32)
    to 8× (float64) ahead of ANN serving; pairs with `pca_fit` for
    multiplicative savings."""

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t[emb_col])
        return pa.table({
            "lo": pa.array([m.min(axis=0).tobytes()], pa.binary()),
            "hi": pa.array([m.max(axis=0).tobytes()], pa.binary()),
        })

    parts = embeddings.map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    lo = np.min(np.vstack([np.frombuffer(b, np.float64)
                           for b in parts["lo"]]), axis=0)
    hi = np.max(np.vstack([np.frombuffer(b, np.float64)
                           for b in parts["hi"]]), axis=0)
    scale = np.maximum(hi - lo, 1e-12) / 254.0   # codes -127..127
    return {"lo": lo, "scale": scale}


def quantize_transform(embeddings: Dataset, model: dict,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding") -> Dataset:
    """Quantize vectors to int8 codes (``q8`` fixed-size list) in one
    broadcast pass; `dequantize` inverts within half a step."""
    ref = ray.put((model["lo"], model["scale"]))

    def qz(t: pa.Table) -> pa.Table:
        lo, scale = ray.get(ref)
        m = _emb_matrix(t[emb_col])
        codes = np.clip(np.round((m - lo) / scale) - 127, -127, 127) \
            .astype(np.int8)
        return pa.table({
            id_col: t[id_col],
            "q8": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.int8()), m.shape[1]),
        })

    return embeddings.map_batches(qz, batch_format="pyarrow")


def dequantize(codes: np.ndarray, model: dict) -> np.ndarray:
    """int8 codes (n, d) → float64 approximations."""
    return (codes.astype(np.float64) + 127.0) * model["scale"] + model["lo"]


def _lloyd_kmeans(sample: np.ndarray, k: int, n_iters: int = 10,
                  seed: int = 42) -> np.ndarray:
    """Plain Euclidean Lloyd k-means with deterministic farthest-first
    seeding (the subspace trainer for product quantization — PQ wants
    Euclidean cells, not the spherical cones of `spherical_kmeans`).
    Empty cells reseed to the worst-served points each round."""
    x = np.asarray(sample, dtype=np.float64)
    n = len(x)
    k = max(1, min(k, n))
    rng = np.random.default_rng(seed)
    seeds = [int(rng.integers(n))]
    d2 = ((x - x[seeds[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(d2))
        seeds.append(nxt)
        d2 = np.minimum(d2, ((x - x[nxt]) ** 2).sum(axis=1))
    c = x[seeds].copy()
    for _ in range(n_iters):
        # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; argmin drops ||x||^2
        dist = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        assign = dist.argmin(axis=1)
        best = dist[np.arange(n), assign]
        sums = np.zeros_like(c)
        np.add.at(sums, assign, x)
        cnt = np.bincount(assign, minlength=k).astype(np.float64)
        empty = cnt == 0
        cnt[empty] = 1.0
        c = sums / cnt[:, None]
        if empty.any():
            far = np.argsort(-best)[: int(empty.sum())]
            c[np.flatnonzero(empty)] = x[far]
    return c


def pq_fit(embeddings: Dataset, m: int = 8, n_codes: int = 16,
           sample_size: int = 4096, n_iters: int = 10, seed: int = 42,
           emb_col: str = "embedding") -> dict:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    d dims into ``m`` contiguous subspaces and train ``n_codes``
    Euclidean centroids per subspace on a BOUNDED sample — the third
    member of the embedding-compression family (PCA cuts d, int8 cuts
    bytes/dim, PQ cuts to ``m`` BYTES PER VECTOR with a data-adaptive
    codebook, e.g. 64-dim float32 256 B → 8 B = 32×).  The sample is
    the only driver-side materialization (the ivf_index_build
    contract); returns ``{"codebooks": (m, n_codes, d//m)}``."""
    sample = embeddings.limit(sample_size).to_pandas()
    x = np.vstack(sample[emb_col].to_numpy()).astype(np.float64)
    return {"codebooks": _pq_fit_array(x, m, n_codes, n_iters, seed)}


def _pq_fit_array(x: np.ndarray, m: int, n_codes: int,
                  n_iters: int, seed: int) -> np.ndarray:
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack([
        _lloyd_kmeans(x[:, s * sub:(s + 1) * sub], n_codes, n_iters,
                      seed + s)
        for s in range(m)
    ])


def _pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, _, sub = books.shape
    codes = np.empty((len(x), m), dtype=np.uint8)
    for s in range(m):
        c = books[s]
        xs = x[:, s * sub:(s + 1) * sub]
        dist = -2.0 * (xs @ c.T) + (c * c).sum(axis=1)[None, :]
        codes[:, s] = dist.argmin(axis=1).astype(np.uint8)
    return codes


def pq_transform(embeddings: Dataset, model: dict,
                 id_col: str = "vec_id",
                 emb_col: str = "embedding") -> Dataset:
    """Encode vectors to (n, m) uint8 PQ codes in one broadcast pass
    (codebooks ship once via ray.put; per batch one matmul per
    subspace)."""
    ref = ray.put(model["codebooks"])

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        x = _emb_matrix(t[emb_col])
        m = books.shape[0]
        codes = _pq_encode(x, books)
        return pa.table({
            id_col: t[id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        })

    return embeddings.map_batches(enc, batch_format="pyarrow")


def pq_decode(codes: np.ndarray, model: dict) -> np.ndarray:
    """(n, m) uint8 codes → reconstructed (n, d) float64 vectors."""
    books = model["codebooks"]
    m, _, sub = books.shape
    return np.concatenate(
        [books[s][codes[:, s]] for s in range(m)], axis=1)


def pq_topk(codes_ds: Dataset, model: dict, query: np.ndarray,
            k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query builds ONE
    (m, n_codes) distance table against the broadcast codebooks; each
    batch is then a pure uint8 table-lookup sum — no float vector is
    ever read at serve time.  Per-batch local top-k partials combine
    on the driver (the brute_force_topk shape at 1/32 the bytes).
    Ties break on (adc_dist asc, vec_id asc), both exact."""
    books = model["codebooks"]
    m, _, sub = books.shape
    q = np.asarray(query, dtype=np.float64)
    dt = np.stack([
        ((books[s] - q[s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
        for s in range(m)
    ])                                          # (m, n_codes)
    dt_ref = ray.put(dt)

    def local(t: pa.Table) -> pa.Table:
        table = ray.get(dt_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "adc_dist": pa.array([], pa.float64())})
        codes = np.stack(t["pq_code"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        dist = np.zeros(len(ids), np.float64)
        for s in range(table.shape[0]):
            dist += table[s][codes[:, s]]
        order = np.lexsort((ids, dist))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "adc_dist": pa.array(dist[order])})

    parts = codes_ds.map_batches(local, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["adc_dist", id_col], kind="mergesort")
    return parts.head(k).reset_index(drop=True)


def ivfpq_index_build(
    embeddings: Dataset,
    index_dir: str,
    n_lists: int = 16,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """IVF-PQ index (the FAISS IVFADC composition, Jégou et al. 2011
    §IV): spherical-k-means coarse lists for probe pruning + product-
    quantized payloads for in-list scanning — together the at-scale
    ANN shape where BOTH the rows read (n_probes lists) and the bytes
    per row (m code bytes, e.g. 32× under 64-dim float32) shrink.

    Vectors are L2-NORMALIZED before encoding: on unit vectors
    ‖a−b‖² = 2−2·cos, so the ADC L2 ranking equals the cosine ranking
    and probe selection (cosine to centroids) and in-list ranking
    agree.  Codebooks train on the same bounded sample as the
    centroids (the only driver-side materialization); the assignment
    pass is linear and writes (id, pq_code) partitioned by
    ``ivf_list=``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    sample = embeddings.limit(sample_size).to_pandas()
    x = np.vstack(sample[emb_col].to_numpy()).astype(np.float64)
    xn = _normalize_rows(x)
    cent = spherical_kmeans(x, n_lists, n_iters, seed)
    books = _pq_fit_array(xn, m, n_codes, n_iters, seed)
    d = cent.shape[1]
    pq.write_table(
        pa.table({
            "ivf_list": pa.array(np.arange(len(cent), dtype=np.int64)),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(cent.reshape(-1), pa.float64()), d),
        }),
        f"{index_dir}/centroids.parquet",
    )
    pq.write_table(
        pa.table({
            "m": pa.array([books.shape[0]], pa.int64()),
            "n_codes": pa.array([books.shape[1]], pa.int64()),
            "sub": pa.array([books.shape[2]], pa.int64()),
            "books": pa.array([books.tobytes()], pa.binary()),
        }),
        f"{index_dir}/codebooks.parquet",
    )
    ref = ray.put((cent.T, books))

    def assign_batch(t: pa.Table) -> pa.Table:
        ct, bk = ray.get(ref)
        mm = _normalize_rows(_emb_matrix(t[emb_col]))
        lists = (mm @ ct).argmax(axis=1).astype(np.int64)
        codes = _pq_encode(mm, bk)
        return pa.table({
            id_col: t[id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), codes.shape[1]),
            "ivf_list": pa.array(lists),
        })

    embeddings.map_batches(assign_batch, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["ivf_list"])


def ivfpq_topk(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Serve top-k from an IVF-PQ index: pick the ``n_probes`` lists
    nearest the query, build ONE (m, n_codes) ADC distance table from
    the normalized query, and scan only those lists' uint8 codes with
    table-lookup sums — no float vector is read at serve time.
    ``n_probes >= n_lists`` scans every list (the correctness-gate
    mode, exact up to PQ resolution).  Ties break (adc_dist asc,
    id asc)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    ct = pq.read_table(f"{index_dir}/centroids.parquet")
    cent_col = ct["centroid"].combine_chunks()
    d = cent_col.type.list_size
    cent = cent_col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(len(ct), d)
    list_ids = ct["ivf_list"].to_numpy()
    order = np.argsort(-(cent @ qn), kind="stable")[: max(1, n_probes)]
    dirs = [
        p for li in list_ids[order]
        if os.path.isdir(p := os.path.join(index_dir, f"ivf_list={li}"))
    ]
    paths = _partition_paths(dirs)
    empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          "adc_dist": pd.Series(dtype="float64")})
    if not paths:
        return empty

    bt = pq.read_table(f"{index_dir}/codebooks.parquet")
    m, n_codes, sub = (int(bt["m"][0].as_py()),
                       int(bt["n_codes"][0].as_py()),
                       int(bt["sub"][0].as_py()))
    books = np.frombuffer(bt["books"][0].as_py(), np.float64) \
        .reshape(m, n_codes, sub)
    dt = np.stack([
        ((books[s] - qn[s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
        for s in range(m)
    ])
    dt_ref = ray.put(dt)

    def local(t: pa.Table) -> pa.Table:
        table = ray.get(dt_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "adc_dist": pa.array([], pa.float64())})
        code_col = t["pq_code"].combine_chunks()
        codes = code_col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(ids), table.shape[0]).astype(np.int64)
        dist = np.zeros(len(ids), np.float64)
        for s in range(table.shape[0]):
            dist += table[s][codes[:, s]]
        order = np.lexsort((ids, dist))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "adc_dist": pa.array(dist[order])})

    parts = rd.read_parquet(paths, columns=[id_col, "pq_code"]) \
        .map_batches(local, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return empty
    parts = parts.sort_values(["adc_dist", id_col], kind="mergesort")
    return parts.head(k).reset_index(drop=True)


def dbscan_embeddings(
    embeddings: Dataset,
    cfg: DedupConfig,
    cos_threshold: float = 0.95,
    min_pts: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Density clustering over the embedding column (DBSCAN, Ester et
    al. 1996, with cosine ε-neighborhoods) — the density member of the
    clustering family beside spherical k-means (q92) and threshold-CC
    semantic dedup (q42): a vector is CORE when its ε-ball holds ≥
    min_pts vectors (itself included); clusters are the connected
    components of the core–core ε-graph; non-core vectors adjacent to
    a core attach as BORDER (min cluster id across adjacent cores —
    deterministic where textbook DBSCAN is arrival-order-dependent);
    everything else is NOISE (cluster_id −1).  min_pts=1 degenerates
    to q42's CC.

    Composition of existing distributed shapes: ε-pairs via the SRP-
    bucketed `embedding_dup_pairs` (16 B/row shuffles), degrees via
    one id shuffle (the q120 pattern), core–core CC via the
    contracted union-find, border attach via one more pair pass over
    the broadcast core map (pair tables are near-dup-sparse by
    construction — the broadcast is the core LABEL map, bounded by
    nodes with edges, not the corpus)."""
    import ray

    from event_deduplication_ray.stages.cluster import connected_components

    pairs = embedding_dup_pairs(embeddings, cfg,
                                cos_threshold=cos_threshold,
                                id_col=id_col, emb_col=emb_col) \
        .select_columns(["id_a", "id_b"])

    def bidir(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    P = cfg.join_num_partitions
    deg = partition_apply(
        pairs.map_batches(bidir, batch_format="pyarrow"), ["src"], P,
        lambda df: df.groupby("src", as_index=False).size()
        .rename(columns={"size": "deg"}),
    ).to_pandas()
    if "src" not in deg.columns or not len(deg):
        all_ids = embeddings.select_columns([id_col]).to_pandas()
        return pd.DataFrame({
            id_col: all_ids[id_col].astype("int64"),
            "cluster_id": np.int64(-1),
            "role": "noise",
        }).sort_values(id_col).reset_index(drop=True)
    deg = deg.groupby("src", as_index=False)["deg"].sum()
    core_ids = np.sort(deg.loc[deg["deg"] >= min_pts - 1, "src"]
                       .to_numpy(np.int64))
    core_ref = ray.put(core_ids)

    def core_edges(t: pa.Table) -> pa.Table:
        cs = ray.get(core_ref)
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        keep = np.isin(a, cs) & np.isin(b, cs)
        return pa.table({"id_a": pa.array(a[keep]),
                         "id_b": pa.array(b[keep])})

    cc = connected_components(
        pairs.map_batches(core_edges, batch_format="pyarrow"), cfg
    ).to_pandas()
    label = dict(zip(cc["doc_id"], cc["cluster_id"])) \
        if "doc_id" in cc.columns else {}
    for c in core_ids:            # isolated cores: singleton clusters
        label.setdefault(int(c), int(c))
    label_ref = ray.put(label)

    def border_rows(t: pa.Table) -> pa.Table:
        lab = ray.get(label_ref)
        ls = pd.Series(lab, dtype="float64")
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        ids = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        nb_lab = ls.reindex(nbr).to_numpy()
        keep = ~np.isnan(nb_lab)
        if len(ls):
            keep &= ~np.isin(ids, ls.index.to_numpy())
        return pa.table({"vec": pa.array(ids[keep], pa.int64()),
                         "cl": pa.array(nb_lab[keep].astype(np.int64))})

    bd = pairs.map_batches(border_rows, batch_format="pyarrow").to_pandas()
    border = bd.groupby("vec")["cl"].min() if len(bd) and "vec" in bd \
        else pd.Series(dtype="int64")

    all_ids = embeddings.select_columns([id_col]).to_pandas()[id_col] \
        .to_numpy(np.int64)
    cl_out = np.full(len(all_ids), -1, np.int64)
    role = np.full(len(all_ids), "noise", object)
    lmap = pd.Series(label)
    core_mask = np.isin(all_ids, core_ids)
    cl_out[core_mask] = lmap.reindex(all_ids[core_mask]) \
        .to_numpy(np.int64)
    role[core_mask] = "core"
    if len(border):
        bmask = np.isin(all_ids, border.index.to_numpy(np.int64))
        cl_out[bmask] = border.reindex(all_ids[bmask]).to_numpy(np.int64)
        role[bmask] = "border"
    return pd.DataFrame({id_col: all_ids, "cluster_id": cl_out,
                         "role": role}) \
        .sort_values(id_col).reset_index(drop=True)


def mmr_topk(
    embeddings: Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    lambda_: float = 0.7,
    pool: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Diversified top-k via Maximal Marginal Relevance (Carbonell &
    Goldstein 1998): greedily pick argmax λ·cos(q, d) − (1−λ)·max
    cos(d, selected) — the re-rank that stops a near-dup clump from
    monopolizing a result page (the serving-side complement of the
    dedup passes).  Scale shape: the distributed part is ONE
    brute-force pass for the candidate pool (bounded at ``pool``
    rows) plus one pruned scan that fetches only the pool's vectors;
    the greedy loop runs on the driver over the pool×pool cosine
    matrix (pool² ≤ 10⁴ floats).  Ties break on vec_id asc."""
    cand = brute_force_topk(embeddings, query_vec, k=pool,
                            id_col=id_col, emb_col=emb_col)
    ids = cand[id_col].to_numpy(np.int64)
    if not len(ids):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "mmr_score": pd.Series(dtype="float64")})
    id_ref = ray.put(np.sort(ids))

    def fetch(t: pa.Table) -> pa.Table:
        want = ray.get(id_ref)
        tid = t[id_col].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(tid), bool)
        if len(tid):
            pos = np.searchsorted(want, np.clip(tid, want[0], want[-1]))
            keep = want[pos] == tid
        return t.filter(pa.array(keep))

    sub = embeddings.map_batches(fetch, batch_format="pyarrow") \
        .to_pandas()
    sub = sub.sort_values(id_col).reset_index(drop=True)
    m = _normalize_rows(np.vstack(sub[emb_col].to_numpy()))
    sids = sub[id_col].to_numpy(np.int64)
    q = np.asarray(query_vec, np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    rel = m @ qn
    sim = m @ m.T
    chosen: "list[int]" = []
    avail = np.ones(len(sids), bool)
    rows = []
    for rank in range(min(k, len(sids))):
        if chosen:
            div = sim[:, chosen].max(axis=1)
        else:
            div = np.zeros(len(sids))
        score = lambda_ * rel - (1.0 - lambda_) * div
        score[~avail] = -np.inf
        # deterministic: best score, then smallest vec_id
        best = np.lexsort((sids, -score))[0]
        rows.append((int(sids[best]), rank,
                     round(float(score[best]), 6)))
        chosen.append(best)
        avail[best] = False
    return pd.DataFrame(rows, columns=[id_col, "rank", "mmr_score"])
