"""Tokenize → ids → greedy-pack → sharded Parquet sink: the final
mile of a pretraining data pipeline (the corpus leaves the engine as
training-ready packed token-id sequences).

Composes three proven pieces: q71's distributed vocab (min-count
floor, global ids), q66's greedy per-lang packer (budget-bounded
contiguous bins in doc_id order), and the run-dir Parquet sink
pattern (hive-partitioned by lang for partition-level resume —
SURVEY §2.1 S8's sharded output re-keyed to training shards).

Scale shape: tokenization and id-mapping happen in the SPLIT wave
(the vocab broadcasts once via ray.put), so the lang shuffle carries
compact int32 id lists, never text; each partition packs
independently and writes its own files.  Reference analog: the
chunked export writer (export/service.py:77-133) whose chunks are
record-count-bounded where these are token-budget-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from event_deduplication_ray.functions.hashing import tokenize_offsets

UNK_ID = -1


def build_vocab(docs, num_partitions: int = 16,
                min_count: int = 5) -> pd.DataFrame:
    """Distributed (token → id) vocab: count partials → hash combine
    with the min-count floor; ids are dense ranks over (freq desc,
    token asc) — deterministic, engine-independent (q71's shape)."""
    from event_deduplication_ray.stages.shuffle import partition_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = tokenize_offsets(df["text"].str.lower())
        if len(flat) == 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy(np.int64)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n"].sum()
        return g[g["n"] >= min_count]

    vf = partition_apply(docs.map_batches(partial, batch_format="pandas"),
                         ["token"], num_partitions, combine).to_pandas()
    if "token" not in vf.columns or len(vf) == 0:
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "token_id": pd.Series(dtype="int64")})
    vf = vf.sort_values(["n", "token"],
                        ascending=[False, True]).reset_index(drop=True)
    vf["token_id"] = np.arange(len(vf), dtype=np.int64)
    return vf


def write_packed_shards(docs, out_dir: str, budget: int = 512,
                        num_partitions: int = 16,
                        min_count: int = 5) -> pd.DataFrame:
    """Write hive-partitioned packed shards under ``out_dir``
    (``lang=<l>/*.parquet`` rows: pack_id, n_docs, n_tok, n_unk,
    ids:list<int>; ``vocab.parquet`` beside them).  Returns the
    per-lang summary frame.

    Packing invariants (tested): ids concatenate docs in doc_id
    order; no pack exceeds ``budget`` unless a single oversized doc
    owns it; out-of-vocab tokens keep their position as UNK_ID."""
    import os

    import pyarrow.parquet as pq

    from event_deduplication_ray.stages.shuffle import partition_apply

    os.makedirs(out_dir, exist_ok=True)
    vocab = build_vocab(docs, num_partitions, min_count)
    pq.write_table(pa.Table.from_pandas(vocab, preserve_index=False),
                   f"{out_dir}/vocab.parquet")
    vmap_ref = ray.put(pd.Index(vocab["token"]))

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        vidx = ray.get(vmap_ref)
        flat, lens = tokenize_offsets(df["text"].str.lower())
        ids32 = (vidx.get_indexer(flat).astype(np.int32)
                 if len(flat) else np.array([], np.int32))
        ends = np.cumsum(lens)
        starts = ends - lens
        unk = np.concatenate([[0], np.cumsum(ids32 == UNK_ID)]) \
            .astype(np.int64)
        # ids ride the shuffle as packed int32 BYTES (the q92 trick):
        # ragged list columns round-trip poorly through pandas blocks
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "lang": df["lang"].to_numpy(),
            "n_tok": lens.astype(np.int64),
            "n_unk": unk[ends] - unk[starts],
            "ids": [ids32[s:e].tobytes() for s, e in zip(starts, ends)],
        })

    def pack_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "lang": pd.Series(dtype="object"),
                "pack_id": pd.Series(dtype="int64"),
                "n_docs": pd.Series(dtype="int64"),
                "n_tok": pd.Series(dtype="int64"),
                "n_unk": pd.Series(dtype="int64"),
                "ids": pd.Series(dtype="object")})
        df = df.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        rows = []
        for lang, idx in df.groupby("lang", sort=False).indices.items():
            tok = df["n_tok"].to_numpy()[idx]
            cum = np.cumsum(tok)
            s, pid = 0, 0
            while s < len(idx):
                base = cum[s - 1] if s else 0
                j = int(np.searchsorted(cum, base + budget, side="right"))
                j = max(j, s + 1)
                sel = idx[s:j]
                ids = np.concatenate(
                    [np.frombuffer(b, np.int32) for b in df["ids"].iloc[sel]]
                ) if len(sel) else np.array([], np.int32)
                rows.append({
                    "lang": lang, "pack_id": pid,
                    "n_docs": int(len(sel)),
                    "n_tok": int(cum[j - 1] - base),
                    "n_unk": int(df["n_unk"].to_numpy()[sel].sum()),
                    "ids": ids.tolist(),
                })
                s, pid = j, pid + 1
        return pd.DataFrame(rows)

    packed = partition_apply(
        docs.map_batches(to_ids, batch_format="pandas"),
        ["lang"], num_partitions, pack_part)
    packed.write_parquet(out_dir, partition_cols=["lang"])

    shard_files = [
        os.path.join(out_dir, d, f)
        for d in sorted(os.listdir(out_dir)) if d.startswith("lang=")
        for f in sorted(os.listdir(os.path.join(out_dir, d)))
        if f.endswith(".parquet")
    ]
    frames = [pq.read_table(p, columns=["pack_id", "n_docs", "n_tok",
                                        "n_unk"]).to_pandas()
              .assign(lang=p.split("lang=")[1].split("/")[0])
              for p in shard_files]
    allp = (pd.concat(frames) if frames
            else pd.DataFrame({"lang": pd.Series(dtype="object"),
                               "pack_id": pd.Series(dtype="int64"),
                               "n_docs": pd.Series(dtype="int64"),
                               "n_tok": pd.Series(dtype="int64"),
                               "n_unk": pd.Series(dtype="int64")}))
    g = allp.groupby("lang", as_index=False).agg(
        n_packs=("pack_id", "size"), n_docs=("n_docs", "sum"),
        n_tokens=("n_tok", "sum"), n_unk=("n_unk", "sum"),
        max_pack_tok=("n_tok", "max"))
    for c in ("n_packs", "n_docs", "n_tokens", "n_unk", "max_pack_tok"):
        g[c] = g[c].astype("int64")
    return g.sort_values("lang").reset_index(drop=True)
