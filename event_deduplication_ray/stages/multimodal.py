"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata columns —
exactly how a 100 TB training-data pipeline treats them: the Ray-side
plumbing (schemas, actor-pool stages, small batches for large
payloads, early projection of the binary column) is real and tested;
the codec itself is STUBBED because no image/audio libraries exist in
this container.  Each stage takes ``decoder=...``:

- ``decoder="stub"``  → raises NotImplementedError at first batch
  (clearly-marked integration point for PIL/ffmpeg et al.);
- ``decoder="fake"``  → deterministic pure-numpy fake (parses a tiny
  self-describing header) so tests exercise the full actor path.

Fake payload format (fixtures): ``b"FAKE" + uint16 width + uint16
height + raw bytes`` — enough to test decode → feature → resize
plumbing deterministically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def make_fake_payload(media_id: int, width: int, height: int) -> bytes:
    rng = np.random.default_rng(media_id)
    raw = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return (
        b"FAKE"
        + int(width).to_bytes(2, "little")
        + int(height).to_bytes(2, "little")
        + raw
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    if payload[:4] != b"FAKE":
        raise ValueError("not a fake payload")
    w = int.from_bytes(payload[4:6], "little")
    h = int.from_bytes(payload[6:8], "little")
    return np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)


def make_fake_audio_payload(media_id: int, n_samples: int = 4096) -> bytes:
    """Fake audio clip: ``b"FAKA" + uint32 n_samples + int16 PCM``."""
    rng = np.random.default_rng(media_id)
    pcm = rng.integers(-(2 ** 14), 2 ** 14, size=n_samples, dtype=np.int16)
    return b"FAKA" + int(n_samples).to_bytes(4, "little") + pcm.tobytes()


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    if payload[:4] != b"FAKA":
        raise ValueError("not a fake audio payload")
    n = int.from_bytes(payload[4:8], "little")
    return np.frombuffer(payload[8 : 8 + 2 * n], dtype=np.int16)


class MediaDecodeStage:
    """Actor-pool stage: binary payload → (width, height, mean_px).

    Small ``batch_size`` (payloads dominate memory); the binary column
    is dropped from the output (project early).
    """

    def __init__(self, decoder: str = "stub"):
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "media decoding requires an image/audio codec library "
                "(PIL / torchvision / ffmpeg) not present in this "
                "environment; wire it here"
            )
        col = batch["payload"]
        n = len(col)
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        mean_px = np.zeros(n, np.float64)
        for i in range(n):
            # slice one Arrow binary scalar at a time (no to_pylist of
            # the whole batch — payloads dominate memory)
            img = _fake_decode(col[i].as_py())
            h[i], w[i] = img.shape
            mean_px[i] = float(img.mean()) if img.size else 0.0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "url": batch["url"],
                "kind": batch["kind"],
                "width": pa.array(w),
                "height": pa.array(h),
                "mean_px": pa.array(np.round(mean_px, 6)),
            }
        )


class MediaFeatureStage:
    """Actor-pool stage: payload → fixed-size feature vector.

    The fake path hashes payload chunks into a deterministic
    ``list<float>[dim]`` embedding (model inference stand-in); the
    model handle would be loaded once here in ``__init__``.
    """

    def __init__(self, decoder: str = "stub", dim: int = 16):
        self.decoder = decoder
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError("wire a feature extractor model here")
        feats = []
        col = batch["payload"]
        for i in range(len(col)):
            img = _fake_decode(col[i].as_py()).astype(np.float64)
            flat = img.reshape(-1)
            pad = (-len(flat)) % self.dim
            if pad:
                flat = np.concatenate([flat, np.zeros(pad)])
            feats.append(flat.reshape(-1, self.dim).mean(axis=0) / 255.0)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats) if feats else np.array([], np.float64)),
            self.dim,
        )
        return pa.table({"media_id": batch["media_id"], "embedding": emb})


def decode_media(
    media: Dataset, decoder: str = "stub", concurrency: int = 2, batch_size: int = 64
) -> Dataset:
    return media.map_batches(
        MediaDecodeStage,
        fn_constructor_args=(decoder,),
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, N): the pool may scale down to one actor when the
        # input has fewer blocks than N (silences Ray's min-
        # concurrency warning on tiny inputs; big inputs still
        # fan out to N)
        concurrency=(1, concurrency),
    )


def media_features(
    media: Dataset, decoder: str = "stub", dim: int = 16,
    concurrency: int = 2, batch_size: int = 64,
) -> Dataset:
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_args=(decoder, dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, N): the pool may scale down to one actor when the
        # input has fewer blocks than N (silences Ray's min-
        # concurrency warning on tiny inputs; big inputs still
        # fan out to N)
        concurrency=(1, concurrency),
    )


# ------------------------------------------------------------------
# Multimodal dedup: perceptual fingerprint → Hamming buckets → CC.
# Makes the media column a FIRST-CLASS dedup pass: the same
# pigeonhole-banding → pair-gen → connected-components machinery the
# text tiers use, fed by a frame-level fingerprint instead of a text
# signature.  The codec stays stubbed (decoder="stub" raises at the
# integration point); decoder="fake" drives the full path.


def phash64(img: np.ndarray, grid: int = 8) -> np.uint64:
    """Perceptual-hash-style 64-bit fingerprint: block-mean downscale
    to grid x grid, threshold each cell against the global cell
    median.  Near-identical frames (few pixels changed) flip at most
    the touched blocks' bits → small Hamming distance; unrelated
    frames land ~grid²/2 bits apart."""
    h, w = img.shape
    if h == 0 or w == 0:
        return np.uint64(0)
    # block-mean via trimmed reshape (cheap, deterministic)
    bh, bw = max(h // grid, 1), max(w // grid, 1)
    trimmed = img[: bh * grid, : bw * grid].astype(np.float64)
    th, tw = trimmed.shape
    gh, gw = th // bh, tw // bw
    cells = trimmed.reshape(gh, bh, gw, bw).mean(axis=(1, 3))
    # pad to grid x grid by tiling the edge (tiny images)
    if cells.shape != (grid, grid):
        cells = np.pad(cells, ((0, grid - cells.shape[0]), (0, grid - cells.shape[1])),
                       mode="edge")
    bits = (cells > np.median(cells)).reshape(-1)
    fp = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            fp |= np.uint64(1) << np.uint64(i)
    return fp


def afp64(pcm: np.ndarray, windows: int = 65) -> np.uint64:
    """Chromaprint-style 64-bit audio fingerprint: the clip splits
    into ``windows`` equal spans, bit i = energy(span i+1) >
    energy(span i).  Sign-of-delta is invariant to amplitude scaling
    (volume normalization) and robust to a few corrupted samples —
    near-identical clips land a small Hamming distance apart."""
    if pcm.size < windows:
        pcm = np.pad(pcm.astype(np.float64), (0, windows - pcm.size))
    n = (pcm.size // windows) * windows
    e = (pcm[:n].astype(np.float64) ** 2).reshape(windows, -1).mean(axis=1)
    bits = e[1:] > e[:-1]
    fp = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            fp |= np.uint64(1) << np.uint64(i)
    return fp


class MediaResizeStage:
    """Actor-pool stage: image payload → RESIZED image payload (the
    decode→resize→re-encode step of an image pipeline).  The fake
    codec path block-mean-downsamples to fit within (max_w, max_h)
    preserving aspect ratio and re-encodes as a FAKE payload, so the
    output column is again an opaque binary a downstream decode stage
    accepts; already-small images pass through byte-identical.
    Non-image rows pass through untouched.  Small ``batch_size`` —
    two payload copies are live per row during re-encode."""

    def __init__(self, decoder: str = "stub", max_w: int = 16,
                 max_h: int = 16):
        self.decoder = decoder
        self.max_w = int(max_w)
        self.max_h = int(max_h)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        if h <= self.max_h and w <= self.max_w:
            return img
        fy = -(-h // self.max_h)            # ceil division
        fx = -(-w // self.max_w)
        f = max(fy, fx)
        th, tw = h // f, w // f
        trimmed = img[: th * f, : tw * f].astype(np.float64)
        out = trimmed.reshape(th, f, tw, f).mean(axis=(1, 3))
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "image resizing requires a codec library (PIL/opencv) "
                "not present in this environment; wire it here"
            )
        col = batch["payload"]
        kinds = batch["kind"].to_pylist() if "kind" in batch.column_names \
            else ["image"] * len(col)
        out_payloads, out_w, out_h = [], [], []
        for i in range(len(col)):
            raw = col[i].as_py()
            if kinds[i] != "image":
                out_payloads.append(raw)
                out_w.append(0)
                out_h.append(0)
                continue
            img = self._resize(_fake_decode(raw))
            h, w = img.shape
            out_payloads.append(
                b"FAKE" + int(w).to_bytes(2, "little")
                + int(h).to_bytes(2, "little") + img.tobytes())
            out_w.append(w)
            out_h.append(h)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": pa.array(kinds),
            "payload": pa.array(out_payloads, pa.binary()),
            "width": pa.array(np.asarray(out_w, np.int64)),
            "height": pa.array(np.asarray(out_h, np.int64)),
        })


def resize_media(
    media: "Dataset", decoder: str = "stub", max_w: int = 16,
    max_h: int = 16, concurrency: int = 2, batch_size: int = 16,
) -> "Dataset":
    return media.map_batches(
        MediaResizeStage,
        fn_constructor_args=(decoder, max_w, max_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, N): the pool may scale down to one actor when the
        # input has fewer blocks than N (silences Ray's min-
        # concurrency warning on tiny inputs; big inputs still
        # fan out to N)
        concurrency=(1, concurrency),
    )


def make_fake_video_payload(media_id: int, width: int, height: int,
                            n_frames: int) -> bytes:
    """Fake video clip: ``b"FAKV" + uint16 w + uint16 h + uint16
    n_frames + frames`` (n_frames · h · w grayscale bytes)."""
    rng = np.random.default_rng(media_id)
    raw = rng.integers(0, 256, size=n_frames * width * height,
                       dtype=np.uint8).tobytes()
    return (b"FAKV" + int(width).to_bytes(2, "little")
            + int(height).to_bytes(2, "little")
            + int(n_frames).to_bytes(2, "little") + raw)


def _fake_decode_video(payload: bytes) -> np.ndarray:
    """→ (n_frames, h, w) uint8 array."""
    if payload[:4] != b"FAKV":
        raise ValueError("not a fake video payload")
    w = int.from_bytes(payload[4:6], "little")
    h = int.from_bytes(payload[6:8], "little")
    n = int.from_bytes(payload[8:10], "little")
    return np.frombuffer(payload[10:10 + n * w * h],
                         dtype=np.uint8).reshape(n, h, w)


class MediaFrameSampleStage:
    """Actor-pool stage: video payload → one row per SAMPLED frame
    (media_id, frame_idx, width, height, phash) — the frame-sample
    plumbing step of a video pipeline.  Sampling is deterministic:
    every ``stride``-th frame, at most ``max_frames`` per clip (frame
    0 always included), so re-runs and the oracle-side test see the
    same frames.  Non-video rows pass through with zero output rows;
    the binary column is dropped immediately (8-byte fingerprints ride
    every downstream shuffle).  Small ``batch_size`` — video payloads
    dominate worker memory."""

    def __init__(self, decoder: str = "stub", stride: int = 2,
                 max_frames: int = 8, grid: int = 8):
        self.decoder = decoder
        self.stride = max(int(stride), 1)
        self.max_frames = max(int(max_frames), 1)
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "video decoding requires a codec library (ffmpeg/ "
                "decord) not present in this environment; wire it here"
            )
        col = batch["payload"]
        kinds = batch["kind"].to_pylist() if "kind" in batch.column_names \
            else ["video"] * len(col)
        mids = batch["media_id"].to_numpy()
        out_mid, out_idx, out_w, out_h, out_fp = [], [], [], [], []
        for i in range(len(col)):
            if kinds[i] != "video":
                continue
            frames = _fake_decode_video(col[i].as_py())
            n, h, w = frames.shape
            take = np.arange(0, n, self.stride)[: self.max_frames]
            for j in take:
                out_mid.append(mids[i])
                out_idx.append(int(j))
                out_w.append(w)
                out_h.append(h)
                out_fp.append(phash64(frames[j], self.grid))
        return pa.table({
            "media_id": pa.array(np.asarray(out_mid, np.int64)),
            "frame_idx": pa.array(np.asarray(out_idx, np.int64)),
            "width": pa.array(np.asarray(out_w, np.int64)),
            "height": pa.array(np.asarray(out_h, np.int64)),
            "phash": pa.array(np.asarray(out_fp, np.uint64), pa.uint64()),
        })


def frame_samples(
    media: "Dataset", decoder: str = "stub", stride: int = 2,
    max_frames: int = 8, concurrency: int = 2, batch_size: int = 16,
) -> "Dataset":
    return media.map_batches(
        MediaFrameSampleStage,
        fn_constructor_args=(decoder, stride, max_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, N): the pool may scale down to one actor when the
        # input has fewer blocks than N (silences Ray's min-
        # concurrency warning on tiny inputs; big inputs still
        # fan out to N)
        concurrency=(1, concurrency),
    )


class MediaFingerprintStage:
    """Actor-pool stage: payload → (media_id, phash uint64),
    dispatching per row on ``kind``: images hash via block-mean
    ``phash64``, audio via energy-delta ``afp64`` — one fingerprint
    stage serves a mixed-media table.

    Deterministic, one fingerprint per item; the binary column is
    dropped immediately (project early, 8 bytes ride the shuffle)."""

    def __init__(self, decoder: str = "stub", grid: int = 8):
        self.decoder = decoder
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "media decoding requires a codec library (PIL/ffmpeg) "
                "not present in this environment; wire it here"
            )
        col = batch["payload"]
        kinds = batch["kind"].to_pylist() if "kind" in batch.column_names \
            else ["image"] * len(col)
        fps = np.empty(len(col), dtype=np.uint64)
        for i in range(len(col)):
            # slice the Arrow binary scalar lazily (no to_pylist of
            # the whole batch)
            if kinds[i] == "audio":
                fps[i] = afp64(_fake_decode_audio(col[i].as_py()))
            else:
                fps[i] = phash64(_fake_decode(col[i].as_py()), self.grid)
        return pa.table({
            "media_id": batch["media_id"],
            "phash": pa.array(fps, pa.uint64()),
        })


def media_fingerprints(
    media: "Dataset", decoder: str = "stub", grid: int = 8,
    concurrency: int = 2, batch_size: int = 64,
) -> "Dataset":
    return media.map_batches(
        MediaFingerprintStage,
        fn_constructor_args=(decoder, grid),
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, N): the pool may scale down to one actor when the
        # input has fewer blocks than N (silences Ray's min-
        # concurrency warning on tiny inputs; big inputs still
        # fan out to N)
        concurrency=(1, concurrency),
    )


def media_dup_clusters(media: "Dataset", cfg=None, decoder: str = "fake",
                       radius: int = 3) -> "Dataset":
    """Media near-dup clusters: fingerprints → pigeonhole Hamming
    buckets → verified pairs (distance ≤ radius) → connected
    components → (media_id, cluster_id) with singletons.

    Partitioning assumption: identical to the simhash text tier —
    band keys distribute by fingerprint chunks, hot buckets are capped
    by max_block_pairs star+chain pairing."""
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.banding import pigeonhole_band_keys
    from event_deduplication_ray.stages.cluster import (
        assignments_with_singletons,
        connected_components,
    )
    from event_deduplication_ray.stages.pairs import simhash_match_pairs

    cfg = (cfg or DedupConfig()).with_overrides(hamming_radius=radius)
    n_chunks = radius + 1

    fps = media_fingerprints(media, decoder=decoder)

    def explode(t: pa.Table) -> pa.Table:
        fp = t["phash"].to_numpy().astype(np.uint64)
        return pa.table({
            "band_key": pa.array(pigeonhole_band_keys(fp, n_chunks, 64)),
            "doc_id": pa.array(np.tile(t["media_id"].to_numpy(), n_chunks)),
            "simhash": pa.array(np.tile(fp, n_chunks)),
        })

    band = fps.map_batches(explode, batch_format="pyarrow")
    pairs = simhash_match_pairs(band, cfg, tier="phash")
    labels = connected_components(pairs.select_columns(["id_a", "id_b"]), cfg)
    ids = media.select_columns(["media_id"]).rename_columns(["doc_id"])
    out = assignments_with_singletons(ids, labels, cfg)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["media_id", "cluster_id"])

    return out.map_batches(rename, batch_format="pyarrow")


def video_dup_clusters(media: "Dataset", cfg=None, decoder: str = "fake",
                       radius: int = 3, min_shared_frames: int = 2,
                       stride: int = 2, max_frames: int = 8) -> "Dataset":
    """Video near-dup clusters: frame-sample → per-frame phash →
    pigeonhole Hamming buckets → frame-level matched pairs → media
    pairs that share >= min_shared_frames near-identical sampled
    frames → connected components.

    Machinery reuse: frame rows enter the SAME capped simhash banding
    the text tier uses, with doc_id salted as media_id·2¹⁶+frame_idx
    so pair dedup stays frame-level (assumes media_id < 2⁴⁷ and
    frame_idx < 2¹⁶ — both hold for sampled indices); un-salting is
    a shift.  The >= min_shared_frames vote makes a single
    coincidental frame collision insufficient to merge two videos.
    Partitioning assumption: identical to the simhash text tier."""
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.banding import pigeonhole_band_keys
    from event_deduplication_ray.stages.cluster import (
        assignments_with_singletons,
        connected_components,
    )
    from event_deduplication_ray.stages.pairs import simhash_match_pairs
    from event_deduplication_ray.stages.shuffle import partition_apply

    cfg = (cfg or DedupConfig()).with_overrides(hamming_radius=radius)
    n_chunks = radius + 1

    frames = frame_samples(media, decoder=decoder, stride=stride,
                           max_frames=max_frames)

    def explode(t: pa.Table) -> pa.Table:
        fp = t["phash"].to_numpy().astype(np.uint64)
        salted = (t["media_id"].to_numpy().astype(np.int64) << np.int64(16)) \
            | t["frame_idx"].to_numpy().astype(np.int64)
        return pa.table({
            "band_key": pa.array(pigeonhole_band_keys(fp, n_chunks, 64)),
            "doc_id": pa.array(np.tile(salted, n_chunks)),
            "simhash": pa.array(np.tile(fp, n_chunks)),
        })

    band = frames.map_batches(explode, batch_format="pyarrow")
    frame_pairs = simhash_match_pairs(band, cfg, tier="vframe")

    def to_media_pairs(df: pd.DataFrame) -> pd.DataFrame:
        va = df["id_a"].to_numpy(np.int64) >> np.int64(16)
        vb = df["id_b"].to_numpy(np.int64) >> np.int64(16)
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        keep = lo != hi
        out = pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})
        return out.groupby(["id_a", "id_b"], as_index=False).size() \
            .rename(columns={"size": "n"})

    def vote(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], as_index=False)["n"].sum()
        return g[g["n"] >= min_shared_frames][["id_a", "id_b"]]

    pre = frame_pairs.map_batches(to_media_pairs, batch_format="pandas")
    edges = partition_apply(pre, ["id_a", "id_b"],
                            cfg.join_num_partitions, vote)

    labels = connected_components(edges, cfg)
    import pyarrow.compute as pc

    def vids(t: pa.Table) -> pa.Table:
        m = pc.equal(t["kind"], "video")
        return pa.table({"doc_id": t.filter(m)["media_id"]})

    ids = media.map_batches(vids, batch_format="pyarrow")
    out = assignments_with_singletons(ids, labels, cfg)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["media_id", "cluster_id"])

    return out.map_batches(rename, batch_format="pyarrow")


def make_fake_video_table(
    n_groups: int = 4, members: int = 3, singletons: int = 6,
    seed: int = 19, width: int = 32, height: int = 32,
    n_frames: int = 12,
) -> pa.Table:
    """Deterministic video corpus with planted near-dup groups: group
    members share one base clip; member m flips m pixels in EVERY
    frame (per-frame phash Hamming stays <= m) and appends m extra
    random frames (length variation the sampler must tolerate).
    Singletons are independent random clips.  Ground truth:
    media_id = g·1000+m for members, 10⁶+i for singletons."""
    ids, payloads = [], []
    for g in range(n_groups):
        rng = np.random.default_rng(seed + g)
        base = rng.integers(0, 256, size=(n_frames, height, width),
                            dtype=np.uint8)
        for m in range(members):
            clip = base.copy()
            if m:
                pr = np.random.default_rng(seed * 1000 + g * 100 + m)
                for _ in range(m):
                    y, x = pr.integers(0, height), pr.integers(0, width)
                    clip[:, y, x] = 255 - clip[:, y, x]
                extra = pr.integers(0, 256, size=(m, height, width),
                                    dtype=np.uint8)
                clip = np.concatenate([clip, extra])
            ids.append(g * 1000 + m)
            payloads.append(b"FAKV" + width.to_bytes(2, "little")
                            + height.to_bytes(2, "little")
                            + int(clip.shape[0]).to_bytes(2, "little")
                            + clip.tobytes())
    srng = np.random.default_rng(seed + 333)
    for i in range(singletons):
        clip = srng.integers(0, 256, size=(n_frames, height, width),
                             dtype=np.uint8)
        ids.append(1_000_000 + i)
        payloads.append(b"FAKV" + width.to_bytes(2, "little")
                        + height.to_bytes(2, "little")
                        + int(n_frames).to_bytes(2, "little")
                        + clip.tobytes())
    return pa.table({
        "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "url": pa.array([f"https://media.example/v{i}" for i in ids]),
        "kind": pa.array(["video"] * len(ids)),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array(np.asarray([len(p) for p in payloads],
                                       np.int64)),
    })


def make_fake_audio_table(
    n_groups: int = 4, members: int = 3, singletons: int = 8,
    seed: int = 7, n_samples: int = 4096,
) -> pa.Table:
    """Deterministic audio corpus with planted near-dup groups: group
    members share one base clip with m corrupted (zeroed) samples —
    a handful of window energies move slightly, so afp64 Hamming
    stays small; singletons are independent random clips."""
    ids, payloads, kinds = [], [], []
    for g in range(n_groups):
        rng = np.random.default_rng(seed + g)
        base = rng.integers(-(2 ** 14), 2 ** 14, size=n_samples,
                            dtype=np.int16)
        for m in range(members):
            pcm = base.copy()
            if m:
                pr = np.random.default_rng(seed * 1000 + g * 100 + m)
                pos = pr.integers(0, n_samples, size=m)
                pcm[pos] = 0
            ids.append(g * 1000 + m)
            payloads.append(b"FAKA" + n_samples.to_bytes(4, "little")
                            + pcm.tobytes())
            kinds.append("audio")
    srng = np.random.default_rng(seed + 555)
    for i in range(singletons):
        pcm = srng.integers(-(2 ** 14), 2 ** 14, size=n_samples,
                            dtype=np.int16)
        ids.append(1_000_000 + i)
        payloads.append(b"FAKA" + n_samples.to_bytes(4, "little")
                        + pcm.tobytes())
        kinds.append("audio")
    return pa.table({
        "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "url": pa.array([f"https://media.example/a{i}" for i in ids]),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array(np.asarray([len(p) for p in payloads],
                                       np.int64)),
    })


def make_fake_media_table(
    n_groups: int = 5, members: int = 4, singletons: int = 10,
    seed: int = 42, width: int = 32, height: int = 32,
) -> pa.Table:
    """Deterministic media corpus with planted near-dup groups.

    Group g's members share one base frame (rng seed = seed+g) with
    member m differing in m pixels — phash Hamming ≤ m from the base,
    so the group clusters at radius ≥ members-1.  Singletons are
    independent random frames (expected pairwise Hamming ~32).
    Ground truth: media_id = g*1000+m for group members, 10^6+i for
    singletons."""
    ids, payloads = [], []
    for g in range(n_groups):
        rng = np.random.default_rng(seed + g)
        base = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
        for m in range(members):
            img = base.copy()
            if m:
                pr = np.random.default_rng(seed * 1000 + g * 100 + m)
                for _ in range(m):
                    y, x = pr.integers(0, height), pr.integers(0, width)
                    img[y, x] = 255 - img[y, x]
            ids.append(g * 1000 + m)
            payloads.append(
                b"FAKE" + width.to_bytes(2, "little")
                + height.to_bytes(2, "little") + img.tobytes()
            )
    srng = np.random.default_rng(seed + 777)
    for i in range(singletons):
        img = srng.integers(0, 256, size=(height, width), dtype=np.uint8)
        ids.append(1_000_000 + i)
        payloads.append(
            b"FAKE" + width.to_bytes(2, "little")
            + height.to_bytes(2, "little") + img.tobytes()
        )
    n = len(ids)
    return pa.table({
        "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "url": pa.array([f"https://media.example/{i}" for i in ids]),
        "kind": pa.array(["image"] * n),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array(np.asarray([len(p) for p in payloads], np.int64)),
    })
