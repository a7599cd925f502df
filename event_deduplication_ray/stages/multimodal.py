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
        payloads = batch["payload"].to_pylist()
        w = np.zeros(len(payloads), np.int64)
        h = np.zeros(len(payloads), np.int64)
        mean_px = np.zeros(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            img = _fake_decode(p)
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
        for p in batch["payload"].to_pylist():
            img = _fake_decode(p).astype(np.float64)
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
        concurrency=concurrency,
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
        concurrency=concurrency,
    )
