import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from event_deduplication_ray.stages import multimodal as MM


def _media_ds(n=10):
    rows = {
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array([f"https://m/{i}.img" for i in range(n)]),
        "kind": pa.array(["image"] * n),
        "payload": pa.array(
            [MM.make_fake_payload(i, 8 + i, 4 + i) for i in range(n)], pa.binary()
        ),
        "n_bytes": pa.array([(8 + i) * (4 + i) + 8 for i in range(n)], pa.int64()),
    }
    return rd.from_arrow(pa.table(rows))


def test_decode_fake_deterministic():
    out = MM.decode_media(_media_ds(), decoder="fake", concurrency=1).to_pandas()
    assert len(out) == 10
    assert list(out.sort_values("media_id")["width"]) == [8 + i for i in range(10)]
    out2 = MM.decode_media(_media_ds(), decoder="fake", concurrency=1).to_pandas()
    assert out.sort_values("media_id")["mean_px"].tolist() == \
        out2.sort_values("media_id")["mean_px"].tolist()
    assert "payload" not in out.columns   # binary projected away


def test_features_shape():
    out = MM.media_features(_media_ds(), decoder="fake", dim=16,
                            concurrency=1).to_pandas()
    assert len(out) == 10
    v = out.iloc[0]["embedding"]
    assert len(v) == 16
    assert all(0.0 <= x <= 1.0 for x in v)


def test_stub_raises():
    with pytest.raises(Exception) as exc_info:
        MM.decode_media(_media_ds(), decoder="stub", concurrency=1).to_pandas()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
