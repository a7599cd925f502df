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


def test_phash_near_for_tweaked_frames():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    tweaked = base.copy()
    tweaked[5, 7] = 255 - tweaked[5, 7]
    a, b = MM.phash64(base), MM.phash64(tweaked)
    d = bin(int(a) ^ int(b)).count("1")
    assert d <= 2
    other = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    d2 = bin(int(a) ^ int(MM.phash64(other))).count("1")
    assert d2 > 10


def test_media_dup_clusters_planted_groups():
    """First-class media dedup pass: planted near-identical frames
    cluster together; singletons stay apart (VERDICT r1 #8)."""
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig

    t = MM.make_fake_media_table(n_groups=4, members=4, singletons=8)
    out = MM.media_dup_clusters(
        rd.from_arrow(t), DedupConfig(join_num_partitions=4),
        decoder="fake", radius=3,
    ).to_pandas()
    assert len(out) == 4 * 4 + 8
    lab = out.set_index("media_id")["cluster_id"]
    for g in range(4):
        ids = [g * 1000 + m for m in range(4)]
        assert lab[ids].nunique() == 1, f"group {g} shattered"
    # distinct groups don't merge; singletons are their own cluster
    group_labels = {lab[g * 1000] for g in range(4)}
    assert len(group_labels) == 4
    singles = lab[[1_000_000 + i for i in range(8)]]
    assert singles.nunique() == 8
    assert not (set(singles) & group_labels)


def test_media_fingerprint_stage_stub_raises():
    import pytest as _pytest

    with _pytest.raises(Exception):
        MM.media_fingerprints(_media_ds(), decoder="stub",
                              concurrency=1).to_pandas()


def test_media_dup_clusters_duplicate_free():
    """Edge case: no near-dup pairs at all — every item a singleton
    (exercises the empty pair/edge paths through phash → CC)."""
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig

    t = MM.make_fake_media_table(n_groups=0, members=0, singletons=12)
    out = MM.media_dup_clusters(
        rd.from_arrow(t), DedupConfig(join_num_partitions=4),
        decoder="fake", radius=3,
    ).to_pandas()
    assert len(out) == 12
    assert out["cluster_id"].nunique() == 12


def test_afp64_scale_invariant_and_robust():
    """Energy-delta sign bits are invariant to amplitude scaling and
    move only a few bits under light sample corruption; independent
    clips land far apart."""
    import numpy as np

    rng = np.random.default_rng(11)
    pcm = rng.integers(-(2 ** 14), 2 ** 14, size=4096, dtype=np.int16)
    fp = MM.afp64(pcm)
    assert MM.afp64(pcm // 2) == fp                       # volume halved
    tweaked = pcm.copy()
    tweaked[rng.integers(0, 4096, size=3)] = 0
    ham = bin(int(fp) ^ int(MM.afp64(tweaked))).count("1")
    assert ham <= 3
    other = np.random.default_rng(99).integers(
        -(2 ** 14), 2 ** 14, size=4096, dtype=np.int16)
    far = bin(int(fp) ^ int(MM.afp64(other))).count("1")
    assert far > 10


def test_audio_dup_clusters_planted_groups():
    """The audio path rides the SAME dedup machinery: planted
    near-identical clips cluster; singleton clips stay apart."""
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig

    t = MM.make_fake_audio_table(n_groups=4, members=3, singletons=8)
    out = MM.media_dup_clusters(
        rd.from_arrow(t), DedupConfig(join_num_partitions=4),
        decoder="fake", radius=3,
    ).to_pandas()
    assert len(out) == 4 * 3 + 8
    lab = out.set_index("media_id")["cluster_id"]
    for g in range(4):
        ids = [g * 1000 + m for m in range(3)]
        assert lab[ids].nunique() == 1, f"group {g} shattered"
    singles = lab[[1_000_000 + i for i in range(8)]]
    assert singles.nunique() == 8


def test_mixed_media_kinds_never_co_cluster():
    """One mixed image+audio table through one fingerprint stage:
    each kind's planted group clusters internally and no cluster
    spans kinds (Hamming verify rejects cross-kind collisions)."""
    import pyarrow as pa
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig

    img = MM.make_fake_media_table(n_groups=2, members=3, singletons=2)
    aud = MM.make_fake_audio_table(n_groups=2, members=3, singletons=2)
    # shift audio ids into a disjoint range
    aud = aud.set_column(0, "media_id",
                         pa.array(aud["media_id"].to_numpy() + 5_000_000))
    t = pa.concat_tables([img, aud])
    out = MM.media_dup_clusters(
        rd.from_arrow(t), DedupConfig(join_num_partitions=4),
        decoder="fake", radius=3,
    ).to_pandas()
    assert len(out) == len(t)
    kinds = {int(i): k for i, k in zip(t["media_id"].to_pylist(),
                                       t["kind"].to_pylist())}
    out["kind"] = out["media_id"].map(kinds)
    for _, grp in out.groupby("cluster_id"):
        assert grp["kind"].nunique() == 1
    lab = out.set_index("media_id")["cluster_id"]
    for g in range(2):
        assert lab[[g * 1000 + m for m in range(3)]].nunique() == 1
        assert lab[[5_000_000 + g * 1000 + m for m in range(3)]].nunique() == 1


def test_frame_sampler_deterministic_and_bounded():
    """Frame sampling: every 2nd frame capped at max_frames, frame 0
    always present, identical output across runs, and non-video rows
    contribute zero rows."""
    import pyarrow as pa
    import ray.data as rd

    vid = MM.make_fake_video_table(n_groups=1, members=1, singletons=0,
                                   n_frames=12)
    img = MM.make_fake_media_table(n_groups=1, members=1, singletons=0)
    t = pa.concat_tables([vid, img], promote_options="default")
    ds = rd.from_arrow(t)
    a = MM.frame_samples(ds, decoder="fake", stride=2, max_frames=4,
                         concurrency=1).to_pandas()
    b = MM.frame_samples(ds, decoder="fake", stride=2, max_frames=4,
                         concurrency=1).to_pandas()
    # only the video row (media_id 0) produced frames
    assert set(a["media_id"]) == {0}
    assert sorted(a["frame_idx"]) == [0, 2, 4, 6]
    assert (a["width"] == 32).all() and (a["height"] == 32).all()
    pd_sorted = lambda df: df.sort_values(["media_id", "frame_idx"]) \
        .reset_index(drop=True)
    assert pd_sorted(a).equals(pd_sorted(b))


def test_frame_sampler_stub_raises():
    import pytest as _pytest
    import ray.data as rd

    t = MM.make_fake_video_table(n_groups=1, members=1, singletons=0)
    with _pytest.raises(Exception):
        MM.frame_samples(rd.from_arrow(t), decoder="stub",
                         concurrency=1).to_pandas()


def test_video_dup_clusters_planted_groups():
    """Planted video near-dup groups (members differ by flipped
    pixels AND extra trailing frames) cluster; singletons stay
    apart."""
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig

    t = MM.make_fake_video_table(n_groups=3, members=3, singletons=6)
    out = MM.video_dup_clusters(
        rd.from_arrow(t), DedupConfig(join_num_partitions=4),
        decoder="fake", radius=3,
    ).to_pandas()
    assert len(out) == 3 * 3 + 6
    lab = out.set_index("media_id")["cluster_id"]
    for g in range(3):
        ids = [g * 1000 + m for m in range(3)]
        assert lab[ids].nunique() == 1, f"group {g} shattered"
    group_labels = {lab[g * 1000] for g in range(3)}
    assert len(group_labels) == 3
    singles = lab[[1_000_000 + i for i in range(6)]]
    assert singles.nunique() == 6
    assert not (set(singles) & group_labels)


def test_video_single_shared_frame_does_not_merge():
    """The >= 2 shared-frame vote: two videos that share exactly ONE
    sampled frame (the rest independent) must stay separate clusters."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig

    rng = np.random.default_rng(5)
    shared = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)

    def clip(seed, put_shared_at):
        r = np.random.default_rng(seed)
        frames = r.integers(0, 256, size=(8, 32, 32), dtype=np.uint8)
        frames[put_shared_at] = shared
        return (b"FAKV" + (32).to_bytes(2, "little")
                + (32).to_bytes(2, "little")
                + (8).to_bytes(2, "little") + frames.tobytes())

    payloads = [clip(100, 0), clip(200, 2)]
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "url": pa.array(["u1", "u2"]),
        "kind": pa.array(["video", "video"]),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })
    out = MM.video_dup_clusters(
        rd.from_arrow(t), DedupConfig(join_num_partitions=2),
        decoder="fake", radius=3,
    ).to_pandas()
    assert out["cluster_id"].nunique() == 2


def test_resize_stage_dims_and_roundtrip():
    """Resize: 32x32 → fits 16x16 (factor 2 block mean), output is a
    valid FAKE payload a decode stage accepts, small images pass
    through byte-identical, deterministic across runs."""
    import numpy as np
    import ray.data as rd

    t = MM.make_fake_media_table(n_groups=1, members=2, singletons=1,
                                 width=32, height=32)
    ds = rd.from_arrow(t)
    a = MM.resize_media(ds, decoder="fake", max_w=16, max_h=16,
                        concurrency=1).to_pandas()
    assert (a["width"] == 16).all() and (a["height"] == 16).all()
    for p in a["payload"]:
        img = MM._fake_decode(p)
        assert img.shape == (16, 16)
    b = MM.resize_media(ds, decoder="fake", max_w=16, max_h=16,
                        concurrency=1).to_pandas()
    assert a.sort_values("media_id")["payload"].tolist() == \
        b.sort_values("media_id")["payload"].tolist()
    # block-mean correctness on one hand frame
    src = MM._fake_decode(t["payload"][0].as_py()).astype(np.float64)
    want = np.clip(np.round(
        src.reshape(16, 2, 16, 2).mean(axis=(1, 3))), 0, 255
    ).astype(np.uint8)
    got = MM._fake_decode(
        a.set_index("media_id").loc[0, "payload"])
    assert (got == want).all()
    # already-small image passes through byte-identical
    small = MM.make_fake_media_table(n_groups=1, members=1, singletons=0,
                                     width=8, height=8)
    out = MM.resize_media(rd.from_arrow(small), decoder="fake",
                          concurrency=1).to_pandas()
    assert out["payload"].iloc[0] == small["payload"][0].as_py()


def test_resize_stage_stub_raises():
    import pytest as _pytest
    import ray.data as rd

    t = MM.make_fake_media_table(n_groups=1, members=1, singletons=0)
    with _pytest.raises(Exception):
        MM.resize_media(rd.from_arrow(t), decoder="stub",
                        concurrency=1).to_pandas()


def test_resize_preserves_phash():
    """The resize and dedup stages compose: a block-mean downscale
    must leave the block-mean phash essentially unchanged (Hamming
    <= 6 of 64), so media dedup still clusters a resized variant
    with its original — the real-world re-encoded-copy case."""
    import numpy as np
    import ray.data as rd

    t = MM.make_fake_media_table(n_groups=3, members=1, singletons=2,
                                 width=32, height=32)
    ds = rd.from_arrow(t)
    resized = MM.resize_media(ds, decoder="fake", max_w=16, max_h=16,
                              concurrency=1).to_pandas()
    orig = t.to_pandas()
    for mid in orig["media_id"]:
        h0 = MM.phash64(MM._fake_decode(
            orig.set_index("media_id").loc[mid, "payload"]))
        h1 = MM.phash64(MM._fake_decode(
            resized.set_index("media_id").loc[mid, "payload"]))
        dist = bin(int(h0) ^ int(h1)).count("1")
        assert dist <= 6, (mid, dist)
