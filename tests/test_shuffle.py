"""Shuffle-primitive integrity: no row lost, same keys co-located,
cogroup sides aligned — over random inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from event_deduplication_ray.stages.shuffle import (
    cogroup_apply,
    partition_apply,
)


def _rand_ds(n=5000, keys=200, seed=0, extra=None):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64),
        "v": rng.integers(0, 2**62, n).astype(np.int64),
    })
    if extra:
        df[extra] = rng.random(n)
    return rd.from_pandas(df).repartition(7), df


def test_partition_apply_preserves_rows_and_colocates_keys():
    ds, df = _rand_ds()
    seen_keys = []

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # record which keys this partition saw via a summary row set
        ks = g["k"].unique()
        return pd.DataFrame({"k": ks, "n": [int((g["k"] == k).sum()) for k in ks]})

    out = partition_apply(ds, ["k"], 5, fn).to_pandas()
    # each key appears in exactly ONE partition output → exactly one row per key
    assert out["k"].is_unique
    want = df.groupby("k").size()
    got = out.set_index("k")["n"]
    assert (got.sort_index() == want.sort_index()).all()


def test_partition_apply_identity_roundtrip():
    ds, df = _rand_ds(extra="x")
    out = partition_apply(ds, ["k"], 4, lambda g: g).to_pandas()
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = df.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k", "v"]], b[["k", "v"]])


def test_cogroup_apply_matches_pandas_join():
    l_ds, l_df = _rand_ds(3000, 150, seed=1)
    r_df = pd.DataFrame({
        "k": np.arange(150, dtype=np.int64),
        "w": np.arange(150, dtype=np.int64) * 7,
    })
    r_ds = rd.from_pandas(r_df).repartition(3)

    def fn(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return l.merge(r, on="k", how="inner")

    out = cogroup_apply(l_ds, r_ds, ["k"], ["k"], 6, fn).to_pandas()
    want = l_df.merge(r_df, on="k", how="inner")
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = want.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_split_concat_lz4_codec_roundtrip(monkeypatch):
    """The opt-in wire codec (EDR_SHUFFLE_CODEC=lz4, for network-bound
    multi-node shuffles) must be byte-equivalent to the raw path.
    Unit-level (split → concat in-process): the env var is read inside
    the worker that encodes, so a driver-side monkeypatch only reaches
    in-process calls."""
    from event_deduplication_ray.stages import shuffle as SH

    monkeypatch.setenv("EDR_SHUFFLE_CODEC", "lz4")
    _, df = _rand_ds(extra="x", seed=3)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    parts = SH._split_table(tbl, ["k"], 4)
    assert all(not isinstance(p, pa.Table) for p in parts)  # encoded
    back = SH._concat(list(parts)).to_pandas()
    a = back.sort_values(["k", "v"]).reset_index(drop=True)
    b = df.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k", "v", "x"]], b[["k", "v", "x"]])
    # empty-table edge: encodes and decodes without error
    empty = SH._split_table(tbl.slice(0, 0), ["k"], 3)
    assert len(SH._concat(list(empty))) == 0


def test_cogroup_pyarrow_mode_int64_fidelity():
    big = np.array([2**62 + 3, 2**62 + 5, 7], dtype=np.int64)
    l = rd.from_arrow(pa.table({"k": big, "a": big}))
    r = rd.from_arrow(pa.table({"k": big[:2], "b": big[:2] * -1}))

    def fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        ldf = lt.to_pandas()
        rdf = rt.to_pandas()
        return pa.Table.from_pandas(
            ldf.merge(rdf, on="k", how="inner"), preserve_index=False
        )

    out = cogroup_apply(l, r, ["k"], ["k"], 3, fn,
                        batch_format="pyarrow").to_pandas()
    assert set(out["k"]) == {2**62 + 3, 2**62 + 5}
    assert (out["a"] == out["k"]).all()
    assert (out["b"] == -out["k"]).all()


def test_shuffle_property_random_tables(ray_session):
    """Property sweep over the shuffle core: for random tables of
    varied size (including fewer rows than partitions, all-one-key
    skew, and negative keys), partition_apply with an identity fn
    preserves the exact multiset of rows, co-locates every key, and
    cogroup_apply reproduces a pandas inner join — at P = 3 and 16."""
    import numpy as np
    import pandas as pd

    import ray.data as rd
    from event_deduplication_ray.stages.shuffle import (
        cogroup_apply,
        partition_apply,
        shuffle_to,
    )

    rng = np.random.default_rng(123)
    for trial in range(6):
        n = int(rng.integers(1, 40))
        keys = rng.integers(-5, 6, n).astype(np.int64)
        if trial == 3:
            keys[:] = 7          # all-one-key skew
        df = pd.DataFrame({"k": keys,
                           "v": rng.integers(0, 100, n).astype(np.int64)})
        for P in (3, 16):
            out = partition_apply(rd.from_pandas(df), ["k"], P,
                                  lambda d: d).to_pandas()
            a = df.sort_values(["k", "v"]).reset_index(drop=True)
            b = out.sort_values(["k", "v"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b[["k", "v"]],
                                          check_dtype=False)

        other = pd.DataFrame({"k": rng.integers(-5, 6, 20).astype(np.int64),
                              "w": np.arange(20, dtype=np.int64)})
        r_sh = shuffle_to(rd.from_pandas(other), ["k"], 5)

        def join(l, r):
            if len(l) == 0 or len(r) == 0:
                return pd.DataFrame({"k": pd.Series(dtype="int64"),
                                     "v": pd.Series(dtype="int64"),
                                     "w": pd.Series(dtype="int64")})
            return l.merge(r, on="k")

        got = cogroup_apply(rd.from_pandas(df), r_sh, ["k"], ["k"],
                            5, join).to_pandas()
        want = df.merge(other, on="k")
        if "k" not in got.columns:
            got = pd.DataFrame({"k": pd.Series(dtype="int64"),
                                "v": pd.Series(dtype="int64"),
                                "w": pd.Series(dtype="int64")})
        a = got.sort_values(["k", "v", "w"]).reset_index(drop=True)
        b = want.sort_values(["k", "v", "w"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[["k", "v", "w"]], b,
                                      check_dtype=False)
