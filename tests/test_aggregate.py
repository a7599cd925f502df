import numpy as np
import pandas as pd
import ray.data as rd

from event_deduplication_ray.stages.aggregate import (
    grouped_aggregate,
    grouped_aggregate_distributed,
)


def _ds():
    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 1000),
        "s": rng.choice(["x", "y"], 1000),
        "v": rng.normal(10, 2, 1000),
    })
    return rd.from_pandas(df).repartition(4), df


def test_grouped_aggregate_matches_pandas():
    ds, df = _ds()
    got = grouped_aggregate(
        ds, ["k"],
        [("n", "count", "v"), ("total", "sum", "v"), ("avg", "mean", "v"),
         ("lo", "min", "v"), ("hi", "max", "v")],
    ).sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(
        n=("v", "count"), total=("v", "sum"), avg=("v", "mean"),
        lo=("v", "min"), hi=("v", "max"),
    ).reset_index()
    assert list(got["n"]) == list(want["n"])
    assert np.allclose(got["total"], want["total"])
    assert np.allclose(got["avg"], want["avg"])
    assert np.allclose(got["lo"], want["lo"])
    assert np.allclose(got["hi"], want["hi"])


def test_grouped_aggregate_multi_key_strings():
    ds, df = _ds()
    got = grouped_aggregate(ds, ["k", "s"], [("n", "count", "v")])
    want = df.groupby(["k", "s"]).size().reset_index(name="n")
    m = got.merge(want, on=["k", "s"], suffixes=("_g", "_w"))
    assert len(m) == len(want)
    assert (m["n_g"] == m["n_w"]).all()


def test_distributed_matches_driver_side():
    ds, df = _ds()
    got = grouped_aggregate_distributed(
        ds, ["k"], [("n", "count", "v"), ("total", "sum", "v")], num_parts=4
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = grouped_aggregate(
        ds, ["k"], [("n", "count", "v"), ("total", "sum", "v")]
    ).sort_values("k").reset_index(drop=True)
    assert list(got["n"]) == list(want["n"])
    assert np.allclose(got["total"], want["total"])


def test_empty_dataset():
    ds = rd.from_pandas(pd.DataFrame({"k": [], "v": []}))
    got = grouped_aggregate(ds, ["k"], [("n", "count", "v")])
    assert len(got) == 0
