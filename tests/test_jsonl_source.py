"""JSONL source (reference S1 analog: JSON file ingestion) — same
pipeline, different reader; html-less records still work because
extraction falls back to the text column."""

import json

import numpy as np

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.pipelines.dedup_pipeline import (
    dedup_path,
    read_docs,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_jsonl_docs_roundtrip_and_dedup(tmp_path):
    rng = np.random.default_rng(5)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def words(n):
        return " ".join(
            "".join(letters[rng.integers(0, 26, size=6)]) for _ in range(n)
        )

    base = words(80)
    rows = []
    for i in range(6):
        rows.append({
            "url": f"https://j.example/dup{i}",
            "warc_ts": "2026-01-01T00:00:00",
            "html": None,
            "text": base,            # 6 exact dups -> one cluster
            "lang": "en",
        })
    for i in range(5):
        rows.append({
            "url": f"https://j.example/uniq{i}",
            "warc_ts": "2026-01-01T00:00:00",
            "html": None,
            "text": words(80),
            "lang": "en",
        })
    p = tmp_path / "docs.jsonl"
    _write_jsonl(p, rows)

    ds = read_docs(str(p))
    assert ds.count() == 11

    res = dedup_path(str(p), DedupConfig(join_num_partitions=4))
    asn = res.assignments.to_pandas()
    assert len(asn) == 11
    # 6 dups in one cluster + 5 singletons
    sizes = sorted(asn.groupby("cluster_id").size().tolist())
    assert sizes == [1, 1, 1, 1, 1, 6]


def test_parquet_dir_with_stray_json_sidecar(tmp_path):
    """A Parquet dataset directory containing one stray JSON sidecar
    (manifest/metadata) must still be read as Parquet — and the
    sidecar must not be parsed as data."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "url": [f"https://p.example/{i}" for i in range(7)],
        "text": [f"parquet row number {i} words words" for i in range(7)],
        "lang": ["en"] * 7,
    })
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "part-0.parquet")
    (tmp_path / "manifest.json").write_text(json.dumps({"rows": 7}))

    ds = read_docs(str(tmp_path))
    assert ds.count() == 7
    assert "url" in ds.schema().names


def test_pure_jsonl_dir_reads_json(tmp_path):
    rows = [{"url": f"https://d.example/{i}",
             "text": f"dir jsonl row {i} more words here"} for i in range(3)]
    _write_jsonl(tmp_path / "a.jsonl", rows)
    ds = read_docs(str(tmp_path))
    assert ds.count() == 3


def test_jsonl_missing_optional_columns(tmp_path):
    """JSON records without html/lang/warc_ts still flow (typed-null
    fill), matching the reference's permissive JSON validator."""
    rows = [{"url": f"https://m.example/{i}",
             "text": f"unique text number {i} with several more words here"}
            for i in range(4)]
    p = tmp_path / "min.jsonl"
    _write_jsonl(p, rows)
    res = dedup_path(str(p), DedupConfig(join_num_partitions=2))
    asn = res.assignments.to_pandas()
    assert len(asn) == 4
    assert asn["cluster_id"].nunique() == 4


def test_gzipped_jsonl_source(tmp_path):
    """Crawl feeds ship as .jsonl.gz — read_docs must route them to
    the JSON reader (Arrow decompresses by extension) both as a single
    file and as a directory of gzipped shards."""
    import gzip

    rows = [
        {"url": f"https://gz.example/{i}",
         "warc_ts": "2026-01-01T00:00:00", "html": None,
         "text": f"gzipped shard document {i} with its own distinct "
                 f"words {i}", "lang": "en"}
        for i in range(8)
    ]
    d = tmp_path / "shards"
    d.mkdir()
    for shard in range(2):
        with gzip.open(d / f"part-{shard}.jsonl.gz", "wt") as f:
            for r in rows[shard * 4:(shard + 1) * 4]:
                f.write(json.dumps(r) + "\n")

    ds = read_docs(str(d))
    assert ds.count() == 8
    assert set(ds.schema().names) >= {"url", "text", "lang"}

    one = read_docs(str(d / "part-0.jsonl.gz"))
    assert one.count() == 4


def test_read_docs_csv_file_and_dir(ray_session, tmp_path):
    """CSV ingestion: single .csv file, pure-CSV directory, and the
    mixed-directory rule (a CSV sidecar must not flip a Parquet dir)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta", "gamma delta", "epsilon zeta"],
        "lang": ["en", "en", "de"]})

    f = tmp_path / "docs.csv"
    docs.to_csv(str(f), index=False)
    got = read_docs(str(f)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text", "lang"]], docs)

    d = tmp_path / "csvdir"
    d.mkdir()
    docs.iloc[:2].to_csv(str(d / "a.csv"), index=False)
    docs.iloc[2:].to_csv(str(d / "b.csv"), index=False)
    got = read_docs(str(d)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text", "lang"]], docs)

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(mixed / "data.parquet"))
    pd.DataFrame({"note": ["sidecar"]}).to_csv(str(mixed / "meta.csv"),
                                               index=False)
    got = read_docs(str(mixed)).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2, 3]
