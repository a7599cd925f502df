"""Dead-letter / quarantine path: malformed input rows are excluded
from the pipeline output and land in {run_dir}/_rejected with a
reason (reference analog: failed files → dead-letter dir,
/root/reference/src/event_dedup/ingestion/file_processor.py:259-283)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.fixtures import wrap_html
from event_deduplication_ray.pipelines.dedup_pipeline import (
    dedup_path,
    dedup_path_resumable,
)

CFG = DedupConfig(use_substring=True, join_num_partitions=4)


def _mixed_corpus(tmp_path):
    """40 good docs + 3 malformed rows (empty html, whitespace html,
    html that extracts to nothing)."""
    rng = np.random.default_rng(9)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    texts = [
        " ".join("".join(letters[rng.integers(0, 26, size=6)]) for _ in range(60))
        for _ in range(40)
    ]
    urls = [f"https://ok.example/p{i:03d}" for i in range(40)]
    htmls = [wrap_html(texts[i], f"t{i}", "ok.example") for i in range(40)]
    # malformed rows
    urls += ["https://bad.example/empty", "https://bad.example/null",
             "https://bad.example/noextract"]
    texts += ["", "", ""]
    htmls += [b"", None, b"<html><article></article></html>"]
    n = len(urls)
    ts0 = np.datetime64("2025-06-01T00:00:00", "us")
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([ts0] * n, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "part-0000.parquet"))
    return str(d)


def test_rejected_rows_quarantined(tmp_path):
    docs_dir = _mixed_corpus(tmp_path)
    res = dedup_path(docs_dir, CFG)
    asn = res.assignments.to_pandas()
    assert len(asn) == 40                       # malformed rows excluded
    rej = res.rejected.to_pandas()
    assert len(rej) == 3
    assert set(rej["reject_reason"]) == {"empty_html", "empty_extraction"}
    assert all(u.startswith("https://bad.example/") for u in rej["url"])


def test_rejected_checkpointed_with_manifest_count(tmp_path):
    docs_dir = _mixed_corpus(tmp_path)
    run_dir = str(tmp_path / "run")
    res = dedup_path_resumable(docs_dir, run_dir, CFG)
    assert res.metrics["n_rejected"] == 3
    assert res.metrics["n_docs"] == 40
    rej = pq.read_table(f"{run_dir}/_rejected").to_pandas()
    assert len(rej) == 3 and "reject_reason" in rej.columns
