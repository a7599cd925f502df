"""Doc-id precedence in extraction (ADVICE r2): a table carrying BOTH
url and doc_id must key rows by the stable url-hash — eval maps golden
urls through doc_ids_for_urls, so a foreign doc_id would silently zero
recall.  Provided doc_id applies only to url-less driver tables."""

import numpy as np
import pyarrow as pa

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions.hashing import doc_ids_for_urls
from event_deduplication_ray.stages.extract import extract_batch


def _tbl(with_url: bool, with_doc_id: bool) -> pa.Table:
    n = 4
    cols = {
        "text": pa.array([f"some text body number {i} here" for i in range(n)]),
        "lang": pa.array(["en"] * n),
    }
    if with_url:
        cols["url"] = pa.array([f"https://x.example/{i}" for i in range(n)])
    if with_doc_id:
        cols["doc_id"] = pa.array(np.arange(100, 100 + n, dtype=np.int64))
    return pa.table(cols)


def test_url_hash_wins_over_provided_doc_id():
    out = extract_batch(_tbl(with_url=True, with_doc_id=True), DedupConfig())
    import pandas as pd

    want = doc_ids_for_urls(pd.Series([f"https://x.example/{i}" for i in range(4)]))
    assert out["doc_id"].to_pylist() == list(want)


def test_provided_doc_id_used_for_urlless_tables():
    out = extract_batch(_tbl(with_url=False, with_doc_id=True), DedupConfig())
    assert out["doc_id"].to_pylist() == [100, 101, 102, 103]
