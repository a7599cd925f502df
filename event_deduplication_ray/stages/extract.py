"""Stage 1 — HTML → text extraction + normalization (stateless map).

Reference analogs: ingest flattening M10 + derived normalized columns
M12 (/root/reference/src/event_dedup/ingestion/file_processor.py:68-130,
221-236).  Per-row invariant (BASELINE.md): extracted text is
byte-identical per url to the reference extraction (the fixture's
``text`` column).

The stage drops ``html`` immediately after extraction (project early —
binary dominates block size, SURVEY.md §7.5.6) and appends:
- ``doc_id``   int64 stable hash of url (canonical ordering key);
- ``text``     extracted text (byte-identical target);
- ``text_norm``  canonical form for shingling.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions.hashing import doc_ids_for_urls
from event_deduplication_ray.functions.text import (
    decode_binary_html,
    extract_text_from_html,
    normalize_text,
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """html(binary) → text; appends doc_id/text/text_norm, drops html."""
    urls = batch["url"].to_pandas()
    html = decode_binary_html(batch["html"].to_pandas())
    text = extract_text_from_html(html)
    norm = normalize_text(text)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "doc_id": pa.array(doc_ids_for_urls(urls), pa.int64()),
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "text": pa.array(text, pa.string()),
        "text_norm": pa.array(norm, pa.string()),
    }
    return pa.table(cols)


def extract_stage(docs: Dataset, cfg: DedupConfig, batch_size: int = 1024) -> Dataset:
    out = docs.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
    if cfg.langs:
        langs = set(cfg.langs)

        def lang_gate(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.is_in(t["lang"], value_set=pa.array(sorted(langs))))

        out = out.map_batches(lang_gate, batch_format="pyarrow")
    return out


def normalize_only_stage(docs: Dataset, batch_size: int = 2048) -> Dataset:
    """For inputs that already carry extracted ``text`` (no html) —
    e.g. the driver's documents table (TESTDATA.md)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch["text"].to_pandas()
        norm = normalize_text(text)
        out = batch
        if "doc_id" not in batch.column_names:
            urls = batch["url"].to_pandas()
            out = out.append_column("doc_id", pa.array(doc_ids_for_urls(urls), pa.int64()))
        return out.append_column("text_norm", pa.array(norm, pa.string()))

    return docs.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
