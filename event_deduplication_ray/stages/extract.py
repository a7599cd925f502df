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


def extract_batch(batch: pa.Table, cfg: DedupConfig | None = None) -> pa.Table:
    """html(binary) → text; appends doc_id/source/text/text_norm,
    drops html."""
    from event_deduplication_ray.functions.text import (
        apply_synonyms,
        host_from_url,
        strip_prefixes,
    )

    import pyarrow.compute as pc

    n_in = len(batch)
    # driver-table shape (TESTDATA.md documents: doc_id, text, lang,
    # source, n_chars — no url): rows are keyed by their existing
    # doc_id; a synthetic doc:// url stands in for provenance columns
    had_doc_id = "doc_id" in batch.column_names
    had_url = "url" in batch.column_names
    if not had_url:
        if not had_doc_id:
            raise ValueError(
                "input table needs a 'url' or 'doc_id' column "
                "(got: %s)" % batch.column_names
            )
        urls = "doc://" + batch["doc_id"].to_pandas().astype(str)
        batch = batch.append_column("url", pa.array(urls, pa.string()))
    else:
        urls = batch["url"].to_pandas()
        if cfg is not None and cfg.canonicalize_urls:
            # tracking-variant urls collapse to ONE key, hence one
            # doc_id; extract_stage keeps the earliest copy per id
            from event_deduplication_ray.functions.text import canonical_url

            urls = canonical_url(urls)
            batch = batch.set_column(
                batch.column_names.index("url"), "url",
                pa.array(urls, pa.string()))
    # JSON-lines inputs may carry an all-null html column (pa.null
    # type), omit optional columns entirely, and/or ship
    # pre-extracted text (the reference's JSON record shape) —
    # normalize the html column type, fill absent optional columns
    # with typed nulls, and remember the provided text as the
    # fallback for html-less rows.
    if "html" not in batch.column_names:
        batch = batch.append_column("html", pa.nulls(n_in, pa.binary()))
    if "lang" not in batch.column_names:
        batch = batch.append_column("lang", pa.nulls(n_in, pa.string()))
    if "warc_ts" not in batch.column_names:
        batch = batch.append_column("warc_ts", pa.nulls(n_in, pa.string()))
    html_in = batch["html"]
    if pa.types.is_null(html_in.type):
        html_in = pc.cast(html_in, pa.binary())
    provided_text = None
    if "text" in batch.column_names and not pa.types.is_null(batch["text"].type):
        provided_text = pc.fill_null(pc.cast(batch["text"], pa.string()), "")

    use_arrow = cfg is None or cfg.use_arrow_strings
    if use_arrow and not (cfg and (cfg.strip_prefixes or cfg.synonyms)):
        # zero-Python-object path (see functions/arrow_text.py)
        from event_deduplication_ray.functions.arrow_text import (
            extract_text_arrow,
            normalize_arrow,
        )

        try:
            # fast path: the whole batch is valid utf-8 (zero-copy cast)
            html_str = pc.cast(html_in, pa.string())
        except pa.ArrowInvalid:
            # dirty batch (non-utf-8 pages): charset-aware per-row
            # decode (BOM / meta charset / replacement) — only batches
            # that actually contain such pages pay the Python cost
            from event_deduplication_ray.functions.text import decode_html_bytes

            if isinstance(html_in, pa.ChunkedArray):
                html_in2 = html_in.combine_chunks()
            else:
                html_in2 = html_in
            html_str = pa.array(
                [decode_html_bytes(v.as_py()) for v in html_in2], pa.string()
            )
        text_arr = extract_text_arrow(html_str)
        if provided_text is not None:
            no_html = pc.less_equal(
                pc.fill_null(pc.binary_length(html_in), 0), 0
            )
            text_arr = pc.if_else(no_html, provided_text, text_arr)
        norm_arr = normalize_arrow(text_arr)
    else:
        from event_deduplication_ray.functions.text import (
            apply_synonyms,
            strip_prefixes,
        )

        html = decode_binary_html(html_in.to_pandas())
        text = extract_text_from_html(html)
        if provided_text is not None:
            import numpy as _np

            no_html = html.fillna(b"").str.len().to_numpy() == 0
            pt = provided_text.to_pandas()
            text = text.where(~_np.asarray(no_html), pt)
        # boilerplate stripping and synonym folding touch only the
        # normalized shingling form — the ``text`` column must stay
        # byte-identical per url (BASELINE.md invariant)
        norm = normalize_text(text)
        if cfg is not None and cfg.strip_prefixes:
            norm = strip_prefixes(norm, cfg.strip_prefixes)
        if cfg is not None and cfg.synonyms:
            norm = apply_synonyms(norm, dict(cfg.synonyms))
        text_arr = pa.array(text, pa.string())
        norm_arr = pa.array(norm, pa.string())
    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()

    # dead-letter reasons (reference: failed files land in a
    # dead-letter dir with a failure row,
    # /root/reference/src/event_dedup/ingestion/file_processor.py:259-283).
    # A malformed row is tagged, EXCLUDED from the pipeline output, and
    # routed to the run's _rejected table — never silently folded into
    # a singleton cluster.
    html_len = pc.fill_null(pc.binary_length(html_in), 0)
    text_len0 = pc.utf8_length(pc.fill_null(text_arr, ""))
    # html-less rows are fine when they carried text (JSON shape);
    # rejected only when BOTH are empty
    empty_html = pc.and_(pc.less_equal(html_len, 0),
                         pc.less_equal(text_len0, 0))
    empty_extract = pc.and_(
        pc.greater(html_len, 0),
        pc.less_equal(text_len0, 0),
    )
    reason = pc.if_else(
        empty_html, pa.scalar("empty_html", pa.string()),
        pc.if_else(empty_extract, pa.scalar("empty_extraction", pa.string()),
                   pa.scalar(None, pa.string())),
    )

    # id precedence: when a url exists, the stable url-hash id WINS —
    # eval maps golden urls through doc_ids_for_urls, so honoring a
    # foreign doc_id alongside urls would silently zero recall.  A
    # provided doc_id is used only for url-less driver tables.
    doc_id_col = (
        pc.cast(batch["doc_id"], pa.int64())
        if (had_doc_id and not had_url)
        else pa.array(doc_ids_for_urls(urls), pa.int64())
    )
    source_col = (
        pc.cast(batch["source"], pa.string())
        if "source" in batch.column_names
        else pa.array(host_from_url(urls), pa.string())
    )
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "doc_id": doc_id_col,
        "url": batch["url"],
        "source": source_col,
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "text": text_arr,
        "text_len": pc.cast(pc.utf8_length(text_arr), pa.int64()),
        "text_norm": norm_arr,
        "reject_reason": reason,
    }
    return pa.table(cols)


def extract_stage(
    docs: Dataset, cfg: DedupConfig, batch_size: int = 1024,
    keep_rejected: bool = False,
) -> Dataset:
    """Extraction + validity gate.  Malformed rows (see extract_batch)
    are dropped from the main flow — use ``rejected_stage`` (or
    ``keep_rejected=True`` to keep the tag column) to consume them."""
    import functools

    import pyarrow.compute as pc

    out = docs.map_batches(
        functools.partial(extract_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=batch_size,
    )
    if not keep_rejected:
        def ok_gate(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t["reject_reason"])).drop_columns(
                ["reject_reason"]
            )

        out = out.map_batches(ok_gate, batch_format="pyarrow")

        if cfg.canonicalize_urls:
            # canonicalization makes doc_id non-unique (url variants of
            # one page collide by design): ONE id shuffle keeps the
            # deterministic earliest (warc_ts, url) copy per id
            from event_deduplication_ray.stages.shuffle import partition_apply

            def keep_first(df):
                df = df.sort_values(["doc_id", "warc_ts", "url"],
                                    na_position="last")
                return df.drop_duplicates("doc_id", keep="first")

            out = partition_apply(out, ["doc_id"],
                                  cfg.join_num_partitions, keep_first)
    if cfg.langs:
        langs = set(cfg.langs)

        def lang_gate(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["lang"], value_set=pa.array(sorted(langs))))

        out = out.map_batches(lang_gate, batch_format="pyarrow")
    return out


def rejected_stage(docs: Dataset, cfg: DedupConfig, batch_size: int = 1024) -> Dataset:
    """The dead-letter subset: (doc_id, url, source, warc_ts,
    reject_reason) for every malformed input row."""
    import functools

    import pyarrow.compute as pc

    out = docs.map_batches(
        functools.partial(extract_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=batch_size,
    )

    def bad_gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["reject_reason"])).select(
            ["doc_id", "url", "source", "warc_ts", "reject_reason"]
        )

    return out.map_batches(bad_gate, batch_format="pyarrow")


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
