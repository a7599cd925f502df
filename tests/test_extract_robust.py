"""Real-world HTML extraction hardening (round-2 VERDICT item 6):
charset sniffing (BOM / meta charset / utf-8 fallback), tolerance for
attribute-bearing / unclosed / nested <article>, site-chrome stripping
in the generic path, and a fuzz guarantee that extraction never throws
on arbitrary bytes — undecodable-into-nothing rows land in the
dead-letter table, not in a crash."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.functions.arrow_text import extract_text_arrow
from event_deduplication_ray.functions.text import (
    decode_html_bytes,
    extract_text_from_html,
)
from event_deduplication_ray.stages.extract import extract_batch

CFG = DedupConfig()


def _batch(html_rows: list[bytes | None]) -> pa.Table:
    n = len(html_rows)
    return pa.table({
        "url": pa.array([f"https://f.example/{i}" for i in range(n)]),
        "html": pa.array(html_rows, pa.binary()),
        "lang": pa.array(["en"] * n),
    })


def test_charset_meta_declaration_decoded():
    body = "café résumé straße"
    page = (
        '<html><head><meta charset="iso-8859-1"></head>'
        f"<body><article>{body}</article></body></html>"
    ).encode("iso-8859-1")
    assert decode_html_bytes(page).find(body) >= 0
    out = extract_batch(_batch([page]), CFG)
    assert out["text"].to_pylist() == [body]


def test_bom_decodes():
    page = "﻿<article>hello bom</article>".encode("utf-8")
    raw = b"\xef\xbb\xbf" + b"<article>hello bom</article>"
    assert decode_html_bytes(raw) == "<article>hello bom</article>"
    out = extract_batch(_batch([raw]), CFG)
    assert out["text"].to_pylist() == ["hello bom"]


def test_invalid_bytes_fall_back_to_replacement():
    raw = b"<article>ok \xff\xfe\xfa broken</article>"
    s = decode_html_bytes(raw)
    assert "ok" in s  # decoded something, no exception
    out = extract_batch(_batch([raw]), CFG)
    assert "ok" in out["text"].to_pylist()[0]


def test_article_variants_extract():
    cases = {
        b'<html><article class="main">attr body</article></html>': "attr body",
        b"<html><article>unclosed body": "unclosed body",
        b"<div><article><article>nested</article></article></div>": "nested",
    }
    for page, want in cases.items():
        out = extract_batch(_batch([page]), CFG)
        assert out["text"].to_pylist() == [want], page


def test_generic_path_strips_site_chrome():
    page = (
        b"<html><body><nav>home | about</nav><header>site head</header>"
        b"<p>real content here</p><footer>copyright</footer></body></html>"
    )
    out = extract_batch(_batch([page]), CFG)
    text = out["text"].to_pylist()[0]
    assert "real content here" in text
    for chrome in ("home | about", "site head", "copyright"):
        assert chrome not in text


def test_pandas_arrow_extraction_parity_on_edge_cases():
    pages = [
        '<article class="x">a</article>',
        "<article>unclosed",
        "<article><article>n</article></article>",
        "<nav>c</nav><p>body</p><footer>f</footer>",
        "<script>var x=1;</script>real",
        "no tags at all",
        "",
        "</article>before<article>after</article>",
    ]
    pd_out = extract_text_from_html(pd.Series(pages)).tolist()
    ar_out = extract_text_arrow(pa.array(pages, pa.string())).to_pylist()
    assert pd_out == ar_out


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_decode_never_throws(raw):
    s = decode_html_bytes(raw)
    assert isinstance(s, str)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8))
def test_fuzz_extract_batch_never_throws(rows):
    out = extract_batch(_batch(rows), CFG)
    assert len(out) == len(rows)
    # rows that decode to nothing carry a reject reason instead of
    # silently flowing
    text_len = np.array(
        [len(t) if t is not None else 0 for t in out["text"].to_pylist()]
    )
    reasons = out["reject_reason"].to_pylist()
    for i, row in enumerate(rows):
        if len(row) > 0 and text_len[i] == 0:
            assert reasons[i] is not None


def test_canonicalize_urls_dedups_tracking_variants(ray_session, tmp_path):
    """canonicalize_urls=True: three tracking/port/slash variants of
    one page collapse to ONE extracted doc (earliest warc_ts copy
    kept, deterministic), distinct pages survive; default config
    leaves all four rows distinct."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from event_deduplication_ray import fixtures as FX
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.functions.hashing import doc_ids_for_urls
    from event_deduplication_ray.stages.extract import extract_stage

    page = "one page of body text repeated across tracking variants"
    other = "an unrelated second page about something else entirely"
    df = pd.DataFrame({
        "url": ["http://www.site.example:80/a?utm_source=mail#top",
                "http://site.example/a/",
                "http://site.example/a",
                "http://site.example/b"],
        "warc_ts": ["2024-01-03T00:00:00Z", "2024-01-02T00:00:00Z",
                    "2024-01-01T00:00:00Z", "2024-01-01T00:00:00Z"],
        "html": [FX.wrap_html(page, "t", "site.example")] * 3
        + [FX.wrap_html(other, "t", "site.example")],
        "text": [page] * 3 + [other],
        "lang": ["en"] * 4,
    })
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)

    cfg = DedupConfig(canonicalize_urls=True, join_num_partitions=4)
    got = extract_stage(rd.read_parquet(p), cfg).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(got) == 2
    canon = "http://site.example/a"
    row = got[got["url"] == canon].iloc[0]
    assert row["doc_id"] == doc_ids_for_urls(pd.Series([canon]))[0]
    assert str(row["warc_ts"]).startswith("2024-01-01")  # earliest kept

    plain = extract_stage(rd.read_parquet(p),
                          DedupConfig(join_num_partitions=4)).to_pandas()
    assert len(plain) == 4                       # default: no collapse
