"""Normalizer + extraction tests (reference pattern:
tests/test_normalizer.py umlaut/whitespace/punctuation cases)."""

import pandas as pd

from event_deduplication_ray import fixtures as F
from event_deduplication_ray.functions import text as T


def test_normalize_umlauts_and_case():
    out = T.normalize_text(pd.Series(["Grüße ÄÖÜ ß"]))
    assert out[0] == "gruesse aeoeue ss"


def test_normalize_whitespace_punct():
    out = T.normalize_text(pd.Series(["  Foo,   bar!  baz-qux?? "]))
    assert out[0] == "foo bar baz-qux"


def test_normalize_none_and_empty():
    out = T.normalize_text(pd.Series([None, "", "x"]))
    assert list(out) == ["", "", "x"]


def test_extract_roundtrip_byte_identical():
    """BASELINE.md per-row invariant: byte-identical text per url."""
    texts = [
        "Hello <world> & \"friends\"",
        "line one\nline two\tend",
        "ümlaut & <tags> 'quoted'",
        "",
    ]
    html = pd.Series(
        [F.wrap_html(t, f"t{i}", "s.example").decode() for i, t in enumerate(texts)]
    )
    out = T.extract_text_from_html(html)
    assert list(out) == texts


def test_extract_generic_fallback():
    html = pd.Series(
        ["<html><body><script>var x=1;</script><p>Real &amp; text</p></body></html>"]
    )
    assert T.extract_text_from_html(html)[0] == "Real & text"


def test_decode_binary():
    s = pd.Series([b"abc", "def".encode(), None])
    out = T.decode_binary_html(s)
    assert list(out) == ["abc", "def", ""]


def test_apply_synonyms_longest_first():
    s = pd.Series(["foo bar baz", "foobar x"])
    out = T.apply_synonyms(s, {"foo": "f", "foo bar": "fb"})
    assert out[0] == "fb baz"          # longest variant wins
    assert out[1] == "fbar x"


def test_strip_prefixes():
    s = pd.Series(["Breaking News - real content", "no prefix here",
                   "BREAKING NEWS: also content"])
    out = T.strip_prefixes(s, ("breaking news",))
    assert list(out) == ["real content", "no prefix here", "also content"]


def test_host_from_url():
    s = pd.Series(["https://a.example/x/y", "http://b.org", "garbage"])
    assert list(T.host_from_url(s)) == ["a.example", "b.org", ""]


def test_arrow_extraction_byte_identical_to_pandas():
    """The zero-object Arrow path must match the pandas reference path
    exactly on fixture pages AND generic pages."""
    import pyarrow as pa

    from event_deduplication_ray.functions.arrow_text import (
        extract_text_arrow,
        normalize_arrow,
    )

    texts = ["Hello <world> & \"friends\"", "line1\nline2\tx", "ümlaut 'q'"]
    pages = [F.wrap_html(t, f"t{i}", "s.ex").decode() for i, t in enumerate(texts)]
    pages.append("<html><body><script>x</script><p>Gen &amp; eric</p></body></html>")
    pd_out = list(T.extract_text_from_html(pd.Series(pages)))
    ar_out = extract_text_arrow(pa.array(pages)).to_pylist()
    assert ar_out == pd_out
    # normalization parity on ascii+umlaut content
    norm_pd = list(T.normalize_text(pd.Series(pd_out)))
    norm_ar = normalize_arrow(pa.array(pd_out)).to_pylist()
    assert norm_ar == norm_pd


def test_arrow_token_hashes_match_structure():
    import numpy as np
    import pyarrow as pa

    from event_deduplication_ray.functions.arrow_text import hash_tokens_arrow

    h, lens = hash_tokens_arrow(pa.array(["a b c", "", "a b c", "x"]))
    assert list(lens) == [3, 0, 3, 1]
    assert np.array_equal(h[:3], h[3:6])     # same text → same hashes
    assert h[0] != h[1]


def test_canonical_url_cases():
    import pandas as pd

    from event_deduplication_ray.functions.text import canonical_url

    got = canonical_url(pd.Series([
        "http://www.Ex.COM:80/a/?utm_source=x&utm_medium=y#frag",
        "http://ex.com/a",
        "https://ex.com:443/b?real=1&utm_campaign=z",
        "https://ex.com/b?real=1",
        "http://ex.com/c?utm_a=1&keep=2",
        "http://ex.com/d?keep=2&gclid=abc",
        "http://ex.com:8080/e/",          # non-default port kept
        "https://ex.com:80/f",            # :80 is NOT https default
        "not a url at all",
        None,
    ])).tolist()
    assert got[0] == "http://ex.com/a"
    assert got[1] == "http://ex.com/a"            # variants collapse
    assert got[2] == got[3] == "https://ex.com/b?real=1"
    assert got[4] == "http://ex.com/c?keep=2"
    assert got[5] == "http://ex.com/d?keep=2"
    assert got[6] == "http://ex.com:8080/e"
    assert got[7] == "https://ex.com:80/f"
    assert got[8] == "not a url at all"
    assert got[9] == ""
