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
