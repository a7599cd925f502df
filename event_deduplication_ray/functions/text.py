"""Vectorized text kernels: HTML → text extraction and normalization.

Reference analogs: normalizer M1 (lowercase → NFC → umlaut expansion →
whitespace collapse → punctuation strip keeping hyphens,
/root/reference/src/event_dedup/preprocessing/normalizer.py:16-67) and
the ingest flattening projection M10 re-keyed to html→text extraction.
All functions operate on a whole pandas Series at once (C-level string
kernels) — never per row.
"""

from __future__ import annotations

import pandas as pd

# Umlaut expansion table (reference normalizer.py:34-41) — multi-char
# outputs, applied via str.translate (ordinal -> replacement string).
_UMLAUTS = {
    ord("ä"): "ae", ord("ö"): "oe", ord("ü"): "ue", ord("ß"): "ss",
    ord("Ä"): "ae", ord("Ö"): "oe", ord("Ü"): "ue",
}

# html.escape(quote=True) produces exactly these five entities; the
# inverse must unescape &amp; LAST so "&amp;lt;" round-trips correctly.
_UNESCAPES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#x27;", "'"), ("&amp;", "&"),
]


def apply_synonyms(s: pd.Series, synonyms: dict[str, str]) -> pd.Series:
    """Ordered longest-first substring replacement (reference M4/M5,
    /root/reference/src/event_dedup/preprocessing/synonyms.py:15-67):
    variants are replaced by their canonical form, longest variant
    first so overlapping variants resolve deterministically."""
    import re

    for variant in sorted(synonyms, key=len, reverse=True):
        s = s.str.replace(
            re.escape(variant), synonyms[variant], regex=True, case=False
        )
    return s


def strip_prefixes(s: pd.Series, prefixes: tuple[str, ...]) -> pd.Series:
    """Strip ONE leading boilerplate prefix (site chrome / source
    label), case-insensitive, separator = dash variants / colon /
    whitespace (reference M6,
    preprocessing/prefix_stripper.py:46-86 — non-recursive)."""
    import re

    if not prefixes:
        return s
    alt = "|".join(re.escape(p) for p in sorted(prefixes, key=len, reverse=True))
    pat = rf"^\s*(?:{alt})\s*[-–—:|]\s*"
    return s.str.replace(pat, "", regex=True, case=False)


def host_from_url(urls: pd.Series) -> pd.Series:
    """url → host (reference S3 source-code extractor analog,
    ingestion/json_loader.py:120-132: per-source provenance key)."""
    return urls.str.extract(r"^[a-z]+://([^/]+)", expand=False).fillna("")


def canonical_url(urls: pd.Series) -> pd.Series:
    """Crawl-grade URL canonicalization: lowercase scheme and host,
    strip one leading 'www.', drop default ports (:80 http / :443
    https), drop the #fragment, remove tracking query params
    (utm_*, gclid, fbclid), tidy leftover '?'/'&', strip trailing
    slashes.  Tracking-variant URLs of one page collapse to ONE key,
    so url-keyed doc ids dedup them for free (the
    ``canonicalize_urls`` config knob).  Pure vectorized pandas
    regex kernels; non-URL strings pass through unchanged.  Query
    params are NOT re-sorted (a?b=1&c=2 and a?c=2&b=1 stay distinct
    — reordering would need per-row parsing for a rare variant)."""
    s = urls.fillna("").astype(str)
    parts = s.str.extract(
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)"
        r"(?P<rest>.*)$")
    ok = parts["scheme"].notna()
    scheme = parts["scheme"].str.lower()
    # (www\.)+ not www\.: stripping one layer per call would break
    # idempotence on www.www.* hosts (property-tested)
    host = parts["host"].str.lower().str.replace(r"^(?:www\.)+", "",
                                                 regex=True)
    host = host.mask(scheme.eq("http"),
                     host.str.replace(r":80$", "", regex=True))
    host = host.mask(scheme.eq("https"),
                     host.str.replace(r":443$", "", regex=True))
    rest = parts["rest"].fillna("")
    rest = rest.str.replace(r"#.*$", "", regex=True)
    rest = rest.str.replace(
        r"(?<=[?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*&?", "",
        regex=True)
    rest = rest.str.replace(r"\?&", "?", regex=True)
    rest = rest.str.replace(r"[?&]+$", "", regex=True)
    rest = rest.str.replace(r"/+$", "", regex=True)
    return s.mask(ok, scheme + "://" + host + rest)


def normalize_text(s: pd.Series) -> pd.Series:
    """Canonical text form used for shingling.

    lowercase → NFC → umlaut expansion → punctuation strip (keep
    hyphens and word chars) → whitespace collapse.  Deterministic and
    identical across workers (pure pandas string kernels).
    """
    out = s.fillna("").str.lower().str.normalize("NFC").str.translate(_UMLAUTS)
    out = out.str.replace(r"[^\w\s-]+", " ", regex=True)
    out = out.str.replace(r"\s+", " ", regex=True).str.strip()
    return out


def unescape_html(s: pd.Series) -> pd.Series:
    for ent, ch in _UNESCAPES:
        s = s.str.replace(ent, ch, regex=False)
    return s


def extract_text_from_html(html: pd.Series) -> pd.Series:
    """Extract the main text from an HTML page, byte-identically.

    Contract (BASELINE.md "per-row invariant"): for pages produced by
    the fixture wrapper (``fixtures.wrap_html``) the extracted text is
    byte-identical to the original ``text`` column for every ``url``.

    Strategy: prefer the ``<article>…</article>`` payload (site chrome
    like <nav>/<footer> outside it is dropped); real-world tolerance:
    attribute-bearing and UNCLOSED article tags still extract (payload
    runs to EOF), nested articles stop at the first close.  Fallback:
    a generic strip (remove <script>/<style>/<nav>/<header>/<footer>
    blocks, then all tags).  Tags inside the payload are removed and
    the five standard HTML entities are unescaped — the exact inverse
    of ``html.escape``.
    """
    s = html.fillna("")
    article = s.str.extract(
        r"(?s)<article[^>]*>(.*?)(?:</article>|$)", expand=False
    )
    article = article.str.replace(r"(?s)<[^>]+>", "", regex=True)
    generic = s.str.replace(
        r"(?s)<(?:script|style)[^>]*>.*?</(?:script|style)>", " ", regex=True
    )
    generic = generic.str.replace(
        r"(?s)<(?:nav|header|footer)[^>]*>.*?</(?:nav|header|footer)>",
        " ", regex=True,
    )
    generic = generic.str.replace(r"(?s)<[^>]+>", "", regex=True).str.strip()
    return unescape_html(article.where(article.notna(), generic))


_CHARSET_RE = None  # compiled lazily (bytes regex)


def decode_html_bytes(b) -> str:
    """Charset-aware single-page decode: BOM first, then strict utf-8,
    then the <meta charset=…> declaration from the head, then utf-8
    with replacement.  Never raises on arbitrary bytes."""
    global _CHARSET_RE
    if b is None:
        return ""
    if not isinstance(b, (bytes, bytearray)):
        return str(b)
    b = bytes(b)
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", "replace")
    if b.startswith((b"\xff\xfe", b"\xfe\xff")):
        return b.decode("utf-16", "replace")
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if _CHARSET_RE is None:
        import re

        _CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I)
    m = _CHARSET_RE.search(b[:2048])
    if m:
        try:
            return b.decode(m.group(1).decode("ascii"), "replace")
        except (LookupError, UnicodeDecodeError, UnicodeError):
            pass
    return b.decode("utf-8", "replace")


def decode_binary_html(html_bytes: pd.Series) -> pd.Series:
    """binary column → str.  Fast path: one strict vectorized utf-8
    decode; batches containing any non-utf-8 page fall back to the
    charset-aware per-row decode (BOM / meta charset / replacement) —
    only dirty batches pay the Python cost."""
    if html_bytes.dtype == object and len(html_bytes) and isinstance(
        html_bytes.dropna().iloc[0] if html_bytes.notna().any() else b"", (bytes, bytearray)
    ):
        try:
            return html_bytes.str.decode("utf-8").fillna("")
        except (UnicodeDecodeError, UnicodeError):
            return html_bytes.map(decode_html_bytes)
    return html_bytes.fillna("").astype(str)
