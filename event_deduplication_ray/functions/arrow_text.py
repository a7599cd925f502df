"""Pure-Arrow text kernels: extraction, normalization, tokenization
and token hashing with ZERO Python string objects.

Motivation (measured): this sandbox serializes fresh-page allocation
globally, so pandas string pipelines (millions of transient Python
str objects) stop scaling past ~8 cores.  These kernels keep every
intermediate in Arrow C++ buffers; the only numpy work is fixed-width
arithmetic over the raw byte buffer of the tokenized ListArray.

Equivalence: ``extract_text_arrow`` is byte-identical to
functions.text.extract_text_from_html (tested); ``normalize_arrow``
matches functions.text.normalize_text except that character classes
use RE2 unicode classes (``\\p{L}\\p{N}`` vs Python ``\\w``) — the
pipeline uses ONE of the two consistently (config.use_arrow_strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from event_deduplication_ray.functions.hashing import U64, _GOLDEN, _splitmix_array

_UNESCAPES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#x27;", "'"), ("&amp;", "&"),
]
# composed | decomposed alternatives (pyarrow's utf8_normalize always
# decomposes regardless of the requested form in v16, so composition
# is handled here instead of with a normalize kernel)
_UMLAUTS = [
    ("(?:ä|ä)", "ae"), ("(?:ö|ö)", "oe"),
    ("(?:ü|ü)", "ue"), ("ß", "ss"),
]


def _chunked_to_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def extract_text_arrow(html: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """HTML → text, byte-identical to the pandas reference path
    (functions.text.extract_text_from_html — keep the regex pairs in
    sync; tolerance contract documented there: attribute-bearing and
    unclosed <article> tags extract, generic path drops site chrome)."""
    s = pc.fill_null(_chunked_to_array(html), "")
    has_article = pc.match_substring_regex(s, r"(?s)<article[^>]*>")
    # article payload: drop everything up to the first <article…> and
    # from the first closing </article> on (none → payload runs to EOF)
    art = pc.replace_substring_regex(s, pattern=r"(?s)^.*?<article[^>]*>", replacement="", max_replacements=1)
    art = pc.replace_substring_regex(art, pattern=r"(?s)</article>.*$", replacement="", max_replacements=1)
    art = pc.replace_substring_regex(art, pattern=r"(?s)<[^>]+>", replacement="")
    gen = pc.replace_substring_regex(
        s, pattern=r"(?s)<(?:script|style)[^>]*>.*?</(?:script|style)>",
        replacement=" ",
    )
    gen = pc.replace_substring_regex(
        gen, pattern=r"(?s)<(?:nav|header|footer)[^>]*>.*?</(?:nav|header|footer)>",
        replacement=" ",
    )
    gen = pc.replace_substring_regex(gen, pattern=r"(?s)<[^>]+>", replacement="")
    gen = pc.utf8_trim_whitespace(gen)
    out = pc.if_else(has_article, art, gen)
    for ent, ch in _UNESCAPES:
        out = pc.replace_substring(out, pattern=ent, replacement=ch)
    return out


def normalize_arrow(text: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """lowercase → NFC → umlaut expansion → punctuation strip (keep
    letters/digits/underscore/hyphen/whitespace) → whitespace collapse."""
    s = pc.fill_null(_chunked_to_array(text), "")
    s = pc.utf8_lower(s)
    for a, b in _UMLAUTS:
        # NB: plain replace_substring mismatches multi-byte UTF-8
        # patterns in pyarrow 16 — the RE2 variant handles them
        s = pc.replace_substring_regex(s, pattern=a, replacement=b)
    s = pc.replace_substring_regex(s, pattern=r"[^\p{L}\p{N}\s_-]+", replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(s)


_FNV_OFFSET = U64(0xCBF29CE484222325)
_FNV_PRIME = U64(0x100000001B3)
_MAX_TOKEN_BYTES = 48


def hash_tokens_arrow(
    text_norm: "pa.Array | pa.ChunkedArray",
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize (single-space-normalized) text and hash every token.

    Returns (flat_token_hashes uint64, tokens_per_doc int64) — the
    same contract as hashing.tokenize_offsets + hash_strings_u64 but
    with no Python string objects: FNV-1a runs directly over the
    ListArray's byte buffer (byte j of every still-live token per
    iteration), then a splitmix finalize folds the token length in.
    Tokens longer than 48 bytes are hashed by prefix + length.
    """
    s = pc.fill_null(_chunked_to_array(text_norm), "")
    toks = pc.split_pattern(s, pattern=" ")
    flat = toks.flatten()          # may drop empty-doc slots entirely
    n_docs = len(toks)

    # per-doc token counts from list offsets
    list_offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    raw_counts = np.diff(list_offsets)

    if len(flat) == 0:
        return np.empty(0, dtype=U64), np.zeros(n_docs, dtype=np.int64)

    str_offsets = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset : flat.offset + len(flat) + 1
    ].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    starts = str_offsets[:-1]
    lens = (str_offsets[1:] - starts).astype(np.int64)

    # drop zero-length tokens (split of "" yields one empty token)
    doc_idx = np.repeat(np.arange(len(raw_counts)), raw_counts)
    keep = lens > 0
    starts_k = starts[keep]
    lens_k = lens[keep]
    doc_lens = np.bincount(doc_idx[keep], minlength=n_docs).astype(np.int64)

    acc = np.full(len(starts_k), _FNV_OFFSET, dtype=U64)
    live = lens_k > 0
    maxlen = int(min(lens_k.max(), _MAX_TOKEN_BYTES)) if len(lens_k) else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            if j > 0:
                live = lens_k > j
                if not live.any():
                    break
            b = data[starts_k[live] + j].astype(U64)
            acc[live] = (acc[live] ^ b) * _FNV_PRIME
        acc = acc ^ (lens_k.astype(U64) * _GOLDEN)
    hashes = _splitmix_array(acc, _FNV_PRIME, U64(0))
    return hashes, doc_lens
