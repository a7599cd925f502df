"""Text-analysis kernels for training-data pipelines: token counting,
quality scoring, n-gram language ID, rolling-hash fingerprints.

All vectorized over pandas Series (hot-path safe inside map_batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from event_deduplication_ray.functions import hashing as H

# tiny per-language stopword profiles (public common-word lists) for
# the n-gram/stopword heuristic language identifier
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for was with as his on be at by".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von zu den im auf fuer".split()),
    "fr": frozenset("le la les et de des un une est pour dans que qui sur pas".split()),
    "es": frozenset("el la los las y de un una es en que por con no para".split()),
}


def token_counts(text: pd.Series) -> np.ndarray:
    """Whitespace token count per doc (int64); empty/None → 0."""
    return text.fillna("").str.split().str.len().fillna(0).to_numpy(np.int64)


def word_token_counts(text: pd.Series) -> np.ndarray:
    """BPE-ish word-token count: word chars runs + standalone
    punctuation marks each count as one token."""
    return (
        text.fillna("")
        .str.findall(r"\w+|[^\w\s]")
        .str.len()
        .fillna(0)
        .to_numpy(np.int64)
    )


def quality_features(text: pd.Series) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    Columns: n_chars, n_words, mean_word_len, punct_ratio,
    stop_ratio_en, alpha_ratio.
    """
    t = text.fillna("")
    n_chars = t.str.len().to_numpy(np.int64)
    words = t.str.split()
    n_words = words.str.len().fillna(0).to_numpy(np.int64)
    n_nospace = t.str.replace(r"\s", "", regex=True).str.len().to_numpy(np.int64)
    n_alpha = t.str.count(r"[A-Za-zÀ-ÿ]").to_numpy(np.int64)
    n_punct = t.str.count(r"[^\w\s]").to_numpy(np.int64)
    stop_hits = _profile_hit_counts(words, [_LANG_PROFILES["en"]])[0]
    safe_words = np.maximum(n_words, 1)
    safe_chars = np.maximum(n_nospace, 1)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_word_len": n_nospace / safe_words,
            "punct_ratio": n_punct / safe_chars,
            "stop_ratio_en": stop_hits / safe_words,
            "alpha_ratio": n_alpha / safe_chars,
        }
    )


def _profile_hit_counts(
    toks: pd.Series, profiles: list[frozenset[str]]
) -> np.ndarray:
    """(len(profiles), n) matrix of per-row stopword hit counts —
    one explode + one ``isin`` per profile instead of per-row Python
    (the tokens column flattens once and each profile check is a
    vectorized hash lookup).  Token case must be pre-normalized by the
    caller except for the lowercase applied here."""
    n = len(toks)
    toks = toks.copy()
    toks.index = np.arange(n)
    ex = toks.explode()
    valid = ex.notna().to_numpy()
    rows = ex.index.to_numpy()[valid]
    words = pd.Series(ex.to_numpy()[valid], dtype="object").str.lower()
    out = np.zeros((len(profiles), n), dtype=np.int64)
    for i, prof in enumerate(profiles):
        hits = words.isin(prof).to_numpy()
        out[i] = np.bincount(rows[hits], minlength=n)
    return out


def language_id(text: pd.Series) -> pd.Series:
    """Stopword-profile language ID → ISO code or 'und'.

    Scores each language by stopword hit-rate over lowercased tokens;
    deterministic argmax with fixed language order.  Vectorized:
    explode + per-profile ``isin`` (np.argmax's first-max tie-break
    reproduces the sorted-language-order-first semantics the q24
    oracle encodes).
    """
    langs = sorted(_LANG_PROFILES)
    toks = text.fillna("").str.lower().str.split()
    n = len(toks)
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    counts = _profile_hit_counts(toks, [_LANG_PROFILES[l] for l in langs])
    rates = counts / np.maximum(lens, 1)
    best_li = np.argmax(rates, axis=0)
    best_score = rates[best_li, np.arange(n)]
    out = np.array(langs, dtype=object)[best_li]
    out[(best_score < 0.05) | (lens == 0)] = "und"
    return pd.Series(out, index=text.index)


def doc_fingerprints(text: pd.Series, k: int = 8, seed: int = 42) -> np.ndarray:
    """Order-sensitive rolling-hash document fingerprint (int64 ≥ 0).

    Polynomial rolling hash over token hashes — equal texts get equal
    fingerprints; any token change/reorder changes it (vs MinHash
    which is order-insensitive).
    """
    flat, lens = H.tokenize_offsets(text.fillna(""))
    th = H.hash_strings_u64(flat)
    out = np.zeros(len(lens), dtype=np.uint64)
    B = np.uint64(0x100000001B3)
    ends = np.cumsum(lens)
    starts = ends - lens
    maxlen = int(lens.max()) if len(lens) else 0
    with np.errstate(over="ignore"):
        # pw[j] = B^j mod 2^64;  hash(seg) = Σ seg[i] * B^(L-1-i)
        pw = np.ones(max(maxlen, 1), dtype=np.uint64)
        if maxlen > 1:
            pw[1:] = np.cumprod(np.full(maxlen - 1, B, dtype=np.uint64))
        for i in range(len(lens)):
            L = int(lens[i])
            if L:
                seg = th[starts[i]:ends[i]]
                out[i] = (seg * pw[L - 1::-1]).sum(dtype=np.uint64) + np.uint64(seed) * pw[L - 1] * B
    mixed = H._splitmix_array(out, H._GOLDEN, np.uint64(seed))
    return (mixed >> np.uint64(1)).astype(np.int64)


# PII scrub patterns — ASCII-explicit character classes so Python re
# (backtracking, leftmost-first) and RE2 engines (DuckDB/Spark,
# leftmost-longest) produce identical matches: plain greedy
# concatenations with no alternation agree across both semantics
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def scrub_pii(text: pd.Series) -> pd.DataFrame:
    """Redact emails and IPv4 addresses (standard training-data PII
    pass).  Vectorized pandas str ops with compiled patterns; counts
    are measured on the ORIGINAL text, redaction applied in fixed
    pattern order (email first, then ipv4).

    Columns: text_clean (str), n_email (int64), n_ipv4 (int64).
    """
    import re

    s = text.fillna("")
    out = pd.DataFrame(index=text.index)
    clean = s
    for name, pat in PII_PATTERNS.items():
        rx = re.compile(pat)
        out[f"n_{name}"] = s.str.count(rx).to_numpy(np.int64)
        clean = clean.str.replace(rx, f"<{name.upper()}>", regex=True)
    out.insert(0, "text_clean", clean)
    return out
