"""Single pipeline config object (parity-critical knobs pinned).

Mirrors the reference's single-Pydantic-config pattern
(/root/reference/src/event_dedup/matching/config.py:135-146): every
weight / threshold / strategy in one validated object so the recall
gate, tests and bench all run the exact same shingle/signature config
(north rule: "same shingle/signature config").
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

# Thresholds mirror the reference's three-way decision bands
# (/root/reference/src/event_dedup/matching/config.py:37-42:
# match>=0.75, no_match<=0.35, ambiguous between) re-keyed to Jaccard
# over MinHash signatures.


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling / signatures (parity-critical; BASELINE.md) ---
    shingle_k: int = 5            # 5-gram token shingles
    num_perms: int = 128          # MinHash permutations
    lsh_bands: int = 16           # b
    lsh_rows: int = 8             # r; b*r == num_perms
    simhash_bits: int = 64
    hamming_radius: int = 3       # SimHash near-dup distance
    seed: int = 42

    # --- decision thresholds (reference combiner analog, P7) ---
    jaccard_match: float = 0.75       # >= -> "match"
    jaccard_no_match: float = 0.35    # <= -> "no_match"; between -> "ambiguous"
    ambiguous_is_match: bool = False  # MVP: ambiguous pairs are not edges

    # --- per-domain threshold overrides (reference P5 analog,
    # /root/reference/src/event_dedup/matching/config.py:128-132:
    # per-category weight overrides + a priority list resolving which
    # side's category wins).  Re-keyed to language: a pair whose two
    # docs share a lang listed here uses that jaccard_match instead of
    # the global one; when the langs differ, the first lang in
    # lang_priority that carries an override wins; otherwise global.
    # Empty tuple = feature off → the verify shuffle carries no lang
    # column and the flagship path is byte-identical to before. ---
    lang_match_overrides: tuple[tuple[str, float], ...] = ()
    lang_priority: tuple[str, ...] = ()

    # --- blocking-group skew handling (SURVEY.md §4.2 "Skew") ---
    max_block_pairs: int = 64     # all-pairs only for groups <= this size
    # groups larger than max_block_pairs fall back to star+chain pair
    # enumeration (O(n) pairs, connectivity-preserving) and are counted
    # in stage metrics as "salted" groups.
    # hot_pair_mode picks the hot-group policy:
    #   "star_chain" (default): hub star + consecutive-by-id chain —
    #     O(g) pairs, connectivity survives a dissimilar hub.
    #   "salted": the north rule's literal "explicit salting of hot
    #     band-keys" (reference bounds blocks by construction at
    #     matching/candidate_pairs.py:31-76): a deterministic doc-hash
    #     salt splits the hot key into ~cap-sized subgroups, all-pairs
    #     within each subgroup, star+chain over the subgroup minima to
    #     keep the family connected — O(g·cap) pairs, denser local
    #     evidence than one chain at higher pair volume.
    hot_pair_mode: str = "star_chain"

    # --- clustering guards (reference coherence validator analog, C2,
    # /root/reference/src/event_dedup/clustering/coherence.py:16-65:
    # avg internal edge weight < 0.40 or date spread -> needs_review) ---
    max_cluster_size: int = 1000  # clusters above this get needs_review=True
    # mean intra-cluster edge score below this flags needs_review;
    # None skips the (extra-cogroup) confidence pass
    coherence_min_confidence: float | None = None
    # first_ts..last_ts spread beyond this many days flags needs_review
    # (re-keyed from the reference's ">3 distinct dates"); None = off
    coherence_max_ts_spread_days: float | None = None
    max_cc_rounds: int = 12       # hash-to-min iteration cap (log2 diameter)
    cc_driver_edge_limit: int = 5_000_000  # contracted edges below this finish on the driver

    # --- candidate-generation passes enabled ---
    use_minhash: bool = True
    use_simhash: bool = False
    use_substring: bool = False   # substring fingerprint pass
    use_exact_tier: bool = False  # re-score ambiguous pairs with exact shingle Jaccard

    # --- substring (containment) pass ---
    substring_mod_p: int = 4      # keep shingle fps where h % p == 0 (dense enough for ~30-token docs)
    substring_containment: float = 0.8   # shared/min(|A|,|B|) match threshold
    substring_min_fps: int = 3    # both sides need >= this many fps
    substring_drop_group: int = 4096     # fp groups above this = boilerplate, dropped
    substring_small_cap: int = 16        # all-pairs only for fp groups <= this (hub-star above)

    # --- quality gates before keying (reference B3 analog) ---
    # enforced in stages/banding.py: docs with len(text_norm) below
    # this are excluded from EVERY key family → passthrough singletons
    min_text_chars: int = 1
    langs: tuple[str, ...] = ()   # empty = all languages

    # --- data-driven normalizers (reference M4-M6 analogs) ---
    synonyms: tuple[tuple[str, str], ...] = ()  # (variant, canonical), longest-first
    strip_prefixes: tuple[str, ...] = ()        # leading site-chrome labels
    canonicalize_urls: bool = False  # fold tracking-variant urls to one doc
    # (functions/text.canonical_url; extract then keeps the earliest
    # (warc_ts, url) copy per collapsed doc_id — one id shuffle)

    # --- representative selection strategy (reference C3 analog) ---
    representative_strategy: str = "longest_text"  # longest_text|earliest_ts|min_url

    # --- execution knobs ---
    use_arrow_strings: bool = True  # pure-Arrow text kernels (see functions/arrow_text.py)
    sig_batch_size: int = 512     # docs per batch in the signature stage
    sig_concurrency: int | None = None  # actor pool size; None = stateless tasks
    join_num_partitions: int = 32

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"!= num_perms ({self.num_perms})"
            )
        if self.representative_strategy not in (
            "longest_text", "earliest_ts", "min_url"
        ):
            raise ValueError(f"unknown strategy {self.representative_strategy!r}")

    def with_overrides(self, **kwargs: Any) -> "DedupConfig":
        return replace(self, **kwargs)


DEFAULT_CONFIG = DedupConfig()


# --- run-config (de)serialization (reference Q8 analog: the runtime
# config is PERSISTED and patchable with deep merge,
# /root/reference/src/event_dedup/api/routes/config.py:27-146 +
# matching/config.py:165-199 — re-keyed to a JSON artifact in the run
# dir that a later run/export reads back; see state/runstate.py) ---

def config_to_dict(cfg: DedupConfig) -> dict:
    from dataclasses import asdict

    return asdict(cfg)


def _tuple_fields() -> set[str]:
    from dataclasses import fields

    return {
        f.name for f in fields(DedupConfig)
        if isinstance(getattr(DEFAULT_CONFIG, f.name), tuple)
    }


def config_from_dict(d: dict) -> DedupConfig:
    """Inverse of config_to_dict, tolerant of JSON round-trips (lists
    come back as tuples for tuple-typed fields; unknown keys are
    rejected loudly by the dataclass constructor)."""
    from dataclasses import fields

    tf = _tuple_fields()
    kwargs = {}
    for f in fields(DedupConfig):
        if f.name not in d:
            continue
        v = d[f.name]
        if f.name in tf and isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[f.name] = v
    return DedupConfig(**kwargs)


def deep_merge(base: dict, patch: dict) -> dict:
    """Recursive dict merge, patch wins (reference deep_merge,
    matching/config.py:165-199)."""
    out = dict(base)
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out
