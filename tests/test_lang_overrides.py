"""Per-domain threshold overrides (reference P5 analog,
/root/reference/src/event_dedup/matching/config.py:128-132), re-keyed
to language: a pair whose docs share an overridden lang uses that
jaccard_match; differing langs resolve through cfg.lang_priority."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from event_deduplication_ray.config import DedupConfig
from event_deduplication_ray.stages.signatures import signature_stage
from event_deduplication_ray.stages.verify import (
    resolve_match_thresholds,
    verify_pairs,
)


def test_resolve_same_lang_override():
    cfg = DedupConfig(lang_match_overrides=(("de", 0.5),))
    thr = resolve_match_thresholds(
        np.array(["de", "en", "de"], dtype=object),
        np.array(["de", "en", "en"], dtype=object),
        cfg,
    )
    # de/de -> 0.5, en/en -> global, de/en (no priority) -> global
    assert thr.tolist() == [0.5, cfg.jaccard_match, cfg.jaccard_match]


def test_resolve_priority_breaks_cross_lang_ties():
    cfg = DedupConfig(
        lang_match_overrides=(("de", 0.5), ("fr", 0.6)),
        lang_priority=("fr", "de"),
    )
    thr = resolve_match_thresholds(
        np.array(["de", "de", "en"], dtype=object),
        np.array(["fr", "en", "es"], dtype=object),
        cfg,
    )
    # de/fr -> fr wins (priority) -> 0.6; de/en -> only de has an
    # override and en has no priority rank -> 0.5; en/es -> global
    assert thr.tolist() == [0.6, 0.5, cfg.jaccard_match]


def test_resolve_cascades_to_lower_priority_override():
    """An override on the LOWER-priority side must still apply when the
    higher-priority lang carries none (documented cascade: 'the first
    lang in lang_priority that carries an override wins')."""
    cfg = DedupConfig(
        lang_match_overrides=(("de", 0.5),),
        lang_priority=("fr", "de"),
    )
    thr = resolve_match_thresholds(
        np.array(["fr", "de", "fr"], dtype=object),
        np.array(["de", "fr", "en"], dtype=object),
        cfg,
    )
    # fr/de (either order): fr has no override -> cascade to de's 0.5;
    # fr/en: no side carries an override -> global
    assert thr.tolist() == [0.5, 0.5, cfg.jaccard_match]


def _mid_similarity_docs() -> pd.DataFrame:
    """Two doc pairs with shingle Jaccard ~0.59 (between the global
    0.75 match bar and a 0.5 override): 150 shared + 50 distinct
    tokens out of 200."""
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def words(n):
        return ["".join(letters[rng.integers(0, 26, size=7)]) for _ in range(n)]

    rows = []
    for pair_i, lang in enumerate(["de", "en"]):
        common = words(150)
        rows.append({
            "doc_id": np.int64(10 * pair_i + 1),
            "text_norm": " ".join(common + words(50)),
            "lang": lang,
        })
        rows.append({
            "doc_id": np.int64(10 * pair_i + 2),
            "text_norm": " ".join(common + words(50)),
            "lang": lang,
        })
    return pd.DataFrame(rows)


def _decisions(cfg: DedupConfig) -> dict[tuple[int, int], str]:
    docs = rd.from_pandas(_mid_similarity_docs())
    sigs = signature_stage(docs, cfg, passthrough=("lang",))
    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": [1, 11], "id_b": [2, 12]}).astype(np.int64)
    )
    out = verify_pairs(pairs, sigs, cfg).to_pandas()
    return {
        (int(r.id_a), int(r.id_b)): (r.decision, float(r.score))
        for r in out.itertuples()
    }


def test_lang_override_flips_decision_e2e():
    base = DedupConfig(join_num_partitions=4)
    d0 = _decisions(base)
    # sanity: both pairs land in the ambiguous band under the default
    for k in [(1, 2), (11, 12)]:
        dec, score = d0[k]
        assert dec == "ambiguous", d0
        assert base.jaccard_no_match < score < base.jaccard_match

    ov = base.with_overrides(lang_match_overrides=(("de", 0.5),))
    d1 = _decisions(ov)
    assert d1[(1, 2)][0] == "match"        # de pair: override applies
    assert d1[(11, 12)][0] == "ambiguous"  # en pair: global threshold
    # scores are threshold-independent
    assert d1[(1, 2)][1] == pytest.approx(d0[(1, 2)][1])


def test_default_config_verify_unchanged():
    """Feature off -> no lang column rides the verify shuffle and the
    output schema/decisions are identical to the pre-P5 path."""
    base = DedupConfig(join_num_partitions=4)
    docs = rd.from_pandas(_mid_similarity_docs())
    sigs = signature_stage(docs, base, passthrough=("lang",))
    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": [1], "id_b": [2]}).astype(np.int64)
    )
    out = verify_pairs(pairs, sigs, base).to_pandas()
    assert list(out.columns) == ["id_a", "id_b", "score", "decision", "tier"]
