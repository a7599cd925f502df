import numpy as np
import pandas as pd

from event_deduplication_ray.functions import textstats as TS


def test_token_counts():
    s = pd.Series(["a b  c", "", None, "single"])
    assert list(TS.token_counts(s)) == [3, 0, 0, 1]


def test_word_token_counts_punct():
    s = pd.Series(["don't stop, now!"])
    # don + ' + t + stop + , + now + !
    assert TS.word_token_counts(s)[0] == 7


def test_quality_features():
    q = TS.quality_features(pd.Series(["Hello, world! abc"]))
    assert q["n_chars"][0] == 17
    assert q["n_words"][0] == 3
    assert 0 < q["punct_ratio"][0] < 0.3
    assert q["mean_word_len"][0] > 3


def test_language_id():
    s = pd.Series([
        "the cat and the dog sat on the mat for a while it was warm",
        "der hund und die katze sind nicht in der wohnung mit dem kind",
        "xyzzy qwerty plugh",
        "",
    ])
    out = list(TS.language_id(s))
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"
    assert out[3] == "und"


def test_fingerprints_order_sensitive():
    s = pd.Series(["a b c", "a b c", "c b a", ""])
    fp = TS.doc_fingerprints(s)
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert (fp >= 0).all()
