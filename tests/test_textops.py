"""Text-analysis kernels: tokens, quality, language ID, fingerprints."""

import numpy as np
import pandas as pd

from crawler_ray.functions import textops


def test_token_count_matches_regex_semantics():
    s = pd.Series(["one two three", "", "a_b c-d", "中文 text here", None])
    got = textops.token_count(s.astype("string"))
    assert got.tolist() == [3, 0, 3, 2, 0]  # a_b is ONE \w+ token; c-d is two


def test_punct_ratio():
    s = pd.Series(["a,b.c!", "abc"])
    r = textops.punct_ratio(s)
    assert r[0] == 3 / 6 and r[1] == 0.0


def test_quality_score_ordering():
    good = "This is a well formed sentence with many reasonable words. " * 5
    bad = "1234!!! 5678??? 9999;;; 0000,,,"
    df = pd.DataFrame({"doc_id": [1, 2], "text": [good, bad]})
    q = textops.quality_score(df)
    assert q.loc[0, "score"] > q.loc[1, "score"]
    assert q.loc[1, "digit_ratio"] > 0.3


def test_lang_id_heuristic():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "the cat sat on the mat and it was a good day for the family",
            "el perro y la casa de los árboles en la ciudad con un amigo",
            "der Hund und die Katze sind in den Garten mit einem Ball",
            "le chien et le chat sont dans la maison avec une balle et les enfants",
            "这是一个中文句子 关于天气和生活的故事",
        ],
    })
    out = textops.lang_id(df)
    assert out["lang_pred"].tolist() == ["en", "es", "de", "fr", "zh"]


def test_fingerprint_shared_window_collides():
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    df = pd.DataFrame({"doc_id": np.array([1, 2, 3], np.int64),
                       "text": [base, base + " tail", "totally different words entirely"]})
    fp = textops.fingerprint(df)
    # identical prefix windows → identical min-fingerprint
    assert fp.loc[0, "fingerprint"] == fp.loc[1, "fingerprint"]
    assert fp.loc[0, "fingerprint"] != fp.loc[2, "fingerprint"]
