"""lm_fluency_score — add-one-smoothed bigram LM trained on the held-out
slice (doc_id % 97 == 0), integer rational scores, vs a straight-line
dict-and-loop reference trainer+scorer."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines import queries


def _loop_reference(df: pd.DataFrame) -> pd.DataFrame:
    tr = df[df["doc_id"] % 97 == 0]
    vocab: set[str] = set()
    c12: dict[tuple[str, str], int] = {}
    for r in tr.itertuples(index=False):
        toks = r.text.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c12.items():
        c1[a] = c1.get(a, 0) + c
    v = len(vocab)
    recs = []
    for r in df[df["doc_id"] % 97 != 0].itertuples(index=False):
        toks = r.text.split(" ")
        ps = [(1_000_000 * (c12.get((a, b), 0) + 1)) // (c1.get(a, 0) + v)
              for a, b in zip(toks, toks[1:])]
        if ps:
            recs.append((r.lang, sum(ps) // len(ps)))
    out = (pd.DataFrame(recs, columns=["lang", "score"])
           .groupby("lang", as_index=False)
           .agg(n_docs=("score", "size"), sum_score_ppm=("score", "sum"),
                min_score_ppm=("score", "min"), max_score_ppm=("score", "max")))
    out["lang"] = out["lang"].astype("string")
    for c in ["n_docs", "sum_score_ppm", "min_score_ppm", "max_score_ppm"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def _write_docs(tmp_path, df: pd.DataFrame, name="a") -> str:
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    t = pa.Table.from_pandas(
        df.assign(source="t", n_chars=df["text"].str.len().astype(np.int64)),
        preserve_index=False)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def corpus():
    """Fluent docs drawn from the train distribution, disfluent shuffles,
    unseen-vocab docs, plus the degenerate shapes: empty text (one empty
    token, no bigram), single token, consecutive spaces (empty tokens are
    REAL vocab under split-on-single-space), and train-slice doc_ids
    (multiples of 97) that must be scored by the model, never by it."""
    rng = np.random.default_rng(7)
    base = "the quick brown fox jumps over the lazy dog".split(" ")
    rows = []
    for i in range(400):
        doc_id = i * 13  # hits %97==0 at i=0, 97*k/13... include explicit ones
        if i % 17 == 0:
            doc_id = 97 * (i + 1)  # force train-slice membership
        if i % 11 == 0:
            text = ""                       # no bigrams
        elif i % 11 == 1:
            text = "solitary"               # single token, no bigrams
        elif i % 11 == 2:
            text = "the  quick   fox"       # empty tokens between spaces
        elif i % 11 == 3:
            text = " ".join(rng.permutation(base).tolist())  # disfluent
        elif i % 11 == 4:
            text = "zyx wvu tsr qpo"        # fully unseen vocab
        else:
            k = int(rng.integers(2, 9))
            text = " ".join(base[:k])       # fluent prefix
        rows.append((doc_id, ["en", "de", "fr"][i % 3], text))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_matches_loop_reference(ray_session, tmp_path, corpus):
    sf = _write_docs(tmp_path, corpus)
    got = queries.lm_fluency_score(sf)
    exp = _loop_reference(corpus)
    got["lang"] = got["lang"].astype("string")
    pd.testing.assert_frame_equal(got, exp)


def test_layout_invariance(ray_session, tmp_path, corpus):
    shuffled = corpus.sample(frac=1.0, random_state=3).reset_index(drop=True)
    sf = _write_docs(tmp_path, shuffled, name="b")
    got = queries.lm_fluency_score(sf)
    exp = _loop_reference(corpus)
    got["lang"] = got["lang"].astype("string")
    pd.testing.assert_frame_equal(got, exp)


def test_no_train_slice_returns_empty(ray_session, tmp_path):
    """No doc_id divisible by 97 -> no model -> typed empty frame."""
    df = pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["en"] * 3,
                       "text": ["a b c", "d e", "f"]})
    sf = _write_docs(tmp_path, df, name="c")
    got = queries.lm_fluency_score(sf)
    assert len(got) == 0
    assert list(got.columns) == ["lang", "n_docs", "sum_score_ppm",
                                 "min_score_ppm", "max_score_ppm"]


def test_fluent_scores_above_disfluent(ray_session, tmp_path):
    """Sanity on the signal itself: in-distribution bigrams outscore
    unseen-vocab docs (the CCNet use case)."""
    train = [(97 * (i + 1), "en", "the quick brown fox jumps over the lazy dog")
             for i in range(8)]
    score = [(1, "en", "the quick brown fox"), (2, "de", "zz yy xx ww")]
    df = pd.DataFrame(train + score, columns=["doc_id", "lang", "text"])
    sf = _write_docs(tmp_path, df, name="d")
    got = queries.lm_fluency_score(sf).set_index("lang")
    assert got.loc["en", "max_score_ppm"] > got.loc["de", "max_score_ppm"]
