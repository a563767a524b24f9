"""tfidf_top_terms — per-lang top-k by integer-exact rational-idf TF-IDF,
vs a straight-line per-document loop reference (collections.Counter)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines import queries

TOK = re.compile(r"[a-z0-9_]+")


def _loop_reference(df: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    tf = Counter()
    docs_with = defaultdict(set)
    n_docs = Counter()
    for i, r in enumerate(df.itertuples(index=False)):
        n_docs[r.lang] += 1
        for t in TOK.findall(r.text.lower()):
            tf[(r.lang, t)] += 1
            docs_with[(r.lang, t)].add(i)
    rows = [(lang, term, c, len(docs_with[(lang, term)]),
             c * ((1_000_000 * n_docs[lang]) // len(docs_with[(lang, term)])))
            for (lang, term), c in tf.items()]
    s = pd.DataFrame(rows, columns=["lang", "term", "tf", "df", "score_ppm"])
    s = s.sort_values(["lang", "score_ppm", "term"],
                      ascending=[True, False, True], kind="mergesort")
    s = s.groupby("lang", as_index=False, sort=False).head(k)
    for c in ("tf", "df", "score_ppm"):
        s[c] = s[c].astype(np.int64)
    return s.reset_index(drop=True)


def _write_docs(tmp_path, df: pd.DataFrame, name="a") -> str:
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    t = pa.Table.from_pandas(
        df.assign(source="t", n_chars=df["text"].str.len().astype(np.int64)),
        preserve_index=False)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def skewed_docs():
    """Docs with a corpus-wide stopword (idf exactly 1e6 ppm — the floor
    boundary), per-lang exclusive terms (max idf), score ties that the
    term-asc rule must break, and punctuation the tokenizer strips."""
    rng = np.random.default_rng(23)
    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(300):
        lang = ["en", "de", "fr"][i % 3]
        words = ["stop"]  # appears in every doc
        words += list(rng.choice(vocab, size=int(rng.integers(3, 25))))
        words += [f"only_{lang}"] * int(rng.integers(0, 3))
        if i % 7 == 0:
            words += ["Tie-A", "tie_b"]  # same tf/df shape across langs
        rows.append((i, lang, " ".join(words) + "."))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_matches_loop_reference(ray_session, tmp_path, skewed_docs):
    sf = _write_docs(tmp_path, skewed_docs)
    got = queries.tfidf_top_terms(sf)
    exp = _loop_reference(skewed_docs)
    pd.testing.assert_frame_equal(got, exp)


def test_universal_term_floor_idf(ray_session, tmp_path, skewed_docs):
    """A term in every doc has idf exactly 1e6 ppm, so score == tf * 1e6;
    per-lang exclusive terms always outrank it per occurrence."""
    sf = _write_docs(tmp_path, skewed_docs, name="b")
    full = queries.tfidf_top_terms(sf, k=10_000)  # whole vocab
    stop = full[full["term"] == "stop"]
    assert (stop["score_ppm"] == stop["tf"] * 1_000_000).all()
    only = full[full["term"].str.startswith("only_")]
    assert (only["df"] < only["tf"].max() + 300).all() and len(only) == 3
