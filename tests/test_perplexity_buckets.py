"""perplexity_buckets — CCNet head/middle/tail NTILE(3) from the per-lang
score histogram, vs a straight-line loop reference that materializes every
per-doc rank (the thing the engine deliberately avoids)."""

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
            recs.append((r.doc_id, r.lang, sum(ps) // len(ps)))
    s = pd.DataFrame(recs, columns=["doc_id", "lang", "score"])
    rows = []
    for lang, g in s.groupby("lang"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        n = len(g)
        q, rem = divmod(n, 3)
        off = 0
        for bkt in (1, 2, 3):
            size = q + (1 if bkt <= rem else 0)
            if size == 0:
                continue
            sl = g.iloc[off:off + size]["score"]
            rows.append((lang, bkt, size, int(sl.sum()),
                         int(sl.min()), int(sl.max())))
            off += size
    out = pd.DataFrame(rows, columns=["lang", "bucket", "n_docs",
                                      "sum_score_ppm", "min_score_ppm",
                                      "max_score_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


def _write_docs(tmp_path, df: pd.DataFrame, name="a") -> str:
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    t = pa.Table.from_pandas(
        df.assign(source="t", n_chars=df["text"].str.len().astype(np.int64)),
        preserve_index=False)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def tie_corpus():
    """Scores collide heavily (many docs share the exact same text ⇒ same
    integer score), including runs that STRADDLE a bucket boundary — the
    case where per-doc ranks differ but every score aggregate must not.
    Lang 'xx' has 2 docs (NTILE emits buckets 1,2 only); 'yy' has 1."""
    rows = [(97, "en", "a b c a b")]  # train slice
    for i in range(90):               # 30 identical docs per of 3 shapes
        rows.append((i * 2 + 1, "en", ["a b", "a b c", "z z z"][i % 3]))
    for i in range(40):               # de: one hot score + graded others
        rows.append((1000 + i, "de", "a b" if i < 25 else f"q{i} w{i}"))
    rows += [(5000, "xx", "a b c"), (5001, "xx", "c b a"), (6000, "yy", "a b")]
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_matches_loop_reference(ray_session, tmp_path, tie_corpus):
    sf = _write_docs(tmp_path, tie_corpus)
    got = queries.perplexity_buckets(sf)
    exp = _loop_reference(tie_corpus)
    got["lang"] = got["lang"].astype(str)
    pd.testing.assert_frame_equal(got, exp)


def test_bucket_monotonicity(ray_session, tmp_path, tie_corpus):
    """Head scores dominate tail scores within every lang."""
    sf = _write_docs(tmp_path, tie_corpus, name="b")
    out = queries.perplexity_buckets(sf)
    for _, g in out.groupby("lang"):
        g = g.sort_values("bucket")
        mins = g["min_score_ppm"].to_numpy()
        maxs = g["max_score_ppm"].to_numpy()
        assert (mins[:-1] >= maxs[1:]).all()
