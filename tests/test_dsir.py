"""dsir_select — DSIR-style importance-ratio selection (target vs raw
bigram models, integer ratio scores) vs a dict-and-loop reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines import queries


def _loop_reference(df: pd.DataFrame, target="src0") -> pd.DataFrame:
    ct: dict[tuple[str, str], int] = {}
    cr: dict[tuple[str, str], int] = {}
    for r in df.itertuples(index=False):
        toks = r.text.split(" ")
        if r.source == target:
            for g in zip(toks, toks[1:]):
                ct[g] = ct.get(g, 0) + 1
        elif r.doc_id % 13 == 0:
            for g in zip(toks, toks[1:]):
                cr[g] = cr.get(g, 0) + 1
    recs = []
    for r in df[df["source"] != target].itertuples(index=False):
        toks = r.text.split(" ")
        rs = [(1_000_000 * (ct.get(g, 0) + 1)) // (cr.get(g, 0) + 1)
              for g in zip(toks, toks[1:])]
        if rs:
            w = sum(rs) // len(rs)
            recs.append((r.lang, w, 1 if w > 1_000_000 else 0))
    out = (pd.DataFrame(recs, columns=["lang", "w", "sel"])
           .groupby("lang", as_index=False)
           .agg(n_docs=("w", "size"), n_selected=("sel", "sum"),
                sum_w_ppm=("w", "sum"), max_w_ppm=("w", "max")))
    out["lang"] = out["lang"].astype("string")
    for c in ["n_docs", "n_selected", "sum_w_ppm", "max_w_ppm"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def _write_docs(tmp_path, df: pd.DataFrame, name="a") -> str:
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    t = pa.Table.from_pandas(
        df.assign(n_chars=df["text"].str.len().astype(np.int64)),
        preserve_index=False)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def corpus():
    """Target-source docs from one phrase family, raw docs split between
    target-like (should be selected) and raw-typical/unseen (should not),
    plus empties, single tokens, consecutive spaces, and raw-model-slice
    membership (doc_id % 13 == 0) crossing both raw flavors."""
    rng = np.random.default_rng(23)
    t_base = "curated clean reference prose reads well".split(" ")
    r_base = "noisy scraped boilerplate footer menu junk".split(" ")
    rows = []
    for i in range(360):
        doc_id = i * 3 + 1 if i % 5 else i * 13  # ~1/5 land in the raw slice
        src = "src0" if i % 9 == 0 else f"src{1 + i % 4}"
        if i % 12 == 0:
            text = ""
        elif i % 12 == 1:
            text = "lone"
        elif i % 12 == 2:
            text = "curated  clean   prose"
        elif src == "src0" or i % 3 == 0:
            k = int(rng.integers(2, 7))
            text = " ".join(t_base[:k])          # target-like
        else:
            k = int(rng.integers(2, 7))
            text = " ".join(r_base[:k])          # raw-typical
        rows.append((doc_id, ["en", "de", "fr"][i % 3], src, text))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"])


def test_matches_loop_reference(ray_session, tmp_path, corpus):
    sf = _write_docs(tmp_path, corpus)
    got = queries.dsir_select(sf)
    exp = _loop_reference(corpus)
    got["lang"] = got["lang"].astype("string")
    pd.testing.assert_frame_equal(got, exp)


def test_layout_invariance(ray_session, tmp_path, corpus):
    shuffled = corpus.sample(frac=1.0, random_state=9).reset_index(drop=True)
    sf = _write_docs(tmp_path, shuffled, name="b")
    got = queries.dsir_select(sf)
    exp = _loop_reference(corpus)
    got["lang"] = got["lang"].astype("string")
    pd.testing.assert_frame_equal(got, exp)


def test_selects_target_like_not_raw_typical(ray_session, tmp_path):
    """The DSIR signal itself: a raw doc made of target bigrams clears the
    1e6 bar; a doc made of raw-slice bigrams does not."""
    rows = [(13 * i, "en", "src0", "alpha beta gamma delta") for i in range(1, 5)]
    rows += [(13 * i, "en", "src1", "junk spam junk spam") for i in range(5, 9)]
    rows += [(7, "en", "src2", "alpha beta gamma"),       # target-like
             (8, "de", "src2", "junk spam junk")]         # raw-typical
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"])
    sf = _write_docs(tmp_path, df, name="c")
    got = queries.dsir_select(sf).set_index("lang")
    assert got.loc["en", "n_selected"] >= 1
    assert got.loc["de", "n_selected"] == 0
    exp = _loop_reference(df)
    pd.testing.assert_frame_equal(
        got.reset_index().assign(lang=lambda d: d["lang"].astype("string")), exp)


def test_no_target_docs_still_defined(ray_session, tmp_path):
    """No src0 rows: ct is empty, every raw bigram scores 1e6//(cr+1) —
    engine must equal the loop, with zero selected."""
    df = pd.DataFrame({"doc_id": [13, 26, 3], "lang": ["en"] * 3,
                       "source": ["src1", "src1", "src2"],
                       "text": ["a b c", "a b", "a b c d"]})
    sf = _write_docs(tmp_path, df, name="d")
    got = queries.dsir_select(sf)
    got["lang"] = got["lang"].astype("string")
    exp = _loop_reference(df)
    pd.testing.assert_frame_equal(got, exp)
    assert int(got["n_selected"].sum()) == 0
