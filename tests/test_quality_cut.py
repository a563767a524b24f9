"""quality_percentile_cut — exact global top-p% selection by histogram
refinement, vs a straight-line loop reference (sort the whole frame)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines import queries


def _loop_reference(df: pd.DataFrame, top_ppm: int) -> pd.DataFrame:
    """Independent per-row loop: score each doc, full sort, take k, rollup."""
    rows = []
    for r in df.itertuples(index=False):
        n = len(r.text)
        nd = sum(c.isdigit() and c.isascii() for c in r.text)
        npu = sum(c in ".,!?;:" for c in r.text)
        if n == 0:
            score = 0
        else:
            len_ppm = min(n * 5000, 1_000_000)
            dig = (1_000_000 * nd) // n
            pun = (1_000_000 * npu) // n
            score = (len_ppm * (1_000_000 - dig) // 1_000_000
                     * max(1_000_000 - 2 * pun, 0) // 1_000_000)
        rows.append((r.doc_id, r.lang, n, score))
    s = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars", "score"])
    s = s.sort_values(["score", "doc_id"], ascending=[False, True])
    k = (len(s) * top_ppm + 999_999) // 1_000_000
    kept = s.iloc[:k]
    out = kept.groupby("lang", as_index=False).agg(
        n_kept=("doc_id", "size"), sum_chars=("n_chars", "sum"))
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
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
def tie_heavy_docs():
    """A corpus where >70 % of docs share the capped max score — the hot
    tie bucket the doc_id refinement exists for — plus digit/punct soup."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(600):
        if i % 10 < 7:            # long clean doc -> score exactly 1e6
            text = " ".join(["alpha beta gamma delta"] * 15)
        elif i % 10 < 8:          # short doc -> length-graded score
            text = "tiny words " * int(rng.integers(1, 12))
        elif i % 10 < 9:          # digit soup
            text = ("7 42 901 " * 40)[:300]
        else:                      # punct soup
            text = ("so, many. marks! ok? " * 20)[:280]
        rows.append((i * 7 + 3, ["en", "de", "fr"][i % 3], text))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_matches_loop_reference(ray_session, tmp_path, tie_heavy_docs):
    sf = _write_docs(tmp_path, tie_heavy_docs)
    got = queries.quality_percentile_cut(sf)
    exp = _loop_reference(tie_heavy_docs, queries.QUALITY_TOP_PPM)
    pd.testing.assert_frame_equal(got, exp)


def test_refinement_path_forced(ray_session, tmp_path, tie_heavy_docs,
                                monkeypatch):
    """Tiny collect limit + narrow fan-out force MULTIPLE range-histogram
    passes through the tie bucket; result must not change."""
    monkeypatch.setattr(queries, "_SEL_COLLECT_LIMIT", 4)
    monkeypatch.setattr(queries, "_SEL_BUCKETS", 8)
    sf = _write_docs(tmp_path, tie_heavy_docs)
    got = queries.quality_percentile_cut(sf)
    exp = _loop_reference(tie_heavy_docs, queries.QUALITY_TOP_PPM)
    pd.testing.assert_frame_equal(got, exp)


def test_layout_invariance_and_top_ppm(ray_session, tmp_path, tie_heavy_docs):
    """Same corpus in a different row order, and a non-default cut depth."""
    shuffled = tie_heavy_docs.sample(frac=1.0, random_state=5).reset_index(drop=True)
    sf = _write_docs(tmp_path, shuffled, name="b")
    got = queries.quality_percentile_cut(sf, top_ppm=250_000)
    exp = _loop_reference(tie_heavy_docs, 250_000)
    pd.testing.assert_frame_equal(got, exp)


def test_whole_tie_bucket_boundary(ray_session, tmp_path):
    """k lands exactly on the tie-bucket edge (r == tie_n): no doc_id
    refinement needed, keep = score >= t."""
    # 2 docs at the max score, 18 below; top 10% of 20 -> k=2 == tie size
    rows = [(i, "en", " ".join(["clean text goes on"] * 12)) for i in range(2)]
    rows += [(i + 2, "en", "short " * 3) for i in range(18)]
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    sf = _write_docs(tmp_path, df, name="c")
    got = queries.quality_percentile_cut(sf)
    exp = _loop_reference(df, queries.QUALITY_TOP_PPM)
    pd.testing.assert_frame_equal(got, exp)
