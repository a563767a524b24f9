"""temperature_mix_sample — UNIMAX alpha=0.5 rates, murmur Bernoulli keep,
vs a straight-line loop reference."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines import queries


def _write_docs(tmp_path, df, name="a"):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(
        df.assign(text="t", source="t",
                  n_chars=np.int64(1)), preserve_index=False),
        str(d / "documents.parquet"))
    return str(d)


def _mur(x: int) -> int:
    M = (1 << 64) - 1
    x &= M
    x ^= x >> 32
    x = (x * 0xD6E8FEB86659FD93) & M
    x ^= x >> 32
    x = (x * 0xD6E8FEB86659FD93) & M
    x ^= x >> 32
    return x


def test_matches_loop_reference(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    langs = ["en"] * 900 + ["de"] * 100 + ["yo"] * 9
    df = pd.DataFrame({"doc_id": np.arange(len(langs), dtype=np.int64),
                       "lang": langs})
    sf = _write_docs(tmp_path, df)
    got = queries.temperature_mix_sample(sf)

    n = df.groupby("lang").size().to_dict()
    mn = min(n.values())
    rows = []
    for lang in sorted(n):
        rate = (1_000_000 * math.isqrt(mn)) // math.isqrt(n[lang])
        kept = sum(1 for r in df.itertuples(index=False)
                   if r.lang == lang and _mur(r.doc_id) % 1_000_000 < rate)
        rows.append((lang, n[lang], rate, kept))
    exp = pd.DataFrame(rows, columns=["lang", "n_docs", "rate_ppm", "n_kept"])
    for c in exp.columns[1:]:
        exp[c] = exp[c].astype(np.int64)
    got["lang"] = got["lang"].astype(str)
    pd.testing.assert_frame_equal(got, exp)
    g = got.set_index("lang")
    # smallest lang keeps everything; rates decrease with size
    assert g.loc["yo", "rate_ppm"] == 1_000_000
    assert g.loc["yo", "n_kept"] == g.loc["yo", "n_docs"]
    assert g.loc["en", "rate_ppm"] < g.loc["de", "rate_ppm"] < 1_000_000
