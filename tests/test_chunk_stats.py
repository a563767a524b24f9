"""doc_chunk_stats — window/stride arithmetic vs an actual chunker loop:
the counted windows must equal the windows a real splitter produces."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.pipelines import queries


def _write_docs(tmp_path, df, name="a"):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(
        df.assign(source="t", n_chars=df["text"].str.len().astype(np.int64)),
        preserve_index=False), str(d / "documents.parquet"))
    return str(d)


def _loop_reference(df, L=64, S=48):
    rows = []
    for lang, g in df.groupby("lang"):
        nd = nt = nc = ne = 0
        for r in g.itertuples(index=False):
            toks = r.text.split(" ")
            n = len(toks)
            # the real splitter: windows at 0, S, 2S, ... until coverage
            chunks = [toks[0:L]]
            pos = S
            while pos + (L - S) < n:      # next window adds new tokens
                chunks.append(toks[pos:pos + L])
                pos += S
            nd += 1
            nt += n
            nc += len(chunks)
            ne += sum(len(c) for c in chunks)
        rows.append((lang, nd, nt, nc, ne, 1_000_000 * (ne - nt) // nt))
    out = pd.DataFrame(rows, columns=["lang", "n_docs", "n_tokens",
                                      "n_chunks", "n_emitted", "overhead_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def test_matches_real_chunker(ray_session, tmp_path):
    """Doc lengths hit every boundary shape: < L, == L, L+1, exact multi-
    window coverage, one-past, and a long tail."""
    rng = np.random.default_rng(7)
    rows = []
    lengths = [1, 5, 63, 64, 65, 112, 113, 160, 161, 200, 500]
    i = 0
    for lang in ("en", "de"):
        for n in lengths:
            rows.append((i, lang, " ".join(f"t{j}" for j in range(n))))
            i += 1
        for _ in range(20):
            n = int(rng.integers(1, 400))
            rows.append((i, lang, " ".join(f"r{j}" for j in range(n))))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    sf = _write_docs(tmp_path, df)
    got = queries.doc_chunk_stats(sf)
    exp = _loop_reference(df)
    got["lang"] = got["lang"].astype(str)
    pd.testing.assert_frame_equal(got, exp)
