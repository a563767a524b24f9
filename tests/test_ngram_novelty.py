"""ngram_novelty — first-shard novelty over word 5-grams, planted overlap
corpus vs a straight-line loop reference."""

from __future__ import annotations

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
        df.assign(lang="en", source="t",
                  n_chars=df["text"].str.len().astype(np.int64)),
        preserve_index=False), str(d / "documents.parquet"))
    return str(d)


def _loop_reference(df: pd.DataFrame) -> pd.DataFrame:
    seen: dict[str, int] = {}
    per_shard: dict[int, set] = {}
    for r in df.sort_values("doc_id").itertuples(index=False):
        toks = r.text.split(" ")
        shard = r.doc_id % 10
        for i in range(len(toks) - 4):
            g = " ".join(toks[i:i + 5])
            per_shard.setdefault(shard, set()).add(g)
            if g not in seen or shard < seen[g]:
                seen[g] = shard
    rows = []
    for s in sorted(per_shard):
        grams = per_shard[s]
        novel = sum(1 for g in grams if seen[g] == s)
        rows.append((s, len(grams), novel, 1_000_000 * novel // len(grams)))
    out = pd.DataFrame(rows, columns=["shard", "n_distinct", "n_novel",
                                      "novelty_ppm"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def test_matches_loop_reference(ray_session, tmp_path):
    """Shard 0 docs repeated verbatim in later shards → zero novelty
    there; unique tail text → full novelty; mixed docs in between."""
    rng = np.random.default_rng(41)
    vocab = [f"w{j}" for j in range(30)]
    base = [" ".join(rng.choice(vocab, size=12)) for _ in range(10)]
    rows = []
    for i in range(120):
        shard_intent = i % 10
        if shard_intent <= 2:
            text = base[(i // 10) % len(base)]          # repeats across shards
        elif shard_intent <= 5:
            text = base[(i // 10) % len(base)] + f" uniq{i} " + " ".join(
                rng.choice(vocab, size=6))               # half repeat, half new
        else:
            text = " ".join(f"only{i}_{j}" for j in range(9))  # all new
        rows.append((i, text))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf = _write_docs(tmp_path, df)
    got = queries.ngram_novelty(sf)
    exp = _loop_reference(df)
    pd.testing.assert_frame_equal(got, exp)
    g = got.set_index("shard")
    assert g["novelty_ppm"].iloc[0] == 1_000_000      # shard 0 is all-novel
    assert (g["novelty_ppm"].iloc[6:] == 1_000_000).all()  # unique tails
    assert (g["novelty_ppm"].iloc[1:3] < 1_000_000).all()  # repeats seen
