"""corpus_build stage 2b (MinHash near-dup removal, GRAFT_CORPUS_MINHASH):
engine vs a straight-line loop reference on a planted tiny corpus.

The reference mirrors tools/make_goldens.corpus_build_neardup_golden:
per-doc gate loop, dict exact dedup, shared-band-kernel LSH candidates
with loop verify + union-find (root-min), contamination loop, packing
loop. The golden at sf0.01 is checked by the driver; this unit pins the
drop semantics on a corpus where every planted case is known."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from crawler_ray.functions.dedup_ops import (
    collide_pairs,
    jaccard,
    minhash_bands,
    shingle_hashes,
)


def _loop_reference(df: pd.DataFrame, near_dedup: bool) -> pd.DataFrame:
    surv = []
    for d, t in zip(df["doc_id"], df["text"]):
        d, t = int(d), str(t)
        if d % 97 == 0:
            continue
        ws = t.split(" ")
        if len(ws) < 20:
            continue
        c = Counter(ws)
        if 1.0 - len(c) / len(ws) > 0.75 or max(c.values()) / len(ws) > 0.2:
            continue
        surv.append((d, t))
    first: dict = {}
    for d, t in surv:
        first.setdefault(t, d)
    kept = [(d, t) for d, t in surv if first[t] == d]
    if near_dedup and kept:
        kdf = pd.DataFrame({"doc_id": np.array([d for d, _ in kept], np.int64),
                            "text": [t for _, t in kept]})
        cand = collide_pairs(minhash_bands(kdf))
        sh = {d: shingle_hashes(t) for d, t in kept}
        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            return r

        for a, b in sorted(set(zip(cand["doc_a"].astype(int),
                                   cand["doc_b"].astype(int)))):
            if jaccard(sh[a], sh[b]) >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        kept = [(d, t) for d, t in kept if find(d) == d]
    grams: set = set()
    for d, t in zip(df["doc_id"], df["text"]):
        if int(d) % 97 == 0:
            ws = str(t).split(" ")
            for i in range(len(ws) - 4):
                grams.add(" ".join(ws[i:i + 5]))
    clean = []
    for d, t in kept:
        ws = t.split(" ")
        if any(" ".join(ws[i:i + 5]) in grams for i in range(len(ws) - 4)):
            continue
        clean.append((d, len(ws)))
    rows: dict = {}
    tok_before = 0
    for d, n in clean:
        r = rows.setdefault(tok_before // 4096, [0, 0, d, d])
        r[0] += 1
        r[1] += n
        r[3] = d
        tok_before += n
    sids = sorted(rows)
    return pd.DataFrame(
        {"shard_id": np.array(sids, np.int64),
         "n_docs": np.array([rows[s][0] for s in sids], np.int64),
         "n_tokens": np.array([rows[s][1] for s in sids], np.int64),
         "first_doc": np.array([rows[s][2] for s in sids], np.int64),
         "last_doc": np.array([rows[s][3] for s in sids], np.int64)})


def _planted_corpus() -> pd.DataFrame:
    rng = np.random.default_rng(55)

    def rand_doc(n: int) -> str:
        return " ".join(f"w{int(x)}" for x in rng.integers(0, 50_000, n))

    base = rand_doc(30)
    near = base.split(" ")
    near[3], near[17] = "CHANGED1", "CHANGED2"      # ~0.8 shingle Jaccard
    chain = list(near)
    chain[25] = "CHANGED3"                          # near-dup of the near-dup
    eval_doc = rand_doc(25)                         # doc 0: eval holdout
    contam = rand_doc(24).split(" ")
    contam[10:15] = eval_doc.split(" ")[5:10]       # spliced eval 5-gram
    docs = {
        0: eval_doc,
        5: base,
        12: " ".join(near),
        20: base,                                    # exact dup → stage 2
        30: " ".join(chain),
        41: rand_doc(28),
        52: " ".join(contam),
        63: rand_doc(22),
        74: " ".join(["rep"] * 30),                  # repetition gate
        85: rand_doc(10),                            # token-length gate
    }
    return pd.DataFrame({"doc_id": np.array(sorted(docs), np.int64),
                         "text": [docs[d] for d in sorted(docs)]})


def test_corpus_build_neardup_planted(ray_session, tmp_path):
    from crawler_ray.pipelines.queries import QUERIES, corpus_build

    df = _planted_corpus()
    df.to_parquet(tmp_path / "documents.parquet")

    got = QUERIES["corpus_build_neardup"](str(tmp_path))
    exp = _loop_reference(df, near_dedup=True)
    pd.testing.assert_frame_equal(got, exp)
    # the whole near-dup chain {5, 12, 20, 30} collapses to representative 5:
    # 20 exactly (stage 2), 12 and 30 by MinHash (stage 2b); contaminated 52
    # gone (stage 3); 74/85 gated (stage 1); 0 held out → {5, 41, 63} remain
    assert int(got["n_docs"].sum()) == 3
    assert int(got["first_doc"].iloc[0]) == 5

    base_out = corpus_build(str(tmp_path), near_dedup=False)
    base_exp = _loop_reference(df, near_dedup=False)
    pd.testing.assert_frame_equal(base_out, base_exp)
    # flag off keeps the two near-dups (but not the exact dup)
    assert int(base_out["n_docs"].sum()) == int(got["n_docs"].sum()) + 2
