"""corpus_build at scale: run the flagship five-stage composite on a
300k-document synthetic corpus (deterministically generated, planted
exact dups / repetition-heavy docs / eval-set contamination) and verify
the per-shard output ROW FOR ROW against DuckDB running the identical
five-stage CTE oracle on the same parquet.

Run: python tools/corpus_build_scale_demo.py  (~2-4 min; owns its Ray
session). Prints one JSON line with walls + planted/dropped stats.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

N_DOCS = 300_000
VOCAB = 50_000
SEED = 20260818


def gen_corpus(out_dir: str) -> dict:
    rng = np.random.default_rng(SEED)
    lens = rng.integers(10, 121, N_DOCS)
    texts: list[str] = []
    stats = dict(planted_dups=0, planted_rep=0, planted_contam=0)
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.01:                     # exact duplicate
            texts.append(texts[int(rng.integers(0, i))])
            stats["planted_dups"] += 1
            continue
        if r < 0.02:                                  # repetition-heavy
            toks = [f"t{int(x)}" for x in rng.integers(0, 3, 3)]
            texts.append(" ".join(toks[int(x)] for x in
                                  rng.integers(0, 3, int(lens[i]))))
            stats["planted_rep"] += 1
            continue
        toks = [f"t{int(x)}" for x in rng.integers(0, VOCAB, int(lens[i]))]
        if r < 0.04 and i > 97:                       # eval contamination:
            # splice a 5-gram from an eval doc (doc_id % 97 == 0)
            src = texts[(int(rng.integers(1, i // 97 + 1)) * 97) % i]
            st = src.split(" ")
            if len(st) >= 5:
                p = int(rng.integers(0, len(st) - 4))
                pos = int(rng.integers(0, max(1, len(toks) - 5)))
                toks[pos:pos + 5] = st[p:p + 5]
                stats["planted_contam"] += 1
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(N_DOCS, dtype=np.int64),
                       "text": texts})
    df.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    return stats


def main():
    import duckdb
    import ray

    out_dir = "/tmp/corpus_build_demo"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    stats = gen_corpus(out_dir)
    gen_sec = time.time() - t0

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False)
    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    t0 = time.time()
    got = QUERIES["corpus_build"](out_dir)
    engine_sec = time.time() - t0

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{out_dir}/documents.parquet')")
    t0 = time.time()
    ora = con.execute(ORACLE_SQL["corpus_build"]).df()
    duck_sec = time.time() - t0

    a = got.reset_index(drop=True)
    b = ora.reset_index(drop=True)
    same_shape = a.shape == b.shape
    mism = 0 if same_shape else -1
    if same_shape:
        for c in a.columns:
            mism += int((a[c].to_numpy(np.int64)
                         != b[c].to_numpy(np.int64)).sum())
    print(json.dumps({
        "metric": "corpus_build_scale_demo", "docs": N_DOCS,
        **stats,
        "gen_sec": round(gen_sec, 2),
        "engine_sec": round(engine_sec, 2),
        "duckdb_single_node_sec": round(duck_sec, 2),
        "shards_out": len(a),
        "docs_out": int(a["n_docs"].sum()),
        "tokens_out": int(a["n_tokens"].sum()),
        "shape_match": bool(same_shape),
        "value_mismatches": int(mism),
        "exact_match_vs_duckdb": bool(same_shape and mism == 0),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
