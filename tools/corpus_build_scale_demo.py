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
    stats = dict(planted_dups=0, planted_near=0, planted_rep=0,
                 planted_contam=0)
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.01:                     # exact duplicate
            texts.append(texts[int(rng.integers(0, i))])
            stats["planted_dups"] += 1
            continue
        if i > 100 and 0.04 <= r < 0.05:             # NEAR duplicate: copy
            # an earlier doc and mutate 2 token positions (char-shingle
            # Jaccard stays well above the 0.5 near-dup bar for ≥20-token
            # sources; short/rep sources just waste the plant at the gates)
            st = texts[int(rng.integers(0, i))].split(" ")
            for p in rng.integers(0, len(st), 2):
                st[int(p)] = f"n{int(rng.integers(0, VOCAB))}"
            texts.append(" ".join(st))
            stats["planted_near"] += 1
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


# Stages 1-2 of the oracle CTE chain (identical to ORACLE_SQL["corpus_build"];
# self-contained so the demo pins today's semantics).
CTE_PREFIX = """
    WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS ts
                  FROM documents),
    corpus AS (SELECT * FROM base
               WHERE doc_id % 97 <> 0 AND len(ts) >= 20),
    per_tok AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(ts) AS tok FROM corpus)
      GROUP BY doc_id, tok),
    rep AS (
      SELECT doc_id FROM per_tok GROUP BY doc_id
      HAVING NOT (1.0 - COUNT(*) * 1.0 / SUM(c) > 0.75
                  OR MAX(c) * 1.0 / SUM(c) > 0.2)),
    passed AS (SELECT c.* FROM corpus c JOIN rep USING (doc_id)),
    dedup AS (
      SELECT * FROM passed
      QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text))
"""

# Stages 2b'-5: near-dup drop table applied after exact dedup, then the
# unchanged decontamination/packing/rollup tail.
EXTENDED_SQL = CTE_PREFIX + """,
    neard AS (SELECT d.* FROM dedup d LEFT JOIN near_drop n USING (doc_id)
              WHERE n.doc_id IS NULL),
    bench_grams AS (
      SELECT DISTINCT array_to_string(ts[i:i+4], ' ') AS gram
      FROM base, UNNEST(range(1, len(ts) - 3)) AS t(i)
      WHERE doc_id % 97 = 0 AND len(ts) >= 5),
    clean AS (
      SELECT d.* FROM neard d WHERE NOT EXISTS (
        SELECT 1 FROM UNNEST(range(1, len(d.ts) - 3)) AS t(i)
        JOIN bench_grams b ON array_to_string(d.ts[i:i+4], ' ') = b.gram)),
    packed AS (
      SELECT doc_id, len(ts) AS n_tokens,
             COALESCE(SUM(len(ts)) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS tok_before
      FROM clean)
    SELECT CAST(tok_before // 4096 AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM packed GROUP BY shard_id ORDER BY shard_id"""


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

    def diff(a: pd.DataFrame, b: pd.DataFrame):
        a, b = a.reset_index(drop=True), b.reset_index(drop=True)
        same_shape = a.shape == b.shape
        mism = 0 if same_shape else -1
        if same_shape:
            for c in a.columns:
                mism += int((a[c].to_numpy(np.int64)
                             != b[c].to_numpy(np.int64)).sum())
        return same_shape, mism

    same_shape, mism = diff(got, ora)

    # ---- near-dup leg: engine corpus_build_neardup vs an independent
    # loop-style oracle (DuckDB survivors → shared-band-kernel candidates →
    # per-pair loop verify → union-find → DuckDB CTE chain with the drop
    # table). Shares the banding kernels with the engine by design — the
    # LSH scheme defines the operator's candidate set; everything
    # downstream (verify loop, union-find, SQL stages) is independent.
    t0 = time.time()
    got_nd = QUERIES["corpus_build_neardup"](out_dir)
    engine_nd_sec = time.time() - t0

    t0 = time.time()
    from crawler_ray.functions.dedup_ops import (
        collide_pairs, jaccard, minhash_bands, shingle_hashes)

    surv = con.execute(CTE_PREFIX + "SELECT doc_id, text FROM dedup "
                       "ORDER BY doc_id").df()
    band_parts = [minhash_bands(surv.iloc[lo:lo + 50_000])
                  for lo in range(0, len(surv), 50_000)]
    cand = collide_pairs(pd.concat(band_parts, ignore_index=True))
    txt = dict(zip(surv["doc_id"].astype(int), surv["text"]))
    need = set(cand["doc_a"].astype(int)) | set(cand["doc_b"].astype(int))
    sh = {d: shingle_hashes(str(txt[d])) for d in need}
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        return r

    n_verified = 0
    for pa_, pb in sorted(set(zip(cand["doc_a"].astype(int),
                                  cand["doc_b"].astype(int)))):
        if jaccard(sh[pa_], sh[pb]) >= 0.5:
            n_verified += 1
            ra, rb = find(pa_), find(pb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    drop = pd.DataFrame({"doc_id": np.array(
        sorted(d for d in txt if find(d) != d), np.int64)})
    con.register("near_drop", drop)
    ora_nd = con.execute(EXTENDED_SQL).df()
    oracle_nd_sec = time.time() - t0
    nd_shape, nd_mism = diff(got_nd, ora_nd)

    print(json.dumps({
        "metric": "corpus_build_scale_demo", "docs": N_DOCS,
        **stats,
        "gen_sec": round(gen_sec, 2),
        "engine_sec": round(engine_sec, 2),
        "duckdb_single_node_sec": round(duck_sec, 2),
        "shards_out": len(got),
        "docs_out": int(got["n_docs"].sum()),
        "tokens_out": int(got["n_tokens"].sum()),
        "shape_match": bool(same_shape),
        "value_mismatches": int(mism),
        "exact_match_vs_duckdb": bool(same_shape and mism == 0),
        "neardup_engine_sec": round(engine_nd_sec, 2),
        "neardup_oracle_sec": round(oracle_nd_sec, 2),
        "neardup_candidates": int(len(cand)),
        "neardup_verified_pairs": int(n_verified),
        "neardup_docs_dropped": int(len(drop)),
        "neardup_docs_out": int(got_nd["n_docs"].sum()),
        "neardup_exact_match": bool(nd_shape and nd_mism == 0),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
