"""Round-4 query additions vs their DuckDB oracles at sf0.001: ROLLUP,
histogram-sketch quantiles, anti-join, BM25 retrieval, decontamination.

Each test compares the engine result to the oracle SQL the same way the
driver does (columns sorted by name, rows sorted, exact equality)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events", "customer", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _check(name: str, con) -> pd.DataFrame:
    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = con.execute(ORACLE_SQL[name]).df()
    a, b = _norm(got), _norm(exp)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), (name, len(a), len(b))
    for c in a.columns:
        bb = b[c].astype(a[c].dtype) if a[c].dtype != b[c].dtype else b[c]
        assert (a[c].to_numpy() == bb.to_numpy()).all(), (name, c)
    return got


def test_rollup_lang_source(ray_session, con):
    out = _check("rollup_lang_source", con)
    total = out.loc[(out["lang"] == "ALL") & (out["source"] == "ALL"), "n_docs"]
    assert int(total.iloc[0]) == out.loc[out["source"] != "ALL", "n_docs"].sum()


def test_histogram_quantiles(ray_session, con):
    out = _check("histogram_quantiles", con)
    # sketch estimate brackets the true quantile within one bin width
    vals = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for _, r in out.iterrows():
        true_p50 = vals.loc[vals["event_type"] == r["event_type"], "value"].quantile(0.5)
        assert abs(r["p50_est"] - true_p50) <= 2.0 + 1e-9


def test_customers_without_orders(ray_session, con):
    out = _check("customers_without_orders", con)
    assert out["n_customers"].sum() > 0  # fixture guarantees some


def test_bm25_search(ray_session, con):
    out = _check("bm25_search", con)
    assert len(out) == 15
    # descending score, doc_id tiebreak
    s = out["score"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()


def test_benchmark_decontaminate(ray_session, con):
    out = _check("benchmark_decontaminate", con)
    assert (out["doc_id"] % 97 != 0).all()  # benchmark docs never flag themselves


def test_five_grams_kernel_boundaries():
    from crawler_ray.pipelines.queries import _five_grams

    b = pd.DataFrame({"doc_id": np.array([1, 2, 3], np.int64),
                      "text": ["a b c d e f", "x y z w v", "p q"]})
    g = _five_grams(b)
    # doc 1: two 5-grams; doc 2: one; doc 3 (len<5): none — and no gram
    # may ever span the doc boundary
    assert g.loc[g["doc_id"] == 1, "gram"].tolist() == ["a b c d e", "b c d e f"]
    assert g.loc[g["doc_id"] == 2, "gram"].tolist() == ["x y z w v"]
    assert (g["doc_id"] != 3).all()


def test_dup_span_coverage_oracle(ray_session, con):
    out = _check("dup_span_coverage", con)
    assert len(out) > 0
    assert (out["covered_tokens"] <= out["n_tokens"]).all()
    assert (out["coverage_ppm"] <= 1_000_000).all()


def _loop_dup_span(docs: dict[int, str], k: int = 8) -> pd.DataFrame:
    """Straight-line reference: gram -> doc set, then per-doc interval union."""
    grams: dict[str, set] = {}
    occ: dict[int, list] = {}
    for d, text in docs.items():
        ts = text.split(" ")
        for i in range(len(ts) - k + 1):
            g = " ".join(ts[i:i + k])
            grams.setdefault(g, set()).add(d)
            occ.setdefault(d, []).append((i + 1, g))
    rows = []
    for d, text in docs.items():
        n = len(text.split(" "))
        covered = set()
        for pos, g in occ.get(d, []):
            if len(grams[g]) >= 2:
                covered.update(range(pos, pos + k))
        if covered:
            rows.append({"doc_id": d, "n_tokens": n,
                         "covered_tokens": len(covered),
                         "coverage_ppm": len(covered) * 1_000_000 // n})
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


def test_dup_span_coverage_crafted(ray_session, tmp_path):
    from crawler_ray.pipelines.queries import dup_span_coverage

    S = " ".join(f"s{i}" for i in range(10))          # 10-token shared span
    T = " ".join(f"t{i}" for i in range(9))           # 9-token shared span
    R = " ".join(f"r{i}" for i in range(8))           # repeated WITHIN doc 2 only
    docs = {
        0: S + " " + " ".join(f"u{i}" for i in range(20)),
        1: " ".join(f"v{i}" for i in range(5)) + " " + S
           + " " + " ".join(f"w{i}" for i in range(5)) + " " + S,
        2: R + " mid " + R,                            # intra-doc dup: excluded
        3: T + " " + " ".join(f"x{i}" for i in range(12)),
        4: " ".join(f"y{i}" for i in range(3)) + " " + T,
        5: " ".join(f"z{i}" for i in range(40)),       # nothing shared
    }
    df = pd.DataFrame({"doc_id": np.array(sorted(docs), np.int64),
                       "text": [docs[d] for d in sorted(docs)]})
    df.to_parquet(tmp_path / "documents.parquet")
    got = dup_span_coverage(str(tmp_path))
    exp = _loop_dup_span(docs)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the two S islands in doc 1 stay separate: 20 covered, not one 26-span
    assert int(got.loc[got["doc_id"] == 1, "covered_tokens"].iloc[0]) == 20
    # intra-doc-only repetition is not cross-doc duplication
    assert 2 not in got["doc_id"].to_numpy()
    # overlapping 8-grams inside T merge into one 9-token island
    assert int(got.loc[got["doc_id"] == 3, "covered_tokens"].iloc[0]) == 9


def test_dup_span_hot_gram_bypass(ray_session, tmp_path):
    """Round-5 hot-gram mitigation (VERDICT r04 'What's wrong #3'): a
    corpus-stopword 8-gram planted in EVERY document must (a) produce
    exactly the loop-reference coverage, and (b) mostly bypass the gram
    exchange — the exchange sees marker rows instead of every occurrence.
    Also pins the markers' exactness: a single-doc-heavy layout where the
    stopword's occurrences land in blocks that cannot prove it locally."""
    from crawler_ray.pipelines.queries import dup_span_coverage

    STOP = " ".join(f"the{i}" for i in range(8))  # hot 8-gram, in every doc
    rng = np.random.default_rng(3)
    docs = {}
    for d in range(30):
        uniq = " ".join(f"d{d}w{i}" for i in range(int(rng.integers(10, 30))))
        # stopword appears 1-3 times per doc, interleaved with unique text
        reps = (" " + STOP + " ") .join([uniq] * int(rng.integers(2, 4)))
        docs[d] = reps
    df = pd.DataFrame({"doc_id": np.array(sorted(docs), np.int64),
                       "text": [docs[d] for d in sorted(docs)]})
    df.to_parquet(tmp_path / "documents.parquet")
    got = dup_span_coverage(str(tmp_path))
    exp = _loop_dup_span(docs)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # intra-doc-only repetition must STILL be excluded with the bypass on
    docs2 = {0: STOP + " mid " + STOP, 1: "a b c d e f g h i"}
    df2 = pd.DataFrame({"doc_id": np.array(sorted(docs2), np.int64),
                        "text": [docs2[d] for d in sorted(docs2)]})
    (tmp_path / "solo").mkdir()
    df2.to_parquet(tmp_path / "solo" / "documents.parquet")
    got2 = dup_span_coverage(str(tmp_path / "solo"))
    assert len(got2) == 0  # stopword repeats only within doc 0


def test_semantic_dedup_invariants(ray_session):
    from crawler_ray.pipelines.queries import (SEMANTIC_DEDUP_THRESHOLD,
                                               QUERIES)

    out = QUERIES["semantic_dedup"](SF)
    assert len(out) > 0
    assert (out["dup_of"] < out["vec_id"]).all()        # id-order drop rule
    assert (out["sim"] >= SEMANTIC_DEDUP_THRESHOLD).all()
    assert out["vec_id"].is_unique                       # one row per drop
    # every dropped pair must also be a corpus-wide embedding near-dup:
    # clustering can only RESTRICT the pair set, never invent pairs
    nd = QUERIES["embedding_near_dups"](SF)
    if hasattr(nd, "to_pandas"):
        nd = nd.to_pandas()
    pairs = set(zip(nd["vid_a"].astype(int), nd["vid_b"].astype(int)))
    got = set(zip(out["dup_of"].astype(int), out["vec_id"].astype(int)))
    assert got <= pairs, got - pairs


def test_semantic_dedup_oversize_cluster_tiles(ray_session):
    """Round-5 scale fix (VERDICT r04 'What's wrong #2'): a cluster above
    tile_limit must route through the distributed tile grid and produce the
    EXACT same drops as the in-block all-pairs path. Plant a giant tight
    cluster (many near-identical vectors) plus scattered vectors, then run
    the core with tile_limit huge (all in-block) vs tiny (giant cluster
    tiles) and require bit-equal results."""
    import ray.data as rd

    from crawler_ray.pipelines.queries import semantic_dedup_ds

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    tight = base + rng.normal(scale=0.01, size=(120, 16))  # one giant cluster
    spread = rng.normal(size=(40, 16))
    vecs = np.vstack([tight, spread]).astype(np.float32)
    ids = rng.permutation(len(vecs)).astype(np.int64)  # ids not block-ordered
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(6)
    inblock = semantic_dedup_ds(ds, k=4, n_iters=3, tile_limit=10**9)
    tiled = semantic_dedup_ds(ds, k=4, n_iters=3, tile_limit=30)
    assert len(inblock) >= 100  # the planted cluster actually collapses
    pd.testing.assert_frame_equal(tiled, inblock)


def test_per_source_cap_matches_duckdb(ray_session, con):
    _check("per_source_cap", con)


def test_bloom_semi_join_matches_duckdb(ray_session):
    c = duckdb.connect()
    for t in ("lineitem", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    _check("bloom_semi_join", c)


def test_skew_join_brand_revenue_matches_duckdb(ray_session):
    c = duckdb.connect()
    for t in ("lineitem", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    _check("skew_join_brand_revenue", c)


def test_cms_heavy_bigrams_matches_duckdb(ray_session, con):
    _check("cms_heavy_bigrams", con)


def test_embedding_covariance_matches_duckdb(ray_session):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    _check("embedding_covariance", c)
