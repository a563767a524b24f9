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
