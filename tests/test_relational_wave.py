"""Round-5 relational-completeness queries vs their DuckDB oracles at
sf0.001: PIVOT, CUBE, INTERSECT/EXCEPT set ops, exact grouped median
(percentile_disc rank selection) and deterministic grouped mode.

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
    for t in ("documents", "events", "orders"):
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


def test_pivot_status_month(ray_session, con):
    out = _check("pivot_status_month", con)
    # the wide cells partition the table: cell sums == total orders
    n = len(pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"]))
    assert int(out[["n_open", "n_done", "n_pending"]].to_numpy().sum()) == n


def test_cube_lang_source(ray_session, con):
    out = _check("cube_lang_source", con)
    total = out.loc[(out["lang"] == "ALL") & (out["source"] == "ALL")]
    fine = out.loc[(out["lang"] != "ALL") & (out["source"] != "ALL")]
    by_src = out.loc[(out["lang"] == "ALL") & (out["source"] != "ALL")]
    # every cube level folds to the same grand total
    assert int(total["n_docs"].iloc[0]) == int(fine["n_docs"].sum()) \
        == int(by_src["n_docs"].sum())


def test_set_ops_custkeys(ray_session, con):
    out = _check("set_ops_custkeys", con)
    # inclusion-exclusion vs the plain distinct counts
    o = con.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders "
                    "WHERE o_orderstatus = 'O'").fetchone()[0]
    d = con.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders "
                    "WHERE o_orderstatus = 'F'").fetchone()[0]
    assert int(out["n_both"].iloc[0] + out["n_only_open"].iloc[0]) == o
    assert int(out["n_both"].iloc[0] + out["n_only_done"].iloc[0]) == d


def test_grouped_median_exact(ray_session, con):
    out = _check("grouped_median_exact", con)
    # the median is an exact element of its group (no interpolation)
    vals = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for _, r in out.iterrows():
        g = vals.loc[vals["event_type"] == r["event_type"], "value"]
        assert (g == r["median_value"]).any()
        assert int(r["n"]) == len(g)


def test_grouped_median_exact_two_widths(ray_session, con, monkeypatch):
    """Rank selection must be layout-independent: the keyed/sorted kernels
    give identical medians at a different exchange width."""
    from crawler_ray.pipelines.queries import QUERIES

    base = QUERIES["grouped_median_exact"](SF)
    monkeypatch.setenv("GRAFT_EXCHANGE_WIDTH", "3")
    other = QUERIES["grouped_median_exact"](SF)
    pd.testing.assert_frame_equal(base, other)


def test_grouped_mode(ray_session, con):
    out = _check("grouped_mode", con)
    # tie rule: the reported mode really is a maximal-count priority
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderstatus", "o_orderpriority"])
    for _, r in out.iterrows():
        g = orders.loc[orders["o_orderstatus"] == r["o_orderstatus"],
                       "o_orderpriority"].value_counts()
        assert int(r["n_mode"]) == int(g.max())
        winners = sorted(g[g == g.max()].index)
        assert r["mode_priority"] == winners[0]


def test_semantic_decontaminate(ray_session):
    """Cross-set embedding contamination gate vs its DuckDB oracle at
    sf0.001, plus the conservation invariant."""
    import duckdb

    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    c = duckdb.connect()
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{SF}/embeddings.parquet')")
    got = QUERIES["semantic_decontaminate"](SF)
    exp = c.execute(ORACLE_SQL["semantic_decontaminate"]).df()
    a, b = _norm(got), _norm(exp)
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        bb = b[col].astype(a[col].dtype) if a[col].dtype != b[col].dtype else b[col]
        assert (a[col].to_numpy() == bb.to_numpy()).all(), col
    assert (got["n_kept"] + got["n_contaminated"] == got["n_docs"]).all()


def test_semantic_decontaminate_layout_invariance(ray_session, monkeypatch):
    from crawler_ray.pipelines.queries import QUERIES

    base = QUERIES["semantic_decontaminate"](SF)
    monkeypatch.setenv("GRAFT_EXCHANGE_WIDTH", "3")
    import pandas as pd

    pd.testing.assert_frame_equal(base, QUERIES["semantic_decontaminate"](SF))
