"""Co-partitioned bucketed-layout join: must equal both the DuckDB oracle
and the shuffle-join query it replaces, and the layout must be reused
(second run joins from the existing buckets without rewriting)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_matches_oracle_and_shuffle_join(ray_session):
    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["bucketed_join"](SF)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    exp = (con.execute(ORACLE_SQL["bucketed_join"]).df()
           .sort_values("o_orderpriority").reset_index(drop=True))
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_items"].astype(np.int64).tolist() == exp["n_items"].astype(np.int64).tolist()
    assert got["total_revenue"].tolist() == exp["total_revenue"].tolist()
    other = QUERIES["orders_lineitem_join"](SF)
    assert got["n_items"].tolist() == other["n_items"].tolist()
    assert got["total_revenue"].tolist() == other["total_revenue"].tolist()


def test_layout_reused_not_rewritten(ray_session):
    from crawler_ray.pipelines.queries import QUERIES, _layout_cache_root

    root = _layout_cache_root("graft_bucketed", SF, "orders", "lineitem")
    QUERIES["bucketed_join"](SF)  # ensures layout exists
    states = {(f, os.stat(os.path.join(root, "orders", f)).st_mtime_ns)
              for f in os.listdir(os.path.join(root, "orders"))
              if f.endswith(".parquet")}
    QUERIES["bucketed_join"](SF)  # second run: query-time only
    states2 = {(f, os.stat(os.path.join(root, "orders", f)).st_mtime_ns)
               for f in os.listdir(os.path.join(root, "orders"))
               if f.endswith(".parquet")}
    assert states2 == states


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
