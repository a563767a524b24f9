"""uniform_k_sample: exact global ORDER BY hash LIMIT k via per-block
top-k candidates — vs its DuckDB oracle, a brute-force reference, and
under block-layout perturbation (the combiner must be exact regardless of
how rows are split across blocks)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_matches_duckdb_oracle(ray_session):
    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["uniform_k_sample"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    sql = ORACLE_SQL["uniform_k_sample"].replace("LIMIT 200", "LIMIT 200")
    exp = con.execute(sql).df()
    assert got["doc_id"].astype(np.int64).tolist() == exp["doc_id"].astype(np.int64).tolist()
    assert got["h"].astype(np.int64).tolist() == exp["h"].astype(np.int64).tolist()


def test_layout_invariance_and_brute_force(ray_session):
    """k larger than some blocks, blocks smaller than k — every layout
    must produce the exact brute-force bottom-k."""
    import ray.data as rd

    from crawler_ray.pipelines.queries import _murmur64, uniform_k_sample

    ids = np.arange(137, dtype=np.int64)
    h = (_murmur64(ids.view(np.uint64) ^ np.uint64(7)) % np.uint64(2**31)).astype(np.int64)
    order = np.lexsort((ids, h))[:25]
    expect = sorted(ids[order].tolist())

    def run(num_blocks: int) -> list[int]:
        ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
        ds = ds.repartition(num_blocks)

        def block_topk(b: pd.DataFrame) -> pd.DataFrame:
            v = b["doc_id"].to_numpy(np.int64)
            hh = (_murmur64(v.view(np.uint64) ^ np.uint64(7))
                  % np.uint64(2**31)).astype(np.int64)
            o = np.lexsort((v, hh))[:25]
            return pd.DataFrame({"doc_id": v[o], "h": hh[o]})

        cand = (ds.map_batches(block_topk, batch_format="pandas")
                .to_pandas().sort_values(["h", "doc_id"]).head(25))
        return sorted(cand["doc_id"].astype(np.int64).tolist())

    for nb in (1, 4, 31):  # one block; k-per-block; blocks smaller than k
        assert run(nb) == expect, nb


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
