"""HyperLogLog sketch kernel + approx-distinct query."""

from __future__ import annotations

import numpy as np

from crawler_ray.functions.sketches import M, P, hll_estimate, hll_merge, hll_registers
from crawler_ray.hashing import xxh64_array


def test_hll_rho_exact_bit_positions():
    # hand-built hashes: register 0, remainder with a known leading-one slot
    h = np.array([1 << (63 - P - k) for k in range(0, 40, 7)], np.uint64)
    regs = hll_registers(h)
    # each hash hits register 0 with rho = k+1; max wins
    assert regs[0] == 36  # k=35 → rho 36
    # all-zero remainder saturates at 64-P+1
    assert hll_registers(np.zeros(1, np.uint64))[0] == 64 - P + 1


def test_hll_estimate_within_2pct_at_100k():
    # real xxh64 hashes (full 64-bit spread — a bounded-range input would
    # starve register indexes and trip linear counting)
    hs = xxh64_array([f"item-{i}" for i in range(100_000)])
    est = hll_estimate(hll_registers(hs))
    assert abs(est - 100_000) / 100_000 < 0.02


def test_hll_merge_equals_single_pass():
    strs = [f"tok{i}" for i in range(5000)]
    hs = xxh64_array(strs)
    one = hll_registers(hs)
    merged = hll_merge(hll_registers(hs[:2000]), hll_registers(hs[2000:]))
    assert np.array_equal(one, merged)
    # idempotent: re-merging duplicates changes nothing
    assert np.array_equal(hll_merge(merged, hll_registers(hs[:1000])), merged)


def test_grouped_registers_bit_equal_per_group():
    import pandas as pd

    from crawler_ray.functions.sketches import hll_registers_grouped

    strs = [f"tok{i}" for i in range(9000)]
    hs = xxh64_array(strs)
    codes = np.array([i % 3 for i in range(9000)], np.int64)
    grouped = hll_registers_grouped(hs, codes, 3)
    for g in range(3):
        assert np.array_equal(grouped[g], hll_registers(hs[codes == g]))
    # empty input yields all-zero registers
    assert not hll_registers_grouped(np.zeros(0, np.uint64),
                                     np.zeros(0, np.int64), 2).any()


def test_approx_distinct_tokens_bounds_error(ray_session):
    import re

    import pandas as pd

    from crawler_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["approx_distinct_tokens"](sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "text"])
    exact = (docs.assign(toks=docs["text"].str.lower().str.findall(r"[a-z0-9_]+"))
             .explode("toks").dropna(subset=["toks"])
             .groupby("lang")["toks"].nunique())
    assert set(out["lang"]) == set(exact.index)
    for _, r in out.iterrows():
        true = int(exact[r["lang"]])
        assert abs(int(r["approx_distinct"]) - true) / true < 0.05, (r["lang"], true, r["approx_distinct"])
