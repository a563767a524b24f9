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


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bounded():
    from crawler_ray.functions.sketches import (bloom_build, bloom_contains,
                                                bloom_m_bits, bloom_merge)

    keys = xxh64_array([f"key-{i}" for i in range(20_000)])
    m = bloom_m_bits(20_000)
    # partials built per slice merge by OR to the single-pass filter
    merged = bloom_merge(bloom_build(keys[:9_000], m), bloom_build(keys[9_000:], m))
    assert np.array_equal(merged, bloom_build(keys, m))
    # the semi-join contract: NEVER a false negative
    assert bloom_contains(merged, keys).all()
    # false positives under ~2x the 10-bits/key design rate (<1 %)
    probe = xxh64_array([f"absent-{i}" for i in range(50_000)])
    assert bloom_contains(merged, probe).mean() < 0.02


def test_bloom_sizing_power_of_two():
    from crawler_ray.functions.sketches import bloom_m_bits

    for n in (1, 100, 819, 820, 10**6):
        m = bloom_m_bits(n)
        assert m >= 10 * n and (m & (m - 1)) == 0


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_merges():
    import pandas as pd

    from crawler_ray.functions.sketches import cms_build, cms_merge, cms_query

    rng = np.random.default_rng(11)
    # zipf-ish stream: key i appears ~ 50000/(i+1) times
    toks = np.repeat(np.arange(400), (50_000 / (np.arange(400) + 1)).astype(int))
    rng.shuffle(toks)
    strs = [f"tok-{t}" for t in toks]
    hashes = xxh64_array(strs)
    half = len(hashes) // 2
    cms = cms_merge(cms_build(hashes[:half]), cms_build(hashes[half:]))
    assert np.array_equal(cms, cms_build(hashes))
    uniq = [f"tok-{t}" for t in range(400)]
    est = cms_query(cms, xxh64_array(uniq))
    true = pd.Series(toks).value_counts().reindex(range(400)).to_numpy(np.int64)
    assert (est >= true).all()          # CM guarantee: no undercount
    # ε ≈ e/W of stream mass bounds the overcount (generous 5ε slack)
    from crawler_ray.functions.sketches import CMS_W
    assert (est - true).max() <= max(1, int(5 * np.e / CMS_W * len(toks)))


def test_cms_weighted_equals_unweighted():
    from crawler_ray.functions.sketches import cms_build

    strs = [f"w-{i}" for i in range(100)]
    h = xxh64_array(strs)
    w = np.arange(1, 101, dtype=np.int64)
    assert np.array_equal(cms_build(h, w), cms_build(np.repeat(h, w)))
