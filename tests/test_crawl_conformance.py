"""Engine-vs-oracle conformance (FIXTURES.md F7 golden outputs).

The Ray engine and the single-threaded reference-semantics oracle run over
the same deterministic synthetic web; the north-rule gates are asserted:
URL-seen-set equality, crawl-order equality, DLQ equality, parsed-page
equality, caption byte-equality, phash equality, decoded-pixel PSNR ≥ 40 dB
(exact for lossless), per-host politeness spacing, and bit-identical resume.
"""

import shutil

import numpy as np
import pytest

from crawler_ray import semantics
from crawler_ray.imaging import decode_png, psnr
from crawler_ray.oracle import run_oracle
from crawler_ray.sources.synthetic_web import (
    WebParams,
    build_web,
    image_array,
    unit_params,
)


@pytest.fixture(scope="module")
def unit_results(ray_session, tmp_path_factory):
    from crawler_ray.pipelines.crawl import run_crawl

    p = unit_params()
    web = build_web(p)
    out = str(tmp_path_factory.mktemp("crawl") / "unit")
    run = run_crawl(web, p, out)
    oracle = run_oracle(web, p)
    return web, p, run, oracle


def test_seen_set_equality(unit_results):
    _, _, run, oracle = unit_results
    t = run.read("seen")
    eng = dict(zip(t["url"].to_pylist(), t["url_hash"].to_pylist()))
    assert eng == oracle["seen"]


def test_crawl_order_equality(unit_results):
    _, _, run, oracle = unit_results
    rows = sorted(
        run.read("order").to_pylist(),
        key=lambda r: (r["wave"], r["priority"], r["host_shard"], r["seq"], r["url"]),
    )
    eng = [(r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"]) for r in rows]
    orc = [(r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"]) for r in oracle["order"]]
    assert eng == orc


def test_dlq_equality(unit_results):
    _, _, run, oracle = unit_results
    eng = sorted((r["url"], r["failed_step"], r["retry_count"]) for r in run.read("dlq").to_pylist())
    orc = sorted((r["url"], r["failed_step"], r["retry_count"]) for r in oracle["dlq"])
    assert eng == orc


def test_store_equality_and_psnr_gate(unit_results):
    _, p, run, oracle = unit_results
    store = run.read("store").to_pylist()
    eng = sorted((r["image_id"], r["caption"], r["phash"], r["fmt"], r["w"], r["h"]) for r in store)
    orc = sorted((r["image_id"], r["caption"], r["phash"], r["fmt"], r["w"], r["h"]) for r in oracle["store"])
    assert eng == orc  # captions byte-equal, phash equal
    for r in store:
        decoded = decode_png(r["bytes"])
        truth = image_array(r["image_id"], r["w"], r["h"], p.seed)
        if r["fmt"] == "png":
            assert (decoded == truth).all()
        else:
            assert psnr(truth, decoded) >= 40.0


def test_parsed_pages_equality(unit_results):
    _, _, run, oracle = unit_results
    eng = {r["url"]: r for r in run.read("pages").to_pylist()}
    assert len(eng) == len(oracle["pages"])
    for op in oracle["pages"]:
        ep = eng[op["url"]]
        for k in ["title", "address", "price", "latitude", "longitude", "property_type",
                  "beds", "baths", "sqft", "city", "content_hash", "wave", "headers"]:
            assert ep[k] == op[k], (op["url"], k)
        assert str(ep["posted_date"]).startswith(op["posted_date"].replace("T", " "))


def test_politeness_spacing(unit_results):
    web, p, run, _ = unit_results
    robots = {r["host"]: r for r in web["robots"].to_pylist()}
    order = run.read("order").to_pylist()
    by_wave_host: dict = {}
    for r in order:
        by_wave_host.setdefault((r["wave"], r["host"]), []).append(r["scheduled_at"])
    for (_, host), times in by_wave_host.items():
        delay = semantics.politeness_delay(robots.get(host))
        times = sorted(times)
        gaps = np.diff(times)
        assert (gaps >= delay - 1e-9).all(), (host, times)


def test_resume_bit_identity(ray_session, tmp_path):
    from crawler_ray.pipelines.crawl import run_crawl

    p = unit_params()
    web = build_web(p)
    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    full = run_crawl(web, p, full_dir)
    # stop early, drop crash garbage, then resume
    cfg = semantics.CrawlConfig(max_retries=p.max_retries, max_waves=1)
    run_crawl(web, p, part_dir, cfg=cfg)
    import os

    os.makedirs(f"{part_dir}/store/_tmp", exist_ok=True)
    with open(f"{part_dir}/store/partial-crash.parquet", "wb") as f:
        f.write(b"junk")
    resumed = run_crawl(web, p, part_dir, resume=True)

    for table, keys in [
        ("seen", ["url", "url_hash"]),
        ("order", ["url", "wave", "priority", "host_shard", "seq"]),
        ("dlq", ["url", "failed_step", "retry_count"]),
        ("store", ["image_id", "caption", "phash", "fmt"]),
        ("pages", ["url", "content_hash"]),
    ]:
        a = sorted(tuple(r[k] for k in keys) for r in full.read(table).to_pylist())
        b = sorted(tuple(r[k] for k in keys) for r in resumed.read(table).to_pylist())
        assert a == b, table
    # store *bytes* identical too
    ab = sorted((r["image_id"], r["bytes"]) for r in full.read("store").to_pylist())
    bb = sorted((r["image_id"], r["bytes"]) for r in resumed.read("store").to_pylist())
    assert ab == bb


def test_cross_wave_retry_and_block_indicators(ray_session, tmp_path):
    """SURVEY §4 retry row: transient (HTTP-status) failures re-enqueue into
    the next wave with a cumulative attempt budget and recover; hard
    failures exhaust max_enqueue_retries and park permanently. Block pages
    carry varied indicators from the reference's 12-entry table. Engine and
    oracle agree on seen/order/DLQ throughout."""
    from collections import Counter

    from crawler_ray.pipelines.crawl import run_crawl
    from crawler_ray.sources.synthetic_web import page_meta, render_html

    p = WebParams(seed=11, n_hosts=5, props_per_host=20, hot_hosts=1, hot_factor=3,
                  props_per_listing=8, fail_frac=0.35, blocked_frac=0.12)
    web = build_web(p)
    oracle = run_oracle(web, p)

    # the fixture exercises every branch:
    order_count = Counter(r["url"] for r in oracle["order"])
    retried = {u for u, c in order_count.items() if c > 1}
    assert retried, "no URL was re-enqueued"
    recovered = retried & {r["url"] for r in oracle["pages"]}
    assert recovered, "no transient failure recovered in a later wave"
    dlq_count = Counter(r["url"] for r in oracle["dlq"])
    assert any(c >= 3 for c in dlq_count.values()), "no URL exhausted the re-enqueue cap"
    blocked = [r["url"] for r in oracle["dlq"] if r["failed_step"] == "blocked"]
    inds = set()
    for u in blocked:
        h = render_html(page_meta(u, p)).lower()
        inds.update(i for i in semantics.BLOCK_INDICATORS if i in h)
    assert len(inds) >= 3, f"only {inds} indicators fired"

    run = run_crawl(web, p, str(tmp_path / "retry"))
    t = run.read("seen")
    assert dict(zip(t["url"].to_pylist(), t["url_hash"].to_pylist())) == oracle["seen"]
    rows = sorted(run.read("order").to_pylist(),
                  key=lambda r: (r["wave"], r["priority"], r["host_shard"], r["seq"], r["url"]))
    eng = [(r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"]) for r in rows]
    orc = [(r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"]) for r in oracle["order"]]
    assert eng == orc
    edlq = sorted((r["url"], r["failed_step"], r["retry_count"], r["wave"])
                  for r in run.read("dlq").to_pylist())
    odlq = sorted((r["url"], r["failed_step"], r["retry_count"], r["wave"])
                  for r in oracle["dlq"])
    assert edlq == odlq


def test_oracle_determinism():
    p = WebParams(seed=7, n_hosts=4, props_per_host=6, hot_hosts=1, hot_factor=3)
    a = run_oracle(build_web(p), p)
    b = run_oracle(build_web(p), p)
    assert a["order"] == b["order"] and a["seen"] == b["seen"] and a["dlq"] == b["dlq"]


@pytest.mark.parametrize("seed", [7, 99])
def test_conformance_other_seeds(ray_session, tmp_path, seed):
    """Seed sweep: engine==oracle must hold for arbitrary web seeds."""
    from crawler_ray.pipelines.crawl import run_crawl

    p = WebParams(seed=seed, n_hosts=4, props_per_host=6, hot_hosts=1,
                  hot_factor=3, props_per_listing=4)
    web = build_web(p)
    run = run_crawl(web, p, str(tmp_path / f"s{seed}"))
    oracle = run_oracle(web, p)
    t = run.read("seen")
    assert dict(zip(t["url"].to_pylist(), t["url_hash"].to_pylist())) == oracle["seen"]
    rows = sorted(run.read("order").to_pylist(),
                  key=lambda r: (r["wave"], r["priority"], r["host_shard"], r["seq"], r["url"]))
    eng = [(r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"]) for r in rows]
    orc = [(r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"]) for r in oracle["order"]]
    assert eng == orc
    es = sorted((r["image_id"], r["caption"], r["phash"]) for r in run.read("store").to_pylist())
    os_ = sorted((r["image_id"], r["caption"], r["phash"]) for r in oracle["store"])
    assert es == os_


def test_frontier_bucketing_invariant(unit_results):
    """Every frontier fragment holds rows of exactly its bucket (host_shard
    % FRONTIER_BUCKETS parsed from the fragment name) — the co-location
    contract the shuffle-free wave read relies on."""
    import os

    import pyarrow.parquet as pq

    from crawler_ray.sources import lance_layout as ll
    from crawler_ray.stages.crawl_stages import FetchProcess

    _, _, run, _ = unit_results
    fdir = os.path.join(run.root, "frontier")
    n_checked = 0
    for fn in sorted(os.listdir(fdir)):
        if not fn.endswith(".parquet"):
            continue
        bucket = int(fn.split("-")[1][1:])
        t = pq.read_table(os.path.join(fdir, fn), columns=["host_shard"])
        shards = t["host_shard"].to_numpy()
        assert (shards % FetchProcess.FRONTIER_BUCKETS == bucket).all(), fn
        n_checked += 1
    assert n_checked > 0


def test_distributed_listing_scan_equivalence(ray_session, tmp_path, monkeypatch):
    """The distributed listing-candidate scan (large-wave path) produces the
    same crawl as the driver-side pyarrow scan."""
    from crawler_ray.pipelines import crawl as crawl_mod

    p = unit_params(seed=31)
    web = build_web(p)
    base = crawl_mod.run_crawl(web, p, str(tmp_path / "drv"))
    monkeypatch.setattr(crawl_mod, "LISTING_SCAN_DISTRIBUTED_ROWS", 0)
    dist = crawl_mod.run_crawl(web, p, str(tmp_path / "dist"))
    for table, keys in [("order", ["url", "wave", "priority", "host_shard", "seq"]),
                        ("seen", ["url", "url_hash"]),
                        ("dlq", ["url", "failed_step", "retry_count"])]:
        a = sorted(tuple(r[k] for k in keys) for r in base.read(table).to_pylist())
        b = sorted(tuple(r[k] for k in keys) for r in dist.read(table).to_pylist())
        assert a == b, table


def test_hot_host_bucket_balance(ray_session, tmp_path):
    """Skew test (SURVEY §4): hot_factor=16 web, frontier_buckets scaled
    with parallelism (2×fetch_concurrency). A host is ATOMIC under per-host
    politeness (a rate-limited sequential queue cannot be split), so the
    irreducible per-bucket floor is its hottest host's rows; assert the
    bucketing adds no skew beyond that floor (excess ≤ 2× median bucket)
    and that the crawl stays oracle-conformant under the skewed web."""
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq

    from crawler_ray.hashing import xxh64_array
    from crawler_ray.pipelines.crawl import run_crawl

    p = WebParams(seed=7, n_hosts=48, props_per_host=4, hot_hosts=1, hot_factor=16)
    web = build_web(p)
    out = str(tmp_path / "hot")
    run = run_crawl(web, p, out, fetch_concurrency=16)  # → 32 buckets

    # conformance under skew
    oracle = run_oracle(web, p)
    t = run.read("seen")
    assert dict(zip(t["url"].to_pylist(), t["url_hash"].to_pylist())) == oracle["seen"]

    # block-group balance on the heaviest wave: buckets (complete hosts)
    # are LPT-packed into groups using manifest row counts — makespan is
    # bounded by max(hottest bucket, ~mean): the hottest bucket is the
    # irreducible atomic floor (per-host politeness), everything else
    # balances near the mean, and parallelism is never throttled
    from crawler_ray.pipelines.crawl import pack_frontier_buckets
    from crawler_ray.sources import lance_layout as ll

    frags = ll.latest_manifest(run.root)["tables"]["frontier"]
    by_wave = defaultdict(list)
    for f in frags:
        by_wave[f["fragment"].split("-")[0]].append(f)
    wave_frags = max(by_wave.values(), key=lambda fs: sum(f["rows"] for f in fs))
    bucket_rows = defaultdict(int)
    for f in wave_frags:
        bucket_rows[f["fragment"].split("-")[1]] += f["rows"]
    groups = pack_frontier_buckets(wave_frags, out, fetch_concurrency=16)
    sizes = [rows for _, rows in groups]
    total, max_bucket = sum(sizes), max(bucket_rows.values())
    assert len(groups) == min(32, len(bucket_rows))  # parallelism not throttled
    assert max(sizes) <= max(max_bucket, 2 * total / len(groups)) + 1, (
        f"unbalanced groups: {sorted(sizes)}, atomic floor {max_bucket}")
    # every bucket holds complete hosts only (politeness atomicity): a
    # host's rows never span two buckets
    host_bucket = {}
    for f in wave_frags:
        bucket = f["fragment"].split("-")[1]
        df = pq.read_table(os.path.join(out, "frontier", f["fragment"]),
                           columns=["url"]).to_pandas()
        for h in df["url"].str.extract(r"//([^/]+)/", expand=False).unique():
            assert host_bucket.setdefault(h, bucket) == bucket, h
