"""Golden-oracle generator for the queries DuckDB SQL cannot express.

Each golden parquet under ``golden/`` is produced by a STRAIGHT-LINE,
single-threaded implementation that is independent of the Ray
orchestration under test (shared math kernels only — the same standard as
the crawl conformance oracle). The driver's ``oracle_sql`` entries read
these files via DuckDB ``read_parquet`` and get full rows+schema+hash
checks instead of rows-only.

Where a complete independent formulation exists, it is STRONGER than the
engine's: SimHash and phash near-dup goldens are brute-force all-pairs
Hamming scans (the banding guarantee must recover exactly that set);
image features are decoded and embedded in a plain loop; language ID and
stopword ratios use the original per-document loop the vectorized engine
replaced.

Inputs: ``/root/testdata/sf0.01`` (the driver's correctness tier) and the
fixed crawl fixture of ``__ray_entry__._crawl_run``. Re-run after any
semantics/fixture change:  python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_ray.functions.dedup_ops import (  # noqa: E402
    collide_pairs,
    connected_components,
    jaccard,
    minhash_bands,
    shingle_hashes,
    simhash64,
)
from crawler_ray.hashing import xxh64, xxh64_array  # noqa: E402
from crawler_ray.oracle import run_oracle  # noqa: E402
from crawler_ray.sources.synthetic_web import WebParams, build_web, image_bytes  # noqa: E402
from crawler_ray.urlnorm import url_host  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def write(name: str, df: pd.DataFrame, schema: pa.Schema | None = None):
    t = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
    pq.write_table(t, os.path.join(OUT, f"{name}.parquet"))
    print(f"golden/{name}.parquet  {t.num_rows} rows  [{', '.join(t.column_names)}]")


# ---------------------------------------------------------------------------
# Crawl goldens (fixed fixture of __ray_entry__._crawl_run)
# ---------------------------------------------------------------------------

def crawl_goldens():
    params = WebParams(seed=42, n_hosts=6, props_per_host=10, hot_hosts=1, hot_factor=4)
    web = build_web(params)
    o = run_oracle(web, params)

    sched = {(s["url"], s["wave"]): s for s in o["schedule"]}
    order = pd.DataFrame([
        dict(url=r["url"], wave=np.int32(r["wave"]), priority=np.int8(r["priority"]),
             host_shard=np.int32(r["host_shard"]), seq=np.int64(r["seq"]),
             host=sched[(r["url"], r["wave"])]["host"],
             scheduled_at=np.float64(sched[(r["url"], r["wave"])]["scheduled_at"]))
        for r in o["order"]
    ])
    write("crawl_order", order)

    seen = pd.DataFrame({
        "url": order["url"], "url_hash": xxh64_array(order["url"]),
        "wave": order["wave"].astype(np.int32),
    })
    write("crawl_seen", seen)

    dlq = pd.DataFrame([
        dict(url=r["url"], url_hash=np.uint64(xxh64(r["url"])), host=url_host(r["url"]),
             failed_step=r["failed_step"], retry_count=np.int32(r["retry_count"]),
             wave=np.int32(r["wave"]))
        for r in o["dlq"]
    ])
    write("crawl_dlq", dlq)

    pages = pd.DataFrame([
        dict(url=r["url"], url_hash=np.uint64(r["url_hash"]), host=r["host"],
             host_shard=np.int32(r["host_shard"]), wave=np.int32(r["wave"]),
             crawl_duration=np.float64(r["crawl_duration"]), headers=r["headers"],
             title=r["title"], price=r["price"], address=r["address"],
             latitude=r["latitude"], longitude=r["longitude"],
             beds=r["beds"], baths=r["baths"], sqft=r["sqft"],
             posted_date=pd.to_datetime(r["posted_date"]),
             property_type=r["property_type"], city=r["city"], caption=r["caption"],
             status_code=np.int16(r["status_code"]), content_hash=np.uint64(r["content_hash"]))
        for r in o["pages"]
    ])
    pages["price"] = pages["price"].astype("Int64")
    pages["beds"] = pages["beds"].astype("Int32")
    pages["sqft"] = pages["sqft"].astype("Int32")
    write("crawl_pages", pages)

    store = pd.DataFrame([
        dict(image_id=r["image_id"], w=np.int32(r["w"]), h=np.int32(r["h"]), fmt=r["fmt"],
             caption=r["caption"], phash=np.int64(r["phash"]), host=r["host"],
             host_shard=np.int32(r["host_shard"]), wave=np.int32(r["wave"]),
             src_url=r["src_url"])
        for r in o["store"]
    ])
    write("crawl_store_meta", store)

    # main-content extraction golden: the SAME published block-density
    # rule (functions/extract.py docstring) on an INDEPENDENT tokenizer —
    # stdlib html.parser — looped per page; the implementations meet only
    # at the block spec (segment at BLOCK_TAGS, keep len>=MIN_CHARS with
    # link_chars*100 <= 33*len)
    import re as _re
    from html.parser import HTMLParser

    from crawler_ray.functions.extract import BLOCK_TAGS, MIN_CHARS
    from crawler_ray.sources.synthetic_web import page_meta, render_html

    class BlockParser(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)  # spec: no entity decode
            self.blocks, self.buf, self.link, self.in_a = [], [], [], False

        def _flush(self):
            t = _re.sub(r"\s+", " ", "".join(self.buf)).strip()
            if t:
                link = _re.sub(r"\s+", " ", "".join(self.link)).strip()
                self.blocks.append((t, len(link)))
            self.buf, self.link, self.in_a = [], [], False

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                self.in_a = True
            elif tag in BLOCK_TAGS:
                self._flush()

        def handle_endtag(self, tag):
            if tag == "a":
                self.in_a = False
            elif tag in BLOCK_TAGS:
                self._flush()

        def handle_data(self, d):
            self.buf.append(d)
            if self.in_a:
                self.link.append(d)

    mc_rows = []
    for r in o["pages"]:
        bp = BlockParser()
        bp.feed(render_html(page_meta(r["url"], params)))
        bp.close()
        bp._flush()
        kept = [(t, lc) for t, lc in bp.blocks
                if len(t) >= MIN_CHARS and lc * 100 <= 33 * len(t)]
        main = "\n".join(t for t, _ in kept)
        mc_rows.append(dict(
            url=r["url"], n_kept=len(kept),
            n_dropped=len(bp.blocks) - len(kept),
            main_chars=sum(len(t) for t, _ in kept),
            boiler_chars=sum(len(t) for t, _ in bp.blocks)
            - sum(len(t) for t, _ in kept),
            main_hash=int(np.uint64(xxh64(main)) >> np.uint64(1))))
    mc = pd.DataFrame(mc_rows)
    for c in mc.columns[1:]:
        mc[c] = mc[c].astype(np.int64)
    write("page_main_content", mc.sort_values("url").reset_index(drop=True))

    # image metadata scrub golden: straight per-host loop over the oracle
    # store re-deriving the PUBLISHED injected-chunk length formula
    # (imaging.inject_test_metadata docstring: (12+17+len(id)) + (12+16)
    # + (12+7) bytes across 3 chunks); roundtrip exactness is asserted
    # live in-query against the actual store bytes
    scrub_acc: dict[str, list] = {}
    for r in o["store"]:
        a = scrub_acc.setdefault(r["host"], [0, 0, 0])
        a[0] += 1
        a[1] += 3
        a[2] += (12 + 17 + len(r["image_id"])) + (12 + 16) + (12 + 7)
    scrub = pd.DataFrame([
        dict(host=h, n_images=a[0], n_chunks_dropped=a[1],
             bytes_dropped=a[2], n_roundtrip_exact=a[0])
        for h, a in sorted(scrub_acc.items())])
    for c in scrub.columns[1:]:
        scrub[c] = scrub[c].astype(np.int64)
    write("image_metadata_scrub", scrub.reset_index(drop=True))

    # host politeness audit golden: straight dict-of-lists loop over the
    # oracle's schedule; delay via the oracle's DICT path (the engine
    # re-derives it through the render→parse robots path — the two meet
    # only at semantics.politeness_delay)
    import math

    from crawler_ray import semantics as _sem

    robots_rows = {r["host"]: r for r in web["robots"].to_pylist()}
    by_hw: dict[tuple, list] = {}
    for s in o["schedule"]:
        by_hw.setdefault((s["host"], int(s["wave"])), []).append(
            float(s["scheduled_at"]))
    pol_rows = []
    for (host, wave), ts in sorted(by_hw.items()):
        ts = sorted(ts)
        gaps = [int(math.floor(b * 1e6)) - int(math.floor(a * 1e6))
                for a, b in zip(ts, ts[1:])]
        d_us = int(_sem.politeness_delay(robots_rows.get(host)) * 1e6)
        pol_rows.append(dict(
            host=host, wave=wave, n_fetches=len(ts),
            min_gap_us=min(gaps) if gaps else -1,
            max_gap_us=max(gaps) if gaps else -1,
            delay_us=d_us,
            ok=int(len(ts) == 1 or min(gaps) >= d_us)))
    pol = pd.DataFrame(pol_rows)
    for c in pol.columns[1:]:
        pol[c] = pol[c].astype(np.int64)
    write("host_politeness_audit",
          pol.sort_values(["host", "wave"]).reset_index(drop=True))

    # per-wave runtime counters golden: four plain loops over the oracle's
    # record lists
    waves = sorted({int(r["wave"]) for r in o["order"]}
                   | {int(r["wave"]) for r in o["pages"]}
                   | {int(r["wave"]) for r in o["dlq"]}
                   | {int(r["wave"]) for r in o["store"]})
    ws_rows = []
    for w in waves:
        imgs = [r for r in o["store"] if int(r["wave"]) == w]
        ws_rows.append(dict(
            wave=w,
            n_scheduled=sum(1 for r in o["order"] if int(r["wave"]) == w),
            n_pages=sum(1 for r in o["pages"] if int(r["wave"]) == w),
            n_dlq=sum(1 for r in o["dlq"] if int(r["wave"]) == w),
            n_images=len(imgs),
            total_pixels=sum(int(r["w"]) * int(r["h"]) for r in imgs)))
    ws = pd.DataFrame(ws_rows)
    for c in ws.columns:
        ws[c] = ws[c].astype(np.int64)
    write("crawl_wave_summary", ws.sort_values("wave").reset_index(drop=True))

    srv = pages["headers"].map(lambda s: json.loads(s)["server"])
    hs = srv.value_counts().rename_axis("server").reset_index(name="n_pages")
    hs["n_pages"] = hs["n_pages"].astype(np.int64)
    write("crawl_header_stats", hs.sort_values("server").reset_index(drop=True))

    # REST point-lookup analogues (api/main.py:251-290)
    pg = pd.DataFrame(o["pages"])
    pg["pid"] = pg["url"].str.extract(r"/(\d+)\.html$", expand=False).astype("int64")
    look = pg.loc[pg["pid"] == pg["pid"].min(),
                  ["url", "title", "price", "city", "beds", "pid"]].copy()
    for c in ("price", "beds", "pid"):
        look[c] = look[c].astype("int64")
    write("crawl_page_lookup", look.sort_values("url").reset_index(drop=True))

    cp = pg.loc[pg["city"] == "atlanta", ["url", "title", "price", "beds", "city"]].copy()
    for c in ("price", "beds"):
        cp[c] = cp[c].astype("int64")
    write("crawl_city_pages", cp.sort_values("url").reset_index(drop=True))

    # incremental recrawl delta: the changed-page set at content_rev=1 is
    # exactly the urls the fixture's deterministic mutation touches
    from dataclasses import replace as _dc_replace

    from crawler_ray.sources.synthetic_web import _failure_flags, content_changes

    p2 = _dc_replace(params, content_rev=1)
    budget = p2.max_retries + 1  # recrawl is single-pass: one wave's attempt
    # budget, no cross-wave re-enqueue — a changed page whose fail_attempts
    # exhausts the budget lands in the recrawl DLQ, not the delta
    keep = [content_changes(u, p2)
            and _failure_flags(p2, u)["fail_attempts"] < budget
            for u in pg["url"]]
    delta = pg.loc[keep, ["url", "host"]]
    write("crawl_recrawl_delta", delta.sort_values("url").reset_index(drop=True))

    # combined radius + price band + type around a point (api/main.py:93-142)
    from __ray_entry__ import _SIMILAR_NEARBY as snp

    d = np.sqrt((pg["latitude"] - snp["lat"]) ** 2 + (pg["longitude"] - snp["lon"]) ** 2)
    sn = pg.loc[(d <= snp["radius"])
                & pg["price"].between(snp["min_price"], snp["max_price"])
                & pg["property_type"].isin(snp["types"]),
                ["url", "title", "price", "latitude", "longitude",
                 "property_type", "city"]].copy()
    sn = (sn.sort_values("url", kind="mergesort")
          .iloc[snp["offset"]:snp["offset"] + snp["limit"]])
    sn["price"] = sn["price"].astype("int64")
    write("crawl_similar_nearby", sn.reset_index(drop=True))

    loc = pg.groupby("city", as_index=False).agg(
        n=("latitude", "size"), slat=("latitude", "sum"), slon=("longitude", "sum"))
    loc["avg_latitude"] = (loc["slat"] / loc["n"]).round(4)
    loc["avg_longitude"] = (loc["slon"] / loc["n"]).round(4)
    loc["n"] = loc["n"].astype(np.int64)
    write("crawl_city_locations",
          loc[["city", "n", "avg_latitude", "avg_longitude"]]
          .sort_values("city").reset_index(drop=True))

    return o, params


# ---------------------------------------------------------------------------
# Image goldens (decode + feature + brute-force phash dups, plain loops)
# ---------------------------------------------------------------------------

def image_goldens(o, params):
    from crawler_ray.imaging import decode_png
    from crawler_ray.pipelines.multimodal import _block_mean

    rows = []
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        gray = rgb.astype(np.float64).mean(axis=2)
        feat = _block_mean(gray, 8, 8).ravel()
        norm = np.linalg.norm(feat)
        feat32 = (feat / norm if norm else feat).astype(np.float32)
        rows.append(dict(image_id=r["image_id"], w=np.int32(r["w"]), h=np.int32(r["h"]),
                         fmt=r["fmt"], phash=np.int64(r["phash"]),
                         feat_norm=round(float(np.linalg.norm(feat32.astype(np.float64))), 4)))
    feats = pd.DataFrame(rows)
    write("image_features", feats)

    uniq = feats.drop_duplicates("image_id")
    ids = uniq["image_id"].to_numpy()
    ph = uniq["phash"].to_numpy(np.int64).view(np.uint64)
    pairs = []
    for i in range(len(ids)):
        x = ph[i] ^ ph[i + 1:]
        ham = np.zeros(len(x), np.int32)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int32)
            x >>= np.uint64(1)
            if not x.any():
                break
        for j in np.nonzero(ham <= 6)[0]:
            a, b = sorted((ids[i], ids[i + 1 + j]))
            pairs.append((a, b, np.int32(ham[j])))
    dups = pd.DataFrame(sorted(set(pairs)), columns=["image_a", "image_b", "hamming"])
    dups["hamming"] = dups["hamming"].astype(np.int32)
    write("image_phash_dups", dups)

    # resolution/aspect gate: straight per-row loop over the oracle store
    gstats: dict[str, list[int]] = {}
    for r in o["store"]:
        w, h = int(r["w"]), int(r["h"])
        lo, hi = min(w, h), max(w, h)
        small = 1 if lo < 64 else 0
        aspect = 1 if hi > 3 * lo else 0
        s = gstats.setdefault(r["fmt"], [0, 0, 0, 0])
        s[0] += 1
        s[1] += 1 if (small == 0 and aspect == 0) else 0
        s[2] += small
        s[3] += aspect
    gq = pd.DataFrame(
        [(f, *v) for f, v in sorted(gstats.items())],
        columns=["fmt", "n_images", "n_pass", "n_fail_small", "n_fail_aspect"])
    for c in gq.columns[1:]:
        gq[c] = gq[c].astype(np.int64)
    write("image_quality_gate", gq)

    # multimodal composite golden: gate → caption gate → union-find over
    # brute-force pairs among SURVIVORS → keep-best → mixed-phash shard
    # rollup — a straight-line replication of _image_corpus_build's chain
    MASK64 = (1 << 64) - 1

    def mix64i(x: int) -> int:
        x &= MASK64
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & MASK64
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & MASK64
        x ^= x >> 33
        return x

    surv = []
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        w, h = int(r["w"]), int(r["h"])
        lo2, hi2 = min(w, h), max(w, h)
        cap = r["caption"]
        nw = 0 if cap == "" else cap.count(" ") + 1
        if lo2 >= 64 and hi2 <= 3 * lo2 and nw >= 3:
            surv.append((r, nw))
    sids = [r["image_id"] for r, _ in surv]
    sph = np.array([int(r["phash"]) for r, _ in surv], np.int64).view(np.uint64)
    spairs = []
    for i in range(len(sids)):
        for j in range(i + 1, len(sids)):
            x = int(sph[i] ^ sph[j])
            hamm = bin(x).count("1")
            if hamm <= 6:
                spairs.append((sids[i], sids[j]))
    par2: dict = {}

    def find2(x):
        while par2.setdefault(x, x) != x:
            par2[x] = par2[par2[x]]
            x = par2[x]
        return x

    for a, b in spairs:
        ra, rb = find2(a), find2(b)
        if ra != rb:
            par2[max(ra, rb)] = min(ra, rb)
    comp2: dict = {}
    for x in par2:
        comp2.setdefault(find2(x), []).append(x)
    sdims = {r["image_id"]: (int(r["w"]), int(r["h"])) for r, _ in surv}
    losers: set = set()
    for members in comp2.values():
        ranked = sorted(members, key=lambda m: (-sdims[m][0] * sdims[m][1], m))
        losers.update(ranked[1:])
    roll: dict[int, list[int]] = {}
    for r, nw in surv:
        if r["image_id"] in losers:
            continue
        s = mix64i(int(r["phash"]) & MASK64) % 8
        e2 = roll.setdefault(s, [0, 0])
        e2[0] += 1
        e2[1] += nw
    cb = pd.DataFrame([(s, v[0], v[1]) for s, v in sorted(roll.items())],
                      columns=["shard", "n_pairs", "sum_caption_tokens"])
    for c in cb.columns:
        cb[c] = cb[c].astype(np.int64)
    write("image_corpus_build", cb)

    # image dup clusters: classic path-compressed union-find loop over the
    # brute-force pair list above (independent of the engine's min-label
    # propagation); rep = lexicographic-min image_id per component
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in sorted(set(pairs)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for x in parent:
        comps.setdefault(find(x), []).append(x)
    crows = []
    for members in comps.values():
        rep = min(members)
        for m in members:
            crows.append((m, rep, np.int64(len(members))))
    cl = pd.DataFrame(sorted(crows),
                      columns=["image_id", "rep_image", "cluster_size"])
    cl["cluster_size"] = cl["cluster_size"].astype(np.int64)
    write("image_dup_clusters", cl)

    # keep-best policy: per component, keep max w*h then min image_id —
    # straight-line loop over the same union-find components
    dims = {r.image_id: (int(r.w), int(r.h)) for r in uniq.itertuples(index=False)}
    krows = []
    for members in comps.values():
        rep = min(members)
        ranked = sorted(members,
                        key=lambda m: (-dims[m][0] * dims[m][1], m))
        kept = ranked[0]
        krows.append((rep, kept, np.int64(dims[kept][0] * dims[kept][1]),
                      np.int64(len(members) - 1)))
    kb = pd.DataFrame(sorted(krows),
                      columns=["rep_image", "kept_image", "kept_pixels",
                               "n_dropped"])
    for c in ("kept_pixels", "n_dropped"):
        kb[c] = kb[c].astype(np.int64)
    write("image_dedup_keep_best", kb)

    # cross-corpus increment dedup: xxh64(id)%2 splits ref(0)/new(1);
    # straight-line double loop over new×ref pairs only
    sides = {i: int(xxh64(str(i)) % 2) for i in ids}
    cross = []
    for i in range(len(ids)):
        if sides[ids[i]] != 1:
            continue
        for j in range(len(ids)):
            if sides[ids[j]] != 0:
                continue
            x = np.uint64(int(ph[i]) ^ int(ph[j]))
            ham = 0
            while x:
                ham += int(x & np.uint64(1))
                x >>= np.uint64(1)
            if ham <= 6:
                cross.append((ids[i], ids[j], np.int32(ham)))
    xdf = pd.DataFrame(sorted(set(cross)), columns=["new_id", "ref_id", "hamming"])
    xdf["hamming"] = xdf["hamming"].astype(np.int32)
    write("image_increment_dups", xdf)

    # feature-cosine near-dups: straight-line all-pairs over the SAME
    # loop-computed feature vectors (engine: tile-grid + keyed joins)
    from crawler_ray.pipelines.multimodal import FEATURE_NEAR_DUP_THRESHOLD

    fmat = []
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        gray = rgb.astype(np.float64).mean(axis=2)
        feat = _block_mean(gray, 8, 8).ravel()
        norm = np.linalg.norm(feat)
        fmat.append((feat / norm if norm else feat).astype(np.float32))
    fids = [r["image_id"] for r in sorted(o["store"], key=lambda r: r["image_id"])]
    seen_ids = set()
    uidx = [i for i, x in enumerate(fids) if not (x in seen_ids or seen_ids.add(x))]
    frows = []
    for ii in range(len(uidx)):
        for jj in range(ii + 1, len(uidx)):
            va = fmat[uidx[ii]].astype(np.float64)
            vb = fmat[uidx[jj]].astype(np.float64)
            na, nb = np.linalg.norm(va), np.linalg.norm(vb)
            sim = float(np.dot(va / na if na else va, vb / nb if nb else vb))
            if sim >= FEATURE_NEAR_DUP_THRESHOLD:
                a, b = sorted((fids[uidx[ii]], fids[uidx[jj]]))
                frows.append(dict(image_a=a, image_b=b, sim=round(sim, 6)))
    fdups = pd.DataFrame(sorted(frows, key=lambda d: (d["image_a"], d["image_b"])),
                         columns=["image_a", "image_b", "sim"])
    if len(fdups) == 0:
        fdups = pd.DataFrame({"image_a": pd.Series([], dtype=str),
                              "image_b": pd.Series([], dtype=str),
                              "sim": pd.Series([], dtype=np.float64)})
    write("image_feature_near_dups", fdups)

    # thumbnails: naive independent box resize (explicit per-block loops;
    # the block sums are exact integers in float64, so this matches the
    # engine's integral-image formulation bit-for-bit) + the shared
    # codec/phash kernels
    from crawler_ray.imaging import phash64

    th_rows = []
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        h, w = rgb.shape[:2]
        scale = 32 / max(h, w)
        if scale >= 1.0:
            th, tw, thumb = h, w, rgb
        else:
            th, tw = max(8, round(h * scale)), max(8, round(w * scale))
            thumb = np.zeros((th, tw, 3), np.uint8)
            for i in range(th):
                y0, y1 = (i * h) // th, ((i + 1) * h) // th
                for j in range(tw):
                    x0, x1 = (j * w) // tw, ((j + 1) * w) // tw
                    for c in range(3):
                        thumb[i, j, c] = np.uint8(np.clip(np.rint(
                            rgb[y0:y1, x0:x1, c].astype(np.float64).mean()), 0, 255))
        th_rows.append(dict(image_id=r["image_id"], w=np.int32(tw), h=np.int32(th),
                            phash=np.int64(phash64(thumb))))
    write("image_thumbnails", pd.DataFrame(th_rows))

    # ANN top-5 golden: same unique-image set and hash probe rule as the
    # engine, one independent float64 all-pairs pass (per-probe GEMV vs
    # the engine's batched GEMM partials — only ID order is compared, and
    # ties happen only between identical vectors, which tie identically)
    u_ids = [fids[i] for i in uidx]
    u_mat = np.stack([fmat[i].astype(np.float64) for i in uidx])
    norms = np.linalg.norm(u_mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    u_mat = u_mat / norms
    h = np.array([xxh64(s) for s in u_ids], np.uint64)
    probe_mask = h % np.uint64(23) == 0
    vids = h.view(np.int64)
    t_idx = np.nonzero(~probe_mask)[0]
    ann_rows = []
    for qi in np.nonzero(probe_mask)[0]:
        sims = u_mat[t_idx] @ u_mat[qi]
        order = np.lexsort((vids[t_idx], -sims))[: min(5, len(t_idx))]
        for oi in order:
            ann_rows.append((u_ids[qi], u_ids[t_idx[oi]]))
    ann_rows.sort()
    write("image_ann_topk",
          pd.DataFrame(ann_rows, columns=["probe_id", "match_id"]))

    # cross-modal city rollup: loop join store → pages via src_url
    url_city = {p["url"]: p["city"] for p in o["pages"]}
    cagg: dict = {}
    for r in o["store"]:
        a = cagg.setdefault(url_city[r["src_url"]], [0, 0, set()])
        a[0] += 1
        a[1] += int(r["w"]) * int(r["h"])
        a[2].add(int(r["phash"]))
    city_rows = [dict(city=c, n_images=np.int64(v[0]),
                      n_distinct_phash=np.int64(len(v[2])),
                      avg_pixels=np.int64(v[1] // v[0]))
                 for c, v in sorted(cagg.items())]
    write("city_image_stats", pd.DataFrame(city_rows))


# ---------------------------------------------------------------------------
# Round-5 image goldens: patch-token accounting, aspect bucketing,
# caption↔image alignment — straight per-row loops over the oracle store
# ---------------------------------------------------------------------------

def image_r5_goldens(o, params):
    import math

    from crawler_ray.imaging import decode_png
    from crawler_ray.pipelines.multimodal import (
        ASPECT_BUCKETS,
        CAP_DIM,
        MAX_PATCH_TOKENS,
        VIT_PATCH,
        _block_mean,
    )
    from __ray_entry__ import ALIGN_MIN_Q

    # patch tokens per fmt: plain math.ceil loop
    pt: dict[str, list[int]] = {}
    for r in o["store"]:
        tok = math.ceil(int(r["w"]) / VIT_PATCH) * math.ceil(int(r["h"]) / VIT_PATCH)
        s = pt.setdefault(r["fmt"], [0, 0, 0, 0])
        s[0] += 1
        s[1] += tok
        s[2] = max(s[2], tok)
        s[3] += 1 if tok > MAX_PATCH_TOKENS else 0
    write("image_patch_tokens", pd.DataFrame(
        [dict(fmt=f, n_images=np.int64(v[0]), total_tokens=np.int64(v[1]),
              max_tokens=np.int64(v[2]), n_over_budget=np.int64(v[3]))
         for f, v in sorted(pt.items())]))

    # aspect buckets: per-row float-log argmin over the bucket table (the
    # engine's integer geometric-mean rule must agree; exact rational ties
    # are impossible for the fixture's small w/h — asserted in tests)
    ba: dict[int, list[int]] = {}
    for r in o["store"]:
        w, h = int(r["w"]), int(r["h"])
        la = math.log(w / h)
        dists = [abs(la - math.log(bw / bh)) for bw, bh in ASPECT_BUCKETS]
        b = dists.index(min(dists))
        s = ba.setdefault(b, [0, 0])
        s[0] += 1
        s[1] += w * h
    write("image_aspect_buckets", pd.DataFrame(
        [dict(bucket_w=np.int64(ASPECT_BUCKETS[b][0]),
              bucket_h=np.int64(ASPECT_BUCKETS[b][1]),
              n_images=np.int64(v[0]), total_pixels=np.int64(v[1]))
         for b, v in sorted(ba.items())]))

    # caption alignment: per-row decode + block-mean embed (shared kernels,
    # same standard as image_features) with a per-token Python loop for the
    # text tower; both towers floor-quantized to the TOWER_Q grid and the
    # score taken as a python-int dot (the engine's integer-exact rule),
    # then a dict rollup per host
    from crawler_ray.pipelines.multimodal import TOWER_Q

    al: dict[str, list[int]] = {}
    for r in o["store"]:
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        gray = rgb.astype(np.float64).mean(axis=2)
        feat = _block_mean(gray, 8, 8).ravel()
        norm = np.linalg.norm(feat)
        feat = (feat / norm if norm else feat).astype(np.float32).astype(np.float64)
        vec = np.zeros(CAP_DIM, np.float64)
        for tok in r["caption"].split():
            vec[int(xxh64(tok) % CAP_DIM)] += 1.0
        vnorm = np.linalg.norm(vec)
        if vnorm:
            vec /= vnorm
        fq = [int(math.floor(feat[d] * TOWER_Q)) for d in range(CAP_DIM)]
        cq = [int(math.floor(vec[d] * TOWER_Q)) for d in range(CAP_DIM)]
        q = sum(a * b for a, b in zip(fq, cq))
        s = al.setdefault(r["host"], [0, 0, 0])
        s[0] += 1
        s[1] += 1 if q >= ALIGN_MIN_Q else 0
        s[2] += q
    write("image_caption_align", pd.DataFrame(
        [dict(host=hst, n_images=np.int64(v[0]), n_pass=np.int64(v[1]),
              avg_align_q=np.int64(v[2] // v[0]))
         for hst, v in sorted(al.items())]))

    # bucket assignment shared by the next two goldens: independent
    # float-log argmin per row (vs the engine's integer rule)
    def bucket_of(w: int, h: int) -> int:
        la = math.log(w / h)
        dists = [abs(la - math.log(bw / bh)) for bw, bh in ASPECT_BUCKETS]
        return dists.index(min(dists))

    # bucketed batch packing: per bucket in image_id order, a plain
    # running-sum loop with batch = floor(tokens_before / budget)
    from __ray_entry__ import IMG_BATCH_TOKEN_BUDGET

    run_tok: dict[int, int] = {}
    prows = []
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        w, h = int(r["w"]), int(r["h"])
        b = bucket_of(w, h)
        tok = math.ceil(w / VIT_PATCH) * math.ceil(h / VIT_PATCH)
        before = run_tok.get(b, 0)
        run_tok[b] = before + tok
        prows.append(dict(image_id=r["image_id"],
                          bucket_w=np.int64(ASPECT_BUCKETS[b][0]),
                          bucket_h=np.int64(ASPECT_BUCKETS[b][1]),
                          n_tokens=np.int64(tok),
                          batch_idx=np.int64(before // IMG_BATCH_TOKEN_BUDGET)))
    write("image_batch_packing", pd.DataFrame(prows))

    # bucket-target resize: per-row decode → box resize → encode → digest
    # (shared codec/resize kernels; the rollup loop is the independent part)
    from crawler_ray.imaging import encode_png
    from crawler_ray.pipelines.multimodal import BUCKET_SCALE_DIV, resize_rgb

    rz: dict[tuple, list[int]] = {}
    for r in o["store"]:
        w, h = int(r["w"]), int(r["h"])
        b = bucket_of(w, h)
        tw = ASPECT_BUCKETS[b][0] // BUCKET_SCALE_DIV
        th = ASPECT_BUCKETS[b][1] // BUCKET_SCALE_DIV
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        data = encode_png(resize_rgb(rgb, th, tw))
        key = (ASPECT_BUCKETS[b][0], ASPECT_BUCKETS[b][1], tw, th)
        s = rz.setdefault(key, [0, 0])
        s[0] += 1
        s[1] += int(xxh64(data) % 2**31)
    write("image_bucket_resize", pd.DataFrame(
        [dict(bucket_w=np.int64(k[0]), bucket_h=np.int64(k[1]),
              out_w=np.int64(k[2]), out_h=np.int64(k[3]),
              n_images=np.int64(v[0]), digest_sum=np.int64(v[1]))
         for k, v in sorted(rz.items())]))

    # per-channel normalization constants: plain per-row/py-int loop
    n_px = 0
    sx = [0, 0, 0]
    sx2 = [0, 0, 0]
    for r in o["store"]:
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        n_px += rgb.shape[0] * rgb.shape[1]
        for c in range(3):
            ch = rgb[:, :, c].astype(np.int64)
            sx[c] += int(ch.sum())
            sx2[c] += int((ch * ch).sum())
    write("image_channel_stats", pd.DataFrame(
        [dict(channel=name, n_pixels=np.int64(n_px),
              mean_ppm=np.int64((sx[c] * 10**6) // n_px),
              var_ppm=np.int64(((n_px * sx2[c] - sx[c] ** 2) * 10**6)
                               // (n_px * n_px)))
         for c, name in enumerate("rgb")]))

    # deterministic epoch-shuffle order: scalar-int murmur mix + plain sort
    MASK64_ = (1 << 64) - 1

    def mix64s(x: int) -> int:
        x &= MASK64_
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & MASK64_
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & MASK64_
        x ^= x >> 33
        return x

    from __ray_entry__ import WDS_EPOCH

    keyed = [(mix64s(int(xxh64(r["image_id"])) ^ WDS_EPOCH) >> 1,
              r["image_id"]) for r in o["store"]]
    eorder = [dict(image_id=iid, shuffle_key=np.int64(k),
                   epoch_rank=np.int64(rank))
              for rank, (k, iid) in enumerate(sorted(keyed))]
    write("image_epoch_order", (pd.DataFrame(eorder)
                                .sort_values("image_id")
                                .reset_index(drop=True)))

    # caption retrieval recall@1: per-host nested loops over integer-
    # quantized tower vectors (scalar floor per dim; pairwise dot as a
    # python-int sum — no numpy GEMM anywhere on this side)
    from __ray_entry__ import TOWER_Q

    per_host: dict[str, list] = {}
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42))
        gray = rgb.astype(np.float64).mean(axis=2)
        feat = _block_mean(gray, 8, 8).ravel()
        nrm = np.linalg.norm(feat)
        feat = (feat / nrm if nrm else feat).astype(np.float32).astype(np.float64)
        vec = np.zeros(CAP_DIM, np.float64)
        for tok in r["caption"].split():
            vec[int(xxh64(tok) % CAP_DIM)] += 1.0
        vn = np.linalg.norm(vec)
        if vn:
            vec /= vn
        fq = [int(math.floor(feat[d] * TOWER_Q)) for d in range(CAP_DIM)]
        cq = [int(math.floor(vec[d] * TOWER_Q)) for d in range(CAP_DIM)]
        per_host.setdefault(r["host"], []).append((r["image_id"], fq, cq))
    rrows = []
    for hst in sorted(per_host):
        items = per_host[hst]
        hits = 0
        for iid, _, cq in items:
            best_score, best_id = None, None
            for jid, fq, _ in items:
                sc = sum(a * b for a, b in zip(cq, fq))
                if (best_score is None or sc > best_score
                        or (sc == best_score and jid < best_id)):
                    best_score, best_id = sc, jid
            hits += 1 if best_id == iid else 0
        rrows.append(dict(host=hst, n_images=np.int64(len(items)),
                          n_hit_at1=np.int64(hits),
                          hit_ppm=np.int64(hits * 10**6 // len(items))))
    write("caption_retrieval_eval", pd.DataFrame(rrows))


# ---------------------------------------------------------------------------
# Text goldens over the sf0.01 documents table
# ---------------------------------------------------------------------------

def text_goldens():
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text", "lang", "source"]).to_pandas()

    # --- MinHash-LSH pairs: straight-line banding + loop verify ----------
    bands = minhash_bands(df[["doc_id", "text"]])
    cand = collide_pairs(bands)
    sh = {int(d): shingle_hashes(str(t)) for d, t in zip(df["doc_id"], df["text"])}
    rows = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        j = jaccard(sh[int(a)], sh[int(b)])
        if j >= 0.5:
            rows.append((int(a), int(b), round(j, 6)))
    mh = pd.DataFrame(sorted(rows), columns=["doc_a", "doc_b", "jaccard"])
    mh["doc_a"] = mh["doc_a"].astype(np.int64)
    mh["doc_b"] = mh["doc_b"].astype(np.int64)
    write("minhash_near_dups", mh)

    cl = connected_components(mh[["doc_a", "doc_b"]]) if len(mh) else pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64), "cluster_id": pd.Series([], dtype=np.int64)})
    write("near_dup_clusters", cl)

    # --- SimHash pairs: BRUTE-FORCE all-pairs Hamming ≤ 3 (stronger than
    # banding — the 4×16 pigeonhole guarantee must recover exactly this) ---
    sh64 = simhash64(df[["doc_id", "text"]])
    ids = sh64["doc_id"].to_numpy(np.int64)
    hs = sh64["simhash"].to_numpy(np.int64).view(np.uint64)
    rows = []
    for i in range(len(ids)):
        x = hs[i] ^ hs[i + 1:]
        ham = np.zeros(len(x), np.int32)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int32)
            x >>= np.uint64(1)
            if not x.any():
                break
        for j in np.nonzero(ham <= 3)[0]:
            a, b = sorted((int(ids[i]), int(ids[i + 1 + j])))
            rows.append((a, b, np.int32(ham[j])))
    sm = pd.DataFrame(sorted(set(rows)), columns=["doc_a", "doc_b", "hamming"])
    sm["doc_a"] = sm["doc_a"].astype(np.int64)
    sm["doc_b"] = sm["doc_b"].astype(np.int64)
    sm["hamming"] = sm["hamming"].astype(np.int32)
    write("simhash_near_dups", sm)

    # --- language-ID confusion: the original per-document loop ----------
    from crawler_ray.functions.textops import _STOPWORDS, TOKEN_RE

    preds = []
    for t in df["text"]:
        t = str(t)
        n = len(t)
        cjk = sum(1 for c in t if "一" <= c <= "鿿")
        if n and cjk / n > 0.05:
            preds.append("zh")
            continue
        import re

        ws = re.findall(TOKEN_RE, t.lower())
        scores = {lang: sum(w in sw for w in ws) for lang, sw in _STOPWORDS.items()}
        best = max(sorted(scores), key=lambda k: scores[k])
        preds.append(best if scores[best] > 0 else "en")
    conf = (df.assign(lang_pred=preds).groupby(["lang", "lang_pred"], as_index=False)
            .size().rename(columns={"size": "cnt"}))
    conf["cnt"] = conf["cnt"].astype(np.int64)
    write("lang_id_confusion", conf.sort_values(["lang", "lang_pred"]).reset_index(drop=True))

    # --- fingerprints: per-document loop over token windows -------------
    import re

    fps = []
    for t in df["text"]:
        ws = re.findall(TOKEN_RE, str(t).lower())
        if not ws:
            fps.append(0)
            continue
        grams = [" ".join(ws[j:j + 8]) for j in range(max(1, len(ws) - 7))]
        fps.append(int(np.int64(np.uint64(min(xxh64(g) for g in grams)).astype(np.int64))))
    fp = df.assign(fingerprint=np.array(fps, np.int64))
    agg = fp.groupby("source", as_index=False).agg(n_docs=("fingerprint", "size"),
                                                   n_distinct=("fingerprint", "nunique"))
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg["n_distinct"] = agg["n_distinct"].astype(np.int64)
    write("doc_fingerprints", agg.sort_values("source").reset_index(drop=True))

    # --- HLL approx distinct: pure-python per-token register loop -------
    # (independent of the vectorized sketches.py kernel: int bit ops per
    # token, inline Flajolet-et-al estimator)
    import math

    P, Mreg = 12, 1 << 12
    regs_by_lang: dict = {}
    for t, lang in zip(df["text"], df["lang"]):
        if not isinstance(t, str):  # engine's .str path skips null text
            continue
        regs = regs_by_lang.setdefault(str(lang), [0] * Mreg)
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            h = xxh64(w)
            idx = h >> (64 - P)
            rest = (h << P) & ((1 << 64) - 1)
            rho = (64 - rest.bit_length() + 1) if rest else (64 - P + 1)
            if rho > regs[idx]:
                regs[idx] = rho
    rows = []
    for lang in sorted(regs_by_lang):
        regs = regs_by_lang[lang]
        alpha = 0.7213 / (1 + 1.079 / Mreg)
        est = alpha * Mreg * Mreg / sum(2.0 ** -r for r in regs)
        zeros = regs.count(0)
        if est <= 2.5 * Mreg and zeros > 0:
            est = Mreg * math.log(Mreg / zeros)
        rows.append({"lang": lang, "approx_distinct": np.int64(round(est))})
    adt = pd.DataFrame(rows, columns=["lang", "approx_distinct"])
    adt["approx_distinct"] = adt["approx_distinct"].astype(np.int64)
    write("approx_distinct_tokens", adt)


# ---------------------------------------------------------------------------
# ANN-LSH golden: straight numpy replication of the bucketing + probe search
# ---------------------------------------------------------------------------

def ann_ivf_golden():
    """Straight numpy replication of the IVF probe search (quantizer kernel
    shared, orchestration independent)."""
    from crawler_ray.functions.ann import kmeans_centroids

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    q = t[t["vec_id"] < 5].sort_values("vec_id")
    corpus = t[t["vec_id"] >= 5]
    qmat = np.stack([np.asarray(v, np.float64) for v in q["embedding"]])
    cmat = np.stack([np.asarray(v, np.float64) for v in corpus["embedding"]])

    def norml(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    centroids = kmeans_centroids(cmat[:4096], nlist=16, iters=10, seed=3)
    qn = norml(qmat)
    probe = set()
    for row in qn @ centroids.T:
        probe.update(int(j) for j in np.argsort(-row)[:4])
    assign = (norml(cmat) @ centroids.T).argmax(axis=1)
    keep = np.isin(assign, np.array(sorted(probe)))
    vids = corpus["vec_id"].to_numpy(np.int64)[keep]
    sims = norml(cmat[keep]) @ qn.T
    rows = []
    for j, qid in enumerate(q["vec_id"].to_numpy(np.int64)):
        col = sims[:, j]
        order = np.lexsort((vids, -col))[:10]
        for i in order:
            rows.append((int(qid), int(vids[i]), round(float(col[i]), 6)))
    out = pd.DataFrame(rows, columns=["qid", "vid", "sim"]).sort_values(
        ["qid", "vid"]).reset_index(drop=True)
    out["qid"] = out["qid"].astype(np.int64)
    out["vid"] = out["vid"].astype(np.int64)
    write("ann_ivf_topk", out)


def ann_golden():
    from crawler_ray.functions.ann import hyperplanes, lsh_signature

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    q = t[t["vec_id"] < 5].sort_values("vec_id")
    corpus = t[t["vec_id"] >= 5]
    qmat = np.stack([np.asarray(v, np.float64) for v in q["embedding"]])
    cmat = np.stack([np.asarray(v, np.float64) for v in corpus["embedding"]])
    planes = hyperplanes(qmat.shape[1], bits=10, seed=11)
    qsig = lsh_signature(qmat, planes)
    probe = set()
    for s in qsig:
        probe.add(int(s))
        for b in range(10):
            probe.add(int(s) ^ (1 << b))
    csig = lsh_signature(cmat, planes)
    keep = np.isin(csig, np.array(sorted(probe), np.int64))
    vids = corpus["vec_id"].to_numpy(np.int64)[keep]
    cm = cmat[keep]

    def norml(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    sims = norml(cm) @ norml(qmat).T
    rows = []
    for j, qid in enumerate(q["vec_id"].to_numpy(np.int64)):
        col = sims[:, j]
        order = np.lexsort((vids, -col))[:10]
        for i in order:
            rows.append((int(qid), int(vids[i]), round(float(col[i]), 6)))
    out = pd.DataFrame(rows, columns=["qid", "vid", "sim"]).sort_values(
        ["qid", "vid"]).reset_index(drop=True)
    out["qid"] = out["qid"].astype(np.int64)
    out["vid"] = out["vid"].astype(np.int64)
    write("ann_lsh_topk", out)


def pq_golden(m_sub: int = 8, ksub: int = 256, iters: int = 10,
              scale: int = 10**6, train_max_vid: int = 261):
    """ann_pq_topk golden: straight-line per-row PQ — loop Lloyd per
    subspace on the vec_id∈[5,train_max_vid) sample, loop-encode every
    corpus vector, loop-ADC each (query, vector) score. All-integer, so
    it must equal the distributed engine bit-for-bit."""
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    def to_grid(v):
        x = np.asarray(v, np.float64)
        nrm = np.linalg.norm(x)
        if nrm:
            x = x / nrm
        return np.rint(x * scale).astype(np.int64)

    grid = {int(r.vec_id): to_grid(r.embedding)
            for r in t.itertuples(index=False)}
    qids = [v for v in sorted(grid) if v < 5]
    cids = [v for v in sorted(grid) if v >= 5]
    tids = [v for v in cids if v < train_max_vid]
    d = len(grid[qids[0]])
    # the subspace partitioning is a shared PARAMETER of the scheme (like k
    # or scale), not part of the algorithm under test
    bnd = list(np.linspace(0, d, m_sub + 1).astype(int))
    books = []
    for m in range(m_sub):
        xs = [grid[v][bnd[m]:bnd[m + 1]] for v in tids]
        k = min(ksub, len(xs))
        cent = [xs[i].copy() for i in range(k)]
        for _ in range(iters):
            sums = [np.zeros_like(cent[0]) for _ in range(k)]
            cnts = [0] * k
            for x in xs:
                best, bd = 0, None
                for j in range(k):
                    dd = int(((x - cent[j]) ** 2).sum())
                    if bd is None or dd < bd:
                        best, bd = j, dd
                sums[best] += x
                cnts[best] += 1
            cent = [cent[j] if cnts[j] == 0 else sums[j] // cnts[j]
                    for j in range(k)]
        books.append(cent)
    codes = {}
    for v in cids:
        cv = []
        for m in range(m_sub):
            x = grid[v][bnd[m]:bnd[m + 1]]
            best, bd = 0, None
            for j, c in enumerate(books[m]):
                dd = int(((x - c) ** 2).sum())
                if bd is None or dd < bd:
                    best, bd = j, dd
            cv.append(best)
        codes[v] = cv
    rows = []
    for q in qids:
        scored = []
        for v in cids:
            s = 0
            for m in range(m_sub):
                qs = grid[q][bnd[m]:bnd[m + 1]]
                s += int(qs @ books[m][codes[v][m]])
            scored.append((v, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for v, s in scored[:10]:
            rows.append((q, v, s))
    out = pd.DataFrame(rows, columns=["qid", "vid", "score"]).sort_values(
        ["qid", "vid"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    write("ann_pq_topk", out)

    # two-stage rerank golden: ADC top-100 per query (same loop scores) →
    # exact cosine over the candidate UNION, float64 with vid tiebreak
    cand_union: set = set()
    for q in qids:
        scored = []
        for v in cids:
            s = 0
            for m in range(m_sub):
                qs = grid[q][bnd[m]:bnd[m + 1]]
                s += int(qs @ books[m][codes[v][m]])
            scored.append((v, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        cand_union.update(v for v, _ in scored[:100])
    raw = {int(r.vec_id): np.asarray(r.embedding, np.float64)
           for r in t.itertuples(index=False)}

    def unit(x):
        n = np.linalg.norm(x)
        return x / n if n else x

    rrows = []
    cands = sorted(cand_union)
    for q in qids:
        qv = unit(raw[q])
        sims = sorted(((v, float(unit(raw[v]) @ qv)) for v in cands),
                      key=lambda t: (-t[1], t[0]))[:10]
        for v, s in sims:
            rrows.append((q, v, round(s, 6)))
    rr = pd.DataFrame(rrows, columns=["qid", "vid", "sim"]).sort_values(
        ["qid", "vid"]).reset_index(drop=True)
    rr["qid"] = rr["qid"].astype(np.int64)
    rr["vid"] = rr["vid"].astype(np.int64)
    write("ann_pq_rerank_topk", rr)


def kmeans_golden(k: int = 8, n_iters: int = 5, scale: int = 10**6):
    """kmeans_embeddings golden: a per-row Python loop over the quantized
    grid — integer distances and floor-of-mean centroids are exact, so this
    independent formulation must equal the distributed engine BIT-FOR-BIT
    (the whole point of the integer-state design)."""
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    xq = [np.rint(np.asarray(v, np.float64) * scale).astype(np.int64)
          for v in t["embedding"]]
    cent = [xq[i].copy() for i in range(k)]  # k smallest vec_ids
    counts = [1] * k
    for _ in range(n_iters):
        sums = [np.zeros_like(cent[0]) for _ in range(k)]
        counts = [0] * k
        for x in xq:
            best, bd = 0, None
            for j in range(k):
                d = int(((x - cent[j]) ** 2).sum())
                if bd is None or d < bd:  # strict < ⇒ ties keep lowest j
                    best, bd = j, d
            sums[best] += x
            counts[best] += 1
        cent = [cent[j] if counts[j] == 0 else sums[j] // counts[j]
                for j in range(k)]
    out = pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n_members": np.asarray(counts, np.int64),
        "centroid_norm2": np.asarray([int((c.astype(object) ** 2).sum())
                                      for c in cent], np.int64),
    })
    write("kmeans_embeddings", out)

    # SemDeDup golden: assign with the final loop centroids (strict < ⇒
    # ties to lowest cluster, same rule), then per-cluster per-pair dots —
    # a vector is dropped when a same-cluster neighbour with a smaller
    # vec_id sits at cosine ≥ 0.45; partner = the smallest such id
    tau = 0.45
    ids = t["vec_id"].to_numpy(np.int64)
    fv = [np.asarray(v, np.float64) for v in t["embedding"]]
    members: dict = {}
    for i, x in enumerate(xq):
        best, bd = 0, None
        for j in range(k):
            d = int(((x - cent[j]) ** 2).sum())
            if bd is None or d < bd:
                best, bd = j, d
        members.setdefault(best, []).append(i)
    rows = []
    for cid in sorted(members):
        idx = sorted(members[cid], key=lambda i: ids[i])
        for a_pos in range(len(idx)):
            for b_pos in range(a_pos):
                va, vb = fv[idx[b_pos]], fv[idx[a_pos]]
                na, nb = np.linalg.norm(va), np.linalg.norm(vb)
                sim = float(np.dot(va / na if na else va, vb / nb if nb else vb))
                if sim >= tau:
                    rows.append(dict(vec_id=np.int64(ids[idx[a_pos]]),
                                     cluster=np.int64(cid),
                                     dup_of=np.int64(ids[idx[b_pos]]),
                                     sim=round(sim, 6)))
                    break  # idx scanned in ascending id order ⇒ first hit = min id
    sd = pd.DataFrame(rows, columns=["vec_id", "cluster", "dup_of", "sim"])
    if len(sd) == 0:
        sd = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                           "cluster": pd.Series([], dtype=np.int64),
                           "dup_of": pd.Series([], dtype=np.int64),
                           "sim": pd.Series([], dtype=np.float64)})
    write("semantic_dedup", sd.sort_values("vec_id").reset_index(drop=True))


def export_golden(o):
    """training_shards golden: pure-python loop over the oracle store —
    shard assignment (murmur64 finalizer on phash), per-shard first-wins
    phash dedup (min image_id), and a row-by-row replication of
    lance_layout's content digest (column-ordered xor-mul fold, xor-reduced
    over rows; `bytes` is binary ⇒ excluded on both sides)."""
    MASK = (1 << 64) - 1
    MIX = 0x9E3779B185EBCA87

    def mix64(x: int) -> int:
        x &= MASK
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & MASK
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & MASK
        x ^= x >> 33
        return x

    n_shards = 8
    by_shard: dict[int, dict[int, dict]] = {}
    raw_counts: dict[int, int] = {}
    for r in o["store"]:
        ph = int(r["phash"]) & MASK
        s = mix64(ph) % n_shards
        raw_counts[s] = raw_counts.get(s, 0) + 1
        best = by_shard.setdefault(s, {})
        if ph not in best or r["image_id"] < best[ph]["image_id"]:
            best[ph] = r
    rows = []
    for s in range(n_shards):  # empty shards still appear (zero rows)
        kept = sorted(by_shard.get(s, {}).values(), key=lambda r: r["image_id"])
        digest = 0
        for r in kept:
            h = 0
            for v in (xxh64(r["image_id"]), int(r["w"]), int(r["h"]),
                      xxh64(r["fmt"]), xxh64(r["caption"]), int(r["phash"]) & MASK):
                h = ((h ^ (v & MASK)) * MIX) & MASK
            digest ^= h
        digest ^= len(kept)
        rows.append({"shard": np.int64(s), "n_pairs": np.int64(len(kept)),
                     "n_dups_dropped": np.int64(raw_counts.get(s, 0) - len(kept)),
                     "digest": f"{digest:016x}"})
    out = pd.DataFrame(rows, columns=["shard", "n_pairs", "n_dups_dropped", "digest"])
    for c in ("shard", "n_pairs", "n_dups_dropped"):
        out[c] = out[c].astype(np.int64)
    write("training_shards", out.sort_values("shard").reset_index(drop=True))

    # jsonl sidecar: canonical stdlib-json lines over the same kept rows,
    # digest = xxh64 of the exact file bytes (independent per-row loop)
    import json as _json
    jrows = []
    for s in range(n_shards):
        kept = sorted(by_shard.get(s, {}).values(), key=lambda r: r["image_id"])
        payload = "".join(
            _json.dumps({"caption": r["caption"], "fmt": r["fmt"],
                         "h": int(r["h"]), "image_id": r["image_id"],
                         "phash": int(r["phash"]),
                         "w": int(r["w"])},
                        sort_keys=True, separators=(",", ":"),
                        ensure_ascii=True) + "\n"
            for r in kept).encode("utf-8")
        jrows.append({"shard": np.int64(s), "n_rows": np.int64(len(kept)),
                      "digest": f"{xxh64(payload):016x}"})
    jout = pd.DataFrame(jrows, columns=["shard", "n_rows", "digest"])
    for c in ("shard", "n_rows"):
        jout[c] = jout[c].astype(np.int64)
    write("training_shards_jsonl", jout.sort_values("shard").reset_index(drop=True))

    # WebDataset tar shards: the golden archives are written with STDLIB
    # tarfile (USTAR format, zeroed metadata) — the engine writes its own
    # spec-implemented ustar (sources/wds_tar.py), so the two meet only at
    # the published format; digest = xxh64 of the exact archive bytes.
    # Each shard's bytes are built ONCE here and reused by the sample-index
    # golden below (one source of truth — the two cannot drift).
    import io as _io
    import tarfile as _tarfile

    def _stdlib_shard_tar(kept) -> bytes:
        buf = _io.BytesIO()
        with _tarfile.open(fileobj=buf, mode="w",
                           format=_tarfile.USTAR_FORMAT) as tf:
            for r in kept:
                png = image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42)
                meta = _json.dumps(
                    {"caption": r["caption"], "fmt": r["fmt"],
                     "h": int(r["h"]), "image_id": r["image_id"],
                     "phash": int(r["phash"]), "w": int(r["w"])},
                    sort_keys=True, separators=(",", ":"),
                    ensure_ascii=True).encode("utf-8")
                for name, data in ((f"{r['image_id']}.png", png),
                                   (f"{r['image_id']}.json", meta)):
                    ti = _tarfile.TarInfo(name)
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    ti.mode = 0o644
                    tf.addfile(ti, _io.BytesIO(data))
        return buf.getvalue()

    shard_tars = {
        s: _stdlib_shard_tar(sorted(by_shard.get(s, {}).values(),
                                    key=lambda r: r["image_id"]))
        for s in range(n_shards)}
    wrows = [{"shard": np.int64(s),
              "n_samples": np.int64(len(by_shard.get(s, {}))),
              "digest": f"{xxh64(shard_tars[s]):016x}"}
             for s in range(n_shards)]
    wout = pd.DataFrame(wrows, columns=["shard", "n_samples", "digest"])
    for c in ("shard", "n_samples"):
        wout[c] = wout[c].astype(np.int64)
    write("training_shards_wds", wout.sort_values("shard").reset_index(drop=True))

    # csv sidecar: stdlib csv.writer over the same kept rows (the engine
    # implements RFC 4180 quoting itself — the two meet only at the format)
    import csv as _csv
    import io as _io2

    crows = []
    for s in range(n_shards):
        kept = sorted(by_shard.get(s, {}).values(), key=lambda r: r["image_id"])
        sio = _io2.StringIO()
        wcsv = _csv.writer(sio, lineterminator="\n")
        wcsv.writerow(["image_id", "w", "h", "fmt", "phash", "caption"])
        for r in kept:
            wcsv.writerow([r["image_id"], int(r["w"]), int(r["h"]),
                           r["fmt"], int(r["phash"]), r["caption"]])
        payload = sio.getvalue().encode("utf-8")
        crows.append({"shard": np.int64(s), "n_rows": np.int64(len(kept)),
                      "digest": f"{xxh64(payload):016x}"})
    cout = pd.DataFrame(crows, columns=["shard", "n_rows", "digest"])
    for c in ("shard", "n_rows"):
        cout[c] = cout[c].astype(np.int64)
    write("training_shards_csv", cout.sort_values("shard").reset_index(drop=True))

    # random-access sample index: read the SAME stdlib-built shard bytes
    # back with stdlib tarfile (offset_data / size) — engine-independent
    # byte offsets from the one-source-of-truth archives above
    irows = []
    for s in range(n_shards):
        with _tarfile.open(fileobj=_io.BytesIO(shard_tars[s])) as tf:
            for ti in tf.getmembers():
                if ti.name.endswith(".png"):
                    irows.append(dict(image_id=ti.name[:-4], shard=np.int64(s),
                                      byte_offset=np.int64(ti.offset_data),
                                      n_bytes=np.int64(ti.size)))
    iout = pd.DataFrame(irows, columns=["image_id", "shard",
                                        "byte_offset", "n_bytes"])
    for c in ("shard", "byte_offset", "n_bytes"):
        iout[c] = iout[c].astype(np.int64)
    write("wds_sample_index",
          iout.sort_values("image_id").reset_index(drop=True))


def audio_golden():
    """Independent audio decoder: the STDLIB `wave` module parses the same
    WAV payloads the engine's numpy chunk-walker decodes; features are the
    published formulas in a per-clip loop."""
    import io
    import wave

    from crawler_ray.sources.synthetic_media import audio_wav_bytes

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = np.sort(docs["doc_id"].to_numpy(np.int64))
    ids = ids[ids % 23 == 3]
    rows = []
    for i in ids:
        data = audio_wav_bytes(f"a{i}", 42)
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
            sr, n = w.getframerate(), w.getnframes()
            x = np.frombuffer(w.readframes(n), np.int16)
        f = x.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(f * f))) if n else 0.0
        zcr = float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1]))) if n > 1 else 0.0
        dom = float(np.argmax(np.abs(np.fft.rfft(f))) * sr / n) if n > 1 else 0.0
        rows.append({"audio_id": f"a{i}", "sample_rate": sr, "n_samples": n,
                     "duration_s": round(n / sr, 6), "rms": round(rms, 6),
                     "zcr": round(zcr, 6), "dominant_hz": round(dom, 3)})
    schema = pa.schema([("audio_id", pa.string()), ("sample_rate", pa.int32()),
                        ("n_samples", pa.int64()), ("duration_s", pa.float64()),
                        ("rms", pa.float64()), ("zcr", pa.float64()),
                        ("dominant_hz", pa.float64())])
    df = pd.DataFrame(rows).sort_values("audio_id").reset_index(drop=True)
    write("audio_clip_features", df, schema=schema)


def video_golden():
    """Independent RVID walk (struct loop) + per-frame decode/phash via the
    shared image kernels (the sampling/plumbing is what's under test)."""
    import struct

    from crawler_ray.imaging import decode_png, phash64
    from crawler_ray.sources.synthetic_media import video_bytes

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = np.sort(docs["doc_id"].to_numpy(np.int64))
    ids = ids[ids % 41 == 5]
    rows = []
    for i in ids:
        data = video_bytes(f"v{i}", 42)
        assert data[:4] == b"RVID"
        n_frames, fps = struct.unpack("<II", data[4:12])
        pos, frames = 12, []
        for _ in range(n_frames):
            (ln,) = struct.unpack("<I", data[pos:pos + 4])
            frames.append(data[pos + 4:pos + 4 + ln])
            pos += 4 + ln
        assert pos == len(data)
        for fi in range(0, n_frames, 4):
            rgb = decode_png(frames[fi])
            rows.append({"video_id": f"v{i}", "frame_idx": fi,
                         "w": rgb.shape[1], "h": rgb.shape[0], "fps": fps,
                         "phash": np.uint64(phash64(rgb))})
    schema = pa.schema([("video_id", pa.string()), ("frame_idx", pa.int32()),
                        ("w", pa.int32()), ("h", pa.int32()), ("fps", pa.int32()),
                        ("phash", pa.uint64())])
    df = (pd.DataFrame(rows).sort_values(["video_id", "frame_idx"])
          .reset_index(drop=True))
    write("video_frame_sample", df, schema=schema)


def audio_near_dup_golden():
    """Brute-force all-pairs over STDLIB-wave-decoded features: same clip
    length AND |ΔRMS| ≤ 0.02 AND |ΔZCR| ≤ 0.015 AND |Δdominant_hz| ≤ 4.0
    (the engine's rule, applied with no blocking at all)."""
    import io
    import wave

    from crawler_ray.sources.synthetic_media import audio_wav_bytes, near_dup_audio_bytes

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = np.sort(docs["doc_id"].to_numpy(np.int64))
    ids = ids[ids % 23 == 3]
    clips = []
    for i in ids:
        clips.append((f"a{i}", audio_wav_bytes(f"a{i}", 42)))
        if i % 115 == 26:
            clips.append((f"a{i}x", near_dup_audio_bytes(f"a{i}", 42)))
    feats = []
    for key, data in clips:
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
            sr, n = w.getframerate(), w.getnframes()
            x = np.frombuffer(w.readframes(n), np.int16)
        f = x.astype(np.float64) / 32768.0
        rms = round(float(np.sqrt(np.mean(f * f))), 6) if n else 0.0
        zcr = round(float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1]))), 6) if n > 1 else 0.0
        dom = round(float(np.argmax(np.abs(np.fft.rfft(f))) * sr / n), 3) if n > 1 else 0.0
        feats.append((key, n, rms, zcr, dom))
    rows = []
    for a in range(len(feats)):
        for b in range(a + 1, len(feats)):
            ka, na, ra, za, da = feats[a]
            kb, nb, rb, zb, db = feats[b]
            if (na == nb and abs(ra - rb) <= 0.02 and abs(za - zb) <= 0.015
                    and abs(da - db) <= 4.0):
                lo, hi = min(ka, kb), max(ka, kb)
                rows.append({"audio_a": lo, "audio_b": hi,
                             "d_rms": round(abs(ra - rb), 6)})
    df = (pd.DataFrame(rows, columns=["audio_a", "audio_b", "d_rms"])
          .sort_values(["audio_a", "audio_b"]).reset_index(drop=True))
    df["d_rms"] = df["d_rms"].astype(np.float64)
    write("audio_near_dups", df)


def video_near_dup_golden():
    """Brute-force pairwise frame-hash-set intersection: struct-walked
    containers, sampled frames (every 4th), phash via the shared imaging
    kernels; a pair is reported when ≥2 DISTINCT sampled-frame phashes are
    shared."""
    import struct

    from crawler_ray.imaging import decode_png, phash64
    from crawler_ray.sources.synthetic_media import recut_video_bytes, video_bytes

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = np.sort(docs["doc_id"].to_numpy(np.int64))
    ids = ids[ids % 41 == 5]
    vids = []
    for i in ids:
        vids.append((f"v{i}", video_bytes(f"v{i}", 42)))
        if i % 205 == 46:
            vids.append((f"v{i}x", recut_video_bytes(f"v{i}", 42)))
    sets = []
    for key, data in vids:
        assert data[:4] == b"RVID"
        n_frames, _fps = struct.unpack("<II", data[4:12])
        pos, frames = 12, []
        for _ in range(n_frames):
            (ln,) = struct.unpack("<I", data[pos:pos + 4])
            frames.append(data[pos + 4:pos + 4 + ln])
            pos += 4 + ln
        assert pos == len(data)
        hashes = {int(phash64(decode_png(frames[fi])))
                  for fi in range(0, n_frames, 4)}
        sets.append((key, hashes))
    rows = []
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            shared = len(sets[a][1] & sets[b][1])
            if shared >= 2:
                lo, hi = min(sets[a][0], sets[b][0]), max(sets[a][0], sets[b][0])
                rows.append({"video_a": lo, "video_b": hi, "shared": shared})
    df = (pd.DataFrame(rows, columns=["video_a", "video_b", "shared"])
          .sort_values(["video_a", "video_b"]).reset_index(drop=True))
    df["shared"] = df["shared"].astype(np.int64)
    write("video_near_dups", df)


def bpe_golden(n_merges: int = 10, seed: int = 97):
    """Independent loop-style BPE: per-doc while-loop merge application and
    dict-based pair counting — no engine code. Must reproduce the engine's
    (count desc, pair asc) rule table and full-corpus symbol counts."""
    M64 = (1 << 64) - 1

    def mur(x: int) -> int:
        x &= M64
        x ^= x >> 32
        x = (x * 0xD6E8FEB86659FD93) & M64
        x ^= x >> 32
        x = (x * 0xD6E8FEB86659FD93) & M64
        x ^= x >> 32
        return x

    SEP = "\x1f"
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "lang", "text", "n_chars"]).to_pandas()
    sample = [str(t).split(" ") for i, t in zip(df["doc_id"], df["text"])
              if mur(int(i) ^ seed) % 4 == 0]

    def apply_rule(tokens, a, b):
        out, i = [], 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
                out.append(a + SEP + b)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        return out

    state = [list(t) for t in sample]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for toks in state:
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        state = [apply_rule(t, a, b) for t in state]

    sym_counts = {a + SEP + b: 0 for a, b in merges}
    ratio_acc: dict[str, list] = {}   # lang -> [n_docs, chars, tokens]
    for lang, t, nc in zip(df["lang"], df["text"], df["n_chars"]):
        toks = str(t).split(" ")
        for a, b in merges:
            toks = apply_rule(toks, a, b)
        for tok in toks:
            if tok in sym_counts:
                sym_counts[tok] += 1
        acc = ratio_acc.setdefault(lang, [0, 0, 0])
        acc[0] += 1
        acc[1] += int(nc)
        acc[2] += len(toks)

    out = pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "pair": [(a + SEP + b).replace(SEP, " ") for a, b in merges],
        "cnt": np.array([sym_counts[a + SEP + b] for a, b in merges], np.int64),
    })
    write("bpe_tokenize", out)

    ratio = pd.DataFrame([
        dict(lang=lang, n_docs=a[0], total_chars=a[1], total_tokens=a[2],
             chars_per_token_ppm=a[1] * 10**6 // a[2])
        for lang, a in sorted(ratio_acc.items())])
    for c in ratio.columns[1:]:
        ratio[c] = ratio[c].astype(np.int64)
    write("bpe_compression_ratio", ratio.reset_index(drop=True))


def pca_golden(k: int = 4, scale: int = 10_000):
    """Independent PCA golden: the independence lives in the per-row
    Python-loop quantization + exact Python-int moment accumulation; the
    d×d eigensolve is np.linalg.eigh on BOTH sides by design (power
    iteration was rejected — this fixture's random unit vectors give
    λ₂/λ₁ ≈ 0.99, see CLAUDE.md)."""
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    rows = t["embedding"].to_pylist()
    d = len(rows[0])
    n = len(rows)
    s = [0] * d
    S = [[0] * d for _ in range(d)]
    for v in rows:
        q = [int(np.floor(np.float64(np.float32(x)) * scale)) for x in v]
        for i in range(d):
            s[i] += q[i]
            for j in range(i, d):
                S[i][j] += q[i] * q[j]
    m2 = np.zeros((d, d), np.float64)
    trace = 0
    for i in range(d):
        for j in range(i, d):
            v = n * S[i][j] - s[i] * s[j]
            m2[i, j] = m2[j, i] = float(v)
            if i == j:
                trace += v
    vals = np.sort(np.linalg.eigh(m2)[0])[::-1][:k]
    ppm = np.floor(vals / float(trace) * 1e6 + 0.5).astype(np.int64)
    write("embedding_pca", pd.DataFrame(
        {"comp": np.arange(1, k + 1, dtype=np.int64), "var_ppm": ppm}))


def corpus_build_neardup_golden():
    """``corpus_build`` with the MinHash stage 2b enabled, as one
    STRAIGHT-LINE single-threaded pass: per-doc Counter gate loop, dict
    first-wins exact dedup, LSH candidates from the shared band kernel
    with a per-pair loop verify and UNION-FIND components (independent of
    the engine's min-label fixpoint), per-doc 5-gram contamination loop,
    and a running-total packing loop. Shared kernels: minhash_bands /
    shingle_hashes / jaccard — the same standard as the
    ``minhash_near_dups`` golden (the banding scheme defines the
    operator's candidate set; everything downstream is independent)."""
    from collections import Counter

    df = (pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
          .to_pandas().sort_values("doc_id"))
    # stage 1: eval holdout + token-length gate + repetition gate
    surv: list[tuple[int, str]] = []
    for d, t in zip(df["doc_id"], df["text"]):
        d, t = int(d), str(t)
        if d % 97 == 0:
            continue
        ws = t.split(" ")
        if len(ws) < 20:
            continue
        c = Counter(ws)
        if 1.0 - len(c) / len(ws) > 0.75 or max(c.values()) / len(ws) > 0.2:
            continue
        surv.append((d, t))
    # stage 2: exact first-wins dedup
    first: dict = {}
    for d, t in surv:
        first.setdefault(t, d)
    kept = [(d, t) for d, t in surv if first[t] == d]
    # stage 2b: shared-kernel LSH candidates, loop verify, union-find with
    # root-min union (final root of every component = its min doc_id)
    kdf = pd.DataFrame({"doc_id": np.array([d for d, _ in kept], np.int64),
                        "text": [t for _, t in kept]})
    cand = collide_pairs(minhash_bands(kdf))
    sh = {d: shingle_hashes(t) for d, t in kept}
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in sorted(set(zip(cand["doc_a"].astype(int),
                               cand["doc_b"].astype(int)))):
        if jaccard(sh[a], sh[b]) >= 0.5:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    kept = [(d, t) for d, t in kept if find(d) == d]
    # stage 3: 5-gram contamination loop vs the eval holdout
    grams: set = set()
    for d, t in zip(df["doc_id"], df["text"]):
        if int(d) % 97 == 0:
            ws = str(t).split(" ")
            for i in range(len(ws) - 4):
                grams.add(" ".join(ws[i:i + 5]))
    clean = []
    for d, t in kept:
        ws = t.split(" ")
        if any(" ".join(ws[i:i + 5]) in grams for i in range(len(ws) - 4)):
            continue
        clean.append((d, len(ws)))
    # stages 4+5: exclusive running-token total → 4096-token shard rollup
    rows: dict = {}
    tok_before = 0
    for d, n in clean:  # ascending doc_id ⇒ first/last seen = min/max
        r = rows.setdefault(tok_before // 4096, [0, 0, d, d])
        r[0] += 1
        r[1] += n
        r[3] = d
        tok_before += n
    sids = sorted(rows)
    write("corpus_build_neardup", pd.DataFrame(
        {"shard_id": np.array(sids, np.int64),
         "n_docs": np.array([rows[s][0] for s in sids], np.int64),
         "n_tokens": np.array([rows[s][1] for s in sids], np.int64),
         "first_doc": np.array([rows[s][2] for s in sids], np.int64),
         "last_doc": np.array([rows[s][3] for s in sids], np.int64)}))


def store_compaction_golden(n_frags: int = 10, bin_frags: int = 3):
    """Expected ``store_compaction`` stats row, derived by a STRAIGHT-LINE
    simulation of the maintenance pass — an independent greedy packing
    loop over the fragment row counts (never lance_layout.plan_compaction)
    plus first-principles vacuum accounting. The bit-identity flags are
    pinned to 1: the engine measures them on the live store, so any
    compaction that disturbs a byte fails this golden."""
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    rows_each = -(-n_docs // n_frags)
    sizes = []
    remaining = n_docs
    for _ in range(n_frags):
        take = min(rows_each, remaining)
        if take > 0:
            sizes.append(take)
        remaining -= take
    target = bin_frags * rows_each
    bins: list[list[int]] = []
    cur: list[int] = []
    for s in sizes:
        if cur and sum(cur) + s > target:
            bins.append(cur)
            cur = []
        cur.append(s)
        if sum(cur) >= target:
            bins.append(cur)
            cur = []
    if cur:
        bins.append(cur)
    n_rewritten = sum(1 for b in bins if len(b) > 1)
    carried = sum(1 for b in bins if len(b) == 1)
    write("store_compaction", pd.DataFrame({
        "n_docs": [np.int64(n_docs)],
        "n_frags_before": [np.int64(len(sizes))],
        "n_frags_after": [np.int64(len(bins))],
        "n_rewritten": [np.int64(n_rewritten)],
        "bit_identical": [np.int64(1)],
        "second_pass_rewrites": [np.int64(0)],
        "versions_dropped": [np.int64(1)],
        "files_removed": [np.int64(len(sizes) - carried)],
        "readable_after_vacuum": [np.int64(1)],
    }))


def store_upsert_golden(n_frags: int = 10):
    """Expected ``store_upsert`` stats row by STRAIGHT-LINE simulation:
    per-slice loop counting which fragments contain an updated key, plain
    set arithmetic for delete/append/logical-row counts, an independent
    greedy packing loop for the compaction rewrite count, and pinned-to-1
    equality flags (measured live by the engine, so any byte drift fails
    here)."""
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    n_docs = len(df)
    ids = df["doc_id"].to_numpy()
    upd = [int(v) for v in ids if v % 37 == 0]
    rows_each = -(-n_docs // n_frags)
    n_updated_fragments = 0
    sizes = []
    for i in range(n_frags):
        sl = ids[i * rows_each:(i + 1) * rows_each]
        if len(sl) == 0:
            continue
        sizes.append(len(sl))
        if any(int(v) % 37 == 0 for v in sl):
            n_updated_fragments += 1
    n_added = len(upd) + 5
    # compaction packing over physical sizes: old fragments (still
    # rows_each physical rows each — deletes are merge-on-read) plus the
    # update fragment(s); the engine writes updates as ONE fragment here
    # (single small Dataset block), appended after the old ones
    target = 3 * rows_each
    phys = sizes + [n_added]
    bins: list[list[int]] = []
    cur: list[int] = []
    for s in phys:
        if cur and sum(cur) + s > target:
            bins.append(cur)
            cur = []
        cur.append(s)
        if sum(cur) >= target:
            bins.append(cur)
            cur = []
    if cur:
        bins.append(cur)
    write("store_upsert", pd.DataFrame({
        "n_docs": [np.int64(n_docs)],
        "n_deleted": [np.int64(len(upd))],
        "n_added": [np.int64(n_added)],
        "n_updated_fragments": [np.int64(n_updated_fragments)],
        "logical_rows": [np.int64(n_docs + 5)],
        "content_ok": [np.int64(1)],
        "compact_rewrites": [np.int64(sum(1 for b in bins if len(b) > 1))],
        "dv_free_after_compact": [np.int64(1)],
        "content_ok_after_compact": [np.int64(1)],
    }))


def store_change_feed_golden():
    """Expected v1→v3 change feed by STRAIGHT-LINE simulation: plain set
    arithmetic over the two upsert waves — deletes are the ORIGINAL rows
    whose doc_id matched either wave (full preimage), inserts are each
    upserted key's FINAL version (a key hit by both waves nets to its v3
    row — the compressed-window CDF contract) plus the brand-new docs."""
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    ids = df["doc_id"].to_numpy()
    w2 = [int(v) for v in ids if v % 41 == 0]
    w3 = [int(v) for v in ids if v % 83 == 0]
    new3 = [int(ids.max()) + 1 + i for i in range(3)]
    rows = []
    orig = dict(zip(df["doc_id"].astype(int), df["text"]))
    for d in sorted(set(w2) | set(w3)):
        rows.append(("delete", d, orig[d]))
    for d in w2:
        if d not in set(w3):
            rows.append(("insert", d, f"v2 {d}"))
    for d in w3 + new3:
        rows.append(("insert", d, f"v3 {d}"))
    out = pd.DataFrame(rows, columns=["op", "doc_id", "text"])
    out["doc_id"] = out["doc_id"].astype(np.int64)
    write("store_change_feed",
          out.sort_values(["op", "doc_id", "text"]).reset_index(drop=True))


def store_schema_evolution_golden():
    """Expected ``store_schema_evolution`` stats row: plain arithmetic
    (modulo count of the upsert wave; rows after = n_docs — upserts
    replace, never add) with the live-measured invariant flags pinned to
    their expected values (1 / zero nulls)."""
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    n_upd = int((df["doc_id"] % 29 == 0).sum())
    write("store_schema_evolution", pd.DataFrame({
        "n_docs": [np.int64(len(df))],
        "n_upserted": [np.int64(n_upd)],
        "metadata_only_add": [np.int64(1)],
        "backfill_ok": [np.int64(1)],
        "new_rows_ok": [np.int64(1)],
        "time_travel_clean": [np.int64(1)],
        "nulls_after_compact": [np.int64(0)],
        "rows_after_compact": [np.int64(len(df))],
    }))


def image_quality_goldens(o, params):
    """Round-5b wave: sharpness gate, interleaved-doc assembly, caption
    dedup. Independence: the Laplacian is a per-pixel double loop with
    python-int accumulators (vs the engine's numpy slicing), the assembly
    is a straight-line per-page loop (vs the distributed join +
    map_groups), and caption dedup groups by the CAPTION STRING (vs the
    engine's xxh64 key — stronger: a hash collision would split them)."""
    from crawler_ray.imaging import decode_png
    from __ray_entry__ import SEQ_TOKEN_BUDGET, SHARP_MIN_VAR_PPM

    # image_sharpness: per-pixel loop Laplacian variance
    rows = []
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        rgb = decode_png(image_bytes(r["image_id"], r["w"], r["h"],
                                     r["fmt"], 42)).astype(int)
        h, w = rgb.shape[:2]
        s = s2 = n = 0
        for i in range(1, h - 1):
            for j in range(1, w - 1):
                def g(a, b):
                    return int(rgb[a, b, 0]) + int(rgb[a, b, 1]) + int(rgb[a, b, 2])
                L = 4 * g(i, j) - g(i - 1, j) - g(i + 1, j) - g(i, j - 1) - g(i, j + 1)
                s += L
                s2 += L * L
                n += 1
        var = ((n * s2 - s * s) * 10**6) // (n * n) if n else 0
        rows.append(dict(image_id=r["image_id"], lap_var_ppm=np.int64(var),
                         sharp=np.int64(1 if var >= SHARP_MIN_VAR_PPM else 0)))
    write("image_sharpness", pd.DataFrame(rows))

    # interleaved_docs: straight-line per-page assembly loop
    import math
    from crawler_ray.pipelines.multimodal import VIT_PATCH

    title_of = {p["url"]: p["title"] for p in o["pages"]}
    by_url: dict[str, list] = {}
    for r in o["store"]:
        by_url.setdefault(r["src_url"], []).append(r)
    irows = []
    for url in sorted(by_url):
        imgs = sorted(by_url[url], key=lambda r: r["image_id"])
        title_tok = len(title_of[url].split())
        total = title_tok
        kept = img_tok = 0
        for im in imgs:
            cost = (math.ceil(int(im["w"]) / VIT_PATCH)
                    * math.ceil(int(im["h"]) / VIT_PATCH)
                    + len(im["caption"].split()))
            if total + cost > SEQ_TOKEN_BUDGET:
                break
            total += cost
            img_tok += cost
            kept += 1
        irows.append(dict(url=url, n_images=np.int64(len(imgs)),
                          n_kept=np.int64(kept),
                          text_tokens=np.int64(title_tok),
                          image_tokens=np.int64(img_tok),
                          total_tokens=np.int64(total)))
    write("interleaved_docs", pd.DataFrame(irows))

    # caption_dedup: first-wins per CAPTION STRING, per-host rollup
    winner: dict[str, str] = {}
    for r in sorted(o["store"], key=lambda r: r["image_id"]):
        winner.setdefault(r["caption"], r["image_id"])
    per_host: dict[str, list[int]] = {}
    for r in o["store"]:
        s = per_host.setdefault(r["host"], [0, 0])
        s[0] += 1
        s[1] += 1 if winner[r["caption"]] == r["image_id"] else 0
    write("caption_dedup", pd.DataFrame(
        [dict(host=hst, n_images=np.int64(v[0]), n_kept=np.int64(v[1]),
              n_dropped=np.int64(v[0] - v[1]))
         for hst, v in sorted(per_host.items())]))


def image_audit_golden(o, params):
    """validate_images: an INDEPENDENT spec-level PNG chunk walk (written
    from the RFC 2083 layout, not sharing imaging.png_audit) + per-host
    loop rollup; decode/phash use the shared kernels (the same standard
    as the image_features golden)."""
    import struct
    import zlib

    from crawler_ray.imaging import decode_png, phash64

    def walk(data: bytes):
        ok_sig = data.startswith(b"\x89PNG\r\n\x1a\n")
        dims = (-1, -1)
        if not ok_sig:
            return False, False, dims
        i = 8
        chunks = []
        while i + 12 <= len(data):
            n = int.from_bytes(data[i:i + 4], "big")
            if i + 12 + n > len(data):
                return ok_sig, False, dims
            tag = data[i + 4:i + 8]
            body = data[i + 8:i + 8 + n]
            want = int.from_bytes(data[i + 8 + n:i + 12 + n], "big")
            if zlib.crc32(data[i + 4:i + 8 + n]) != want:
                return ok_sig, False, dims
            chunks.append(tag)
            if tag == b"IHDR":
                dims = struct.unpack(">II", body[:8])
            i += 12 + n
            if tag == b"IEND":
                break
        complete = bool(chunks) and chunks[-1] == b"IEND" and i == len(data)
        return ok_sig, complete, dims

    per_host: dict[str, list[int]] = {}
    for r in o["store"]:
        data = image_bytes(r["image_id"], r["w"], r["h"], r["fmt"], 42)
        sig, crc, (w, h) = walk(data)
        s = per_host.setdefault(r["host"], [0] * 6)
        s[0] += 1
        s[1] += 0 if sig else 1
        s[2] += 0 if crc else 1
        s[3] += 0 if (w == r["w"] and h == r["h"]) else 1
        try:
            rgb = decode_png(data)
        except Exception:
            s[4] += 1
            continue
        s[5] += 0 if phash64(rgb) == r["phash"] else 1
    cols = ["n_images", "n_sig_bad", "n_crc_bad", "n_dims_bad",
            "n_decode_err", "n_phash_bad"]
    write("validate_images", pd.DataFrame(
        [dict(host=hst, **{c: np.int64(v[k]) for k, c in enumerate(cols)})
         for hst, v in sorted(per_host.items())]))


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    o, params = crawl_goldens()
    export_golden(o)
    image_goldens(o, params)
    image_r5_goldens(o, params)
    image_quality_goldens(o, params)
    image_audit_golden(o, params)
    text_goldens()
    ann_golden()
    ann_ivf_golden()
    pq_golden()
    kmeans_golden()
    audio_golden()
    video_golden()
    audio_near_dup_golden()
    video_near_dup_golden()
    bpe_golden()
    pca_golden()
    corpus_build_neardup_golden()
    store_compaction_golden()
    store_upsert_golden()
    store_change_feed_golden()
    store_schema_evolution_golden()
    print("done")
