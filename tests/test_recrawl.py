"""Incremental recrawl (D2/M14): content-change skip + latest-wins merge."""

from dataclasses import replace

import pytest

from crawler_ray.sources.synthetic_web import build_web, content_changes, unit_params


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    from crawler_ray.pipelines.crawl import run_crawl
    from crawler_ray.pipelines.recrawl import read_pages_latest

    p = unit_params()
    web = build_web(p)
    out = str(tmp_path_factory.mktemp("recrawl") / "c")
    run_crawl(web, p, out)
    return p, web, out, read_pages_latest(out)


def test_recrawl_unchanged_content_stores_nothing(crawl_out):
    from crawler_ray.pipelines.recrawl import read_pages_latest, run_recrawl

    p, web, out, pages0 = crawl_out
    stats = run_recrawl(web, p, out)
    assert stats["changed"] == 0
    assert stats["checked"] == stats["unchanged"] + stats["failed"]
    assert read_pages_latest(out).equals(pages0)


def test_recrawl_detects_exactly_the_changed_pages(crawl_out):
    from crawler_ray.pipelines.recrawl import read_pages_latest, run_recrawl
    from crawler_ray.sources import lance_layout as ll

    p, _, out, pages0 = crawl_out
    p2 = replace(p, content_rev=1)
    stats = run_recrawl(build_web(p2), p2, out)
    expected = {u for u in pages0["url"] if content_changes(u, p2)}
    assert stats["changed"] == len(expected)

    pages2 = read_pages_latest(out)
    assert len(pages2) == len(pages0)  # latest-wins merge keeps one row per url
    merged = pages0.merge(pages2, on="url", suffixes=("_old", "_new"))
    changed_urls = set(merged.loc[merged["content_hash_old"] != merged["content_hash_new"], "url"])
    assert changed_urls == expected
    # the delta landed as a NEW manifest version with recrawl stats recorded
    m = ll.latest_manifest(out)
    assert m["counts"]["recrawl"]["changed"] == len(expected)
