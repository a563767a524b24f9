"""robots.txt text parsing (T4) + parser plug-in registry (§2.10)."""

import pandas as pd
import pytest

from crawler_ray.functions.robots_txt import parse_robots_txt, render_robots_txt, rules_for_host
from crawler_ray.stages import parsers


def test_parse_basic_record():
    txt = """
User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2.5
"""
    r = parse_robots_txt(txt, "WebCrawler/1.0")
    assert r["disallow_prefixes"] == ["/private", "/tmp/"]
    assert r["crawl_delay_s"] == 2.5


def test_agent_specific_record_wins_over_star():
    txt = """
User-agent: *
Disallow: /everything

User-agent: WebCrawler
Disallow: /only-this
Crawl-delay: 9
"""
    r = parse_robots_txt(txt, "WebCrawler/1.0")
    assert r["disallow_prefixes"] == ["/only-this"]
    assert r["crawl_delay_s"] == 9.0
    other = parse_robots_txt(txt, "SomeOtherBot")
    assert other["disallow_prefixes"] == ["/everything"]


def test_comments_empty_disallow_and_garbage():
    txt = """
# a comment
User-agent: *   # trailing comment
Disallow:
Disallow: /x
Crawl-delay: not-a-number
random garbage line without colon meaning
"""
    r = parse_robots_txt(txt)
    assert r["disallow_prefixes"] == ["/x"]
    assert r["crawl_delay_s"] is None


def test_404_and_error_allow_all():
    # reference: 404 ⇒ allow, fetch error ⇒ allow (robots_checker.py:55-72)
    for status in (404, 500):
        r = rules_for_host("h.example.org", None, status)
        assert r["disallow_prefixes"] == [] and r["crawl_delay_s"] is None
        assert r["fetch_status"] == status


def test_render_parse_roundtrip():
    for rules in (
        {"disallow_prefixes": ["/apa/d/no-"], "crawl_delay_s": 5.0},
        {"disallow_prefixes": [], "crawl_delay_s": None},
        {"disallow_prefixes": ["/a", "/b/c"], "crawl_delay_s": 1.0},
    ):
        back = parse_robots_txt(render_robots_txt(rules))
        assert back["disallow_prefixes"] == rules["disallow_prefixes"]
        assert back["crawl_delay_s"] == rules["crawl_delay_s"]


def test_parser_registry_dispatch():
    calls = []

    @parsers.register_parser(r"\.example\.org$")
    def custom(batch: pd.DataFrame) -> pd.DataFrame:
        calls.append(len(batch))
        return batch[["host"]].assign(parsed_by="custom")

    try:
        assert parsers.parser_for("x.example.org") is custom
        assert parsers.parser_for("sfbay.craigslist.org") is not custom
        assert parsers.parser_for("nobody.example.net") is None
        batch = pd.DataFrame({"host": ["a.example.org", "b.example.org"]})
        out = parsers.dispatch_parse(batch)
        assert calls == [2] and (out["parsed_by"] == "custom").all()
        # unmatched hosts drop
        assert len(parsers.dispatch_parse(pd.DataFrame({"host": ["z.example.net"]}))) == 0
    finally:
        parsers._REGISTRY[:] = [(p, f) for p, f in parsers._REGISTRY if f is not custom]
