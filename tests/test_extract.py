"""Main-content extraction kernel: the density rule, and regex-walker vs
stdlib-html.parser equivalence on adversarial snippets (the same
independence axis the committed golden uses)."""

from __future__ import annotations

import re

from crawler_ray.functions.extract import (
    BLOCK_TAGS,
    MIN_CHARS,
    html_blocks,
    main_content,
)


def _parser_blocks(html: str):
    """Reference implementation of the published block rule on stdlib
    html.parser (independent tokenizer)."""
    from html.parser import HTMLParser

    class BP(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.blocks, self.buf, self.link, self.in_a = [], [], [], False

        def _flush(self):
            t = re.sub(r"\s+", " ", "".join(self.buf)).strip()
            if t:
                link = re.sub(r"\s+", " ", "".join(self.link)).strip()
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

    bp = BP()
    bp.feed(html)
    bp.close()
    bp._flush()
    return bp.blocks


PROBES = [
    "",
    "no tags at all, just text that is clearly long enough to keep",
    "<P>UPPERCASE block tags</P><p>second</p>",
    "<p>unclosed paragraph runs to the end " + "x " * 30,
    "<div>a<br>b<br/>c</div>",
    '<ul><li><a href="#">one</a></li><li><a href="#">two</a></li></ul>',
    "<p>text <b>with <i>nested</i> inline</b> tags kept together</p>",
    '<section id="postingbody">mixed <a href="u">link text</a> and prose '
    "long enough to pass the floor</section>",
    "<h1>title</h1><footer>" + "pad " * 40 + "</footer>",
]


def test_regex_walker_matches_stdlib_parser():
    for html in PROBES:
        assert html_blocks(html) == _parser_blocks(html), html[:60]


def test_regex_walker_matches_parser_on_fixture_pages():
    from crawler_ray.sources.synthetic_web import (
        WebParams,
        all_urls,
        page_meta,
        render_html,
    )

    p = WebParams(seed=42, n_hosts=6, props_per_host=10,
                  hot_hosts=1, hot_factor=4)
    n = 0
    for url in all_urls(p):
        meta = page_meta(url, p)
        if meta is None:
            continue
        html = render_html(meta)
        assert html_blocks(html) == _parser_blocks(html), url
        n += 1
    assert n > 50


def test_density_rule():
    html = ("<body><ul>"
            + "".join(f'<li><a href="#">nav item {i}</a></li>' for i in range(5))
            + "</ul><p>" + "word " * 30 + "</p><p>tiny</p></body>")
    r = main_content(html)
    assert int(r["n_kept"]) == 1          # only the long prose block
    assert int(r["n_dropped"]) == 6       # 5 nav links + "tiny"
    assert r["text"].startswith("word word")
    assert int(r["main_chars"]) == len(r["text"])


def test_link_density_boundary():
    # exactly at the 33/100 threshold: kept (<=); one char over: dropped
    prose = "p" * 67
    link = "l" * 33
    html = f'<p>{prose}<a href="#">{link}</a></p>'
    assert int(main_content(html)["n_kept"]) == 1
    html2 = f'<p>{prose[:-1]}<a href="#">{link}x</a></p>'
    assert int(main_content(html2)["n_kept"]) == 0


def test_min_chars_floor():
    html = "<p>" + "y" * (MIN_CHARS - 1) + "</p><p>" + "y" * MIN_CHARS + "</p>"
    r = main_content(html)
    assert int(r["n_kept"]) == 1 and int(r["n_dropped"]) == 1
