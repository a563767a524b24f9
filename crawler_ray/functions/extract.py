"""Main-content extraction (boilerplate removal) from HTML.

The first step of every web-scale text corpus (C4, CCNet, RefinedWeb):
strip a page down to its content blocks and drop navigation/footer
boilerplate. This implements the public density heuristic family
(jusText, Kohlschütter et al. boilerpipe — simplified to a deterministic
two-rule form so an independent parser can reproduce it exactly):

1. Segment the page into BLOCKS at block-level tag boundaries
   (``BLOCK_TAGS``); inline tags (``<a> <b> <span> …``) do not break a
   block, their text stays inside it.
2. A block is MAIN CONTENT iff its visible text is at least
   ``min_chars`` long AND its link density (chars inside ``<a>…</a>`` /
   all chars, both measured on whitespace-normalized text) is at most
   ``max_link_density``. Everything else is boilerplate — link lists
   and short furniture drop, long prose stays.

The segmentation rule — not any parser's quirk — is the spec: the engine
walks the page with ONE compiled tag regex; the committed golden
re-implements the same rule on stdlib ``html.parser`` (a genuinely
independent tokenizer), and the two meet only at the published block
semantics. Entities are NOT decoded on either side (the fixture corpus
embeds none; decoding belongs to a later normalization pass).

Reference parity note: the reference parses pages with BeautifulSoup
selectors (worker/src/crawler/core/craigslist_parser.py:52-191) and has
no generic boilerplate pass; this operator is part of the training-data
extension surface.
"""

from __future__ import annotations

import re

import numpy as np

# Tags whose open OR close ends the current text block. Everything not
# listed is inline and keeps the block open.
BLOCK_TAGS = frozenset((
    "p", "div", "section", "article", "aside", "nav",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "table", "tr", "figure", "figcaption",
    "header", "footer", "blockquote", "pre",
    "html", "head", "body", "title", "br",
))

MIN_CHARS = 25           # jusText-style short-block floor
MAX_LINK_DENSITY = 0.33  # link-chars / chars ceiling for content blocks

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>|<!DOCTYPE[^>]*>")
_WS_RE = re.compile(r"\s+")


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def html_blocks(html: str) -> list[tuple[str, int]]:
    """Segment HTML into (normalized block text, link_chars) tuples.

    One linear pass over the compiled tag regex: text between tags
    accumulates into the current block; a BLOCK_TAGS open/close flushes
    it; ``<a>``/``</a>`` toggles link accounting (nested anchors do not
    occur in HTML and are treated as re-entry). Empty blocks are not
    emitted.
    """
    out: list[tuple[str, int]] = []
    buf: list[str] = []
    link_buf: list[str] = []
    in_link = False
    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.start() > pos:
            seg = html[pos:m.start()]
            buf.append(seg)
            if in_link:
                link_buf.append(seg)
        pos = m.end()
        name = (m.group(2) or "").lower()
        if name == "a":
            in_link = not m.group(1)
            continue
        if name in BLOCK_TAGS:
            text = _norm("".join(buf))
            if text:
                out.append((text, len(_norm("".join(link_buf)))))
            buf, link_buf, in_link = [], [], False
    if pos < len(html):
        buf.append(html[pos:])
    text = _norm("".join(buf))
    if text:
        out.append((text, len(_norm("".join(link_buf)))))
    return out


def main_content(html: str, min_chars: int = MIN_CHARS,
                 max_link_density: float = MAX_LINK_DENSITY) -> dict:
    """Apply the density rule; return the joined main text plus exact
    integer accounting (link density compares as ``link_chars * 100 <=
    max_link_density * 100 * chars`` with the threshold a rational —
    33/100 — so no float rule can split engine and golden)."""
    num, den = int(round(max_link_density * 100)), 100
    main: list[str] = []
    n_kept = n_dropped = main_chars = boiler_chars = 0
    for text, link_chars in html_blocks(html):
        n = len(text)
        if n >= min_chars and link_chars * den <= num * n:
            main.append(text)
            n_kept += 1
            main_chars += n
        else:
            n_dropped += 1
            boiler_chars += n
    return dict(text="\n".join(main), n_kept=np.int64(n_kept),
                n_dropped=np.int64(n_dropped),
                main_chars=np.int64(main_chars),
                boiler_chars=np.int64(boiler_chars))
