"""Parser plug-in registry (§2.10 extension surface).

The reference's convention is "create a new parser in parsing/ and integrate
into worker.py" (README.md:518-526). Here a parser is a vectorized batch UDF
``(DataFrame of fetched pages) -> DataFrame of parsed fields`` registered
against a host regex; the fetch-process stage dispatches each batch's
property rows to the matching parser (first registered match wins,
craigslist parser is the default fallback).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd

_REGISTRY: list[tuple[re.Pattern, Callable[[pd.DataFrame], pd.DataFrame]]] = []


def register_parser(host_pattern: str):
    """Decorator: register a batch parser for hosts matching ``host_pattern``."""

    def deco(fn: Callable[[pd.DataFrame], pd.DataFrame]):
        _REGISTRY.append((re.compile(host_pattern, re.IGNORECASE), fn))
        return fn

    return deco


def parser_for(host: str) -> Callable[[pd.DataFrame], pd.DataFrame] | None:
    for pat, fn in _REGISTRY:
        if pat.search(host):
            return fn
    return None


def dispatch_parse(batch: pd.DataFrame) -> pd.DataFrame:
    """Split a (possibly multi-host) batch by registered parser and concat
    the parsed outputs; rows with no matching parser are dropped."""
    if len(batch) == 0:
        return batch
    pieces = []
    assigned = batch["host"].map(lambda h: id(parser_for(h)))
    for _, group in batch.groupby(assigned, sort=False):
        fn = parser_for(group["host"].iloc[0])
        if fn is not None:
            pieces.append(fn(group))
    if not pieces:
        return batch.iloc[0:0]
    return pd.concat(pieces, ignore_index=True)


def _register_defaults() -> None:
    from crawler_ray.stages.crawl_stages import parse_fields

    if not _REGISTRY:
        register_parser(r"\.craigslist\.org$")(parse_fields)


_register_defaults()
