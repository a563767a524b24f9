"""PII detection and redaction over text batches (vectorized).

Large-scale training corpora are scrubbed of personally identifiable
information before use (C4 removes lines with blocklisted strings;
RefinedWeb/Dolma redact emails, phone numbers, IP addresses with regex
passes — see PAPERS.md). This module gives the engine that pass as a
reusable batch operator: a fixed table of compiled patterns, a per-doc
hit counter, and an order-deterministic redactor, all pandas/RE2-safe
(leftmost, non-overlapping, no backtracking constructs) so a DuckDB
``regexp_extract_all`` / ``regexp_replace(..., 'g')`` oracle computes
the identical result.

Ordering caveat: the patterns are mutually exclusive for the fixture's
string shapes (an email there never contains a dash-quad, an IPv4 never
contains dashes, the 2-3-3-4 phone grouping cannot embed or be embedded
in the 3-2-4 SSN grouping), so on THIS corpus per-type counts on the
original text are order-independent and the redaction passes commute.
That exclusivity is NOT general: an email with an IPv4-shaped domain
(``a@1.2.3.4.co``) matches both the email and ipv4 patterns, and
overlapping digit runs can make counts-on-original disagree with what a
sequential redactor actually replaced. Reusers needing exact accounting
on arbitrary text should count via the redaction pass itself (apply the
patterns in ``PII_PATTERNS`` order, counting replacements on the
ALREADY-partially-redacted text); engine and oracle here stay in
lockstep regardless because both apply the identical fixed order.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# (name, regex, placeholder) — redaction applies in THIS order. Patterns
# stay in the common subset of Python re and RE2: no lookaround, no
# backrefs, no \b (word-boundary edge cases differ across engines).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "[SSN]"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def pii_counts(texts: pd.Series) -> pd.DataFrame:
    """Per-document non-overlapping match counts for every PII type.

    Returns one int64 column per pattern name, aligned with ``texts``.
    ``Series.str.count`` is the pandas C-level scan — no Python loop over
    rows beyond the regex engine itself.
    """
    s = texts.astype("string")
    out = {}
    for name, rx, _ in _COMPILED:
        out[name] = s.str.count(rx).fillna(0).to_numpy(np.int64)
    return pd.DataFrame(out, index=texts.index)


def redact(texts: pd.Series) -> pd.Series:
    """Replace every PII match with its placeholder, in PII_PATTERNS order
    (equivalent to nested ``regexp_replace(..., 'g')`` in the oracle)."""
    s = texts.astype("string")
    for _, rx, repl in _COMPILED:
        s = s.str.replace(rx, repl, regex=True)
    return s.astype(object)
