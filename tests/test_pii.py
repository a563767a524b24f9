"""PII detect/redact: kernel semantics + both queries vs their oracles.

The kernel tests pin the properties the oracle equivalence relies on:
pattern disjointness (per-type counts are order-independent) and the
redaction passes matching a straight-line per-doc ``re.sub`` chain.
"""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import pii

SF = "/root/testdata/sf0.001"


def test_counts_match_per_doc_loop():
    texts = pd.Series([
        "reach me at jo.e+spam@sub.example.co or 12-345-678-9012",
        "ssn 123-45-6789 from 192.168.0.1 and 10.0.0.255",
        "no pii here at all",
        "a@b.io a@b.io 11-222-333-4444",
        "",
    ])
    got = pii.pii_counts(texts)
    for name, pat, _ in pii.PII_PATTERNS:
        exp = [len(re.findall(pat, t)) for t in texts]
        assert list(got[name]) == exp, name
    assert list(got.columns) == [n for n, _, _ in pii.PII_PATTERNS]
    assert got.to_numpy().sum(axis=1).tolist() == [2, 3, 0, 3, 0]


def test_redact_matches_sequential_sub():
    texts = pd.Series([
        "mail x_9@ex.org, call 98-765-432-1098, ssn 321-54-9876, ip 1.2.3.4",
        "plain words only",
    ])
    got = pii.redact(texts)
    for t, g in zip(texts, got):
        for _, pat, repl in pii.PII_PATTERNS:
            t = re.sub(pat, repl.replace("\\", "\\\\"), t)
        assert t == g
    assert got[0] == "mail [EMAIL], call [PHONE], ssn [SSN], ip [IP]"


def test_pattern_disjointness():
    """A planted instance of one type never triggers another type's
    pattern — the property that makes independent counts == pass-ordered
    redaction hit counts."""
    samples = {
        "email": ["user123@mail4.example.com", "a.b-c%d@x-y.z.museum"],
        "phone": ["10-100-100-1000", "99-999-999-9999", "25-989-741-2988"],
        "ssn": ["100-10-1000", "999-99-9999"],
        "ipv4": ["10.0.0.1", "255.255.255.255", "1.2.3.4"],
    }
    for planted, cases in samples.items():
        for text in cases:
            for name, pat, _ in pii.PII_PATTERNS:
                n = len(re.findall(pat, text))
                if name == planted:
                    assert n == 1, (planted, text, name)
                else:
                    assert n == 0, (planted, text, name)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ["pii_scan", "pii_redact"])
def test_pii_queries_vs_oracle(name):
    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    got = QUERIES[name](SF)
    exp = con.execute(ORACLE_SQL[name]).df()
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), (name, c)
    if name == "pii_scan":
        assert got["n_hits"].sum() > 0  # the fixture actually plants PII
