"""BPE tokenizer: vectorized-vs-naive fuzz, round-trip inverse, distributed
trainer vs loop trainer, and the corpus query vs its committed golden."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.functions import bpe


def _naive_apply(tokens: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + bpe.SEP + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_apply_merge_flat_matches_naive_fuzz():
    rng = np.random.default_rng(5)
    for _ in range(200):
        docs = [[str(rng.integers(0, 4)) for _ in range(rng.integers(0, 12))]
                for _ in range(rng.integers(1, 5))]
        a, b = str(rng.integers(0, 4)), str(rng.integers(0, 4))
        flat = np.array([t for d in docs for t in d], object)
        doc = np.array([i for i, d in enumerate(docs) for _ in d], np.int64)
        got_f, got_d = bpe.apply_merge_flat(flat, doc, a, b)
        want = [_naive_apply(d, a, b) for d in docs]
        assert list(got_f) == [t for d in want for t in d]
        assert list(got_d) == [i for i, d in enumerate(want) for _ in d]


def test_overlapping_run_is_left_greedy():
    flat = np.array(["x"] * 5, object)
    doc = np.zeros(5, np.int64)
    out, _ = bpe.apply_merge_flat(flat, doc, "x", "x")
    xx = "x" + bpe.SEP + "x"
    assert list(out) == [xx, xx, "x"]


def test_merge_never_crosses_doc_boundary():
    flat = np.array(["a", "b", "a", "b"], object)
    doc = np.array([0, 0, 0, 1], np.int64)  # trailing (a,b) straddles docs... 
    out, _ = bpe.apply_merge_flat(flat, doc, "a", "b")
    assert list(out) == ["a" + bpe.SEP + "b", "a", "b"]


def test_encode_detokenize_round_trip():
    texts = ["big scan small scan big scan", "scan big", "", "big big big"]
    b = pd.DataFrame({"doc_id": np.arange(4), "text": texts})
    merges = [("big", "scan"), ("scan", "big")]
    enc = bpe.encode_batch(b, merges)
    flat, _, _ = bpe._flatten(enc["toks"])
    # inverse: splitting merged symbols reproduces the raw token stream
    raw = [t for s in texts for t in s.split(" ")]
    assert list(bpe.detokenize(flat)) == raw


def test_train_bpe_ds_matches_loop_trainer(ray_session):
    import ray.data as rd

    texts = ["a b a b c", "a b a b a b", "c c a b", "b a b a"] * 5
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    got = bpe.train_bpe_ds(ds, 3)

    state = [t.split(" ") for t in texts]
    want = []
    for _ in range(3):
        counts: dict = {}
        for toks in state:
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        want.append(best[0])
        state = [_naive_apply(t, *best[0]) for t in state]
    assert got == want


def test_bpe_tokenize_matches_golden(ray_session):
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.queries import bpe_tokenize

    got = bpe_tokenize("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/bpe_tokenize.parquet").to_pandas()
    pd.testing.assert_frame_equal(got, golden)


def test_local_and_distributed_trainers_agree(ray_session, monkeypatch):
    import ray.data as rd

    texts = ["a b a b c", "a b a b a b", "c c a b", "b a b a", ""] * 6
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    local = bpe.train_bpe_ds(ds, 3)  # 30 docs → local path
    monkeypatch.setattr(bpe, "LOCAL_TRAIN_DOCS", 0)
    dist = bpe.train_bpe_ds(ds, 3)   # forced distributed rounds
    assert local == dist and len(local) == 3


def test_empty_frame_encodes_to_zero_rows():
    """ADVICE r05: a 0-doc frame must not grow a phantom 1-row doc
    (np.split of an empty array yields one empty chunk)."""
    import numpy as np
    import pandas as pd

    from crawler_ray.functions import bpe

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "text": pd.Series([], dtype="string")})
    out = bpe.encode_batch(empty, [("a", "b")])
    assert len(out) == 0 and "toks" in out.columns
    # non-RangeIndex frames must align by position, not by index label
    b = pd.DataFrame({"text": ["a b c", "a b"]}, index=[7, 3])
    out2 = bpe.encode_batch(b, [("a", "b")])
    assert list(out2.loc[7, "toks"]) == ["a\x1fb", "c"]
    assert list(out2.loc[3, "toks"]) == ["a\x1fb"]


def test_bpe_compression_ratio_golden(ray_session):
    """Per-lang chars-per-token vs the committed independent loop golden,
    plus conservation: totals across langs equal the corpus."""
    import pandas as pd

    from crawler_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["bpe_compression_ratio"](sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "n_chars"])
    assert int(out["n_docs"].sum()) == len(docs)
    assert int(out["total_chars"].sum()) == int(docs["n_chars"].sum())
    # merged symbols can only shrink the token count
    assert (out["total_tokens"] <= out["total_chars"]).all()
    assert (out["chars_per_token_ppm"]
            == out["total_chars"] * 10**6 // out["total_tokens"]).all()
