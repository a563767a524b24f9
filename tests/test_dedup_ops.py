"""Near-dup operators find planted duplicates and reject non-dups."""

import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import dedup_ops

BASE = ("the quick brown fox jumps over the lazy dog while the sun sets slowly "
        "behind the ancient mountains casting long purple shadows across the valley")
NEAR = BASE.replace("purple", "orange")  # one-word perturbation → high Jaccard
FAR = ("completely different content about machine learning pipelines and "
       "distributed data processing engines running on compute clusters")


@pytest.fixture
def docs():
    return pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                         "text": [BASE, NEAR, FAR, BASE + " extra tail words here"]})


def test_shingle_jaccard():
    a = dedup_ops.shingle_hashes(BASE)
    b = dedup_ops.shingle_hashes(NEAR)
    c = dedup_ops.shingle_hashes(FAR)
    assert dedup_ops.jaccard(a, a) == 1.0
    assert dedup_ops.jaccard(a, b) > 0.7
    assert dedup_ops.jaccard(a, c) < 0.1


def test_minhash_similarity_estimate():
    seeds = dedup_ops._perm_seeds(128)
    sa = dedup_ops.minhash_signature(dedup_ops.shingle_hashes(BASE), seeds)
    sb = dedup_ops.minhash_signature(dedup_ops.shingle_hashes(NEAR), seeds)
    sc = dedup_ops.minhash_signature(dedup_ops.shingle_hashes(FAR), seeds)
    assert (sa == sb).mean() > 0.6       # near-dup agrees on most minhashes
    assert (sa == sc).mean() < 0.2


def test_minhash_lsh_finds_planted_pair(docs):
    bands = dedup_ops.minhash_bands(docs)
    cand = []
    for _, g in bands.groupby(["band", "band_hash"]):
        cand.append(dedup_ops.bucket_pairs(g))
    pairs = pd.concat(cand).drop_duplicates(["doc_a", "doc_b"])
    assert (0, 1) in set(zip(pairs["doc_a"], pairs["doc_b"]))  # planted near-dup


def test_simhash_hamming(docs):
    sh = dedup_ops.simhash64(docs)
    h = dict(zip(sh["doc_id"], sh["simhash"]))
    from crawler_ray.imaging import hamming64

    assert hamming64(h[0], h[1]) <= 6      # near-dup close
    assert hamming64(h[0], h[2]) > 10      # unrelated far


def test_simhash_banding_pigeonhole():
    # two hashes at Hamming 3 must share ≥1 of 4 16-bit bands
    a = np.int64(0x1234_5678_9ABC_DEF0)
    b = int(a) ^ 0b1011  # 3 bits flipped in low band
    df = pd.DataFrame({"doc_id": np.array([1, 2], np.int64), "simhash": np.array([a, b], np.int64)})
    bands = dedup_ops.simhash_bands(df)
    shared = bands.groupby(["band", "band_hash"])["doc_id"].nunique()
    assert (shared >= 2).any()
    pairs = pd.concat([
        dedup_ops.simhash_bucket_pairs(g) for _, g in bands.groupby(["band", "band_hash"])
    ])
    assert len(pairs) >= 1 and pairs.iloc[0]["hamming"] == 3


def test_banded_pairs_straddling_bucket(ray_session):
    """The sort-shuffle collision path must not lose pairs when a single
    (band, band_hash) bucket spans many sorted blocks — edge buckets are
    resolved across block boundaries."""
    import ray.data as rd

    n = 40
    df = pd.DataFrame({"band": np.int32(0), "band_hash": np.int64(7),
                       "doc_id": np.arange(n, dtype=np.int64)})
    bands = rd.from_pandas(df).repartition(8)
    pairs = dedup_ops.banded_candidate_pairs(bands, dedup_ops.collide_pairs)
    assert len(pairs.drop_duplicates(["doc_a", "doc_b"])) == n * (n - 1) // 2


def test_banded_pairs_hot_bucket_distributed_fallback(ray_session, monkeypatch):
    """When edge rows exceed the driver limit, edge buckets resolve via a
    keyed repartition instead of a driver concat — identical pair set."""
    import ray.data as rd

    n = 40
    df = pd.DataFrame({"band": np.int32(0), "band_hash": np.int64(7),
                       "doc_id": np.arange(n, dtype=np.int64)})
    bands = rd.from_pandas(df).repartition(8)
    monkeypatch.setattr(dedup_ops, "EDGE_ROWS_DRIVER_LIMIT", 0)
    pairs = dedup_ops.banded_candidate_pairs(bands, dedup_ops.collide_pairs)
    assert len(pairs.drop_duplicates(["doc_a", "doc_b"])) == n * (n - 1) // 2


def test_word_ngram_hashes_match_string_grams():
    """Hash sets must be exactly the distinct word-3-gram sets the DuckDB
    oracle builds (tokens = lowercase [a-z0-9]+ runs)."""
    import re

    text = "The  quick, Brown FOX!! jumps over the quick brown fox 42 times"
    toks = re.findall(r"[a-z0-9]+", text.lower())
    grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    h = dedup_ops.word_ngram_hashes(text)
    assert len(h) == len(grams)
    assert dedup_ops.word_ngram_hashes("one two") .size == 0  # < n tokens


def test_prefix_filter_lossless():
    """Prefix filtering must never lose a qualifying pair: every pair with
    J >= t collides on at least one indexed prefix gram (hypothesis-style
    sweep over overlapping token sequences and thresholds)."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    base = list(rng.choice(vocab, 40))
    for i in range(20):
        t = list(base)
        for _ in range(i):  # progressively mutate → full Jaccard spectrum
            t[int(rng.integers(len(t)))] = str(rng.choice(vocab))
        texts.append(" ".join(t))
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    sets_ = {i: dedup_ops.word_ngram_hashes(t) for i, t in enumerate(texts)}
    for t in (0.3, 0.5, 0.8):
        rows = dedup_ops.prefix_gram_rows(docs, threshold=t)
        cand = set(zip(*(dedup_ops.collide_pairs(rows)[c]
                         for c in ("doc_a", "doc_b"))))
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                if dedup_ops.jaccard(sets_[a], sets_[b]) >= t:
                    assert (a, b) in cand, (a, b, t)


def test_ngram_jaccard_query_matches_brute_force(ray_session):
    """The distributed prefix-filter+join query equals the all-pairs loop."""
    from crawler_ray.pipelines.queries import ngram_jaccard_dups

    sf_dir = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    sets_ = {int(i): dedup_ops.word_ngram_hashes(str(t))
             for i, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(sets_)
    expected = sorted((a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                      if dedup_ops.jaccard(sets_[a], sets_[b]) >= 0.5)
    out = ngram_jaccard_dups(sf_dir)
    assert sorted(zip(out["doc_a"], out["doc_b"])) == expected
    for _, r in out.iterrows():
        j = dedup_ops.jaccard(sets_[int(r["doc_a"])], sets_[int(r["doc_b"])])
        assert r["jaccard"] == round(j, 6)


def test_verifier_blocks_false_positives(ray_session):
    import ray

    shingles_ref = ray.put({i: dedup_ops.shingle_hashes(t)
                            for i, t in enumerate((BASE, NEAR, FAR))})
    v = dedup_ops.PairVerifier(shingles_ref, threshold=0.5)
    batch = pd.DataFrame({"doc_a": np.array([0, 0], np.int64), "doc_b": np.array([1, 2], np.int64)})
    out = v(batch)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(0, 1)]
    assert (out["jaccard"] >= 0.5).all()


def test_df_prefix_rows_lossless_and_smaller(ray_session):
    """df-ordered prefixes (dedup_ops.df_prefix_rows) must produce the
    IDENTICAL verified near-dup set as hash-ordered prefixes while indexing
    no more gram rows (VERDICT r3 #7; rarest-first shrinks collisions)."""
    import os

    import ray.data as rd

    from crawler_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    hash_bands = ds.map_batches(dedup_ops.prefix_gram_rows,
                                fn_kwargs=dict(threshold=0.5),
                                batch_format="pandas").materialize()
    df_bands = dedup_ops.df_prefix_rows(ds, threshold=0.5)
    assert df_bands.count() <= hash_bands.count()
    out_hash = q._near_dup_pairs_streamed(ds, hash_bands,
                                          dedup_ops.word_ngram_sets, 0.5)
    out_df = q._near_dup_pairs_streamed(ds, df_bands,
                                        dedup_ops.word_ngram_sets, 0.5)
    pd.testing.assert_frame_equal(out_hash, out_df)
