"""Similarity search over embedding columns (``list<float>``).

Two paths, both Ray-Data-native:

- **Brute-force cosine top-k** (the exactness baseline): the query matrix is
  broadcast once (``ray.put``), every batch computes a (batch × queries)
  similarity matrix with one float64 matmul and emits its local top-k per
  query; a final tiny ``groupby(qid)`` merge selects the global top-k.
  Wall-clock scales linearly with corpus size and is embarrassingly
  parallel — no shuffle of the corpus itself.

- **LSH-bucketed cosine** (the scale path): random-hyperplane signatures
  (b bits) bucket the corpus; queries probe matching buckets (optionally
  multi-probe with Hamming-1 neighbors). Recall<1 by design; the bucket
  groupby is the only all-to-all exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from crawler_ray.sizing import exchange_width as _W


def _to_matrix(col) -> np.ndarray:
    """list<float32> pandas column → (n, d) float64 matrix."""
    return np.stack([np.asarray(v, np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches kernel: per-batch local top-k per query (partial step)."""

    def __init__(self, queries_ref, k: int = 10):
        import ray

        q = ray.get(queries_ref)  # {"qid": int64[], "mat": (nq, d) float64}
        self.qids = q["qid"]
        self.qmat = _normalize(q["mat"])
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"qid": pd.Series([], dtype=np.int64),
                                 "vid": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        t = _normalize(_to_matrix(batch["embedding"]))
        sims = t @ self.qmat.T  # (batch, nq)
        vids = batch["vec_id"].to_numpy(np.int64)
        k = min(self.k, len(batch))
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            idx = np.argpartition(-col, k - 1)[:k]
            # deterministic order: sim desc, vid asc
            idx = idx[np.lexsort((vids[idx], -col[idx]))]
            out_q.append(np.full(k, qid, np.int64))
            out_v.append(vids[idx])
            out_s.append(col[idx])
        return pd.DataFrame({"qid": np.concatenate(out_q),
                             "vid": np.concatenate(out_v),
                             "sim": np.concatenate(out_s)})


def merge_topk(group: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """map_groups kernel on qid: merge partial top-ks → global top-k."""
    g = group.sort_values(["sim", "vid"], ascending=[False, True], kind="mergesort")
    return g.head(k)


def brute_force_topk(ds, queries_ref, k: int = 10):
    """Dataset driver: embeddings ds → (qid, vid, sim) global top-k rows."""
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k),
        batch_format="pandas",
        concurrency=2,
    )
    return partial.groupby("qid").map_groups(lambda g: merge_topk(g, k), batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (inverted file over a k-means coarse quantizer)
# ---------------------------------------------------------------------------

def kmeans_centroids(mat: np.ndarray, nlist: int = 16, iters: int = 10,
                     seed: int = 3) -> np.ndarray:
    """Deterministic spherical k-means on L2-normalized vectors (cosine
    assignment, renormalized mean update; empty lists keep their centroid).
    Trained on a SAMPLE on the driver — the coarse quantizer is tiny and
    broadcast; assignment of the full corpus stays distributed."""
    m = _normalize(np.asarray(mat, np.float64))
    rng = np.random.default_rng(seed)
    c = m[rng.choice(len(m), min(nlist, len(m)), replace=False)].copy()
    for _ in range(iters):
        assign = (m @ c.T).argmax(axis=1)
        for j in range(len(c)):
            members = m[assign == j]
            if len(members):
                mean = members.mean(axis=0)
                norm = np.linalg.norm(mean)
                if norm:
                    c[j] = mean / norm
    return c


def make_ivf_assigner(centroids: np.ndarray):
    def assigner(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_to_matrix(batch["embedding"]))
        out = batch.copy()
        out["ivf_list"] = (m @ centroids.T).argmax(axis=1).astype(np.int32)
        return out

    return assigner


def ivf_topk(ds, queries: dict, k: int = 10, nlist: int = 16, nprobe: int = 4,
             iters: int = 10, seed: int = 3, train_rows: int = 4096):
    """Approximate top-k via an inverted file: train a coarse quantizer on
    the first ``train_rows`` corpus vectors (driver-side numpy — the
    quantizer is nlist×d, broadcast once), assign the corpus to lists with
    a distributed map_batches, probe each query's ``nprobe`` nearest lists,
    and brute-force only the probed candidates. Recall<1 by design; the
    probed fraction ≈ nprobe/nlist of the corpus."""
    import ray

    sample = _to_matrix(ds.limit(train_rows).to_pandas()["embedding"])
    centroids = kmeans_centroids(sample, nlist, iters, seed)
    qsim = _normalize(queries["mat"]) @ centroids.T
    probe = set()
    for row in qsim:
        probe.update(int(j) for j in np.argsort(-row)[:nprobe])
    assigned = ds.map_batches(make_ivf_assigner(centroids), batch_format="pandas")
    cand = assigned.map_batches(
        lambda b, pr=frozenset(probe): b.loc[b["ivf_list"].isin(pr)],
        batch_format="pandas")
    qref = ray.put(queries)
    return brute_force_topk(cand, qref, k)


# ---------------------------------------------------------------------------
# Persisted IVF index (the reference's analogue is a persistent Postgres
# GiST index behind ST_DWithin, api/main.py:81-90 — repeated queries must
# be index scans, not corpus recomputation)
# ---------------------------------------------------------------------------

def build_ivf_index(ds, index_dir: str, nlist: int = 16, iters: int = 10,
                    seed: int = 3, train_rows: int = 4096) -> dict:
    """Persist the IVF index ONCE: train the coarse quantizer on a corpus
    sample (driver-side numpy — nlist×d, tiny), assign the corpus to lists
    with a distributed map_batches, and write the assignment as parquet
    fragments PARTITIONED BY ivf_list — a later query reads only its
    probed lists' files (an index scan of ≈nprobe/nlist of the corpus).
    The quantizer + params land in a manifest for resume; building is
    atomic (tmp dir + rename) and idempotent (a matching manifest wins).
    Returns the manifest dict."""
    import json
    import os
    import shutil

    params = dict(nlist=nlist, iters=iters, seed=seed, train_rows=train_rows)
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if {k: man[k] for k in params} == params:
            return man
        shutil.rmtree(index_dir, ignore_errors=True)
    sample = _to_matrix(ds.limit(train_rows).to_pandas()["embedding"])
    centroids = kmeans_centroids(sample, nlist, iters, seed)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    assigned = ds.map_batches(make_ivf_assigner(centroids), batch_format="pandas")
    assigned.write_parquet(tmp, partition_cols=["ivf_list"])
    man = dict(params, dim=int(centroids.shape[1]),
               centroids=[[float(x) for x in row] for row in centroids])
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(man, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp, index_dir)
    return man


def ivf_topk_indexed(index_dir: str, queries: dict, k: int = 10,
                     nprobe: int = 4):
    """Approximate top-k over a PERSISTED IVF index: load the quantizer
    from the manifest (tiny), pick each query's ``nprobe`` nearest lists,
    and read ONLY those lists' parquet partitions — no corpus-wide
    assignment pass. Identical results to ``ivf_topk`` with the same
    params (same quantizer, same probed lists, same exact re-rank)."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    centroids = np.asarray(man["centroids"], np.float64)
    qsim = _normalize(queries["mat"]) @ centroids.T
    probe = set()
    for row in qsim:
        probe.update(int(j) for j in np.argsort(-row)[:nprobe])
    import glob as _glob

    paths = [f for j in sorted(probe)
             for f in sorted(_glob.glob(os.path.join(index_dir, f"ivf_list={j}", "*.parquet")))]
    if not paths:  # every probed list is empty — no candidates
        return rd.from_pandas(pd.DataFrame({"qid": pd.Series([], dtype=np.int64),
                                            "vid": pd.Series([], dtype=np.int64),
                                            "sim": pd.Series([], dtype=np.float64)}))
    cand = rd.read_parquet(paths, columns=["vec_id", "embedding"])
    qref = ray.put(queries)
    return brute_force_topk(cand, qref, k)


# ---------------------------------------------------------------------------
# All-pairs near-dup (exact tiled baseline + banded scale path)
# ---------------------------------------------------------------------------

def _tile_pairs(ta, tb, same: bool, threshold: float) -> pd.DataFrame:
    """One (block_a × block_b) tile of the exact all-pairs cosine grid."""
    empty = pd.DataFrame({"vid_a": pd.Series([], dtype=np.int64),
                          "vid_b": pd.Series([], dtype=np.int64),
                          "sim": pd.Series([], dtype=np.float64)})
    # 0-row blocks can surface with the pre-map schema (no vec_id column)
    if ta.num_rows == 0 or tb.num_rows == 0:
        return empty
    # tiles run as RAW ray tasks, possibly in fresh workers that never
    # executed a Ray Data task: blocks whose embedding column is the Ray
    # tensor extension (pandas-sourced upstream) then fail to_pandas unless
    # ray.data's pandas TensorDtype registration has been imported here
    import ray.data  # noqa: F401
    da, db = ta.to_pandas(), tb.to_pandas()
    ia = da["vec_id"].to_numpy(np.int64)
    ib = db["vec_id"].to_numpy(np.int64)
    ma = _normalize(_to_matrix(da["embedding"]))
    mb = _normalize(_to_matrix(db["embedding"]))
    sims = ma @ mb.T
    keep = sims >= threshold
    if same:
        keep &= ia[:, None] < ib[None, :]
    else:
        # the same vec_id can appear in two different blocks (e.g. an
        # upstream per-batch dedup that misses cross-block duplicates) —
        # never emit self-pairs
        keep &= ia[:, None] != ib[None, :]
    ii, jj = np.nonzero(keep)
    va, vb, s = ia[ii], ib[jj], sims[ii, jj]
    lo, hi = np.minimum(va, vb), np.maximum(va, vb)
    return pd.DataFrame({"vid_a": lo, "vid_b": hi, "sim": np.round(s, 6)})


def tiled_near_dup_pairs(ds, threshold: float) -> pd.DataFrame:
    """Exact all-pairs cosine near-dup (sim ≥ threshold) as a DISTRIBUTED
    tile grid — the scale-safe shape of the exactness baseline: the corpus
    blocks are materialized in the object store once, and each of the
    B(B+1)/2 block-pair tiles is one Ray task that fetches exactly TWO
    blocks and emits its qualifying pairs. No whole-corpus broadcast (peak
    task memory = two blocks + one tile of sims), and the driver receives
    only result pairs. Raw Ray tasks are the right tool here: the Dataset
    API has no self-cross-product operator, and the tile grid is the
    standard distributed-GEMM decomposition.

    Why exact and not LSH at LOW thresholds: measured on the testdata
    embeddings (64-d), pairs at sim≈0.45 are ~2σ tail events of the
    random-pair sim distribution (no similarity gap); the hyperplane
    bit-collision rates (≈0.65 for threshold pairs vs 0.5 for random
    pairs) mean any banding with recall≈1 admits MORE candidates than
    all-pairs. Banding becomes the production path only at true near-dup
    thresholds (cos ≳ 0.85) — see ``banded_near_dup_pairs``."""
    import ray

    @ray.remote
    def tile(ta, tb, same, thr):
        return _tile_pairs(ta, tb, same, thr)

    refs = ds.materialize().to_arrow_refs()
    tasks = [tile.remote(refs[i], refs[j], i == j, threshold)
             for i in range(len(refs)) for j in range(i, len(refs))]
    parts = [p for p in ray.get(tasks) if len(p)]
    if not parts:
        return pd.DataFrame({"vid_a": pd.Series([], dtype=np.int64),
                             "vid_b": pd.Series([], dtype=np.int64),
                             "sim": pd.Series([], dtype=np.float64)})
    return pd.concat(parts, ignore_index=True)


def embedding_band_rows(batch: pd.DataFrame, bands: int = 96,
                        band_bits: int = 16, seed: int = 17) -> pd.DataFrame:
    """map_batches kernel: (vec_id, embedding) → LSH band rows for the
    banded near-dup path. Each band owns ``band_bits`` random hyperplanes
    (deterministic seed ⇒ identical planes in every batch); band_hash is
    the packed sign pattern. P[pair at angle θ collides in one band] =
    (1−θ/π)^band_bits; with 96×16-bit bands, recall at cos 0.95 is
    1−4e-9 and random pairs collide at 96×0.5^16 ≈ 1.5e-3."""
    m = _normalize(_to_matrix(batch["embedding"]))
    planes = hyperplanes(m.shape[1], bands * band_bits, seed)
    bits = (m @ planes.T) > 0  # (n, bands*band_bits)
    ids = batch["vec_id"].to_numpy(np.int64)
    rows = []
    for band in range(bands):
        chunk = bits[:, band * band_bits : (band + 1) * band_bits]
        h = np.zeros(len(m), np.int64)
        for i in range(band_bits):
            h |= chunk[:, i].astype(np.int64) << i
        rows.append(pd.DataFrame({"band": np.int32(band), "band_hash": h,
                                  "doc_id": ids}))
    return pd.concat(rows, ignore_index=True)


def verify_cosine_joined(batch: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """map_batches kernel: exact-cosine verification of banded candidate
    pairs whose (L2-normalized, binary-packed) vectors arrive IN the batch
    via two keyed shuffle joins — one vectorized row-wise dot per block,
    no driver-side vector index."""
    empty = pd.DataFrame({"vid_a": pd.Series([], dtype=np.int64),
                          "vid_b": pd.Series([], dtype=np.int64),
                          "sim": pd.Series([], dtype=np.float64)})
    if len(batch) == 0:
        return empty
    va = np.stack([np.frombuffer(x, np.float64) for x in batch["emb_a"]])
    vb = np.stack([np.frombuffer(x, np.float64) for x in batch["emb_b"]])
    sims = (va * vb).sum(axis=1)
    keep = sims >= threshold
    if not keep.any():
        return empty
    a = batch["doc_a"].to_numpy(np.int64)[keep]
    b = batch["doc_b"].to_numpy(np.int64)[keep]
    return pd.DataFrame({"vid_a": np.minimum(a, b), "vid_b": np.maximum(a, b),
                         "sim": np.round(sims[keep], 6)})


def banded_near_dup_pairs(ds, threshold: float = 0.9, bands: int = 96,
                          band_bits: int = 16, seed: int = 17) -> pd.DataFrame:
    """Embedding near-dup pairs at TRUE near-dup thresholds (cos ≳ 0.85),
    fully distributed: hyperplane sign bands → sort-shuffle bucket
    collision (dedup_ops.banded_candidate_pairs) → candidate pairs joined
    back to their packed vectors (two keyed shuffle joins — vector payload
    never crosses the driver) → vectorized exact-cosine verify. Linear in
    corpus + candidates; recall is probabilistic (see embedding_band_rows)
    but ≥1−4e-9 per pair at cos 0.95 with the defaults."""
    import ray.data as rd

    from crawler_ray.functions import dedup_ops

    mat = ds.materialize()
    bands_ds = mat.map_batches(
        embedding_band_rows, fn_kwargs=dict(bands=bands, band_bits=band_bits, seed=seed),
        batch_format="pandas")
    cand = dedup_ops.banded_candidate_pairs(bands_ds, dedup_ops.collide_pairs)
    cand = cand.drop_duplicates(["doc_a", "doc_b"])
    empty = pd.DataFrame({"vid_a": pd.Series([], dtype=np.int64),
                          "vid_b": pd.Series([], dtype=np.int64),
                          "sim": pd.Series([], dtype=np.float64)})
    if len(cand) == 0:
        return empty
    cand_ids = frozenset(cand["doc_a"]) | frozenset(cand["doc_b"])

    def pack(b: pd.DataFrame, key: str, col: str) -> pd.DataFrame:
        b = b.loc[b["vec_id"].isin(cand_ids)]
        m = _normalize(_to_matrix(b["embedding"])) if len(b) else np.zeros((0, 1))
        return pd.DataFrame({key: b["vec_id"].to_numpy(np.int64),
                             col: [row.tobytes() for row in m]})

    a_side = mat.map_batches(lambda b: pack(b, "doc_a", "emb_a"), batch_format="pandas")
    b_side = mat.map_batches(lambda b: pack(b, "doc_b", "emb_b"), batch_format="pandas")
    joined = (rd.from_pandas(cand)
              .join(a_side, join_type="inner", num_partitions=_W(), on=("doc_a",))
              .join(b_side, join_type="inner", num_partitions=_W(), on=("doc_b",)))
    out = joined.map_batches(verify_cosine_joined, fn_kwargs=dict(threshold=threshold),
                             batch_format="pandas").to_pandas()
    return out if len(out) else empty


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------

def hyperplanes(d: int, bits: int = 12, seed: int = 11) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((bits, d))


def lsh_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    out = np.zeros(len(mat), np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def make_lsh_bucketer(planes: np.ndarray):
    def bucketer(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch["embedding"])
        out = batch.copy()
        out["bucket"] = lsh_signature(m, planes)
        return out

    return bucketer


def lsh_topk(ds, queries: dict, k: int = 10, bits: int = 12, seed: int = 11, d: int | None = None):
    """Approximate top-k: bucket corpus by hyperplane signature, search only
    the queries' (multi-probe Hamming≤1) buckets. Returns (qid, vid, sim)."""
    import ray

    d = d or queries["mat"].shape[1]
    planes = hyperplanes(d, bits, seed)
    qsig = lsh_signature(queries["mat"], planes)
    probe: set[int] = set()
    for s in qsig:
        probe.add(int(s))
        for b in range(bits):
            probe.add(int(s) ^ (1 << b))
    bucketed = ds.map_batches(make_lsh_bucketer(planes), batch_format="pandas")
    cand = bucketed.map_batches(
        lambda b, pr=frozenset(probe): b.loc[b["bucket"].isin(pr)], batch_format="pandas"
    )
    qref = ray.put(queries)
    return brute_force_topk(cand, qref, k)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid 2011, "Product Quantization
# for Nearest Neighbor Search" — public). INTEGER-EXACT variant: vectors
# quantize to the same int64 grid cluster.py uses, per-subspace Lloyd runs
# with integer sums/floor means, and ADC scores are integer dot products —
# so codebooks, codes and rankings are bit-identical on any block layout
# and reproducible by a straight-line golden loop.
# ---------------------------------------------------------------------------

PQ_SCALE = 10**6


def pq_subspace_bounds(d: int, m_sub: int) -> np.ndarray:
    """Contiguous subspace boundaries (m_sub+1 ints); near-equal widths."""
    return np.linspace(0, d, m_sub + 1).astype(int)


def pq_grid(mat, scale: int = PQ_SCALE) -> np.ndarray:
    """L2-normalize (float64, per-row — deterministic on any layout) then
    quantize to the int64 grid: integer dot products on this grid rank by
    COSINE, matching the brute-force baseline's order."""
    from crawler_ray.functions.cluster import quantize

    m = np.stack([np.asarray(v, np.float64) for v in mat]) \
        if not isinstance(mat, np.ndarray) else np.asarray(mat, np.float64)
    return quantize(_normalize(m), scale)


def train_pq_codebooks(sample_mat: np.ndarray, m_sub: int = 8,
                       ksub: int = 256, iters: int = 10,
                       scale: int = PQ_SCALE) -> list[np.ndarray]:
    """Train one integer codebook per subspace on a DRIVER-SIDE sample
    (the codebooks are m·ksub·dsub ints — tiny, broadcast once; corpus
    encoding stays distributed). Vectors normalize to the unit sphere
    before gridding (pq_grid) so ADC ranks by cosine. Same determinism
    rules as cluster.kmeans_quantized: init = first ksub sample rows
    (caller fixes sample order), integer squared-L2 assignment with
    ties → lowest index, centroid = coordinate-wise ``sum // count``,
    emptied clusters keep their centroid."""
    from crawler_ray.functions.cluster import assign_ids

    x = pq_grid(sample_mat, scale)
    d = x.shape[1]
    bounds = pq_subspace_bounds(d, m_sub)
    books: list[np.ndarray] = []
    for m in range(m_sub):
        xs = x[:, bounds[m]:bounds[m + 1]]
        k = min(ksub, len(xs))
        c = xs[:k].copy()
        for _ in range(iters):
            a = assign_ids(xs, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, xs)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            c = np.where((cnt == 0)[:, None], c,
                         sums // np.maximum(cnt, 1)[:, None])
        books.append(c)
    return books


def pq_encode(mat_int: np.ndarray, books: list[np.ndarray],
              bounds: np.ndarray) -> np.ndarray:
    """(n, d) grid vectors → (n, m) uint8 codes (nearest centroid per
    subspace, integer L2, ties → lowest index)."""
    from crawler_ray.functions.cluster import assign_ids

    return np.stack([
        assign_ids(mat_int[:, bounds[m]:bounds[m + 1]], books[m])
        for m in range(len(books))], axis=1).astype(np.uint8)


class PQScorer:
    """map_batches kernel: encode a corpus batch and emit its local ADC
    top-k per query — the PQ twin of BruteForceTopK. The (m, ksub) lookup
    tables are integer dot products of each query subvector with each
    centroid, built once per actor; a batch's score is m table lookups
    summed, never a d-dim matmul."""

    def __init__(self, model_ref, k: int = 10):
        import ray

        books, bounds, q = ray.get(model_ref)
        self.books, self.bounds, self.k = books, bounds, k
        self.qids = q["qid"]
        qi = pq_grid(q["mat"])
        # luts[m]: (nq, ksub) int64
        self.luts = [qi[:, bounds[m]:bounds[m + 1]] @ books[m].T
                     for m in range(len(books))]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": pd.Series([], dtype=np.int64),
                              "vid": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.int64)})
        if len(batch) == 0:
            return empty
        codes = pq_encode(pq_grid(batch["embedding"]),
                          self.books, self.bounds)
        nq = len(self.qids)
        scores = np.zeros((len(batch), nq), np.int64)
        for m, lut in enumerate(self.luts):
            scores += lut[:, codes[:, m]].T        # (batch, nq)
        vids = batch["vec_id"].to_numpy(np.int64)
        k = min(self.k, len(batch))
        out_q, out_v, out_s = [], [], []
        for j in range(nq):
            col = scores[:, j]
            # integer ADC scores TIE heavily (identical codes ⇒ identical
            # scores), so the local top-k must be the k smallest under the
            # FULL (score desc, vid asc) order — an argpartition on score
            # alone would keep a layout-dependent subset of a tie run
            idx = np.lexsort((vids, -col))[:k]
            out_q.append(np.full(k, self.qids[j], np.int64))
            out_v.append(vids[idx])
            out_s.append(col[idx])
        return pd.DataFrame({"qid": np.concatenate(out_q),
                             "vid": np.concatenate(out_v),
                             "score": np.concatenate(out_s)})


def pq_topk(ds, train_ds, queries: dict, k: int = 10, m_sub: int = 8,
            ksub: int = 256, iters: int = 10):
    """Approximate top-k via ADC over PQ codes: train codebooks on the
    driver-side ``train_ds`` sample (caller bounds it — e.g. a vec_id
    range so the sample is layout-independent), broadcast (books, bounds,
    queries) once, scan the corpus with PQScorer (local integer top-k per
    batch), and merge per qid. Memory per vector is m bytes of codes —
    the 100-TB story is the 8-byte-per-vector scan; the corpus embedding
    column never shuffles."""
    import ray

    sample = train_ds.to_pandas().sort_values("vec_id")
    books = train_pq_codebooks(_to_matrix(sample["embedding"]),
                               m_sub=m_sub, ksub=ksub, iters=iters)
    bounds = pq_subspace_bounds(sum(b.shape[1] for b in books), m_sub)
    model_ref = ray.put((books, bounds, queries))
    partial = ds.map_batches(
        PQScorer, fn_constructor_kwargs=dict(model_ref=model_ref, k=k),
        batch_format="pandas", concurrency=2)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vid"], ascending=[False, True],
                          kind="mergesort")
        return g.head(k)

    return partial.groupby("qid").map_groups(merge, batch_format="pandas")


def pq_topk_rerank(ds, train_ds, queries: dict, k: int = 10, r: int = 200,
                   m_sub: int = 8, ksub: int = 256, iters: int = 10):
    """The classic two-stage PQ pipeline (Jégou et al. 2011 §V-B): ADC
    candidate generation — top-``r`` per query over the 8-byte codes —
    followed by an EXACT cosine rerank of only the candidate union (a
    result-scale id set broadcast via ray.put; the second pass touches
    float vectors for candidates alone). The code scan stays memory-bound;
    recall is set by ``r``; the final order is exact cosine. Returns
    (qid, vid, sim) rows like brute_force_topk."""
    import ray

    cand = pq_topk(ds, train_ds, queries, k=r, m_sub=m_sub, ksub=ksub,
                   iters=iters).to_pandas()
    idref = ray.put(set(cand["vid"].astype(int)))

    class CandidateFilter:
        def __init__(self):
            self.ids = ray.get(idref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["vec_id"].isin(self.ids)]

    filtered = ds.map_batches(CandidateFilter, batch_format="pandas",
                              concurrency=(1, 4))
    return brute_force_topk(filtered, ray.put(queries), k)
