"""Deduplication operators for training-data pipelines (SURVEY.md §2.7+).

The reference only has exact URL/content dedup (D1/D2). A 100 TB corpus
engine needs near-dup too; this module provides the batch kernels and
Dataset drivers for:

- exact dedup        hash-partition on xxh64(text) + per-group first-wins
- MinHash + LSH      shingle → k minhashes → b bands → band-bucket groupby
                     → candidate pairs → exact-Jaccard verify
- SimHash            64-bit simhash + 4-way band blocking → Hamming verify
- n-gram Jaccard     direct pairwise verify kernel (used by both)

Scale notes: every stage is a ``map_batches`` or ``groupby`` — the only
all-to-all exchanges are the band-bucket groupbys keyed on (band, band_hash)
and the final pair dedup. Candidate pairs are verified with the exact
kernel before being reported, so LSH false positives never escape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.hashing import xxh64, xxh64_array
from crawler_ray.sizing import exchange_width as _W

def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit hashes of the k-byte shingles of ``text``,
    computed fully vectorized: sliding windows over the UTF-8 byte array,
    k FNV-style fold steps, then an avalanche mix (no per-shingle Python)."""
    b = np.frombuffer(text.lower().encode("utf-8"), np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.uint64)
    if len(b) < k:
        win = b[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(b, k)
    h = np.full(len(win), 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    for i in range(win.shape[1]):
        h = (h ^ win[:, i].astype(np.uint64)) * prime
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC2B2AE3D27D4EB4F)
    h ^= h >> np.uint64(29)
    return np.unique(h)


def _perm_seeds(num_perm: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 1 << 63, num_perm, dtype=np.uint64)


def minhash_signature(sh: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """num_perm minhashes of a shingle-hash set: min over shingles of the
    xxh64-avalanche remix of (hash ^ seed_i) — fully vectorized (perms ×
    shingles matrix)."""
    if len(sh) == 0:
        return np.full(len(seeds), np.iinfo(np.uint64).max, np.uint64)
    x = sh[None, :] ^ seeds[:, None]
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC2B2AE3D27D4EB4F)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0x165667B19E3779F9)
    x ^= x >> np.uint64(32)
    return x.min(axis=1)


def minhash_bands(batch: pd.DataFrame, num_perm: int = 32, bands: int = 8,
                  k: int = 5, seed: int = 7) -> pd.DataFrame:
    """map_batches kernel: doc → (band, band_hash, doc_id) rows for LSH,
    vectorized across the batch: the per-doc shingle sets concatenate into
    one flat array, each permutation's remix+min runs as ONE numpy pass
    (``np.minimum.reduceat`` over doc segments), and the per-band
    signature hashes go through the vectorized ``xxh64_array`` — per-doc
    Python remains only in the shingle windowing (variable-length text).
    Output values are identical to the per-doc formulation (band-row
    order differs; downstream bucket collision is order-insensitive)."""
    seeds = _perm_seeds(num_perm, seed)
    n = len(batch)
    r = num_perm // bands
    doc_ids = batch["doc_id"].to_numpy(np.int64)
    sh_list = [shingle_hashes(str(t), k) for t in batch["text"]]
    lengths = np.array([len(s) for s in sh_list], np.int64)
    total = int(lengths.sum())
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, np.uint64)
    if total:
        flat = np.concatenate(sh_list)
        nz = np.nonzero(lengths)[0]
        seg = np.concatenate([[0], np.cumsum(lengths[nz])[:-1]])
        for j in range(num_perm):
            x = flat ^ seeds[j]
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xC2B2AE3D27D4EB4F)
            x ^= x >> np.uint64(29)
            x *= np.uint64(0x165667B19E3779F9)
            x ^= x >> np.uint64(32)
            sigs[nz, j] = np.minimum.reduceat(x, seg)
    pieces = []
    for band in range(bands):
        chunk = np.ascontiguousarray(sigs[:, band * r : (band + 1) * r])
        hb = xxh64_array([row.tobytes() for row in chunk])
        pieces.append(pd.DataFrame({"band": np.full(n, band, np.int32),
                                    "band_hash": hb.astype(np.uint64),
                                    "doc_id": doc_ids}))
    return pd.concat(pieces, ignore_index=True)


# Above this many pairs, connected_components routes to the distributed
# rounds instead of the in-memory numpy fixpoint.
CC_INMEM_PAIR_LIMIT = 5_000_000


def connected_components(pairs: pd.DataFrame, all_ids=None) -> pd.DataFrame:
    """Near-dup clusters from verified pairs: iterative min-label
    propagation (each round every node takes the min label among itself and
    its neighbors; converges in O(diameter) rounds). Verified-pair sets are
    usually orders of magnitude smaller than the corpus, so the rounds run
    as a vectorized numpy fixpoint here (factorize once, ``np.minimum.at``
    per round — no per-node Python loop); past ``CC_INMEM_PAIR_LIMIT`` the
    identical dataflow runs distributed (``connected_components_ds``:
    per-round hash join + groupby(node).min shuffle)."""
    if len(pairs) > CC_INMEM_PAIR_LIMIT:
        import ray.data as rd
        lab = connected_components_ds(rd.from_pandas(pairs)).to_pandas()
        if all_ids is not None:
            extra = np.setdiff1d(np.asarray(sorted(all_ids), np.int64),
                                 lab["doc_id"].to_numpy(np.int64))
            lab = pd.concat([lab, pd.DataFrame({"doc_id": extra, "cluster_id": extra})],
                            ignore_index=True)
        return lab.sort_values("doc_id").reset_index(drop=True)
    a = pairs["doc_a"].to_numpy(np.int64)
    b = pairs["doc_b"].to_numpy(np.int64)
    ids, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    node = np.concatenate([codes[: len(a)], codes[len(a):]])
    peer = np.concatenate([codes[len(a):], codes[: len(a)]])
    lab = ids.copy()
    while True:
        new = lab.copy()
        np.minimum.at(new, node, lab[peer])
        if np.array_equal(new, lab):
            break
        lab = new
    label = dict(zip(ids.tolist(), lab.tolist()))
    out_ids = ids.tolist() if all_ids is None else sorted(set(all_ids) | set(ids.tolist()))
    return pd.DataFrame({
        "doc_id": np.array(out_ids, np.int64),
        "cluster_id": np.array([label.get(i, i) for i in out_ids], np.int64),
    })


def connected_components_ds(pairs_ds, max_rounds: int = 64,
                            num_partitions: int | None = None):
    """Distributed connected components over a PAIRS DATASET — the
    web-scale path (billions of nodes; neither edges nor labels ever fit
    on the driver). Each round is one hash join (labels onto edge peers)
    + one node-keyed repartition + a per-block VECTORIZED pandas
    groupby-min (Ray's native groupby aggregate costs ~1.5 ms of Python
    per group — see queries._sorted_fold — so at node cardinality it is
    never used here). Self-loops make a node's own label participate in
    the min, so the fixpoint is exactly min-label propagation; the keyed
    repartition co-locates each node's rows, making every per-block min
    globally exact. Convergence is a scalar sum(label) — labels only ever
    decrease, so an unchanged sum IS the fixpoint. Returns a Dataset of
    (doc_id, cluster_id); only per-round scalar sums touch the driver."""
    from ray.data.context import ShuffleStrategy

    num_partitions = num_partitions or _W()

    def both_dirs_self(b: pd.DataFrame) -> pd.DataFrame:
        a = b["doc_a"].to_numpy(np.int64)
        c = b["doc_b"].to_numpy(np.int64)
        return pd.DataFrame({"node": np.concatenate([a, c, a, c]),
                             "peer": np.concatenate([c, a, a, c])})

    def block_min(b: pd.DataFrame) -> pd.DataFrame:
        m = b.groupby("node", as_index=False)["label"].min()
        # labels are keyed by `peer` so the next round's join needs no rename
        return pd.DataFrame({"peer": m["node"].to_numpy(np.int64),
                             "label": m["label"].to_numpy(np.int64)})

    # one node-keyed exchange builds deduped edges AND (for free, same
    # blocks) the identity-propagated initial labels: with each node's rows
    # co-located, per-block dedup and per-block min are globally exact
    e0 = pairs_ds.map_batches(both_dirs_self, batch_format="pandas")
    e0.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    edges = (e0.repartition(num_partitions, keys=["node"])
             .map_batches(lambda b: b.drop_duplicates(["node", "peer"]),
                          batch_format="pandas", batch_size=None)
             .materialize())
    labels = (edges.map_batches(
        lambda b: block_min(b.rename(columns={"peer": "label"})),
        batch_format="pandas", batch_size=None).materialize())
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        nxt = (edges.join(labels, join_type="inner",
                          num_partitions=num_partitions, on=("peer",))
               .map_batches(lambda b: b[["node", "label"]], batch_format="pandas"))
        nxt.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        labels = (nxt.repartition(num_partitions, keys=["node"])
                  .map_batches(block_min, batch_format="pandas", batch_size=None)
                  .materialize())
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(f"connected_components_ds: no fixpoint in {max_rounds} rounds")
    out = labels.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["peer"].to_numpy(np.int64),
                                "cluster_id": b["label"].to_numpy(np.int64)}),
        batch_format="pandas")
    # all shuffles above are materialized; un-flip the chain's context
    # snapshot so downstream composition doesn't inherit HASH_SHUFFLE
    # (a leaked HASH_SHUFFLE hangs groupby().map_groups — see CLAUDE.md)
    from ray.data import DataContext
    out.context.shuffle_strategy = DataContext.get_current().shuffle_strategy
    return out


def collide_pairs(bands: pd.DataFrame) -> pd.DataFrame:
    """(band, band_hash, doc_id) rows → unique candidate pairs, touching only
    colliding buckets: a vectorized duplicated() mask removes the (vast)
    singleton majority first, then pairs expand per surviving bucket.

    Used as the per-block kernel AFTER a (band, band_hash)-keyed repartition:
    every bucket is then fully contained in one block, so per-block pairs are
    exactly the global candidate set (modulo cross-band pair duplicates,
    deduped by a second keyed pass)."""
    dup = bands.duplicated(["band", "band_hash"], keep=False)
    hot = bands.loc[dup]
    if len(hot) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64)})
    pieces = [bucket_pairs(g) for _, g in hot.groupby(["band", "band_hash"])]
    out = pd.concat(pieces, ignore_index=True)
    return out.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)


def _edge_mask(b: pd.DataFrame) -> pd.Series:
    """Rows belonging to the FIRST or LAST (band, band_hash) bucket of a
    sorted block — the only buckets that can straddle block boundaries."""
    first = (b["band"] == b["band"].iloc[0]) & (b["band_hash"] == b["band_hash"].iloc[0])
    last = (b["band"] == b["band"].iloc[-1]) & (b["band_hash"] == b["band_hash"].iloc[-1])
    return first | last


# Edge rows beyond this count stop being a driver concat and fall back to a
# keyed repartition (a pathological hot (band, band_hash) bucket spanning
# blocks would otherwise put O(bucket) rows on the driver).
EDGE_ROWS_DRIVER_LIMIT = 2_000_000


def banded_candidate_pairs_ds(bands_ds, collide_block_fn):
    """Distributed LSH bucket collision WITHOUT a keyed repartition: sort
    the band rows (keys land in ordered block ranges), run the vectorized
    collide kernel per block over its COMPLETE buckets, and resolve the ≤2
    possibly-straddling edge buckets per block centrally (bucket-scale
    rows, not corpus-scale). Returns a DATASET of candidate pairs — the
    corpus-fraction candidate set never touches the driver (may contain
    cross-band/cross-block duplicates; callers dedup distributed, e.g. via
    ``dedup_pairs_sorted``).

    Why not repartition(keys=...): HASH_SHUFFLE spawns aggregator actors
    per execution (~seconds); why not groupby().map_groups: per-group
    Python over the singleton-bucket majority. The sort path keeps every
    data-sized step vectorized and block-local.

    The sorted band table is materialized once so the inner-pairs and
    edge-buckets passes share it (re-sorting would double the shuffle);
    Ray's object store spills it to disk past memory — acceptable for an
    intermediate that is ~bands× the id column, never the documents."""
    import ray.data as rd

    s = bands_ds.sort(["band", "band_hash"]).materialize()

    def inner(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return collide_block_fn(b)
        return collide_block_fn(b.loc[~_edge_mask(b)])

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return b.loc[_edge_mask(b)]

    inner_ds = s.map_batches(inner, batch_format="pandas", batch_size=None)
    edge_ds = s.map_batches(edges, batch_format="pandas", batch_size=None).materialize()
    if edge_ds.count() > EDGE_ROWS_DRIVER_LIMIT:
        # Pathological hot bucket(s) straddling blocks: resolve edge buckets
        # with a (band, band_hash)-keyed repartition (each bucket lands whole
        # in one block) instead of a driver concat — degrades loudly to a
        # distributed exchange rather than OOMing the driver.
        import logging

        from ray.data.context import ShuffleStrategy

        logging.getLogger(__name__).warning(
            "banded_candidate_pairs: %d edge rows exceed the driver limit "
            "(%d); resolving edge buckets via keyed repartition",
            edge_ds.count(), EDGE_ROWS_DRIVER_LIMIT)
        edge_ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # materialize INSIDE this branch: the keyed repartition must plan
        # under edge_ds's HASH_SHUFFLE context snapshot — unioned lazily it
        # would re-plan under the downstream dataset's (sort-shuffle) context
        edge_pairs_ds = (edge_ds.repartition(_W(), keys=["band", "band_hash"])
                         .map_batches(collide_block_fn, batch_format="pandas",
                                      batch_size=None).materialize())
    else:
        edge_rows = edge_ds.to_pandas()
        if len(edge_rows) == 0:
            # fully-empty input yields a SCHEMA-LESS empty frame here (no
            # band columns), so the sort below would KeyError
            return inner_ds
        edge_pairs = collide_block_fn(
            edge_rows.sort_values(["band", "band_hash"], kind="mergesort"))
        if len(edge_pairs) == 0:
            return inner_ds
        edge_pairs_ds = rd.from_pandas(edge_pairs)
    return inner_ds.union(edge_pairs_ds)


def banded_candidate_pairs(bands_ds, collide_block_fn) -> pd.DataFrame:
    """Driver-frame variant of ``banded_candidate_pairs_ds`` for RESULT-scale
    pair sets — i.e. collide kernels that verify in-bucket (Hamming paths),
    whose output is the final near-dup set, not a corpus-fraction candidate
    set. Candidate-scale callers (MinHash/ngram prefix collision) must use
    the Dataset variant."""
    return banded_candidate_pairs_ds(bands_ds, collide_block_fn).to_pandas()


def dedup_pairs_sorted(pairs_ds, cols: tuple = ("doc_a", "doc_b")):
    """Distributed candidate-pair dedup: ONE sort co-locates equal pairs
    into adjacent positions and each block drops its in-block copies.
    The only survivors are copies of a pair straddling a block seam — at
    most one extra copy per seam — which cost one redundant verification
    each and are removed by the caller's result-scale final dedup. Chosen
    over a (doc_a, doc_b)-keyed HASH_SHUFFLE repartition (exactly-once but
    spawns aggregator actors per execution, ~seconds of fixed cost)."""
    return (pairs_ds.sort(list(cols))
            .map_batches(dedup_pairs_block, batch_format="pandas",
                         batch_size=None))


def dedup_pairs_block(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-block global pair dedup (run after a (doc_a, doc_b)-keyed
    repartition co-locates every copy of a pair)."""
    cols = [c for c in ("doc_a", "doc_b", "image_a", "image_b") if c in batch.columns]
    return batch.drop_duplicates(cols)


def doc_shingles(batch: pd.DataFrame, k: int = 5,
                 keep_ids: frozenset | None = None) -> pd.DataFrame:
    """map_batches kernel: (doc_id, text) → (doc_id, shingles list<uint64>),
    optionally restricted to ``keep_ids`` (the candidate-doc semi-join —
    shingles are computed distributed, only for docs that appear in a
    candidate pair)."""
    if keep_ids is not None:
        batch = batch.loc[batch["doc_id"].isin(keep_ids)]
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(np.int64),
        "shingles": [shingle_hashes(str(t), k) for t in batch["text"]],
    })


_WORD_RE = None  # compiled lazily so module import stays regex-free


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique 64-bit hashes of the word n-grams of ``text``.
    Tokens = lowercase ``[a-z0-9]+`` runs (everything else separates),
    grams = n consecutive tokens joined by one space — EXACTLY the set the
    DuckDB oracle builds from
    ``string_split_regex(lower(text), '[^a-z0-9]+')``, so hash-set
    intersections equal gram-string intersections (2^-64-scale collision
    odds, the same stand-in convention as the shingle path)."""
    global _WORD_RE
    if _WORD_RE is None:
        import re

        _WORD_RE = re.compile(r"[a-z0-9]+")
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < n:
        return np.zeros(0, np.uint64)
    grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return np.unique(xxh64_array(grams))


def word_ngram_sets(batch: pd.DataFrame, n: int = 3,
                    keep_ids: frozenset | None = None) -> pd.DataFrame:
    """map_batches kernel: (doc_id, text) → (doc_id, shingles) where
    ``shingles`` is the sorted word-n-gram hash set — the n-gram analogue of
    ``doc_shingles``, sharing its column name so the pair join+verify path
    is reused verbatim."""
    if keep_ids is not None:
        batch = batch.loc[batch["doc_id"].isin(keep_ids)]
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(np.int64),
        "shingles": [word_ngram_hashes(str(t), n) for t in batch["text"]],
    })


def prefix_gram_rows(batch: pd.DataFrame, n: int = 3,
                     threshold: float = 0.5) -> pd.DataFrame:
    """map_batches kernel for PREFIX FILTERING (AllPairs / PPJoin family):
    (doc_id, text) → (band=0, band_hash=gram_hash, doc_id) rows for the
    first ``m - ceil(t*m) + 1`` grams of each doc's hash-ordered gram set.

    Losslessness: J(A,B) ≥ t ⇒ |A∩B| ≥ max(⌈t·|A|⌉, ⌈t·|B|⌉), and two sets
    with overlap ≥ α must collide within their first ``size - α + 1``
    elements under ANY shared total order (here: ascending hash). Our
    prefixes are supersets of those, so every qualifying pair collides on
    ≥1 indexed gram; non-qualifying collisions are killed by exact verify.
    Hash order avoids a global document-frequency pass; a df-ascending
    order would shrink candidates further at corpus scale (hot-gram
    buckets also fall under banded_candidate_pairs' edge/skew guard)."""
    hashes, docs = [], []
    for doc_id, text in zip(batch["doc_id"].to_numpy(np.int64), batch["text"]):
        g = word_ngram_hashes(str(text), n)
        m = len(g)
        if m == 0:
            continue
        p = m - int(np.ceil(threshold * m)) + 1
        hashes.append(g[:p])
        docs.append(np.full(p, doc_id, np.int64))
    if not hashes:
        return pd.DataFrame({"band": pd.Series([], dtype=np.int32),
                             "band_hash": pd.Series([], dtype=np.uint64),
                             "doc_id": pd.Series([], dtype=np.int64)})
    h = np.concatenate(hashes)
    return pd.DataFrame({"band": np.zeros(len(h), np.int32),
                         "band_hash": h,
                         "doc_id": np.concatenate(docs)})


def gram_rows_with_size(batch: pd.DataFrame, n: int = 3) -> pd.DataFrame:
    """(doc_id, text) → one row per UNIQUE word-n-gram: (doc_id, gram, m)
    where m is the doc's gram-set size (carried so the prefix length can be
    computed after a shuffle without rejoining the doc)."""
    ids, grams, sizes = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_numpy(np.int64), batch["text"]):
        g = word_ngram_hashes(str(text), n)
        m = len(g)
        if m == 0:
            continue
        grams.append(g)
        ids.append(np.full(m, doc_id, np.int64))
        sizes.append(np.full(m, m, np.int64))
    if not grams:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "gram": pd.Series([], dtype=np.uint64),
                             "m": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({"doc_id": np.concatenate(ids),
                         "gram": np.concatenate(grams),
                         "m": np.concatenate(sizes)})


def _pick_df_prefix(b: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Per-block prefix pick (requires each doc's rows CO-LOCATED): order a
    doc's grams by (df asc, gram asc) — one consistent global total order —
    and keep the first m - ⌈t·m⌉ + 1."""
    empty = pd.DataFrame({"band": pd.Series([], dtype=np.int32),
                          "band_hash": pd.Series([], dtype=np.uint64),
                          "doc_id": pd.Series([], dtype=np.int64)})
    if len(b) == 0:
        return empty
    b = b.sort_values(["doc_id", "df", "gram"], kind="mergesort")
    rank = b.groupby("doc_id").cumcount().to_numpy(np.int64)
    m = b["m"].to_numpy(np.int64)
    p = m - np.ceil(threshold * m).astype(np.int64) + 1
    kept = b.loc[rank < p]
    return pd.DataFrame({"band": np.zeros(len(kept), np.int32),
                         "band_hash": kept["gram"].to_numpy(np.uint64),
                         "doc_id": kept["doc_id"].to_numpy(np.int64)})


def df_prefix_rows(ds, threshold: float = 0.5, n: int = 3,
                   num_partitions: int | None = None):
    """DOCUMENT-FREQUENCY-ordered prefix filtering (the PPJoin refinement
    the hash-ordered ``prefix_gram_rows`` docstring anticipates): index each
    doc's RAREST grams first, so prefix collisions — and hence candidates —
    drop sharply versus an arbitrary hash order, at the cost of one global
    df pass. Fully distributed: unique gram rows → gram-keyed repartition +
    per-block value_counts (exact global df; gram cardinality is unbounded,
    so no broadcast) → hash join of df back onto the gram rows → doc-keyed
    repartition + per-block prefix pick. Losslessness is inherited from the
    prefix-filter theorem: (df asc, gram asc) is one shared total order, so
    every pair with J ≥ t still collides within its prefixes. Returns the
    same (band, band_hash, doc_id) layout as ``prefix_gram_rows``."""
    from ray.data.context import ShuffleStrategy

    def attach_df(b: pd.DataFrame) -> pd.DataFrame:
        # gram-keyed co-location makes the block-local row count per gram
        # the GLOBAL document frequency (rows are unique per (doc, gram)) —
        # one transform, no separate count pass, no join. Empty partitions
        # arrive schema-less; emit the typed shape explicitly.
        if len(b) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "gram": pd.Series([], dtype=np.uint64),
                                 "m": pd.Series([], dtype=np.int64),
                                 "df": pd.Series([], dtype=np.int64)})
        b = b.copy()
        b["df"] = b.groupby("gram")["doc_id"].transform("size").astype(np.int64)
        return b

    num_partitions = num_partitions or _W()
    rows = ds.map_batches(gram_rows_with_size, fn_kwargs=dict(n=n),
                          batch_format="pandas")
    rows.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    with_df = (rows.repartition(num_partitions, keys=["gram"])
               .map_batches(attach_df, batch_format="pandas", batch_size=None)
               .materialize())
    out = (with_df.repartition(num_partitions, keys=["doc_id"])
           .map_batches(_pick_df_prefix, fn_kwargs=dict(threshold=threshold),
                        batch_format="pandas", batch_size=None)
           .materialize())
    # every shuffle above is materialized; un-flip the shared context
    # snapshot so the caller's downstream sort doesn't plan under
    # HASH_SHUFFLE (a leaked flip hangs groupby().map_groups — CLAUDE.md)
    from ray.data import DataContext
    out.context.shuffle_strategy = DataContext.get_current().shuffle_strategy
    return out


def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups kernel on (band, band_hash): emit candidate doc pairs."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64)})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})


def jaccard(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique shingle-hash sets."""
    if len(sh_a) == 0 and len(sh_b) == 0:
        return 1.0
    inter = len(np.intersect1d(sh_a, sh_b, assume_unique=True))
    return inter / (len(sh_a) + len(sh_b) - inter)


def verify_joined_pairs(batch: pd.DataFrame, threshold: float = 0.5,
                        a_col: str = "sh_a", b_col: str = "sh_b") -> pd.DataFrame:
    """map_batches kernel: exact-Jaccard verification of candidate pairs
    whose shingle sets arrive IN the batch (attached by two keyed shuffle
    joins of the pair table against the shingle dataset) — no driver-side
    shingle index at any scale: verification survives candidate sets that
    are a corpus fraction, because the shingle payload only ever moves
    through the join exchange, never through the driver."""
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=np.float64)})
    if len(batch) == 0:
        return empty

    def _sh(v) -> np.ndarray:
        # shingle sets travel through the join as plain binary (uint64 LE
        # bytes) — Arrow's hash join rejects tensor-extension payload columns
        return np.frombuffer(v, np.uint64) if isinstance(v, (bytes, bytearray)) \
            else np.asarray(v, np.uint64)

    sims = np.array([jaccard(_sh(sa), _sh(sb))
                     for sa, sb in zip(batch[a_col], batch[b_col])], np.float64)
    keep = sims >= threshold
    if not keep.any():
        return empty
    return pd.DataFrame({"doc_a": batch["doc_a"].to_numpy(np.int64)[keep],
                         "doc_b": batch["doc_b"].to_numpy(np.int64)[keep],
                         "jaccard": np.round(sims[keep], 6)})


class PairVerifier:
    """Actor-pool stage: exact-Jaccard verification of candidate pairs.

    Holds a doc_id → shingle-set index fetched ONCE per actor from a
    broadcast ref (ray.put on the driver). Small-candidate-set variant —
    the production query path uses ``verify_joined_pairs`` (shuffle joins)
    so no driver shingle index exists at corpus-fraction candidate scale."""

    def __init__(self, shingles_ref, threshold: float = 0.5):
        import ray

        self.shingles = ray.get(shingles_ref)
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keep, sims = [], []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sim = jaccard(self.shingles[int(a)], self.shingles[int(b)])
            keep.append(sim >= self.threshold)
            sims.append(sim)
        out = batch.copy()
        out["jaccard"] = np.round(np.array(sims, np.float64), 6)
        return out.loc[np.array(keep, bool)]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over token xxh64s (sign-sum of hash bits), vectorized
    over the exploded token table: ONE xxh64_array pass for every token in
    the batch, then a (tokens × 64) sign matrix reduced per doc with
    ``np.add.reduceat`` over the token-sorted segments — no per-document
    Python in the hash/accumulate path (identical output to the per-doc
    formulation; checked by the brute-force golden)."""
    text = batch["text"].astype("string")
    words = text.str.lower().str.findall(r"[A-Za-z0-9_一-鿿]+")
    n = len(batch)
    out = batch[["doc_id"]].copy()
    lengths = np.array([len(ws) if isinstance(ws, list) else 0 for ws in words], np.int64)
    total = int(lengths.sum())
    if total == 0:
        out["simhash"] = np.zeros(n, np.int64)
        return out
    flat: list[str] = []
    for ws in words:
        if isinstance(ws, list):
            flat.extend(ws)
    hs = xxh64_array(flat)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = 2 * bits - 1
    nz = np.nonzero(lengths)[0]  # docs with ≥1 token, in flat order
    seg_starts = np.concatenate([[0], np.cumsum(lengths[nz])[:-1]])
    acc = np.zeros((n, 64), np.int64)
    acc[nz] = np.add.reduceat(contrib, seg_starts, axis=0)
    pos = acc > 0
    val = np.zeros(n, np.uint64)
    for i in range(64):
        val |= pos[:, i].astype(np.uint64) << np.uint64(i)
    out["simhash"] = val.view(np.int64)
    return out


def hash_bands(batch: pd.DataFrame, bands: int = 4, id_col: str = "doc_id",
               hash_col: str = "simhash", carry_cols: tuple = ()) -> pd.DataFrame:
    """(id, 64-bit hash) → ``bands`` band rows of 64/bands bits each. By
    pigeonhole, any pair at Hamming ≤ bands−1 collides in ≥1 band — choose
    ``bands ≥ max_hamming+1`` for a recall guarantee at that radius.
    ``carry_cols`` are replicated into every band row (e.g. a corpus-side
    tag for cross-corpus collision kernels)."""
    width = 64 // bands
    sh = batch[hash_col].to_numpy(np.int64).view(np.uint64)
    mask = np.uint64((1 << width) - 1)
    rows = []
    for band in range(bands):
        chunk = (sh >> np.uint64(width * band)) & mask
        cols = {
            "band": np.int32(band), "band_hash": chunk.astype(np.int64),
            id_col: batch[id_col].to_numpy(),
            hash_col: batch[hash_col].to_numpy(np.int64)}
        for c in carry_cols:
            cols[c] = batch[c].to_numpy()
        rows.append(pd.DataFrame(cols))
    return pd.concat(rows, ignore_index=True)


def simhash_bands(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, simhash) → 4 band rows of 16 bits each; Hamming≤3 dups must
    collide in ≥1 band (pigeonhole)."""
    return hash_bands(batch, bands=4)


def _hamming64(x: np.ndarray) -> np.ndarray:
    ham = np.zeros(len(x), np.int32)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int32)
        x = x >> np.uint64(1)
        if not x.any():
            break
    return ham


def hamming_bucket_pairs(group: pd.DataFrame, max_hamming: int,
                         id_col: str = "doc_id", hash_col: str = "simhash",
                         a_col: str = "doc_a", b_col: str = "doc_b") -> pd.DataFrame:
    """One band bucket → verified pairs at Hamming ≤ max_hamming. Works for
    int64 doc ids and string image ids alike (ids sort lexicographically)."""
    g = group.drop_duplicates(id_col).sort_values(id_col)
    ids = g[id_col].to_numpy()
    empty = pd.DataFrame({a_col: pd.Series([], dtype=ids.dtype if len(ids) else np.int64),
                          b_col: pd.Series([], dtype=ids.dtype if len(ids) else np.int64),
                          "hamming": pd.Series([], dtype=np.int32)})
    if len(ids) < 2:
        return empty
    hs = g[hash_col].to_numpy(np.int64).view(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    ham = _hamming64(hs[ii] ^ hs[jj])
    keep = ham <= max_hamming
    return pd.DataFrame({a_col: ids[ii][keep], b_col: ids[jj][keep], "hamming": ham[keep]})


def simhash_bucket_pairs(group: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    return hamming_bucket_pairs(group, max_hamming)


def hamming_collide_block(batch: pd.DataFrame, max_hamming: int = 3,
                          id_col: str = "doc_id", hash_col: str = "simhash",
                          a_col: str = "doc_a", b_col: str = "doc_b",
                          id_dtype=np.int64) -> pd.DataFrame:
    """Per-block kernel AFTER a (band, band_hash)-keyed repartition: drop the
    singleton-bucket majority with one vectorized duplicated() mask, then
    emit Hamming-verified pairs per surviving bucket."""
    empty = pd.DataFrame({a_col: pd.Series([], dtype=id_dtype),
                          b_col: pd.Series([], dtype=id_dtype),
                          "hamming": pd.Series([], dtype=np.int32)})
    if len(batch) == 0:
        return empty
    dup = batch.duplicated(["band", "band_hash"], keep=False)
    hot = batch.loc[dup]
    if len(hot) == 0:
        return empty
    pieces = [hamming_bucket_pairs(g, max_hamming, id_col, hash_col, a_col, b_col)
              for _, g in hot.groupby(["band", "band_hash"])]
    out = pd.concat(pieces, ignore_index=True)
    if len(out) == 0:
        return empty
    return out.drop_duplicates([a_col, b_col]).reset_index(drop=True)


CROSS_HAMMING_CHUNK = 4096  # new-side rows per dense Hamming slice


def cross_hamming_bucket_pairs(group: pd.DataFrame, max_hamming: int,
                               id_col: str = "image_id",
                               hash_col: str = "phash",
                               side_col: str = "side",
                               a_col: str = "new_id",
                               b_col: str = "ref_id") -> pd.DataFrame:
    """One band bucket → CROSS-corpus pairs only: (new-side id, ref-side
    id) at Hamming ≤ max_hamming. The incremental-dedup primitive — a new
    crawl wave checks against the existing corpus without paying the
    ref×ref quadratic term (the dominant cost when |ref| ≫ |new|)."""
    g = group.drop_duplicates(id_col)
    new = g.loc[g[side_col] == 1].sort_values(id_col)
    ref = g.loc[g[side_col] == 0].sort_values(id_col)
    ids_n = new[id_col].to_numpy()
    ids_r = ref[id_col].to_numpy()
    empty = pd.DataFrame({a_col: pd.Series([], dtype=object),
                          b_col: pd.Series([], dtype=object),
                          "hamming": pd.Series([], dtype=np.int32)})
    if len(ids_n) == 0 or len(ids_r) == 0:
        return empty
    hn = new[hash_col].to_numpy(np.int64).view(np.uint64)
    hr = ref[hash_col].to_numpy(np.int64).view(np.uint64)
    # chunk the new side against the whole ref array: a degenerate hot
    # bucket (e.g. constant-color phashes banding together) would otherwise
    # allocate one dense |new|×|ref| int64 grid; per-slice peak memory is
    # CROSS_HAMMING_CHUNK×|ref| regardless of bucket size (ADVICE r05)
    parts = []
    for lo in range(0, len(ids_n), CROSS_HAMMING_CHUNK):
        hi = lo + CROSS_HAMMING_CHUNK
        ham = _hamming64((hn[lo:hi, None] ^ hr[None, :]).ravel())
        pos = np.flatnonzero(ham <= max_hamming)
        if len(pos):
            ii, jj = pos // len(ids_r), pos % len(ids_r)
            parts.append(pd.DataFrame({a_col: ids_n[lo + ii],
                                       b_col: ids_r[jj],
                                       "hamming": ham[pos]}))
    if not parts:
        return empty
    return pd.concat(parts, ignore_index=True)


def cross_hamming_collide_block(batch: pd.DataFrame, max_hamming: int = 6,
                                id_col: str = "image_id",
                                hash_col: str = "phash",
                                side_col: str = "side",
                                a_col: str = "new_id",
                                b_col: str = "ref_id") -> pd.DataFrame:
    """Per-block kernel after banding: keep only buckets containing BOTH
    sides (one duplicated() mask over (band, band_hash) plus a per-bucket
    side check), then emit cross-side Hamming-verified pairs."""
    empty = pd.DataFrame({a_col: pd.Series([], dtype=object),
                          b_col: pd.Series([], dtype=object),
                          "hamming": pd.Series([], dtype=np.int32)})
    if len(batch) == 0:
        return empty
    dup = batch.duplicated(["band", "band_hash"], keep=False)
    hot = batch.loc[dup]
    if len(hot) == 0:
        return empty
    pieces = [cross_hamming_bucket_pairs(g, max_hamming, id_col, hash_col,
                                         side_col, a_col, b_col)
              for _, g in hot.groupby(["band", "band_hash"])
              if g[side_col].nunique() == 2]
    if not pieces:
        return empty
    out = pd.concat(pieces, ignore_index=True)
    if len(out) == 0:
        return empty
    return out.drop_duplicates([a_col, b_col]).reset_index(drop=True)
