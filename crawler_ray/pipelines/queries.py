"""Relational + training-data query surface over the TPC-H-ish testdata.

Each entry mirrors an operator family from SURVEY.md §2 (A=aggregates,
J=joins/lookups, K=sort/limit/top-k, D=dedup, plus the training-data ops the
100 TB engine adds). Every SQL-expressible query has a DuckDB oracle in
``ORACLE_SQL`` with IDENTICAL output column names; rows-only entries (LSH,
SimHash, langid, ANN-LSH, multimodal) are checked by the driver for rows.

Design rules applied throughout (see repo README):
- prune columns at ``read_parquet``
- pre-aggregate inside ``map_batches`` before any ``groupby`` shuffle
- broadcast small sides (``ray.put`` / captured dicts), never shuffle them
- floats that cross the DuckDB comparison are explicitly rounded on BOTH
  sides (summation-order noise otherwise flips value hashes)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from crawler_ray.functions import ann, dedup_ops, scan, textops
from crawler_ray.hashing import xxh64_array
from crawler_ray.sizing import exchange_width as _W



def _keyed(ds):
    """Enable keyed ``Dataset.repartition(keys=...)`` on THIS dataset only:
    each Dataset snapshots DataContext at creation, so flipping the
    snapshot's shuffle_strategy scopes HASH_SHUFFLE to this chain — a leaked
    GLOBAL HASH_SHUFFLE hangs unrelated groupby().map_groups pipelines
    (see CLAUDE.md)."""
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def _sorted_fold(ds, keys: list[str], fold_fn):
    """Distributed aggregate for UNBOUNDED key spaces: a sort shuffle
    co-locates keys into ordered block ranges, each block folds with one
    vectorized pandas groupby, and only the folded (result-sized) rows
    reach the driver for a final boundary merge — a key straddling two
    adjacent sorted blocks appears twice, so ``fold_fn`` runs once more.

    Why not ``ds.groupby(keys).aggregate(...)``: Ray 2.49's sort-based
    aggregate reduce costs ~1.5 ms of per-group Python (measured: 15 s for
    95k groups at 32 cpus); this path is ~15× faster at identical results.
    The query contract returns the result DataFrame to the driver anyway,
    so driver memory is O(result), never O(input)."""
    folded = (ds.sort(keys)
              .map_batches(fold_fn, batch_format="pandas", batch_size=None)
              .to_pandas())
    return fold_fn(folded)


def _fold(ds, keys: list[str], aggs: dict):
    """Final fold of combiner partials ON THE DRIVER.

    Every caller pre-aggregates inside ``map_batches`` (the combiner), so the
    partial set is O(batches × groups) — bounded small by construction. Ray's
    distributed groupby pays tens of seconds of fixed shuffle cost regardless
    of size (measured), so the final O(groups) merge is cheaper as a single
    pandas fold. At cluster scale with unbounded group counts, swap this for
    ``ds.groupby(keys).aggregate(...)`` — the combiner stays identical.
    """
    df = ds.to_pandas()
    if len(df) == 0:
        return df
    return df.groupby(keys, as_index=False).agg(**aggs)


def _read(sf_dir: str, table: str, columns: list[str] | None = None, **kw):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kw)


# Dimension tables at or below this row count broadcast as a ray.put dict
# (zero shuffle of the fact side); above it the attach becomes a distributed
# hash join — at 100× data a broadcast dim is GBs pickled into every actor.
DIM_BROADCAST_ROW_LIMIT = int(os.environ.get("GRAFT_DIM_BROADCAST_ROWS", "5000000"))


def _attach_dim(ds, sf_dir: str, dim_table: str, dim_key: str, dim_col: str,
                fact_key: str):
    """Fact⋈dim attach with a SIZE SWITCH. The dim's row count comes from
    parquet metadata alone (no data read for the decision). Small dims ship
    once per actor via ``ray.put`` and attach with a vectorized ``map`` —
    the right shape for a true dimension table; past
    ``DIM_BROADCAST_ROW_LIMIT`` the dim is scanned distributed and attached
    with a left-outer hash join (NaN where unmatched, matching the map
    path's semantics)."""
    path = f"{sf_dir}/{dim_table}.parquet"
    n_dim = pq.ParquetFile(path).metadata.num_rows
    if n_dim <= DIM_BROADCAST_ROW_LIMIT:
        dim = pq.read_table(path, columns=[dim_key, dim_col])
        ref = ray.put(dict(zip(dim[dim_key].to_pylist(), dim[dim_col].to_pylist())))

        class Attach:
            def __init__(self):
                self.m = ray.get(ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                return b.assign(**{dim_col: b[fact_key].map(self.m)})

        return ds.map_batches(Attach, batch_format="pandas", concurrency=(1, 8))
    dim_ds = rd.read_parquet(path, columns=[dim_key, dim_col])
    return (ds.join(dim_ds, join_type="left_outer", num_partitions=_W(),
                    on=(fact_key,), right_on=(dim_key,))
            .map_batches(lambda b: b.drop(columns=[dim_key], errors="ignore"),
                         batch_format="pandas"))


# ---------------------------------------------------------------------------
# Aggregates (A1–A3 analogues)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped rollup: partial per-batch aggregation (combiner) →
    tiny groupby — the shuffle moves O(groups), not O(rows)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
               filter=pc.field("l_shipdate") <= pa.scalar(pd.Timestamp("1998-09-02")))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(disc_price=b["l_extendedprice"] * (1 - b["l_discount"]))
        g = b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"), sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"))
        return g

    out = _fold(ds.map_batches(partial, batch_format="pandas"),
                ["l_returnflag", "l_linestatus"],
                dict(sum_qty=("sum_qty", "sum"), sum_base_price=("sum_base_price", "sum"),
                     sum_disc_price=("sum_disc_price", "sum"), sum_disc=("sum_disc", "sum"),
                     count_order=("count_order", "sum")))
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(2)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(2)
    out["avg_disc"] = (out["sum_disc"] / out["count_order"]).round(4)
    out = out.drop(columns=["sum_disc"])
    # rounding grids chosen so the exact decimal value lies ON the grid (not
    # at a boundary): prices have 2 decimals, price×(1−disc) products 4 —
    # float summation-order noise (~1e-8) then can't flip the rounding
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_base_price"] = out["sum_base_price"].round(2)
    out["sum_disc_price"] = out["sum_disc_price"].round(4)
    out["count_order"] = out["count_order"].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def heatmap_grid(sf_dir: str):
    """A1 heatmap: grid-bin two measures, count, top-10000 by weight."""
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"qbin": np.floor(b["l_quantity"]).astype(np.int64),
                          "pbin": np.floor(b["l_extendedprice"] / 1000.0).astype(np.int64)})
        return g.groupby(["qbin", "pbin"], as_index=False).size().rename(columns={"size": "cnt"})

    out = _fold(ds.map_batches(partial, batch_format="pandas"),
                ["qbin", "pbin"], dict(cnt=("cnt", "sum")))
    out["cnt"] = out["cnt"].astype(np.int64)
    out = out.sort_values(["cnt", "qbin", "pbin"], ascending=[False, True, True], kind="mergesort")
    return out.head(10000).reset_index(drop=True)


def domain_top10(sf_dir: str):
    """A2 domain distribution: count per source, top-10 (deterministic ties)."""
    ds = _read(sf_dir, "documents", ["source"])
    out = _fold(
        ds.map_batches(lambda b: b.groupby("source", as_index=False).size().rename(columns={"size": "cnt"}),
                       batch_format="pandas"),
        ["source"], dict(cnt=("cnt", "sum")))
    out["cnt"] = out["cnt"].astype(np.int64)
    out = out.sort_values(["cnt", "source"], ascending=[False, True], kind="mergesort")
    return out.head(10).reset_index(drop=True)


def crawl_stats(sf_dir: str):
    """A3 global conditional counts (single-row result)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_total": [len(b)],
                             "n_open": [int((b["o_orderstatus"] == "O").sum())],
                             "n_done": [int((b["o_orderstatus"] == "F").sum())]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame({
        "n_total": [int(p["n_total"])], "n_open": [int(p["n_open"])], "n_done": [int(p["n_done"])],
        "done_rate": [round(p["n_done"] / p["n_total"], 4)],
    })


# ---------------------------------------------------------------------------
# Filters / joins (J3–J6, K-family)
# ---------------------------------------------------------------------------

def bbox_filter(sf_dir: str):
    """J5 range-predicate filter, pushed into the Arrow scan."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity", "l_discount"],
               filter=((pc.field("l_quantity") >= 10) & (pc.field("l_quantity") <= 20)
                       & (pc.field("l_discount") >= 0.02) & (pc.field("l_discount") <= 0.06)))
    return ds


def nearby_radius(sf_dir: str):
    """J4 radius lookup: distance predicate then count per type."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = np.sqrt((b["value"] - 50.0) ** 2 + (b["user_id"] % 10) ** 2)
        return b.loc[d.to_numpy() <= 6.0].groupby("event_type", as_index=False).size().rename(columns={"size": "cnt"})

    out = _fold(ds.map_batches(partial, batch_format="pandas"),
                ["event_type"], dict(cnt=("cnt", "sum")))
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def similar_parts(sf_dir: str):
    """J3 band self-join: pairs of same-type parts within ±10 price,
    counted per type. groupby(p_type) co-locates; a sorted two-pointer
    counts pairs in O(n log n) per group (no quadratic blowup)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_type", "p_retailprice"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        p = np.sort(group["p_retailprice"].to_numpy(np.float64))
        hi = np.searchsorted(p, p + 10.0, side="right")
        n_pairs = int((hi - np.arange(len(p)) - 1).sum())
        if n_pairs == 0:
            return pd.DataFrame({"p_type": pd.Series([], dtype=str),
                                 "n_pairs": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"p_type": [group["p_type"].iloc[0]], "n_pairs": [n_pairs]})

    return ds.groupby("p_type").map_groups(pairs, batch_format="pandas")


def region_rollup(sf_dir: str):
    """J1 broadcast dimension join: nation⋈region read once on the driver,
    captured as a dict; no shuffle of the fact table."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nk_to_region = dict(zip(nation["n_nationkey"],
                            nation["n_regionkey"].map(dict(zip(region["r_regionkey"], region["r_name"])))))
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(b: pd.DataFrame, m=nk_to_region) -> pd.DataFrame:
        b = b.assign(r_name=b["c_nationkey"].map(m))
        return b.groupby("r_name", as_index=False).agg(n_customers=("c_acctbal", "size"),
                                                       total_acctbal=("c_acctbal", "sum"))

    out = _fold(ds.map_batches(partial, batch_format="pandas"), ["r_name"],
                dict(n_customers=("n_customers", "sum"), total_acctbal=("total_acctbal", "sum")))
    out["n_customers"] = out["n_customers"].astype(np.int64)
    out["total_acctbal"] = out["total_acctbal"].round(2)
    return out.sort_values("r_name").reset_index(drop=True)


def orders_join(sf_dir: str):
    """Fact⋈dim join: the customer→segment dim attaches into the orders
    scan via `_attach_dim`'s size switch (broadcast dict below the row
    limit, distributed hash join above), then combiner + tiny groupby."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = _attach_dim(ds, sf_dir, "customer", "c_custkey", "c_mktsegment",
                         "o_custkey")

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_totalprice", "size"), total_price=("o_totalprice", "sum"))

    out = _fold(joined.map_batches(agg, batch_format="pandas"),
                ["c_mktsegment"], dict(n_orders=("n_orders", "sum"), total_price=("total_price", "sum")))
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["total_price"] = out["total_price"].round(2)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def topk_orders(sf_dir: str):
    """K3 top-k: sort desc + limit (deterministic tiebreak)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)


def pagination(sf_dir: str):
    """K4 LIMIT/OFFSET pagination (page 2 of 100)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    page = ds.sort("o_orderkey").limit(200).to_pandas().iloc[100:200]
    return page.reset_index(drop=True)


def priority_distribution(sf_dir: str):
    """K1 analogue: strict priority-class counts, ordered by class."""
    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    out = _fold(ds.map_batches(lambda b: b.groupby("o_orderpriority", as_index=False).size().rename(columns={"size": "cnt"}),
                               batch_format="pandas"),
                ["o_orderpriority"], dict(cnt=("cnt", "sum")))
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def orders_lineitem_join(sf_dir: str):
    """Large⋈large distributed hash join (Dataset.join, hash-partitioned on
    the key): revenue per order priority. The join shuffles both sides once;
    the rollup pre-aggregates before its tiny groupby."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"l_orderkey": b["l_orderkey"],
                             "revenue": b["l_extendedprice"] * (1 - b["l_discount"])})

    joined = li.map_batches(rev, batch_format="pandas").join(
        orders, join_type="inner", num_partitions=_W(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderpriority", as_index=False).agg(
            n_items=("revenue", "size"), total_revenue=("revenue", "sum"))

    out = _fold(joined.map_batches(partial, batch_format="pandas"), ["o_orderpriority"],
                dict(n_items=("n_items", "sum"), total_revenue=("total_revenue", "sum")))
    out["n_items"] = out["n_items"].astype(np.int64)
    out["total_revenue"] = out["total_revenue"].round(4)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def union_streams(sf_dir: str):
    """D4 stream union: two source datasets unioned then rolled up."""
    open_o = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]).filter(
        lambda r: r["o_orderstatus"] == "O")
    done_o = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]).filter(
        lambda r: r["o_orderstatus"] == "F")
    u = open_o.union(done_o)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderstatus", as_index=False).agg(
            n=("o_orderkey", "size"), total=("o_totalprice", "sum"))

    out = _fold(u.map_batches(partial, batch_format="pandas"), ["o_orderstatus"],
                dict(n=("n", "sum"), total=("total", "sum")))
    out["n"] = out["n"].astype(np.int64)
    out["total"] = out["total"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


# Synthetic time base shared by the as-of / range joins below: orders are
# mapped onto the events' January-2024 window with EXACT integer-second
# arithmetic ((o_orderkey*9973) mod 30 days), so the engine and the DuckDB
# oracle derive bit-identical timestamps with no date-math drift.
_T0_US = 1_704_067_200_000_000  # TIMESTAMP '2024-01-01' in epoch µs


def _quote_times_us(okey: np.ndarray) -> np.ndarray:
    return _T0_US + ((okey.astype(np.int64) * 9973) % 2_592_000) * 1_000_000


def asof_join_quotes(sf_dir: str):
    """Point-in-time (as-of) join — for every event, the latest order
    "quote" of the same key at or before the event's timestamp, via the
    generic big⋈big operator `functions.joins.asof_join` (one global sort
    shuffle + per-block vectorized forward fill + driver seam fold; see
    its module docstring for the seam/state bounds)."""
    from crawler_ray.functions.joins import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def ev_prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "user_id": b["user_id"].to_numpy(np.int64),
            "t": b["ts"].astype("datetime64[us]").astype("int64").to_numpy()})

    def quote_prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": b["o_custkey"].to_numpy(np.int64) % 150,
            "rt": _quote_times_us(b["o_orderkey"].to_numpy(np.int64)),
            "price": b["o_totalprice"].round(2).to_numpy()})

    joined = asof_join(events.map_batches(ev_prep, batch_format="pandas"),
                       orders.map_batches(quote_prep, batch_format="pandas"),
                       left_id="event_id", key="user_id", time="t",
                       right_key="k", right_time="rt", right_value="price")
    out = pd.DataFrame({"event_id": joined["event_id"],
                        "user_id": joined["user_id"],
                        "asof_price": pd.Series(joined["price"]).fillna(-1.0).round(2)})
    return out.sort_values("event_id").reset_index(drop=True)


def events_in_windows(sf_dir: str):
    """Interval (range) join — events falling inside sparse time windows
    derived from high-value orders. Ray Data has no BETWEEN join; the
    distributed formulation is bin replication: each window replicates into
    every fixed-width time bin it overlaps (≤2 here), each event maps to
    exactly ONE bin, and a hash join on the bin key turns the range
    predicate into an equality join + a vectorized residual filter — each
    (event, window) pair meets exactly once, so no dedup pass is needed.
    Window counts then fold via the unbounded-key sort+fold path. When the
    window side is small, broadcasting it per batch is the cheaper shape;
    bin replication needs neither side bounded."""
    BIN_US = 86_400_000_000  # 1-day bins: windows are ≤4 h ⇒ ≤2 bins each

    events = _read(sf_dir, "events", ["event_id", "ts", "value"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def windows(b: pd.DataFrame) -> pd.DataFrame:
        from crawler_ray.functions.joins import replicate_intervals

        okey = b["o_orderkey"].to_numpy(np.int64)
        okey = okey[okey % 97 == 0]  # sparse high-interest windows
        ws = _quote_times_us(okey)
        we = ws + ((okey * 31) % 240 + 1) * 60_000_000  # 1..240 minutes
        return replicate_intervals(
            pd.DataFrame({"o_orderkey": okey, "ws": ws, "we": we}),
            start="ws", end="we", bin_width=BIN_US)

    def tag_events(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(np.int64),
                             "t": t, "value": b["value"].to_numpy(),
                             "bin": t // BIN_US})

    joined = (events.map_batches(tag_events, batch_format="pandas")
              .join(orders.map_batches(windows, batch_format="pandas"),
                    join_type="inner", num_partitions=_W(),
                    on=("bin",), right_on=("wbin",)))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["t"].to_numpy()
        m = (b["ws"].to_numpy() <= t) & (t <= b["we"].to_numpy())
        return (b.loc[m].groupby("o_orderkey", as_index=False)
                .agg(n_events=("value", "size"), sum_value=("value", "sum")))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderkey", as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))

    out = _sorted_fold(joined.map_batches(partial, batch_format="pandas"),
                       ["o_orderkey"], fold)
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def _murmur64(x: np.ndarray) -> np.ndarray:
    """DuckDB-compatible 64-bit hash (the murmur64 finalizer DuckDB's
    ``hash()`` applies to integers — public algorithm, verified against
    DuckDB output), vectorized so the engine-side sample predicate matches
    the SQL oracle bit-for-bit."""
    x = np.asarray(x, np.uint64).copy()
    x ^= x >> np.uint64(32)
    x *= np.uint64(0xD6E8FEB86659FD93)
    x ^= x >> np.uint64(32)
    x *= np.uint64(0xD6E8FEB86659FD93)
    x ^= x >> np.uint64(32)
    return x


def seeded_sample(sf_dir: str, seed: int = 42):
    """K5 deterministic seeded sampling: hash-based Bernoulli — keep rows
    where murmur64(o_orderkey XOR seed) % 10 == 0. Same seed ⇒ identical
    sample on ANY cluster size or block layout (``random_sample``'s draw
    depends on block iteration order), and the predicate is expressible in
    DuckDB, so the sample is fully oracle-checkable. Reproducibility is
    additionally asserted by running the distributed filter twice."""
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def pick(b: pd.DataFrame, s=seed) -> pd.DataFrame:
        h = _murmur64(b["o_orderkey"].to_numpy(np.int64).view(np.uint64) ^ np.uint64(s))
        return b.loc[(h % np.uint64(10)) == 0]

    a = np.sort(ds.map_batches(pick, batch_format="pandas").to_pandas()["o_orderkey"].to_numpy(np.int64))
    b = np.sort(ds.map_batches(pick, batch_format="pandas").to_pandas()["o_orderkey"].to_numpy(np.int64))
    assert (a == b).all(), "seeded sample must be reproducible"
    return pd.DataFrame({"o_orderkey": a})


# ---------------------------------------------------------------------------
# Dedup (D1) + streaming-shaped (events)
# ---------------------------------------------------------------------------

def dedup_first(sf_dir: str):
    """D1 first-wins dedup: first event per user (min event_id) + count.

    Cluster-safe aggregate path: per-batch combiner (shrinks the shuffle to
    O(batches × users-per-batch)) → DISTRIBUTED ``groupby(user_id)`` — the
    group-key space is unbounded (one group per user), so the final merge
    must shuffle, not fold on the driver."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False).agg(first_event_id=("event_id", "min"),
                                                        n_events=("event_id", "size"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False).agg(
            first_event_id=("first_event_id", "min"), n_events=("n_events", "sum"))

    out = _sorted_fold(ds.map_batches(partial, batch_format="pandas"), ["user_id"], fold)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def exact_dedup_docs(sf_dir: str):
    """D1 on content: exact text dedup via xxh64(text) hash partition →
    per-group representative (min doc_id) + duplicate count."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hash_stage(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                             "text_hash": xxh64_array(b["text"])})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("text_hash", as_index=False).agg(rep_doc_id=("doc_id", "min"),
                                                          dup_count=("doc_id", "size"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("text_hash", as_index=False).agg(
            rep_doc_id=("rep_doc_id", "min"), dup_count=("dup_count", "sum"))

    # ~one group per distinct text ⇒ unbounded keys: sort shuffle + per-block
    # vectorized fold (the combiner still shrinks each batch first)
    out = _sorted_fold(ds.map_batches(hash_stage, batch_format="pandas")
                       .map_batches(partial, batch_format="pandas"),
                       ["text_hash"], fold)
    out = out[["rep_doc_id", "dup_count"]].astype(np.int64)
    return out.sort_values("rep_doc_id").reset_index(drop=True)


def events_window(sf_dir: str):
    """Tumbling 1-hour window aggregate per user (streaming analogue)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # explicit µs resolution: datetime64[ns] inputs would otherwise make
        # the // 3_600_000_000 divisor off by 1000× (dtype-dependent bins)
        win = (b["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000).astype(np.int64)
        g = b.assign(win=win).groupby(["user_id", "win"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        return g

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "win"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))

    # user×hour key space is unbounded ⇒ sort shuffle + per-block fold
    out = _sorted_fold(ds.map_batches(partial, batch_format="pandas"),
                       ["user_id", "win"], fold)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(2)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["win"] = out["win"].astype(np.int64)
    return out.sort_values(["user_id", "win"]).reset_index(drop=True)


def events_sliding_window(sf_dir: str):
    """Sliding 1-hour window with a 30-minute hop, aggregated per window:
    each event lands in exactly two windows (duplicated in the per-batch
    partial), then the unbounded window-key space folds via sort +
    per-block aggregation."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["ts"].astype("datetime64[us]").astype("int64") // 1_800_000_000).astype(np.int64)
        two = pd.concat([pd.DataFrame({"win": h, "value": b["value"].to_numpy()}),
                         pd.DataFrame({"win": h - 1, "value": b["value"].to_numpy()})],
                        ignore_index=True)
        return two.groupby("win", as_index=False).agg(n_events=("value", "size"),
                                                      sum_value=("value", "sum"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("win", as_index=False).agg(n_events=("n_events", "sum"),
                                                    sum_value=("sum_value", "sum"))

    out = _sorted_fold(ds.map_batches(partial, batch_format="pandas"), ["win"], fold)
    out["win"] = out["win"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("win").reset_index(drop=True)


def sessionize(sf_dir: str):
    """Session windows: per-user 30-min-gap sessionization, distributed as
    sort + per-block fold: sort by (user_id, ts, event_id) co-locates each
    user's events into ordered block ranges, each block counts its
    session-break gaps with one vectorized diff, and the driver merges
    per-user partials plus one boundary row per block (the seam gap between
    adjacent blocks of the same user). Replaces groupby(user).map_groups,
    whose ~1.5 ms/group Python cost (measured, Ray 2.49) is the slow path
    at 10⁸–10⁹ users."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    s = ds.sort(["user_id", "ts", "event_id"]).materialize()
    GAP_US = 1800 * 1_000_000

    def block_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_breaks": pd.Series([], dtype=np.int64)})
        u = b["user_id"].to_numpy(np.int64)
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        brk = np.concatenate([[False], (u[1:] == u[:-1]) & ((t[1:] - t[:-1]) > GAP_US)])
        return (pd.DataFrame({"user_id": u, "brk": brk})
                .groupby("user_id", as_index=False).agg(n_breaks=("brk", "sum")))

    def block_bounds(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"first_user": pd.Series([], dtype=np.int64),
                                 "first_ts": pd.Series([], dtype=np.int64),
                                 "last_user": pd.Series([], dtype=np.int64),
                                 "last_ts": pd.Series([], dtype=np.int64)})
        t = b["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"first_user": [np.int64(b["user_id"].iloc[0])],
                             "first_ts": [np.int64(t.iloc[0])],
                             "last_user": [np.int64(b["user_id"].iloc[-1])],
                             "last_ts": [np.int64(t.iloc[-1])]})

    parts = s.map_batches(block_partial, batch_format="pandas", batch_size=None).to_pandas()
    bounds = s.map_batches(block_bounds, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby("user_id", as_index=False)["n_breaks"].sum()
    bounds = bounds.sort_values(["first_user", "first_ts", "last_user", "last_ts"],
                                kind="mergesort").reset_index(drop=True)
    seam_user = bounds["first_user"].to_numpy()[1:]
    seam = ((seam_user == bounds["last_user"].to_numpy()[:-1])
            & ((bounds["first_ts"].to_numpy()[1:] - bounds["last_ts"].to_numpy()[:-1]) > GAP_US))
    if seam.any():
        extra = (pd.Series(seam_user[seam]).value_counts()
                 .rename_axis("user_id").reset_index(name="extra"))
        agg = agg.merge(extra, on="user_id", how="left")
        agg["n_breaks"] += agg["extra"].fillna(0).astype(np.int64)
        agg = agg.drop(columns=["extra"])
    out = pd.DataFrame({"user_id": agg["user_id"].astype(np.int64),
                        "n_sessions": (agg["n_breaks"] + 1).astype(np.int64)})
    return out.sort_values("user_id").reset_index(drop=True)


def event_quantiles(sf_dir: str):
    """Exact per-group quantiles (p50/p95 of value per event type). The
    group-key space is bounded (a handful of event types), so each group's
    values gather into one ``map_groups`` block for an exact interpolated
    quantile; at unbounded group counts swap for a sort + global-rank
    two-pass (the ``_sorted_fold`` family)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50": [round(float(np.quantile(v, 0.5)), 4)],
            "p95": [round(float(np.quantile(v, 0.95)), 4)],
        })

    out = ds.groupby("event_type").map_groups(q, batch_format="pandas").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (ROW_NUMBER-window analogue): the k highest-price
    orders per market segment. Per-batch combiner keeps its local top-k
    per segment (broadcast dim join for the segment), so the driver folds
    only O(batches × segments × k) rows."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    joined = _attach_dim(ds, sf_dir, "customer", "c_custkey", "c_mktsegment",
                         "o_custkey")

    def topk_combiner(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort")
        return b.groupby("c_mktsegment", as_index=False).head(k)[
            ["c_mktsegment", "o_orderkey", "o_totalprice"]]

    parts = joined.map_batches(topk_combiner, batch_format="pandas").to_pandas()
    out = (parts.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True], kind="mergesort")
           .groupby("c_mktsegment", as_index=False).head(k))
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    return out.sort_values(["c_mktsegment", "o_orderkey"]).reset_index(drop=True)


def distinct_langs(sf_dir: str):
    """Set op: distinct values of one column."""
    ds = _read(sf_dir, "documents", ["lang"])
    langs = sorted(ds.unique("lang"))
    return pd.DataFrame({"lang": langs})


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def token_stats(sf_dir: str):
    """Token counting (\\w+) aggregated per language."""
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = textops.token_count(b["text"].astype("string"))
        return b.assign(t=toks).groupby("lang", as_index=False).agg(
            n_docs=("t", "size"), total_tokens=("t", "sum"))

    out = _fold(ds.map_batches(partial, batch_format="pandas"), ["lang"],
                dict(n_docs=("n_docs", "sum"), total_tokens=("total_tokens", "sum")))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_tokens"] = out["total_tokens"].astype(np.int64)
    out["avg_tokens"] = (out["total_tokens"] / out["n_docs"]).round(2)
    return out.sort_values("lang").reset_index(drop=True)


def text_quality(sf_dir: str):
    """Quality scoring aggregates per language (punct ratio, length)."""
    ds = _read(sf_dir, "documents", ["text", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pr = textops.punct_ratio(b["text"].astype("string"), b["n_chars"])
        return b.assign(pr=pr).groupby("lang", as_index=False).agg(
            n_docs=("pr", "size"), sum_chars=("n_chars", "sum"), sum_pr=("pr", "sum"))

    out = _fold(ds.map_batches(partial, batch_format="pandas"), ["lang"],
                dict(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"), sum_pr=("sum_pr", "sum")))
    out["avg_chars"] = (out["sum_chars"] / out["n_docs"]).round(2)
    out["avg_punct_ratio"] = (out["sum_pr"] / out["n_docs"]).round(4)
    out = out[["lang", "n_docs", "avg_chars", "avg_punct_ratio"]]
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", Table A1). The required-stopword list is a parameter: the
# canonical English list is (the, be, to, of, and, that, have, with); the
# default below is adapted to the synthetic fixture's lexicon so the rule
# discriminates on the test tables (swap lists, same operator).
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on")


def gopher_quality_gate(sf_dir: str):
    """Gopher document-quality rules (Rae et al. 2021) as one vectorized
    zero-shuffle pass: word-count bounds [50, 100k], mean word length in
    [3, 10] chars, symbol-to-word ratio (# or ...) <= 0.1, >= 80 % of
    words containing an alphabetic character, and >= 2 distinct required
    stopwords. Line-level rules (bullet/ellipsis line fractions) are
    omitted — the fixture corpus is single-line by construction.

    All ratios are integer ppm with floor division so the DuckDB oracle
    reproduces every boundary bit-exactly. Per-doc verdicts fold into a
    per-lang rule-failure profile (a doc can fail several rules at once);
    nothing corpus-scale leaves the workers."""
    ds = _read(sf_dir, "documents", ["text", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["text"].astype("string").str.split(" ")
        n = ts.str.len().to_numpy(np.int64)          # >= 1 ('' -> [''])
        sum_len = b["n_chars"].to_numpy(np.int64) - (n - 1)
        ex = ts.explode()
        alpha = ex.str.contains(r"[a-zA-Z]", regex=True).groupby(level=0).sum()
        sym = (ex.str.contains("#", regex=False)
               | ex.str.contains("...", regex=False)).groupby(level=0).sum()
        stop = ex[ex.isin(GOPHER_STOPWORDS)].groupby(level=0).nunique()
        idx = ts.index
        n_alpha = alpha.reindex(idx, fill_value=0).to_numpy(np.int64)
        n_sym = sym.reindex(idx, fill_value=0).to_numpy(np.int64)
        n_stop = stop.reindex(idx, fill_value=0).to_numpy(np.int64)
        mw_ppm = (1_000_000 * sum_len) // n
        f_words = (n < GOPHER_MIN_WORDS) | (n > GOPHER_MAX_WORDS)
        f_wordlen = (mw_ppm < 3_000_000) | (mw_ppm > 10_000_000)
        f_symbol = (1_000_000 * n_sym) // n > 100_000
        f_alpha = (1_000_000 * n_alpha) // n < 800_000
        f_stop = n_stop < 2
        stats = pd.DataFrame({
            "lang": b["lang"].astype(object),
            "f_words": f_words.astype(np.int64),
            "f_wordlen": f_wordlen.astype(np.int64),
            "f_symbol": f_symbol.astype(np.int64),
            "f_alpha": f_alpha.astype(np.int64),
            "f_stop": f_stop.astype(np.int64)})
        stats["p"] = ((stats[["f_words", "f_wordlen", "f_symbol", "f_alpha",
                              "f_stop"]].sum(axis=1) == 0)).astype(np.int64)
        return stats.groupby("lang", as_index=False).agg(
            n_docs=("p", "size"), n_pass=("p", "sum"),
            n_fail_words=("f_words", "sum"), n_fail_wordlen=("f_wordlen", "sum"),
            n_fail_symbol=("f_symbol", "sum"), n_fail_alpha=("f_alpha", "sum"),
            n_fail_stop=("f_stop", "sum"))

    cols = ["n_docs", "n_pass", "n_fail_words", "n_fail_wordlen",
            "n_fail_symbol", "n_fail_alpha", "n_fail_stop"]
    out = _fold(ds.map_batches(partial, batch_format="pandas"),
                ["lang"], {c: (c, "sum") for c in cols})
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def temperature_mix_sample(sf_dir: str):
    """UNIMAX / XLM-R style temperature sampling (α = 0.5) across
    languages: per-doc keep probability ∝ n_lang^(α−1) = 1/√n_lang,
    normalized so the SMALLEST language keeps everything —
    ``rate_ppm(lang) = (1e6 · isqrt(min_n)) // isqrt(n_lang)``. isqrt is
    ``math.isqrt`` engine-side and ``FLOOR(SQRT(…))`` in DuckDB —
    identical for every n < 2^52 because IEEE sqrt is correctly rounded.
    The per-doc draw is the same DuckDB-``hash()``-compatible murmur
    Bernoulli as ``seeded_sample``, so the selection is layout-independent
    and fully oracle-checkable.

    Scale shape: language counts = one lang-only combiner pass; the tiny
    rate dict rides in the filter closure; the keep pass is zero-shuffle.
    Emits per lang (n_docs, rate_ppm, n_kept)."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    cnt = _fold(ds.map_batches(
        lambda b: b.groupby("lang", as_index=False).agg(n_docs=("doc_id", "size")),
        batch_format="pandas"), ["lang"], dict(n_docs=("n_docs", "sum")))
    empty = pd.DataFrame({"lang": pd.Series([], dtype="string"),
                          "n_docs": pd.Series([], dtype=np.int64),
                          "rate_ppm": pd.Series([], dtype=np.int64),
                          "n_kept": pd.Series([], dtype=np.int64)})
    if len(cnt) == 0:
        return empty
    min_n = int(cnt["n_docs"].min())
    cnt["rate_ppm"] = np.array(
        [(1_000_000 * math.isqrt(min_n)) // math.isqrt(int(n))
         for n in cnt["n_docs"]], np.int64)
    rates = dict(zip(cnt["lang"], cnt["rate_ppm"].astype(int)))

    def keep_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = (_murmur64(b["doc_id"].to_numpy(np.int64).view(np.uint64))
             % np.uint64(1_000_000)).astype(np.int64)
        r = b["lang"].map(rates).to_numpy(np.int64)
        kb = b.loc[h < r]
        if len(kb) == 0:
            return pd.DataFrame({"lang": pd.Series([], dtype="string"),
                                 "n_kept": pd.Series([], dtype=np.int64)})
        return kb.groupby("lang", as_index=False).agg(n_kept=("doc_id", "size"))

    kept = _fold(ds.map_batches(keep_partial, batch_format="pandas"),
                 ["lang"], dict(n_kept=("n_kept", "sum")))
    out = cnt.merge(kept, on="lang", how="left")
    out["n_kept"] = out["n_kept"].fillna(0)
    for c in ("n_docs", "rate_ppm", "n_kept"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


# --- global top-p% quality cutoff (exact distributed rank selection) ------
#
# keep the top QUALITY_TOP_PPM/1e6 fraction of the corpus by an integer
# quality score — FineWeb-style percentile gating, computed EXACTLY without
# a global sort: the selection threshold is found by histogram refinement
# with O(buckets) driver state per pass.
QUALITY_TOP_PPM = 100_000           # keep the top 10 %
_SEL_BUCKETS = 1024                 # doc_id refinement fan-out per pass
_SEL_COLLECT_LIMIT = 65_536         # gather the tie range once it's this small


def _quality_score_ppm(b: pd.DataFrame) -> pd.DataFrame:
    """Integer quality score in ppm — all-int64 arithmetic so DuckDB's
    `//` reproduces it bit-exactly (length factor × digit-soup penalty ×
    punct-soup penalty; see the `quality_percentile_cut` oracle SQL)."""
    t = b["text"].astype("string")
    n = b["n_chars"].to_numpy(np.int64)
    n_dig = t.str.count(r"[0-9]").fillna(0).to_numpy(np.int64)
    n_punct = t.str.count(r"[.,!?;:]").fillna(0).to_numpy(np.int64)
    safe = np.maximum(n, 1)
    len_ppm = np.minimum(n * 5000, 1_000_000)
    dig_ppm = (1_000_000 * n_dig) // safe
    punct_ppm = (1_000_000 * n_punct) // safe
    score = (len_ppm * (1_000_000 - dig_ppm) // 1_000_000
             * np.maximum(1_000_000 - 2 * punct_ppm, 0) // 1_000_000)
    return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                         "lang": b["lang"].astype(object),
                         "n_chars": n,
                         "score_ppm": np.where(n > 0, score, 0).astype(np.int64)})


def quality_percentile_cut(sf_dir: str, top_ppm: int = QUALITY_TOP_PPM):
    """Keep exactly the top ``ceil(N * top_ppm / 1e6)`` documents by
    (score_ppm DESC, doc_id ASC) — a global percentile quality gate —
    and roll up the survivors per language.

    Scale design: exact global rank selection WITHOUT ``Dataset.sort``
    (a top-decile sort at corpus scale is an all-to-all exchange of the
    whole table). Instead:

    1. one scoring pass materializes the narrow (doc_id, lang, n_chars,
       score_ppm) projection — ~1-2 %% of corpus bytes; every later pass
       re-reads blocks from the object store, never the text;
    2. a per-score histogram (combiner partials + tiny fold) finds the
       threshold score ``t`` and the residual rank ``r`` inside the tie
       bucket — driver state = distinct scores (≤ 1e6+1 by construction);
    3. when the tie bucket is hot (score caps make this the COMMON case:
       every long clean doc scores exactly 1e6), the r-th smallest doc_id
       inside it is found by iterative range-bucketed histograms
       (``_SEL_BUCKETS`` per pass, so ≤ log_1024(id range) ≈ 6 passes,
       O(buckets) driver state each), gathering only once the live range
       holds ≤ ``_SEL_COLLECT_LIMIT`` ids;
    4. a final vectorized filter + per-lang combiner/fold emits the rollup.

    The DuckDB oracle is the straightforward ROW_NUMBER() window over the
    same integer score — the engine must agree with it on every rank
    boundary, which is why the score is pure int64 (no float rank ties).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    scored = ds.map_batches(_quality_score_ppm, batch_format="pandas").materialize()
    # "string" dtype (not object) so Ray's block-size estimator never probes
    # a 0-row object column (np.vectorize noise on empty partials)
    empty = pd.DataFrame({"lang": pd.Series([], dtype="string"),
                          "n_kept": pd.Series([], dtype=np.int64),
                          "sum_chars": pd.Series([], dtype=np.int64)})

    hist = _fold(scored.map_batches(
        lambda b: b.groupby("score_ppm", as_index=False).size().rename(columns={"size": "cnt"}),
        batch_format="pandas"), ["score_ppm"], dict(cnt=("cnt", "sum")))
    if len(hist) == 0:
        return empty
    n_total = int(hist["cnt"].sum())
    k = (n_total * top_ppm + 999_999) // 1_000_000
    hist = hist.sort_values("score_ppm", ascending=False)
    cum = hist["cnt"].cumsum().to_numpy(np.int64)
    idx = int(np.searchsorted(cum, k, side="left"))
    t = int(hist["score_ppm"].iloc[idx])
    m = int(cum[idx - 1]) if idx > 0 else 0      # docs strictly above t
    r = k - m                                     # taken from the t bucket
    tie_n = int(hist["cnt"].iloc[idx])

    d_star: int | None = None                     # doc_id cutoff inside the tie
    if 0 < r < tie_n:
        mm = scored.map_batches(
            lambda b, t=t: (lambda d: pd.DataFrame(
                {"lo": d.min(keepdims=True), "hi": d.max(keepdims=True)})
                if len(d) else pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                             "hi": pd.Series([], dtype=np.int64)}))(
                b.loc[b["score_ppm"].to_numpy() == t, "doc_id"].to_numpy(np.int64)),
            batch_format="pandas").to_pandas()
        lo, hi = int(mm["lo"].min()), int(mm["hi"].max()) + 1
        remaining, count_in = r, tie_n
        while count_in > _SEL_COLLECT_LIMIT:
            width = max(1, -(-(hi - lo) // _SEL_BUCKETS))

            def bucket_hist(b: pd.DataFrame, t=t, lo=lo, hi=hi, width=width) -> pd.DataFrame:
                d = b["doc_id"].to_numpy(np.int64)
                d = d[(b["score_ppm"].to_numpy() == t) & (d >= lo) & (d < hi)]
                if len(d) == 0:
                    return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                         "cnt": pd.Series([], dtype=np.int64)})
                u, c = np.unique((d - lo) // width, return_counts=True)
                return pd.DataFrame({"bucket": u.astype(np.int64),
                                     "cnt": c.astype(np.int64)})

            bh = _fold(scored.map_batches(bucket_hist, batch_format="pandas"),
                       ["bucket"], dict(cnt=("cnt", "sum"))).sort_values("bucket")
            cumb = bh["cnt"].cumsum().to_numpy(np.int64)
            j = int(np.searchsorted(cumb, remaining, side="left"))
            remaining -= int(cumb[j - 1]) if j > 0 else 0
            b_id = int(bh["bucket"].iloc[j])
            count_in = int(bh["cnt"].iloc[j])
            lo, hi = lo + b_id * width, min(hi, lo + (b_id + 1) * width)
        ties = scored.map_batches(
            lambda b, t=t, lo=lo, hi=hi: b.loc[
                (b["score_ppm"].to_numpy() == t)
                & (b["doc_id"].to_numpy() >= lo) & (b["doc_id"].to_numpy() < hi),
                ["doc_id"]],
            batch_format="pandas").to_pandas()
        d_star = int(np.sort(ties["doc_id"].to_numpy(np.int64))[remaining - 1])

    def rollup(b: pd.DataFrame, t=t, r=r, tie_n=tie_n, d_star=d_star) -> pd.DataFrame:
        s = b["score_ppm"].to_numpy(np.int64)
        if r == 0:
            keep = s > t
        elif r == tie_n:
            keep = s >= t
        else:
            keep = (s > t) | ((s == t) & (b["doc_id"].to_numpy(np.int64) <= d_star))
        kb = b.loc[keep]
        if len(kb) == 0:
            return empty
        return kb.groupby("lang", as_index=False).agg(
            n_kept=("doc_id", "size"), sum_chars=("n_chars", "sum"))

    out = _fold(scored.map_batches(rollup, batch_format="pandas"), ["lang"],
                dict(n_kept=("n_kept", "sum"), sum_chars=("sum_chars", "sum")))
    if len(out) == 0:
        return empty
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def _bigram_frame(b: pd.DataFrame) -> pd.DataFrame:
    """Vectorized bigram explode: one row per adjacent token pair, with the
    source batch row label in ``row``. Tokenization = split on a single
    space, matching DuckDB ``string_split(text, ' ')`` exactly (consecutive
    spaces yield empty-string tokens on BOTH sides)."""
    ts = b["text"].astype("string").str.split(" ")
    ex = ts.explode()
    w2 = ex.groupby(level=0).shift(-1)
    m = w2.notna().to_numpy()
    return pd.DataFrame({"row": ex.index[m],
                         "w1": ex.to_numpy(object)[m],
                         "w2": w2.to_numpy(object)[m]})


def lm_fluency_score(sf_dir: str):
    """CCNet-style n-gram LM fluency scoring: train an add-one-smoothed
    bigram language model on the held-out slice (doc_id %% 97 == 0 — the
    same slice decontamination treats as the reference set), broadcast it
    once, and score every remaining document's average bigram probability.

    The classical formulation is perplexity (a sum of logs); libm ``log``
    is not bit-identical between numpy and DuckDB, so ranks near a
    threshold could flip between engine and oracle. This variant keeps the
    probabilities RATIONAL and the score INTEGER — per bigram
    ``p_ppm = (1e6 * (c12+1)) // (c1 + V)`` and per doc
    ``score = sum(p_ppm) // n_bigrams`` — exact int64 on both sides, so
    the oracle check is bit-tight at any scale.

    Scale design: the LM is trained on a fixed SAMPLE (CCNet trains on
    Wikipedia), so model size is bounded by the sample, not the corpus —
    two cheap passes build (bigram counts, context counts, |V|) on the
    driver and ``ray.put`` broadcasts them once; scoring is a zero-shuffle
    actor-pool pass (explode bigrams, two vectorized hash merges against
    the model, per-doc groupby-sum, per-lang combiner). Nothing
    corpus-scale ever leaves the workers."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype="string"),
                          "n_docs": pd.Series([], dtype=np.int64),
                          "sum_score_ppm": pd.Series([], dtype=np.int64),
                          "min_score_ppm": pd.Series([], dtype=np.int64),
                          "max_score_ppm": pd.Series([], dtype=np.int64)})
    model = _train_bigram_lm(ds)
    if model is None:
        return empty
    model_ref = ray.put(model)

    class FluencyScorer:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            per = _fluency_doc_frame(b, *self.model)
            if len(per) == 0:
                return empty
            return per.groupby("lang", as_index=False).agg(
                n_docs=("score", "size"), sum_score_ppm=("score", "sum"),
                min_score_ppm=("score", "min"), max_score_ppm=("score", "max"))

    out = _fold(ds.map_batches(FluencyScorer, batch_format="pandas",
                               concurrency=(1, 8)),
                ["lang"], dict(n_docs=("n_docs", "sum"),
                               sum_score_ppm=("sum_score_ppm", "sum"),
                               min_score_ppm=("min_score_ppm", "min"),
                               max_score_ppm=("max_score_ppm", "max")))
    if len(out) == 0:
        return empty
    for c in ["n_docs", "sum_score_ppm", "min_score_ppm", "max_score_ppm"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def _train_bigram_lm(ds):
    """Train the CCNet-style add-one bigram LM on the held-out slice
    (doc_id % 97 == 0): two cheap combiner passes build (bigram counts c12,
    context counts c1, |V|) — model size is bounded by the SAMPLE, never
    the corpus. Returns (c12, c1, vocab_n) or None when the slice is empty
    (broadcast the result once with ray.put)."""

    def train_partial(b: pd.DataFrame) -> pd.DataFrame:
        tb = b.loc[b["doc_id"].to_numpy(np.int64) % 97 == 0]
        e = pd.DataFrame({"w1": pd.Series([], dtype=object),
                          "w2": pd.Series([], dtype=object),
                          "c": pd.Series([], dtype=np.int64),
                          "tok": pd.Series([], dtype=object)})
        if len(tb) == 0:
            return e
        bg = _bigram_frame(tb)
        toks = tb["text"].astype("string").str.split(" ").explode().dropna().unique()
        cnt = (bg.groupby(["w1", "w2"], as_index=False).size()
               .rename(columns={"size": "c"})) if len(bg) else e[["w1", "w2", "c"]]
        cnt["c"] = cnt["c"].astype(np.int64) if len(cnt) else cnt.get("c")
        vocab = pd.DataFrame({"w1": pd.Series([None] * len(toks), dtype=object),
                              "w2": pd.Series([None] * len(toks), dtype=object),
                              "c": np.zeros(len(toks), np.int64),
                              "tok": toks.astype(object)})
        cnt = cnt.assign(tok=pd.Series([None] * len(cnt), dtype=object))
        return pd.concat([cnt, vocab], ignore_index=True)

    tp = ds.map_batches(train_partial, batch_format="pandas").to_pandas()
    if len(tp) == 0:
        return None
    vocab_n = int(tp["tok"].dropna().nunique())
    if vocab_n == 0:
        return None
    pairs = tp.loc[tp["w1"].notna()]
    c12 = (pairs.groupby(["w1", "w2"], as_index=False)["c"].sum()
           .rename(columns={"c": "c12"}))
    c1 = (c12.groupby("w1", as_index=False)["c12"].sum()
          .rename(columns={"c12": "c1"}))
    return c12, c1, vocab_n


def _fluency_doc_frame(b: pd.DataFrame, c12: pd.DataFrame, c1: pd.DataFrame,
                       vocab_n: int) -> pd.DataFrame:
    """Per-document integer fluency scores for one batch: drop the training
    slice (doc_id % 97 == 0) and docs without a bigram, merge the broadcast
    model, per-bigram ``p_ppm = (1e6*(c12+1)) // (c1+|V|)``, per-doc
    ``score = sum(p_ppm) // n_bigrams`` — all int64. Returns
    (doc_id, lang, score) rows."""
    sb = b.loc[b["doc_id"].to_numpy(np.int64) % 97 != 0]
    e = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                      "lang": pd.Series([], dtype="string"),
                      "score": pd.Series([], dtype=np.int64)})
    if len(sb) == 0:
        return e
    bg = _bigram_frame(sb)
    if len(bg) == 0:
        return e
    bg = (bg.merge(c12, on=["w1", "w2"], how="left")
          .merge(c1, on="w1", how="left"))
    p = ((1_000_000 * (bg["c12"].fillna(0).to_numpy(np.int64) + 1))
         // (bg["c1"].fillna(0).to_numpy(np.int64) + vocab_n))
    per = (pd.DataFrame({"row": bg["row"].to_numpy(), "p": p})
           .groupby("row")["p"].agg(["sum", "size"]))
    score = (per["sum"] // per["size"]).astype(np.int64)
    return pd.DataFrame({
        "doc_id": sb["doc_id"].loc[per.index].to_numpy(np.int64),
        "lang": sb["lang"].loc[per.index].to_numpy(object),
        "score": score.to_numpy(np.int64)})


def perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail buckets (Wenzek et al. 2020): per language,
    rank every scored document by LM fluency (the integer bigram score of
    ``lm_fluency_score`` — higher = more fluent) and split into NTILE(3)
    buckets: 1 = head (most fluent), 3 = tail. Emits per (lang, bucket)
    document counts and score aggregates.

    Scale design — exact NTILE WITHOUT a sort: because every reported
    aggregate is a function of the SCORE alone, boundary ties (same score,
    different doc_id) cannot change any output value, so the whole answer
    derives from the per-(lang, score) HISTOGRAM: one combiner pass + a
    tiny fold (distinct scores ≤ 1e6+1 per lang by construction — ppm
    ints), then O(langs × scores) driver arithmetic computes each bucket's
    slice of the descending score multiset. No corpus-scale shuffle, no
    per-doc rank materialization."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype="string"),
                          "bucket": pd.Series([], dtype=np.int64),
                          "n_docs": pd.Series([], dtype=np.int64),
                          "sum_score_ppm": pd.Series([], dtype=np.int64),
                          "min_score_ppm": pd.Series([], dtype=np.int64),
                          "max_score_ppm": pd.Series([], dtype=np.int64)})
    model = _train_bigram_lm(ds)
    if model is None:
        return empty
    model_ref = ray.put(model)

    class HistScorer:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            per = _fluency_doc_frame(b, *self.model)
            h = per.groupby(["lang", "score"], as_index=False).size()
            return h.rename(columns={"size": "cnt"})

    hist = _fold(ds.map_batches(HistScorer, batch_format="pandas",
                                concurrency=(1, 8)),
                 ["lang", "score"], dict(cnt=("cnt", "sum")))
    if len(hist) == 0:
        return empty
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("score", ascending=False)
        sc = g["score"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        n = int(cnt.sum())
        q, rem = divmod(n, 3)
        sizes = [q + (1 if i < rem else 0) for i in range(3)]
        cum = np.concatenate([[0], np.cumsum(cnt)])
        off = 0
        for bkt, s_b in enumerate(sizes, start=1):
            if s_b == 0:
                continue
            lo_r, hi_r = off, off + s_b          # rank slice [lo_r, hi_r)
            i0 = int(np.searchsorted(cum, lo_r, side="right")) - 1
            i1 = int(np.searchsorted(cum, hi_r, side="left")) - 1
            take = np.minimum(cum[1:], hi_r) - np.maximum(cum[:-1], lo_r)
            take = np.clip(take, 0, None)
            rows.append((lang, bkt, s_b, int((take * sc).sum()),
                         int(sc[i1]), int(sc[i0])))
            off = hi_r
    out = pd.DataFrame(rows, columns=["lang", "bucket", "n_docs",
                                      "sum_score_ppm", "min_score_ppm",
                                      "max_score_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


def dsir_select(sf_dir: str, target_source: str = "src0"):
    """DSIR-style data selection (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw doc
    by the likelihood ratio of two add-one-smoothed bag-of-bigram models —
    a TARGET model trained on the curated source (`src0`, the fixture's
    Wikipedia analog) and a RAW model trained on a deterministic
    `doc_id % 13` hash-slice of everything else — then count how many raw
    docs clear the more-target-than-raw bar per language.

    Integer-exact variant: the true smoothed ratio is
    ``(ct+1)(R_tot+V) / ((cr+1)(T_tot+V))``; its right factor is a GLOBAL
    constant (same for every bigram), so it is folded out of the score's
    units and the per-bigram weight is ``r_ppm = (1e6*(ct+1)) // (cr+1)``
    with per-doc ``w_ppm = sum(r_ppm) // n_bigrams`` — pure int64 on both
    engine and oracle, no libm log drift. "Selected" = ``w_ppm > 1e6``
    (strictly more target-typical than raw-typical in these units).

    Scale design: both models are SAMPLE-bounded — the target corpus is
    small by definition (DSIR's is Wikipedia) and the raw model sees only
    the fixed hash-slice (DSIR bounds the same memory by hashing n-grams
    into fixed buckets); one distributed pass emits both partial count
    tables at once, the driver folds sample-scale frames, ``ray.put``
    broadcasts the pair, and scoring is a zero-shuffle actor-pool pass.
    Nothing corpus-scale ever reaches the driver."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype="string"),
                          "n_docs": pd.Series([], dtype=np.int64),
                          "n_selected": pd.Series([], dtype=np.int64),
                          "sum_w_ppm": pd.Series([], dtype=np.int64),
                          "max_w_ppm": pd.Series([], dtype=np.int64)})

    def model_partial(b: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"w1": pd.Series([], dtype=object),
                          "w2": pd.Series([], dtype=object),
                          "ct": pd.Series([], dtype=np.int64),
                          "cr": pd.Series([], dtype=np.int64)})
        src = b["source"].astype("string")
        is_t = (src == target_source).to_numpy()
        is_r = ~is_t & (b["doc_id"].to_numpy(np.int64) % 13 == 0)
        parts = [e]
        for mask, col in ((is_t, "ct"), (is_r, "cr")):
            sub = b.loc[mask]
            if len(sub) == 0:
                continue
            bg = _bigram_frame(sub)
            if len(bg) == 0:
                continue
            cnt = (bg.groupby(["w1", "w2"], as_index=False).size()
                   .rename(columns={"size": col}))
            cnt[col] = cnt[col].astype(np.int64)
            parts.append(cnt)
        return pd.concat(parts, ignore_index=True)

    mp = ds.map_batches(model_partial, batch_format="pandas").to_pandas()
    for c in ("ct", "cr"):
        mp[c] = mp[c].fillna(0).astype(np.int64) if len(mp) else mp.get(c)
    model = (mp.groupby(["w1", "w2"], as_index=False)[["ct", "cr"]].sum()
             if len(mp) else mp)
    model_ref = ray.put(model)

    class DsirScorer:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            sb = b.loc[(b["source"].astype("string") != target_source).to_numpy()]
            if len(sb) == 0:
                return empty
            bg = _bigram_frame(sb)
            if len(bg) == 0:
                return empty
            bg = bg.merge(self.model, on=["w1", "w2"], how="left")
            r = ((1_000_000 * (bg["ct"].fillna(0).to_numpy(np.int64) + 1))
                 // (bg["cr"].fillna(0).to_numpy(np.int64) + 1))
            per = (pd.DataFrame({"row": bg["row"].to_numpy(), "r": r})
                   .groupby("row")["r"].agg(["sum", "size"]))
            w = (per["sum"] // per["size"]).astype(np.int64)
            out = pd.DataFrame({"lang": sb["lang"].loc[per.index].to_numpy(object),
                                "w": w.to_numpy(np.int64)})
            out["sel"] = (out["w"] > 1_000_000).astype(np.int64)
            return out.groupby("lang", as_index=False).agg(
                n_docs=("w", "size"), n_selected=("sel", "sum"),
                sum_w_ppm=("w", "sum"), max_w_ppm=("w", "max"))

    out = _fold(ds.map_batches(DsirScorer, batch_format="pandas",
                               concurrency=(1, 8)),
                ["lang"], dict(n_docs=("n_docs", "sum"),
                               n_selected=("n_selected", "sum"),
                               sum_w_ppm=("sum_w_ppm", "sum"),
                               max_w_ppm=("max_w_ppm", "max")))
    if len(out) == 0:
        return empty
    for c in ["n_docs", "n_selected", "sum_w_ppm", "max_w_ppm"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def lang_id_confusion(sf_dir: str):
    """[rows-only] Heuristic language ID vs labeled lang: confusion counts."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = _fold(ds.map_batches(textops.lang_id, batch_format="pandas")
                .map_batches(lambda b: b.groupby(["lang", "lang_pred"], as_index=False).size().rename(columns={"size": "cnt"}),
                             batch_format="pandas"),
                ["lang", "lang_pred"], dict(cnt=("cnt", "sum")))
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def top_tokens(sf_dir: str, k: int = 20):
    """Corpus heavy hitters: the k most frequent tokens across all
    documents, EXACT. Per-batch combiner (explode + value_counts shrinks
    each batch to its distinct tokens) → sort shuffle on the unbounded
    token key → per-block fold → driver merges result-sized partials and
    takes the global top-k with deterministic ties."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = (b["text"].astype("string").str.lower()
                .str.findall(r"[a-z0-9_]+").explode().dropna())
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "cnt": vc.to_numpy(np.int64)})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("token", as_index=False).agg(cnt=("cnt", "sum"))

    out = _sorted_fold(ds.map_batches(partial, batch_format="pandas"), ["token"], fold)
    out["cnt"] = out["cnt"].astype(np.int64)
    out = out.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def tfidf_top_terms(sf_dir: str, k: int = 10):
    """Per-language top-k terms by TF-IDF, EXACT and integer-quantized.

    idf uses the rational form ``(1e6 * n_docs_lang) // df`` (floor ppm)
    instead of a log so engine and DuckDB agree bit-for-bit (CLAUDE.md's
    float rule); score = tf × idf_ppm in int64 (overflows only past
    ~9e18 — at larger corpus scale switch both sides to a shared log grid).

    Distributed shape: per-batch combiner shrinks each batch to its
    distinct (lang, term) rows carrying (tf, df) partials — df sums across
    batches because a document never spans blocks — then one sort shuffle
    on the unbounded term key folds per block, and the driver sees only the
    vocabulary-sized table (heavy-tail bounded, same contract as
    top_tokens) to rank per lang. n_docs per lang is a second metadata-thin
    scan of the lang column only."""
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = (b["text"].astype("string").str.lower()
                .str.findall(r"[a-z0-9_]+"))
        ex = toks.explode().dropna()
        t = pd.DataFrame({
            "lang": b["lang"].reindex(ex.index).to_numpy(),
            "term": ex.to_numpy(),
            "doc": ex.index.to_numpy()})
        return t.groupby(["lang", "term"], as_index=False).agg(
            tf=("doc", "size"), df=("doc", "nunique"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "term"], as_index=False).agg(
            tf=("tf", "sum"), df=("df", "sum"))

    terms = _sorted_fold(ds.map_batches(partial, batch_format="pandas"),
                         ["lang", "term"], fold)

    nd = _read(sf_dir, "documents", ["lang"])

    def cpart(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False).agg(n_docs=("lang", "size"))

    nl = _fold(nd.map_batches(cpart, batch_format="pandas"),
               ["lang"], {"n_docs": ("n_docs", "sum")})

    out = terms.merge(nl, on="lang")
    tf_ = out["tf"].to_numpy(np.int64)
    df_ = out["df"].to_numpy(np.int64)
    n_ = out["n_docs"].to_numpy(np.int64)
    out["score_ppm"] = tf_ * ((1_000_000 * n_) // df_)
    out = out.sort_values(["lang", "score_ppm", "term"],
                          ascending=[True, False, True], kind="mergesort")
    out = out.groupby("lang", as_index=False, sort=False).head(k)
    for c in ("tf", "df", "score_ppm"):
        out[c] = out[c].astype(np.int64)
    return out[["lang", "term", "tf", "df", "score_ppm"]].reset_index(drop=True)


def approx_distinct_tokens(sf_dir: str):
    """Approximate distinct vocabulary per language via a HyperLogLog
    sketch (functions/sketches.py): each batch folds its token stream into
    a 4 KiB register array per group in one vectorized pass, registers
    merge by elementwise max, and ONLY (groups × 4 KiB) blobs reach the
    driver — the one-pass no-shuffle alternative to the exact
    sort+fold distinct path (doc_fingerprints). Deterministic (xxh64), so
    the golden's independent per-token loop reproduces it exactly; the
    unit test additionally bounds the error vs the true distinct count."""
    from crawler_ray.functions.sketches import M, hll_estimate, hll_merge, hll_registers_grouped
    from crawler_ray.hashing import xxh64_array

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = (b["text"].astype("string").str.lower()
                .str.findall(r"[a-z0-9_]+"))
        # fully vectorized multi-group fold: explode tokens once (an empty
        # token list explodes to one NaN row, keeping the per-row repeat
        # aligned), factorize the per-token lang, ONE xxh64 pass, ONE
        # grouped maximum.at into the (langs × M) register matrix
        ex = toks.explode()
        n_rows = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        lang_per = np.repeat(b["lang"].to_numpy(), np.maximum(n_rows, 1))
        keep = ex.notna().to_numpy()
        codes, uniq = pd.factorize(lang_per[keep])
        regs = hll_registers_grouped(xxh64_array(ex.to_numpy()[keep].tolist()),
                                     codes, len(uniq))
        return pd.DataFrame({"lang": [str(u) for u in uniq],
                             "regs": [regs[g].tobytes() for g in range(len(uniq))]},
                            columns=["lang", "regs"])

    # group key space (languages) is bounded-small ⇒ the driver merge is
    # O(langs × 4 KiB); an unbounded group key would swap this for the
    # _sorted_fold path with the same mergeable blobs
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for lang, g in parts.groupby("lang"):
        regs = np.zeros(M, np.uint8)
        for blob in g["regs"]:
            regs = hll_merge(regs, np.frombuffer(blob, np.uint8))
        rows.append({"lang": lang, "approx_distinct": np.int64(round(hll_estimate(regs)))})
    out = pd.DataFrame(rows, columns=["lang", "approx_distinct"])
    out["approx_distinct"] = out["approx_distinct"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def doc_fingerprints(sf_dir: str):
    """Rolling-hash fingerprint per doc; docs + EXACT distinct fingerprints
    per source, with NO corpus-scale driver pull: the sort shuffle
    co-locates (source, fingerprint) into ordered block ranges, each block
    counts its distinct pairs per source vectorized, and the driver
    receives only per-block per-source COUNTS plus one boundary row per
    block. A pair straddling k adjacent sorted blocks is counted k times
    in-block and corrected by the k−1 boundary matches — distinct
    fingerprints ≈ distinct docs, so materializing the unique pairs
    themselves would hand the driver a corpus-scale frame at 100 TB."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    fp = ds.map_batches(lambda b: textops.fingerprint(b).assign(source=b["source"].to_numpy()),
                        batch_format="pandas").materialize()
    docs = _fold(fp.map_batches(lambda b: b.groupby("source", as_index=False).size()
                                .rename(columns={"size": "n_docs"}), batch_format="pandas"),
                 ["source"], dict(n_docs=("n_docs", "sum")))
    s = (fp.map_batches(lambda b: b[["source", "fingerprint"]].drop_duplicates(),
                        batch_format="pandas")
         .sort(["source", "fingerprint"]).materialize())

    def block_counts(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"source": pd.Series([], dtype=str),
                                 "n_distinct": pd.Series([], dtype=np.int64)})
        return (b.drop_duplicates().groupby("source", as_index=False).size()
                .rename(columns={"size": "n_distinct"}))

    def block_bounds(b: pd.DataFrame) -> pd.DataFrame:
        cols = {"first_source": str, "first_fp": np.int64,
                "last_source": str, "last_fp": np.int64}
        if len(b) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        return pd.DataFrame({"first_source": [b["source"].iloc[0]],
                             "first_fp": [np.int64(b["fingerprint"].iloc[0])],
                             "last_source": [b["source"].iloc[-1]],
                             "last_fp": [np.int64(b["fingerprint"].iloc[-1])]})

    counts = s.map_batches(block_counts, batch_format="pandas", batch_size=None).to_pandas()
    bounds = s.map_batches(block_bounds, batch_format="pandas", batch_size=None).to_pandas()
    distinct = counts.groupby("source", as_index=False)["n_distinct"].sum()
    # boundary correction: blocks in sorted order (ranges don't overlap
    # except at endpoints, so (first, last) sorts them; the last-key
    # tiebreak orders blocks that are entirely one straddling pair)
    bounds = bounds.sort_values(["first_source", "first_fp", "last_source", "last_fp"],
                                kind="mergesort").reset_index(drop=True)
    over = ((bounds["first_source"].to_numpy()[1:] == bounds["last_source"].to_numpy()[:-1])
            & (bounds["first_fp"].to_numpy()[1:] == bounds["last_fp"].to_numpy()[:-1]))
    if over.any():
        sub = (pd.Series(bounds["first_source"].to_numpy()[1:][over])
               .value_counts().rename_axis("source").reset_index(name="overcount"))
        distinct = distinct.merge(sub, on="source", how="left")
        distinct["n_distinct"] -= distinct["overcount"].fillna(0).astype(np.int64)
        distinct = distinct.drop(columns=["overcount"])
    out = docs.merge(distinct, on="source")
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def doc_repetition(sf_dir: str):
    """Gopher-style intra-document repetition filter (duplicate-token
    fraction + top-token share + flag): per-doc independent features, so
    the whole operator is ONE embarrassingly-parallel ``map_batches`` over
    pruned columns — zero shuffle at any corpus size. Returns only the
    flagged docs plus per-doc stats for the dup-heavy tail (dup_frac ≥ the
    corpus p90), keeping the result O(filtered), not O(corpus)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats_and_filter(b: pd.DataFrame) -> pd.DataFrame:
        r = textops.repetition_stats(b)
        r = r[(r["flagged"] == 1) | (r["dup_frac"] >= 0.65)].copy()
        # parts-per-million via FLOOR: round() has engine-dependent midpoint
        # semantics (half-even vs half-away) and ratios with power-of-two
        # denominators DO land on exact midpoints; floor of the identical
        # IEEE double is bit-deterministic on both sides
        r["dup_ppm"] = np.floor(r["dup_frac"].to_numpy(np.float64) * 1e6).astype(np.int64)
        r["top_ppm"] = np.floor(r["top_share"].to_numpy(np.float64) * 1e6).astype(np.int64)
        return r.drop(columns=["dup_frac", "top_share"])

    out = ds.map_batches(stats_and_filter, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _pii_fixture_text(b: pd.DataFrame) -> pd.Series:
    """Deterministic PII-bearing text derived from (doc_id, text).

    The testdata word-soup contains no emails/phones/SSNs/IPs, so the PII
    fixture is derived IN THE QUERY from existing columns — the identical
    expression appears in the DuckDB oracle, so the thing under test is the
    generic detector/redactor (functions/pii.py), not a side-channel
    fixture. Moduli 3/5/11/13 are coprime: docs carry any subset of the
    four PII types, including none and all four."""
    did = b["doc_id"].to_numpy(np.int64)

    def s(a):
        return pd.Series(a.astype(str), index=b.index, dtype=object)

    ft = b["text"].astype(object)
    ft = ft + (" contact user" + s(did) + "@mail" + s(did % 7)
               + ".example.com").where(did % 3 == 0, "")
    ft = ft + (" call " + s(10 + did % 90) + "-" + s(100 + did % 900) + "-"
               + s(100 + (did * 7) % 900) + "-"
               + s(1000 + (did * 13) % 9000)).where(did % 5 == 0, "")
    ft = ft + (" ssn " + s(100 + did % 900) + "-" + s(10 + did % 90) + "-"
               + s(1000 + did % 9000)).where(did % 11 == 0, "")
    ft = ft + (" from 10." + s(did % 256) + "." + s((did * 3) % 256) + "."
               + s(1 + did % 254)).where(did % 13 == 0, "")
    return ft


# the same fixture expression, DuckDB-side (CAST makes int→varchar explicit)
_PII_FIXTURE_SQL = """
        SELECT doc_id, text
          || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
               || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN ' call ' || CAST(10 + doc_id % 90 AS VARCHAR)
               || '-' || CAST(100 + doc_id % 900 AS VARCHAR)
               || '-' || CAST(100 + (doc_id * 7) % 900 AS VARCHAR)
               || '-' || CAST(1000 + (doc_id * 13) % 9000 AS VARCHAR) ELSE '' END
          || CASE WHEN doc_id % 11 = 0 THEN ' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR)
               || '-' || CAST(10 + doc_id % 90 AS VARCHAR)
               || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
               || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
               || '.' || CAST(1 + doc_id % 254 AS VARCHAR) ELSE '' END AS ft
        FROM documents"""


def pii_scan(sf_dir: str):
    """PII detection sweep (RefinedWeb/Dolma-style pre-training scrub pass):
    per-type corpus totals — documents containing ≥1 hit and total
    non-overlapping hits. Per-doc counting is embarrassingly parallel
    (one regex scan per pattern inside ``map_batches``, zero shuffle at
    any corpus size); only the 4-row per-batch partial reaches the fold."""
    from crawler_ray.functions import pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = pii.pii_counts(_pii_fixture_text(b))
        rows = [(name, int((c[name] > 0).sum()), int(c[name].sum()))
                for name, _, _ in pii.PII_PATTERNS]
        return pd.DataFrame(rows, columns=["pii_type", "n_docs", "n_hits"])

    out = _fold(ds.map_batches(partial, batch_format="pandas"), ["pii_type"],
                dict(n_docs=("n_docs", "sum"), n_hits=("n_hits", "sum")))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out.sort_values("pii_type").reset_index(drop=True)


def pii_redact(sf_dir: str):
    """PII redaction: every match replaced by its type placeholder, in the
    fixed PII_PATTERNS pass order; returns only the documents that were
    touched (doc_id, hit count, redacted text). Pure per-doc transform →
    one ``map_batches``, no shuffle; output is O(pii docs), and the full
    redacted STRINGS cross the driver compare, so the oracle pins the
    byte-exact redaction, not just counts."""
    from crawler_ray.functions import pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rb(b: pd.DataFrame) -> pd.DataFrame:
        ft = _pii_fixture_text(b)
        n = pii.pii_counts(ft).to_numpy(np.int64).sum(axis=1)
        out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                            "n_pii": n,
                            "red_text": pii.redact(ft).to_numpy(object)})
        return out.loc[n > 0]

    out = ds.map_batches(rb, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def running_revenue(sf_dir: str):
    """Running (cumulative) revenue over the global order timeline —
    ``SUM(...) OVER (ORDER BY o_orderdate, o_orderkey)`` as a distributed
    two-pass prefix scan (``functions/scan.py``): one sort exchange,
    O(blocks) carry summaries on the driver, in-block vectorized cumsum.
    Cents as int64 end-to-end, so engine and oracle sums are EXACT (a
    float running sum differs between engines by accumulation order).
    The operator output is a LAZY Dataset; this query gathers it only
    because the driver contract compares full frames — a production
    caller writes/iterates the Dataset (O(result) never sits on the
    driver).
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["cents"] = np.round(b["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
        return b.drop(columns=["o_totalprice"])

    cents = ds.map_batches(to_cents, batch_format="pandas")
    out = scan.cumulative_sum_ds(cents, ["o_orderdate", "o_orderkey"],
                                 "cents", out_col="running_cents")
    res = out.to_pandas().drop(columns=["cents"])
    res["running_cents"] = res["running_cents"].astype(np.int64)
    return res.sort_values("o_orderkey").reset_index(drop=True)


def customer_running_spend(sf_dir: str):
    """Per-customer running order total — ``SUM(...) OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey)`` via the partitioned
    distributed scan (``functions/scan.py``): the per-group running state
    a naive implementation would centralize never exists; the driver sees
    two partial sums per block regardless of customer cardinality. Cents
    as int64 end-to-end (exact).
    The operator output is a LAZY Dataset; this query gathers it only
    because the driver contract compares full frames — a production
    caller writes/iterates the Dataset (O(result) never sits on the
    driver).
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["cents"] = np.round(b["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
        return b.drop(columns=["o_totalprice"])

    cents = ds.map_batches(to_cents, batch_format="pandas")
    out = scan.grouped_cumulative_sum_ds(cents, "o_custkey",
                                         ["o_orderdate", "o_orderkey"],
                                         "cents", out_col="running_cents")
    res = out.to_pandas().drop(columns=["cents", "o_orderdate"])
    res["running_cents"] = res["running_cents"].astype(np.int64)
    return res.sort_values("o_orderkey").reset_index(drop=True)


# Training-mixture sampling rates per language (percent). Deterministic
# hash-Bernoulli per row, so the mixture is reproducible on any cluster
# size / block layout and exactly oracle-checkable (same predicate in SQL).
MIXTURE_RATES = {"en": 10, "es": 20, "de": 30, "fr": 40, "zh": 50}


def stratified_sample(sf_dir: str, seed: int = 42):
    """Stratified (mixture-weighted) sampling — the data-mixing step of a
    training pipeline: each language keeps a different deterministic
    fraction via murmur64(doc_id XOR seed) % 100 < rate[lang]. The rate
    table is O(strata) and ships inside the batch fn; the filter is one
    vectorized pass, zero shuffle at any corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def pick(b: pd.DataFrame, s=seed) -> pd.DataFrame:
        h = _murmur64(b["doc_id"].to_numpy(np.int64).view(np.uint64) ^ np.uint64(s))
        rate = b["lang"].map(MIXTURE_RATES).fillna(0).to_numpy(np.uint64)
        return b.loc[(h % np.uint64(100)) < rate]

    out = ds.map_batches(pick, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def trailing_event_volume(sf_dir: str):
    """Per-row trailing time-window aggregate — ``SUM(...) OVER (ORDER BY
    ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)`` — as a
    bin-replicated self-join: every event lands in its own W-bin as a
    probe, replicates into bins (b, b+1) as a build row, and a hash join
    on the bin key + a vectorized residual filter meets each qualifying
    (probe, build) pair EXACTLY once (qualifying builds span at most two
    W-bins because the window width equals the bin width). Nothing is
    ordered globally and nothing is sequential — the trailing sum of a
    range window is local by definition, so this beats a prefix-scan
    composition (whose predecessor lookup would be an as-of join).
    Cents as int64 end-to-end (exact).
    The operator output is a LAZY Dataset; this query gathers it only
    because the driver contract compares full frames — a production
    caller writes/iterates the Dataset (O(result) never sits on the
    driver).
    """
    W_US = 3_600_000_000  # 1-hour window == bin width

    events = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(np.int64),
                             "t": t, "bin": t // W_US})

    def build(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.round(b["value"].to_numpy(np.float64) * 100).astype(np.int64)
        one = pd.DataFrame({"rbin": t // W_US, "rt": t, "cents": cents})
        two = one.assign(rbin=one["rbin"] + 1)
        return pd.concat([one, two], ignore_index=True)

    joined = (events.map_batches(probe, batch_format="pandas")
              .join(events.map_batches(build, batch_format="pandas"),
                    join_type="inner", num_partitions=_W(),
                    on=("bin",), right_on=("rbin",)))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["t"].to_numpy()
        rt = b["rt"].to_numpy()
        m = (rt >= t - W_US) & (rt <= t)
        return (b.loc[m].groupby("event_id", as_index=False)
                .agg(trailing_cents=("cents", "sum"), n_window=("cents", "size")))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("event_id", as_index=False).agg(
            trailing_cents=("trailing_cents", "sum"), n_window=("n_window", "sum"))

    out = _sorted_fold(joined.map_batches(partial, batch_format="pandas"),
                       ["event_id"], fold)
    out["event_id"] = out["event_id"].astype(np.int64)
    out["trailing_cents"] = out["trailing_cents"].astype(np.int64)
    out["n_window"] = out["n_window"].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


# Inactivity gap for sessionize_events: the classic 30-minute rule, in
# epoch microseconds (exact integer arithmetic end-to-end).
SESSION_GAP_US = 30 * 60 * 1_000_000


def late_event_stats(sf_dir: str):
    """Watermark late-arrival accounting (the streaming-ingest health
    metric): treating ``event_id`` as ARRIVAL order, an event is LATE when
    its event time is older than its user stream's running-max event time
    (the per-key watermark). Per event type: event count, late count, and
    max/total lateness in µs — all int64, exact.

    The watermark is ``scan.grouped_cumulative_max_ds`` — the exclusive
    grouped running max with O(blocks) driver carry, the same analytic-scan
    discipline as the running-sum family; the rollup is a zero-shuffle
    combiner + tiny fold."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "user_id": b["user_id"].to_numpy(np.int64),
            "event_type": b["event_type"].astype("string"),
            "t": b["ts"].to_numpy("datetime64[us]").view(np.int64)})

    w = scan.grouped_cumulative_max_ds(
        ds.map_batches(to_us, batch_format="pandas"),
        "user_id", ["event_id"], "t", out_col="pm")

    def rollup(b: pd.DataFrame) -> pd.DataFrame:
        pm = b["pm"].to_numpy(np.int64)
        t = b["t"].to_numpy(np.int64)
        late = (pm != scan.NEG_INF_I64) & (t < pm)
        lateness = np.where(late, pm - t, 0).astype(np.int64)
        s = pd.DataFrame({"event_type": b["event_type"].astype(object),
                          "late": late.astype(np.int64),
                          "lateness": lateness})
        return s.groupby("event_type", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_late_us=("lateness", "max"), sum_late_us=("lateness", "sum"))

    out = _fold(w.map_batches(rollup, batch_format="pandas"),
                ["event_type"],
                dict(n_events=("n_events", "sum"), n_late=("n_late", "sum"),
                     max_late_us=("max_late_us", "max"),
                     sum_late_us=("sum_late_us", "sum")))
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def sessionize_events(sf_dir: str):
    """Gap-based sessionization over the event stream (30-min inactivity
    rule) — the streaming-window operator every clickstream/telemetry
    pipeline needs and Ray Data lacks. ``scan.sessionize_ds`` assigns
    per-user session numbers with O(blocks) driver state (one sort
    exchange; every in-block flag vectorized; only each block's first row
    consults the carry), then one per-block partial count rolls sessions
    up to per-user stats. The gathered partials are session-granularity —
    O(sessions), the result's own order — never event-granularity.
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(np.int64),
                             "user_id": b["user_id"].to_numpy(np.int64),
                             "tus": t})

    sess = scan.sessionize_ds(ds.map_batches(to_us, batch_format="pandas"),
                              "user_id", "tus", "event_id", SESSION_GAP_US)
    # sessionize output blocks are sorted by (user, ts): each (user,
    # session) is contiguous, so per-block size partials merge exactly
    # with one driver groupby-sum over O(sessions + blocks) rows
    parts = sess.map_batches(
        lambda b: b.groupby(["user_id", "session_id"], as_index=False)
                   .size().rename(columns={"size": "n"}),
        batch_format="pandas", batch_size=None).to_pandas()
    per_sess = parts.groupby(["user_id", "session_id"], as_index=False)["n"].sum()
    out = per_sess.groupby("user_id", as_index=False).agg(
        n_events=("n", "sum"), n_sessions=("n", "size"),
        max_session_events=("n", "max"))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


# Token budget per training shard for token_shard_assignment (greedy
# contiguous packing: a doc never splits; a shard closes when its budget
# is exhausted by the NEXT doc's arrival).
PACK_TOKEN_BUDGET = 4096


def token_shard_assignment(sf_dir: str):
    """Sequence packing for training export: assign docs (in doc_id order)
    to fixed token-budget shards — shard_id = exclusive-prefix-sum(tokens)
    // budget, the standard contiguous-packing formulation (a shard may
    overflow by at most one doc, which is what real packers ship). Uses the
    distributed prefix scan; per-doc token counts come from one vectorized
    map, and nothing corpus-scale touches the driver.
    The operator output is a LAZY Dataset; this query gathers it only
    because the driver contract compares full frames — a production
    caller writes/iterates the Dataset (O(result) never sits on the
    driver).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].astype("string")
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                             "n_tokens": (t.str.count(" ") + 1).to_numpy(np.int64)})

    toks = ds.map_batches(count_tokens, batch_format="pandas")
    out = scan.cumulative_sum_ds(toks, ["doc_id"], "n_tokens",
                                 out_col="tok_before", exclusive=True)
    res = out.to_pandas()
    res["shard_id"] = (res["tok_before"].to_numpy(np.int64)
                       // PACK_TOKEN_BUDGET).astype(np.int64)
    res = res.drop(columns=["tok_before"])
    return res.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Near-dup + ANN
# ---------------------------------------------------------------------------

_NEAR_DUP_CACHE: dict = {}


def _near_dup_pairs_streamed(ds, bands_ds, sets_fn,
                             threshold: float) -> pd.DataFrame:
    """Shared near-dup driver for the candidate-scale families (MinHash-LSH
    and n-gram prefix filtering), streamed END-TO-END — at no point does a
    corpus-fraction frame touch the driver:

    band/prefix explode (map_batches) → sort-shuffle bucket collision, kept
    as a DATASET (dedup_ops.banded_candidate_pairs_ds; only the ≤2 edge
    buckets per block are bucket-scale-central) → distributed pair dedup
    (one sort, dedup_ops.dedup_pairs_sorted) → candidate doc-id semi-join:
    pair ids explode to a (doc_id) Dataset, sort-deduped, and an inner
    shuffle join against the corpus restricts the set computation to
    candidate docs — replacing the former driver-side frozenset, which at
    10^10 docs would not fit in a pickled broadcast → TWO keyed shuffle
    joins attach sh_a/sh_b to each pair → vectorized exact verify per
    block. Only VERIFIED pairs (the result) reach the driver; the final
    drop_duplicates there removes the ≤1-per-block-seam candidate copies
    the sort-based pair dedup admits (each cost one redundant verify)."""
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=np.float64)})
    pairs_ds = dedup_ops.banded_candidate_pairs_ds(bands_ds, dedup_ops.collide_pairs)
    pairs_ds = dedup_ops.dedup_pairs_sorted(pairs_ds).materialize()
    if pairs_ds.count() == 0:
        return empty

    def explode_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": np.unique(np.concatenate(
            [b["doc_a"].to_numpy(np.int64), b["doc_b"].to_numpy(np.int64)]))})

    # the trailing repartition is a JOIN-SAFETY normalization, not an
    # exchange: Ray 2.49's sort emits empty schema-less blocks when ranges
    # outnumber rows, and a hash-join aggregator that receives them builds
    # a no-column partition table (acero: "No match ... for key field") —
    # width-repartition coalesces blocks and restores the schema
    ids_ds = (pairs_ds.map_batches(explode_ids, batch_format="pandas")
              .sort("doc_id")
              .map_batches(lambda b: b.drop_duplicates("doc_id"),
                           batch_format="pandas", batch_size=None)
              .repartition(_W()))
    # sets for candidate docs only: inner shuffle join moves the text of
    # candidate docs through the exchange once (never through the driver);
    # seam-duplicate ids (≤1 per block boundary) just recompute one set
    sets_ds = (ds.join(ids_ds, join_type="inner", num_partitions=_W(), on=("doc_id",))
               .map_batches(sets_fn, batch_format="pandas").materialize())
    out = _join_verify_pairs(sets_ds, pairs_ds, threshold=threshold)
    if len(out) == 0:
        return empty
    # duplicate candidate copies (pair-seam or id-seam) verify to duplicate
    # RESULT rows — result-scale, deduped here
    out = out.drop_duplicates(["doc_a", "doc_b"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def minhash_near_dups(sf_dir: str):
    """MinHash-LSH near-dup pairs (Jaccard ≥ 0.5, verified), distributed
    end-to-end: shingle→minhash→band explode, then the streamed candidate
    pipeline of ``_near_dup_pairs_streamed`` (candidate pairs, ids and set
    payloads all stay in Datasets / the join exchange — nothing
    corpus-fraction on the driver). Returns (doc_a, doc_b, jaccard)."""
    key = ("minhash", sf_dir)
    if key not in _NEAR_DUP_CACHE:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        bands = ds.map_batches(dedup_ops.minhash_bands, batch_format="pandas")
        _NEAR_DUP_CACHE[key] = _near_dup_pairs_streamed(
            ds, bands, dedup_ops.doc_shingles, threshold=0.5)
    return _NEAR_DUP_CACHE[key].copy()


def _join_verify_pairs(sets_ds, cand, threshold: float) -> pd.DataFrame:
    """Shared exact-verify tail for near-dup candidate pairs: attach each
    side's (doc_id, shingles) set to the pair table via TWO keyed shuffle
    joins, then verify Jaccard per block — the set payload only ever moves
    through the join exchange, never the driver. The payload is packed to
    plain binary because Arrow's hash join rejects tensor-extension
    non-key columns. ``cand`` is a Dataset (streamed candidate path) or a
    result-scale DataFrame (tests)."""
    def _pack(b: pd.DataFrame, key: str, col: str) -> pd.DataFrame:
        return pd.DataFrame({key: b["doc_id"].to_numpy(np.int64),
                             col: [np.asarray(s, np.uint64).tobytes() for s in b["shingles"]]})

    a_side = sets_ds.map_batches(lambda b: _pack(b, "doc_a", "sh_a"), batch_format="pandas")
    b_side = sets_ds.map_batches(lambda b: _pack(b, "doc_b", "sh_b"), batch_format="pandas")
    # Dataset candidates arrive from dedup_pairs_sorted (sort lineage):
    # width-repartition normalizes away the sort's empty schema-less
    # blocks, which otherwise break the hash-join aggregators (see
    # _near_dup_pairs_streamed's ids_ds note)
    pairs = (rd.from_pandas(cand) if isinstance(cand, pd.DataFrame)
             else cand.repartition(_W()))
    joined = (pairs
              .join(a_side, join_type="inner", num_partitions=_W(), on=("doc_a",))
              .join(b_side, join_type="inner", num_partitions=_W(), on=("doc_b",)))
    return joined.map_batches(dedup_ops.verify_joined_pairs,
                              fn_kwargs=dict(threshold=threshold),
                              batch_format="pandas").to_pandas()


def ngram_jaccard_dups(sf_dir: str):
    """EXACT n-gram Jaccard similarity join (word 3-grams, J ≥ 0.5) — the
    no-sketch member of the dedup family (MinHash approximates this set):
    prefix filtering (AllPairs/PPJoin, lossless — see
    dedup_ops.prefix_gram_rows) explodes only the first ``m-⌈t·m⌉+1``
    hash-ordered grams per doc, then the streamed candidate pipeline of
    ``_near_dup_pairs_streamed``. Unlike MinHash-LSH there is no recall
    loss by construction; candidate count is bounded by prefix collisions
    rather than band collisions. Returns (doc_a, doc_b, jaccard), matching
    the DuckDB gram-explode self-join oracle exactly."""
    key = ("ngram", sf_dir)
    if key not in _NEAR_DUP_CACHE:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        # prefix order: "df" indexes each doc's globally-rarest grams first
        # (one distributed document-frequency pass, far fewer candidates —
        # the corpus-scale default); "hash" skips the df pass (cheaper at
        # small scale). Both are lossless, so the OUTPUT is identical.
        if os.environ.get("GRAFT_NGRAM_PREFIX_ORDER", "df") == "df":
            bands = dedup_ops.df_prefix_rows(ds, threshold=0.5)
        else:
            bands = ds.map_batches(dedup_ops.prefix_gram_rows,
                                   fn_kwargs=dict(threshold=0.5),
                                   batch_format="pandas")
        _NEAR_DUP_CACHE[key] = _near_dup_pairs_streamed(
            ds, bands, dedup_ops.word_ngram_sets, threshold=0.5)
    return _NEAR_DUP_CACHE[key].copy()


def simhash_near_dups(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3) via 16-bit banding, distributed:
    simhash+bands via map_batches, bucket pairs via the sort-shuffle
    collision path (banded_candidate_pairs), candidate-scale dedup."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sh = ds.map_batches(dedup_ops.simhash64, batch_format="pandas")
    bands = sh.map_batches(dedup_ops.simhash_bands, batch_format="pandas")
    out = dedup_ops.banded_candidate_pairs(bands, dedup_ops.hamming_collide_block)
    out = out.drop_duplicates(["doc_a", "doc_b"])
    if len(out) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64),
                             "hamming": pd.Series([], dtype=np.int32)})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _load_queries(sf_dir: str, n: int = 5) -> dict:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    q = df[df["vec_id"] < n].sort_values("vec_id")
    return {"qid": q["vec_id"].to_numpy(np.int64),
            "mat": np.stack([np.asarray(v, np.float64) for v in q["embedding"]])}


def near_dup_clusters(sf_dir: str):
    """[rows-only] Near-dup CLUSTERS: MinHash-LSH pairs → verified Jaccard
    → connected components (min-label propagation). Returns one row per doc
    that belongs to a non-singleton cluster."""
    pairs = minhash_near_dups(sf_dir)
    if len(pairs) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "cluster_id": pd.Series([], dtype=np.int64)})
    return dedup_ops.connected_components(pairs[["doc_a", "doc_b"]])


def ann_cosine_topk(sf_dir: str):
    """Brute-force cosine top-10 for 5 query vectors (exact baseline)."""
    queries = _load_queries(sf_dir)
    qref = ray.put(queries)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               filter=pc.field("vec_id") >= 5)
    out = ann.brute_force_topk(ds, qref, k=10).to_pandas()
    out = out[["qid", "vid"]].astype(np.int64)
    return out.sort_values(["qid", "vid"]).reset_index(drop=True)


def ann_lsh_topk(sf_dir: str):
    """[rows-only] LSH-bucketed approximate cosine top-10 (scale path)."""
    queries = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               filter=pc.field("vec_id") >= 5)
    out = ann.lsh_topk(ds, queries, k=10, bits=10).to_pandas()
    out = out[["qid", "vid", "sim"]]
    out["sim"] = out["sim"].round(6)
    return out.sort_values(["qid", "vid"]).reset_index(drop=True)


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate cosine top-10 over a PERSISTED index
    (api/main.py:81-90's GiST analogue): the first call builds the index
    — quantizer trained on a corpus sample, corpus assigned to lists
    distributed, assignment written as ivf_list-partitioned parquet
    fragments — and every later call is an index SCAN of only the probed
    lists' files (no corpus-wide assignment pass; build_ivf_index is
    idempotent via its manifest)."""
    import hashlib
    import os

    queries = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               filter=pc.field("vec_id") >= 5)
    index_dir = os.path.join(
        "/tmp/crawler_ray_ivf",
        hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12])
    ann.build_ivf_index(ds, index_dir)
    out = ann.ivf_topk_indexed(index_dir, queries, k=10).to_pandas()
    out = out[["qid", "vid", "sim"]]
    out["sim"] = out["sim"].round(6)
    return out.sort_values(["qid", "vid"]).reset_index(drop=True)


PQ_TRAIN_MAX_VID = 261   # codebooks train on vec_id ∈ [5, 261) — a fixed id
                         # range, so the sample is layout-independent


def ann_pq_topk(sf_dir: str):
    """[golden] Product-quantization ADC top-10 (Jégou et al. 2011) — the
    memory-bound scale path of the ANN family: corpus vectors compress to
    m=8 one-byte codes, queries scan codes with integer lookup-table adds
    (never a d-dim matmul), and only per-batch top-k partials reach the
    merge. Codebooks are INTEGER k-means per subspace (functions/ann.py
    train_pq_codebooks), so codes, scores and the ranking are bit-exact on
    any block layout — the golden is a straight-line per-row loop."""
    queries_d = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               filter=pc.field("vec_id") >= 5)
    train = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                  filter=(pc.field("vec_id") >= 5)
                  & (pc.field("vec_id") < PQ_TRAIN_MAX_VID))
    out = ann.pq_topk(ds, train, queries_d, k=10).to_pandas()
    for c in ("qid", "vid", "score"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["qid", "vid"]).reset_index(drop=True)


def ann_pq_rerank_topk(sf_dir: str):
    """[golden] Two-stage PQ retrieval (ann.pq_topk_rerank): ADC top-100
    candidates per query over the 8-byte codes, exact cosine rerank of the
    candidate union only. Deterministic end-to-end (integer candidate set,
    float64 rerank with the vid tiebreak), so the golden is a loop
    replication of the identical two stages."""
    queries_d = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               filter=pc.field("vec_id") >= 5)
    train = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                  filter=(pc.field("vec_id") >= 5)
                  & (pc.field("vec_id") < PQ_TRAIN_MAX_VID))
    out = ann.pq_topk_rerank(ds, train, queries_d, k=10, r=100).to_pandas()
    out = out[["qid", "vid", "sim"]]
    out["sim"] = out["sim"].round(6)
    for c in ("qid", "vid"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["qid", "vid"]).reset_index(drop=True)


def embedding_near_dups(sf_dir: str, threshold: float = 0.45):
    """Embedding-cosine near-dup pairs (cosine ≥ threshold), EXACT, as a
    distributed tile grid (ann.tiled_near_dup_pairs): each Ray task holds
    two corpus blocks, never the whole corpus — no O(corpus) broadcast.
    Exactness is required at this threshold: measured on the fixture, the
    qualifying pairs are the ~2σ tail of the random-pair sim distribution
    (no gap), where banded LSH with recall≈1 admits more candidates than
    all-pairs; at true near-dup thresholds use ann.banded_near_dup_pairs.
    Emits (vid_a < vid_b, sim). The default threshold sits ≥5e-4 from
    every fixture pair, so the engine/DuckDB comparison cannot flip."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann.tiled_near_dup_pairs(ds, threshold)
    if len(out) == 0:
        return pd.DataFrame({"vid_a": pd.Series([], dtype=np.int64),
                             "vid_b": pd.Series([], dtype=np.int64),
                             "sim": pd.Series([], dtype=np.float64)})
    out["vid_a"] = out["vid_a"].astype(np.int64)
    out["vid_b"] = out["vid_b"].astype(np.int64)
    return out.sort_values(["vid_a", "vid_b"]).reset_index(drop=True)


def embedding_norm_stats(sf_dir: str):
    """Vector-column aggregate: mean L2 norm per label."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        norms = np.array([float(np.linalg.norm(np.asarray(v, np.float64))) for v in b["embedding"]])
        return b.assign(norm=norms).groupby("label", as_index=False).agg(
            n=("norm", "size"), sum_norm=("norm", "sum"))

    out = _fold(ds.map_batches(partial, batch_format="pandas"), ["label"],
                dict(n=("n", "sum"), sum_norm=("sum_norm", "sum")))
    out["avg_norm"] = (out["sum_norm"] / out["n"]).round(4)
    out = out[["label", "n", "avg_norm"]]
    out["n"] = out["n"].astype(np.int64)
    out["label"] = out["label"].astype(np.int64)
    return out.sort_values("label").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Audio / video (opaque binary columns, REAL decode — no media libs in the
# container, so the codecs are spec-implemented in sources/synthetic_media)
# ---------------------------------------------------------------------------

def audio_clip_features(sf_dir: str):
    """Audio decode + feature extraction over an opaque binary column: a
    deterministic ~4 % subset of docs each synthesize a PCM16 WAV clip
    (functional media, like the synthetic web), an actor-pool stage
    chunk-parses the RIFF container and extracts duration/RMS/ZCR/dominant
    frequency per clip. Golden-checked against the STDLIB `wave` decoder —
    a fully independent parser."""
    from crawler_ray.pipelines.multimodal import featurize_audio
    from crawler_ray.sources.synthetic_media import audio_wav_bytes

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(b: pd.DataFrame) -> pa.Table:
        ids = b["doc_id"].to_numpy(np.int64)
        ids = ids[ids % 23 == 3]
        return pa.table({
            "audio_id": pa.array([f"a{i}" for i in ids], pa.string()),
            "bytes": pa.array([audio_wav_bytes(f"a{i}", 42) for i in ids], pa.binary()),
        })

    out = featurize_audio(ds.map_batches(gen, batch_format="pandas")).to_pandas()
    return out.sort_values("audio_id").reset_index(drop=True)


def video_frame_sample(sf_dir: str):
    """Video frame sampling over an opaque binary column: a deterministic
    ~2.5 % subset of docs each synthesize an RVID container (length-prefixed
    PNG frames), an actor-pool stage parses the container, decodes every
    4th frame with the pure-numpy PNG codec and emits (frame dims, fps,
    phash) per sampled frame — the training-data frame-extraction shape."""
    from crawler_ray.pipelines.multimodal import video_frames
    from crawler_ray.sources.synthetic_media import video_bytes

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(b: pd.DataFrame) -> pa.Table:
        ids = b["doc_id"].to_numpy(np.int64)
        ids = ids[ids % 41 == 5]
        return pa.table({
            "video_id": pa.array([f"v{i}" for i in ids], pa.string()),
            "bytes": pa.array([video_bytes(f"v{i}", 42) for i in ids], pa.binary()),
        })

    out = video_frames(ds.map_batches(gen, batch_format="pandas"), every_n=4).to_pandas()
    return out.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)


def audio_near_dups(sf_dir: str):
    """Near-duplicate audio clips: the `audio_clip_features` corpus plus a
    deterministic ~20 % of clips re-mastered (small gain change + dither —
    sources/synthetic_media.near_dup_audio_bytes), detected by joint feature
    distance over a 1-D dominant-frequency grid with ghost replication
    (multimodal.audio_near_dup_pairs). Golden-checked against a brute-force
    all-pairs scan over STDLIB-wave-decoded features."""
    from crawler_ray.pipelines.multimodal import audio_near_dup_pairs, featurize_audio
    from crawler_ray.sources.synthetic_media import audio_wav_bytes, near_dup_audio_bytes

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(b: pd.DataFrame) -> pa.Table:
        ids = b["doc_id"].to_numpy(np.int64)
        ids = ids[ids % 23 == 3]
        out_ids: list[str] = []
        out_bytes: list[bytes] = []
        for i in ids:
            out_ids.append(f"a{i}")
            out_bytes.append(audio_wav_bytes(f"a{i}", 42))
            if i % 115 == 26:  # every 5th clip gets a re-mastered twin
                out_ids.append(f"a{i}x")
                out_bytes.append(near_dup_audio_bytes(f"a{i}", 42))
        return pa.table({"audio_id": pa.array(out_ids, pa.string()),
                         "bytes": pa.array(out_bytes, pa.binary())})

    feats = featurize_audio(ds.map_batches(gen, batch_format="pandas"))
    return audio_near_dup_pairs(feats)


def video_near_dups(sf_dir: str):
    """Near-duplicate videos: the `video_frame_sample` corpus plus a
    deterministic ~20 % re-cut 4 frames in (same footage, trimmed start —
    sources/synthetic_media.recut_video_bytes), detected by ≥2 shared
    sampled-frame phashes (multimodal.video_shared_phash_pairs: phash-bucket
    collision + distributed pair-count fold). Golden-checked against a
    brute-force pairwise frame-hash-set intersection over struct-walked
    containers."""
    from crawler_ray.pipelines.multimodal import video_frames, video_shared_phash_pairs
    from crawler_ray.sources.synthetic_media import recut_video_bytes, video_bytes

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(b: pd.DataFrame) -> pa.Table:
        ids = b["doc_id"].to_numpy(np.int64)
        ids = ids[ids % 41 == 5]
        out_ids: list[str] = []
        out_bytes: list[bytes] = []
        for i in ids:
            out_ids.append(f"v{i}")
            out_bytes.append(video_bytes(f"v{i}", 42))
            if i % 205 == 46:  # every 5th video gets a re-cut
                out_ids.append(f"v{i}x")
                out_bytes.append(recut_video_bytes(f"v{i}", 42))
        return pa.table({"video_id": pa.array(out_ids, pa.string()),
                         "bytes": pa.array(out_bytes, pa.binary())})

    frames = video_frames(ds.map_batches(gen, batch_format="pandas"), every_n=4)
    return video_shared_phash_pairs(frames, min_shared=2)


# ---------------------------------------------------------------------------
# Round-4 additions: OLAP rollup, sketch quantiles, anti-join, retrieval,
# decontamination
# ---------------------------------------------------------------------------

def rollup_lang_source(sf_dir: str):
    """Multi-level ROLLUP aggregate over (lang, source) in ONE data pass:
    the combiner shrinks each batch to the FINEST grouping set only, and the
    coarser levels derive from the folded finest-level frame (exact for
    counts/sums), so the shuffle moves O(finest groups) rows — never one
    replica of the fact table per grouping set, which is what a naive
    ROLLUP plan (union of three scans) costs at 100 TB."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    fine = _fold(ds.map_batches(partial, batch_format="pandas"),
                 ["lang", "source"],
                 dict(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")))
    by_lang = fine.groupby("lang", as_index=False)[["n_docs", "total_chars"]].sum()
    by_lang["source"] = "ALL"
    total = pd.DataFrame({"lang": ["ALL"], "source": ["ALL"],
                          "n_docs": [fine["n_docs"].sum()],
                          "total_chars": [fine["total_chars"].sum()]})
    out = pd.concat([fine, by_lang, total], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    return (out[["lang", "source", "n_docs", "total_chars"]]
            .sort_values(["lang", "source"]).reset_index(drop=True))


def histogram_quantiles(sf_dir: str):
    """Approximate per-group quantiles via a MERGEABLE fixed-grid histogram
    sketch (the deterministic counterpart of t-digest/KLL): each batch folds
    its values into integer bins (floor(value/w)), partials merge by
    ADDITION — associative, so block layout cannot perturb the sketch — and
    the driver walks O(groups × bins) cumulative counts once. The estimate
    is the upper edge of the bin holding the target rank; the rank threshold
    is pure-integer ((n·pct + 99) // 100) so no float-ceil ambiguity can
    split engine and oracle."""
    W = 2.0
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(b["value"].to_numpy(np.float64) / W).astype(np.int64)
        return (b.assign(bin=bins).groupby(["event_type", "bin"], as_index=False)
                .size().rename(columns={"size": "c"}))

    h = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "bin"], dict(c=("c", "sum")))
    rows = []
    for et, g in h.sort_values("bin").groupby("event_type"):
        n = int(g["c"].sum())
        cc = g["c"].cumsum().to_numpy(np.int64)
        edges = g["bin"].to_numpy(np.int64)
        est = {nm: float((edges[np.searchsorted(cc, (n * pct + 99) // 100)] + 1) * W)
               for nm, pct in (("p50_est", 50), ("p95_est", 95), ("p99_est", 99))}
        rows.append(dict(event_type=et, n=n, **est))
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def customers_without_orders(sf_dir: str):
    """Distributed ANTI-join: customers holding no pending ('P') order,
    rolled up per market segment. The order side prunes to the status at
    the Arrow scan and shrinks to DISTINCT keys in place (keyed repartition
    co-locates duplicates; per-block drop_duplicates is then globally
    distinct — kernels emit typed empties because empty hash partitions
    arrive schema-less), and a distributed left-outer hash join marks
    matches; nothing is collected or broadcast on either side."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    okeys = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"],
                  filter=pc.field("o_orderstatus") == "P").drop_columns(["o_orderstatus"])

    def distinct_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "o_custkey" not in b.columns:
            return pd.DataFrame({"o_custkey": pd.Series(dtype=np.int64),
                                 "matched": pd.Series(dtype=np.int64)})
        out = b.drop_duplicates().copy()
        out["matched"] = np.int64(1)
        return out.astype({"o_custkey": np.int64, "matched": np.int64})

    # materialize while the context snapshot is flipped to HASH_SHUFFLE,
    # then un-flip — the final chain otherwise executes this lineage under
    # the default sort-shuffle context and the keyed exchange refuses
    dk = (_keyed(okeys).repartition(_W(), keys=["o_custkey"])
          .map_batches(distinct_block, batch_format="pandas").materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    joined = cust.join(dk, join_type="left_outer", num_partitions=_W(),
                       on=("c_custkey",), right_on=("o_custkey",))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        miss = b.loc[b["matched"].isna()]
        return (miss.groupby("c_mktsegment", as_index=False)
                .size().rename(columns={"size": "n_customers"}))

    out = _fold(joined.map_batches(partial, batch_format="pandas"),
                ["c_mktsegment"], dict(n_customers=("n_customers", "sum")))
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# BM25 constants shared by engine and oracle; the oracle SQL spells out the
# identical float expression term-by-term in this tuple's order so both
# sides execute the same IEEE op sequence.
_BM25_TERMS = ("dup", "hash", "spark", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_search(sf_dir: str, k: int = 15):
    """BM25 top-k retrieval (Robertson's probabilistic ranking; the Lucene
    idf form ln(1+(N−df+0.5)/(df+0.5)), public) as TWO streaming passes:
    pass 1 folds per-batch partials into the corpus stats (N, avgdl, df per
    query term — O(terms) numbers on the driver); pass 2 re-scans, scores
    every batch fully vectorized against the broadcast stats, and keeps its
    LOCAL top-k, so the driver merges O(batches × k) candidate rows — the
    classic scatter-gather top-k retrieval shape. Score terms accumulate in
    fixed term order and round to 4 decimals on both sides."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = _BM25_TERMS

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype("string").str.split(" ")
        dl = toks.str.len().to_numpy(np.int64)
        ex = toks.explode()
        row = {"n_docs": [np.int64(len(b))], "sum_dl": [dl.sum()]}
        for t in terms:
            row[f"df_{t}"] = [np.int64((ex == t).groupby(level=0).any().sum())]
        return pd.DataFrame(row)

    st = ds.map_batches(stats_partial, batch_format="pandas").to_pandas().sum()
    n = int(st["n_docs"])
    avgdl = st["sum_dl"] / st["n_docs"]  # int64/int64 → float64, same op as SQL
    idf = {t: float(np.log(1.0 + (n - st[f"df_{t}"] + 0.5) / (st[f"df_{t}"] + 0.5)))
           for t in terms}

    def score_topk(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype("string").str.split(" ")
        dl = toks.str.len().to_numpy(np.float64)
        ex = toks.explode()
        denom_base = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl))
        score = np.zeros(len(b))
        for t in terms:  # fixed order == the oracle expression's order
            tf = ((ex == t).groupby(level=0).sum()
                  .reindex(toks.index).fillna(0).to_numpy(np.float64))
            score = score + idf[t] * (tf * (_BM25_K1 + 1.0)) / (tf + denom_base)
        out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                            "score": np.round(score, 4)})
        out = out.loc[out["score"] > 0]
        return (out.sort_values(["score", "doc_id"], ascending=[False, True],
                                kind="mergesort").head(k))

    parts = ds.map_batches(score_topk, batch_format="pandas").to_pandas()
    return (parts.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True))


def _five_grams(b: pd.DataFrame) -> pd.DataFrame:
    """Vectorized word-5-gram extraction: one token explode, then four
    shifted string concats masked at document boundaries — no per-row
    Python. Documents fixture text is strictly single-space-joined tokens,
    so split(' ') matches the oracle's string_split exactly."""
    toks = b["text"].astype("string").str.split(" ")
    lens = toks.str.len().to_numpy(np.int64)
    doc = np.repeat(b["doc_id"].to_numpy(np.int64), lens)
    s = toks.explode().astype("string").reset_index(drop=True)
    g = s
    for j in range(1, 5):
        g = g + " " + s.shift(-j)
    m = np.zeros(len(s), dtype=bool)
    if len(s) >= 5:
        m[: len(s) - 4] = doc[: len(s) - 4] == doc[4:]
    return pd.DataFrame({"doc_id": doc[m], "gram": g.to_numpy()[m]})


CHUNK_LEN, CHUNK_STRIDE = 64, 48      # tokens per window / window stride


def doc_chunk_stats(sf_dir: str):
    """Long-document CHUNKING accounting (the fixed-window + stride split
    every context-bounded trainer applies): a doc of n tokens yields
    ``1 + ceil(max(n - L, 0) / S)`` windows of length ≤ L at stride S; the
    overlap tokens are re-tokenized ``(chunks-1)·(L-S)`` times (capped by
    doc length at the tail). Per lang: docs, tokens, chunks, and the
    duplication overhead ppm — pure int64 arithmetic in one zero-shuffle
    combiner pass, so the DuckDB oracle is bit-exact."""
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].astype("string")
        n = (t.str.count(" ") + 1).to_numpy(np.int64)
        extra = np.maximum(n - CHUNK_LEN, 0)
        chunks = 1 + (extra + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        # tokens emitted across all windows (tail window may be short):
        # full windows cover L each; the last starts at (chunks-1)*S
        emitted = np.where(chunks == 1, n,
                           (chunks - 1) * CHUNK_LEN
                           + (n - (chunks - 1) * CHUNK_STRIDE))
        s = pd.DataFrame({"lang": b["lang"].astype(object),
                          "n": n, "chunks": chunks, "emitted": emitted})
        return s.groupby("lang", as_index=False).agg(
            n_docs=("n", "size"), n_tokens=("n", "sum"),
            n_chunks=("chunks", "sum"), n_emitted=("emitted", "sum"))

    out = _fold(ds.map_batches(partial, batch_format="pandas"),
                ["lang"], dict(n_docs=("n_docs", "sum"),
                               n_tokens=("n_tokens", "sum"),
                               n_chunks=("n_chunks", "sum"),
                               n_emitted=("n_emitted", "sum")))
    out["overhead_ppm"] = (1_000_000 * (out["n_emitted"] - out["n_tokens"])
                           // out["n_tokens"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def ngram_novelty(sf_dir: str):
    """Cross-batch n-gram NOVELTY — the corpus-growth curve a curation
    team tracks while ingesting ("how much of batch k is new text?"):
    with shard = doc_id % 10 standing in for arrival order, a word 5-gram
    is NOVEL in the first shard that contains it. Per shard: distinct
    grams present, novel grams, novelty in ppm (floor — both sides int).

    Distributed shape: per-batch combiner emits distinct (gram, shard)
    pairs, ONE gram-keyed repartition co-locates each gram's rows, and the
    per-block kernel computes min-shard + per-shard partial counts — the
    driver folds O(blocks × 10) rows; the vocabulary never leaves the
    workers (contrast top_tokens, whose CONTRACT is vocabulary-sized
    output)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = _five_grams(b)
        g["shard"] = (g["doc_id"] % 10).astype(np.int64)
        out = g[["gram", "shard"]].drop_duplicates()
        return pd.DataFrame({"gram": out["gram"].astype("string"),
                             "shard": out["shard"].to_numpy(np.int64)})

    def block_fold(b: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                          "n_distinct": pd.Series([], dtype=np.int64),
                          "n_novel": pd.Series([], dtype=np.int64)})
        if len(b) == 0 or "gram" not in b.columns:
            return e
        b = b.drop_duplicates(["gram", "shard"])
        mn = b.groupby("gram")["shard"].transform("min")
        s = pd.DataFrame({"shard": b["shard"].to_numpy(np.int64),
                          "novel": (b["shard"].to_numpy(np.int64)
                                    == mn.to_numpy(np.int64)).astype(np.int64)})
        return (s.groupby("shard", as_index=False)
                .agg(n_distinct=("novel", "size"), n_novel=("novel", "sum"))
                .astype(np.int64))

    pairs = ds.map_batches(partial, batch_format="pandas")
    co = (_keyed(pairs).repartition(_W(), keys=["gram"])
          .map_batches(block_fold, batch_format="pandas", batch_size=None))
    out = _fold(co, ["shard"], dict(n_distinct=("n_distinct", "sum"),
                                    n_novel=("n_novel", "sum")))
    out["novelty_ppm"] = ((1_000_000 * out["n_novel"].to_numpy(np.int64))
                          // out["n_distinct"].to_numpy(np.int64))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("shard").reset_index(drop=True)


def benchmark_decontaminate(sf_dir: str):
    """Training-data decontamination: flag corpus docs sharing any word
    5-gram with a benchmark/eval set (docs with doc_id % 97 == 0 stand in
    for the eval suite) — the GPT-3-style n-gram overlap scrub (Brown et
    al. 2020 app. C, public). The benchmark gram set is tiny BY NATURE
    (evals are KBs, the corpus is TBs), so it ships once per actor via
    ``ray.put`` and the corpus pass is an embarrassingly-parallel membership
    scan with a per-doc occurrence count — zero shuffle at any corpus
    size. Exact string membership (no hashing), so no collision can split
    engine and oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = (ds.map_batches(lambda b: b.loc[b["doc_id"] % 97 == 0],
                            batch_format="pandas")
             .map_batches(_five_grams, batch_format="pandas").to_pandas())
    # a corpus whose eval docs are all <5 tokens collects as a no-column
    # empty frame (all-empty pandas blocks) — guard the column access
    ref = ray.put(frozenset(bench["gram"]) if "gram" in bench.columns
                  else frozenset())

    class Scan:
        def __init__(self):
            self.grams = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b.loc[b["doc_id"] % 97 != 0]
            g = _five_grams(b)
            hit = g.loc[g["gram"].isin(self.grams)]
            return (hit.groupby("doc_id", as_index=False)
                    .size().rename(columns={"size": "n_hits"}))

    out = _fold(ds.map_batches(Scan, batch_format="pandas", concurrency=(1, 8)),
                ["doc_id"], dict(n_hits=("n_hits", "sum")))
    if len(out) == 0:  # no overlaps: typed empty, not a no-column frame
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "n_hits": pd.Series([], dtype=np.int64)})
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _word_grams_pos(b: pd.DataFrame, k: int = 8) -> pd.DataFrame:
    """Vectorized word-k-gram extraction WITH 1-based start positions and
    per-doc token counts: one token explode, k-1 shifted string concats
    masked at document boundaries — same zero-row-loop shape as
    ``_five_grams``. Fixture text is strictly single-space-joined tokens,
    so split(' ') matches the oracle's string_split exactly."""
    toks = b["text"].astype("string").str.split(" ")
    lens = toks.str.len().to_numpy(np.int64)
    doc = np.repeat(b["doc_id"].to_numpy(np.int64), lens)
    ntok = np.repeat(lens, lens)
    starts = np.cumsum(lens) - lens
    pos = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, lens) + 1
    s = toks.explode().astype("string").reset_index(drop=True)
    g = s
    for j in range(1, k):
        g = g + " " + s.shift(-j)
    m = np.zeros(len(s), dtype=bool)
    if len(s) >= k:
        m[: len(s) - (k - 1)] = doc[: len(s) - (k - 1)] == doc[k - 1:]
    return pd.DataFrame({"doc_id": doc[m], "pos": pos[m],
                         "n_tokens": ntok[m], "gram": g.to_numpy()[m]})


DUP_SPAN_K = 8


def dup_span_coverage(sf_dir: str):
    """Exact duplicated-SPAN coverage per document (the substring-dedup
    statistic of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", public): a word position is *covered* when it
    lies inside any k-gram (k=8) that also occurs in at least one OTHER
    document. Two record-level exchanges, nothing corpus-scale on the
    driver:

    1. HOT-GRAM BYPASS (round-5, VERDICT r04 #3): per input block, a gram
       already seen in ≥2 distinct docs WITHIN the block is PROVEN
       duplicated — its positions skip the gram exchange entirely and go
       straight to stage 2, with one marker row (doc_id=-1, pos=-1) per
       (block, sure-gram) sent through the exchange so the same gram's
       single-doc occurrences in OTHER blocks still learn its status. A
       corpus-stopword gram (millions of docs) is locally provable in
       every multi-doc block, so the exchange receives O(blocks) marker
       rows for it instead of O(occurrences) — the hot key disappears
       exactly where it used to melt a partition. This is EXACT (not a
       lossy cap): cross-docness ⟺ global min(doc)≠max(doc), and markers
       force min=-1≠max for proven grams.
    2. gram-keyed repartition of the residual (single-doc-per-block)
       occurrences → per-group min≠max is the global cross-doc test
       (cheaper than the former ``transform('nunique')``); emit the
       duplicated residual positions.
    3. doc-keyed repartition → per-block vectorized gaps-and-islands union
       of the [pos, pos+k-1] intervals (sorted positions, one boolean diff
       — no Python loop), then covered-token sums. Interval union is
       idempotent, so the bypass/residual split can never double-count.

    ``coverage_ppm`` is pure int64 arithmetic (``covered * 1e6 // n``), so
    no float-rounding rule can split engine and oracle. Exact string grams
    (no hashing): no collision can either."""
    k = DUP_SPAN_K
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = ds.map_batches(_word_grams_pos, fn_kwargs=dict(k=k),
                          batch_format="pandas")

    def split_sure(b: pd.DataFrame) -> pd.DataFrame:
        """Tag each gram row: sure=True when this BLOCK alone proves the
        gram cross-doc; sure rows bypass the gram exchange, and one marker
        row per (block, sure-gram) rides the exchange in their place."""
        if len(b) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64),
                                 "gram": pd.Series([], dtype="string"),
                                 "sure": pd.Series([], dtype=bool)})
        g = b.groupby("gram")["doc_id"]
        sure = (g.transform("min") != g.transform("max")).to_numpy()
        out = b.assign(sure=sure)
        sure_grams = b.loc[sure, "gram"].drop_duplicates()
        if len(sure_grams):
            markers = pd.DataFrame({
                "doc_id": np.full(len(sure_grams), -1, np.int64),
                "pos": np.full(len(sure_grams), -1, np.int64),
                "n_tokens": np.zeros(len(sure_grams), np.int64),
                "gram": sure_grams.to_numpy(),
                "sure": np.zeros(len(sure_grams), bool),
            })
            out = pd.concat([out, markers], ignore_index=True)
        return out

    tagged = rows.map_batches(split_sure, batch_format="pandas",
                              batch_size=None).materialize()
    sure_rows = tagged.map_batches(
        lambda b: b.loc[b["sure"], ["doc_id", "pos", "n_tokens"]],
        batch_format="pandas")
    unsure = tagged.map_batches(
        lambda b: b.loc[~b["sure"], ["doc_id", "pos", "n_tokens", "gram"]],
        batch_format="pandas")

    def dup_positions(b: pd.DataFrame) -> pd.DataFrame:
        # empty hash-shuffle partitions arrive schema-less (CLAUDE.md);
        # emit the typed shape explicitly
        if len(b) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64)})
        g = b.groupby("gram")["doc_id"]
        dup = (g.transform("min") != g.transform("max")).to_numpy()
        keep = dup & (b["pos"].to_numpy(np.int64) >= 0)  # markers carry no span
        return (b.loc[keep, ["doc_id", "pos", "n_tokens"]]
                .reset_index(drop=True))

    def coverage(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n_tokens": pd.Series([], dtype=np.int64),
                              "covered_tokens": pd.Series([], dtype=np.int64),
                              "coverage_ppm": pd.Series([], dtype=np.int64)})
        if len(b) == 0:
            return empty
        b = b.sort_values(["doc_id", "pos"], kind="mergesort")
        doc = b["doc_id"].to_numpy(np.int64)
        pos = b["pos"].to_numpy(np.int64)
        new_isl = np.ones(len(b), dtype=bool)
        new_isl[1:] = (doc[1:] != doc[:-1]) | (pos[1:] > pos[:-1] + k - 1)
        si = np.flatnonzero(new_isl)                      # island start idx
        ei = np.append(si[1:] - 1, len(b) - 1)            # island end idx
        span_len = pos[ei] + (k - 1) - pos[si] + 1
        f = pd.DataFrame({"doc_id": doc[si], "len": span_len})
        cov = f.groupby("doc_id", as_index=False)["len"].sum()
        ntok = (b.drop_duplicates("doc_id")[["doc_id", "n_tokens"]]
                .reset_index(drop=True))
        out = ntok.merge(cov, on="doc_id")
        covered = out["len"].to_numpy(np.int64)
        n = out["n_tokens"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy(np.int64),
                             "n_tokens": n, "covered_tokens": covered,
                             "coverage_ppm": covered * 1_000_000 // n})

    hits = (_keyed(unsure).repartition(_W(), keys=["gram"])
            .map_batches(dup_positions, batch_format="pandas",
                         batch_size=None)
            .materialize())
    out = (_keyed(hits.union(sure_rows)).repartition(_W(), keys=["doc_id"])
           .map_batches(coverage, batch_format="pandas", batch_size=None)
           .materialize())
    out.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    res = out.to_pandas()
    if len(res) == 0:  # nothing duplicated: blocks arrive schema-less
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "n_tokens": pd.Series([], dtype=np.int64),
                             "covered_tokens": pd.Series([], dtype=np.int64),
                             "coverage_ppm": pd.Series([], dtype=np.int64)})
    return res.sort_values("doc_id").reset_index(drop=True)


def triangle_count(sf_dir: str):
    """Exact triangle statistics (Suri & Vassilvitskii 2011 degree-ordered
    orientation — see functions/graph.py triangle_stats) over the same
    derived interaction graph pagerank_users uses. Emits one row
    (n_nodes, n_edges, n_wedges, n_triangles); all-integer, so the
    three-way-join DuckDB oracle matches bit-for-bit."""
    from crawler_ray.functions import graph

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    edges = ds.map_batches(
        lambda b: pd.DataFrame({"src": b["user_id"].to_numpy(np.int64),
                                "dst": b["event_id"].to_numpy(np.int64) % 150}),
        batch_format="pandas")
    return graph.triangle_stats(edges)


def pagerank_users(sf_dir: str):
    """Iterative distributed PageRank (Brin & Page 1998) over a derived
    interaction graph (src = user_id, dst = event_id % 150, distinct) in
    EXACT integer arithmetic — functions/graph.py: integer unit flow is
    associative, so engine, the 10-round unrolled SQL oracle and any
    cluster size produce bit-identical ranks (float PageRank differs in
    ulps between summation orders and cannot be oracle-checked). The tiny
    derived graph takes the in-memory fast path; the broadcast and join
    scale modes are pinned bit-identical in tests/test_graph.py."""
    from crawler_ray.functions import graph

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    edges = ds.map_batches(
        lambda b: pd.DataFrame({"src": b["user_id"].to_numpy(np.int64),
                                "dst": b["event_id"].to_numpy(np.int64) % 150}),
        batch_format="pandas")
    out = graph.pagerank_units(graph.distinct_edges(edges), n_iters=10)
    return out


def kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means (k=8, 5 rounds) over the embedding
    vectors in EXACT integer state (functions/cluster.py): quantized-grid
    coordinates, floor-of-mean centroids, integer distances — so any block
    layout or cluster size yields bit-identical centroids/counts, checked
    against an independent per-row-loop golden. Returns per-cluster size
    and the integer squared centroid norm."""
    from crawler_ray.functions import cluster

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent, counts = cluster.kmeans_quantized(ds, "vec_id", "embedding",
                                            k=8, n_iters=5)
    return pd.DataFrame({
        "cluster": np.arange(len(counts), dtype=np.int64),
        "n_members": counts.astype(np.int64),
        "centroid_norm2": np.einsum("kd,kd->k", cent, cent).astype(np.int64),
    })


def bpe_top_pairs(sf_dir: str, k: int = 20):
    """The BPE-trainer merge-step primitive (Sennrich et al. 2016,
    public): EXACT corpus-wide counts of ADJACENT token pairs, top-k by
    (count desc, pair asc) — the pair a tokenizer trainer would merge
    next. Same combiner → sort shuffle → per-block fold shape as
    ``top_tokens`` (unbounded pair vocabulary, driver sees O(result));
    pair construction reuses the one-explode + shifted-concat gram kernel
    (no row loop). A full BPE trainer runs this once per merge round over
    re-tokenized text; the query exposes one round."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = _word_grams_pos(b, k=2)["gram"].value_counts()
        return pd.DataFrame({"pair": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("pair", as_index=False).agg(cnt=("cnt", "sum"))

    out = _sorted_fold(ds.map_batches(partial, batch_format="pandas"),
                       ["pair"], fold)
    out["cnt"] = out["cnt"].astype(np.int64)
    out = out.sort_values(["cnt", "pair"], ascending=[False, True],
                          kind="mergesort")
    return out.head(k).reset_index(drop=True)


CORPUS_MIN_TOKENS = 20


def corpus_build(sf_dir: str, near_dedup: bool | None = None):
    """FLAGSHIP COMPOSITE: the end-to-end training-corpus construction
    pipeline the individual operators exist for, composed as one lazy
    Dataset chain —

    1. eval-set holdout + token-length gate + Gopher repetition gate
       (all per-batch vectorized, ZERO shuffle at any corpus size),
    2. exact content dedup: one text_hash-keyed exchange, first-wins per
       co-located hash group (min doc_id),
    3. GPT-3 5-gram decontamination: benchmark gram set broadcast once
       (``ray.put`` — evals are KBs, the corpus is TBs), vectorized
       membership scan,
    4. token-budget sequence packing: distributed exclusive prefix scan
       (O(blocks) driver carry) → shard_id = tok_before // budget,
    5. per-shard rollup (combiner + tiny fold).

    With ``near_dedup=True`` (or ``GRAFT_CORPUS_MINHASH=1``) a stage 2b
    runs between exact dedup and decontamination: MinHash-LSH near-dup
    removal over the exact-dedup survivors via the streamed candidate
    path of ``_near_dup_pairs_streamed`` (bands → sort-shuffle bucket
    collision → distributed pair dedup → candidate semi-join →
    keyed-join verify — nothing corpus-fraction on the driver), then
    min-label connected components keep the min-doc_id representative
    per cluster; the drop set is result-scale by construction (≤ 2×
    verified pairs) and broadcasts back with the same economics as the
    stage-3 eval-gram broadcast. Exposed as ``corpus_build_neardup``
    (golden-checked; the LSH stage is not ANSI-SQL-expressible).

    Output: one row per shard (n_docs, n_tokens, first/last doc). The
    DuckDB oracle replicates all five stages as one CTE chain; every
    gate compares in exact int/IEEE-identical arithmetic."""
    if near_dedup is None:
        near_dedup = os.environ.get("GRAFT_CORPUS_MINHASH", "0") == "1"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty2 = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                           "text": pd.Series([], dtype=object)})

    def gates(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["doc_id"] % 97 != 0]
        t = b["text"].astype("string")
        n = (t.str.count(" ") + 1).to_numpy(np.int64)
        b = b.loc[n >= CORPUS_MIN_TOKENS]
        if len(b) == 0:
            return empty2
        r = textops.repetition_stats(b)
        ok = set(r.loc[r["flagged"] == 0, "doc_id"])
        return b.loc[b["doc_id"].isin(ok), ["doc_id", "text"]]

    f = ds.map_batches(gates, batch_format="pandas")

    def with_hash(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return empty2.assign(text_hash=pd.Series([], dtype=np.uint64))
        return b.assign(text_hash=xxh64_array(b["text"]))

    def first_wins(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return empty2.assign(text_hash=pd.Series([], dtype=np.uint64))
        b = b.sort_values(["text_hash", "doc_id"], kind="mergesort")
        return b.loc[~b["text_hash"].duplicated(keep="first")]

    dd = (_keyed(f.map_batches(with_hash, batch_format="pandas"))
          .repartition(_W(), keys=["text_hash"])
          .map_batches(first_wins, batch_format="pandas", batch_size=None)
          .materialize())
    dd.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy

    if near_dedup:
        # stage 2b: MinHash-LSH near-dup removal over the exact-dedup
        # survivors, streamed end-to-end; only VERIFIED pairs (result-scale)
        # reach the driver for min-label components + drop-set broadcast.
        docs2 = dd.map_batches(lambda b: b[["doc_id", "text"]],
                               batch_format="pandas")
        bands = docs2.map_batches(dedup_ops.minhash_bands,
                                  batch_format="pandas")
        pairs = _near_dup_pairs_streamed(docs2, bands, dedup_ops.doc_shingles,
                                         threshold=0.5)
        if len(pairs):
            cc = dedup_ops.connected_components(pairs[["doc_a", "doc_b"]])
            drop_ref = ray.put(frozenset(
                int(d) for d, c in zip(cc["doc_id"], cc["cluster_id"])
                if int(d) != int(c)))

            class NearDrop:
                def __init__(self):
                    self.drop = ray.get(drop_ref)

                def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                    return b.loc[~b["doc_id"].isin(self.drop)]

            dd = dd.map_batches(NearDrop, batch_format="pandas",
                                concurrency=(1, 8))

    bench = (ds.map_batches(lambda b: b.loc[b["doc_id"] % 97 == 0],
                            batch_format="pandas")
             .map_batches(_five_grams, batch_format="pandas").to_pandas())
    # a corpus whose eval docs are all <5 tokens collects as a no-column
    # empty frame (all-empty pandas blocks) — guard the column access
    ref = ray.put(frozenset(bench["gram"]) if "gram" in bench.columns
                  else frozenset())

    class Scrub:
        def __init__(self):
            self.grams = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return empty2
            g = _five_grams(b)
            hit = set(g.loc[g["gram"].isin(self.grams), "doc_id"])
            return b.loc[~b["doc_id"].isin(hit), ["doc_id", "text"]]

    clean = dd.map_batches(Scrub, batch_format="pandas", concurrency=(1, 8))

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].astype("string")
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                             "n_tokens": (t.str.count(" ") + 1).to_numpy(np.int64)})

    toks = clean.map_batches(count_tokens, batch_format="pandas")
    packed = scan.cumulative_sum_ds(toks, ["doc_id"], "n_tokens",
                                    out_col="tok_before", exclusive=True)

    def shard_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("shard_id", "n_docs", "n_tokens",
                                           "first_doc", "last_doc")})
        sid = b["tok_before"].to_numpy(np.int64) // PACK_TOKEN_BUDGET
        return (b.assign(shard_id=sid)
                .groupby("shard_id", as_index=False)
                .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"),
                     first_doc=("doc_id", "min"), last_doc=("doc_id", "max")))

    out = _fold(packed.map_batches(shard_partial, batch_format="pandas"),
                ["shard_id"],
                dict(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
                     first_doc=("first_doc", "min"), last_doc=("last_doc", "max")))
    if len(out) == 0:  # every doc gated: typed empty, not a no-column frame
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("shard_id", "n_docs", "n_tokens",
                                       "first_doc", "last_doc")})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("shard_id").reset_index(drop=True)


SEMANTIC_DEDUP_THRESHOLD = 0.45  # same cosine bar as embedding_near_dups


def semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, public): cluster the embedding corpus
    with the integer-exact k-means (deterministic assignment on every
    cluster size / block layout), then drop, WITHIN each cluster, every
    vector that has a same-cluster neighbour with cosine ≥ τ and a smaller
    vec_id. The drop rule is the pure pairwise id-order variant (greedy
    rescan variants differ run-to-run on unordered corpora); the golden
    mirrors it with an independent loop k-means + per-pair dots.

    Scale shape: pairwise search touches only same-cluster co-located
    blocks (one cluster-keyed repartition), so the all-pairs cost is
    Σ|cluster|² — the published SemDeDup economics. Clusters larger than
    ``GRAFT_SEMDEDUP_TILE_LIMIT`` rows (one hot cluster at corpus scale
    would otherwise be an O(|cluster|²) single-block matmul) are routed
    through the distributed tile grid of ``ann.tiled_near_dup_pairs``
    instead — both paths implement the identical id-order drop rule and
    are pinned equal on a planted giant cluster in tests. The k-means pass
    itself folds O(k·d) integer partials; nothing corpus-scale ever sits
    on the driver."""
    return semantic_dedup_ds(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))


def semantic_dedup_ds(ds, k: int = 8, n_iters: int = 5,
                      tile_limit: int | None = None) -> pd.DataFrame:
    """Core SemDeDup over a (vec_id, embedding) Dataset; see
    :func:`semantic_dedup`. ``tile_limit`` = max cluster rows allowed on the
    in-block all-pairs path (default env GRAFT_SEMDEDUP_TILE_LIMIT, 20000)."""
    from crawler_ray.functions import cluster as cl

    if tile_limit is None:
        tile_limit = int(os.environ.get("GRAFT_SEMDEDUP_TILE_LIMIT", "20000"))
    cent, _ = cl.kmeans_quantized(ds, "vec_id", "embedding", k=k, n_iters=n_iters)

    def assign(b: pd.DataFrame, c=cent) -> pa.Table:
        xq = cl.quantize(b["embedding"])
        a = cl.assign_ids(xq, c)
        return pa.table({
            "vec_id": pa.array(b["vec_id"].to_numpy(np.int64), pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "embedding": pa.array([np.asarray(v, np.float32)
                                   for v in b["embedding"]],
                                  pa.list_(pa.float32())),
        })

    assigned = ds.map_batches(assign, batch_format="pandas").materialize()

    # per-cluster sizes: O(k) rows per block partial, O(k) driver fold
    sizes = (assigned.map_batches(
        lambda b: pd.DataFrame({"cluster": b["cluster"].to_numpy(np.int64)})
        .groupby("cluster", as_index=False).size(),
        batch_format="pandas").to_pandas()
        .groupby("cluster")["size"].sum())
    oversize = sorted(int(c) for c, n in sizes.items() if n > tile_limit)

    def drops(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "cluster": pd.Series([], dtype=np.int64),
                              "dup_of": pd.Series([], dtype=np.int64),
                              "sim": pd.Series([], dtype=np.float64)})
        if len(b) == 0:
            return empty
        outs = []
        for cid, g in b.groupby("cluster"):
            if len(g) < 2:
                continue
            g = g.sort_values("vec_id", kind="mergesort")
            m = np.stack([np.asarray(v, np.float64) for v in g["embedding"]])
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            m = m / n
            sims = m @ m.T
            ids = g["vec_id"].to_numpy(np.int64)
            iu = np.triu_indices(len(g), k=1)
            mask = sims[iu] >= SEMANTIC_DEDUP_THRESHOLD
            if not mask.any():
                continue
            df = pd.DataFrame({"vec_id": ids[iu[1][mask]],
                               "dup_of": ids[iu[0][mask]],
                               "sim": sims[iu][mask]})
            agg = (df.sort_values(["vec_id", "dup_of"], kind="mergesort")
                   .groupby("vec_id", as_index=False).first())
            agg["cluster"] = np.int64(cid)
            outs.append(agg)
        if not outs:
            return empty
        out = pd.concat(outs, ignore_index=True)
        out["sim"] = out["sim"].round(6)
        return out[["vec_id", "cluster", "dup_of", "sim"]]

    small = assigned
    if oversize:
        ov = frozenset(oversize)
        small = assigned.map_batches(
            lambda b: b.loc[~b["cluster"].isin(ov)], batch_format="pandas")
    dk = (_keyed(small).repartition(_W(), keys=["cluster"])
          .map_batches(drops, batch_format="pandas", batch_size=None)
          .materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    parts = [dk.to_pandas()]
    # oversize clusters: the identical id-order drop rule via the
    # distributed tile grid — each tile task holds two blocks + one tile of
    # sims, never the O(|cluster|²) matrix (_tile_pairs rounds sims to the
    # same 6-decimal grid, and selection is by smallest dup_of, so rounding
    # cannot change which pair is reported)
    for cid in oversize:
        sub = assigned.map_batches(
            lambda b, c=cid: b.loc[b["cluster"].to_numpy(np.int64) == c,
                                   ["vec_id", "embedding"]],
            batch_format="pandas")
        pairs = ann.tiled_near_dup_pairs(sub, SEMANTIC_DEDUP_THRESHOLD)
        if not len(pairs):
            continue
        agg = (pairs.rename(columns={"vid_b": "vec_id", "vid_a": "dup_of"})
               .sort_values(["vec_id", "dup_of"], kind="mergesort")
               .groupby("vec_id", as_index=False).first())
        agg["cluster"] = np.int64(cid)
        parts.append(agg[["vec_id", "cluster", "dup_of", "sim"]])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("vec_id").reset_index(drop=True)


def _pagerank_oracle(n_iters: int = 10, total_units: int = 10**12,
                     damping_pct: int = 85) -> str:
    """Unrolled SQL power iteration: one CTE per round, pure integer
    arithmetic (``//`` floors), identical semantics to graph.pagerank_units."""
    rem = 100 - damping_pct
    head = f"""
        WITH e AS (SELECT DISTINCT user_id AS src, event_id % 150 AS dst FROM events),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
        consts AS (SELECT CAST({total_units} // COUNT(*) AS BIGINT) AS r0,
                          CAST(({total_units} * {rem} // 100) // COUNT(*) AS BIGINT) AS base
                   FROM nodes),
        r0 AS (SELECT node, (SELECT r0 FROM consts) AS u FROM nodes)"""
    rounds = "".join(f""",
        r{i + 1} AS (
          SELECT n.node,
                 (SELECT base FROM consts)
                 + COALESCE(SUM((r.u * {damping_pct} // 100) // deg.d), 0) AS u
          FROM nodes n
          LEFT JOIN e ON e.dst = n.node
          LEFT JOIN r{i} r ON r.node = e.src
          LEFT JOIN deg ON deg.src = e.src
          GROUP BY n.node)""" for i in range(n_iters))
    return (head + rounds
            + f"\n        SELECT node, CAST(u AS BIGINT) AS rank_units"
              f" FROM r{n_iters} ORDER BY node")


# ---------------------------------------------------------------------------
# Registry + DuckDB oracles (column names match exactly)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Sketch-accelerated joins + heavy hitters (Bloom / salted / Count-Min)
# ---------------------------------------------------------------------------


def bloom_semi_join(sf_dir: str):
    """Semi-join with Bloom pre-pruning: revenue of lineitems belonging to
    URGENT orders. The build side folds per-block Bloom partials
    (functions/sketches.py) that merge by OR on the driver — O(filter
    bytes), never keys — and the probe side drops ~4/5 of the fact table
    INSIDE ``map_batches`` before anything shuffles; only the <1 %-FP
    survivor set pays the distributed hash join, which restores exactness
    (Bloom has no false negatives). At 100 TB this is the difference
    between shuffling the whole fact table and shuffling the semi-join
    result: the filter is a few hundred MB broadcast once per actor via
    ``ray.put``."""
    from crawler_ray.functions import sketches as sk

    urgent = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda b: b.loc[b["o_orderpriority"] == "1-URGENT", ["o_orderkey"]],
        batch_format="pandas")
    # size the filter from parquet metadata alone (orders row count is an
    # upper bound on build keys — no data read for the decision)
    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    m_bits = sk.bloom_m_bits(n_orders)

    def bloom_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = _murmur64(b["o_orderkey"].to_numpy(np.int64).view(np.uint64))
        return pd.DataFrame({"filt": [sk.bloom_build(h, m_bits).tobytes()]})

    parts = urgent.map_batches(bloom_partial, batch_format="pandas").to_pandas()
    filt = np.zeros(m_bits >> 6, np.uint64)
    for blob in parts["filt"]:
        filt = sk.bloom_merge(filt, np.frombuffer(blob, np.uint64))
    filt_ref = ray.put(filt)

    class BloomPrune:
        def __init__(self):
            self.filt = ray.get(filt_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            h = _murmur64(b["l_orderkey"].to_numpy(np.int64).view(np.uint64))
            return b.loc[sk.bloom_contains(self.filt, h)]

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"])
    survivors = li.map_batches(BloomPrune, batch_format="pandas", concurrency=(1, 8))
    verified = survivors.join(urgent, join_type="inner", num_partitions=_W(),
                              on=("l_orderkey",), right_on=("o_orderkey",))

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_returnflag", as_index=False).agg(
            n_items=("l_orderkey", "size"), revenue=("l_extendedprice", "sum"))

    out = _fold(verified.map_batches(agg_partial, batch_format="pandas"),
                ["l_returnflag"],
                dict(n_items=("n_items", "sum"), revenue=("revenue", "sum")))
    out["n_items"] = out["n_items"].astype(np.int64)
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def skew_join_brand_revenue(sf_dir: str):
    """Skew-safe fact⋈dim join: revenue per part brand via a SALTED inner
    join (functions/joins.py `salted_join`). A cheap sampled pre-pass
    flags hot keys; their fact rows spread round-robin over 8 salts while
    the dim replicates hot rows once per salt — one hot key melts 8
    reducers instead of one, cold keys pay nothing, and the result is
    EXACTLY the unsalted join (the hot set is a performance hint, not a
    correctness input). The detection threshold scales with the fact row
    count, so it flags the same frequency share at any corpus size."""
    from crawler_ray.functions import joins as jn

    fact = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    n_rows = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    hot = jn.sampled_hot_keys(fact, "l_partkey",
                              threshold=max(32, n_rows // 2000))
    dim = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = jn.salted_join(fact, dim, key="l_partkey", dim_key="p_partkey",
                            hot=hot, salts=8)

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("p_brand", as_index=False).agg(
            n_items=("l_partkey", "size"), revenue=("l_extendedprice", "sum"))

    out = _fold(joined.map_batches(agg_partial, batch_format="pandas"),
                ["p_brand"],
                dict(n_items=("n_items", "sum"), revenue=("revenue", "sum")))
    out["n_items"] = out["n_items"].astype(np.int64)
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("p_brand").reset_index(drop=True)


CMS_PHI = 0.0013  # heavy-hitter frequency share (φ of total stream mass)


def cms_heavy_bigrams(sf_dir: str):
    """φ-heavy-hitter word bigrams, EXACT, via a two-pass Count-Min sketch
    (functions/sketches.py). Pass 1 folds per-block (bigram, count) partials
    into 512 KiB CMS matrices that merge by elementwise ADD — the driver
    sees sketches, never the unbounded bigram vocabulary — plus the total
    stream mass, which fixes the threshold T = ⌈φ·total⌉. Pass 2 broadcasts
    the merged sketch, queries it per DISTINCT block bigram, and emits
    block-local exact counts ONLY for candidates (CMS never undercounts, so
    every true φ-heavy bigram is a candidate in every block — the partial
    sums are complete); the driver folds the bounded candidate partials
    (≤1/φ true heavies + FPs) and keeps true count ≥ T. Identical result to
    the full GROUP BY ... HAVING, at a driver/shuffle cost of O(1/φ), not
    O(vocabulary)."""
    from crawler_ray.functions import sketches as sk
    from crawler_ray.hashing import xxh64_array

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sketch_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = _word_grams_pos(b, k=2)["gram"].value_counts()
        h = xxh64_array(vc.index.to_numpy(object).tolist())
        cms = sk.cms_build(h, vc.to_numpy(np.int64))
        return pd.DataFrame({"cms": [cms.tobytes()],
                             "total": np.array([vc.sum()], np.int64)})

    parts = ds.map_batches(sketch_partial, batch_format="pandas").to_pandas()
    cms = np.zeros((sk.CMS_D, sk.CMS_W), np.int64)
    for blob in parts["cms"]:
        cms = sk.cms_merge(cms, np.frombuffer(blob, np.int64).reshape(sk.CMS_D, sk.CMS_W))
    total = int(parts["total"].sum())
    thresh = max(1, int(np.ceil(CMS_PHI * total)))
    cms_ref = ray.put(cms)

    class CandidateCounts:
        def __init__(self):
            self.cms = ray.get(cms_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            vc = _word_grams_pos(b, k=2)["gram"].value_counts()
            est = sk.cms_query(self.cms, xxh64_array(vc.index.to_numpy(object).tolist()))
            keep = est >= thresh
            return pd.DataFrame({"bigram": vc.index.to_numpy(object)[keep],
                                 "cnt": vc.to_numpy(np.int64)[keep]})

    cand = _fold(ds.map_batches(CandidateCounts, batch_format="pandas",
                                concurrency=(1, 8)),
                 ["bigram"], dict(cnt=("cnt", "sum")))
    cand = cand.loc[cand["cnt"] >= thresh]
    cand["cnt"] = cand["cnt"].astype(np.int64)
    return (cand.sort_values(["cnt", "bigram"], ascending=[False, True],
                             kind="mergesort").reset_index(drop=True))


def per_source_cap(sf_dir: str, k: int = 5, seed: int = 21):
    """Per-source document caps (the C4/RefinedWeb per-host balance rule):
    keep at most k docs per source, chosen by a deterministic murmur64
    order (DuckDB ``hash()``-compatible, so fully oracle-checkable — a
    random ROW_NUMBER would not be). Rank = the distributed PARTITION BY
    running count (functions/scan.py `grouped_cumulative_sum_ds` over a
    ones column, exclusive): one sort exchange, O(blocks) driver carry at
    ANY source cardinality — never a per-source counter anywhere."""
    from crawler_ray.functions import scan

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def add_cols(b: pd.DataFrame) -> pd.DataFrame:
        h = (_murmur64(b["doc_id"].to_numpy(np.int64).view(np.uint64)
                       ^ np.uint64(seed)) % np.uint64(2**31)).astype(np.int64)
        return b.assign(h=h, one=np.ones(len(b), np.int64))

    ranked = scan.grouped_cumulative_sum_ds(
        ds.map_batches(add_cols, batch_format="pandas"),
        "source", ["h", "doc_id"], "one", out_col="rk", exclusive=True)
    out = (ranked.map_batches(
        lambda b: b.loc[b["rk"] < k, ["source", "doc_id"]],
        batch_format="pandas").to_pandas())
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def embedding_covariance(sf_dir: str):
    """Exact distributed covariance of the embedding corpus
    (functions/linalg.py): each block reduces to O(d²) integer moment
    partials (count, coordinate sums, d×d second-moment matrix) that merge
    by addition; the driver folds blocks with Python-int arithmetic (exact
    at any corpus size) and emits the upper triangle of
    m2 = n·S − s·sᵀ (= n²·cov·scale²) — 2,080 BIGINT rows for d=64,
    bit-equal to DuckDB computing the same quantized sums. Row data never
    reaches the driver; a 10^10-row corpus folds the same (blocks × 33 KiB)
    partials."""
    from crawler_ray.functions import linalg

    d = 64
    ds = _read(sf_dir, "embeddings", ["embedding"])
    parts = ds.map_batches(linalg.moment_partial, batch_format="pandas").to_pandas()
    n, s, S = linalg.fold_moments(parts, d)
    m2 = linalg.scaled_covariance(n, s, S)
    iu = np.triu_indices(d)
    out = pd.DataFrame({"i": (iu[0] + 1).astype(np.int64),
                        "j": (iu[1] + 1).astype(np.int64),
                        "m2": [int(v) for v in m2[iu]]})
    out["m2"] = out["m2"].astype(np.int64)  # raises on overflow, never wraps
    return out


def embedding_pca(sf_dir: str, k: int = 4):
    """PCA over the exact distributed covariance: top-k explained-variance
    ratios (in ppm of the trace) from a d×d dense eigensolve on the driver
    — O(d³) once, independent of corpus size; everything corpus-scale is
    the integer moment fold. Golden-checked against an independent per-row
    Python-loop moment computation (the distributed part is what differs)."""
    from crawler_ray.functions import linalg

    d = 64
    ds = _read(sf_dir, "embeddings", ["embedding"])
    parts = ds.map_batches(linalg.moment_partial, batch_format="pandas").to_pandas()
    n, s, S = linalg.fold_moments(parts, d)
    m2 = linalg.scaled_covariance(n, s, S)
    trace = int(np.trace(m2))
    vals, _ = linalg.top_eigs(m2, k=k)
    ppm = np.floor(vals / float(trace) * 1e6 + 0.5).astype(np.int64)
    return pd.DataFrame({"comp": np.arange(1, k + 1, dtype=np.int64),
                         "var_ppm": ppm})


BPE_N_MERGES = 10
BPE_SAMPLE_SEED = 97


def bpe_tokenize(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Full BPE tokenizer round (functions/bpe.py): TRAIN the merge table
    on a deterministic hash-sampled quarter of the corpus (murmur64(doc_id)
    — the trainer never needs the full corpus; each round is one combiner
    pass over the materialized sample state, incremental re-encode), then
    ENCODE the whole corpus with the learned table broadcast in the closure
    and count each merged symbol's occurrences — one vectorized pass, the
    stage that actually runs at 100 TB. Output: (rank, pair, cnt) per rule.
    Golden-checked against an independent per-doc loop trainer+encoder."""
    from crawler_ray.functions import bpe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        h = _murmur64(b["doc_id"].to_numpy(np.int64).view(np.uint64)
                      ^ np.uint64(BPE_SAMPLE_SEED))
        return b.loc[(h % np.uint64(4)) == 0, ["text"]]

    merges = bpe.train_bpe_ds(ds.map_batches(sample, batch_format="pandas"),
                              n_merges)
    symbols = [a + bpe.SEP + b for a, b in merges]

    def count_partial(b: pd.DataFrame, ms=tuple(merges)) -> pd.DataFrame:
        enc = bpe.encode_batch(b, list(ms))
        flat, _, _ = bpe._flatten(enc["toks"])
        vc = pd.Series(flat, dtype=object).value_counts()
        vc = vc[vc.index.isin(symbols)]
        return pd.DataFrame({"sym": vc.index.astype(object),
                             "cnt": vc.to_numpy(np.int64)})

    tot = _fold(ds.map_batches(count_partial, batch_format="pandas"),
                ["sym"], dict(cnt=("cnt", "sum")))
    cnt_by_sym = dict(zip(tot["sym"], tot["cnt"])) if len(tot) else {}
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "pair": [s.replace(bpe.SEP, " ") for s in symbols],
        "cnt": np.array([int(cnt_by_sym.get(s, 0)) for s in symbols], np.int64),
    })


def bpe_compression_ratio(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Tokenizer compression accounting — the chars-per-token statistic a
    corpus publishes per language to budget training tokens (and the
    number that decides whether a tokenizer is re-trained for a new
    language mix): train the SAME hash-sampled merge table as
    ``bpe_tokenize``, encode the whole corpus with the table broadcast in
    the closure (one vectorized pass — the stage that runs at 100 TB),
    and roll up per lang n_docs / total_chars / total_tokens with the
    ratio published on an exact ppm grid (``total_chars·10⁶ //
    total_tokens`` — integer division, no float rule). Golden: the
    independent per-doc loop trainer+encoder."""
    from crawler_ray.functions import bpe

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text", "n_chars"])

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        h = _murmur64(b["doc_id"].to_numpy(np.int64).view(np.uint64)
                      ^ np.uint64(BPE_SAMPLE_SEED))
        return b.loc[(h % np.uint64(4)) == 0, ["text"]]

    merges = bpe.train_bpe_ds(ds.map_batches(sample, batch_format="pandas"),
                              n_merges)

    def partial(b: pd.DataFrame, ms=tuple(merges)) -> pd.DataFrame:
        enc = bpe.encode_batch(b, list(ms))
        s = pd.DataFrame({"lang": b["lang"].astype(object),
                          "nc": b["n_chars"].to_numpy(np.int64),
                          "nt": enc["toks"].str.len().to_numpy(np.int64)})
        return s.groupby("lang", as_index=False).agg(
            n_docs=("nt", "size"), total_chars=("nc", "sum"),
            total_tokens=("nt", "sum"))

    out = _fold(ds.map_batches(partial, batch_format="pandas"),
                ["lang"], dict(n_docs=("n_docs", "sum"),
                               total_chars=("total_chars", "sum"),
                               total_tokens=("total_tokens", "sum")))
    out["chars_per_token_ppm"] = (out["total_chars"] * 10**6) // out["total_tokens"]
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def uniform_k_sample(sf_dir: str, k: int = 200, seed: int = 33):
    """Exact global ``ORDER BY hash LIMIT k`` — a deterministic uniform
    k-sample of the corpus — WITHOUT a global sort exchange: each block
    emits only its k smallest (h, doc_id) rows (vectorized lexsort
    head), the driver folds O(blocks·k) candidate rows and keeps the
    global bottom k. At a 10^10-doc corpus the sort a naive
    ``ds.sort(h).limit(k)`` plans is an all-to-all over every row; this
    shape moves blocks × k rows total and is reproducible on any cluster
    size because the hash (murmur64, DuckDB ``hash()``-compatible) is a
    pure row function. The same combiner backs k-means seeding
    (functions/cluster.py)."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        h = (_murmur64(ids.view(np.uint64) ^ np.uint64(seed))
             % np.uint64(2**31)).astype(np.int64)
        o = np.lexsort((ids, h))[:k]
        return pd.DataFrame({"doc_id": ids[o], "h": h[o]})

    cand = (ds.map_batches(block_topk, batch_format="pandas")
            .to_pandas().sort_values(["h", "doc_id"]).head(k))
    out = cand.sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["h"] = out["h"].astype(np.int64)
    return out


def _layout_cache_root(prefix: str, sf_dir: str, *tables: str) -> str:
    """Deterministic /tmp root for a derived layout, keyed by the SOURCE
    CONTENT fingerprint (path + size + mtime_ns of each source parquet),
    not the path alone — a regenerated fixture at the same path gets a
    fresh root instead of silently reusing a stale clustered copy."""
    import tempfile

    from crawler_ray.hashing import xxh64

    sig = os.path.abspath(sf_dir)
    for t in tables:
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        sig += f"|{t}:{st.st_size}:{st.st_mtime_ns}"
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{xxh64(sig):016x}")


VALIDATE_LANGS = ("de", "en", "es", "fr")   # allowlist rule (zh violates
#                                             by design — a rule with real
#                                             hits, not an all-zeros audit)
VALIDATE_CHARS = (64, 512)                   # n_chars range rule


def validate_documents(sf_dir: str):
    """Write-time constraint validation (the Delta `CHECK` / data-contract
    audit a corpus runs before publishing a snapshot): five rules over the
    documents table — text non-empty, n_chars == LENGTH(text) consistency,
    lang allowlist, n_chars range, doc_id uniqueness — each reported as
    (rule, n_violations, first_bad_doc). Rules 1-4 are pure row predicates:
    one vectorized zero-shuffle combiner pass (per-block counts + min
    violating id, driver folds O(blocks·rules) rows). Uniqueness is the
    one rule that genuinely needs a key exchange; it reuses the unbounded-
    key sort-fold (`_sorted_fold`), so only duplicate-key rows — result-
    scale — ever reach the driver."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    lo, hi = VALIDATE_CHARS

    def row_rules(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        text = b["text"]
        # SQL three-valued logic: a NULL operand makes a comparison
        # UNKNOWN → not counted (except the explicit IS NULL rule), so
        # every mask below is ANDed with notna to match the oracle
        t_ok = text.notna().to_numpy()
        l_ok = b["lang"].notna().to_numpy()
        tlen = text.fillna("").str.len().to_numpy(np.int64)
        bad = {
            "not_null_text": ~t_ok | (tlen == 0),
            "len_consistent": t_ok & (tlen != b["n_chars"].to_numpy(np.int64)),
            "lang_allowlist": l_ok & ~b["lang"].isin(VALIDATE_LANGS).to_numpy(),
            "chars_in_range": ((b["n_chars"].to_numpy(np.int64) < lo)
                               | (b["n_chars"].to_numpy(np.int64) > hi)),
        }
        rows = []
        for rule, m in bad.items():
            rows.append((rule, int(m.sum()),
                         int(ids[m].min()) if m.any() else np.iinfo(np.int64).max))
        return pd.DataFrame(rows, columns=["rule", "n_violations", "first_bad"])

    part = (ds.map_batches(row_rules, batch_format="pandas").to_pandas()
            .groupby("rule", as_index=False)
            .agg(n_violations=("n_violations", "sum"), first_bad=("first_bad", "min")))

    def dup_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("doc_id", as_index=False).agg(cnt=("doc_id", "size"))

    def dup_fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("doc_id", as_index=False).agg(cnt=("cnt", "sum"))

    dups = _sorted_fold(_read(sf_dir, "documents", ["doc_id"])
                        .map_batches(dup_partial, batch_format="pandas"),
                        ["doc_id"], dup_fold)
    dups = dups.loc[dups["cnt"] > 1]
    part = pd.concat([part, pd.DataFrame({
        "rule": ["unique_doc_id"],
        "n_violations": [int(dups["cnt"].sum() - len(dups))],
        "first_bad": [int(dups["doc_id"].min()) if len(dups)
                      else np.iinfo(np.int64).max]})], ignore_index=True)
    part["first_bad_doc"] = np.where(part["n_violations"] > 0,
                                     part["first_bad"], -1).astype(np.int64)
    part["n_violations"] = part["n_violations"].astype(np.int64)
    return (part[["rule", "n_violations", "first_bad_doc"]]
            .sort_values("rule").reset_index(drop=True))


def store_upsert(sf_dir: str, n_frags: int = 10):
    """Merge-on-read upsert (lance_layout.merge_insert — the Lance
    `merge_insert` / Delta MERGE shape): the documents corpus seeded as a
    fragmented store receives an update wave (every doc_id % 37 == 0
    rewritten + 5 brand-new docs). Matched rows are hidden by
    per-fragment DELETION-VECTOR sidecars (one Ray task per fragment,
    reading only its key column; the update key set broadcasts once via
    ray.put — the wave-vs-10^10-row-store shape), update rows append as
    new fragments, one manifest version publishes both atomically.
    A follow-up compaction folds the deletes into physical rewrites.
    Every invariant (content equality vs a driver-simulated upsert,
    survivor order, dv-free after compaction) is measured on the live
    store and returned in the result row."""
    import shutil
    import tempfile

    import ray.data as rdata

    from crawler_ray.hashing import xxh64
    from crawler_ray.sources import lance_layout as ll

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang", "source"])
    root = os.path.join(tempfile.gettempdir(),
                        f"graft_upsert_{xxh64(os.path.abspath(sf_dir)):016x}")
    shutil.rmtree(root, ignore_errors=True)
    rows_each = -(-docs.num_rows // n_frags)
    frags: list[dict] = []
    for i in range(n_frags):
        t = docs.slice(i * rows_each, rows_each)
        if t.num_rows:
            frags += ll.write_table_fragment(t, root, "store", f"w{i:02d}")
    ll.write_manifest(root, 1, {"tables": {"store": frags}})

    base = docs.to_pandas()
    upd_ids = base.loc[base["doc_id"] % 37 == 0, "doc_id"].to_numpy(np.int64)
    new_ids = np.arange(base["doc_id"].max() + 1,
                        base["doc_id"].max() + 6, dtype=np.int64)
    all_ids = np.r_[upd_ids, new_ids]
    updates = pd.DataFrame({
        "doc_id": all_ids,
        "text": [f"updated {v}" for v in all_ids],
        "lang": "en", "source": "upsert"})
    s = ll.merge_insert(root, "store", rdata.from_pandas(updates), "doc_id")

    got = ll.read_fragments(root, "store",
                            ll.latest_manifest(root)["tables"]["store"]).to_pandas()
    exp = pd.concat([base[~base["doc_id"].isin(set(all_ids.tolist()))], updates],
                    ignore_index=True)
    content_ok = (got["doc_id"].tolist() == exp["doc_id"].tolist()
                  and got["text"].tolist() == exp["text"].tolist())

    c = ll.compact_table(root, "store", target_rows=3 * rows_each)
    m = ll.latest_manifest(root)
    dv_free = all("dv" not in f for f in m["tables"]["store"])
    after = ll.read_fragments(root, "store", m["tables"]["store"]).to_pandas()
    still_ok = after["text"].tolist() == exp["text"].tolist()
    return pd.DataFrame({
        "n_docs": [np.int64(len(base))],
        "n_deleted": [np.int64(s["n_deleted"])],
        "n_added": [np.int64(s["n_added"])],
        "n_updated_fragments": [np.int64(s["n_updated_fragments"])],
        "logical_rows": [np.int64(len(got))],
        "content_ok": [np.int64(content_ok)],
        "compact_rewrites": [np.int64(c["n_rewritten"])],
        "dv_free_after_compact": [np.int64(dv_free)],
        "content_ok_after_compact": [np.int64(still_ok)],
    })


def bucketed_join(sf_dir: str, n_buckets: int = 16):
    """Large⋈large join over a CO-PARTITIONED bucketed layout (the Spark
    bucketed-table / Iceberg bucket-transform trick): orders and lineitem
    are each written once into n_buckets aligned fragments keyed by
    ``murmur64(orderkey) % n_buckets`` (bucket id is a pure row function —
    one keyed exchange per table at write time, reused by EVERY subsequent
    join on that key), then the join runs as one independent task per
    bucket pair — pandas hash join on co-located files, ZERO shuffle at
    query time. Same result as ``orders_lineitem_join``, which pays the
    two-sided exchange on every execution; at 100 TB the bucketed layout
    turns the recurring all-to-all into a one-time write cost."""
    import shutil

    from crawler_ray.sources import lance_layout as ll

    root = _layout_cache_root("graft_bucketed", sf_dir, "orders", "lineitem")
    specs = {"orders": ("o_orderkey", ["o_orderkey", "o_orderpriority"]),
             "lineitem": ("l_orderkey",
                          ["l_orderkey", "l_extendedprice", "l_discount"])}
    if ll.latest_manifest(root) is None:
        shutil.rmtree(root, ignore_errors=True)
        tables: dict[str, list] = {}
        for table, (key, cols) in specs.items():
            def add_bucket(b: pd.DataFrame, key=key) -> pd.DataFrame:
                h = _murmur64(b[key].to_numpy(np.int64).view(np.uint64))
                return b.assign(bucket=(h % np.uint64(n_buckets)).astype(np.int64))

            def write_bucket(g: pd.DataFrame, table=table) -> pd.DataFrame:
                bkt = int(g["bucket"].iloc[0])
                t = (pa.Table.from_pandas(g.drop(columns=["bucket"]),
                                          preserve_index=False)
                     .replace_schema_metadata(None))
                meta = ll.FragmentWriter(root, table, f"b{bkt:03d}")(t)
                return pd.DataFrame({"bucket": [np.int64(bkt)],
                                     "fragment": [meta["fragment"][0].as_py()],
                                     "rows": [np.int64(len(g))]})

            stats = (_read(sf_dir, table, cols)
                     .map_batches(add_bucket, batch_format="pandas")
                     .groupby("bucket")
                     .map_groups(write_bucket, batch_format="pandas")
                     .to_pandas())
            tables[table] = [{"fragment": r.fragment, "rows": int(r.rows),
                              "bucket": int(r.bucket)}
                             for r in stats.sort_values("bucket").itertuples()]
        ll.write_manifest(root, 1, {"tables": tables,
                                    "bucketing": {"key": "orderkey",
                                                  "n_buckets": n_buckets}})
    m = ll.latest_manifest(root)
    by_bucket: dict[int, dict[str, str]] = {}
    for table in specs:
        for f in m["tables"][table]:
            by_bucket.setdefault(int(f["bucket"]), {})[table] = f["fragment"]
    items = [{"bucket": b,
              "orders": side.get("orders", ""),
              "lineitem": side.get("lineitem", "")}
             for b, side in sorted(by_bucket.items())]

    def join_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for r in batch.itertuples():
            if not r.orders or not r.lineitem:
                continue  # bucket empty on one side -> inner join drops it
            o = pq.read_table(os.path.join(root, "orders", r.orders)).to_pandas()
            li = pq.read_table(os.path.join(root, "lineitem", r.lineitem)).to_pandas()
            j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey",
                         how="inner")
            rev = j["l_extendedprice"] * (1 - j["l_discount"])
            outs.append(pd.DataFrame({"o_orderpriority": j["o_orderpriority"],
                                      "revenue": rev})
                        .groupby("o_orderpriority", as_index=False)
                        .agg(n_items=("revenue", "size"),
                             total_revenue=("revenue", "sum")))
        if not outs:
            return pd.DataFrame({"o_orderpriority": pd.Series([], dtype=object),
                                 "n_items": pd.Series([], dtype=np.int64),
                                 "total_revenue": pd.Series([], dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    parts = (rd.from_items(items, override_num_blocks=len(items))
             .map_batches(join_bucket, batch_format="pandas").to_pandas())
    out = parts.groupby("o_orderpriority", as_index=False).agg(
        n_items=("n_items", "sum"), total_revenue=("total_revenue", "sum"))
    out["n_items"] = out["n_items"].astype(np.int64)
    out["total_revenue"] = out["total_revenue"].round(4)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def store_schema_evolution(sf_dir: str, n_frags: int = 10):
    """Schema evolution (lance_layout.add_column — the Lance/Delta
    ``ALTER TABLE ADD COLUMN`` shape): a METADATA-ONLY commit adds a
    ``quality`` column with a backfill default (no fragment is read or
    rewritten — O(1) at any store size; a physical backfill of a
    10^10-row store is a full rewrite), an upsert wave then writes real
    values, and a compaction materializes the default into rewritten
    fragments. Measured invariants: zero fragment files touched by the
    add (inode+mtime_ns set identity), backfill-on-read correctness,
    time-travel cleanliness (v1 has no column), and zero physical nulls
    after the compaction fold."""
    import shutil
    import tempfile

    import ray.data as rdata

    from crawler_ray.hashing import xxh64
    from crawler_ray.sources import lance_layout as ll

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    root = os.path.join(tempfile.gettempdir(),
                        f"graft_evolve_{xxh64(os.path.abspath(sf_dir)):016x}")
    shutil.rmtree(root, ignore_errors=True)
    rows_each = -(-docs.num_rows // n_frags)
    frags: list[dict] = []
    for i in range(n_frags):
        t = docs.slice(i * rows_each, rows_each)
        if t.num_rows:
            frags += ll.write_table_fragment(t, root, "store", f"w{i:02d}")
    ll.write_manifest(root, 1, {"tables": {"store": frags}})
    tdir = os.path.join(root, "store")

    def file_states():
        return {(f, os.stat(os.path.join(tdir, f)).st_ino,
                 os.stat(os.path.join(tdir, f)).st_mtime_ns)
                for f in os.listdir(tdir) if f.endswith(".parquet")}

    before_files = file_states()
    ll.add_column(root, "store", "quality", "int64", default=0)
    metadata_only = file_states() == before_files

    base = docs.to_pandas()
    ids = base["doc_id"].to_numpy(np.int64)
    upd_ids = ids[ids % 29 == 0]
    updates = pd.DataFrame({"doc_id": upd_ids,
                            "text": [f"v2 {v}" for v in upd_ids],
                            "quality": (upd_ids % 10).astype(np.int64)})
    ll.merge_insert(root, "store", rdata.from_pandas(updates), "doc_id")

    got = ll.read_table(root, "store").to_pandas()
    old = got[~got["doc_id"].isin(set(upd_ids.tolist()))]
    new = got[got["doc_id"].isin(set(upd_ids.tolist()))].sort_values("doc_id")
    backfill_ok = (old["quality"] == 0).all()
    new_ok = new["quality"].tolist() == (np.sort(upd_ids) % 10).tolist()
    tt_clean = "quality" not in ll.read_table(root, "store", version=1).column_names

    ll.compact_table(root, "store", target_rows=3 * rows_each)
    m = ll.latest_manifest(root)
    raw = ll.read_fragments(root, "store", m["tables"]["store"])
    return pd.DataFrame({
        "n_docs": [np.int64(len(base))],
        "n_upserted": [np.int64(len(upd_ids))],
        "metadata_only_add": [np.int64(metadata_only)],
        "backfill_ok": [np.int64(bool(backfill_ok))],
        "new_rows_ok": [np.int64(bool(new_ok))],
        "time_travel_clean": [np.int64(tt_clean)],
        "nulls_after_compact": [np.int64(raw["quality"].null_count)],
        "rows_after_compact": [np.int64(raw.num_rows)],
    })


def store_change_feed(sf_dir: str, n_frags: int = 10):
    """Change data feed (lance_layout.changes_between — the Delta CDF
    shape): seed the documents corpus as a fragmented store (v1), apply
    two upsert waves (v2: every doc_id % 41 == 0 rewritten; v3: every
    doc_id % 83 == 0 rewritten + 3 brand-new docs), then diff v1→v3. The
    feed reads ONLY affected fragments — one task each — emitting full-
    preimage delete rows (deletion-vector growth) and insert rows (new
    fragments, their current dv applied, so a row upserted in BOTH waves
    appears once as the v3 version). This is how a downstream index syncs
    incrementally instead of rescanning a 10^10-row store."""
    import shutil
    import tempfile

    import ray.data as rdata

    from crawler_ray.hashing import xxh64
    from crawler_ray.sources import lance_layout as ll

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    root = os.path.join(tempfile.gettempdir(),
                        f"graft_cdf_{xxh64(os.path.abspath(sf_dir)):016x}")
    shutil.rmtree(root, ignore_errors=True)
    rows_each = -(-docs.num_rows // n_frags)
    frags: list[dict] = []
    for i in range(n_frags):
        t = docs.slice(i * rows_each, rows_each)
        if t.num_rows:
            frags += ll.write_table_fragment(t, root, "store", f"w{i:02d}")
    ll.write_manifest(root, 1, {"tables": {"store": frags}})

    base = docs.to_pandas()
    ids = base["doc_id"].to_numpy(np.int64)

    def wave(mod: int, extra: int, tag: str):
        w = ids[ids % mod == 0]
        if extra:
            w = np.r_[w, np.arange(ids.max() + 1, ids.max() + 1 + extra,
                                   dtype=np.int64)]
        return rdata.from_pandas(pd.DataFrame(
            {"doc_id": w, "text": [f"{tag} {v}" for v in w]}))

    ll.merge_insert(root, "store", wave(41, 0, "v2"), "doc_id", prefix="u2")
    ll.merge_insert(root, "store", wave(83, 3, "v3"), "doc_id", prefix="u3")
    feed = ll.changes_between(root, "store", 1, 3).to_pandas()
    feed["doc_id"] = feed["doc_id"].astype(np.int64)
    return (feed[["op", "doc_id", "text"]]
            .sort_values(["op", "doc_id", "text"]).reset_index(drop=True))


def zorder_bbox_scan(sf_dir: str):
    """J5's box predicate answered from a Z-ORDER CLUSTERED layout
    (functions/zorder.py — the Delta/Iceberg ``OPTIMIZE ZORDER BY``
    trick): lineitem is re-clustered once into Z-prefix fragments of the
    (l_quantity, l_discount) plane with min/max stats in the manifest,
    then the scan PRUNES by stats (driver-side metadata only) and pushes
    the exact predicate into the Arrow read of just the surviving
    fragments. Same rows as ``bbox_filter``; at 100 TB the difference is
    that a 1-D-sorted or unclustered layout reads every fragment for a
    2-D box while this reads only the intersecting Z-cells (the unit
    asserts >half the fragments are skipped)."""
    import shutil

    from crawler_ray.functions import zorder
    from crawler_ray.sources import lance_layout as ll

    root = _layout_cache_root("graft_zorder", sf_dir, "lineitem")
    if ll.latest_manifest(root) is None:
        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_quantity", "l_discount"])
        zorder.write_zorder_layout(ds, root, "lineitem",
                                   "l_quantity", "l_discount",
                                   x_range=(1.0, 50.0), y_range=(0.0, 0.1))
    out, _, _ = zorder.bbox_scan(root, "lineitem", "l_quantity", "l_discount",
                                 10.0, 20.0, 0.02, 0.06,
                                 columns=["l_orderkey", "l_partkey",
                                          "l_quantity", "l_discount"])
    return out


def store_compaction(sf_dir: str, n_frags: int = 10, bin_frags: int = 3):
    """Store maintenance pass (the Lance `compact_files` +
    `cleanup_old_versions` pair, sources/lance_layout.py): a fragmented
    store table — here 10 contiguous slices of the documents corpus, the
    shape a crawl wave's per-politeness-bucket writer leaves behind — is
    coalesced by DISTRIBUTED contiguous-bin rewrites (one Ray task per
    bin, no shuffle, logical row order preserved so readers never
    notice), re-run to prove idempotence (content-derived fragment names
    → zero rewrites), then vacuumed (old manifest versions dropped, the
    superseded fragment files swept). Every invariant is measured on the
    live store and returned as the result row, so the golden check fails
    if compaction ever disturbs a byte."""
    import shutil
    import tempfile

    from crawler_ray.hashing import xxh64
    from crawler_ray.sources import lance_layout as ll

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang", "source"])
    root = os.path.join(tempfile.gettempdir(),
                        f"graft_compact_{xxh64(os.path.abspath(sf_dir)):016x}")
    shutil.rmtree(root, ignore_errors=True)
    rows_each = -(-docs.num_rows // n_frags)  # ceil
    frags: list[dict] = []
    for i in range(n_frags):
        t = docs.slice(i * rows_each, rows_each)
        if t.num_rows:
            frags += ll.write_table_fragment(t, root, "store", f"w{i:02d}")
    ll.write_manifest(root, 1, {"tables": {"store": frags}})
    expect = ll.read_fragments(root, "store", frags)

    s1 = ll.compact_table(root, "store", target_rows=bin_frags * rows_each)
    after = ll.read_fragments(root, "store",
                              ll.latest_manifest(root)["tables"]["store"])
    s2 = ll.compact_table(root, "store", target_rows=bin_frags * rows_each)
    vac = ll.vacuum_versions(root, ["store"], keep_latest=1)
    after_vac = ll.read_fragments(root, "store",
                                  ll.latest_manifest(root)["tables"]["store"])
    return pd.DataFrame({
        "n_docs": [np.int64(docs.num_rows)],
        "n_frags_before": [np.int64(s1["n_before"])],
        "n_frags_after": [np.int64(s1["n_after"])],
        "n_rewritten": [np.int64(s1["n_rewritten"])],
        "bit_identical": [np.int64(after.equals(expect))],
        "second_pass_rewrites": [np.int64(s2["n_rewritten"])],
        "versions_dropped": [np.int64(vac["versions_dropped"])],
        "files_removed": [np.int64(vac["files_removed"])],
        "readable_after_vacuum": [np.int64(after_vac.equals(expect))],
    })


def lag_event_delta(sf_dir: str):
    """LAG window NAVIGATION as a distributed scan
    (scan.grouped_lag_ds — one sort exchange, O(blocks) driver carry): per
    user ordered by (ts, event_id), each event's value delta vs the user's
    previous event. Rows with no predecessor are dropped on both sides
    (SQL ``WHERE prev IS NOT NULL``), so no NULL crosses the compare; each
    delta is ONE float64 subtraction of two stored values — there is no
    accumulation order, so engine and DuckDB agree bitwise."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    lagged = scan.grouped_lag_ds(ds, "user_id", ["ts", "event_id"], "value")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        m = b.loc[b["prev_value"].notna(),
                  ["event_id", "user_id", "value", "prev_value"]]
        return m.assign(delta=m["value"].to_numpy(np.float64)
                        - m["prev_value"].to_numpy(np.float64))

    out = lagged.map_batches(finish, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def latest_event_per_user(sf_dir: str):
    """CDC "latest record per key" dedup (the compaction rule every
    change-stream table applies): one user-keyed exchange co-locates each
    user's events whole, so the per-block vectorized sort + last + count
    is globally exact by co-location — no window function, no global
    sort, and nothing event-scale on the driver beyond the O(users)
    result the contract returns anyway. Ties on ts break by event_id
    (total order) on both sides."""
    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])

    def latest(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "user_id" not in b.columns:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "last_ts": pd.Series([], dtype="datetime64[us]"),
                "last_event_type": pd.Series([], dtype="string"),
                "last_value": pd.Series([], dtype=np.float64),
                "n_events": pd.Series([], dtype=np.int64)})
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = b.groupby("user_id", as_index=False)
        last = g.last()
        return pd.DataFrame({
            "user_id": last["user_id"].astype(np.int64),
            "last_ts": last["ts"],
            "last_event_type": last["event_type"].astype("string"),
            "last_value": last["value"].astype(np.float64),
            "n_events": g.size()["size"].astype(np.int64)})

    dk = (_keyed(ds).repartition(_W(), keys=["user_id"])
          .map_batches(latest, batch_format="pandas", batch_size=None)
          .materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    out = dk.to_pandas()
    out["last_event_type"] = out["last_event_type"].astype(object)
    return out.sort_values("user_id").reset_index(drop=True)


_FUNNEL_STEPS = ("view", "click", "purchase")


def event_funnel(sf_dir: str):
    """Ordered FUNNEL conversion (the product-analytics classic): how many
    users perform view → click → purchase IN ORDER, each step strictly
    after the user's first qualifying event of the previous step. One
    user-keyed exchange co-locates each user's events whole (the read is
    pruned to funnel event types at the Arrow scan), the per-block kernel
    walks the step chain with three vectorized groupby-min passes —
    globally exact by co-location — and the driver sums O(blocks) stage
    partials, publishing conversion on an exact ppm grid (integer
    division). Timestamps compare as integer epoch-µs on both sides."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"],
               filter=pc.field("event_type").isin(list(_FUNNEL_STEPS)))

    def stages(b: pd.DataFrame) -> pd.DataFrame:
        names = [f"n_stage{i + 1}" for i in range(len(_FUNNEL_STEPS))]
        if len(b) == 0 or "user_id" not in b.columns:
            return pd.DataFrame({n: pd.Series([], dtype=np.int64)
                                 for n in names})
        f = pd.DataFrame({"u": b["user_id"].to_numpy(np.int64),
                          "e": b["event_type"].astype(object),
                          "t": b["ts"].astype("int64").to_numpy()})
        reach = None   # user -> epoch-µs of reaching the previous stage
        counts = []
        for step in _FUNNEL_STEPS:
            s = f.loc[f["e"] == step, ["u", "t"]]
            if reach is not None:
                prev = s["u"].map(reach)
                s = s.loc[prev.notna() & (s["t"] > prev)]
            reach = s.groupby("u")["t"].min()
            counts.append(len(reach))
        return pd.DataFrame({n: [np.int64(c)]
                             for n, c in zip(names, counts)})

    dk = (_keyed(ds).repartition(_W(), keys=["user_id"])
          .map_batches(stages, batch_format="pandas", batch_size=None)
          .materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    tot = dk.to_pandas().sum()
    out = pd.DataFrame({k: [np.int64(tot[k])]
                        for k in ("n_stage1", "n_stage2", "n_stage3")})
    n1 = int(out["n_stage1"].iloc[0])
    out["conv_ppm"] = np.int64(
        int(out["n_stage3"].iloc[0]) * 10**6 // n1 if n1 else 0)
    return out


_WEEK_US = 7 * 86400 * 10**6


def user_retention_cohorts(sf_dir: str):
    """Classic COHORT RETENTION matrix (the activation/retention analytics
    every event warehouse serves): cohort = the epoch-week of a user's
    FIRST event, and cell (cohort_week, week_offset) counts the DISTINCT
    users of that cohort active in that week. ONE user-keyed exchange
    co-locates each user's events whole, so the per-block kernel derives
    each user's cohort (min week) and distinct active weeks locally —
    globally exact by co-location — and emits matrix partials; the driver
    folds O(weeks²) cells. Weeks are integer ``epoch_µs // week_µs`` so
    no calendar/timezone rule can split engine and oracle."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "user_id" not in b.columns:
            return pd.DataFrame({
                "cohort_week": pd.Series([], dtype=np.int64),
                "week_offset": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64)})
        w = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "wk": b["ts"].astype("int64").to_numpy() // _WEEK_US,
        }).drop_duplicates()
        w["cohort_week"] = w.groupby("user_id")["wk"].transform("min")
        w["week_offset"] = w["wk"] - w["cohort_week"]
        return (w.groupby(["cohort_week", "week_offset"], as_index=False)
                .size().rename(columns={"size": "n_users"}))

    dk = (_keyed(ds).repartition(_W(), keys=["user_id"])
          .map_batches(cells, batch_format="pandas", batch_size=None)
          .materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    out = (dk.to_pandas()
           .groupby(["cohort_week", "week_offset"], as_index=False)["n_users"]
           .sum())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))


def event_transition_matrix(sf_dir: str):
    """Per-stream Markov TRANSITION MATRIX — the bigram model of an event
    stream (session-flow analytics; the event-level analogue of the text
    bigram LM): within each user's (ts, event_id) order, count every
    (prev_event_type → event_type) transition across the corpus. The
    predecessor comes from the distributed LAG kernel's OBJECT path
    (scan.grouped_lag_ds — one sort exchange, O(blocks) seam carry), so
    no per-user state exists anywhere; the rollup is a combiner + fold
    over the O(types²) matrix. First-in-stream rows (no predecessor) are
    excluded on both sides."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    lagged = scan.grouped_lag_ds(ds, "user_id", ["ts", "event_id"],
                                 "event_type", out_col="prev_type")

    def partial(b: pd.DataFrame) -> pa.Table:
        m = b.loc[b["prev_type"].notna(), ["prev_type", "event_type"]]
        g = (m.astype(object).groupby(["prev_type", "event_type"])
             .size().reset_index(name="n"))
        return pa.table({"prev_type": pa.array(g["prev_type"].tolist(), pa.string()),
                         "event_type": pa.array(g["event_type"].tolist(), pa.string()),
                         "n": pa.array(g["n"].tolist(), pa.int64())})

    out = _fold(lagged.map_batches(partial, batch_format="pandas"),
                ["prev_type", "event_type"], dict(n=("n", "sum")))
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["prev_type", "event_type"])
            .reset_index(drop=True))


def dense_rank_top_prices(sf_dir: str):
    """DENSE_RANK top-3-with-ties per group WITHOUT a global sort: the
    per-batch combiner keeps each priority's 3 largest DISTINCT total
    prices (a mergeable partial top-k over distinct values), the driver
    folds O(batches × groups × 3) rows into the rank→price table, and the
    rank attach is a broadcast vectorized merge filter — the orders table
    never shuffles. Price values pass through untouched (no arithmetic),
    so float compare is exact."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = (b.drop_duplicates(["o_orderpriority", "o_totalprice"])
             .sort_values(["o_orderpriority", "o_totalprice"],
                          ascending=[True, False], kind="mergesort"))
        return u.groupby("o_orderpriority", as_index=False).head(3)[
            ["o_orderpriority", "o_totalprice"]]

    tops = (ds.map_batches(partial, batch_format="pandas").to_pandas()
            .drop_duplicates()
            .sort_values(["o_orderpriority", "o_totalprice"],
                         ascending=[True, False], kind="mergesort")
            .groupby("o_orderpriority", as_index=False).head(3))
    tops = tops.assign(dr=(tops.groupby("o_orderpriority").cumcount() + 1)
                       .astype(np.int64))

    def attach(b: pd.DataFrame, t=tops) -> pa.Table:
        m = b.merge(t, on=["o_orderpriority", "o_totalprice"], how="inner")
        # Arrow output: most batches match 0 of the 15 rank rows, and Ray's
        # pandas size estimator probes empty object columns noisily
        return pa.table({
            "o_orderkey": pa.array(m["o_orderkey"].tolist(), pa.int64()),
            "o_orderpriority": pa.array(m["o_orderpriority"].tolist(), pa.string()),
            "o_totalprice": pa.array(m["o_totalprice"].tolist(), pa.float64()),
            "dr": pa.array(m["dr"].tolist(), pa.int64())})

    out = ds.map_batches(attach, batch_format="pandas").to_pandas()
    return (out[["o_orderkey", "o_orderpriority", "o_totalprice", "dr"]]
            .sort_values(["o_orderpriority", "dr", "o_orderkey"])
            .reset_index(drop=True))


SEMDECON_SCALE = 1000        # FLOOR quantization grid for the vectors
SEMDECON_T2 = (81, 400)      # τ² = 0.2025 (τ = 0.45) as an exact rational


def semantic_decontaminate(sf_dir: str):
    """Embedding-space benchmark decontamination — the SEMANTIC companion
    of the n-gram ``benchmark_decontaminate`` (catches paraphrased eval
    leakage that n-gram overlap misses): the eval set is the
    deterministic ``vec_id % 17 == 0`` slice (standing in for a separate
    small eval table, which is why the driver reads it directly),
    broadcast ONCE as a quantized int64 matrix — the genuinely small
    side; every corpus batch computes one int64 GEMM against it and
    counts rows whose cosine clears τ = 0.45 as contaminated.

    EXACT ON ANY LAYOUT (the CLAUDE.md float-GEMM rule — never threshold
    a float matmul): raw float32 components widen to float64 and
    FLOOR-quantize to the 1/SEMDECON_SCALE grid on BOTH sides, and the
    cosine test is the integer cross comparison ``400·dot² ≥ 81·|a|²·|b|²
    AND dot > 0`` (τ² = 81/400 exact); with dim 64 every intermediate
    fits int64 (dot ≤ 64·10⁶ ⇒ 400·dot² ≤ 1.7·10¹⁸). Zero shuffle; the
    per-label rollup is a combiner + driver fold."""
    ev = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    E = np.stack([
        np.floor(np.asarray(v, np.float64) * SEMDECON_SCALE).astype(np.int64)
        for v, k in zip(ev["embedding"].to_pylist(), ev["vec_id"].to_pylist())
        if k % 17 == 0])
    en = np.einsum("ij,ij->i", E, E)
    ref = ray.put((E, en))

    class Gate:
        def __init__(self):
            self.E, self.en = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b.loc[(b["vec_id"].to_numpy(np.int64) % 17) != 0]
            if len(b) == 0:
                return pd.DataFrame({
                    "label": pd.Series([], dtype=np.int64),
                    "n_docs": pd.Series([], dtype=np.int64),
                    "n_contaminated": pd.Series([], dtype=np.int64)})
            Q = np.stack([
                np.floor(np.asarray(v, np.float64) * SEMDECON_SCALE)
                .astype(np.int64) for v in b["embedding"]])
            nn = np.einsum("ij,ij->i", Q, Q)
            D = Q @ self.E.T
            num, den = SEMDECON_T2
            hit = ((D > 0)
                   & (den * D * D >= num * nn[:, None] * self.en[None, :])
                   ).any(axis=1)
            s = pd.DataFrame({"label": b["label"].to_numpy(np.int64),
                              "c": hit.astype(np.int64)})
            return s.groupby("label", as_index=False).agg(
                n_docs=("c", "size"), n_contaminated=("c", "sum"))

    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    out = _fold(ds.map_batches(Gate, batch_format="pandas",
                               concurrency=(1, 4)),
                ["label"], dict(n_docs=("n_docs", "sum"),
                                n_contaminated=("n_contaminated", "sum")))
    out["n_kept"] = out["n_docs"] - out["n_contaminated"]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("label").reset_index(drop=True)


def pivot_status_month(sf_dir: str):
    """PIVOT (long→wide reshape): orders counted per order month with one
    int64 column per order status, executed as ONE combiner pass — each
    batch shrinks to O(months) rows with the status columns already
    pivoted — plus a driver fold of the partials. The wide schema is fixed
    by the known status domain, so no schema-discovery scan precedes the
    data pass; equivalent SQL is the CASE aggregation DuckDB compiles
    PIVOT into."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.DataFrame({
            "month": b["o_orderdate"].dt.strftime("%Y-%m"),
            "n_open": (b["o_orderstatus"] == "O").to_numpy(np.int64),
            "n_done": (b["o_orderstatus"] == "F").to_numpy(np.int64),
            "n_pending": (b["o_orderstatus"] == "P").to_numpy(np.int64)})
        return s.groupby("month", as_index=False).sum()

    out = _fold(ds.map_batches(partial, batch_format="pandas"), ["month"],
                dict(n_open=("n_open", "sum"), n_done=("n_done", "sum"),
                     n_pending=("n_pending", "sum")))
    for c in ("n_open", "n_done", "n_pending"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("month").reset_index(drop=True)


def cube_lang_source(sf_dir: str):
    """GROUP BY CUBE(lang, source) in ONE data pass: like
    ``rollup_lang_source`` the combiner shrinks each batch to the FINEST
    grouping set only, and all FOUR cube levels (fine, by-lang, by-source,
    grand total) derive from the folded finest frame — exact for
    counts/sums — so the exchange moves O(finest groups) rows instead of
    the one-fact-replica-per-grouping-set a naive CUBE plan scans."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    fine = _fold(ds.map_batches(partial, batch_format="pandas"),
                 ["lang", "source"],
                 dict(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")))
    by_lang = fine.groupby("lang", as_index=False)[["n_docs", "total_chars"]].sum()
    by_lang["source"] = "ALL"
    by_source = fine.groupby("source", as_index=False)[["n_docs", "total_chars"]].sum()
    by_source["lang"] = "ALL"
    total = pd.DataFrame({"lang": ["ALL"], "source": ["ALL"],
                          "n_docs": [fine["n_docs"].sum()],
                          "total_chars": [fine["total_chars"].sum()]})
    out = pd.concat([fine, by_lang, by_source, total], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    return (out[["lang", "source", "n_docs", "total_chars"]]
            .sort_values(["lang", "source"]).reset_index(drop=True))


def set_ops_custkeys(sf_dir: str):
    """INTERSECT / EXCEPT as distributed set algebra: the DISTINCT customer
    sets behind open ('O') and finished ('F') orders compared in ONE
    custkey-keyed exchange — each batch first shrinks to per-batch
    (custkey, saw_open, saw_done) flag partials (an OR-combiner), the
    exchange co-locates every key's partials, and each block folds to
    per-key flags and counts the three set-algebra cells LOCALLY, so the
    driver sums O(blocks) one-row partials; no key set is ever collected
    or broadcast on either side. Kernels emit typed empties (empty hash
    partitions arrive schema-less — see CLAUDE.md)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"],
               filter=pc.field("o_orderstatus").isin(["O", "F"]))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "saw_open": (b["o_orderstatus"] == "O").to_numpy(np.int64),
            "saw_done": (b["o_orderstatus"] == "F").to_numpy(np.int64)})
        return s.groupby("o_custkey", as_index=False).max()

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "o_custkey" not in b.columns:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("n_both", "n_only_open", "n_only_done")})
        f = b.groupby("o_custkey").max()
        o = f["saw_open"].to_numpy(np.int64)
        d = f["saw_done"].to_numpy(np.int64)
        return pd.DataFrame({"n_both": [np.int64((o & d).sum())],
                             "n_only_open": [np.int64((o & (1 - d)).sum())],
                             "n_only_done": [np.int64((d & (1 - o)).sum())]})

    dk = (_keyed(ds.map_batches(partial, batch_format="pandas"))
          .repartition(_W(), keys=["o_custkey"])
          .map_batches(cells, batch_format="pandas", batch_size=None)
          .materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    tot = dk.to_pandas().sum()
    return pd.DataFrame({k: [np.int64(tot[k])]
                         for k in ("n_both", "n_only_open", "n_only_done")})


def grouped_median_exact(sf_dir: str):
    """EXACT per-group median (``percentile_disc(0.5)``) by DISTRIBUTED
    RANK SELECTION — no per-group value state on the driver and no global
    collect: group sizes come from one combiner pass (O(groups) numbers on
    the driver), every row's in-group rank comes from the partitioned
    analytic scan (scan.grouped_cumulative_sum_ds — O(blocks) driver
    carry), and the median is the row whose inclusive rank equals
    ceil(n/2), filtered distributed. The result is an exact ELEMENT of the
    input (no interpolation arithmetic), so engine and DuckDB agree
    bit-for-bit with no float rounding rule."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    ranked = scan.grouped_cumulative_sum_ds(
        ds.map_batches(lambda b: b.assign(one=np.ones(len(b), np.int64)),
                       batch_format="pandas"),
        "event_type", ["value", "event_id"], "one", out_col="rnk")

    nn = _fold(ds.map_batches(
        lambda b: (b.groupby("event_type", as_index=False).size()
                   .rename(columns={"size": "n"})), batch_format="pandas"),
        ["event_type"], dict(n=("n", "sum")))
    target = {et: (int(n) + 1) // 2 for et, n in zip(nn["event_type"], nn["n"])}

    def pick(b: pd.DataFrame, t=target) -> pa.Table:
        want = b["event_type"].map(t).to_numpy(np.int64)
        m = b.loc[b["rnk"].to_numpy(np.int64) == want, ["event_type", "value"]]
        # Arrow output: most blocks emit 0 rows after the rank filter, and
        # Ray's pandas size estimator probes empty object columns noisily
        return pa.table({"event_type": pa.array(m["event_type"].tolist(), pa.string()),
                         "median_value": pa.array(m["value"].tolist(), pa.float64())})

    med = ranked.map_batches(pick, batch_format="pandas").to_pandas()
    out = nn.merge(med, on="event_type")
    out["n"] = out["n"].astype(np.int64)
    return (out[["event_type", "n", "median_value"]]
            .sort_values("event_type").reset_index(drop=True))


def grouped_mode(sf_dir: str):
    """Exact per-group MODE with a total-order tie rule (count desc, then
    lexicographically smallest value — the deterministic counterpart of
    SQL's underspecified ``mode()``): one combiner pass shrinks each batch
    to (status, priority) counts, the driver folds O(statuses × priorities)
    partials and applies the tie rule; equivalent SQL is the ROW_NUMBER
    window over the grouped counts."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["o_orderstatus", "o_orderpriority"], as_index=False)
                .size().rename(columns={"size": "c"}))

    f = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["o_orderstatus", "o_orderpriority"], dict(c=("c", "sum")))
    f = f.sort_values(["o_orderstatus", "c", "o_orderpriority"],
                      ascending=[True, False, True], kind="mergesort")
    best = f.groupby("o_orderstatus", as_index=False).first()
    out = best.rename(columns={"o_orderpriority": "mode_priority", "c": "n_mode"})
    out["n_mode"] = out["n_mode"].astype(np.int64)
    return (out[["o_orderstatus", "mode_priority", "n_mode"]]
            .sort_values("o_orderstatus").reset_index(drop=True))


QUERIES = {
    "audio_clip_features": audio_clip_features,
    "video_frame_sample": video_frame_sample,
    "audio_near_dups": audio_near_dups,
    "video_near_dups": video_near_dups,
    "q1_pricing_summary": q1_pricing_summary,
    "heatmap_grid": heatmap_grid,
    "domain_top10": domain_top10,
    "crawl_stats": crawl_stats,
    "bbox_filter": bbox_filter,
    "nearby_radius": nearby_radius,
    "similar_parts": similar_parts,
    "region_rollup": region_rollup,
    "orders_join": orders_join,
    "orders_lineitem_join": orders_lineitem_join,
    "union_streams": union_streams,
    "asof_join_quotes": asof_join_quotes,
    "events_in_windows": events_in_windows,
    "seeded_sample": seeded_sample,
    "topk_orders": topk_orders,
    "pagination": pagination,
    "priority_distribution": priority_distribution,
    "dedup_first": dedup_first,
    "exact_dedup_docs": exact_dedup_docs,
    "events_window": events_window,
    "events_sliding_window": events_sliding_window,
    "sessionize": sessionize,
    "event_quantiles": event_quantiles,
    "top_orders_per_segment": top_orders_per_segment,
    "distinct_langs": distinct_langs,
    "token_stats": token_stats,
    "text_quality": text_quality,
    "lang_id_confusion": lang_id_confusion,
    "top_tokens": top_tokens,
    "approx_distinct_tokens": approx_distinct_tokens,
    "doc_fingerprints": doc_fingerprints,
    "doc_repetition": doc_repetition,
    "pii_scan": pii_scan,
    "pii_redact": pii_redact,
    "running_revenue": running_revenue,
    "customer_running_spend": customer_running_spend,
    "trailing_event_volume": trailing_event_volume,
    "sessionize_events": sessionize_events,
    "quality_percentile_cut": quality_percentile_cut,
    "lm_fluency_score": lm_fluency_score,
    "dsir_select": dsir_select,
    "gopher_quality_gate": gopher_quality_gate,
    "tfidf_top_terms": tfidf_top_terms,
    "perplexity_buckets": perplexity_buckets,
    "temperature_mix_sample": temperature_mix_sample,
    "stratified_sample": stratified_sample,
    "token_shard_assignment": token_shard_assignment,
    "rollup_lang_source": rollup_lang_source,
    "histogram_quantiles": histogram_quantiles,
    "customers_without_orders": customers_without_orders,
    "bm25_search": bm25_search,
    "benchmark_decontaminate": benchmark_decontaminate,
    "dup_span_coverage": dup_span_coverage,
    "pagerank_users": pagerank_users,
    "triangle_count": triangle_count,
    "late_event_stats": late_event_stats,
    "ngram_novelty": ngram_novelty,
    "doc_chunk_stats": doc_chunk_stats,
    "kmeans_embeddings": kmeans_embeddings,
    "semantic_dedup": semantic_dedup,
    "bpe_top_pairs": bpe_top_pairs,
    "corpus_build": corpus_build,
    "corpus_build_neardup": lambda sf_dir: corpus_build(sf_dir, near_dedup=True),
    "minhash_near_dups": minhash_near_dups,
    "ngram_jaccard_dups": ngram_jaccard_dups,
    "simhash_near_dups": simhash_near_dups,
    "near_dup_clusters": near_dup_clusters,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_pq_rerank_topk": ann_pq_rerank_topk,
    "embedding_near_dups": embedding_near_dups,
    "embedding_norm_stats": embedding_norm_stats,
    "bloom_semi_join": bloom_semi_join,
    "skew_join_brand_revenue": skew_join_brand_revenue,
    "cms_heavy_bigrams": cms_heavy_bigrams,
    "bpe_tokenize": bpe_tokenize,
    "embedding_covariance": embedding_covariance,
    "embedding_pca": embedding_pca,
    "per_source_cap": per_source_cap,
    "uniform_k_sample": uniform_k_sample,
    "store_compaction": store_compaction,
    "store_upsert": store_upsert,
    "zorder_bbox_scan": zorder_bbox_scan,
    "validate_documents": validate_documents,
    "store_change_feed": store_change_feed,
    "store_schema_evolution": store_schema_evolution,
    "bucketed_join": bucketed_join,
    "pivot_status_month": pivot_status_month,
    "cube_lang_source": cube_lang_source,
    "set_ops_custkeys": set_ops_custkeys,
    "grouped_median_exact": grouped_median_exact,
    "grouped_mode": grouped_mode,
    "lag_event_delta": lag_event_delta,
    "latest_event_per_user": latest_event_per_user,
    "dense_rank_top_prices": dense_rank_top_prices,
    "semantic_decontaminate": semantic_decontaminate,
    "bpe_compression_ratio": bpe_compression_ratio,
    "event_transition_matrix": event_transition_matrix,
    "user_retention_cohorts": user_retention_cohorts,
    "event_funnel": event_funnel,
}

ORACLE_SQL = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order,
               ROUND(SUM(l_quantity) / COUNT(*), 2) AS avg_qty,
               ROUND(SUM(l_extendedprice) / COUNT(*), 2) AS avg_price,
               ROUND(SUM(l_discount) / COUNT(*), 4) AS avg_disc
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""",
    "heatmap_grid": """
        SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qbin,
               CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS pbin,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1, 2
        ORDER BY cnt DESC, qbin, pbin LIMIT 10000""",
    "domain_top10": """
        SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents
        GROUP BY source ORDER BY cnt DESC, source LIMIT 10""",
    "crawl_stats": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS done_rate
        FROM orders""",
    "bbox_filter": """
        SELECT l_orderkey, l_partkey, l_quantity, l_discount FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND l_discount BETWEEN 0.02 AND 0.06""",
    "nearby_radius": """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events
        WHERE SQRT(POWER(value - 50.0, 2) + POWER(user_id % 10, 2)) <= 6.0
        GROUP BY event_type""",
    "similar_parts": """
        SELECT a.p_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM part a JOIN part b
          ON a.p_type = b.p_type AND b.p_partkey > a.p_partkey
         AND ABS(a.p_retailprice - b.p_retailprice) <= 10.0
        GROUP BY a.p_type""",
    "region_rollup": """
        SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name""",
    "orders_join": """
        SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""",
    "orders_lineitem_join": """
        SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority""",
    "union_streams": """
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders WHERE o_orderstatus IN ('O', 'F')
        GROUP BY o_orderstatus""",
    "asof_join_quotes": """
        WITH r AS (
          SELECT o_custkey % 150 AS k,
                 TIMESTAMP '2024-01-01'
                   + ((o_orderkey * 9973) % 2592000) * INTERVAL 1 SECOND AS rts,
                 MAX(ROUND(o_totalprice, 2)) AS price
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id,
               COALESCE(ROUND(r.price, 2), -1.0) AS asof_price
        FROM events e ASOF LEFT JOIN r ON e.user_id = r.k AND e.ts >= r.rts""",
    "events_in_windows": """
        WITH w AS (
          SELECT o_orderkey,
                 TIMESTAMP '2024-01-01'
                   + ((o_orderkey * 9973) % 2592000) * INTERVAL 1 SECOND AS ws,
                 TIMESTAMP '2024-01-01'
                   + ((o_orderkey * 9973) % 2592000) * INTERVAL 1 SECOND
                   + ((o_orderkey * 31) % 240 + 1) * INTERVAL 1 MINUTE AS we
          FROM orders WHERE o_orderkey % 97 = 0)
        SELECT w.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(e.value), 2) AS sum_value
        FROM w JOIN events e ON e.ts BETWEEN w.ws AND w.we
        GROUP BY w.o_orderkey""",
    "topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "pagination": """
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 100 OFFSET 100""",
    "priority_distribution": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders
        GROUP BY o_orderpriority""",
    "dedup_first": """
        SELECT user_id, CAST(MIN(event_id) AS BIGINT) AS first_event_id,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id""",
    "exact_dedup_docs": """
        SELECT CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
               CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM documents GROUP BY text""",
    "events_window": """
        SELECT user_id, CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS win,
               CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2""",
    "events_sliding_window": """
        WITH e AS (SELECT value, CAST(FLOOR(EPOCH(ts) / 1800) AS BIGINT) AS h FROM events),
             x AS (SELECT value, h AS win FROM e UNION ALL SELECT value, h - 1 AS win FROM e)
        SELECT win, CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM x GROUP BY win""",
    "sessionize": """
        SELECT user_id, CAST(1 + SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM (SELECT user_id,
                     EPOCH(ts) - LAG(EPOCH(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM events)
        GROUP BY user_id""",
    "sessionize_events": """
        WITH b AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT user_id,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM b),
        p AS (SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM s GROUP BY 1, 2)
        SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(MAX(n) AS BIGINT) AS max_session_events
        FROM p GROUP BY user_id ORDER BY user_id""",
    "quality_percentile_cut": """
        WITH s AS (
            SELECT doc_id, lang, n_chars,
                   CASE WHEN n_chars = 0 THEN 0 ELSE
                        LEAST(n_chars * 5000, 1000000)
                        * (1000000 - (1000000 * length(regexp_replace(text, '[^0-9]', '', 'g'))) // n_chars) // 1000000
                        * GREATEST(1000000 - 2 * ((1000000 * length(regexp_replace(text, '[^.,!?;:]', '', 'g'))) // n_chars), 0) // 1000000
                   END AS score_ppm
            FROM documents),
        r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS rn,
                        COUNT(*) OVER () AS n
              FROM s)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM r WHERE rn <= (n * 100000 + 999999) // 1000000
        GROUP BY lang ORDER BY lang""",
    "lm_fluency_score": """
        WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
                   FROM documents),
        tr AS (SELECT * FROM d WHERE doc_id % 97 = 0),
        v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vn
              FROM (SELECT unnest(ts) AS tok FROM tr)),
        tg AS (SELECT ts[i] AS w1, ts[i+1] AS w2
               FROM tr, UNNEST(range(1, len(ts))) AS t(i)),
        c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM tg GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
               FROM c12 GROUP BY w1),
        sg AS (SELECT doc_id, lang, ts[i] AS w1, ts[i+1] AS w2
               FROM d, UNNEST(range(1, len(ts))) AS t(i)
               WHERE doc_id % 97 <> 0),
        p AS (SELECT doc_id, lang,
                     (1000000 * (COALESCE(c12.c12, 0) + 1))
                     // (COALESCE(c1.c1, 0) + (SELECT vn FROM v)) AS p_ppm
              FROM sg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)),
        s AS (SELECT doc_id, lang,
                     CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS score
              FROM p GROUP BY doc_id, lang)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(score) AS BIGINT) AS sum_score_ppm,
               CAST(MIN(score) AS BIGINT) AS min_score_ppm,
               CAST(MAX(score) AS BIGINT) AS max_score_ppm
        FROM s GROUP BY lang ORDER BY lang""",
    "perplexity_buckets": """
        WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
                   FROM documents),
        tr AS (SELECT * FROM d WHERE doc_id % 97 = 0),
        v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vn
              FROM (SELECT unnest(ts) AS tok FROM tr)),
        tg AS (SELECT ts[i] AS w1, ts[i+1] AS w2
               FROM tr, UNNEST(range(1, len(ts))) AS t(i)),
        c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM tg GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
               FROM c12 GROUP BY w1),
        sg AS (SELECT doc_id, lang, ts[i] AS w1, ts[i+1] AS w2
               FROM d, UNNEST(range(1, len(ts))) AS t(i)
               WHERE doc_id % 97 <> 0),
        p AS (SELECT doc_id, lang,
                     (1000000 * (COALESCE(c12.c12, 0) + 1))
                     // (COALESCE(c1.c1, 0) + (SELECT vn FROM v)) AS p_ppm
              FROM sg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)),
        s AS (SELECT doc_id, lang,
                     CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS score
              FROM p GROUP BY doc_id, lang),
        b AS (SELECT lang, score, NTILE(3) OVER (
                  PARTITION BY lang ORDER BY score DESC, doc_id) AS bucket
              FROM s)
        SELECT lang, CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(score) AS BIGINT) AS sum_score_ppm,
               CAST(MIN(score) AS BIGINT) AS min_score_ppm,
               CAST(MAX(score) AS BIGINT) AS max_score_ppm
        FROM b GROUP BY lang, bucket ORDER BY lang, bucket""",
    "dsir_select": """
        WITH d AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ts
                   FROM documents),
        tg AS (SELECT ts[i] AS w1, ts[i+1] AS w2
               FROM d, UNNEST(range(1, len(ts))) AS t(i)
               WHERE source = 'src0'),
        rg AS (SELECT ts[i] AS w1, ts[i+1] AS w2
               FROM d, UNNEST(range(1, len(ts))) AS t(i)
               WHERE source <> 'src0' AND doc_id % 13 = 0),
        ct AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS ct
               FROM tg GROUP BY w1, w2),
        cr AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cr
               FROM rg GROUP BY w1, w2),
        sg AS (SELECT doc_id, lang, ts[i] AS w1, ts[i+1] AS w2
               FROM d, UNNEST(range(1, len(ts))) AS t(i)
               WHERE source <> 'src0'),
        p AS (SELECT doc_id, lang,
                     (1000000 * (COALESCE(ct.ct, 0) + 1))
                     // (COALESCE(cr.cr, 0) + 1) AS r
              FROM sg LEFT JOIN ct USING (w1, w2) LEFT JOIN cr USING (w1, w2)),
        s AS (SELECT doc_id, lang,
                     CAST(SUM(r) // COUNT(*) AS BIGINT) AS w
              FROM p GROUP BY doc_id, lang)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN w > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_selected,
               CAST(SUM(w) AS BIGINT) AS sum_w_ppm,
               CAST(MAX(w) AS BIGINT) AS max_w_ppm
        FROM s GROUP BY lang ORDER BY lang""",
    "gopher_quality_gate": """
        WITH d AS (SELECT lang, text, string_split(text, ' ') AS ts
                   FROM documents),
        m AS (SELECT lang, len(ts) AS n, len(text) - len(ts) + 1 AS sum_len,
              len(list_filter(ts, x -> regexp_matches(x, '[a-zA-Z]')))
                  AS n_alpha,
              len(list_filter(ts, x -> contains(x, '#')
                                       OR contains(x, '...'))) AS n_sym,
              len(list_distinct(list_filter(ts,
                  x -> x IN ('the','a','of','to','and','in','is','on'))))
                  AS n_stop
              FROM d),
        f AS (SELECT lang,
              CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS f_words,
              CASE WHEN (1000000 * sum_len) // n < 3000000
                     OR (1000000 * sum_len) // n > 10000000
                   THEN 1 ELSE 0 END AS f_wordlen,
              CASE WHEN (1000000 * n_sym) // n > 100000
                   THEN 1 ELSE 0 END AS f_symbol,
              CASE WHEN (1000000 * n_alpha) // n < 800000
                   THEN 1 ELSE 0 END AS f_alpha,
              CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stop
              FROM m)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN f_words + f_wordlen + f_symbol + f_alpha
                                  + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pass,
               CAST(SUM(f_words) AS BIGINT) AS n_fail_words,
               CAST(SUM(f_wordlen) AS BIGINT) AS n_fail_wordlen,
               CAST(SUM(f_symbol) AS BIGINT) AS n_fail_symbol,
               CAST(SUM(f_alpha) AS BIGINT) AS n_fail_alpha,
               CAST(SUM(f_stop) AS BIGINT) AS n_fail_stop
        FROM f GROUP BY lang ORDER BY lang""",
    "temperature_mix_sample": """
        WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY lang),
        m AS (SELECT MIN(n_docs) AS mn FROM c),
        r AS (SELECT lang, n_docs,
                     (1000000 * CAST(FLOOR(SQRT(CAST((SELECT mn FROM m) AS DOUBLE))) AS BIGINT))
                     // CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)
                         AS rate_ppm
              FROM c),
        k AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
              FROM documents d JOIN r USING (lang)
              WHERE hash(CAST(d.doc_id AS BIGINT)) % 1000000 < r.rate_ppm
              GROUP BY d.lang)
        SELECT r.lang, r.n_docs, CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        FROM r LEFT JOIN k USING (lang) ORDER BY lang""",
    "tfidf_top_terms": """
        WITH tok AS (
          SELECT doc_id, lang,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
          FROM documents),
        tf AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS tf,
                      CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
               FROM tok GROUP BY lang, term),
        nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
        s AS (SELECT t.lang, t.term, t.tf, t.df,
                     t.tf * ((1000000 * nl.n_docs) // t.df) AS score_ppm
              FROM tf t JOIN nl USING (lang)),
        r AS (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY lang ORDER BY score_ppm DESC, term) AS rk
              FROM s)
        SELECT lang, term, tf, df, CAST(score_ppm AS BIGINT) AS score_ppm
        FROM r WHERE rk <= 10 ORDER BY lang, score_ppm DESC, term""",
    "distinct_langs": "SELECT DISTINCT lang FROM documents",
    "seeded_sample": """
        SELECT o_orderkey FROM orders
        WHERE hash(xor(CAST(o_orderkey AS BIGINT), CAST(42 AS BIGINT))) % 10 = 0""",
    "top_tokens": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
              FROM documents)
        GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",
    "event_quantiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type""",
    "top_orders_per_segment": """
        SELECT c_mktsegment, CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
        FROM (SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (PARTITION BY c.c_mktsegment
                                        ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        WHERE rn <= 3""",
    "token_stats": """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT) AS total_tokens,
               ROUND(SUM(LEN(regexp_extract_all(text, '[A-Za-z0-9_]+'))) * 1.0 / COUNT(*), 2) AS avg_tokens
        FROM documents GROUP BY lang""",
    "text_quality": """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(SUM(n_chars) * 1.0 / COUNT(*), 2) AS avg_chars,
               ROUND(SUM(LEN(regexp_extract_all(text, '[.,!?;:]')) * 1.0 / n_chars) / COUNT(*), 4) AS avg_punct_ratio
        FROM documents GROUP BY lang""",
    "doc_repetition": """
        WITH per_tok AS (
          SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents)
          GROUP BY doc_id, tok
        ), stats AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 1.0 - COUNT(*) * 1.0 / SUM(c) AS dup_raw,
                 MAX(c) * 1.0 / SUM(c) AS top_raw
          FROM per_tok GROUP BY doc_id
        )
        SELECT doc_id, n_tokens,
               CAST(FLOOR(dup_raw * 1e6) AS BIGINT) AS dup_ppm,
               CAST(FLOOR(top_raw * 1e6) AS BIGINT) AS top_ppm,
               CAST(dup_raw > 0.75 OR top_raw > 0.2 AS BIGINT) AS flagged
        FROM stats
        WHERE dup_raw > 0.75 OR top_raw > 0.2 OR dup_raw >= 0.65""",
    "pii_scan": f"""
        WITH f AS ({_PII_FIXTURE_SQL}
        ), c AS (
          SELECT
            len(regexp_extract_all(ft, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) AS email,
            len(regexp_extract_all(ft, '\\d{{2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}')) AS phone,
            len(regexp_extract_all(ft, '\\d{{3}}-\\d{{2}}-\\d{{4}}')) AS ssn,
            len(regexp_extract_all(ft, '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}')) AS ipv4
          FROM f)
        SELECT pii_type, n_docs, n_hits FROM (
          SELECT 'email' AS pii_type,
                 CAST(COUNT(*) FILTER (WHERE email > 0) AS BIGINT) AS n_docs,
                 CAST(COALESCE(SUM(email), 0) AS BIGINT) AS n_hits FROM c
          UNION ALL SELECT 'phone',
                 CAST(COUNT(*) FILTER (WHERE phone > 0) AS BIGINT),
                 CAST(COALESCE(SUM(phone), 0) AS BIGINT) FROM c
          UNION ALL SELECT 'ssn',
                 CAST(COUNT(*) FILTER (WHERE ssn > 0) AS BIGINT),
                 CAST(COALESCE(SUM(ssn), 0) AS BIGINT) FROM c
          UNION ALL SELECT 'ipv4',
                 CAST(COUNT(*) FILTER (WHERE ipv4 > 0) AS BIGINT),
                 CAST(COALESCE(SUM(ipv4), 0) AS BIGINT) FROM c)
        ORDER BY pii_type""",
    "pii_redact": f"""
        WITH f AS ({_PII_FIXTURE_SQL}
        ), c AS (
          SELECT doc_id, ft,
            len(regexp_extract_all(ft, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}'))
            + len(regexp_extract_all(ft, '\\d{{2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}'))
            + len(regexp_extract_all(ft, '\\d{{3}}-\\d{{2}}-\\d{{4}}'))
            + len(regexp_extract_all(ft, '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}')) AS n_pii
          FROM f)
        SELECT doc_id, CAST(n_pii AS BIGINT) AS n_pii,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(ft,
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '[EMAIL]', 'g'),
                     '\\d{{2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}', '[PHONE]', 'g'),
                   '\\d{{3}}-\\d{{2}}-\\d{{4}}', '[SSN]', 'g'),
                 '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}', '[IP]', 'g') AS red_text
        FROM c WHERE n_pii > 0 ORDER BY doc_id""",
    "running_revenue": """
        SELECT o_orderkey, o_orderdate,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    OVER (ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_cents
        FROM orders""",
    "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE hash(xor(CAST(doc_id AS BIGINT), CAST(42 AS BIGINT))) % 100 <
              CASE lang WHEN 'en' THEN 10 WHEN 'es' THEN 20 WHEN 'de' THEN 30
                        WHEN 'fr' THEN 40 WHEN 'zh' THEN 50 ELSE 0 END""",
    "trailing_event_volume": """
        SELECT event_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    OVER (ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS trailing_cents,
               CAST(COUNT(*)
                    OVER (ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS n_window
        FROM events""",
    "customer_running_spend": """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_cents
        FROM orders""",
    "token_shard_assignment": """
        WITH toks AS (
          SELECT doc_id,
                 LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens
          FROM documents
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(CAST(SUM(n_tokens) OVER
                      (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) // 4096 AS BIGINT) AS shard_id
        FROM toks""",
    "rollup_lang_source": """
        SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY ROLLUP(lang, source) ORDER BY 1, 2""",
    "histogram_quantiles": """
        WITH b AS (SELECT event_type, CAST(FLOOR(value / 2.0e0) AS BIGINT) AS bin,
                          COUNT(*) AS c FROM events GROUP BY 1, 2),
        cum AS (SELECT event_type, bin,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cc,
                       SUM(c) OVER (PARTITION BY event_type) AS n FROM b)
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN cc >= (n*50 + 99)//100 THEN (bin+1)*2.0e0 END) AS p50_est,
               MIN(CASE WHEN cc >= (n*95 + 99)//100 THEN (bin+1)*2.0e0 END) AS p95_est,
               MIN(CASE WHEN cc >= (n*99 + 99)//100 THEN (bin+1)*2.0e0 END) AS p99_est
        FROM cum GROUP BY event_type ORDER BY event_type""",
    "customers_without_orders": """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "doc_chunk_stats": """
        WITH m AS (SELECT lang,
                          len(string_split(text, ' ')) AS n
                   FROM documents),
        c AS (SELECT lang, n,
                     1 + (GREATEST(n - 64, 0) + 47) // 48 AS chunks
              FROM m),
        e AS (SELECT lang, n, chunks,
                     CASE WHEN chunks = 1 THEN n
                          ELSE (chunks - 1) * 64 + (n - (chunks - 1) * 48)
                     END AS emitted
              FROM c)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(SUM(chunks) AS BIGINT) AS n_chunks,
               CAST(SUM(emitted) AS BIGINT) AS n_emitted,
               CAST((1000000 * (SUM(emitted) - SUM(n))) // SUM(n) AS BIGINT)
                   AS overhead_ppm
        FROM e GROUP BY lang ORDER BY lang""",
    "ngram_novelty": """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
                   FROM documents),
        g AS (SELECT DISTINCT doc_id % 10 AS shard,
                     array_to_string(ts[i:i+4], ' ') AS gram
              FROM d, UNNEST(range(1, len(ts) - 3)) AS t(i)
              WHERE len(ts) >= 5),
        f AS (SELECT gram, MIN(shard) AS first_shard FROM g GROUP BY gram)
        SELECT g.shard, CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN f.first_shard = g.shard
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               CAST((1000000 * SUM(CASE WHEN f.first_shard = g.shard
                                        THEN 1 ELSE 0 END)) // COUNT(*)
                    AS BIGINT) AS novelty_ppm
        FROM g JOIN f USING (gram)
        GROUP BY g.shard ORDER BY g.shard""",
    "benchmark_decontaminate": """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS gram
              FROM d, UNNEST(range(1, len(ts) - 3)) AS t(i)
              WHERE len(ts) >= 5),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM g JOIN bench USING (gram)
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id ORDER BY g.doc_id""",
    "corpus_build": """
        WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS ts
                      FROM documents),
        corpus AS (SELECT * FROM base
                   WHERE doc_id % 97 <> 0 AND len(ts) >= 20),
        per_tok AS (
          SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, UNNEST(ts) AS tok FROM corpus)
          GROUP BY doc_id, tok),
        rep AS (
          SELECT doc_id FROM per_tok GROUP BY doc_id
          HAVING NOT (1.0 - COUNT(*) * 1.0 / SUM(c) > 0.75
                      OR MAX(c) * 1.0 / SUM(c) > 0.2)),
        passed AS (SELECT c.* FROM corpus c JOIN rep USING (doc_id)),
        dedup AS (
          SELECT * FROM passed
          QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
        bench_grams AS (
          SELECT DISTINCT array_to_string(ts[i:i+4], ' ') AS gram
          FROM base, UNNEST(range(1, len(ts) - 3)) AS t(i)
          WHERE doc_id % 97 = 0 AND len(ts) >= 5),
        clean AS (
          SELECT d.* FROM dedup d WHERE NOT EXISTS (
            SELECT 1 FROM UNNEST(range(1, len(d.ts) - 3)) AS t(i)
            JOIN bench_grams b ON array_to_string(d.ts[i:i+4], ' ') = b.gram)),
        packed AS (
          SELECT doc_id, len(ts) AS n_tokens,
                 COALESCE(SUM(len(ts)) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS tok_before
          FROM clean)
        SELECT CAST(tok_before // 4096 AS BIGINT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM packed GROUP BY shard_id ORDER BY shard_id""",
    "bpe_top_pairs": """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (SELECT ts[i] || ' ' || ts[i+1] AS pair
              FROM d, UNNEST(range(1, len(ts))) AS t(i)
              WHERE len(ts) >= 2)
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT 20""",
    "dup_span_coverage": """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (SELECT doc_id, i AS pos, array_to_string(ts[i:i+7], ' ') AS gram,
                     len(ts) AS n_tokens
              FROM d, UNNEST(range(1, len(ts) - 6)) AS t(i)
              WHERE len(ts) >= 8),
        dup AS (SELECT gram FROM g GROUP BY gram
                HAVING COUNT(DISTINCT doc_id) >= 2),
        hits AS (SELECT doc_id, pos, n_tokens FROM g JOIN dup USING (gram)),
        marks AS (SELECT doc_id, pos, n_tokens,
                         CASE WHEN pos > lag(pos, 1, -8) OVER
                                   (PARTITION BY doc_id ORDER BY pos) + 7
                              THEN 1 ELSE 0 END AS new_island
                  FROM hits),
        isl AS (SELECT doc_id, pos, n_tokens,
                       SUM(new_island) OVER
                           (PARTITION BY doc_id ORDER BY pos) AS island
                FROM marks),
        spans AS (SELECT doc_id, ANY_VALUE(n_tokens) AS n_tokens, island,
                         MIN(pos) AS s, MAX(pos) + 7 AS e
                  FROM isl GROUP BY doc_id, island)
        SELECT doc_id, CAST(ANY_VALUE(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(e - s + 1) AS BIGINT) AS covered_tokens,
               CAST((SUM(e - s + 1) * 1000000) // ANY_VALUE(n_tokens) AS BIGINT)
                   AS coverage_ppm
        FROM spans GROUP BY doc_id ORDER BY doc_id""",
    "ngram_jaccard_dups": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents
        ), grams AS (
          SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
          FROM toks, UNNEST(range(1, len(ts) - 1)) AS t(i)
          WHERE len(ts) >= 3
        ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5""",
    "embedding_near_dups": """
        WITH s AS (
          SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
                 list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])) AS c
          FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id)
        SELECT vid_a, vid_b, ROUND(c, 6) AS sim FROM s WHERE c >= 0.45""",
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
             t AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS tv FROM embeddings WHERE vec_id >= 5),
             s AS (SELECT qid, vid, list_cosine_similarity(qv, tv) AS sim FROM q CROSS JOIN t),
             r AS (SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn FROM s)
        SELECT qid, vid FROM r WHERE rn <= 10""",
    "embedding_norm_stats": """
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(SQRT(CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS DOUBLE))) / COUNT(*), 4) AS avg_norm
        FROM embeddings GROUP BY label""",
    "pivot_status_month": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        FROM orders GROUP BY 1 ORDER BY month""",
    "cube_lang_source": """
        SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY CUBE(lang, source) ORDER BY 1, 2""",
    "set_ops_custkeys": """
        WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        SELECT CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT) AS n_both,
               CAST((SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS BIGINT) AS n_only_open,
               CAST((SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS BIGINT) AS n_only_done""",
    "grouped_median_exact": """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS median_value
        FROM events GROUP BY event_type ORDER BY event_type""",
    "grouped_mode": """
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_mode,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
          FROM orders GROUP BY o_orderstatus, o_orderpriority)
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n_mode
        FROM c WHERE rn = 1 ORDER BY o_orderstatus""",
    "lag_event_delta": """
        WITH l AS (
          SELECT event_id, user_id, value,
                 LAG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_value
          FROM events)
        SELECT event_id, user_id, value, prev_value,
               value - prev_value AS delta
        FROM l WHERE prev_value IS NOT NULL ORDER BY event_id""",
    "latest_event_per_user": """
        WITH r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_events
          FROM events)
        SELECT user_id, ts AS last_ts, event_type AS last_event_type,
               value AS last_value, CAST(n_events AS BIGINT) AS n_events
        FROM r WHERE rn = 1 ORDER BY user_id""",
    "dense_rank_top_prices": """
        WITH d AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC) AS dr
          FROM orders)
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(dr AS BIGINT) AS dr
        FROM d WHERE dr <= 3 ORDER BY o_orderpriority, dr, o_orderkey""",
    "semantic_decontaminate": """
        WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                          list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qe
                   FROM embeddings),
             n AS (SELECT vec_id, label, qe,
                          CAST(list_dot_product(qe, qe) AS BIGINT) AS nn
                   FROM q),
             ev AS (SELECT qe, nn FROM n WHERE vec_id % 17 = 0),
             co AS (SELECT vec_id, label, qe, nn FROM n WHERE vec_id % 17 <> 0),
             s AS (SELECT co.vec_id, co.label,
                          MAX(CASE WHEN CAST(list_dot_product(co.qe, ev.qe) AS BIGINT) > 0
                                    AND 400 * CAST(list_dot_product(co.qe, ev.qe) AS BIGINT)
                                            * CAST(list_dot_product(co.qe, ev.qe) AS BIGINT)
                                        >= 81 * co.nn * ev.nn
                                   THEN 1 ELSE 0 END) AS c
                   FROM co CROSS JOIN ev GROUP BY 1, 2)
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(c) AS BIGINT) AS n_contaminated,
               CAST(COUNT(*) - SUM(c) AS BIGINT) AS n_kept
        FROM s GROUP BY label ORDER BY label""",
    "event_transition_matrix": """
        WITH l AS (
          SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM l WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "user_retention_cohorts": """
        WITH w AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 604800000000 AS wk FROM events),
             c AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY 1)
        SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
               CAST(w.wk - c.cohort AS BIGINT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM w JOIN c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "event_funnel": """
        WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
             s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
                    FROM events e JOIN s1 USING (user_id)
                    WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
                    GROUP BY 1),
             s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
                    FROM events e JOIN s2 USING (user_id)
                    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
                    GROUP BY 1)
        SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_stage1,
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_stage2,
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_stage3,
               CAST((SELECT COUNT(*) FROM s3) * 1000000
                    // (SELECT COUNT(*) FROM s1) AS BIGINT) AS conv_ppm""",
}


def _bm25_oracle() -> str:
    """Unrolled BM25 oracle: one contribution expression per query term, in
    ``_BM25_TERMS`` order, so the SQL executes the identical left-to-right
    float accumulation as the engine's fixed-order term loop. All float
    literals use exponent form (0.5e0) — a bare 0.5 is DECIMAL in DuckDB and
    decimal arithmetic would diverge from the engine's float64 ops."""
    dfs = ",\n               ".join(
        f"SUM(CASE WHEN list_contains(ts, '{t}') THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS)
    contribs = "\n             + ".join(
        f"LN(1.0e0 + (st.n - st.df_{t} + 0.5e0) / (st.df_{t} + 0.5e0))"
        f" * (length(list_filter(ts, x -> x = '{t}')) * (1.2e0 + 1.0e0))"
        f" / (length(list_filter(ts, x -> x = '{t}'))"
        f" + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * (len(ts) / st.avgdl)))"
        for t in _BM25_TERMS)
    return f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        st AS (SELECT COUNT(*) AS n, SUM(len(ts)) / COUNT(*) AS avgdl,
               {dfs}
               FROM d),
        sc AS (SELECT doc_id,
               {contribs}
               AS score
               FROM d, st)
        SELECT doc_id, ROUND(score, 4) AS score FROM sc
        WHERE ROUND(score, 4) > 0
        ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 15"""


ORACLE_SQL["bm25_search"] = _bm25_oracle()
ORACLE_SQL["pagerank_users"] = _pagerank_oracle()

ORACLE_SQL["late_event_stats"] = """
    WITH w AS (SELECT event_type, epoch_us(ts) AS t,
                      MAX(epoch_us(ts)) OVER (
                          PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          AS pm
               FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN pm IS NOT NULL AND t < pm
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN pm IS NOT NULL AND t < pm
                                  THEN pm - t END), 0) AS BIGINT)
               AS max_late_us,
           CAST(SUM(CASE WHEN pm IS NOT NULL AND t < pm
                         THEN pm - t ELSE 0 END) AS BIGINT) AS sum_late_us
    FROM w GROUP BY event_type ORDER BY event_type"""

ORACLE_SQL["triangle_count"] = """
    WITH raw AS (SELECT DISTINCT user_id AS u, event_id % 150 AS v
                 FROM events),
    und AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
            FROM raw WHERE u <> v),
    d AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT a AS node FROM und
                UNION ALL SELECT b AS node FROM und)
          GROUP BY node),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d)   AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM d)
               AS n_wedges,
           (SELECT n_tri FROM t) AS n_triangles"""

ORACLE_SQL["bloom_semi_join"] = """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem WHERE l_orderkey IN
      (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag ORDER BY l_returnflag"""

ORACLE_SQL["skew_join_brand_revenue"] = """
    SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p_brand"""

ORACLE_SQL["cms_heavy_bigrams"] = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    g AS (SELECT ts[i] || ' ' || ts[i+1] AS bigram
          FROM d, UNNEST(range(1, len(ts))) AS t(i) WHERE len(ts) >= 2),
    c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY bigram)
    SELECT bigram, cnt FROM c
    WHERE cnt >= CAST(CEIL({CMS_PHI} * (SELECT SUM(cnt) FROM c)) AS BIGINT)
    ORDER BY cnt DESC, bigram"""

ORACLE_SQL["embedding_covariance"] = """
    WITH q AS (SELECT list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qe
               FROM embeddings),
    d AS (SELECT len(qe) AS nd FROM q LIMIT 1),
    ij AS (SELECT a.i AS i, b.j AS j
           FROM (SELECT unnest(range(1, (SELECT nd FROM d) + 1)) AS i) a,
                (SELECT unnest(range(1, (SELECT nd FROM d) + 1)) AS j) b
           WHERE b.j >= a.i),
    t AS (SELECT i, j, qe[i] AS qi, qe[j] AS qj FROM q, ij)
    SELECT i, j,
           CAST((SELECT COUNT(*) FROM q) * SUM(qi * qj)
                - SUM(qi) * SUM(qj) AS BIGINT) AS m2
    FROM t GROUP BY i, j ORDER BY i, j"""

ORACLE_SQL["bucketed_join"] = """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority"""

ORACLE_SQL["validate_documents"] = """
    WITH v AS (
      SELECT 'not_null_text' AS rule,
             COUNT(*) FILTER (WHERE text IS NULL OR LENGTH(text) = 0) AS n_violations,
             MIN(doc_id) FILTER (WHERE text IS NULL OR LENGTH(text) = 0) AS fb
      FROM documents
      UNION ALL
      SELECT 'len_consistent',
             COUNT(*) FILTER (WHERE LENGTH(text) <> n_chars),
             MIN(doc_id) FILTER (WHERE LENGTH(text) <> n_chars)
      FROM documents
      UNION ALL
      SELECT 'lang_allowlist',
             COUNT(*) FILTER (WHERE lang NOT IN ('de','en','es','fr')),
             MIN(doc_id) FILTER (WHERE lang NOT IN ('de','en','es','fr'))
      FROM documents
      UNION ALL
      SELECT 'chars_in_range',
             COUNT(*) FILTER (WHERE n_chars < 64 OR n_chars > 512),
             MIN(doc_id) FILTER (WHERE n_chars < 64 OR n_chars > 512)
      FROM documents
      UNION ALL
      SELECT 'unique_doc_id',
             CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT),
             (SELECT MIN(doc_id) FROM (
                SELECT doc_id FROM documents GROUP BY doc_id HAVING COUNT(*) > 1))
      FROM documents)
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(COALESCE(CASE WHEN n_violations > 0 THEN fb END, -1) AS BIGINT)
               AS first_bad_doc
    FROM v ORDER BY rule"""

ORACLE_SQL["zorder_bbox_scan"] = """
    SELECT l_orderkey, l_partkey, l_quantity, l_discount FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_discount BETWEEN 0.02 AND 0.06"""

ORACLE_SQL["uniform_k_sample"] = """
    WITH h AS (SELECT doc_id,
                      CAST(hash(xor(CAST(doc_id AS BIGINT), CAST(33 AS BIGINT)))
                           % 2147483648 AS BIGINT) AS h
               FROM documents),
    pick AS (SELECT doc_id, h FROM h ORDER BY h, doc_id LIMIT 200)
    SELECT doc_id, h FROM pick ORDER BY doc_id"""

ORACLE_SQL["per_source_cap"] = """
    WITH h AS (SELECT doc_id, source,
                      CAST(hash(xor(CAST(doc_id AS BIGINT), CAST(21 AS BIGINT)))
                           % 2147483648 AS BIGINT) AS hh
               FROM documents),
    r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
          FROM h)
    SELECT source, doc_id FROM r WHERE rn <= 5 ORDER BY source, doc_id"""
