"""Z-order (Morton) clustered layout + min/max fragment pruning.

The "prune at the read" path for multi-dimensional predicates: cluster a
table by the bit-interleaved Morton code of two quantized columns, write
one immutable fragment per Z-prefix bucket with per-fragment min/max
column stats in the manifest, and answer box predicates by reading ONLY
the fragments whose stat ranges intersect the box (exact residual filter
inside). A 1-D sort layout prunes on one column and scatters the other;
the Z-curve keeps both selective — the standard layout trick behind
Delta/Iceberg `OPTIMIZE ZORDER BY` (public algorithm: Morton 1966).

Scale shape: bucket membership is a PURE ROW FUNCTION (quantize +
interleave + shift), so the clustering write is one keyed exchange at any
corpus size, fragments are deterministic under any block layout
(content-digest names — retry/kill-safe like every lance_layout write),
and the scan's pruning decision is O(fragments) manifest metadata on the
driver — row data never moves unless its fragment might match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of v into even bit positions
    (b15..b0 -> bit 30,28,..,0) — the classic magic-number dilation."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two <=16-bit non-negative integer arrays into the
    Morton code (x in even bits, y in odd bits), vectorized."""
    return (_spread16(x) | (_spread16(y) << np.uint64(1))).astype(np.uint64)


def quantize(v: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Map [lo, hi] onto the 2^bits integer grid (clipped; monotone, so
    box predicates on the original values map to box predicates on the
    grid)."""
    cells = (1 << bits) - 1
    g = np.floor((np.asarray(v, np.float64) - lo) / (hi - lo) * cells + 0.5)
    return np.clip(g, 0, cells).astype(np.uint64)


def zorder_bucket(x: np.ndarray, y: np.ndarray,
                  x_range: tuple[float, float], y_range: tuple[float, float],
                  bits: int, bucket_bits: int) -> np.ndarray:
    """Bucket id = the top ``bucket_bits`` of the Morton code of the two
    quantized columns: a pure row function, so clustering co-locates by
    one keyed exchange and re-derives identically on any cluster size."""
    zx = quantize(x, *x_range, bits=bits)
    zy = quantize(y, *y_range, bits=bits)
    z = morton2(zx, zy)
    return (z >> np.uint64(2 * bits - bucket_bits)).astype(np.int64)


def write_zorder_layout(ds, root: str, table: str, x_col: str, y_col: str,
                        x_range: tuple[float, float],
                        y_range: tuple[float, float],
                        bits: int = 8, bucket_bits: int = 5) -> list[dict]:
    """Cluster ``ds`` into 2^bucket_bits Z-prefix fragments under
    ``root/table`` and publish manifest v1 with per-fragment min/max stats
    of both cluster columns. One groupby exchange; each bucket's fragment
    is written by its own task (content-digest name -> idempotent)."""
    from crawler_ray.sources import lance_layout as ll

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(zbucket=zorder_bucket(
            b[x_col].to_numpy(np.float64), b[y_col].to_numpy(np.float64),
            x_range, y_range, bits, bucket_bits))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([x_col, y_col], kind="mergesort").drop(columns=["zbucket"])
        w = ll.FragmentWriter(root, table, "z")
        # drop pandas schema metadata: fragment readers see plain Arrow
        # (and Ray's multi-file schema dedup chokes on the metadata dict)
        t = pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)
        meta = w(t)
        return pd.DataFrame({
            "fragment": [meta["fragment"][0].as_py()],
            "rows": [np.int64(len(g))],
            "min_x": [float(g[x_col].min())], "max_x": [float(g[x_col].max())],
            "min_y": [float(g[y_col].min())], "max_y": [float(g[y_col].max())],
        })

    stats = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("zbucket").map_groups(write_bucket, batch_format="pandas")
             .to_pandas().sort_values("fragment"))
    frags = [{"fragment": r.fragment, "rows": int(r.rows),
              "stats": {"min_x": r.min_x, "max_x": r.max_x,
                        "min_y": r.min_y, "max_y": r.max_y}}
             for r in stats.itertuples()]
    # extend an existing manifest lineage rather than clobbering it: other
    # tables at this root stay listed, the new layout is one more version
    m = ll.latest_manifest(root)
    version = int(m["version"]) + 1 if m else 1
    payload = {k: v for k, v in (m or {}).items()
               if k not in ("version", "compaction")}
    payload["tables"] = dict(payload.get("tables", {}))
    payload["tables"][table] = frags
    ll.write_manifest(root, version, payload)
    return frags


def prune_fragments(frags: list[dict], x0: float, x1: float,
                    y0: float, y1: float) -> list[dict]:
    """Keep only fragments whose min/max box intersects the query box —
    O(fragments) driver-side metadata, no data read."""
    keep = []
    for f in frags:
        s = f["stats"]
        if s["max_x"] >= x0 and s["min_x"] <= x1 \
                and s["max_y"] >= y0 and s["min_y"] <= y1:
            keep.append(f)
    return keep


def bbox_scan(root: str, table: str, x_col: str, y_col: str,
              x0: float, x1: float, y0: float, y1: float,
              columns: list[str] | None = None):
    """Box scan over a Z-clustered table: manifest-stat pruning picks the
    candidate fragments, the exact predicate is pushed into the Arrow
    scan of just those files. Returns (lazy Dataset, n_frags_total,
    n_frags_read)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from crawler_ray.sources import lance_layout as ll

    frags = ll.latest_manifest(root)["tables"][table]
    keep = prune_fragments(frags, x0, x1, y0, y1)
    flt = ((pc.field(x_col) >= x0) & (pc.field(x_col) <= x1)
           & (pc.field(y_col) >= y0) & (pc.field(y_col) <= y1))
    if not frags:
        return rd.from_items([]), 0, 0
    if not keep:
        import pyarrow.parquet as pq

        schema = pq.read_schema(ll.fragment_paths(root, table, frags[:1])[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table()), len(frags), 0
    ds = rd.read_parquet(ll.fragment_paths(root, table, keep),
                         columns=columns, filter=flt)
    return ds, len(frags), len(keep)
