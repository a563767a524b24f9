"""Lance *logical layout* on Parquet: versioned manifest + immutable fragments.

``pylance`` is not installable in this sandbox (SURVEY.md §7), so the store
implements the layout the north rule asks for on plain Parquet:

    root/
      _manifest/v{N}.json     # one version per completed wave (atomic rename)
      {table}/{fragment}.parquet   # immutable fragment files

A fragment becomes visible only when a manifest version lists it; partially
written fragments from a killed run are ignored by readers and swept by the
next writer. Fragments are written distributed (one per map_batches batch,
write-to-temp + atomic rename) and their ids are recorded in the wave's
checkpoint manifest — the per-partition lineage the north rule requires.
If the real ``lance`` package is ever available, only this module changes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.hashing import xxh64_array

def _column_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray | None:
    """Per-row 64-bit hashes of one column, or None for unhashable types
    (large binary payloads, lists — those are covariant with a key column
    in every table we write, e.g. image bytes with image_id)."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return xxh64_array(col)
    if pa.types.is_floating(t):
        return col.to_numpy(zero_copy_only=False).astype(np.float64).view(np.uint64)
    if pa.types.is_unsigned_integer(t):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    if (pa.types.is_integer(t) or pa.types.is_boolean(t)
            or pa.types.is_temporal(t)):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return None


def _batch_digest(batch: pa.Table) -> str:
    """Content-derived fragment id: a task retry rewrites the SAME name
    (os.replace idempotent), so side-effect writes are retry-safe and a
    resumed wave converges to the same fragment set. ALL hashable columns
    contribute (position-mixed), so two batches sharing a key multiset but
    differing elsewhere (e.g. same URLs, different seq) get distinct names
    — only a true retry of the identical batch collides."""
    if batch.num_rows == 0:
        return f"{0:016x}"
    mix = np.uint64(0x9E3779B185EBCA87)
    rows = np.zeros(batch.num_rows, np.uint64)
    for name in batch.column_names:
        h = _column_hashes(batch[name])
        if h is not None:
            rows = (rows ^ h) * mix
    digest = np.bitwise_xor.reduce(rows) ^ np.uint64(batch.num_rows)
    return f"{int(digest):016x}"


class FragmentWriter:
    """map_batches callable: write each batch as an immutable fragment,
    emit one metadata row per fragment (collected small on the driver)."""

    def __init__(self, root: str, table: str, prefix: str, compression: str = "zstd"):
        self.dir = os.path.join(root, table)
        self.tmp = os.path.join(root, table, "_tmp")
        self.prefix = prefix
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta_schema = pa.schema([("fragment", pa.string()), ("rows", pa.int64())])
        if batch.num_rows == 0:
            return meta_schema.empty_table()
        os.makedirs(self.tmp, exist_ok=True)
        name = f"{self.prefix}-{_batch_digest(batch)}.parquet"
        tmp_path = os.path.join(self.tmp, name)
        pq.write_table(batch, tmp_path, compression=self.compression)
        os.replace(tmp_path, os.path.join(self.dir, name))
        return pa.table({"fragment": [name], "rows": [batch.num_rows]}, schema=meta_schema)


def glob_fragments(root: str, table: str, prefix: str) -> list[dict]:
    """Collect fragments of one wave by deterministic name prefix (used
    when the writer ran as a passthrough side effect inside a fused
    execution). Only call AFTER the writing execution completed."""
    tdir = os.path.join(root, table)
    if not os.path.isdir(tdir):
        return []
    out = []
    for fn in sorted(os.listdir(tdir)):
        if fn.startswith(f"{prefix}-") and fn.endswith(".parquet"):
            out.append({"fragment": fn, "rows": pq.read_metadata(os.path.join(tdir, fn)).num_rows})
    return out


def write_fragments(ds, root: str, table: str, prefix: str, batch_size: int | None = None) -> list[dict]:
    """Write a Dataset's blocks as fragments of ``root/table``; returns
    [{fragment, rows}...]. Executes the (lazy) dataset."""
    meta = ds.map_batches(
        FragmentWriter(root, table, prefix), batch_format="pyarrow", batch_size=batch_size
    ).take_all()
    return [{"fragment": m["fragment"], "rows": int(m["rows"])} for m in meta]


def write_table_fragment(table: pa.Table, root: str, name: str, prefix: str) -> list[dict]:
    """Driver-side single-fragment write (small control tables)."""
    if table.num_rows == 0:
        return []
    w = FragmentWriter(root, name, prefix)
    meta = w(table)
    return [{"fragment": meta["fragment"][0].as_py(), "rows": table.num_rows}]


def fragment_paths(root: str, table: str, fragments: list[dict]) -> list[str]:
    return [os.path.join(root, table, f["fragment"]) for f in fragments]


def read_fragments(root: str, table: str, fragments: list[dict], schema: pa.Schema | None = None,
                   added_columns: dict | None = None) -> pa.Table:
    paths = fragment_paths(root, table, fragments)
    if not paths:
        return schema.empty_table() if schema is not None else pa.table({})
    parts = []
    for f, p in zip(fragments, paths):
        t = pq.read_table(p)
        dv = f.get("dv")
        if dv:  # merge-on-read: hide deletion-vector rows
            dead = pq.read_table(os.path.join(root, table, dv))["row"]
            mask = np.ones(t.num_rows, bool)
            mask[np.asarray(dead, np.int64)] = False
            t = t.filter(pa.array(mask))
        if added_columns:  # schema evolution: backfill-on-read
            t = _apply_added_columns(t, added_columns)
        parts.append(t)
    return pa.concat_tables(parts, promote_options="default")


def read_table(root: str, table: str, version: int | None = None) -> pa.Table:
    """Manifest-aware read of one table: deletion vectors applied, added
    columns reconciled — what a consumer sees at ``version`` (default
    latest)."""
    m = latest_manifest(root) if version is None else read_manifest(root, version)
    return read_fragments(root, table, m["tables"][table],
                          added_columns=m.get("added_columns", {}).get(table))


# ---------------------------------------------------------------------------
# Versioned manifest
# ---------------------------------------------------------------------------

def manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifest")


def write_manifest(root: str, version: int, payload: dict) -> str:
    d = manifest_dir(root)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".v{version}.json.tmp")
    path = os.path.join(d, f"v{version}.json")
    with open(tmp, "w") as f:
        json.dump({"version": version, **payload}, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def latest_manifest(root: str) -> dict | None:
    d = manifest_dir(root)
    if not os.path.isdir(d):
        return None
    versions = []
    for fn in os.listdir(d):
        if fn.startswith("v") and fn.endswith(".json"):
            try:
                versions.append(int(fn[1:-5]))
            except ValueError:
                continue
    if not versions:
        return None
    with open(os.path.join(d, f"v{max(versions)}.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Merge-on-read upsert: deletion-vector sidecars (the Lance `merge_insert`
# / Delta MERGE shape — matched keys are hidden by a per-fragment deletion
# vector, update rows append as new fragments; nothing rewrites until the
# next compaction folds the deletes in)
# ---------------------------------------------------------------------------

class _DvWriter:
    """map_batches callable: each input row is one existing fragment.
    Reads ONLY that fragment's key column, intersects with the broadcast
    update-key set (ray.put once, ray.get once per actor — never per
    batch), unions with any prior deletion vector, and writes the merged
    vector as a parquet sidecar (content-digest name via the shared
    fragment writer → retry/kill-safe, invisible until published)."""

    def __init__(self, root: str, table: str, key_col: str, keys_ref):
        import ray

        self.root = root
        self.table = table
        self.key_col = key_col
        self.keys = ray.get(keys_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"fragment": [], "n_deleted": [], "n_new_deleted": [], "dv": []}
        for i in range(batch.num_rows):
            frag = batch["fragment"][i].as_py()
            prior_dv = batch["prior_dv"][i].as_py()
            path = os.path.join(self.root, self.table, frag)
            keys = pq.read_table(path, columns=[self.key_col])[self.key_col]
            mask = np.isin(np.asarray(keys), self.keys)
            newly = np.flatnonzero(mask).astype(np.int64)
            if prior_dv:
                prior = np.asarray(pq.read_table(
                    os.path.join(self.root, self.table, prior_dv))["row"],
                    np.int64)
                newly = np.setdiff1d(newly, prior)
            else:
                prior = np.empty(0, np.int64)
            if len(newly) == 0:
                continue  # this wave touched nothing here — keep prior dv
            rows = np.union1d(newly, prior)
            w = FragmentWriter(self.root, self.table, f"dv-{frag.rsplit('.', 1)[0]}")
            meta = w(pa.table({"row": pa.array(rows, pa.int64())}))
            out["fragment"].append(frag)
            out["n_deleted"].append(len(rows))
            out["n_new_deleted"].append(len(newly))
            out["dv"].append(meta["fragment"][0].as_py())
        return pa.table({"fragment": pa.array(out["fragment"], pa.string()),
                         "n_deleted": pa.array(out["n_deleted"], pa.int64()),
                         "n_new_deleted": pa.array(out["n_new_deleted"], pa.int64()),
                         "dv": pa.array(out["dv"], pa.string())})


def merge_insert(root: str, table: str, updates, key_col: str,
                 prefix: str = "u") -> dict:
    """Upsert ``updates`` (a Dataset) into ``table`` by ``key_col``:
    matched existing rows are hidden via per-fragment deletion-vector
    sidecars (one Ray task per fragment, each reading only its key
    column), update rows land as appended fragments, and one new manifest
    version publishes both atomically. Logical order: surviving old rows
    in place, then updates. The update KEY SET broadcasts via ``ray.put``
    — right for the wave-vs-store shape (a crawl wave is tiny next to the
    10^10-row store it updates); a store-scale update should compact
    instead. Returns {version, n_updated_fragments, n_deleted, n_added}."""
    import ray
    import ray.data as rd

    m = latest_manifest(root)
    frags = m["tables"][table]
    new_frags = write_fragments(updates, root, table, prefix)
    # a resubmitted identical wave rewrites the SAME content-digest
    # fragment names: the old entries are replaced by the fresh appended
    # ones (no double listing, no dv over a fragment that re-appends)
    replaced = {f["fragment"] for f in new_frags}
    items = [{"fragment": f["fragment"], "prior_dv": f.get("dv", "")}
             for f in frags if f["fragment"] not in replaced]
    if new_frags and items:
        key_values = pa.concat_tables(
            [pq.read_table(p, columns=[key_col])
             for p in fragment_paths(root, table, new_frags)])[key_col]
        keys_ref = ray.put(np.asarray(key_values))
        dv_meta = (rd.from_items(items, override_num_blocks=len(items))
                   .map_batches(_DvWriter, batch_format="pyarrow",
                                fn_constructor_kwargs=dict(
                                    root=root, table=table, key_col=key_col,
                                    keys_ref=keys_ref),
                                concurrency=(1, 8))
                   .take_all())
    else:
        dv_meta = []
    dv_by_frag = {r["fragment"]: r for r in dv_meta}
    out_list = []
    for f in frags:
        if f["fragment"] in replaced:
            continue
        f = dict(f)
        hit = dv_by_frag.get(f["fragment"])
        if hit is not None:
            f["dv"] = hit["dv"]
            f["n_deleted"] = int(hit["n_deleted"])
        out_list.append(f)
    out_list += new_frags
    version = int(m["version"]) + 1
    # drop keys that describe only the version that produced them
    payload = {k: v for k, v in m.items()
               if k not in ("version", "compaction")}
    payload["tables"] = dict(payload.get("tables", {}))
    payload["tables"][table] = out_list
    write_manifest(root, version, payload)
    return {"version": version,
            "n_updated_fragments": len(dv_meta),
            "n_deleted": int(sum(r["n_new_deleted"] for r in dv_meta)),
            "n_added": int(sum(f["rows"] for f in new_frags))}


# ---------------------------------------------------------------------------
# Schema evolution: metadata-only column add with a default
# (the Lance/Delta `ALTER TABLE ADD COLUMN` shape — NO fragment rewrites;
# readers reconcile old fragments against the manifest schema)
# ---------------------------------------------------------------------------

_EVOLVE_TYPES = {"int64": pa.int64(), "float64": pa.float64(),
                 "string": pa.string(), "bool": pa.bool_()}


def add_column(root: str, table: str, name: str, type_name: str,
               default=None) -> dict:
    """Publish a new manifest version whose schema lists ``name`` with a
    backfill ``default`` — a METADATA-ONLY commit: no fragment is read or
    rewritten (at a 10^10-row store a physical backfill is a full rewrite;
    this is O(1)). Readers fill the column for fragments written before
    the commit; fragments written after simply contain it. Time travel is
    intact — older versions don't list the column and read without it."""
    if type_name not in _EVOLVE_TYPES:
        raise ValueError(f"unsupported type {type_name!r}; "
                         f"one of {sorted(_EVOLVE_TYPES)}")
    m = latest_manifest(root)
    cols = dict(m.get("added_columns", {}).get(table, {}))
    if name in cols:
        raise ValueError(f"column {name!r} already added to {table!r}")
    cols[name] = {"type": type_name, "default": default}
    version = int(m["version"]) + 1
    payload = {k: v for k, v in m.items()
               if k not in ("version", "compaction")}
    payload["added_columns"] = dict(payload.get("added_columns", {}))
    payload["added_columns"][table] = cols
    write_manifest(root, version, payload)
    return {"version": version, "column": name}


def _apply_added_columns(t: pa.Table, added: dict) -> pa.Table:
    """Reconcile one fragment against the manifest's added-column list:
    fill any column the fragment predates with the recorded default."""
    for name, spec in added.items():
        if name in t.column_names:
            continue
        typ = _EVOLVE_TYPES[spec["type"]]
        d = spec.get("default")
        t = t.append_column(
            name, pa.nulls(t.num_rows, typ) if d is None
            else pa.array([d] * t.num_rows, typ))
    return t


# ---------------------------------------------------------------------------
# Change data feed: diff two manifest versions into insert/delete rows
# (the Delta CDF / Lance version-diff shape — consumers incrementally sync
# a downstream index from the feed instead of rescanning the store)
# ---------------------------------------------------------------------------

def read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(manifest_dir(root), f"v{version}.json")) as f:
        return json.load(f)


class _ChangeReader:
    """map_batches callable: each input row names one affected fragment.
    kind='insert' emits the fragment's VISIBLE rows (new-version dv
    applied); kind='delete' emits the rows the new version's deletion
    vector hides beyond the old version's (full preimage rows, the Delta
    CDF contract). One task per fragment — the feed never reads
    unaffected fragments."""

    def __init__(self, root: str, table: str):
        self.root = root
        self.table = table

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for i in range(batch.num_rows):
            frag = batch["fragment"][i].as_py()
            kind = batch["kind"][i].as_py()
            dv_new = batch["dv_new"][i].as_py()
            dv_old = batch["dv_old"][i].as_py()
            t = pq.read_table(os.path.join(self.root, self.table, frag))

            def dv_rows(name: str) -> np.ndarray:
                if not name:
                    return np.empty(0, np.int64)
                return np.asarray(
                    pq.read_table(os.path.join(self.root, self.table, name))["row"],
                    np.int64)

            if kind == "insert":
                mask = np.ones(t.num_rows, bool)
                mask[dv_rows(dv_new)] = False
                out = t.filter(pa.array(mask))
                op = "insert"
            else:
                delta = np.setdiff1d(dv_rows(dv_new), dv_rows(dv_old))
                out = t.take(pa.array(delta, pa.int64()))
                op = "delete"
            parts.append(out.append_column(
                "op", pa.array([op] * out.num_rows, pa.string())))
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts, promote_options="default")


def changes_between(root: str, table: str, v_from: int, v_to: int):
    """Change feed of ``table`` between two manifest versions: rows in
    fragments new to ``v_to`` are inserts (their current dv applied);
    deletion-vector growth on shared fragments yields delete rows with
    full preimages. Compaction versions are REFUSED (they rewrite data
    without changing it — diffing across one would report phantom
    churn; diff around it, as Delta's dataChange=false commits do).
    Returns a lazy Dataset with the fragment columns + ``op``."""
    import ray.data as rd

    for v in range(v_from + 1, v_to + 1):
        if "compaction" in read_manifest(root, v):
            raise ValueError(
                f"version {v} is a compaction (data-preserving); "
                f"diff around it")
    old = {f["fragment"]: f for f in read_manifest(root, v_from)["tables"][table]}
    new = read_manifest(root, v_to)["tables"][table]
    items = []
    for f in new:
        if f["fragment"] not in old:
            items.append({"fragment": f["fragment"], "kind": "insert",
                          "dv_new": f.get("dv", ""), "dv_old": ""})
        elif f.get("dv", "") != old[f["fragment"]].get("dv", ""):
            items.append({"fragment": f["fragment"], "kind": "delete",
                          "dv_new": f.get("dv", ""),
                          "dv_old": old[f["fragment"]].get("dv", "")})
    if not items:
        return rd.from_items([])
    return (rd.from_items(items, override_num_blocks=len(items))
            .map_batches(_ChangeReader, batch_format="pyarrow",
                         fn_constructor_kwargs=dict(root=root, table=table),
                         concurrency=(1, 8)))


# ---------------------------------------------------------------------------
# Store maintenance: fragment compaction + version vacuum
# (the Lance `compact_files` / `cleanup_old_versions` pair — at 100 TB the
# small-fragment problem is real: a crawl wave writing one fragment per
# politeness bucket leaves thousands of KB-scale files whose open/footer
# cost dominates reads)
# ---------------------------------------------------------------------------

def plan_compaction(fragments: list[dict], target_rows: int) -> list[list[dict]]:
    """Pack the manifest's fragment list into CONTIGUOUS runs of
    ~target_rows. Contiguity preserves the table's logical row order
    (readers concat in manifest order), so compaction is invisible to any
    consumer. A singleton run (fragment already >= target, or isolated)
    is kept as-is — no rewrite, no data movement."""
    bins: list[list[dict]] = []
    cur: list[dict] = []
    cur_rows = 0
    for f in fragments:
        if cur and cur_rows + int(f["rows"]) > target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += int(f["rows"])
        if cur_rows >= target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
    if cur:
        bins.append(cur)
    return bins


class _BinCompactor:
    """map_batches callable: each input row is one multi-fragment bin
    (JSON fragment list); reads the bin's fragments in order, writes ONE
    merged fragment (content-derived digest name, write-to-tmp + atomic
    rename — a task retry or a resumed run rewrites the SAME file, so a
    kill between rewrite and manifest publish leaves only invisible,
    re-creatable files)."""

    def __init__(self, root: str, table: str, added_columns: dict | None = None):
        self.root = root
        self.table = table
        # a bin can mix fragments written before and after an add_column
        # commit: reconcile on read so the rewrite materializes the
        # DEFAULT (not nulls) in pre-add rows
        self.added_columns = added_columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"bin": [], "fragment": [], "rows": []}
        w = FragmentWriter(self.root, self.table, "compact")
        for i in range(batch.num_rows):
            frags = json.loads(batch["frags"][i].as_py())
            merged = read_fragments(self.root, self.table, frags,
                                    added_columns=self.added_columns)
            if merged.num_rows == 0:
                # bin fully deletion-vector-masked: drop it from the
                # manifest instead of writing a 0-row fragment
                out["bin"].append(int(batch["bin"][i].as_py()))
                out["fragment"].append("")
                out["rows"].append(0)
                continue
            meta = w(merged)
            out["bin"].append(int(batch["bin"][i].as_py()))
            out["fragment"].append(meta["fragment"][0].as_py())
            out["rows"].append(merged.num_rows)
        return pa.table({"bin": pa.array(out["bin"], pa.int64()),
                         "fragment": pa.array(out["fragment"], pa.string()),
                         "rows": pa.array(out["rows"], pa.int64())})


def compact_table(root: str, table: str, target_rows: int) -> dict:
    """Coalesce ``table``'s small fragments into ~target_rows ones and
    publish a new manifest version. Multi-fragment bins rewrite
    DISTRIBUTED (one Ray task per bin — at a 10^10-row store that is
    thousands of independent merges, no shuffle, no driver data); bins
    that are already one fragment are carried over untouched. Returns
    {version, n_before, n_after, n_rewritten, rows}. Idempotent: a second
    run finds every bin is a singleton and publishes no new version."""
    import ray.data as rd

    m = latest_manifest(root)
    frags = m["tables"][table]
    bins = plan_compaction(frags, target_rows)
    rewrites = [(i, b) for i, b in enumerate(bins) if len(b) > 1]
    if not rewrites:
        return {"version": int(m["version"]), "n_before": len(frags),
                "n_after": len(frags), "n_rewritten": 0,
                "rows": sum(int(f["rows"]) for f in frags)}
    items = [{"bin": i, "frags": json.dumps(b)} for i, b in rewrites]
    meta = (rd.from_items(items, override_num_blocks=len(items))
            .map_batches(_BinCompactor(root, table,
                                       m.get("added_columns", {}).get(table)),
                         batch_format="pyarrow")
            .take_all())
    new_by_bin = {int(r["bin"]): {"fragment": r["fragment"], "rows": int(r["rows"])}
                  for r in meta}
    new_list = [new_by_bin[i] if i in new_by_bin else b[0]
                for i, b in enumerate(bins)]
    new_list = [f for f in new_list if f["fragment"]]  # fully-dead bins drop
    version = int(m["version"]) + 1
    payload = {k: v for k, v in m.items() if k != "version"}
    payload["tables"] = dict(payload.get("tables", {}))
    payload["tables"][table] = new_list
    payload["compaction"] = {"table": table, "target_rows": target_rows,
                             "n_before": len(frags), "n_after": len(new_list)}
    write_manifest(root, version, payload)
    return {"version": version, "n_before": len(frags),
            "n_after": len(new_list), "n_rewritten": len(rewrites),
            "rows": sum(int(f["rows"]) for f in new_list)}


def vacuum_versions(root: str, tables: list[str], keep_latest: int = 1) -> dict:
    """Drop all but the newest ``keep_latest`` manifest versions, then
    sweep fragments no surviving version references (Lance
    `cleanup_old_versions`): reclaims the pre-compaction files while older
    kept versions remain bit-readable (time travel within the window)."""
    d = manifest_dir(root)
    versions = []
    for fn in os.listdir(d):
        if fn.startswith("v") and fn.endswith(".json"):
            try:
                versions.append(int(fn[1:-5]))
            except ValueError:  # stray non-version file, as latest_manifest
                continue
    versions.sort()
    dropped = versions[:-keep_latest] if keep_latest > 0 else versions
    for v in dropped:
        os.remove(os.path.join(d, f"v{v}.json"))
    removed = sweep_unreferenced(root, tables)
    return {"versions_dropped": len(dropped), "files_removed": removed}


def sweep_unreferenced(root: str, tables: list[str]) -> int:
    """Delete fragment files not referenced by any manifest version (crash
    leftovers). Returns count removed."""
    d = manifest_dir(root)
    referenced: set[tuple[str, str]] = set()
    if os.path.isdir(d):
        for fn in os.listdir(d):
            if fn.startswith("v") and fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    m = json.load(f)
                for t, frags in m.get("tables", {}).items():
                    for fr in frags:
                        referenced.add((t, fr["fragment"]))
                        if fr.get("dv"):
                            referenced.add((t, fr["dv"]))
    removed = 0
    for t in tables:
        tdir = os.path.join(root, t)
        if not os.path.isdir(tdir):
            continue
        for fn in os.listdir(tdir):
            if fn.endswith(".parquet") and (t, fn) not in referenced:
                os.remove(os.path.join(tdir, fn))
                removed += 1
        tmp = os.path.join(tdir, "_tmp")
        if os.path.isdir(tmp):
            for fn in os.listdir(tmp):
                os.remove(os.path.join(tmp, fn))
                removed += 1
    return removed
