"""Resumable training-shard export over the image+caption store.

The consumer of a 10^10-URL crawl is a training job: it wants the store's
(image, caption) pairs deduplicated and re-packed into a fixed set of
balanced shards it can stream, with a manifest that says exactly what each
shard holds — and a failed export must resume by producing ONLY the
missing shards, never rewriting finished ones.

Two stages, both shuffle-free in the Ray Data sense:

1. **Stage** (``_StageWriter``): one streaming pass over the store
   fragments; each task splits its batch by shard key and appends
   per-(shard, batch-digest) staging fragments under
   ``out/staging/shard=K/``. The shard key is a murmur64-mixed phash, so
   every EXACT-duplicate image (same perceptual content ⇒ same phash)
   lands in the same shard BY CONSTRUCTION — the later dedup needs no
   cross-shard exchange, the same write-time-bucketing trick the crawl
   frontier uses (crawl_stages.py FetchProcess). Content-digest fragment
   names make task retries idempotent (same bytes ⇒ same name ⇒
   os.replace no-op), mirroring lance_layout's rule.
2. **Finalize**: each pending shard reads its staging directory as ONE
   co-located block, first-wins-dedups by phash (min image_id — stable
   under any block layout), sorts by image_id and writes the final
   ``shard-K.parquet`` via write-to-temp + atomic rename.

Resume: the manifest (atomic rename, lance_layout.write_manifest style)
records per-shard row counts and content digests; re-running the export
skips completed shards in BOTH stages (stage filters their rows out, so
a resume moves only the missing shards' bytes).

Reference parity note: the reference has no export surface (its consumers
read Postgres/FS directly, api/main.py); this is the training-pipeline
extension the task brief's "resumable output" requirement describes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from crawler_ray.sources import lance_layout as ll

SHARD_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def _mix64(x: np.ndarray) -> np.ndarray:
    """murmur64 finalizer (public avalanche function) — turns the
    structured phash space into a uniform shard key."""
    x = np.asarray(x, np.uint64).copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def shard_of(phash: np.ndarray, n_shards: int) -> np.ndarray:
    return (_mix64(np.asarray(phash, np.int64).view(np.uint64)) % np.uint64(n_shards)).astype(np.int64)


class _StageWriter:
    """map_batches callable: split a store batch by shard key and write one
    staging fragment per (shard, batch) — append-only, retry-idempotent."""

    def __init__(self, out: str, n_shards: int, pending: list[int]):
        self.out = out
        self.n_shards = n_shards
        self.pending = np.array(sorted(pending), np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        meta = []
        if len(batch) == 0:
            return pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                                 "rows": pd.Series([], dtype=np.int64)})
        batch = batch.assign(shard=shard_of(batch["phash"].to_numpy(), self.n_shards))
        batch = batch.loc[np.isin(batch["shard"].to_numpy(), self.pending)]
        for shard, g in batch.groupby("shard"):
            t = pa.Table.from_pandas(g[SHARD_COLS], preserve_index=False)
            d = os.path.join(self.out, "staging", f"shard={int(shard)}")
            tmp = os.path.join(d, "_tmp")
            os.makedirs(tmp, exist_ok=True)
            name = f"frag-{ll._batch_digest(t)}.parquet"
            tmp_path = os.path.join(tmp, name)
            # image bytes are already compressed; zstd would only burn CPU
            pq.write_table(t, tmp_path, compression="none")
            os.replace(tmp_path, os.path.join(d, name))
            meta.append({"shard": int(shard), "rows": len(g)})
        return pd.DataFrame(meta, columns=["shard", "rows"]).astype(np.int64)


def _finalize_shard(row: pd.DataFrame, out: str) -> pd.DataFrame:
    """One task per shard: read THIS shard's staging fragments inside the
    task (the bytes never enter the Dataset block plane, so Ray's dynamic
    block splitting cannot fragment the shard into multiple finalize calls
    — with a block-mapped formulation, any shard larger than
    target_max_block_size would silently finalize as last-sub-block-wins),
    dedup, sort, write the final file. Memory bound: one whole shard per
    task — shard count must be sized so a shard fits a worker heap, which
    a training-shard layout wants anyway (shards are the streaming unit)."""
    return pd.concat([_finalize_one(int(s), out) for s in row["shard"]],
                     ignore_index=True) if len(row) else _finalize_one(-1, out)


def _finalize_one(shard: int, out: str) -> pd.DataFrame:
    d = os.path.join(out, "staging", f"shard={shard}")
    frags = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")] if os.path.isdir(d) else []
    if not frags:
        return pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                             "n_pairs": pd.Series([], dtype=np.int64),
                             "n_dups_dropped": pd.Series([], dtype=np.int64),
                             "digest": pd.Series([], dtype=str)})
    b = pq.read_table(frags).to_pandas()
    n_raw = len(b)
    # first-wins by perceptual content: min image_id per phash, stable
    # under any staging-fragment layout
    b = (b.sort_values(["phash", "image_id"], kind="mergesort")
         .drop_duplicates("phash", keep="first")
         .sort_values("image_id", kind="mergesort"))
    t = pa.Table.from_pandas(b[SHARD_COLS], preserve_index=False)
    tmp = os.path.join(out, "_tmp")
    os.makedirs(tmp, exist_ok=True)
    final = os.path.join(out, f"shard-{shard}.parquet")
    tmp_path = os.path.join(tmp, f"shard-{shard}.parquet")
    pq.write_table(t, tmp_path, compression="none")
    os.replace(tmp_path, final)
    return pd.DataFrame({"shard": [np.int64(shard)],
                         "n_pairs": [np.int64(t.num_rows)],
                         "n_dups_dropped": [np.int64(n_raw - t.num_rows)],
                         "digest": [ll._batch_digest(t)]})


def read_training_shards(out: str, shards: list[int] | None = None):
    """Training-reader side: the finished shards as a lazy Dataset, one
    co-located block per shard (a shard is the streaming unit a trainer
    checkpoints on). Validates requested shards against the manifest so a
    partial export cannot be silently read as complete."""
    with open(os.path.join(out, "_manifest.json")) as f:
        m = json.load(f)
    want = sorted(m["shards"], key=int) if shards is None else [str(s) for s in shards]
    missing = [s for s in want if s not in m["shards"]]
    if missing:
        raise ValueError(f"shards not in manifest (incomplete export?): {missing}")
    paths = [os.path.join(out, f"shard-{s}.parquet") for s in want]
    parts = [rd.read_parquet(p, override_num_blocks=1) for p in paths]
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


JSONL_COLS = ["caption", "fmt", "h", "image_id", "phash", "w"]  # key order


def _jsonl_payload(df: pd.DataFrame) -> bytes:
    """Canonical JSONL bytes for one shard: keys in fixed sorted order,
    compact separators, ensure_ascii — stdlib json on both the engine and
    the golden, so the byte stream (and thus the digest) is reproducible
    anywhere. Per-record serialization is inherently row-wise; it runs at
    shard-finalize granularity (one bounded shard per task), the same
    memory/cpu envelope as the parquet finalize's sort."""
    import json as _json

    recs = df[JSONL_COLS].to_dict("records")
    return ("".join(_json.dumps(r, sort_keys=True, separators=(",", ":"),
                                ensure_ascii=True) + "\n" for r in recs)
            ).encode("utf-8")


def _jsonl_one(shard: int, out: str) -> pd.DataFrame:
    from crawler_ray.hashing import xxh64

    b = pq.read_table(os.path.join(out, f"shard-{shard}.parquet"),
                      columns=[c for c in SHARD_COLS if c != "bytes"]).to_pandas()
    for c in ("w", "h"):
        b[c] = b[c].astype(int)
    b["phash"] = b["phash"].astype(np.int64)
    payload = _jsonl_payload(b)
    tmp = os.path.join(out, "_tmp")
    os.makedirs(tmp, exist_ok=True)
    tp = os.path.join(tmp, f"shard-{shard}.jsonl")
    with open(tp, "wb") as f:
        f.write(payload)
    os.replace(tp, os.path.join(out, f"shard-{shard}.jsonl"))
    return pd.DataFrame({"shard": [np.int64(shard)],
                         "n_rows": [np.int64(len(b))],
                         "digest": [f"{xxh64(payload):016x}"]})


def export_jsonl_shards(store_root: str, out: str, n_shards: int = 8) -> pd.DataFrame:
    """JSONL interchange sink LAYERED on the parquet export: parquet shards
    are the storage layer (bytes included); this emits the text/metadata
    view trainers and data loaders ingest as `shard-K.jsonl` — one JSON
    object per kept (deduped) pair, rows in image_id order, image bytes by
    reference (they stay in the parquet shard; the WebDataset/img2dataset
    sidecar convention). Runs `export_training_shards` first (idempotent —
    a finished parquet export is a manifest no-op), then one Ray task per
    pending shard serializes + atomically renames its file; a `_jsonl`
    section in its own manifest makes re-runs skip finished files, so a
    failed export resumes by writing ONLY the missing shards."""
    pq_manifest = export_training_shards(store_root, out, n_shards)
    jm_path = os.path.join(out, "_jsonl_manifest.json")
    done: dict[str, dict] = {}
    if os.path.exists(jm_path):
        with open(jm_path) as f:
            prev = json.load(f)
        if prev.get("n_shards") != n_shards:
            raise ValueError(
                f"jsonl export at {out} was built with "
                f"n_shards={prev.get('n_shards')}; got {n_shards}")
        done = {s: m for s, m in prev.get("shards", {}).items()
                if os.path.exists(os.path.join(out, f"shard-{s}.jsonl"))}
    pending = [s for s in range(n_shards) if str(s) not in done]
    if pending:
        stats = (rd.from_pandas(pd.DataFrame({"shard": np.array(pending, np.int64)}))
                 .repartition(len(pending))
                 .map_batches(
                     lambda r, out=out: pd.concat(
                         [_jsonl_one(int(s), out) for s in r["shard"]],
                         ignore_index=True),
                     batch_format="pandas", batch_size=None)
                 .to_pandas())
        for r in stats.itertuples(index=False):
            done[str(int(r.shard))] = {"n_rows": int(r.n_rows), "digest": r.digest}
        tmp = jm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_shards": n_shards, "shards": done}, f, sort_keys=True)
        os.replace(tmp, jm_path)
    rows = [{"shard": np.int64(int(s)), "n_rows": np.int64(m["n_rows"]),
             "digest": m["digest"]} for s, m in done.items()]
    out_df = pd.DataFrame(rows, columns=["shard", "n_rows", "digest"])
    for c in ("shard", "n_rows"):
        out_df[c] = out_df[c].astype(np.int64)
    assert len(out_df) == len(pq_manifest)
    return out_df.sort_values("shard").reset_index(drop=True)


def read_jsonl_shards(out: str, shards: list[int] | None = None):
    """Source side of the JSONL sink: the finished jsonl shards as a lazy
    Dataset (ray.data.read_json), one co-located block per shard, manifest-
    validated like read_training_shards."""
    with open(os.path.join(out, "_jsonl_manifest.json")) as f:
        m = json.load(f)
    want = sorted(m["shards"], key=int) if shards is None else [str(s) for s in shards]
    missing = [s for s in want if s not in m["shards"]]
    if missing:
        raise ValueError(f"jsonl shards not in manifest: {missing}")
    paths = [os.path.join(out, f"shard-{s}.jsonl") for s in want
             if m["shards"][s]["n_rows"] > 0]  # read_json rejects 0-byte files
    if not paths:  # every selected shard is empty
        return rd.from_arrow(pa.schema(
            [("caption", pa.string()), ("fmt", pa.string()),
             ("h", pa.int64()), ("image_id", pa.string()),
             ("phash", pa.int64()), ("w", pa.int64())]).empty_table())
    parts = [rd.read_json(p, override_num_blocks=1) for p in paths]
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


CSV_COLS = ["image_id", "w", "h", "fmt", "phash", "caption"]  # caption last


def _csv_field(v) -> str:
    """RFC 4180 minimal quoting, byte-compatible with stdlib
    ``csv.writer(..., lineterminator="\\n")`` (the golden's writer): quote
    iff the field contains the delimiter, the quote char, or a character
    of the line terminator (exactly stdlib's rule — a bare CR therefore
    stays unquoted, and empty fields stay unquoted in multi-field rows);
    double inner quotes."""
    s = str(v)
    if any(c in s for c in ',"\n'):
        return '"' + s.replace('"', '""') + '"'
    return s


def _csv_payload(df: pd.DataFrame) -> bytes:
    lines = [",".join(CSV_COLS)]
    for r in df[CSV_COLS].itertuples(index=False):
        lines.append(",".join(_csv_field(v) for v in r))
    return ("\n".join(lines) + "\n").encode("utf-8")


def _csv_one(shard: int, out: str) -> pd.DataFrame:
    from crawler_ray.hashing import xxh64

    b = pq.read_table(os.path.join(out, f"shard-{shard}.parquet"),
                      columns=[c for c in SHARD_COLS if c != "bytes"]).to_pandas()
    for c in ("w", "h"):
        b[c] = b[c].astype(int)
    b["phash"] = b["phash"].astype(np.int64)
    payload = _csv_payload(b)
    tmp = os.path.join(out, "_tmp")
    os.makedirs(tmp, exist_ok=True)
    tp = os.path.join(tmp, f"shard-{shard}.csv")
    with open(tp, "wb") as f:
        f.write(payload)
    os.replace(tp, os.path.join(out, f"shard-{shard}.csv"))
    return pd.DataFrame({"shard": [np.int64(shard)],
                         "n_rows": [np.int64(len(b))],
                         "digest": [f"{xxh64(payload):016x}"]})


def export_csv_shards(store_root: str, out: str, n_shards: int = 8) -> pd.DataFrame:
    """CSV interchange sink LAYERED on the parquet export (same layering
    and resume rules as the JSONL/WDS sinks): one RFC 4180 file per shard,
    header + rows in image_id order, image bytes by reference. The line
    format is byte-compatible with stdlib ``csv.writer`` so digests are
    reproducible anywhere; ``_csv_manifest.json`` records n_rows + digest
    and re-runs skip finished files."""
    pq_manifest = export_training_shards(store_root, out, n_shards)
    cm_path = os.path.join(out, "_csv_manifest.json")
    done: dict[str, dict] = {}
    if os.path.exists(cm_path):
        with open(cm_path) as f:
            prev = json.load(f)
        if prev.get("n_shards") != n_shards:
            raise ValueError(
                f"csv export at {out} was built with "
                f"n_shards={prev.get('n_shards')}; got {n_shards}")
        done = {s: m for s, m in prev.get("shards", {}).items()
                if os.path.exists(os.path.join(out, f"shard-{s}.csv"))}
    pending = [s for s in range(n_shards) if str(s) not in done]
    if pending:
        stats = (rd.from_pandas(pd.DataFrame({"shard": np.array(pending, np.int64)}))
                 .repartition(len(pending))
                 .map_batches(
                     lambda r, out=out: pd.concat(
                         [_csv_one(int(s), out) for s in r["shard"]],
                         ignore_index=True),
                     batch_format="pandas", batch_size=None)
                 .to_pandas())
        for r in stats.itertuples(index=False):
            done[str(int(r.shard))] = {"n_rows": int(r.n_rows), "digest": r.digest}
        tmp = cm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_shards": n_shards, "shards": done}, f, sort_keys=True)
        os.replace(tmp, cm_path)
    rows = [{"shard": np.int64(int(s)), "n_rows": np.int64(m["n_rows"]),
             "digest": m["digest"]} for s, m in done.items()]
    out_df = pd.DataFrame(rows, columns=["shard", "n_rows", "digest"])
    for c in ("shard", "n_rows"):
        out_df[c] = out_df[c].astype(np.int64)
    assert len(out_df) == len(pq_manifest)
    return out_df.sort_values("shard").reset_index(drop=True)


CSV_SCHEMA = pa.schema([("image_id", pa.string()), ("w", pa.int64()),
                        ("h", pa.int64()), ("fmt", pa.string()),
                        ("phash", pa.int64()), ("caption", pa.string())])


def read_csv_shards(out: str, shards: list[int] | None = None):
    """Source side of the CSV sink: the finished csv shards as a lazy
    Dataset (ray.data.read_csv → Arrow's RFC 4180 reader), one co-located
    block per shard, manifest-validated like the other readers. Column
    types are pinned explicitly — per-file inference would turn an
    all-digit-string column (e.g. image ids '0123') into int64 and lose
    leading zeros, or give different shards different schemas and break
    the union."""
    import pyarrow.csv as pacsv

    with open(os.path.join(out, "_csv_manifest.json")) as f:
        m = json.load(f)
    want = sorted(m["shards"], key=int) if shards is None else [str(s) for s in shards]
    missing = [s for s in want if s not in m["shards"]]
    if missing:
        raise ValueError(f"csv shards not in manifest: {missing}")
    conv = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in CSV_SCHEMA})
    paths = [os.path.join(out, f"shard-{s}.csv") for s in want
             if m["shards"][s]["n_rows"] > 0]
    if not paths:  # every selected shard is header-only
        return rd.from_arrow(CSV_SCHEMA.empty_table())
    parts = [rd.read_csv(p, override_num_blocks=1, convert_options=conv)
             for p in paths]
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def _wds_one(shard: int, out: str) -> pd.DataFrame:
    from crawler_ray.hashing import xxh64
    from crawler_ray.sources.wds_tar import tar_bytes

    b = pq.read_table(os.path.join(out, f"shard-{shard}.parquet")).to_pandas()
    for c in ("w", "h"):
        b[c] = b[c].astype(int)
    b["phash"] = b["phash"].astype(np.int64)
    members: list[tuple[str, bytes]] = []
    for r in b.itertuples(index=False):
        meta = {"caption": str(r.caption), "fmt": str(r.fmt), "h": int(r.h),
                "image_id": str(r.image_id), "phash": int(r.phash),
                "w": int(r.w)}  # == _jsonl_payload's canonical form
        members.append((f"{r.image_id}.png", bytes(r.bytes)))
        members.append((f"{r.image_id}.json", json.dumps(
            meta, sort_keys=True, separators=(",", ":"),
            ensure_ascii=True).encode("utf-8")))
    payload = tar_bytes(members)
    tmp = os.path.join(out, "_tmp")
    os.makedirs(tmp, exist_ok=True)
    tp = os.path.join(tmp, f"shard-{shard}.tar")
    with open(tp, "wb") as f:
        f.write(payload)
    os.replace(tp, os.path.join(out, f"shard-{shard}.tar"))
    return pd.DataFrame({"shard": [np.int64(shard)],
                         "n_samples": [np.int64(len(b))],
                         "digest": [f"{xxh64(payload):016x}"]})


def export_wds_shards(store_root: str, out: str, n_shards: int = 8) -> pd.DataFrame:
    """WebDataset-style tar sink LAYERED on the parquet export (same
    layering as ``export_jsonl_shards``): each final ``shard-K.tar`` holds
    one sample per kept (deduped) pair in image_id order — the member pair
    ``{image_id}.png`` (stored image bytes) + ``{image_id}.json`` (the
    canonical metadata object, identical serialization to the JSONL
    sidecar) — written by the spec-implemented deterministic ustar writer
    (sources/wds_tar.py), so shard bytes and digests are reproducible
    anywhere. One Ray task per pending shard; a ``_wds_manifest.json``
    records n_samples + digest and re-runs skip finished files."""
    pq_manifest = export_training_shards(store_root, out, n_shards)
    wm_path = os.path.join(out, "_wds_manifest.json")
    done: dict[str, dict] = {}
    if os.path.exists(wm_path):
        with open(wm_path) as f:
            prev = json.load(f)
        if prev.get("n_shards") != n_shards:
            raise ValueError(
                f"wds export at {out} was built with "
                f"n_shards={prev.get('n_shards')}; got {n_shards}")
        done = {s: m for s, m in prev.get("shards", {}).items()
                if os.path.exists(os.path.join(out, f"shard-{s}.tar"))}
    pending = [s for s in range(n_shards) if str(s) not in done]
    if pending:
        stats = (rd.from_pandas(pd.DataFrame({"shard": np.array(pending, np.int64)}))
                 .repartition(len(pending))
                 .map_batches(
                     lambda r, out=out: pd.concat(
                         [_wds_one(int(s), out) for s in r["shard"]],
                         ignore_index=True),
                     batch_format="pandas", batch_size=None)
                 .to_pandas())
        for r in stats.itertuples(index=False):
            done[str(int(r.shard))] = {"n_samples": int(r.n_samples),
                                       "digest": r.digest}
        tmp = wm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_shards": n_shards, "shards": done}, f, sort_keys=True)
        os.replace(tmp, wm_path)
    rows = [{"shard": np.int64(int(s)), "n_samples": np.int64(m["n_samples"]),
             "digest": m["digest"]} for s, m in done.items()]
    out_df = pd.DataFrame(rows, columns=["shard", "n_samples", "digest"])
    for c in ("shard", "n_samples"):
        out_df[c] = out_df[c].astype(np.int64)
    assert len(out_df) == len(pq_manifest)
    return out_df.sort_values("shard").reset_index(drop=True)


def read_wds_shards(out: str, shards: list[int] | None = None):
    """Source side of the tar sink: parse the finished shards back into a
    lazy Dataset of samples (image_id, bytes, caption, fmt, w, h, phash) —
    one task per shard runs the spec ustar parser and regroups the
    ``.png``/``.json`` member pair; manifest-validated like the other
    readers."""
    with open(os.path.join(out, "_wds_manifest.json")) as f:
        m = json.load(f)
    want = sorted(m["shards"], key=int) if shards is None else [str(s) for s in shards]
    missing = [s for s in want if s not in m["shards"]]
    if missing:
        raise ValueError(f"wds shards not in manifest: {missing}")

    def load(rows: pd.DataFrame) -> pd.DataFrame:
        from crawler_ray.sources.wds_tar import parse_ustar

        recs = []
        for s in rows["shard"]:
            with open(os.path.join(out, f"shard-{int(s)}.tar"), "rb") as f:
                members = dict(parse_ustar(f.read()))
            for name, data in members.items():
                if not name.endswith(".json"):
                    continue
                meta = json.loads(data)
                meta["bytes"] = members[meta["image_id"] + ".png"]
                recs.append(meta)
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        if not recs:
            return pd.DataFrame({c: pd.Series(
                [], dtype=(object if c in ("image_id", "bytes", "fmt", "caption")
                           else np.int64)) for c in cols})
        return pd.DataFrame(recs)[cols]

    shard_ids = pd.DataFrame({"shard": np.array([int(s) for s in want], np.int64)})
    return (rd.from_pandas(shard_ids).repartition(max(1, len(want)))
            .map_batches(load, batch_format="pandas", batch_size=None))


def export_training_shards(store_root: str, out: str, n_shards: int = 8) -> pd.DataFrame:
    """Export the crawl store at ``store_root`` into ``n_shards`` final
    parquet shards under ``out``; returns the per-shard manifest frame.
    Re-running with the same arguments skips every completed shard."""
    manifest_path = os.path.join(out, "_manifest.json")
    done: dict[str, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if prev.get("n_shards") != n_shards:
            # shard placement is hash MOD n_shards: resuming a layout built
            # for a different modulus would break dup co-location silently
            raise ValueError(
                f"export at {out} was built with n_shards={prev.get('n_shards')}; "
                f"got n_shards={n_shards} — use a fresh output directory")
        done = {s: m for s, m in prev.get("shards", {}).items()
                if os.path.exists(os.path.join(out, f"shard-{s}.parquet"))}
    pending = [s for s in range(n_shards) if str(s) not in done]

    if pending:
        # A crash between staging and finalize can leave staging fragments
        # whose batch boundaries differ from this run's (fragment names are
        # content digests of the BATCH) — re-staging on top would duplicate
        # rows. Dedup keeps the final bytes correct either way, but the
        # manifest's n_dups_dropped would diverge from a clean run; clearing
        # a pending shard's staging dir first makes resume stats identical.
        import shutil
        for s in pending:
            shutil.rmtree(os.path.join(out, "staging", f"shard={s}"),
                          ignore_errors=True)
        m = ll.latest_manifest(store_root)
        paths = ll.fragment_paths(store_root, "store", m["tables"]["store"])
        (rd.read_parquet(paths, columns=SHARD_COLS)
         .map_batches(_StageWriter(out, n_shards, pending), batch_format="pandas")
         .materialize())
        # one finalize TASK per pending shard: the driver ships only shard
        # ids; each task reads/writes its own shard's files
        stats = (rd.from_pandas(pd.DataFrame({"shard": np.array(pending, np.int64)}))
                 .repartition(len(pending))
                 .map_batches(lambda r: _finalize_shard(r, out),
                              batch_format="pandas", batch_size=None)
                 .to_pandas())
        for r in stats.itertuples(index=False):
            done[str(int(r.shard))] = {"n_pairs": int(r.n_pairs),
                                       "n_dups_dropped": int(r.n_dups_dropped),
                                       "digest": r.digest}
        # a shard key no row hashed to still needs its (empty) final file +
        # manifest entry, or it would stay pending on every resume
        for s in pending:
            if str(s) not in done:
                empty = pa.table({c: pa.array([], t) for c, t in zip(
                    SHARD_COLS, [pa.string(), pa.binary(), pa.int32(), pa.int32(),
                                 pa.string(), pa.string(), pa.int64()])})
                tmpd = os.path.join(out, "_tmp")
                os.makedirs(tmpd, exist_ok=True)
                tp = os.path.join(tmpd, f"shard-{s}.parquet")
                pq.write_table(empty, tp, compression="none")
                os.replace(tp, os.path.join(out, f"shard-{s}.parquet"))
                done[str(s)] = {"n_pairs": 0, "n_dups_dropped": 0,
                                "digest": f"{0:016x}"}
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_shards": n_shards, "shards": done}, f, sort_keys=True)
        os.replace(tmp, manifest_path)
        # staging fragments of completed shards are dead weight; drop them
        # AFTER the manifest rename so a crash here only leaves extra files
        import shutil
        for s in pending:
            if str(s) in done:
                shutil.rmtree(os.path.join(out, "staging", f"shard={s}"),
                              ignore_errors=True)

    rows = [{"shard": np.int64(int(s)), **{k: (np.int64(v) if k != "digest" else v)
                                           for k, v in m.items()}}
            for s, m in done.items()]
    out_df = pd.DataFrame(rows, columns=["shard", "n_pairs", "n_dups_dropped", "digest"])
    for c in ("shard", "n_pairs", "n_dups_dropped"):
        out_df[c] = out_df[c].astype(np.int64)
    return out_df.sort_values("shard").reset_index(drop=True)
