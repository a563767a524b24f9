"""Block hygiene: drop 0-row blocks from a materialized Dataset.

Why this exists: Ray's streaming executor SKIPS map_batches UDFs on empty
blocks, so the typed-empty guards in our keyed-repartition fold kernels never
run — a HASH_SHUFFLE empty partition flows downstream as a ZERO-COLUMN Arrow
table. That is harmless in aggregation chains, but pyarrow's hash join (the
``Dataset.join`` aggregator, ray/data/_internal/execution/operators/join.py
``finalize``) builds each partition's left table by concatenating whatever
shards arrived; a partition fed only schema-less empties yields a zero-column
table and ``pa.Table.join`` raises ``ArrowInvalid: No match ... FieldRef``.
HASH_SHUFFLE-exchange empties were measured to poison only the LEFT side (a
clean left joins fine against an exchange-dirty right), but SORT-produced
empties (ranges outnumbering rows) poison the RIGHT side too (round 5,
reproduced in tests/test_corpus_neardup.py's tiny corpus); queries.py's
streamed near-dup path neutralizes those with a width ``repartition`` on
the sort-derived join inputs — either remedy restores the schema.

``drop_empty_blocks`` removes the poison with O(blocks) driver metadata work
and ZERO data movement: it walks the materialized Dataset's ref bundles,
keeps the non-empty block refs, and rebuilds a Dataset around them
(`from_pandas_refs` / `from_arrow_refs` per the bundle schema type). Use it
on any keyed-exchange output that later becomes a join's left side.
"""

from __future__ import annotations


def drop_empty_blocks(ds):
    """Return ``ds`` minus its 0-row blocks (``ds`` itself if none).

    ``ds`` should be materialized (exchange outputs in this repo are); on a
    lazy Dataset this triggers execution, same as the join it protects.
    """
    import ray.data as rd
    from ray.data._internal.pandas_block import PandasBlockSchema

    pandas_refs, arrow_refs = [], []
    n_empty = 0
    for bundle in ds.iter_internal_ref_bundles():
        is_pandas = isinstance(bundle.schema, PandasBlockSchema)
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if (meta.num_rows or 0) == 0:
                n_empty += 1
                continue
            (pandas_refs if is_pandas else arrow_refs).append(ref)
    if n_empty == 0 or not (pandas_refs or arrow_refs):
        # nothing to drop, or nothing left — the all-empty Dataset is the
        # caller's (empty-input) problem, not a block-hygiene one
        return ds
    if pandas_refs and arrow_refs:
        return rd.from_pandas_refs(pandas_refs).union(
            rd.from_arrow_refs(arrow_refs))
    if pandas_refs:
        return rd.from_pandas_refs(pandas_refs)
    return rd.from_arrow_refs(arrow_refs)
