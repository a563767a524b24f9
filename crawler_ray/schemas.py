"""Arrow schemas for every logical table of the engine (SURVEY.md §1).

One ``ray.data.Dataset`` per logical table; blocks are Arrow. The store
schema is exactly BASELINE.json's input_hint.
"""

from __future__ import annotations

import pyarrow as pa

# §1.1 — the frontier stream (one row per candidate URL in a wave)
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("host_shard", pa.int32()),
        ("priority", pa.int8()),
        ("source", pa.string()),  # seed | extracted
        ("wave", pa.int32()),
        ("seq", pa.int64()),      # stable order anchor within the wave
    ]
)

# §1.5 / input_hint — the Lance-layout store table of image+caption pairs
STORE = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# §1.3/1.4 — parsed property rows (FIXTURES.md F6; reference Postgres DDL
# database_service.py:45-66 + parser fields craigslist_parser.py:36-48)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("title", pa.string()),
        ("address", pa.string()),
        ("price", pa.int64()),
        ("latitude", pa.float64()),
        ("longitude", pa.float64()),
        ("property_type", pa.string()),
        ("beds", pa.int32()),
        ("baths", pa.float64()),
        ("sqft", pa.int32()),
        ("posted_date", pa.timestamp("us")),
        ("city", pa.string()),
        ("status_code", pa.int16()),
        ("content_hash", pa.uint64()),
        ("crawl_duration", pa.float64()),
        ("wave", pa.int32()),
    ]
)

# §2.9 — DLQ / failures table (worker.py:218-231 semantics)
FAILURES = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("error", pa.string()),
        ("failed_step", pa.string()),
        ("retry_count", pa.int32()),
        ("wave", pa.int32()),
    ]
)

# T1/T5 — checkpointed seen-state
SEEN = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("content_hash", pa.uint64()),
        ("wave", pa.int32()),
    ]
)

# F2 — robots rules table
ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("disallow_prefixes", pa.list_(pa.string())),
        ("crawl_delay_s", pa.float64()),
        ("fetch_status", pa.int16()),
    ]
)

# crawl-order record (FIXTURES.md F7 expected_order)
ORDER = pa.schema(
    [
        ("url", pa.string()),
        ("wave", pa.int32()),
        ("priority", pa.int8()),
        ("host_shard", pa.int32()),
        ("seq", pa.int64()),
    ]
)
