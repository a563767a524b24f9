"""crawler_ray — a Ray-Data-native data-processing engine.

A from-scratch rebuild of the capabilities of Sam-Radnus/Crawler (see
SURVEY.md) on idiomatic Ray Data: every stream/table of the reference is a
``ray.data.Dataset`` of Arrow blocks, per-record logic is vectorized
``map_batches``, stateful stages are actor pools, and wide steps are
explicit groupby/sort shuffles.

Package layout
--------------
- ``hashing``     xxhash64 (scalar + numpy-vectorized) — URL/content hashes.
- ``urlnorm``     RFC 3986 canonicalization + validity filters
                  (reference: link_extractor.py:85-160, html_downloader.py:292-327).
- ``imaging``     stdlib-zlib PNG codec, PSNR, 64-bit average-phash.
- ``sources``     synthetic web fixtures (FIXTURES.md) + Lance-layout
                  parquet store (manifest + immutable fragments).
- ``stages``      map_batches stages: canonicalize, classify, prioritize,
                  robots, politeness, fetch, parse, image decode.
- ``state``       seen-set shard actors, checkpoint manifests.
- ``pipelines``   the flagship crawl loop + relational / training-data ops.
"""

__version__ = "0.1.0"
