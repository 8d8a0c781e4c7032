"""xs_vlm_ocr_ray — a Ray-Data-native document→text extraction engine.

A from-scratch reimplementation of the query / data-processing
capabilities of the reference desktop OCR app (xstongxue/XS-VLM-OCR,
surveyed in SURVEY.md) as a streaming ``ray.data.Dataset`` pipeline over
Parquet shards of Common-Crawl-style pages
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.

Layout
------
- ``functions/`` — pure, vectorizable kernels (text normalization, span
  assembly, content hashing, text statistics). Byte-exactness lives here.
- ``extract.py`` — the deterministic HTML boilerplate-strip extractor
  (the analog of the reference's local Tesseract engine,
  src/adapters/TesseractAdapter.cpp).
- ``stages/`` — Ray Data stage builders: classify, extract actor pool,
  dedup shuffles, skew handling.
- ``sources/`` — readers (pages parquet, config).
- ``pipelines/`` — end-to-end pipelines + the query surface over results
  (the analog of the reference's SQLite history queries,
  src/managers/HistoryManager.cpp).
- ``state/`` — per-partition lineage manifest + resume.
- ``engines/`` — the engine registry / Extractor protocol (the analog of
  the reference's ModelAdapter registry, src/core/ModelAdapter.h).
- ``fixtures.py`` — seeded deterministic synthetic pages generator.

No module in this package calls ``ray.init`` — sessions are owned by the
driver / bench.py / test fixtures.
"""

__version__ = "0.1.0"
