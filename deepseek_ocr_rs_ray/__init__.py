"""deepseek_ocr_rs_ray — a Ray-Data-native main-content extraction engine.

A from-scratch re-expression of the data-processing semantics of
TimmyOVO/deepseek-ocr.rs (see /root/reference and SURVEY.md) on top of
``ray.data.Dataset``:

- ``read_parquet`` over Common-Crawl-style page tables
  ``(url, warc_ts, html, text, lang)``;
- a zero-copy Arrow ``map_batches`` stage doing DOM parsing with
  text-density / link-density boilerplate stripping;
- a rasterize/tile stage (global view + dynamic tiling, exact
  fixed-point bicubic per the reference's Pillow-identical resampler);
- a stateful actor-pool OCR-decode fallback (greedy decode with
  repetition penalty, n-gram ban, argmax first-index tie-break);
- byte-identical extracted text per url vs. a single-process oracle,
  at any parallelism / partitioning;
- resumable partitioned Parquet output with per-partition lineage
  manifests and stage metrics.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
