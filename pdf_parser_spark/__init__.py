"""pdf_parser_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the data-processing capabilities of the
reference repo ``zhouxinlun/pdf_parser`` (a single-node Flask PDF service),
re-expressed as batch DataFrame transforms + vectorized pandas/Arrow UDF
kernels over a table of conversation turns
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:

- ``kernels/``   pure pandas/numpy kernels (no Spark imports) — the single
  implementation used both by the single-node golden runner (pytest) and by
  the Spark UDF wrappers (SURVEY.md §7.1 shared-kernel rule).
- ``pipeline.py`` the Spark extraction pipeline (classify → extract →
  repartitionByRange → window reassembly).
- ``lineage.py`` per-partition lineage + idempotent checkpoint resume.
- ``operators/`` DataFrame-level operators: NMS, dedup (exact/minhash/
  simhash/jaccard), similarity search, text analysis.
- ``datagen.py`` deterministic synthetic transcripts generator.
"""

__version__ = "0.1.0"
