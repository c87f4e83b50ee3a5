"""pdfextract_spark — a PySpark-native layout-aware extraction engine.

A from-scratch reimplementation of the capabilities of oyvindberg/PDFExtract
(reference surveyed in SURVEY.md) expressed Spark-first:

- input: a table of interleaved text+media documents
  ``(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)``
- output: per-document ordered span sequences ``(doc_id, seq, kind, text,
  media_ref, offset)`` under span-sequence equality
- all per-document computation runs as vectorized pandas/Arrow UDFs over
  DataFrames (``applyInPandas``); cross-row relational shape uses the native
  Column API so Catalyst optimizes it.

Subpackages
-----------
oracle/     single-threaded, float32-faithful Python reference implementation
            of the reference's operator semantics (the correctness oracle)
operators/  Spark-side operators: extraction UDFs, dedup, similarity, text
sources/    readers + partitioning/salting for the document table
plans/      checkpoint/lineage/metrics & resume machinery
streaming/  structured-streaming wrappers (the reference is batch-only)
"""

__version__ = "0.1.0"
