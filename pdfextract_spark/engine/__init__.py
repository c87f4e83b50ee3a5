"""Vectorized columnar per-document engine (the Spark-side hot path).

`oracle/` is the faithful object-graph reference implementation used by the
tests; this package computes identical results (bit-exact float32) on columnar
numpy arrays with no per-glyph object creation — the form that runs inside
Arrow batches on executors (SURVEY.md §7 "zero per-row Python").
"""

from .vectorized import extract_document_fast  # noqa: F401
