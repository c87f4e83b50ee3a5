"""Single-threaded float32-faithful reference oracle.

This package is the in-repo "ground truth" implementation of the reference's
operator semantics (SURVEY.md §2). It is deliberately sequential and simple —
pytest asserts that the vectorized Spark-side kernels in
``pdfextract_spark.operators`` produce *identical* output (span-sequence
equality), and that the word-segmentation oracle reproduces the reference's
own `.spacing` corpus within its published error bound (<0.4%).
"""
