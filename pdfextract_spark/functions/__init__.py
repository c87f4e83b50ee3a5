"""Large-scale training-data operations over the documents/embeddings tables.

Each module pairs a native-DataFrame Spark implementation with a DuckDB
oracle-SQL generator whose arithmetic matches bit-for-bit where exactness
matters (integer hashing) and to fixed rounding where floats are involved.
All hot paths are JVM-side Column expressions — no Python UDFs — except the
multimodal decode stub, which is deliberately a vectorized mapInPandas to
exercise binary-column Arrow plumbing.
"""
