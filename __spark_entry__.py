"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full extraction pipeline over the sf0.001 documents
               table adapted to the canonical interleaved shape.
queries()    — per-operator queries (SURVEY.md §2 coverage), each taking
               (spark, sf_dir) and returning a DataFrame.
oracle_sql() — DuckDB-equivalent SQL per query. The full layout pipeline is
               not SQL-expressible, so its entries read the precomputed
               Python-oracle span fixture for the active sf (fixtures/,
               tools/gen_expected_spans.py) and fall back to the rows-only
               check when no fixture exists; the deep gate is
               tests/test_pipeline_equality.py + tests/test_engine_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

from pdfextract_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_extract_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
