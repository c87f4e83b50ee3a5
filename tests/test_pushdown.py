"""Scan-level plan assertions: predicate pushdown and column pruning.

At 100 TB the difference between "filter after a full-column scan" and
"filter AT the parquet scan over only the referenced columns" is the whole
I/O budget. These tests pin both properties on representative queries so a
refactor that silently breaks them (e.g. wrapping the filter in an opaque
UDF, or selecting * before the filter) fails CI:

- PushedFilters at the FileScan carries the query predicates (parquet
  row-group stats then skip non-matching groups);
- ReadSchema contains ONLY the referenced columns (never the full table);
- the extraction path's documents scan never reads columns the span
  pipeline doesn't use.
"""

from pdfextract_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [l for l in plan.splitlines() if "FileScan" in l or "PushedFilters" in l or "ReadSchema" in l], plan


def test_filter_pushdown_reaches_parquet_scan(spark):
    # plan strings truncate scan metadata at 100 chars by default, which
    # would hide the tail of the PushedFilters list
    saved = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try:
        df = q.q_filter_high_value(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", saved)
    # both predicates pushed to the scan
    assert "PushedFilters:" in plan, plan[:2000]
    pushed = plan.split("PushedFilters:", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(l_discount" in pushed, pushed
    assert "GreaterThan(l_quantity" in pushed, pushed


def test_column_pruning_reads_only_referenced_columns(spark):
    df = q.q_filter_high_value(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema:" in plan
    schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    for col in ("l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "l_quantity"):
        assert col in schema, (col, schema)
    # lineitem has 16 columns; the scan must NOT read the unreferenced ones
    for col in ("l_comment", "l_shipmode", "l_returnflag", "l_tax"):
        assert col not in schema, (col, schema)


def test_extraction_scan_prunes_documents_columns(spark):
    df = q.q_extract_pipeline(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans
    # the span pipeline needs doc_id/text (+ lang/source ride the adapter);
    # n_chars is derivable and must not be scanned
    assert all("n_chars" not in l for l in scans), scans
