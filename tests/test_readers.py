"""Multi-format document sources: JSONL and CSV corpora must load to the
exact rows the canonical parquet yields (format-blind downstream)."""

import duckdb
import pytest

from pdfextract_spark.sources.readers import detect_format, read_documents

PARQUET = "/root/testdata/sf0.001/documents.parquet"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def exports(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    con = duckdb.connect()
    con.sql(f"COPY (SELECT * FROM '{PARQUET}') TO '{d}/docs.jsonl'")
    con.sql(f"COPY (SELECT * FROM '{PARQUET}') TO '{d}/docs.csv' (HEADER)")
    return d


def test_orc_matches_parquet(spark, tmp_path):
    base = read_documents(spark, PARQUET)
    orc_path = str(tmp_path / "docs.orc")
    base.write.orc(orc_path)
    assert rows(read_documents(spark, orc_path)) == rows(base)


def test_detect_format():
    assert detect_format("a/b.parquet") == "parquet"
    assert detect_format("a/b.orc") == "orc"
    assert detect_format("a/b.jsonl") == "json"
    assert detect_format("a/b.ndjson") == "json"
    assert detect_format("a/b.csv") == "csv"
    assert detect_format("part-dir.parquet/") == "parquet"
    with pytest.raises(ValueError):
        detect_format("a/b.xml")


def test_jsonl_and_csv_match_parquet(spark, exports):
    base = rows(read_documents(spark, PARQUET))
    assert len(base) == 500
    assert rows(read_documents(spark, f"{exports}/docs.jsonl")) == base
    assert rows(read_documents(spark, f"{exports}/docs.csv")) == base


def test_explicit_format_overrides_extension(spark, exports):
    got = read_documents(spark, f"{exports}/docs.jsonl", fmt="json")
    assert got.count() == 500


def test_optional_columns_filled_required_enforced(spark, tmp_path):
    con = duckdb.connect()
    slim = str(tmp_path / "slim.parquet")
    con.sql(f"COPY (SELECT doc_id, text FROM '{PARQUET}') TO '{slim}' (FORMAT PARQUET)")
    df = read_documents(spark, slim)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.filter("lang IS NOT NULL").count() == 0

    bad = str(tmp_path / "bad.parquet")
    con.sql(f"COPY (SELECT doc_id FROM '{PARQUET}') TO '{bad}' (FORMAT PARQUET)")
    with pytest.raises(ValueError, match="required"):
        read_documents(spark, bad)
