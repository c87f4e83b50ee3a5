"""Driver-contract gate: every queries() entry with an oracle_sql() entry is
value-compared against DuckDB at sf0.001 (the driver itself runs sf0.01; this
keeps the suite fast while exercising identical code paths)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def test_every_query_has_callable():
    assert len(QUERIES) >= 20
    missing_oracle = set(QUERIES) - set(ORACLES)
    # only genuinely non-SQL-expressible ops may omit the oracle
    assert missing_oracle == {"extract_pipeline", "extract_dehyphenated"}, missing_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = ddf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()), check_like=True)
