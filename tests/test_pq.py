"""Product quantization (embed_pq_encode): DuckDB mirror equality (the
driver-gate contract), Lloyd monotonicity, code-range/compression
properties, and the zero-shuffle encode plan, at sf0.001."""

import hashlib

import duckdb
import pandas as pd
import pytest

from pdfextract_spark.functions import clustering

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    return con.sql(sql).df()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def pq(emb):
    return clustering.pq_encode(emb).toPandas()


def test_pq_matches_mirror(pq):
    du = _duck(clustering.sql_pq_encode())
    assert len(pq) == len(du)
    assert sorted(pq.columns) == sorted(du.columns)
    assert _value_hash(pq) == _value_hash(du)


def test_pq_codes_well_formed(pq):
    for code in pq.pq_code:
        parts = code.split("-")
        assert len(parts) == clustering.PQ_M
        assert all(0 <= int(p) < clustering.PQ_CODES for p in parts)
    assert (pq.recon_err >= 0).all()


def test_pq_compresses(pq):
    # the whole point: far fewer distinct representations than vectors,
    # but codebooks actually used (more than one code per subspace)
    assert pq.pq_code.nunique() < len(pq)
    for m in range(clustering.PQ_M):
        assert pq.pq_code.str.split("-").str[m].nunique() > 1


def test_pq_training_reduces_error(emb):
    # Lloyd monotonicity: one codebook-update round cannot increase the
    # total quantization error vs encoding against the raw seed codebook
    # (exact int64 arithmetic -> deterministic, pinned on the fixture)
    e0 = clustering.pq_encode(emb, iters=0).toPandas().recon_err.sum()
    e1 = clustering.pq_encode(emb, iters=1).toPandas().recon_err.sum()
    assert e1 <= e0


def test_pq_encode_zero_shuffle(emb):
    # training rounds run at plan-construction time (bounded collects);
    # the ENCODE itself is a map-side Project against codebook literals
    plan = (
        clustering.pq_encode(emb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
