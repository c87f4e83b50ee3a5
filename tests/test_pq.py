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


# ------------------------------------------------------------- IVFADC search


@pytest.fixture(scope="module")
def adc(emb):
    return clustering.pq_adc_topk(emb).toPandas()


def test_pq_adc_matches_mirror(adc):
    du = _duck(clustering.sql_pq_adc_topk())
    assert len(adc) == len(du)
    assert sorted(adc.columns) == sorted(du.columns)
    assert _value_hash(adc) == _value_hash(du)


def test_pq_adc_shape(adc):
    # every query gets exactly topk ranked rows, ranks 1..topk, and the
    # query set is the bounded vec_id < PQ_N_QUERY surface
    g = adc.groupby("vec_id")["rank"].agg(["count", "min", "max"])
    assert (g["count"] == clustering.PQ_TOPK).all()
    assert (g["min"] == 1).all() and (g["max"] == clustering.PQ_TOPK).all()
    assert (adc.vec_id < clustering.PQ_N_QUERY).all()
    assert (adc.vec_id != adc.neighbor_id).all()


def test_pq_adc_lower_bound(adc, pq):
    # ADC(q, x) = sum_m LUT_q[m][code_m(x)] >= sum_m min_k LUT_q[m][k]
    # = recon_err(q): no candidate can score below the query's own
    # reconstruction error (the asymmetric-distance floor)
    err = pq.set_index("vec_id").recon_err
    assert (adc.adc_dist.values >= err.loc[adc.vec_id].values).all()


def test_pq_adc_planted_copy_rank1(spark, emb):
    # an exact copy of a query vector (same embedding, same label => same
    # cell, same codes) achieves the ADC floor, so it MUST rank first with
    # adc_dist == the query's recon_err from the storage path
    qid, copy_id = 7, 100_000
    copy = (
        emb.filter("vec_id = %d" % qid)
        .selectExpr("%d AS vec_id" % copy_id, "embedding", "label")
    )
    planted = emb.select("vec_id", "embedding", "label").unionByName(copy)
    out = clustering.pq_adc_topk(planted).toPandas()
    enc = clustering.pq_encode(planted).toPandas().set_index("vec_id")
    top1 = out[(out.vec_id == qid) & (out["rank"] == 1)].iloc[0]
    assert top1.adc_dist == enc.loc[qid].recon_err
    # the rank-1 neighbor carries the query's own code word sequence
    assert enc.loc[top1.neighbor_id].pq_code == enc.loc[qid].pq_code
