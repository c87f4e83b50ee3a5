"""Per-dimension moments: numpy cross-check on the quantized domain."""

import numpy as np
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stats(spark):
    return (
        entry.queries()["embed_dim_stats"](spark, SF_DIR)
        .toPandas()
        .sort_values("dim")
    )


def test_shape(stats):
    assert list(stats.dim) == list(range(1, 65))
    assert stats.n.nunique() == 1
    assert (stats.var_micro2 >= 0).all()


def test_numpy_crosscheck(spark, stats):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").toPandas()
    q = np.floor((np.stack(emb.embedding.values).astype(np.float64) + 1.0) * 1_000_000).astype(np.int64)
    n = q.shape[0]
    assert int(stats.n.iloc[0]) == n
    for d in (0, 17, 63):
        s = int(q[:, d].sum())
        c = q[:, d] - 1_000_000
        ss = int((c.astype(object) ** 2).sum())
        sc = int(c.sum())
        assert int(stats.mean_micro.iloc[d]) == s // n
        assert int(stats.var_micro2.iloc[d]) == (n * ss - sc * sc) // (n * n)
