"""Link health: totals agree with the raw edge relation; sinks/sources
recomputed directly."""

import pytest

import __spark_entry__ as entry
from pdfextract_spark.functions import graphops

SF_DIR = "/root/testdata/sf0.001"


def test_recompute_from_edges(spark):
    row = entry.queries()["graph_link_health"](spark, SF_DIR).toPandas().iloc[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = graphops.host_edges(docs).toPandas()
    srcs, dsts = set(edges.src), set(edges.dst)
    hosts = srcs | dsts
    sinks = dsts - srcs
    sources = srcs - dsts
    assert int(row.n_hosts) == len(hosts)
    assert int(row.n_edges) == len(edges)
    assert int(row.n_sinks) == len(sinks)
    assert int(row.n_sources) == len(sources)
    assert int(row.sink_pm) == (1000 * len(sinks)) // len(hosts)
