"""Bloom FPR audit: no false negatives (planted members always hit),
python recompute of the realized FPR, load consistency."""

import hashlib

import pytest

import __spark_entry__ as entry
from pdfextract_spark.functions.sketches import BLOOM_K, BLOOM_M

SF_DIR = "/root/testdata/sf0.001"


def _h(tag, s, width=8):
    return int(hashlib.md5(f"{tag}|{s}".encode()).hexdigest()[:width], 16)


def test_python_recompute(spark):
    row = entry.queries()["sketch_bloom_fpr"](spark, SF_DIR).toPandas().iloc[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    half = docs.doc_id.astype(str).map(lambda d: _h("bh", d, 4) % 2 == 0)
    hist = {md5(t) for t in docs[half].text}
    bits = {_h(f"bf{j}", fp) % BLOOM_M for fp in hist for j in range(BLOOM_K)}
    plant = docs.doc_id.astype(str).map(lambda d: _h("bp", d, 4) % 8 == 0)
    probes = [md5(t) for t in docs[~half].text] + [
        md5(t) for t in docs[half & plant].text
    ]
    bloom_hits = [
        all(_h(f"bf{j}", fp) % BLOOM_M in bits for j in range(BLOOM_K))
        for fp in probes
    ]
    members = [fp in hist for fp in probes]
    # Bloom filters NEVER false-negative
    for hit, mem in zip(bloom_hits, members):
        if mem:
            assert hit
    n_fp = sum(1 for h, m in zip(bloom_hits, members) if h and not m)
    assert int(row.n_history) == len(hist)
    assert int(row.n_probes) == len(probes)
    assert int(row.bits_set) == len(bits)
    assert int(row.n_bloom_hits) == sum(bloom_hits)
    assert int(row.n_false_pos) == n_fp
    nonmem = len(probes) - sum(members)
    assert int(row.fpr_pm) == (0 if nonmem == 0 else (1000 * n_fp) // nonmem)
    assert int(row.load_pm) == (1000 * len(bits)) // BLOOM_M
