"""MMC4/OBELICS interleave-gate semantics on handcrafted span sequences,
plus structural invariants of the rich interleave adapter. Value-level
DuckDB parity is the parametrized oracle suite."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.multimodal import interleave_stats
from pdfextract_spark.sources.adapters import documents_to_interleaved_rich

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

LONG = "x" * 100  # clears MM_MIN_TEXT_CHARS on its own


def _t(text, off):
    return ("text", text, "", off)


def _m(ref, off):
    return ("media", "", ref, off)


def _spans(spark):
    rows = [
        # clean: t m t m t — runs of 1, media 400 per-mille, plenty of text
        ("clean", [_t(LONG, 0), _m("a", 1), _t(LONG, 2), _m("b", 3), _t(LONG, 4)]),
        # media run of 3 -> dropped by max_media_run
        ("run3", [_t(LONG, 0), _m("a", 1), _m("b", 2), _m("c", 3), _t(LONG, 4)]),
        # media-dominated: 3 media / 1 text = 750 per-mille -> dropped
        ("heavy", [_t(LONG, 0), _m("a", 1), _t(LONG, 2), _m("b", 3),
                   _m("c", 4), _t(LONG, 5), _m("d", 6), _m("e", 7), _m("f", 8)]),
        # too little grounding text -> dropped
        ("thin", [_t("short", 0), _m("a", 1)]),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


@pytest.fixture(scope="module")
def stats(spark):
    return {r["doc_id"]: r for r in interleave_stats(_spans(spark)).collect()}


def test_clean_doc_kept(stats):
    r = stats["clean"]
    assert r["keep_doc"]
    assert r["max_media_run"] == 1
    assert r["media_per_mille"] == 400
    assert r["n_text_spans"] == 3 and r["n_media_spans"] == 2


def test_media_run_gate(stats):
    r = stats["run3"]
    assert r["max_media_run"] == 3 and not r["keep_doc"]


def test_media_fraction_gate(stats):
    r = stats["heavy"]
    # 6 media / 9 spans = 666 per-mille > 500; run3 tail also fires
    assert r["media_per_mille"] == 666 and not r["keep_doc"]


def test_grounding_text_gate(stats):
    r = stats["thin"]
    assert r["n_text_chars"] == 5 and not r["keep_doc"]


def test_rich_adapter_invariants(spark):
    docs = spark.createDataFrame(
        [(str(i), " ".join(f"w{i}x{j}" for j in range(20))) for i in range(40)],
        "doc_id string, text string",
    )
    inter = documents_to_interleaved_rich(docs)
    chk = inter.select(
        "doc_id",
        F.size("spans").alias("n"),
        # offsets must be exactly 0..n-1 in order
        (
            F.transform("spans", lambda s: s["offset"])
            == F.sequence(F.lit(0), F.size("spans") - 1)
        ).alias("seq_ok"),
        # text content survives in order: join of text spans == original text
        F.array_join(
            F.filter(F.transform("spans", lambda s: s["text"]), lambda t: t != ""),
            " ",
        ).alias("rejoined"),
        # media refs are namespaced and non-empty on media spans
        F.size(
            F.filter(
                "spans",
                lambda s: (s["kind"] == "media") & ~s["media_ref"].startswith("img://"),
            )
        ).alias("bad_media"),
    ).join(docs, "doc_id")
    rows = chk.collect()
    assert all(r["seq_ok"] for r in rows)
    assert all(r["bad_media"] == 0 for r in rows)
    assert all(r["rejoined"] == r["text"] for r in rows)
    # the schedule actually inserts media somewhere in a 40-doc sample
    assert any(r["n"] > 3 for r in rows)
