"""S16 dehyphenation (TEI line-merge analog) over extracted spans."""

import pandas as pd

from pdfextract_spark.operators.postprocess import dehyphenate


def _run(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "seq", "kind", "text", "media_ref", "offset"]
    )
    out = dehyphenate(spark.createDataFrame(pdf)).toPandas()
    return list(out.sort_values(["doc_id", "seq"])[["seq", "kind", "text"]].itertuples(index=False, name=None))


def test_simple_merge(spark):
    rows = [
        ("d", 0, "text", "hyphen-", "", 0),
        ("d", 1, "text", "ated word", "", 1),
        ("d", 2, "text", "plain", "", 2),
    ]
    assert _run(spark, rows) == [(0, "text", "hyphenated word"), (2, "text", "plain")]


def test_chain_merge(spark):
    rows = [
        ("d", 0, "text", "a-", "", 0),
        ("d", 1, "text", "b-", "", 1),
        ("d", 2, "text", "c", "", 2),
        ("d", 3, "text", "tail", "", 3),
    ]
    assert _run(spark, rows) == [(0, "text", "abc"), (3, "text", "tail")]


def test_media_breaks_merge(spark):
    rows = [
        ("d", 0, "text", "broken-", "", 0),
        ("d", 1, "media", "", "img://d/0", 1),
        ("d", 2, "text", "after", "", 2),
    ]
    assert _run(spark, rows) == [
        (0, "text", "broken-"),
        (1, "media", ""),
        (2, "text", "after"),
    ]


def test_no_content_lost(spark):
    rows = [
        ("d", i, "text", f"w{i}-" if i % 2 == 0 else f"v{i}", "", i)
        for i in range(8)
    ]
    out = _run(spark, rows)
    joined = "".join(t for _, _, t in out).replace("-", "")
    orig = "".join(r[3] for r in rows).replace("-", "")
    assert joined == orig


def _tei_loop_reference(rows):
    """Transliteration of TEIOutput.addLineToContent:229-246 applied to the
    span stream: accumulated text ending '-' absorbs the next text span
    (unbounded chains); non-text spans pass through and break chains."""
    TEXT_KINDS = ("text", "title", "abstract", "footnote", "formula",
                  "heading1", "heading2", "heading3")
    out = []
    for r in sorted(rows, key=lambda r: r[1]):
        doc_id, seq, kind, text, media_ref, offset = r
        if (
            out
            and kind in TEXT_KINDS
            and out[-1][2] in TEXT_KINDS
            and out[-1][3].endswith("-")
        ):
            prev = out.pop()
            out.append((prev[0], prev[1], prev[2], prev[3][:-1] + text,
                        prev[4], prev[5]))
        else:
            out.append(r)
    return [(s, k, t) for _, s, k, t, _, _ in out]


def test_matches_tei_loop_on_random_streams(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    all_rows = []
    for doc in range(12):
        n = int(rng.integers(1, 14))
        for i in range(n):
            kind = "media" if rng.uniform() < 0.2 else str(
                rng.choice(["text", "footnote", "heading1"]))
            if kind == "media":
                all_rows.append((f"d{doc}", i, "media", "", f"img://{doc}/{i}", i))
            else:
                t = f"w{doc}_{i}" + ("-" if rng.uniform() < 0.45 else "")
                all_rows.append((f"d{doc}", i, kind, t, "", i))
    got = _run(spark, all_rows)  # _run returns rows sorted by (doc_id, seq)
    import collections

    by_doc = collections.defaultdict(list)
    for r in all_rows:
        by_doc[r[0]].append(r)
    want = [w for doc in sorted(by_doc) for w in _tei_loop_reference(by_doc[doc])]
    assert got == want
