"""HTML boilerplate strip (north-rule operator): DOM-prior + link-density
block classification. Hand-written pages pin each heuristic individually;
the corpus round-trip pins exact recovery of documents.text from the
synthesized chrome-laden page (the same equality the driver gate hashes via
sql_main_content's identity oracle)."""

import duckdb
import pytest

from pdfextract_spark.functions.htmlops import (
    classify_blocks,
    extract_main_content,
    sql_block_stats,
    sql_synthesize_html,
)

LONG_P = "<p>this paragraph carries plenty of honest prose words to keep</p>"


def kept(html):
    return [b.text for b in classify_blocks(html) if b.is_content]


def test_density_kills_link_heavy_block_without_class_hint():
    html = (
        '<body><div><a href="/1">one link</a> <a href="/2">two link</a> '
        f'<a href="/3">three link</a></div>{LONG_P}</body>'
    )
    blocks = classify_blocks(html)
    assert blocks[0].prior is None and not blocks[0].is_content
    assert blocks[0].link_density > 1 / 3
    assert kept(html) == [LONG_P[3:-4]]


def test_prior_tags_strip_even_plain_long_text():
    # a footer of long link-free prose passes the density rule; only the
    # DOM prior (tag:footer) removes it
    html = (
        f"<body>{LONG_P}<footer>this long footer text would otherwise look "
        "exactly like honest content prose to the density rule</footer></body>"
    )
    blocks = classify_blocks(html)
    assert blocks[1].prior == "tag:footer" and not blocks[1].is_content
    assert len(kept(html)) == 1


def test_class_token_priors():
    html = (
        '<body><div class="cookie-banner">we use cookies <a href="/a">ok</a></div>'
        f"{LONG_P}"
        '<div class="comments"><p class="comment">nice article indeed</p></div></body>'
    )
    blocks = classify_blocks(html)
    reasons = [b.prior for b in blocks]
    assert reasons[0] == "class:cookie"
    assert reasons[1] is None
    assert reasons[2] is not None  # inherited from the comments container
    assert len(kept(html)) == 1


def test_class_match_is_token_not_substring():
    html = f'<body><div class="navigate-content">{LONG_P[3:-4]}</div></body>'
    blocks = classify_blocks(html)
    assert blocks[0].prior is None and blocks[0].is_content


def test_inline_chrome_subtree_suppressed():
    html = (
        "<body><p>honest words before the widget "
        '<span class="share">share on socialsite</span> '
        "and plenty of honest words after it too</p></body>"
    )
    (block,) = classify_blocks(html)
    assert "share" not in block.text
    assert block.text.startswith("honest words before the widget and plenty")
    assert block.is_content


def test_script_style_head_title_skipped():
    html = (
        "<html><head><title>page title words</title><style>p{}</style></head>"
        f"<body><script>var words = 'not content';</script>{LONG_P}</body></html>"
    )
    assert kept(html) == [LONG_P[3:-4]]


def test_entities_unescaped():
    html = "<body><p>fish &amp; chips &lt;tag&gt; taste plenty good together always</p></body>"
    assert kept(html) == ["fish & chips <tag> taste plenty good together always"]


def test_unclosed_tags_tolerated():
    html = f"<body><div>{LONG_P[3:-4]}<p>short tail bit</body>"
    texts = kept(html)
    assert texts[0] == LONG_P[3:-4]
    # the 3-word tail rides the prev-kept-words rescue
    assert texts[1] == "short tail bit"


def test_short_block_without_rescue_is_dropped():
    html = "<body><p>tiny words only</p></body>"
    assert kept(html) == []


def test_empty_and_whitespace_pages():
    assert extract_main_content("") == ""
    assert extract_main_content("<body><div>   </div></body>") == ""


@pytest.mark.parametrize("sf", ["0.001"])
def test_corpus_roundtrip_exact(sf):
    """Stripping the synthesized page recovers documents.text EXACTLY for
    every document, and the real DOM walk's block census matches the
    closed-form oracle — pure-Python side of the driver hash gate."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{sf}/documents.parquet')"
    )
    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    stats = {r[0]: r[1:] for r in con.execute(sql_block_stats()).fetchall()}
    n_density_checked = 0
    for doc_id, html in con.execute(sql_synthesize_html()).fetchall():
        assert extract_main_content(html) == texts[doc_id], doc_id
        blocks = classify_blocks(html)
        got = (
            len(blocks),
            sum(1 for b in blocks if b.prior is not None),
            sum(1 for b in blocks if b.prior is None and not b.is_content),
            sum(1 for b in blocks if b.is_content),
            sum(b.n_words for b in blocks if b.is_content),
        )
        assert got == stats[doc_id], doc_id
        n_density_checked += got[2]
    # the density rule is load-bearing: every page has one class-less
    # link-heavy block only it can reject
    assert n_density_checked == len(texts)
