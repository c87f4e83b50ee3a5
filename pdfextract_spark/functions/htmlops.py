"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The target contract (BASELINE.json `north_rule`) names "HTML boilerplate
strip … DOM heuristics" as part of the main-content extraction pipeline
alongside the PDF/layout parse. The reference repo has no HTML path (it is
PDF-only), so there is no reference file to cite; the algorithm here is the
published shallow-text-features approach — Kohlschütter et al., WSDM 2010
("Boilerplate Detection using Shallow Text Features", the boilerpipe
NumWordsRulesClassifier family) combined with Readability-style
unlikely-candidate DOM priors:

1. drop non-content subtrees outright (`script/style/noscript/template/
   head/svg`),
2. prior-strip subtrees whose tag (`nav/header/footer/aside`) or class/id
   tokens (`cookie`, `comment`, `share`, `related`, …) mark chrome,
3. segment what remains into leaf text blocks (maximal inline runs inside
   block-level elements) carrying word count + anchor-text link density,
4. classify each block: content iff link_density <= 1/3 AND (n_words >= 8
   OR the previous kept block has > 4 words — the boilerpipe sequential
   rescue that keeps short trailing paragraphs of a long article).

Scale shape: the extractor is ONE narrow `mapInPandas` (Arrow-batched,
per-document Python exactly like the layout engine — never per-row Spark
UDFs), no shuffle; the same auto fan-out as `operators/extract.py` spreads
a small scan across cores and is a no-op when the scan already has >= cores
splits.

Correctness gate: the input tables carry plain text (no HTML), so the
corpus side synthesizes a deterministic boilerplate-laden page per document
with NATIVE Columns only — nav/header/cookie-banner/sidebar/comments/footer
chrome around the document's words chunked into <p> blocks, with
md5(doc_id)-derived variability — and the DuckDB oracle rebuilds the same
bytes independently (`sql_synthesize_html`, same technique as the media
header bands in multimodal.py). Stripping that page must recover the
original `text` column EXACTLY (`sql_main_content` is the identity), and
the per-document block census must match the closed-form count
(`sql_block_stats`). The sharebar div carries no class/id hint on purpose:
only the link-density rule can kill it, so the density classifier is
load-bearing in the hash gate, not just the DOM priors.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, List, NamedTuple, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..scanutil import estimate_scan_splits

# ---------------------------------------------------------------- classifier

LINK_DENSITY_MAX = 1.0 / 3.0
MIN_CONTENT_WORDS = 8
PREV_RESCUE_WORDS = 4

# Readability-style unlikely-candidate vocabulary, matched against the
# [-_ ]-split tokens of class + id (token match, not substring: a class
# "navigate-content" must not be stripped by "nav").
BOILER_TOKENS = frozenset(
    "nav menu navbar breadcrumb breadcrumbs header footer aside sidebar "
    "banner cookie consent comment comments share social related promo "
    "sponsor sponsored ad ads advert advertisement pagination pager "
    "widget masthead".split()
)

BLOCK_TAGS = frozenset(
    "html body main article section div p ul ol li h1 h2 h3 h4 h5 h6 "
    "table thead tbody tr td th blockquote pre nav header footer aside "
    "figure figcaption form fieldset hr dl dt dd".split()
)
SKIP_TAGS = frozenset("script style noscript template head title svg".split())
PRIOR_TAGS = frozenset("nav header footer aside".split())

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


class Block(NamedTuple):
    text: str  # whitespace-normalized
    n_words: int
    link_density: float
    prior: Optional[str]  # strip reason from DOM priors, None = candidate
    is_content: bool  # density verdict (always False when prior is set)


def _attr_reason(attrs) -> Optional[str]:
    for name, value in attrs:
        if name in ("class", "id") and value:
            for tok in _TOKEN_SPLIT.split(value.lower()):
                if tok in BOILER_TOKENS:
                    return f"{name}:{tok}"
    return None


class _BlockParser(HTMLParser):
    """Streams leaf text blocks off stdlib HTMLParser (no lxml/bs4 in the
    container; the stdlib parser is tolerant of unclosed tags, which is the
    web reality). A block flushes at every block-level tag boundary."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[dict] = []
        self._stack: List[str] = []  # open block-context prior reasons
        self._skip = 0  # depth inside SKIP_TAGS subtrees
        self._a_depth = 0
        self._pieces: List[str] = []
        self._linked = 0
        self._chars = 0
        self._prior_stack: List[Optional[str]] = [None]
        self._inline_skip: List[str] = []  # chrome-classed inline subtrees

    # -- block assembly
    def _flush(self) -> None:
        raw = "".join(self._pieces)
        self._pieces.clear()
        linked, chars = self._linked, self._chars
        self._linked = self._chars = 0
        text = " ".join(raw.split())
        if not text:
            return
        total = max(1, len(raw.strip()))
        self.blocks.append(
            {
                "text": text,
                "n_words": len(text.split()),
                "link_density": min(1.0, linked / total),
                "prior": self._prior_stack[-1],
            }
        )

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            # a block boundary implicitly closes any dangling inline context
            self._inline_skip.clear()
            reason = self._prior_stack[-1]
            if reason is None:
                if tag in PRIOR_TAGS:
                    reason = f"tag:{tag}"
                else:
                    reason = _attr_reason(attrs)
            self._prior_stack.append(reason)
            self._stack.append(tag)
        elif self._inline_skip or _attr_reason(attrs) is not None:
            # chrome-classed INLINE element (e.g. <span class="share">):
            # Readability removes the unlikely subtree, so its text never
            # reaches the block — suppress until the matching end tag (or
            # the next block boundary for unbalanced markup).
            self._inline_skip.append(tag)

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if self._inline_skip and tag not in BLOCK_TAGS:
            if tag in self._inline_skip:
                while self._inline_skip:
                    if self._inline_skip.pop() == tag:
                        break
            return
        if tag in BLOCK_TAGS and tag in self._stack:
            self._flush()
            self._inline_skip.clear()
            # pop to the matching open tag (tolerates unclosed children)
            while self._stack:
                popped = self._stack.pop()
                self._prior_stack.pop()
                if popped == tag:
                    break

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_data(self, data):
        if self._skip or self._inline_skip or not data:
            return
        self._pieces.append(data)
        self._chars += len(data)
        if self._a_depth:
            self._linked += len(data)

    def close(self):
        super().close()
        self._flush()


def classify_blocks(html: str) -> List[Block]:
    """Parse + DOM priors + density classification, in document order."""
    p = _BlockParser()
    p.feed(html or "")
    p.close()
    out: List[Block] = []
    prev_kept_words = 0
    for b in p.blocks:
        if b["prior"] is not None:
            out.append(Block(b["text"], b["n_words"], b["link_density"], b["prior"], False))
            continue
        dense_ok = b["link_density"] <= LINK_DENSITY_MAX
        keep = dense_ok and (
            b["n_words"] >= MIN_CONTENT_WORDS or prev_kept_words > PREV_RESCUE_WORDS
        )
        if keep:
            prev_kept_words = b["n_words"]
        out.append(Block(b["text"], b["n_words"], b["link_density"], None, keep))
    return out


def extract_main_content(html: str) -> str:
    return " ".join(b.text for b in classify_blocks(html) if b.is_content)


# ------------------------------------------------------------- Spark surface

def _fan_out(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    n_splits = estimate_scan_splits(df)
    if 0 < n_splits < target:
        df = df.repartition(target)
    return df


def strip_boilerplate(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, html) -> (doc_id, main_text). Narrow Arrow-batched map."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "main_text": [extract_main_content(h) for h in pdf[html_col]],
                }
            )

    return _fan_out(df).mapInPandas(run, schema="doc_id long, main_text string")


def block_stats(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, html) -> per-document block census from the REAL DOM walk:
    total leaf blocks, prior-stripped, density-rejected, kept, kept words."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = {k: [] for k in ("doc_id", "n_blocks", "n_prior_stripped",
                                    "n_density_boiler", "n_content", "content_words")}
            for doc_id, h in zip(pdf["doc_id"], pdf[html_col]):
                blocks = classify_blocks(h)
                rows["doc_id"].append(doc_id)
                rows["n_blocks"].append(len(blocks))
                rows["n_prior_stripped"].append(sum(1 for b in blocks if b.prior is not None))
                rows["n_density_boiler"].append(
                    sum(1 for b in blocks if b.prior is None and not b.is_content)
                )
                rows["n_content"].append(sum(1 for b in blocks if b.is_content))
                rows["content_words"].append(sum(b.n_words for b in blocks if b.is_content))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "n_blocks": pd.Series(rows["n_blocks"], dtype="int32"),
                    "n_prior_stripped": pd.Series(rows["n_prior_stripped"], dtype="int32"),
                    "n_density_boiler": pd.Series(rows["n_density_boiler"], dtype="int32"),
                    "n_content": pd.Series(rows["n_content"], dtype="int32"),
                    "content_words": pd.Series(rows["content_words"], dtype="int32"),
                }
            )

    return _fan_out(df).mapInPandas(
        run,
        schema="doc_id long, n_blocks int, n_prior_stripped int, "
        "n_density_boiler int, n_content int, content_words int",
    )


# ------------------------------------------------- deterministic page corpus

PARA_WORDS = 20  # <p> chunk size; tail paragraphs ride the prev-words rescue

_COOKIE = (
    '<div class="cookie-banner">we use cookies to improve your experience '
    '<a href="/accept">accept</a></div>'
)
_SHAREBAR = (
    '<div><a href="/share/t">share on twitter</a> '
    '<a href="/share/f">share on facebook</a> '
    '<a href="/share/e">share by email</a></div>'
)


def synthesize_html(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, html): deterministic chrome-laden
    page, native Columns end to end (hash-gated against sql_synthesize_html).
    Chrome variability comes from md5(doc_id) nibbles so the oracle can
    re-derive it: k in [3,6] nav links, j in [2,4] sidebar items, m in [0,2]
    comments."""
    d = F.col("doc_id").cast("string")
    md5 = F.md5(d)
    k = (F.conv(F.substring(md5, 1, 4), 16, 10).cast("long") % 4 + 3).cast("int")
    j = (F.conv(F.substring(md5, 5, 4), 16, 10).cast("long") % 3 + 2).cast("int")
    m = (F.conv(F.substring(md5, 9, 4), 16, 10).cast("long") % 3).cast("int")
    ws = F.split(F.col("text"), " ")
    nc = F.ceil(F.size(ws) / F.lit(float(PARA_WORDS))).cast("int")

    nav = F.concat(
        F.lit('<nav class="site-nav">'),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat(
                    F.lit('<a href="/s'), i.cast("string"),
                    F.lit('">section '), i.cast("string"), F.lit("</a>"),
                ),
            ),
            "",
        ),
        F.lit("</nav>"),
    )
    paras = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nc - 1),
            lambda i: F.concat(
                F.lit("<p>"),
                F.array_join(
                    F.slice(ws, i * F.lit(PARA_WORDS) + 1, F.lit(PARA_WORDS)), " "
                ),
                F.lit("</p>"),
            ),
        ),
        "",
    )
    aside = F.concat(
        F.lit('<aside class="related"><ul>'),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), j),
                lambda i: F.concat(
                    F.lit('<li><a href="/r'), i.cast("string"),
                    F.lit('">related item '), i.cast("string"), F.lit("</a></li>"),
                ),
            ),
            "",
        ),
        F.lit("</ul></aside>"),
    )
    comments = F.concat(
        F.lit('<div class="comments">'),
        F.array_join(
            F.transform(
                # slice(seq(1,2), 1, m): length-m prefix — sequence(1, m)
                # would generate DESCENDING [1,0] when m = 0
                F.slice(F.sequence(F.lit(1), F.lit(2)), F.lit(1), m),
                lambda i: F.concat(
                    F.lit('<p class="comment">nice article number '),
                    i.cast("string"), F.lit("</p>"),
                ),
            ),
            "",
        ),
        F.lit("</div>"),
    )
    html = F.concat(
        F.lit("<html><head><title>doc "), d,
        F.lit("</title><script>var x=1;</script><style>p{margin:0}</style></head><body>"),
        nav,
        F.lit("<header><h1>document "), d, F.lit("</h1></header>"),
        F.lit(_COOKIE),
        F.lit("<article>"), paras, F.lit("</article>"),
        F.lit(_SHAREBAR),
        aside,
        comments,
        F.lit('<footer><a href="/terms">terms</a> <a href="/privacy">privacy</a> copyright '),
        d, F.lit("</footer>"),
        F.lit("</body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


# ----------------------------------------------------------------- SQL mirror

_SQL_HASHES = """
  SELECT doc_id, text,
    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 4 + 3 AS k,
    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),5,4))::BIGINT % 3 + 2 AS j,
    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),9,4))::BIGINT % 3 AS m,
    string_split(text, ' ') AS ws,
    CAST(ceil(len(string_split(text, ' ')) / {para}.0) AS BIGINT) AS nc
  FROM documents
""".format(para=PARA_WORDS)


def sql_synthesize_html() -> str:
    # COALESCE: DuckDB's array_to_string([]) is NULL, not '' (m = 0 docs)
    return f"""
WITH h AS ({_SQL_HASHES})
SELECT doc_id,
  '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
  || '</title><script>var x=1;</script><style>p{{margin:0}}</style></head><body>'
  || '<nav class="site-nav">'
  || COALESCE(array_to_string(list_transform(range(1, k+1),
       i -> '<a href="/s'||i||'">section '||i||'</a>'), ''), '')
  || '</nav>'
  || '<header><h1>document ' || CAST(doc_id AS VARCHAR) || '</h1></header>'
  || '{_COOKIE.replace("'", "''")}'
  || '<article>'
  || COALESCE(array_to_string(list_transform(range(nc), i ->
       '<p>' || array_to_string(ws[CAST(i*{PARA_WORDS}+1 AS BIGINT):CAST(i*{PARA_WORDS}+{PARA_WORDS} AS BIGINT)], ' ')
       || '</p>'), ''), '')
  || '</article>'
  || '{_SHAREBAR.replace("'", "''")}'
  || '<aside class="related"><ul>'
  || COALESCE(array_to_string(list_transform(range(1, j+1),
       i -> '<li><a href="/r'||i||'">related item '||i||'</a></li>'), ''), '')
  || '</ul></aside>'
  || '<div class="comments">'
  || COALESCE(array_to_string(list_transform(range(1, m+1),
       i -> '<p class="comment">nice article number '||i||'</p>'), ''), '')
  || '</div>'
  || '<footer><a href="/terms">terms</a> <a href="/privacy">privacy</a> copyright '
  || CAST(doc_id AS VARCHAR) || '</footer></body></html>' AS html
FROM h
"""


def sql_main_content() -> str:
    """The identity IS the oracle: the extractor must recover the document's
    exact text from the chrome-laden page (hash equality, not similarity)."""
    return "SELECT doc_id, text AS main_text FROM documents"


def sql_block_stats() -> str:
    """Closed-form census of the synthesized page: nav(1) + h1(1) +
    cookie(1) + nc paragraphs + sharebar(1) + j sidebar items + m comments +
    footer(1); priors take everything but the paragraphs and the sharebar,
    density takes the sharebar, content = the paragraphs = all words."""
    return f"""
WITH h AS ({_SQL_HASHES})
SELECT doc_id,
  CAST(5 + nc + j + m AS INT) AS n_blocks,
  CAST(4 + j + m AS INT) AS n_prior_stripped,
  CAST(1 AS INT) AS n_density_boiler,
  CAST(nc AS INT) AS n_content,
  CAST(len(ws) AS INT) AS content_words
FROM h
"""


# --------------------------------------------------------- metadata extract
def html_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, title, h1, n_links, n_paragraphs, n_comments) — the page
    metadata relation an indexer extracts before any content processing:
    document title and headline plus structural counts (total anchors,
    article paragraphs, comment paragraphs). Pure regexp Column algebra
    over the synthesized page: ZERO shuffle, zero Python — the 100 TB
    shape is a narrow map over the crawl scan, same class as
    web_pii_redact."""
    html = F.col("html")
    return synthesize_html(docs).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.regexp_extract(html, r"<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(html, r"<h1>([^<]*)</h1>", 1).alias("h1"),
        F.regexp_count(html, F.lit(r"<a href=")).cast("long").alias("n_links"),
        (
            F.regexp_count(html, F.lit(r"<p>"))
        )
        .cast("long")
        .alias("n_paragraphs"),
        F.regexp_count(html, F.lit(r'<p class="comment">'))
        .cast("long")
        .alias("n_comments"),
    )


def sql_html_meta() -> str:
    """DuckDB mirror of html_meta (shares the synthesis SQL)."""
    return f"""
WITH pages AS ({sql_synthesize_html()})
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       regexp_extract(html, '<h1>([^<]*)</h1>', 1) AS h1,
       CAST(len(regexp_extract_all(html, '<a href=')) AS BIGINT) AS n_links,
       CAST(len(regexp_extract_all(html, '<p>')) AS BIGINT) AS n_paragraphs,
       CAST(len(regexp_extract_all(html, '<p class="comment">')) AS BIGINT)
         AS n_comments
FROM pages
"""
