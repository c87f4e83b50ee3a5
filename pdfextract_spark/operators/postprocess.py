"""Post-extraction span transforms (native DataFrame, no Python).

- dehyphenate: the TEI sink's line-merge (S16; reference TEIOutput.java:
  225-243 — a line whose text ends with '-' absorbs the following line,
  dropping the hyphen). Expressed as a window over the per-document span
  order: lead() pulls the next text span, a merged row keeps the first
  span's seq, and the absorbed row is filtered out. One shuffle on doc_id,
  whole-stage codegen throughout.

Consecutive hyphenated lines chain across multiple rows in the reference's
loop; the window form resolves one level per pass, so `dehyphenate` iterates
until fixpoint (bounded by the longest hyphen chain; cfg caps it at 4 —
chains longer than that do not occur in hyphenated prose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TEXT_KINDS = ("text", "title", "abstract", "footnote", "formula", "heading1", "heading2", "heading3")
MAX_CHAIN = 4


def _merge_once(spans: DataFrame) -> DataFrame:
    """One level of hyphen merging: only chain HEADS (spans whose predecessor
    does not itself end with '-') absorb their successor — longer chains
    resolve on later passes without ever dropping unconsumed content."""
    w = Window.partitionBy("doc_id").orderBy("seq")
    is_text = F.col("kind").isin(*TEXT_KINDS)
    nxt_text = F.lead("text").over(w)
    nxt_is_text = F.lead("kind").over(w).isin(*TEXT_KINDS)

    prv_hyph = (
        F.lag("kind").over(w).isin(*TEXT_KINDS) & F.lag("text").over(w).endswith("-")
    )
    prv2_hyph = (
        F.lag("kind", 2).over(w).isin(*TEXT_KINDS)
        & F.lag("text", 2).over(w).endswith("-")
    )

    is_head = (
        is_text
        & F.col("text").endswith("-")
        & nxt_is_text
        & ~F.coalesce(prv_hyph, F.lit(False))
    )
    # absorbed by a head: predecessor is a hyphen tail AND is itself a head
    absorbed = (
        is_text
        & F.coalesce(prv_hyph, F.lit(False))
        & ~F.coalesce(prv2_hyph, F.lit(False))
    )

    merged_text = F.when(
        is_head,
        F.concat(F.expr("substring(text, 1, length(text) - 1)"), nxt_text),
    ).otherwise(F.col("text"))

    return (
        spans.withColumn("_text", merged_text)
        .withColumn("_drop", absorbed)
        .filter(~F.col("_drop"))
        .select(
            "doc_id",
            "seq",
            "kind",
            F.col("_text").alias("text"),
            "media_ref",
            "offset",
        )
    )


def dehyphenate(spans: DataFrame, max_chain: int = MAX_CHAIN) -> DataFrame:
    """Merge trailing-hyphen spans with their successors (per doc, in seq
    order); seq values keep their original relative order (gaps allowed)."""
    out = spans
    for _ in range(max_chain):
        out = _merge_once(out)
    return out


def sql_dehyphenate(spans_sql: str, max_chain: int = MAX_CHAIN) -> str:
    """DuckDB mirror of dehyphenate: the same head/absorbed window logic,
    nested once per merge level."""
    kinds = "(" + ", ".join(f"'{k}'" for k in TEXT_KINDS) + ")"
    inner = f"({spans_sql})"
    for _ in range(max_chain):
        inner = f"""(
SELECT doc_id, seq, kind,
       CASE WHEN is_head THEN substr(text, 1, length(text) - 1) || nxt
            ELSE text END AS text,
       media_ref, "offset"
FROM (
  SELECT *,
         (kind IN {kinds}) AND ends_with(text, '-')
           AND coalesce(lead(kind) OVER w IN {kinds}, false)
           AND NOT coalesce((lag(kind) OVER w IN {kinds})
                            AND ends_with(lag(text) OVER w, '-'), false)
           AS is_head,
         (kind IN {kinds})
           AND coalesce((lag(kind) OVER w IN {kinds})
                        AND ends_with(lag(text) OVER w, '-'), false)
           AND NOT coalesce((lag(kind, 2) OVER w IN {kinds})
                            AND ends_with(lag(text, 2) OVER w, '-'), false)
           AS absorbed,
         lead(text) OVER w AS nxt
  FROM {inner}
  WINDOW w AS (PARTITION BY doc_id ORDER BY seq)
)
WHERE NOT absorbed
)"""
    return f"SELECT doc_id, seq, kind, text, media_ref, \"offset\" FROM {inner}"
