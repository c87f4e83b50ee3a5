"""Streaming URL dedup: first-seen-wins per canonical URL over an unbounded
frontier stream.

A crawl frontier dedups continuously — the batch window-min keeper
(functions/webclean.py::url_dedup_params) cannot see across micro-batches, so
the streaming form keys the exact-dedup state kernel (dedup_stream) on the
CANONICAL URL: param-level canonicalization (tracking params dropped anywhere
in the query, survivors sorted, scheme/www/fragment stripped) happens
stateless in-stream, then one state record per distinct canonical admits only
the first document that carried it. State is partitioned by the canonical key
— the same hash layout the batch keeper shuffles on — and scales with
distinct-URL volume, not frontier volume; a positive TTL bounds it to the
recrawl window.

Keeper rule difference vs batch, stated explicitly (same contract as
streaming_dedup): batch picks the global min doc_id per canonical; the stream
picks the min doc_id of the FIRST micro-batch that carried the canonical,
then drops all later arrivals. The per-batch min uses the SAME ordering as
the batch keeper — numeric when every doc_id parses as an integer (so '2'
beats '10', matching webclean.url_dedup_params' min(cast(doc_id as long))),
lexicographic otherwise — so on a single batch the two agree exactly; across
batches the stream is first-seen-wins by arrival order."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..functions.webclean import _canonical_url_params
from .dedup_stream import _SEEN_SCHEMA, _make_first_seen

URL_DEDUP_SCHEMA = "canonical string, keeper_doc_id string"


def streaming_url_dedup(urls: DataFrame, ttl_minutes: int = 0) -> DataFrame:
    """urls stream (doc_id, url) -> (canonical, keeper_doc_id): one output
    row per NEW canonical URL, none for recrawls/param-shuffled variants.

    ttl_minutes=0 keeps state forever (exact frontier dedup); a positive TTL
    expires canonicals idle longer than the TTL, bounding state to the
    recrawl window at the cost of re-admitting a URL recrawled after it."""
    keyed = urls.select(
        _canonical_url_params(F.col("url")).alias("canonical"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    ttl_ms = int(ttl_minutes * 60_000)
    return keyed.groupBy("canonical").applyInPandasWithState(
        _make_first_seen(ttl_ms, key_col="canonical"),
        outputStructType=URL_DEDUP_SCHEMA,
        stateStructType=_SEEN_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
