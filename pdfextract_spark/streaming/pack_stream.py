"""Streaming sequence packing: the readStream face of
packing.pack_sequences — greedy fixed-token-budget fill per pack stream
over an unbounded document stream (the batch-assembly step running
continuously behind a live ingest).

Semantics are deliberately WEAKER than the batch op and stated as such
(the quota/batch_stream honesty rule): batch pack_sequences folds each
stream in GLOBAL doc_id order — reorderable, a later doc can back-fill an
earlier sequence; a stream cannot reorder the past, so the fill here is
ARRIVAL-ORDER (numeric-doc_id ascending within a micro-batch for
determinism). The packing INVARIANTS are order-free and survive verbatim:
no sequence exceeds the budget unless a single oversized doc alone does,
offsets are the running fill, and sequences are dense per stream. The
stream key and the token cost are the batch op's own expressions
(md5 'pack|' prefix, whitespace split), so a doc's stream assignment is
bit-identical to the batch layout.

State: (seq_id, fill) — TWO longs per stream; the key space is n_streams
(the packing parallelism dial), independent of stream volume. Sequence ids
continue across micro-batches and restarts."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.packing import BUDGET, N_STREAMS

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)
OUT_SCHEMA = (
    "doc_id string, stream int, seq_id int, seq_offset int, n_tokens int"
)
_STATE_SCHEMA = "seq_id long, fill long"


def _make_pack(budget: int):
    def _pack(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seq, fill = state.get if state.exists else (0, 0)
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows)
        batch = (
            batch.assign(_num=batch["doc_id"].astype("int64"))
            .sort_values("_num")
            .reset_index(drop=True)
        )
        seqs, offs = [], []
        for n in batch["n_tokens"].to_numpy():
            if fill > 0 and fill + int(n) > budget:
                seq += 1
                fill = 0
            seqs.append(seq)
            offs.append(fill)
            fill += int(n)
        state.update((int(seq), int(fill)))
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(str),
                "stream": key[0],
                "seq_id": pd.Series(seqs, dtype="int32"),
                "seq_offset": pd.Series(offs, dtype="int32"),
                "n_tokens": batch["n_tokens"].astype("int32"),
            }
        )

    return _pack


def streaming_pack(
    documents: DataFrame,
    budget: int = BUDGET,
    n_streams: int = N_STREAMS,
) -> DataFrame:
    """documents stream (doc_id, text) -> (doc_id, stream, seq_id,
    seq_offset, n_tokens): arrival-order greedy packing with the batch
    op's stream key and token cost; (seq_id, fill) carry across
    micro-batches."""
    doc_id = F.col("doc_id").cast("string")
    h = F.md5(F.concat(F.lit("pack|"), doc_id))
    keyed = documents.select(
        doc_id.alias("doc_id"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_streams)
        .cast("int")
        .alias("stream"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        _make_pack(budget),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_pack_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    budget: int = BUDGET,
    n_streams: int = N_STREAMS,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    reader = spark.readStream.format("parquet").schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    writer = (
        streaming_pack(reader.load(input_dir), budget, n_streams)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
