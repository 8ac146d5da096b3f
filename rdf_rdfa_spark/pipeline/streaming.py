"""Structured Streaming entry: the SAME extraction UDF under
readStream (SURVEY.md §2.8's stretch goal).

The reference is strictly batch; the north_rule asks for
checkpoint-resumable batch, which materialize.py provides. This module
additionally runs the extraction as an incremental pipeline: new page
files appearing under a directory are parsed exactly once
(``maxFilesPerTrigger`` bounds each micro-batch; the stream checkpoint
is the resume point). The parse itself is stateless per row, so the
mapInPandas stage transfers to streaming unchanged.

Custom STATEFUL operator: :func:`stream_dedup_exact` — online exact
deduplication with applyInPandasWithState.  Each content fingerprint
is emitted exactly once across the lifetime of the stream (state =
"seen" per fingerprint group, carried by the checkpoint), which is
the building block for ingest-time dedup of a crawl feed: duplicates
never reach the expensive parse/entail stages downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from .extract import extract_triples
from .schema import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 16,
    **extract_kw,
):
    """Incrementally extract triples from a growing parquet directory
    of pages. Returns the StreamingQuery (await/stop is the caller's
    job; with available_now the query drains the backlog and stops)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    triples = extract_triples(pages, **extract_kw)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- online exact dedup (custom stateful op) ---------------------------

_DEDUP_OUT_SCHEMA = StructType([
    StructField("fingerprint", StringType()),
    StructField("first_doc_id", LongType()),
    StructField("n_in_batch", LongType()),
])
_DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _emit_first_occurrence(key, pdf_iter, state: GroupState):
    """Grouped by content fingerprint: emit one row the FIRST time the
    fingerprint appears across the whole stream; afterwards the state
    swallows every duplicate.  Within the first batch the smallest
    doc_id wins, so output is deterministic for a fixed batch split."""
    n = 0
    first_id = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            # applyInPandasWithState may deliver empty chunks (e.g.
            # timeout-driven invocations); min() would be NaN there.
            continue
        n += len(pdf)
        batch_min = pdf["doc_id"].min()
        if first_id is None or batch_min < first_id:
            first_id = int(batch_min)
    if n == 0:
        # Nothing arrived for this key in this trigger — leave state as-is.
        return iter(())
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return iter(())
    state.update((n,))
    return iter([pd.DataFrame({
        "fingerprint": [key[0]],
        "first_doc_id": [first_id],
        "n_in_batch": [n],
    })])


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema=None,
    available_now: bool = True,
):
    """Ingest-time exact dedup over a growing parquet directory of
    documents (doc_id, text, ...): each md5(text) fingerprint is
    emitted exactly once for the lifetime of the checkpoint.  State is
    one LongType per distinct fingerprint — at crawl scale, bound it
    by routing only hash-range shards to each query (the fingerprint
    is already uniformly distributed)."""
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    docs = spark.readStream.schema(schema).parquet(input_dir)
    keyed = docs.select(
        F.md5(F.col("text")).alias("fingerprint"),
        F.col("doc_id"),
    )
    firsts = keyed.groupBy("fingerprint").applyInPandasWithState(
        _emit_first_occurrence,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        firsts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
