"""Structured Streaming entry: the SAME extraction UDF under
readStream (SURVEY.md §2.8's stretch goal).

The reference is strictly batch; the north_rule asks for
checkpoint-resumable batch, which materialize.py provides. This module
additionally runs the extraction as an incremental pipeline: new page
files appearing under a directory are parsed exactly once
(``maxFilesPerTrigger`` bounds each micro-batch; the stream checkpoint
is the resume point). No watermarks/stateful ops are needed — the
parse is stateless per row, so the mapInPandas stage transfers to
streaming unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

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
