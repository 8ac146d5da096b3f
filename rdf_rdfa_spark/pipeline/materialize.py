"""Partitioned triple-store materialization with lineage +
checkpoint-resumable progress (SURVEY.md S10; north_rule stages 4-5).

Layout (parquet; Iceberg-shaped — bucketed on subject so point lookups
and subject-grouped joins prune partitions):

    <root>/triples/graph=<output|processor>/bucket=<k>/*.parquet
    <root>/_lineage/chunk-<i>.json     per-chunk row counts + stats
    <root>/_progress/chunk-<i>.done    commit markers (idempotent resume)

Resume protocol: input pages are split into `chunks` deterministic
url-hash chunks; a chunk is re-runnable (write is append + distinct at
read time downstream if a retry double-writes, but the .done marker is
only written after the chunk's append commits, so a clean re-run skips
completed chunks entirely). This mirrors exactly-once-per-chunk
semantics without a transactional catalog — with Iceberg available,
swap the writer for `writeTo(...).append()` and the marker for the
snapshot id.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from .extract import extract_triples


def _bucketed(triples: DataFrame, buckets: int) -> DataFrame:
    return (
        triples.withColumn("graph", F.coalesce("graph", F.lit("output")))
        .withColumn("bucket", F.pmod(F.xxhash64("subj"), F.lit(buckets)))
    )


def write_triples(triples: DataFrame, root: str, buckets: int = 64,
                  mode: str = "append") -> None:
    _bucketed(triples, buckets).write.mode(mode).partitionBy(
        "graph", "bucket"
    ).parquet(os.path.join(root, "triples"))


def read_triples(spark, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "triples"))


def _chunk_col(buckets_or_chunks: int):
    return F.pmod(F.xxhash64("url"), F.lit(buckets_or_chunks))


def materialize_resumable(pages: DataFrame, root: str, chunks: int = 16,
                          buckets: int = 64, **extract_kw) -> dict:
    """Extract + write in url-hash chunks, skipping chunks whose .done
    marker exists. Returns a manifest summary dict."""
    os.makedirs(os.path.join(root, "_progress"), exist_ok=True)
    os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)
    done, ran = [], []
    chunked = pages.withColumn("_chunk", _chunk_col(chunks))
    for i in range(chunks):
        marker = os.path.join(root, "_progress", "chunk-%d.done" % i)
        if os.path.exists(marker):
            done.append(i)
            continue
        t0 = time.time()
        part = chunked.filter(F.col("_chunk") == i).drop("_chunk")
        triples = extract_triples(part, **extract_kw)
        # lineage wants per-chunk counts; cache to avoid re-extract
        triples = triples.cache()
        n_triples = triples.count()
        n_pages = part.select("url").distinct().count()
        write_triples(triples, root, buckets=buckets)
        triples.unpersist()
        lineage = {
            "chunk": i,
            "pages": n_pages,
            "triples": n_triples,
            "elapsed_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(root, "_lineage", "chunk-%d.json" % i), "w") as f:
            json.dump(lineage, f)
        # marker written only after the parquet append committed
        with open(marker, "w") as f:
            f.write("ok\n")
        ran.append(i)
    return {"chunks": chunks, "skipped": done, "ran": ran}


def lineage_summary(root: str) -> dict:
    out = {"chunks": [], "pages": 0, "triples": 0}
    ldir = os.path.join(root, "_lineage")
    if not os.path.isdir(ldir):
        return out
    for name in sorted(os.listdir(ldir)):
        if name.endswith(".json"):
            with open(os.path.join(ldir, name)) as f:
                rec = json.load(f)
            out["chunks"].append(rec)
            out["pages"] += rec.get("pages", 0)
            out["triples"] += rec.get("triples", 0)
    return out


def subject_lookup(spark, root: str, subj: str, buckets: int = 64) -> DataFrame:
    """Point lookup on the materialized store: compute the subject's
    bucket and filter on the PARTITION columns, so the scan prunes to
    one bucket directory (1/buckets of the store) before touching row
    groups — the reason the sink buckets on subject (SURVEY S10)."""
    from pyspark.sql import Row

    bucket = (
        spark.createDataFrame([Row(s=subj)])
        .select(F.pmod(F.xxhash64("s"), F.lit(buckets)).alias("b"))
        .collect()[0]["b"]
    )
    return (
        read_triples(spark, root)
        .filter((F.col("bucket") == int(bucket)) & (F.col("subj") == subj))
    )
