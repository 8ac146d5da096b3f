"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Exact/n-gram paths are pure JVM expressions; SimHash is a vectorized
Arrow pandas UDF (numpy bit-twiddling over token hash arrays).
MinHash+LSH lives in pipeline.canonicalize (shared with entity
canonicalization) and is re-exported here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

from ..pipeline.session import fan_out
from ..pipeline.canonicalize import (  # noqa: F401  (re-export)
    canonical_clusters,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
)


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: (fingerprint, n_dups, canonical_id,
    dup_ids). Map-side partial aggregation makes this one shuffle of
    (hash, id) pairs — bytes shuffled ∝ corpus cardinality, not size."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("fingerprint"),
                    F.col(id_col).alias("id"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("canonical_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


@pandas_udf(LongType())
def _simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token lists (Charikar 2002): sum ±1 per bit
    weighted by token frequency; vectorized with numpy."""
    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        # FNV-1a 64-bit per token, vectorized over the token array
        hs = np.zeros(len(toks), dtype=np.uint64)
        for j, t in enumerate(toks):
            h = np.uint64(0xCBF29CE484222325)
            for ch in t.encode("utf-8"):
                h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            hs[j] = h
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = np.where(bits == 1, 1, -1).sum(axis=0)
        sig = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return fan_out(docs).select(F.col(id_col).alias("id"),
                                _simhash64(toks).alias("simhash"))


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Candidate pairs whose SimHash Hamming distance ≤ k, using the
    4-block trick: two signatures within Hamming 3 share at least one
    identical 16-bit block → groupBy block value, join within buckets."""
    sh = simhash(docs, text_col, id_col).cache()
    blocks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("blk"),
                     F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for b in range(4)
        ])).alias("e"),
    ).select("id", "simhash", "e.blk", "e.val")
    left = blocks.select(F.col("id").alias("a"), F.col("simhash").alias("ha"),
                         "blk", "val")
    right = blocks.select(F.col("id").alias("b"), F.col("simhash").alias("hb"),
                          "blk", "val")
    cand = (
        left.join(right, ["blk", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def ngram_sets(docs: DataFrame, n: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Distinct word-n-gram arrays per doc (JVM transform over token
    index range)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.expr(
        "array_distinct(transform(sequence(0, greatest(size({t}) - {n}, -1)), "
        "i -> concat_ws(' ', slice({t}, i + 1, {n}))))".format(
            t="split(lower(trim(%s)), '\\\\s+')" % text_col, n=n
        )
    )
    return fan_out(docs).select(F.col(id_col).alias("id"), grams.alias("grams"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        bucket_col=None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs. To avoid the O(n²) cross
    join at scale, pairs are generated within cheap blocking buckets
    (default: language + length decile) — the standard blocking
    strategy; recall loss only across buckets."""
    g = ngram_sets(docs, n, text_col, id_col)
    if bucket_col is None:
        bucket = F.concat_ws("|", F.col("lang"),
                             (F.col("n_chars") / 100).cast("int").cast("string"))
    else:
        bucket = bucket_col
    g = g.join(docs.select(F.col(id_col).alias("id"), bucket.alias("bucket")), "id")
    a = g.select(F.col("id").alias("a"), F.col("grams").alias("ga"), "bucket")
    b = g.select(F.col("id").alias("b"), F.col("grams").alias("gb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("a") < F.col("b"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_near_dup_pairs(docs: DataFrame, threshold: float = 0.9,
                           text_col: str = "text", id_col: str = "doc_id",
                           num_hashes: int = 64, bands: int = 16,
                           max_bucket: int = 64) -> DataFrame:
    """Convenience: signatures → LSH candidates → exact verify as ONE
    lazy plan. Each intermediate (sigs, pairs) is consumed exactly
    once downstream, so no checkpoint/persist is needed — Catalyst
    pipelines the whole thing into a single job (3 shuffles: band
    groupBy, pair distinct, verify join). On a long-lived cluster run
    where sigs are also reused for clustering, persist them there.

    ``max_bucket`` is the skew guard (oversized LSH buckets dropped —
    the production posture on boilerplate-heavy crawls); raise it for
    exhaustive recall on bounded corpora (b=16/r=4 at threshold 0.9
    gives P(miss) ~ 4e-8 per true pair, so the uncapped output equals
    the exact-Jaccard pair set — value-oracled in __spark_entry__)."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes)
    pairs = lsh_candidate_pairs(sigs, bands=bands, num_hashes=num_hashes,
                                max_bucket=max_bucket)
    return jaccard_verify(pairs, docs, text_col, id_col, threshold)
