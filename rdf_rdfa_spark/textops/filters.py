"""Corpus filtering + dataset assembly ops for a training-data
pipeline: a quality gate with per-reason drop accounting (the filter
funnel every curation report needs) and deterministic hash-based
train/val/test splits.

Both are single-pass JVM expressions — the funnel is one aggregation
with map-side partials, the split is a projection; neither shuffles
more than its groupBy keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F



def quality_filter(docs: DataFrame,
                   min_chars: int = 200, max_chars: int = 100_000,
                   max_punct_bp: int = 2000, max_digit_bp: int = 2000,
                   allowed_langs: tuple = ("en", "de", "fr", "es")) -> DataFrame:
    """→ docs + (keep boolean, drop_reason string). First failing rule
    wins, in a FIXED order (too_short, too_long, too_much_punct,
    too_many_digits, lang) so the funnel is deterministic."""
    # inline the metric expressions (same spellings as quality_scores)
    # rather than joining against it: a self-join of two projections of
    # the same scan is a full shuffle at corpus scale, appended columns
    # are free
    text = F.col("text")
    n = F.length(text)
    strip = lambda pat: n - F.length(F.regexp_replace(text, pat, ""))
    scored = (
        docs.withColumn("n_chars_actual", n)
        .withColumn("punct_bp",
                    F.floor(strip(r"[.,;:!?]") * 10000 / n).cast("long"))
        .withColumn("digit_bp",
                    F.floor(strip(r"[0-9]") * 10000 / n).cast("long"))
    )
    reason = (
        F.when(F.col("n_chars_actual") < min_chars, "too_short")
        .when(F.col("n_chars_actual") > max_chars, "too_long")
        .when(F.col("punct_bp") > max_punct_bp, "too_much_punct")
        .when(F.col("digit_bp") > max_digit_bp, "too_many_digits")
        .when(~F.col("lang").isin(*allowed_langs), "lang")
    )
    return (
        scored.withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
    )


def quality_funnel(docs: DataFrame, **kw) -> DataFrame:
    """→ (stage, n_docs): the drop funnel — one row per drop reason
    plus 'kept' and 'input'."""
    flagged = quality_filter(docs, **kw)
    per_reason = (
        flagged.groupBy(F.coalesce("drop_reason", F.lit("kept"))
                        .alias("stage"))
        .agg(F.count("*").alias("n_docs"))
    )
    total = flagged.agg(
        F.lit("input").alias("stage"), F.count("*").alias("n_docs"))
    return per_reason.unionByName(total)


def dataset_split(docs: DataFrame, id_col: str = "doc_id",
                  val_pct: int = 5, test_pct: int = 5,
                  salt: str = "v1") -> DataFrame:
    """→ docs + split ∈ {train, val, test}: deterministic hash-bucket
    assignment — stable under repartitioning, re-runs, and corpus
    growth (a document's split never changes when other documents are
    added), the property random splits lack. The md5-derived bucket is
    replayable in any engine; ``salt`` versions the assignment."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt),
                                             F.col(id_col).cast("string"))),
                           1, 15), 16, 10).cast("long") % 100
    )
    split = (
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return docs.withColumn("split", split)
