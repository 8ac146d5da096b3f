"""JSON-lines crawl dump → pages connector.

Many crawl exports are jsonl with one page object per line; the JSON
datasource splits and parses natively (distributed line reader +
Jackson), so this is a thin schema-landing layer — projection happens
in the scan, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_jsonl_pages(spark: SparkSession, path: str,
                     url_field: str = "url", html_field: str = "html",
                     ts_field: str = "timestamp") -> DataFrame:
    raw = spark.read.json(path)
    cols = set(raw.columns)

    def col_or_null(name, cast):
        return (F.col(name).cast(cast) if name in cols
                else F.lit(None).cast(cast))

    return raw.select(
        F.col(url_field).alias("url"),
        col_or_null(ts_field, "timestamp").alias("warc_ts"),
        # html may arrive as text or base64; text is the common case
        F.col(html_field).cast("binary").alias("html"),
        col_or_null("text", "string").alias("text"),
        col_or_null("lang", "string").alias("lang"),
    )
