"""Host-group boilerplate removal (the CCNet/refined-web preprocessing
step): lines that repeat across a large fraction of a group's
documents (nav bars, footers, cookie banners) are detected by
document-frequency and stripped before tokenization/dedup.

Scale shape: one shuffle to count per-(group, line) document
frequency with map-side partial aggregation, one broadcast-or-shuffle
anti-join of the exploded lines against the boilerplate set, and one
groupBy to reassemble documents (order restored via the carried line
position — collect_list order is NOT deterministic, the sort is).
min_df is a rational (num/den) so the threshold compare stays in
integers — bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _lines(docs: DataFrame, text_col: str, id_col: str, group_col: str):
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def boilerplate_lines(docs: DataFrame, group_col: str = "source",
                      text_col: str = "text", id_col: str = "doc_id",
                      min_df_num: int = 1, min_df_den: int = 2) -> DataFrame:
    """(grp, line, n_docs, group_docs): lines whose document frequency
    within their group reaches min_df_num/min_df_den."""
    lines = _lines(docs, text_col, id_col, group_col)
    df = (lines.select("grp", "line", "id").distinct()
          .groupBy("grp", "line")
          .agg(F.count("*").alias("n_docs")))
    gd = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(id_col).alias("group_docs"))
    return (
        df.join(F.broadcast(gd), "grp")
        .filter(F.col("n_docs") * min_df_den >= F.col("group_docs") * min_df_num)
    )


def strip_boilerplate(docs: DataFrame, group_col: str = "source",
                      text_col: str = "text", id_col: str = "doc_id",
                      min_df_num: int = 1, min_df_den: int = 2) -> DataFrame:
    """→ (id, clean_text, n_lines, n_removed). Documents whose every
    line is boilerplate survive with clean_text = ''."""
    bp = boilerplate_lines(docs, group_col, text_col, id_col,
                           min_df_num, min_df_den)
    lines = _lines(docs, text_col, id_col, group_col)
    kept = lines.join(bp.select("grp", "line"), ["grp", "line"], "left_anti")
    reassembled = (
        kept.groupBy("id")
        .agg(
            F.concat_ws("\n", F.expr(
                "transform(array_sort(collect_list(struct(pos, line))), "
                "x -> x.line)")).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"))
    return (
        base.join(reassembled, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )
