"""Explicit skew handling: salted two-phase aggregation + hot-key
isolation (north_rule: "partitioning / shuffle / skew handled
explicitly"; template-heavy hosts make per-host keys Zipf-skewed).

Two complementary techniques:

1. ``salted_agg`` — for algebraic aggregations whose partial results
   compose (count/sum/min/max/collect pieces): append a salt to the
   key, aggregate (key, salt) partials, then aggregate partials by
   key. A hot key's rows spread across `salt` reducers instead of one.
   (For plain count/sum Spark's map-side partial aggregation already
   achieves this — salting matters when the aggregation state is
   large, e.g. collect_list/collect_set, where one reducer would
   otherwise hold the whole hot group.)

2. ``split_hot_keys`` — for joins: count keys, broadcast-join the
   frequent ones separately (broadcast side replicated), sort-merge
   the long tail. AQE's skew-join (enabled in session.py) does this
   adaptively at runtime; this explicit variant is for when the hot
   set is known ahead (template hosts) and for engines/paths AQE
   can't split (e.g. aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list,
    partial_aggs: list,
    final_aggs: list,
    salt: int = 16,
    salt_expr=None,
) -> DataFrame:
    """Two-phase aggregation with salting.

    salt_expr must NOT be a function of the key alone (that would put
    a hot key's rows back on one reducer); default salts on the whole
    row. partial_aggs aggregate the (key, salt) groups; final_aggs
    combine partials per key — so they must compose (count→sum,
    sum→sum, min→min, collect_list→flatten...).
    """
    if salt_expr is None:
        salt_expr = F.pmod(F.xxhash64(*df.columns), F.lit(salt))
    salted = df.withColumn("_salt", salt_expr)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs).drop("_salt")


def host_rollup(triples: DataFrame, salt: int = 16) -> DataFrame:
    """Per-host triple counts over the Zipf-skewed corpus, salted so
    host0 (the template-heavy hot key, ~16% of pages) doesn't pin a
    single reducer even for aggregations without partial pushdown."""
    hosted = triples.withColumn(
        "host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    )
    return salted_agg(
        hosted,
        ["host"],
        [F.count("*").alias("_n")],
        [F.sum("_n").alias("n_triples")],
        salt=salt,
        salt_expr=F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(salt)),
    ).select("host", "n_triples")


def split_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    max_hot_keys: int = 10_000,
) -> DataFrame:
    """Skew-aware join: keys above hot_threshold in ``big`` join via
    broadcast of the matching ``small`` slice; the tail joins
    normally. Returns the union (inner join semantics).

    Contract: the hot set is driver-collected, so it is explicitly
    CAPPED at ``max_hot_keys`` (the heaviest keys win).  The cap bounds
    driver memory to ~max_hot_keys key strings; by definition at most
    |big| / hot_threshold keys can exceed the threshold, so at 100 TB
    with the default threshold the cap never binds in practice."""
    counts = big.groupBy(key).agg(F.count("*").alias("_n"))
    hot = (counts.filter(F.col("_n") >= hot_threshold)
           .orderBy(F.desc("_n")).limit(max_hot_keys).select(key))
    hot_rows = [r[0] for r in hot.collect()]
    if not hot_rows:
        return big.join(small, key)
    big_hot = big.filter(F.col(key).isin(hot_rows))
    big_cold = big.filter(~F.col(key).isin(hot_rows))
    small_hot = small.filter(F.col(key).isin(hot_rows))
    joined_hot = big_hot.join(F.broadcast(small_hot), key)
    joined_cold = big_cold.join(small, key)
    return joined_hot.unionByName(joined_cold)
