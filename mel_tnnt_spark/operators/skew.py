"""Skew handling: salted aggregation and salted join.

The reference's only skew acknowledgment is file-size bucketing for
thread selection (code/NLP_NER/Sampling.py:126-136); at 10^12 files,
hot keys (giant repos, viral documents) need explicit treatment beyond
AQE's runtime skew-join splitting (spark.sql.adaptive.skewJoin handles
sort-merge joins; salting also covers aggregations and broadcast-less
cases).

Pattern: two-phase aggregate — salt the hot key space, partial-agg on
(key, salt), then final-agg on key. For joins: explode the small side
by the salt domain so every salted partition finds its match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Per-row salt via monotonically_increasing_id: exact-duplicate hot
    rows get DIFFERENT salts (a content-derived salt would keep a
    duplicated hot row on one reducer, defeating the salting)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() in two phases so one hot key spreads over
    n_salts reducers. Output matches groupBy(key).count() exactly."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").count()
    return partial.groupBy(key).agg(F.sum("count").cast("long").alias("count"))


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = 16) -> DataFrame:
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_s"))
    return partial.groupBy(key).agg(F.sum("_s").alias(f"sum_{value}"))


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Equi-join where `big` has hot keys and `small` is too large to
    broadcast: salt the big side, replicate the small side across the
    salt domain, join on (key, salt). Row-identical to big.join(small,
    key)."""
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    small_s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("long")
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
