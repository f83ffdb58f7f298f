"""Salted join / salted aggregation: result-equivalence with the plain
plan on a deliberately skewed dataset (90% of rows share one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.functions.skew import (
    salted_aggregate,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90k rows on key 0, ~10k spread over keys 1..99
    left = spark.range(100_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 90_000, 0)
        .otherwise(F.pmod(F.col("id"), 99) + 1)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    return left, right


def test_salted_join_equals_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").select("row_id", "k", "label")
    salted = salted_join(left, right, "k", salt_from="row_id", n_salts=8).select(
        "row_id", "k", "label"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key's rows must actually land in multiple salt buckets."""
    left, _ = skewed
    salt = F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int")
    n_buckets = (
        left.filter(F.col("k") == 0).select(salt.alias("s")).distinct().count()
    )
    assert n_buckets == 8


def test_salted_aggregate_equals_plain(spark, skewed):
    left, _ = skewed
    plain = left.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.max("v").alias("mx"),
    )
    salted = salted_aggregate(
        left,
        "k",
        {"total": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
        salt_from="row_id",
        n_salts=8,
    )
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_aggregate_rejects_non_reaggregable():
    with pytest.raises(ValueError, match="non-reaggregable"):
        salted_aggregate(None, "k", {"a": ("v", "avg")}, salt_from="x")


def test_salted_join_rejects_right_preserving_types(spark, skewed):
    """Right/full joins would duplicate every unmatched right row
    n_salts times (the right side is replicated); the API refuses."""
    left, right = skewed
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(left, right, "k", "row_id", n_salts=4, how=how)


def test_salted_join_left_anti_works(spark, skewed):
    left, right = skewed
    # right covers keys 0..99 fully, so shrink it to force anti matches
    right_small = right.filter(F.col("k") < 50)
    plain = left.join(right_small, "k", "left_anti")
    salted = salted_join(left, right_small, "k", "row_id", n_salts=4, how="left_anti")
    assert salted.count() == plain.count()
