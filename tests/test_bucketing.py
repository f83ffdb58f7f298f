"""Bucketed-table co-location: the repeated-join scale strategy.

SCALING.md names bucketing as the co-location candidate for the
orders-lineitem join (q_j5) when it repeats. This pins the mechanics:
writing both sides bucketed by the join key makes the join
shuffle-free — the plan must contain NO Exchange before the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li_bucketed"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "o_bucketed"))
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t).hint("merge")  # pin SMJ so broadcast doesn't hide the point
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_totalprice"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # co-located: zero shuffle
    # and it computes the same result as the shuffled plain-parquet join
    plain = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_SMOKE}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_extendedprice", "o_totalprice")
    )
    assert joined.count() == plain.count()
    assert joined.exceptAll(plain).isEmpty()


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also avoids the shuffle."""
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
