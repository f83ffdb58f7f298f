"""Partitioned-at-rest layout: directory-partitioned writes and
partition pruning at read — the layout strategy SCALING.md assumes for
date-keyed 100 TB tables (a filtered query must touch only its
partitions' files, visible as PartitionFilters + PartitionCount in the
scan node)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    return out


def test_partitioned_write_layout(partitioned_orders, tmp_path):
    from pathlib import Path

    dirs = sorted(
        p.name for p in Path(partitioned_orders).iterdir() if p.is_dir()
    )
    assert dirs == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]


def test_partition_pruning_in_scan(spark, partitioned_orders):
    df = spark.read.parquet(partitioned_orders).filter(F.col("o_orderstatus") == "O")
    plan = df._jdf.queryExecution().toString()
    # the filter must become a PartitionFilters entry, not a data filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0], plan
    # and the pruned read returns exactly the right rows
    full = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert df.count() == full.filter(F.col("o_orderstatus") == "O").count()


def test_direct_partition_addressing(spark, partitioned_orders):
    """A single partition directory is independently readable with the
    partition column recovered via basePath — the layout contract that
    lets downstream jobs target one date/status partition of a 100 TB
    table without listing the rest."""
    one = (
        spark.read.option("basePath", partitioned_orders)
        .parquet(f"{partitioned_orders}/o_orderstatus=O")
    )
    assert "o_orderstatus" in one.columns
    assert one.select("o_orderstatus").distinct().collect()[0][0] == "O"
    full = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert one.count() == full.filter(F.col("o_orderstatus") == "O").count()
    # and only that partition's files are listed at all
    assert all("o_orderstatus=O" in f for f in one.inputFiles())
