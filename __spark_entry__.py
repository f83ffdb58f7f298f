"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every declared operator from SURVEY.md §2.12 plus the north-star
extension operators (dedup / similarity / text / multimodal) is
registered in ``neo4j_blue_green_arrow_etl_spark.operators.REGISTRY``;
this module just adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY  # noqa: E402


def _configure(spark: SparkSession) -> None:
    """Session options the engine depends on, applied to a session we
    did not build (the driver owns it): UTC timestamps for deterministic
    formatting; nanosAsLong so legacy ns-timestamp events tables still
    read (a no-op on the current timestamp[us] testdata)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; session factory sets it then


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shaped pricing summary (SURVEY §2.12 Q-A1): scan ->
    partial agg -> 6-group shuffle -> sort."""
    _configure(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    return REGISTRY["q_a1"].spark(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return REGISTRY[name].spark(spark, sf_dir)

        run.__name__ = name
        run.__doc__ = REGISTRY[name].doc
        return run

    return {name: wrap(name) for name in sorted(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each query that is SQL-expressible; hash-seeded
    approximate ops (minhash/simhash/LSH) are rows-only by design and
    have their recall asserted against exact oracles in tests/."""
    return {
        name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle
    }
